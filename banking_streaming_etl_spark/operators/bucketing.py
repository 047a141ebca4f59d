"""Bucketed tables: co-located joins and aggregations without shuffles.

At 100 TB the lineitem ⋈ orders join shuffles both sides on every run.
Bucketing pays that shuffle ONCE at write time: both tables hash-bucketed
into the same number of buckets on the join key, so subsequent joins and
groupBys on that key read co-located buckets and plan ZERO exchanges
(SortMergeJoin over pre-bucketed scans). This is the standing layout for
fact tables that join repeatedly on the same key.

Bucketed writes go through the session catalog (`saveAsTable`); the
warehouse dir is wherever `spark.sql.warehouse.dir` points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist hash-bucketed (optionally sorted) — the one-time shuffle."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str,
    key_right: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — planned with
    no Exchange on either side (verify: explain has no ShuffleExchange)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
