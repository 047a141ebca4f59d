"""Skew-mitigation utilities for hot keys at scale.

At 100 TB a handful of hyperactive payers (or a dominant region) turn a
clean hash-shuffle into one straggler task. Two standing mitigations:

1. AQE skew-join splitting is ON in session.py
   (`spark.sql.adaptive.skewJoin.enabled`) — oversized shuffle partitions
   split at runtime. Prefer this; it needs no code changes.
2. For aggregations whose key histogram is known-degenerate, `salted_agg`
   pre-splits each key into `n_salts` subkeys (two-stage aggregation:
   partial per (key, salt), final per key). Works for any algebraic
   aggregate; this helper wires count/sum.

`salted_join` broadcasts-and-explodes the small side so a skewed fact key
joins against every salt replica — the classic salted equi-join for when
the dim is small enough to replicate but the fact key histogram is too
skewed for one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation: count + sum of `value` per `key`.

    Stage 1 shuffles on (key, salt) — hot keys spread over n_salts
    reducers; stage 2 shuffles n_salts-x fewer rows on key alone.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"), F.sum(value).alias("_sum")
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("total"),
        F.sum("_sum").alias("valor_total"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Salted equi-join: fact rows get a random salt; the dim is exploded
    across all salts (replication factor n_salts) so every (key, salt)
    bucket finds its dim row. Use when the dim is replicable but the fact
    key is too skewed for a plain shuffle join and too big to broadcast
    outright."""
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}")) & (
        F.col("f._salt") == F.col("d._salt")
    )
    return (
        salted_fact.alias("f")
        .join(exploded_dim.alias("d"), cond, how)
        .drop("_salt")
    )
