"""Batch sources (SURVEY.md §2.1).

S2/S3/S5 readers. The driver tables are parquet (the primary scan path,
with pushdown + pruning); CSV/JSON/JDBC variants cover the reference's
other ingest formats. The JDBC path is exercised end-to-end against the
embedded Derby engine that ships in Spark's own jars (no external DB
needed — tests/test_jdbc.py round-trips Decimal(15,2)/UUID-string/
timestamp, the reference's usuarios column types); a Postgres deployment
only swaps the url/driver pair (`spark.jars.packages`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from banking_streaming_etl_spark.datamodel import load_table, load_tables  # noqa: F401


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """S3: CSV batch scan. Explicit schema preferred; inferSchema kept for
    parity with the reference's dev scripts (src/teste.py:15-34) — it costs
    an extra pass, never use it at scale."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    cache: bool = True,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S2: JDBC dimension load, cached like the reference's usuarios/regioes
    reads (streaming_etl.py:73-85). Pass `partition_column` (+ bounds) for
    the scale path: N parallel range-partitioned scans instead of one
    driver-side cursor — mandatory for a dimension that outgrows a single
    connection's throughput. Raises a clear error when no JDBC driver jar
    is on the classpath."""
    if partition_column is not None:
        df = spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=properties or {},
        )
    else:
        df = spark.read.jdbc(url, table, properties=properties or {})
    return df.cache() if cache else df


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    create_table_column_types: str | None = None,
) -> None:
    """K2: JDBC sink (the reference's historico/scores appends,
    streaming_etl.py:198-219). `create_table_column_types` pins DDL types
    where the default dialect mapping is wrong for the target schema —
    e.g. UUID-as-string columns as VARCHAR(36) instead of CLOB/TEXT."""
    writer = df.write.mode(mode)
    if create_table_column_types:
        writer = writer.option(
            "createTableColumnTypes", create_table_column_types
        )
    writer.jdbc(url, table, properties=properties or {})


def execute_jdbc(spark: SparkSession, url: str, sql: str,
                 driver: str | None = None) -> None:
    """Run one DDL/DML statement over a raw JDBC connection (the Spark
    JDBC source only reads/writes tables; MERGE and friends need a
    statement). Uses the JVM's DriverManager — same classpath as the
    datasource, no extra Python driver."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.executeUpdate(sql)
        st.close()
    finally:
        conn.close()


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
    staging_table: str | None = None,
) -> None:
    """Exactly-once-style JDBC upsert: stage the batch (overwrite), then
    one transactional MERGE into the target keyed on `key_cols`. A
    post-failure retry re-stages the same rows and re-runs the same
    MERGE — idempotent, unlike the bare append the reference uses for
    its historico sink (streaming_etl.py:198-219). Wire into foreachBatch
    (partial(upsert_jdbc, ...)) for the streaming exactly-once JDBC sink.

    Identifier quoting mirrors the Spark JDBC writer exactly: table
    names unquoted (DB case folding applies), column names quoted
    (the writer quotes them at CREATE, preserving case)."""
    staging = staging_table or f"{table}_stage"
    write_jdbc(df, url, staging, mode="overwrite", properties=properties)
    q = lambda c: f'"{c}"'  # noqa: E731
    cols = df.columns
    non_keys = [c for c in cols if c not in key_cols]
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    set_ = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in non_keys)
    ins_cols = ", ".join(q(c) for c in cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
    merge = (
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )
    execute_jdbc(
        df.sparkSession, url, merge, (properties or {}).get("driver")
    )


def read_json_lines(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """JSON-lines batch scan — the batch flavor of the streaming wire
    format (one JSON object per line). Explicit schema skips the
    inference pass; without one Spark samples the file (same cost caveat
    as CSV inferSchema)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC batch sink — Spark-native columnar alternative when the
    downstream warehouse is ORC-based (Hive/Trino); same pushdown and
    stats-pruning contract as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch scan with predicate pushdown (mirror of the parquet
    path)."""
    return spark.read.orc(path)
