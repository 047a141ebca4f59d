"""Dataset splitting and sampling (training-data pipeline staples).

- `train_test_split_docs`: DETERMINISTIC hash-based split — bucket =
  md5-derived integer mod 100, train = bucket < 80. Unlike randomSplit
  (partition-order dependent), the assignment is a pure function of the
  key: stable across runs, engines, partitionings, and cluster sizes —
  exactly what a reproducible training pipeline needs. Fully
  oracle-checkable because the md5-derived hash is identical in DuckDB
  (same trick as winnowing fingerprints).
- `stratified_sample`: per-stratum sampleBy — approximate fractions, used
  for class-balancing; seeded but partition-dependent, so rows-only with
  a tolerance test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from banking_streaming_etl_spark import datamodel

TRAIN_PCT = 80

#: cross-engine hash bucket: first 12 hex chars of md5(key) -> bigint mod 100
_BUCKET_SPARK = (
    "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10)"
    " as bigint), 100)"
)
_BUCKET_DUCK = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 100"
)


def train_test_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 split of documents keyed on doc_id."""
    d = datamodel.load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train").otherwise("test").alias("split"),
    )


TRAIN_TEST_SPLIT_SQL = f"""
SELECT doc_id,
       {_BUCKET_DUCK} AS bucket,
       CASE WHEN {_BUCKET_DUCK} < {TRAIN_PCT} THEN 'train' ELSE 'test' END
           AS split
FROM documents
"""


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    fractions: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Per-modality stratified sample of transactions (class balancing)."""
    t = datamodel.transactions(spark, sf_dir)
    if fractions is None:
        fractions = {m: 0.2 for m in datamodel.MODALITIES}
        fractions["purchase"] = 1.0  # upweight the minority-style class
    return t.sampleBy("modalidade_pagamento", fractions, seed=seed)


# --- deterministic per-group reservoir (hash-minimum) sample -----------------

RESERVOIR_K = 20

_TX_HASH_SPARK = (
    "cast(conv(substring(md5(cast(id_transacao as string)), 1, 12), 16, 10)"
    " as bigint)"
)
_TX_HASH_DUCK = (
    "CAST(('0x' || substr(md5(CAST(id_transacao AS VARCHAR)), 1, 12))"
    " AS BIGINT)"
)


def reservoir_sample_per_modality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic K-per-group uniform sample: keep the K rows with the
    smallest md5-derived hash per modality (bottom-K-by-hash == a
    uniform reservoir, but reproducible across runs, engines, and
    partitionings — randomSplit/sampleBy can't promise any of that).

    Scale shape: one window per group ordered by (hash, id) — a single
    shuffle; at extreme group sizes the same result comes from a partial
    per-partition bottom-K before the shuffle (Spark's
    TakeOrderedAndProject generalized per key)."""
    t = datamodel.transactions(spark, sf_dir)
    h = F.expr(_TX_HASH_SPARK)
    w = W.partitionBy("modalidade_pagamento").orderBy(
        F.col("h").asc(), F.col("id_transacao").asc()
    )
    return (
        t.withColumn("h", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select(
            "modalidade_pagamento",
            "rk",
            "id_transacao",
            "valor_transacao",
        )
    )


RESERVOIR_SQL = datamodel.with_ctes(
    f"""
SELECT modalidade_pagamento, rk, id_transacao, valor_transacao
FROM (
    SELECT modalidade_pagamento, id_transacao, valor_transacao,
           ROW_NUMBER() OVER (
               PARTITION BY modalidade_pagamento
               ORDER BY {_TX_HASH_DUCK} ASC, id_transacao ASC
           ) AS rk
    FROM transactions
)
WHERE rk <= {RESERVOIR_K}
"""
)
