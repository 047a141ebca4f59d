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


#: weighted sample size (Efraimidis-Spirakis A-Res).
WEIGHTED_K = 200


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement over documents
    (Efraimidis & Spirakis 2006, A-Res): key_i = ln(u_i) / w_i with
    u_i ~ U(0,1), keep the K LARGEST keys — inclusion probability
    proportional to weight, single pass, no replacement bookkeeping. The
    quality-weighted example-selection step of a curation pipeline
    (weight = token count here; swap in a quality score unchanged).

    u_i derives from the portable LCG hash ((h + 0.5)/M, strictly inside
    (0,1) so ln never sees 0) — the sample is REPRODUCIBLE across runs,
    partitionings, and engines. Rows-only registration: ln in the SORT
    key is exactly the transcendental-ordering case the oracle
    invariants exclude (a 1-ulp flip at the K-th boundary would change
    the selected SET); determinism + weight-enrichment are pinned in
    tests instead.

    Scale shape: narrow map for the key, then TakeOrdered top-K — no
    shuffle, no global sort; the distributed A-Res merge (per-partition
    top-K then re-truncate) is exactly what TakeOrdered plans."""
    from banking_streaming_etl_spark.functions import portable

    d = datamodel.load_table(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("double")
    u = (
        portable.lcg_hash(F.col("doc_id")).cast("double") + F.lit(0.5)
    ) / F.lit(float(portable.M31))
    key = F.log(u) / w
    return (
        d.select(
            "doc_id",
            "source",
            w.cast("bigint").alias("peso_tokens"),
            key.alias("chave_ares"),
        )
        .orderBy(F.desc("chave_ares"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
        .select(
            "doc_id",
            "source",
            "peso_tokens",
            F.round("chave_ares", 9).alias("chave_ares"),
        )
    )
