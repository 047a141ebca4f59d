"""Grouped-map pandas UDF (applyInPandas) — the per-group slow path.

The one UDF family the engine exposes beyond mapInPandas: per-group
pandas DataFrame in / DataFrame out, Arrow-batched. Used ONLY where the
per-group logic genuinely needs pandas (here it doesn't — the same
normalization is expressible with window functions, and the test exploits
exactly that: the pandas path and the JVM-window path must agree
bit-for-bit, a differential check between the engine's fast and slow
paths).

Scale note: applyInPandas shuffles on the group key and materializes each
group in one task's memory — fine for per-user groups (small), wrong for
skewed mega-groups. Prefer windows/aggregations when expressible (see
SURVEY.md §4.4 for the reference's cautionary tale).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from banking_streaming_etl_spark import datamodel

OUT_SCHEMA = T.StructType(
    [
        T.StructField("id_transacao", T.LongType()),
        T.StructField("id_usuario_pagador", T.LongType()),
        T.StructField("valor_transacao", T.DoubleType()),
        T.StructField("valor_normalizado", T.DoubleType()),
    ]
)


def minmax_normalize_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payer min-max normalization via applyInPandas (grouped map)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["valor_transacao"]
        lo, hi = v.min(), v.max()
        out = pdf[["id_transacao", "id_usuario_pagador", "valor_transacao"]].copy()
        out["valor_normalizado"] = (
            (v - lo) / (hi - lo) if hi > lo else v * 0.0
        )
        return out

    t = datamodel.transactions(spark, sf_dir).select(
        "id_transacao", "id_usuario_pagador", "valor_transacao"
    )
    return t.groupBy("id_usuario_pagador").applyInPandas(normalize, OUT_SCHEMA)


MINMAX_WINDOW_SQL = datamodel.with_ctes(
    """
SELECT id_transacao, id_usuario_pagador, valor_transacao,
       CASE WHEN hi > lo THEN (valor_transacao - lo) / (hi - lo)
            ELSE 0.0 END AS valor_normalizado
FROM (
    SELECT id_transacao, id_usuario_pagador, valor_transacao,
           MIN(valor_transacao) OVER w AS lo,
           MAX(valor_transacao) OVER w AS hi
    FROM transactions
    WINDOW w AS (PARTITION BY id_usuario_pagador)
)"""
)


def minmax_normalize_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same normalization as JVM window expressions (the fast path)."""
    t = datamodel.transactions(spark, sf_dir).select(
        "id_transacao", "id_usuario_pagador", "valor_transacao"
    )
    w = W.partitionBy("id_usuario_pagador")
    lo = F.min("valor_transacao").over(w)
    hi = F.max("valor_transacao").over(w)
    norm = F.when(
        hi > lo, (F.col("valor_transacao") - lo) / (hi - lo)
    ).otherwise(F.lit(0.0))
    return t.withColumn("valor_normalizado", norm)


def register_chunk_tokens_udtf(spark: SparkSession) -> None:
    """Python UDTF surface (Spark 4, Arrow-batched): one input row ->
    many output rows, usable in SQL as a LATERAL table function. The
    engine's chunking PRODUCTION path is pure array expressions
    (plans/text.py chunk_documents — exchange-free, JVM-side); this UDTF
    exists to pin the escape hatch for row-expanding logic that genuinely
    needs Python, and the differential test holds it bit-identical to
    the built-in path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: bigint, chunk_text: string", useArrow=True)
    class ChunkTokens:
        def eval(self, text: str, size: int, stride: int):
            toks = text.split(" ")
            n = len(toks)
            if n > size:
                n_chunks = 1 + -(-(n - size) // stride)
            else:
                n_chunks = 1
            for k in range(n_chunks):
                yield k, " ".join(toks[k * stride : k * stride + size])

    spark.udtf.register("chunk_tokens", ChunkTokens)
