"""The flagship transaction-approval query (batch flavor).

This is the reference's core pipeline — parse → enrich (3 stream-static
LEFT joins) → risk scores → approval flags → wide final projection
(containers/spark-etl/streaming_etl.py:90-175) — expressed as a batch
DataFrame query over the driver tables. The streaming twin in
`streaming/pipeline.py` reuses exactly these transform functions on an
unbounded DataFrame (Structured Streaming's batch/stream unification means
the logic is written once).

Plan shape at scale: the fact scan is narrow; both region joins broadcast
(25 rows); the payer join broadcasts while the dim fits, else AQE falls
back to shuffle-hash on id_usuario_pagador. No other shuffle — the whole
query is a single stage of whole-stage-codegen'd maps after the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.functions import scores

FINAL_COLUMNS = [
    "id_transacao",
    "id_usuario_pagador",
    "id_usuario_recebedor",
    "id_regiao",
    "modalidade_pagamento",
    "data_horario",
    "valor_transacao",
    "t5_score",
    "t6_score",
    "t7_score",
    "score_medio",
    "score_aprovado",
    "saldo_aprovado",
    "limite_aprovado",
    "transacao_aprovada",
]


def with_scores(enriched: DataFrame) -> DataFrame:
    """Score expressions (streaming_etl.py:115-129) on an enriched frame."""
    return (
        enriched.withColumn("t5_score", scores.t5_distance_score())
        .withColumn("t6_score", scores.t6_value_score())
        .withColumn("t7_score", scores.t7_time_score())
        .withColumn("score_medio", scores.score_medio())
    )


def with_approval_flags(scored: DataFrame) -> DataFrame:
    """Approval flags + final conjunction (streaming_etl.py:130-153)."""
    return (
        scored.withColumn("score_aprovado", scores.score_aprovado())
        .withColumn("saldo_aprovado", scores.saldo_aprovado())
        .withColumn("limite_aprovado", scores.limite_aprovado())
        .withColumn("transacao_aprovada", scores.transacao_aprovada())
    )


def approval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full batch approval query → the wide final projection
    (streaming_etl.py:156-175, minus the processing-time latency columns,
    which are non-deterministic and belong to the streaming surface)."""
    enriched = datamodel.enriched_transactions(spark, sf_dir)
    return with_approval_flags(with_scores(enriched)).select(*FINAL_COLUMNS)


def approval_scores_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `transacoes_scores` side-output projection
    (streaming_etl.py:209-219): one row per tx, score columns only."""
    return approval_pipeline(spark, sf_dir).select(
        "id_transacao", "t5_score", "t6_score", "t7_score"
    )


ORACLE_SQL = datamodel.with_ctes(
    f"SELECT {', '.join(FINAL_COLUMNS)} FROM approved",
    extra_ctes=scores.SCORED_CTE,
)

ORACLE_SCORES_SQL = datamodel.with_ctes(
    "SELECT id_transacao, t5_score, t6_score, t7_score FROM approved",
    extra_ctes=scores.SCORED_CTE,
)
