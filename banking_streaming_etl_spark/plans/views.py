"""The reference's two Postgres analytic views as Spark queries.

`vw_performance_stats` and `vw_performance_temporal`
(containers/db-seed/historic_data_mock.py:87-112) aggregate the fact table
per modality / per hour. The reference's measure is pipeline latency; the
batch surface here uses the transaction value as the measure over the same
shapes (the latency columns are processing-time artifacts of the streaming
surface, exercised in streaming/ tests instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.functions import exact


def perf_stats_by_modality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vw_performance_stats shape (A1+A2): single-key hash aggregate with
    count/avg/min/max + exact 0.95 percentile (PERCENTILE_CONT parity —
    exact, not approx, to match DuckDB; historic_data_mock.py:95)."""
    t = datamodel.transactions(spark, sf_dir)
    return t.groupBy("modalidade_pagamento").agg(
        F.count("*").alias("total_transacoes"),
        exact.exact_avg("valor_transacao", "valor_medio"),
        F.min("valor_transacao").alias("valor_min"),
        F.max("valor_transacao").alias("valor_max"),
        F.round(F.percentile("valor_transacao", F.lit(0.95)), 6).alias("p95_valor"),
    )


PERF_STATS_SQL = datamodel.with_ctes(
    f"""
SELECT
    modalidade_pagamento,
    COUNT(*) AS total_transacoes,
    {exact.sql_avg('valor_transacao', 'valor_medio')},
    MIN(valor_transacao) AS valor_min,
    MAX(valor_transacao) AS valor_max,
    ROUND(QUANTILE_CONT(valor_transacao, 0.95), 6) AS p95_valor
FROM transactions
GROUP BY modalidade_pagamento
"""
)


def perf_temporal_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vw_performance_temporal shape (A3): DATE_TRUNC('hour') buckets with
    count + avg, ORDER BY hora DESC (historic_data_mock.py:102-112)."""
    t = datamodel.transactions(spark, sf_dir)
    return (
        t.groupBy(F.date_trunc("hour", F.col("data_horario")).alias("hora"))
        .agg(
            F.count("*").alias("total_transacoes"),
            exact.exact_avg("valor_transacao", "valor_medio"),
        )
        .orderBy(F.desc("hora"))
    )


def _hour_spine(t: DataFrame) -> DataFrame:
    """Generated hour spine [min bucket, max bucket] — ONE definition for
    every gapfill variant (scalar min/max agg broadcast into sequence();
    hours-sized at any scale)."""
    bounds = t.agg(
        F.date_trunc("hour", F.min("data_horario")).alias("h0"),
        F.date_trunc("hour", F.max("data_horario")).alias("h1"),
    )
    return bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hora")
    )


#: DuckDB twin of _hour_spine — the generate_series subquery both gapfill
#: oracles build on.
HOUR_SPINE_SQL = """(
    SELECT unnest(generate_series(
               DATE_TRUNC('hour', (SELECT MIN(data_horario) FROM transactions)),
               DATE_TRUNC('hour', (SELECT MAX(data_horario) FROM transactions)),
               INTERVAL 1 HOUR)) AS hora
) spine"""


def perf_temporal_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series (the TimescaleDB time_bucket_gapfill
    pattern): a generated hour spine from min to max bucket, LEFT-joined
    with the hourly aggregate, empty buckets zero-filled — what a
    dashboard needs to draw a continuous line. The spine comes from one
    scalar min/max aggregate broadcast into sequence(); at any scale
    it's hours-between-endpoints rows, never data-sized."""
    t = datamodel.transactions(spark, sf_dir)
    spine = _hour_spine(t)
    counts = t.groupBy(
        F.date_trunc("hour", F.col("data_horario")).alias("hora")
    ).agg(
        F.count("*").alias("total_transacoes"),
        exact.exact_sum("valor_transacao", "valor_total"),
    )
    return spine.join(counts, "hora", "left").select(
        "hora",
        F.coalesce("total_transacoes", F.lit(0)).alias("total_transacoes"),
        F.coalesce("valor_total", F.lit(0.0)).alias("valor_total"),
    )


PERF_TEMPORAL_GAPFILL_SQL = datamodel.with_ctes(
    f"""
SELECT hora,
       COALESCE(total_transacoes, 0) AS total_transacoes,
       COALESCE(valor_total, 0.0) AS valor_total
FROM {HOUR_SPINE_SQL}
LEFT JOIN (
    SELECT DATE_TRUNC('hour', data_horario) AS hora,
           COUNT(*) AS total_transacoes,
           {exact.sql_sum('valor_transacao', 'valor_total')}
    FROM transactions
    GROUP BY 1
) c USING (hora)
"""
)


def latency_stats_over_history(history: DataFrame) -> DataFrame:
    """The reference's ACTUAL vw_performance_stats measure — latency of the
    streaming pipeline per modality (historic_data_mock.py:87-100), computed
    over a streamed history table (the parquet the multi-sink writes, which
    plays the Postgres `transacoes` fact). Includes the view's null guard
    (latencia_total_ms IS NOT NULL, P7)."""
    return (
        history.filter(F.col("latencia_total_ms").isNotNull())
        .groupBy("modalidade_pagamento")
        .agg(
            F.count("*").alias("total_transacoes"),
            F.avg("latencia_total_ms").alias("latencia_media_ms"),
            F.min("latencia_total_ms").alias("latencia_min_ms"),
            F.max("latencia_total_ms").alias("latencia_max_ms"),
            F.percentile("latencia_total_ms", F.lit(0.95)).alias(
                "p95_latencia_ms"
            ),
            F.avg("tempo_processamento_ms").alias("tempo_proc_medio_ms"),
        )
    )


PERF_TEMPORAL_SQL = datamodel.with_ctes(
    f"""
SELECT
    DATE_TRUNC('hour', data_horario) AS hora,
    COUNT(*) AS total_transacoes,
    {exact.sql_avg('valor_transacao', 'valor_medio')}
FROM transactions
GROUP BY DATE_TRUNC('hour', data_horario)
ORDER BY hora DESC
"""
)


def perf_temporal_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly average with LOCF interpolation (TimescaleDB's
    `locf()` companion to time_bucket_gapfill): empty buckets carry the
    last observed hourly average forward instead of dropping to zero —
    what a dashboard draws for a *level* metric (an average), where a
    zero would read as a crash.

    Same hours-sized spine as the zero-fill variant; the carry-forward is
    one window (last non-null, unbounded-preceding) over the spine —
    spine-sized work, never data-sized. Rows before the first
    observation stay NULL in both engines.
    """
    from pyspark.sql import Window as W

    t = datamodel.transactions(spark, sf_dir)
    spine = _hour_spine(t)
    hourly = t.groupBy(
        F.date_trunc("hour", F.col("data_horario")).alias("hora")
    ).agg(
        F.count("*").alias("total_transacoes"),
        F.round(exact.exact_avg("valor_transacao", "m"), 6).alias(
            "valor_medio_hora"
        ),
    )
    w = W.orderBy("hora").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(hourly, "hora", "left")
        .withColumn(
            "valor_medio_locf",
            F.last("valor_medio_hora", ignorenulls=True).over(w),
        )
        .select(
            "hora",
            F.coalesce("total_transacoes", F.lit(0)).alias(
                "total_transacoes"
            ),
            "valor_medio_locf",
        )
    )


PERF_TEMPORAL_LOCF_SQL = datamodel.with_ctes(
    f"""
SELECT hora,
       COALESCE(total_transacoes, 0) AS total_transacoes,
       LAST_VALUE(valor_medio_hora IGNORE NULLS) OVER (
           ORDER BY hora
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS valor_medio_locf
FROM {HOUR_SPINE_SQL}
LEFT JOIN (
    SELECT DATE_TRUNC('hour', data_horario) AS hora,
           COUNT(*) AS total_transacoes,
           ROUND({exact._sql_s('valor_transacao')}
                 / CAST(COUNT(valor_transacao) AS DOUBLE), 6)
               AS valor_medio_hora
    FROM transactions
    GROUP BY 1
) c USING (hora)
"""
)


def dq_report_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report over the transaction feed (the
    Deequ/expectations pattern): completeness per contract column,
    domain checks (non-negative values, modality vocabulary), and key
    uniqueness — one scan, one row, every metric a conditional aggregate.
    The audit a pipeline gates a load on before publishing a partition.
    """
    t = datamodel.transactions(spark, sf_dir)
    n = F.count(F.lit(1))
    return t.agg(
        n.alias("n_linhas"),
        F.sum(F.when(F.col("id_transacao").isNull(), 1).otherwise(0)).alias(
            "nulos_id"
        ),
        F.sum(
            F.when(F.col("id_usuario_recebedor").isNull(), 1).otherwise(0)
        ).alias("nulos_recebedor"),
        F.sum(F.when(F.col("valor_transacao").isNull(), 1).otherwise(0)).alias(
            "nulos_valor"
        ),
        F.sum(F.when(F.col("valor_transacao") < 0, 1).otherwise(0)).alias(
            "valores_negativos"
        ),
        F.sum(
            F.when(
                ~F.col("modalidade_pagamento").isin(*datamodel.MODALITIES), 1
            ).otherwise(0)
        ).alias("modalidades_fora_vocab"),
        (n - F.count_distinct(F.col("id_transacao"))).alias(
            "ids_duplicados"
        ),
        F.min("data_horario").alias("ts_min"),
        F.max("data_horario").alias("ts_max"),
    )


_DQ_VOCAB = ", ".join(f"'{m}'" for m in datamodel.MODALITIES)

DQ_REPORT_SQL = datamodel.with_ctes(
    f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_linhas,
       CAST(SUM(CASE WHEN id_transacao IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS nulos_id,
       CAST(SUM(CASE WHEN id_usuario_recebedor IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS nulos_recebedor,
       CAST(SUM(CASE WHEN valor_transacao IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS nulos_valor,
       CAST(SUM(CASE WHEN valor_transacao < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS valores_negativos,
       CAST(SUM(CASE WHEN modalidade_pagamento NOT IN ({_DQ_VOCAB})
                     THEN 1 ELSE 0 END) AS BIGINT) AS modalidades_fora_vocab,
       CAST(COUNT(*) - COUNT(DISTINCT id_transacao) AS BIGINT)
           AS ids_duplicados,
       MIN(data_horario) AS ts_min,
       MAX(data_horario) AS ts_max
FROM transactions
"""
)
