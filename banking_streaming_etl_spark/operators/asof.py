"""As-of (point-in-time) join — an operator Spark has no native form for.

Implemented as a composition of built-ins (the guide's recommended path
before reaching for applyInPandas/merge_asof): tag-and-union both sides,
sort within each key by (time, tag) with a window, carry the most recent
right-side value forward with last(..., ignoreNulls=True), keep left rows.

Cost at scale: ONE shuffle on the join key (the union sorts within window
partitions) — same as the equi-join it replaces; no range blow-up. The
DuckDB oracle uses its native ASOF JOIN, so the composition is verified
against a first-class implementation.

Fixture: deterministic daily balance snapshots per user (30 days x every
customer), as-of joined to each transaction — "what was the payer's
balance at transaction time".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from banking_streaming_etl_spark import datamodel

EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01 UTC in microseconds
N_SNAPSHOT_DAYS = 30


def balance_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user balance snapshots (deterministic synthesis)."""
    c = datamodel.load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id_usuario"),
        F.col("c_acctbal").alias("saldo_base"),
        F.explode(F.sequence(F.lit(0), F.lit(N_SNAPSHOT_DAYS - 1))).alias("dia"),
    ).select(
        "id_usuario",
        F.timestamp_micros(
            F.lit(EPOCH_2024_US) + F.col("dia").cast("long") * F.lit(86_400_000_000)
        ).alias("ts_snapshot"),
        (F.col("saldo_base") + F.col("dia") * F.lit(10.0)).alias("saldo_snapshot"),
    )


SNAPSHOTS_SQL = f"""
snapshots AS (
    SELECT c_custkey AS id_usuario,
           make_timestamp({EPOCH_2024_US} + d.range * 86400000000)
               AS ts_snapshot,
           c_acctbal + d.range * 10.0 AS saldo_snapshot
    FROM customer CROSS JOIN range({N_SNAPSHOT_DAYS}) d
)
"""


def asof_balance_at_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each transaction joined to the payer's most recent balance snapshot
    at or before the transaction's event time (NULL when none precedes)."""
    tx = datamodel.transactions(spark, sf_dir).select(
        "id_transacao",
        F.col("id_usuario_pagador").alias("id_usuario"),
        "data_horario",
        "valor_transacao",
    )
    snaps = balance_snapshots(spark, sf_dir)

    left = tx.select(
        "id_usuario",
        F.col("data_horario").alias("ts"),
        F.lit(1).alias("tag"),
        "id_transacao",
        "valor_transacao",
        F.lit(None).cast("double").alias("saldo_snapshot"),
    )
    right = snaps.select(
        "id_usuario",
        F.col("ts_snapshot").alias("ts"),
        F.lit(0).alias("tag"),  # tag 0 sorts first at equal ts -> inclusive <=
        F.lit(None).cast("long").alias("id_transacao"),
        F.lit(None).cast("double").alias("valor_transacao"),
        "saldo_snapshot",
    )
    w = (
        W.partitionBy("id_usuario")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "saldo_na_transacao",
        F.last("saldo_snapshot", ignorenulls=True).over(w),
    )
    return merged.filter(F.col("tag") == 1).select(
        "id_transacao",
        "id_usuario",
        F.col("ts").alias("data_horario"),
        "valor_transacao",
        "saldo_na_transacao",
    )


ALERT_WINDOW_HOURS = 6


def fraud_alert_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-region alert intervals: each region r gets one
    6-hour window per week starting at (r mod 7) days + (r mod 24) hours
    into January 2024 — a small interval dimension for the range join."""
    reg = datamodel.regions(spark, sf_dir).select("id_regiao")
    week = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("semana")
    start_us = (
        F.lit(EPOCH_2024_US)
        + F.col("semana").cast("long") * F.lit(7 * 86_400_000_000)
        + (F.col("id_regiao") % 7).cast("long") * F.lit(86_400_000_000)
        + (F.col("id_regiao") % 24).cast("long") * F.lit(3_600_000_000)
    )
    return reg.select("id_regiao", week).select(
        "id_regiao",
        F.timestamp_micros(start_us).alias("inicio"),
        F.timestamp_micros(
            start_us + F.lit(ALERT_WINDOW_HOURS * 3_600_000_000)
        ).alias("fim"),
    )


ALERT_WINDOWS_CTE = f"""
alert_windows AS (
    SELECT id_regiao,
           make_timestamp({EPOCH_2024_US}
               + w.range * {7 * 86_400_000_000}
               + (id_regiao % 7) * {86_400_000_000}
               + (id_regiao % 24) * {3_600_000_000}) AS inicio,
           make_timestamp({EPOCH_2024_US}
               + w.range * {7 * 86_400_000_000}
               + (id_regiao % 7) * {86_400_000_000}
               + (id_regiao % 24) * {3_600_000_000}
               + {ALERT_WINDOW_HOURS * 3_600_000_000}) AS fim
    FROM regions CROSS JOIN range(4) w
)
"""


def range_join_tx_in_alert_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — Spark has no native one; the naive
    inequality join degenerates to a nested loop. Scalable form: bucketize
    the time axis at the interval granularity, equi-join on (key, bucket),
    then filter the exact bounds — shuffle on (region, hour-bucket), never
    a cross product. Intervals spanning multiple buckets are exploded to
    one row per covered bucket."""
    tx = datamodel.transactions(spark, sf_dir)
    win = fraud_alert_windows(spark, sf_dir)

    bucket = F.floor(F.unix_micros(F.col("data_horario")) / F.lit(3_600_000_000))
    tx_b = tx.select(
        "id_transacao", "id_regiao", "data_horario", "valor_transacao"
    ).withColumn("bucket", bucket)

    win_b = win.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col("inicio")) / F.lit(3_600_000_000)),
                F.floor(F.unix_micros(F.col("fim")) / F.lit(3_600_000_000)),
            )
        ),
    )
    return (
        tx_b.join(F.broadcast(win_b), ["id_regiao", "bucket"])
        .filter(
            (F.col("data_horario") >= F.col("inicio"))
            & (F.col("data_horario") < F.col("fim"))
        )
        .select(
            "id_transacao", "id_regiao", "data_horario", "valor_transacao",
            "inicio", "fim",
        )
    )


RANGE_JOIN_SQL = datamodel.with_ctes(
    """
SELECT t.id_transacao, t.id_regiao, t.data_horario, t.valor_transacao,
       w.inicio, w.fim
FROM transactions t
JOIN alert_windows w
  ON t.id_regiao = w.id_regiao
 AND t.data_horario >= w.inicio
 AND t.data_horario < w.fim""",
    extra_ctes=ALERT_WINDOWS_CTE,
)


def payer_chains_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream payer chain join: B's payer was A's
    recipient within 1 hour — a time-bounded self-join on the fact."""
    t = datamodel.transactions(spark, sf_dir)
    a = t.select(
        F.col("id_transacao").alias("id_tx_origem"),
        F.col("id_usuario_recebedor").alias("id_usuario_meio"),
        F.col("data_horario").alias("ts_origem"),
    )
    b = t.select(
        F.col("id_transacao").alias("id_tx_destino"),
        F.col("id_usuario_pagador").alias("id_usuario_meio"),
        F.col("data_horario").alias("ts_destino"),
    )
    return (
        a.join(b, "id_usuario_meio")
        .filter(
            (F.col("ts_destino") > F.col("ts_origem"))
            & (
                F.col("ts_destino")
                <= F.col("ts_origem") + F.expr("INTERVAL 1 hour")
            )
        )
        .select(
            "id_tx_origem", "id_tx_destino", "id_usuario_meio",
            "ts_origem", "ts_destino",
        )
    )


PAYER_CHAINS_SQL = datamodel.with_ctes(
    """
SELECT a.id_transacao AS id_tx_origem,
       b.id_transacao AS id_tx_destino,
       a.id_usuario_recebedor AS id_usuario_meio,
       a.data_horario AS ts_origem,
       b.data_horario AS ts_destino
FROM transactions a
JOIN transactions b
  ON a.id_usuario_recebedor = b.id_usuario_pagador
 AND b.data_horario > a.data_horario
 AND b.data_horario <= a.data_horario + INTERVAL 1 HOUR"""
)


ASOF_BALANCE_SQL = datamodel.with_ctes(
    """
SELECT t.id_transacao,
       t.id_usuario_pagador AS id_usuario,
       t.data_horario,
       t.valor_transacao,
       s.saldo_snapshot AS saldo_na_transacao
FROM transactions t
ASOF LEFT JOIN snapshots s
    ON t.id_usuario_pagador = s.id_usuario
   AND s.ts_snapshot <= t.data_horario""",
    extra_ctes=SNAPSHOTS_SQL,
)


# --- interval-overlap theta join (two unbounded sides), round 14 ------------

BURST_PAD_US = 3_600_000_000  # 1 h of slack either side of a burst
BURST_ALERT_VALUE = 100.0  # ~p90 of valor at every SF: dense enough that
# overlapping same-region bursts exist even at sf0.001 (3 / 221 / ~23k
# pairs at sf0.001/0.01/0.1), sparse enough that the pair set stays far
# below the fact size
BURST_BUCKET_US = 3_600_000_000  # time-axis bucket width for the equi-join


def _alert_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(payer, day) high-value activity intervals: [first alert - 1h,
    last alert + 1h] over transactions with valor >= BURST_ALERT_VALUE,
    tagged with the payer's home region — a FACT-sized interval table
    (grows with the data; nothing broadcastable about it)."""
    t = datamodel.transactions(spark, sf_dir)
    u = datamodel.users(spark, sf_dir).select("id_usuario", "id_regiao_u")
    bursts = (
        t.filter(F.col("valor_transacao") >= F.lit(BURST_ALERT_VALUE))
        .groupBy(
            "id_usuario_pagador",
            F.date_trunc("day", F.col("data_horario")).alias("dia"),
        )
        .agg(
            (F.min(F.unix_micros(F.col("data_horario")))
             - F.lit(BURST_PAD_US)).alias("ini_us"),
            (F.max(F.unix_micros(F.col("data_horario")))
             + F.lit(BURST_PAD_US)).alias("fim_us"),
            F.count("*").alias("alertas"),
        )
    )
    return bursts.join(
        F.broadcast(u),
        bursts.id_usuario_pagador == u.id_usuario,
    ).drop("id_usuario")


def interval_overlap_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap THETA join between two genuinely UNBOUNDED sides
    — the shape range_join_tx_in_alert_window (point-in-interval vs a
    broadcastable dim) does not cover. Pairs of DISTINCT same-region
    payers whose high-value burst intervals overlap (the fraud-ring
    co-activity screen).

    Scalable form (bucketize BOTH sides): explode each interval to the
    hour buckets it covers, equi-join on (region, bucket), filter the
    exact overlap predicate — and keep each qualifying pair ONLY in the
    bucket containing the overlap's start (greatest of the two interval
    starts), which every overlapping pair covers exactly once — so no
    DISTINCT is ever planned over the match set. Shuffles on (region,
    bucket) only; per-interval fanout is bounded by its duration /
    bucket width; no nested loop, no broadcast requirement on either
    side."""
    bursts = _alert_bursts(spark, sf_dir)

    def _exploded(side: str) -> DataFrame:
        return bursts.select(
            F.col("id_regiao_u"),
            F.col("id_usuario_pagador").alias(f"id_pagador_{side}"),
            F.col("dia").alias(f"dia_{side}"),
            F.col("ini_us").alias(f"ini_{side}"),
            F.col("fim_us").alias(f"fim_{side}"),
            F.col("alertas").alias(f"alertas_{side}"),
        ).withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"ini_{side}") / F.lit(BURST_BUCKET_US)),
                    F.floor(F.col(f"fim_{side}") / F.lit(BURST_BUCKET_US)),
                )
            ),
        )

    a, b = _exploded("a"), _exploded("b")
    pairs = (
        a.join(b, ["id_regiao_u", "bucket"])
        .filter(
            (F.col("id_pagador_a") < F.col("id_pagador_b"))
            & (F.col("ini_a") <= F.col("fim_b"))
            & (F.col("ini_b") <= F.col("fim_a"))
            # dedupe without DISTINCT: exactly the overlap-start bucket
            & (
                F.col("bucket")
                == F.floor(
                    F.greatest(F.col("ini_a"), F.col("ini_b"))
                    / F.lit(BURST_BUCKET_US)
                )
            )
        )
    )
    return pairs.select(
        "id_regiao_u",
        "id_pagador_a", "dia_a", "alertas_a",
        "id_pagador_b", "dia_b", "alertas_b",
        F.greatest(F.col("ini_a"), F.col("ini_b")).alias("inicio_overlap_us"),
        F.least(F.col("fim_a"), F.col("fim_b")).alias("fim_overlap_us"),
        (
            F.least(F.col("fim_a"), F.col("fim_b"))
            - F.greatest(F.col("ini_a"), F.col("ini_b"))
        ).alias("sobreposicao_us"),
    )


_BURSTS_CTE = f"""
bursts AS (
    SELECT t.id_usuario_pagador,
           DATE_TRUNC('day', t.data_horario) AS dia,
           MIN(EPOCH_US(t.data_horario)) - 3600000000 AS ini_us,
           MAX(EPOCH_US(t.data_horario)) + 3600000000 AS fim_us,
           COUNT(*) AS alertas,
           ANY_VALUE(u.id_regiao_u) AS id_regiao_u
    FROM transactions t
    JOIN users u ON u.id_usuario = t.id_usuario_pagador
    WHERE t.valor_transacao >= {BURST_ALERT_VALUE}
    GROUP BY 1, 2
)
"""


INTERVAL_OVERLAP_SQL = datamodel.with_ctes(
    """
SELECT a.id_regiao_u,
       a.id_usuario_pagador AS id_pagador_a, a.dia AS dia_a,
       a.alertas AS alertas_a,
       b.id_usuario_pagador AS id_pagador_b, b.dia AS dia_b,
       b.alertas AS alertas_b,
       GREATEST(a.ini_us, b.ini_us) AS inicio_overlap_us,
       LEAST(a.fim_us, b.fim_us) AS fim_overlap_us,
       LEAST(a.fim_us, b.fim_us) - GREATEST(a.ini_us, b.ini_us)
           AS sobreposicao_us
FROM bursts a
JOIN bursts b
  ON a.id_regiao_u = b.id_regiao_u
 AND a.id_usuario_pagador < b.id_usuario_pagador
 AND a.ini_us <= b.fim_us
 AND b.ini_us <= a.fim_us""",
    extra_ctes=_BURSTS_CTE,
)
