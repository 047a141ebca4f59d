"""Risk-score and approval-flag expressions (the reference's core semantics).

Mirrors containers/spark-etl/streaming_etl.py:115-153 with the *production*
semantics where the reference's surfaces disagree (SURVEY.md §2.11 wrinkles):

- ``score_medio`` is the PRODUCT (t5*t6*t7)/3 (streaming_etl.py:127-129), not
  the old sum/3 (src/streaming_etl_old.py:125-127) — the report says the
  multiplication is intentional (t6=0 neutralizes the other scores).
- ``t7_score`` is SIGNED (hour-12)/12 (streaming_etl.py:124-126); the
  dashboard's unsigned abs() variant is exposed separately as
  ``time_score_abs`` for the analytics layer (dashboard.py:208).
- Limit checks use strict ``<`` (streaming_etl.py:140-148).

Everything here is a pure Column expression — JVM-side, codegen-friendly,
no UDFs (the reference's one stateful-Python experiment was a 60x latency
regression, SURVEY.md §4.4 — the hot path stays JVM-only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from banking_streaming_etl_spark.datamodel import (
    LIMIT_WEIGHTS,
    SCORE_THRESHOLD,
    T6_VALUE_THRESHOLD,
)


def t5_distance_score(
    lat_t: str = "latitude_t",
    lon_t: str = "longitude_t",
    lat_u: str = "latitude_u",
    lon_u: str = "longitude_u",
) -> Column:
    """Flat Euclidean distance between tx region and payer region
    (streaming_etl.py:115-120 — the pipeline deliberately uses Euclidean;
    the dashboard's geodesic variant lives in functions.geo.haversine_km)."""
    dlat = F.col(lat_t) - F.col(lat_u)
    dlon = F.col(lon_t) - F.col(lon_u)
    return F.sqrt(dlat * dlat + dlon * dlon)


def t6_value_score(valor: str = "valor_transacao") -> Column:
    """High-value indicator: bool -> double cast (streaming_etl.py:121-123)."""
    return (F.col(valor) > F.lit(T6_VALUE_THRESHOLD)).cast("double")


def t7_time_score(ts: str = "data_horario") -> Column:
    """Signed time-of-day risk (hour-12)/12 (streaming_etl.py:124-126)."""
    return (F.hour(F.col(ts)) - F.lit(12)) / F.lit(12.0)


def time_score_abs(ts: str = "data_horario") -> Column:
    """Dashboard variant: abs(hour-12)/12 (dashboard.py:208)."""
    return F.abs(F.hour(F.col(ts)) - F.lit(12)) / F.lit(12.0)


def score_medio(
    t5: str = "t5_score", t6: str = "t6_score", t7: str = "t7_score"
) -> Column:
    """Product-of-scores / 3 (streaming_etl.py:127-129).

    The trailing + 0.0 normalizes the SIGN OF ZERO (IEEE: -0.0 + 0.0 =
    +0.0; exact identity for every other value): t6 = 0 with a negative
    t7 yields -0.0, and a -0.0 that later reaches a Spark groupBy/sort
    KEY is normalized to +0.0 (SPARK-32110) while DuckDB's GROUP BY
    preserves it — the round-8 conformal_by_modality driver hash miss.
    Same term in SCORE_MEDIO_SQL keeps the dialects bit-identical."""
    return (F.col(t5) * F.col(t6) * F.col(t7)) / F.lit(3.0) + F.lit(0.0)


def score_aprovado(score: str = "score_medio") -> Column:
    """when(score > 6, False).otherwise(True) (streaming_etl.py:130-132) —
    NULL score (unmatched payer) approves, matching the reference's
    otherwise() branch."""
    return F.when(F.col(score) > F.lit(SCORE_THRESHOLD), F.lit(False)).otherwise(
        F.lit(True)
    )


def saldo_aprovado(
    saldo: str = "saldo", valor: str = "valor_transacao"
) -> Column:
    """when(saldo > valor, True).otherwise(False) (streaming_etl.py:133-135)."""
    return F.when(F.col(saldo) > F.col(valor), F.lit(True)).otherwise(F.lit(False))


def limite_da_modalidade(
    modalidade: str = "modalidade_pagamento", prefix: str = "limite_"
) -> Column:
    """Chained when picking the per-modality limit column
    (streaming_etl.py:136-149)."""
    expr = None
    for m in LIMIT_WEIGHTS:
        cond = F.col(modalidade) == F.lit(m)
        expr = F.when(cond, F.col(f"{prefix}{m}")) if expr is None else expr.when(
            cond, F.col(f"{prefix}{m}")
        )
    return expr


def limite_aprovado(
    valor: str = "valor_transacao", modalidade: str = "modalidade_pagamento"
) -> Column:
    """Strict < against the modality's limit; NULL limit (unmatched payer)
    -> False via coalesce, matching SQL CASE ... ELSE FALSE."""
    return F.coalesce(
        F.col(valor) < limite_da_modalidade(modalidade), F.lit(False)
    )


def transacao_aprovada(
    score_flag: str = "score_aprovado",
    saldo_flag: str = "saldo_aprovado",
    limite_flag: str = "limite_aprovado",
) -> Column:
    """Final approval = conjunction of the three flags
    (streaming_etl.py:150-153)."""
    return F.col(score_flag) & F.col(saldo_flag) & F.col(limite_flag)


# --- SQL twins (DuckDB oracle fragments) -----------------------------------

T5_SQL = (
    "SQRT((latitude_t - latitude_u) * (latitude_t - latitude_u)"
    " + (longitude_t - longitude_u) * (longitude_t - longitude_u))"
)
T6_SQL = f"CAST(valor_transacao > {T6_VALUE_THRESHOLD} AS DOUBLE)"
T7_SQL = "(HOUR(data_horario) - 12) / 12.0"
TIME_ABS_SQL = "ABS(HOUR(data_horario) - 12) / 12.0"
SCORE_MEDIO_SQL = "(t5_score * t6_score * t7_score) / 3.0 + 0.0"
SCORE_APROVADO_SQL = (
    f"CASE WHEN score_medio > {SCORE_THRESHOLD} THEN FALSE ELSE TRUE END"
)
SALDO_APROVADO_SQL = (
    "CASE WHEN saldo > valor_transacao THEN TRUE ELSE FALSE END"
)
LIMITE_DA_MODALIDADE_SQL = "CASE " + " ".join(
    f"WHEN modalidade_pagamento = '{m}' THEN limite_{m}" for m in LIMIT_WEIGHTS
) + " END"
LIMITE_APROVADO_SQL = (
    f"COALESCE(valor_transacao < ({LIMITE_DA_MODALIDADE_SQL}), FALSE)"
)
TRANSACAO_APROVADA_SQL = "(score_aprovado AND saldo_aprovado AND limite_aprovado)"

#: CTE computing scores + flags on top of `enriched` (datamodel.SQL_CTES).
SCORED_CTE = f"""
scored AS (
    SELECT *,
        {T5_SQL} AS t5_score,
        {T6_SQL} AS t6_score,
        {T7_SQL} AS t7_score
    FROM enriched
),
flagged AS (
    SELECT *, {SCORE_APROVADO_SQL.replace('score_medio', SCORE_MEDIO_SQL)} AS score_aprovado,
        {SCORE_MEDIO_SQL} AS score_medio,
        {SALDO_APROVADO_SQL} AS saldo_aprovado,
        {LIMITE_APROVADO_SQL} AS limite_aprovado
    FROM scored
),
approved AS (
    SELECT *, {TRANSACAO_APROVADA_SQL} AS transacao_aprovada
    FROM flagged
)
"""
