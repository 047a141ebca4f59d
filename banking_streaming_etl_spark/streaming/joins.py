"""Stream-stream joins and dead-letter routing.

Beyond the reference's stream-static joins (its only join flavor), a
complete streaming engine needs:

- stream-stream equi-joins with event-time bounds: both sides buffer in
  watermarked state; the time-range predicate bounds state size. Used here
  to correlate payer->recipient chains ("recipient pays someone within
  1 hour of being paid").
- dead-letter routing: the reference silently drops rows whose JSON fails
  to parse (from_json -> NULL struct -> dados.* nulls). Production ETL
  splits the stream instead: valid rows continue, invalid raw lines land
  in a quarantine sink with an error tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def payer_chain_join(
    tx_stream: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: transaction B whose payer was the recipient of
    an earlier transaction A, within `max_gap` of A.

    Both sides watermarked; the event-time range condition lets the engine
    expire buffered state — without it a stream-stream join's state grows
    unboundedly.

    `how="left_outer"` emits unmatched origin transactions with NULL
    destination columns ("money that arrived and never moved on") — the
    null-extension fires only once the watermark proves no match can
    still arrive, which is why outer stream-stream joins REQUIRE both the
    watermark and the time bound (Spark rejects the plan otherwise).
    """
    a = (
        tx_stream.withWatermark("data_horario", watermark)
        .select(
            F.col("id_transacao").alias("id_tx_origem"),
            F.col("id_usuario_recebedor").alias("usuario_meio"),
            F.col("data_horario").alias("ts_origem"),
            F.col("valor_transacao").alias("valor_origem"),
        )
    )
    b = (
        tx_stream.withWatermark("data_horario", watermark)
        .select(
            F.col("id_transacao").alias("id_tx_destino"),
            F.col("id_usuario_pagador").alias("usuario_meio_b"),
            F.col("data_horario").alias("ts_destino"),
            F.col("valor_transacao").alias("valor_destino"),
        )
    )
    cond = (
        (F.col("usuario_meio") == F.col("usuario_meio_b"))
        & (F.col("ts_destino") > F.col("ts_origem"))
        & (
            F.col("ts_destino")
            <= F.col("ts_origem") + F.expr(f"INTERVAL {max_gap}")
        )
    )
    return a.join(b, cond, how).select(
        "id_tx_origem",
        "id_tx_destino",
        F.col("usuario_meio").alias("id_usuario_meio"),
        "ts_origem",
        "ts_destino",
        "valor_origem",
        "valor_destino",
    )


def split_valid_invalid(
    raw_lines: DataFrame,
    schema: T.StructType,
    required_fields: tuple[str, ...] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parse raw JSON lines; return (valid flattened rows, dead letters).

    from_json is PERMISSIVE: malformed JSON yields an all-null struct, not
    a NULL — so validity is a required-field contract check. Default
    required fields are the record key AND the event-time column: a record
    whose key parses but whose timestamp is garbage would otherwise pass as
    'valid' and then silently vanish at the watermark — the exact silent
    drop this path exists to prevent. Dead letters keep the raw line plus
    an ingest timestamp so the quarantine sink preserves evidence for
    replay after a schema fix.
    """
    if required_fields is None:
        required_fields = (schema.fields[0].name, "data_horario")
    parsed = raw_lines.select(
        F.col("value").cast("string").alias("raw"),
        F.from_json(F.col("value").cast("string"), schema).alias("dados"),
        F.current_timestamp().alias("tempo_entrada_kafka"),
    )
    ok = None
    for f in required_fields:
        c = F.col(f"dados.{f}").isNotNull()
        ok = c if ok is None else (ok & c)
    valid = parsed.filter(ok).select("dados.*", "tempo_entrada_kafka")
    dead = parsed.filter(~ok).select(
        "raw",
        F.lit("PARSE_ERROR").alias("erro"),
        "tempo_entrada_kafka",
    )
    return valid, dead
