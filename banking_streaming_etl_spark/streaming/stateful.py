"""Stateful streaming done right: the reference's failed experiment, revived.

The reference tried "last approved transaction per user" with
applyInPandasWithState and hit >60 s micro-batches — per-row JVM<->Python
state exchange (SURVEY.md §4.4, PDF p. 8). The operators here keep state in
the JVM state store (RocksDB-backed on a cluster), partitioned by the group
key, with watermark-driven eviction — the per-user state path at any scale:

- `last_tx_per_user`: streaming max_by aggregation in update mode — state
  is one row per user.
- `running_user_totals`: streaming sum/count per user (update mode).
- `dedup_within_watermark` lives in streaming/windows.py (same family).

For ad-hoc per-group logic Spark offers transformWithStateInPandas /
applyInPandasWithState; they remain the slow path and nothing in this
engine's surface needs them — every stateful requirement maps to JVM-native
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def last_tx_per_user(approved_stream: DataFrame) -> DataFrame:
    """Latest transaction per payer (update mode): max_by over event time
    with id tiebreak via struct ordering — one state row per user."""
    return approved_stream.groupBy("id_usuario_pagador").agg(
        F.max_by(
            F.struct(
                "data_horario",
                "id_transacao",
                "valor_transacao",
                "transacao_aprovada",
            ),
            F.struct("data_horario", "id_transacao"),
        ).alias("ultima"),
    ).select(
        "id_usuario_pagador",
        F.col("ultima.data_horario").alias("data_horario"),
        F.col("ultima.id_transacao").alias("id_transacao"),
        F.col("ultima.valor_transacao").alias("valor_transacao"),
        F.col("ultima.transacao_aprovada").alias("transacao_aprovada"),
    )


def last_approved_tx_per_user(approved_stream: DataFrame) -> DataFrame:
    """The exact feature the reference removed: last APPROVED tx per user."""
    return last_tx_per_user(
        approved_stream.filter(F.col("transacao_aprovada"))
    )


def running_user_totals(approved_stream: DataFrame) -> DataFrame:
    """Per-user running count/sum/approval-rate (update mode)."""
    return approved_stream.groupBy("id_usuario_pagador").agg(
        F.count("*").alias("total_transacoes"),
        F.sum("valor_transacao").alias("valor_total"),
        F.avg(F.col("transacao_aprovada").cast("double")).alias(
            "taxa_aprovacao"
        ),
    )
