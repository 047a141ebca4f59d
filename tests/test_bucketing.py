"""Bucketed co-located join: assert the join plans with ZERO shuffles."""

from __future__ import annotations

import contextlib
import io

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.operators import bucketing

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    li = datamodel.load_table(spark, SF, "lineitem")
    o = datamodel.load_table(spark, SF, "orders")
    bucketing.write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=4)
    bucketing.write_bucketed(o, "o_bucketed", "o_orderkey", n_buckets=4)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at bench scale Catalyst rightly broadcasts the small side and skips
        # the buckets; disable auto-broadcast to exercise the at-scale plan
        # (two 100 TB fact tables: SortMergeJoin over co-located buckets).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketing.bucketed_join(
            spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(True)
        plan = buf.getvalue()
        physical = plan[plan.index("== Physical Plan ==") :]
        assert "ShuffleExchange" not in physical, physical
        assert "Exchange hashpartitioning" not in physical, physical
        assert "SortMergeJoin" in physical, physical
        # and the result is correct
        plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_aqe_splits_planted_skew_join(spark):
    """The 100 TB skew story, end-to-end: a join whose left side is 90%
    one hot key must be rescued at runtime by AQE's OptimizeSkewedJoin —
    the final adaptive plan carries a skew=true SortMergeJoin (the hot
    partition was split into parallel subtasks) and the result is still
    exact. Thresholds are lowered to make a test-sized partition count as
    skewed; the mechanism is identical at production sizes. The salting
    twin for AGGREGATION skew is payer_totals_salted (oracle-checked)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        n = 60_000
        # 90% of the fact rows hit key 0; dimension side is uniform
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("payload")
        )
        joined = fact.join(dim, "k")
        # collect() executes THIS frame's QueryExecution (count() would
        # execute a different aggregated plan), finalizing the AQE plan
        rows = joined.collect()
        assert len(rows) == n  # every fact row matches exactly one dim row
        # the FINAL adaptive plan (after execution) must show the skew split
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bucketed_ivm_history_joins_with_delta_sized_shuffle_only(spark):
    """Round 14: the SCALING.md layout upgrade for the delta-join IVM
    (streaming/sinks.MaterializedJoinView), demonstrated: with the
    HISTORY side of dA JOIN B_{<=N} persisted as a catalog table
    bucketed on the join key, the per-epoch maintenance join plans
    exactly ONE hash exchange — on the DELTA side, sized by the delta —
    while the history scan stays in place. That makes per-epoch IVM
    cost O(|delta| shuffle + history scan), never a history reshuffle."""
    from pyspark.sql import functions as F

    from banking_streaming_etl_spark.operators.asof import BURST_ALERT_VALUE

    t = datamodel.transactions(spark, SF)
    history = t.filter(F.col("valor_transacao") >= BURST_ALERT_VALUE).select(
        "id_usuario_pagador",
        F.col("id_transacao").alias("id_alerta"),
        F.col("valor_transacao").alias("valor_alerta"),
    )
    bucketing.write_bucketed(
        history, "ivm_alert_history", "id_usuario_pagador", n_buckets=4
    )
    delta = t.filter(F.col("id_transacao") % 7 == 0).select(
        "id_usuario_pagador", "id_transacao", "valor_transacao"
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = delta.join(
            spark.table("ivm_alert_history"), "id_usuario_pagador"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(True)
        plan = buf.getvalue()
        physical = plan[plan.index("== Physical Plan ==") :]
        # exactly one exchange — the delta side entering the bucket layout
        assert physical.count("Exchange hashpartitioning") == 1, physical
        assert "SortMergeJoin" in physical, physical
        plain = delta.join(history, "id_usuario_pagador").count()
        assert joined.count() == plain and plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS ivm_alert_history")
