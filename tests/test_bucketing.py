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
