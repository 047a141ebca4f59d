"""operators/memo.shared_frame: session-lifetime family-derivation memo.

Pins the three properties the EXTRA-sweep timings and the family
queries rely on: (1) same (session, sf_dir, kind) key -> the SAME
DataFrame object, built exactly once; (2) different sf_dirs of the
live session get independent entries (bench walks two sf dirs in one
session); (3) the memoized frame survives `spark.catalog.clearCache()`
without recomputation — bench evicts between EXTRA queries, and a
cache()-backed memo would silently re-derive per family member.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_streaming_etl_spark.operators import memo


def test_shared_frame_builds_once_and_returns_same_object(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).withColumn("x", F.col("id") * 2)

    a = memo.shared_frame(spark, "/tmp/sfA", "t_once", build)
    b = memo.shared_frame(spark, "/tmp/sfA", "t_once", build)
    assert a is b
    assert calls["n"] == 1
    assert a.count() == 5


def test_shared_frame_keys_on_sf_dir_and_kind(spark):
    a = memo.shared_frame(spark, "/tmp/sfA", "t_key", lambda: spark.range(3))
    b = memo.shared_frame(spark, "/tmp/sfB", "t_key", lambda: spark.range(4))
    c = memo.shared_frame(spark, "/tmp/sfA", "t_key2", lambda: spark.range(5))
    assert a is not b and a is not c
    assert (a.count(), b.count(), c.count()) == (3, 4, 5)


def test_shared_frame_normalizes_sf_dir_key(spark):
    a = memo.shared_frame(spark, "/tmp/sfA", "t_norm", lambda: spark.range(3))
    b = memo.shared_frame(spark, "/tmp/sfA/", "t_norm", lambda: spark.range(9))
    assert b is a  # '/x' and '/x/' must share one checkpointed entry


def test_shared_frame_nested_builds_do_not_deadlock(spark):
    """Builders NEST in production (_cal_rank_asc's lambda calls the
    memoized _cal_scored) — the build lock must be reentrant, and
    concurrent same-key callers must still get ONE build."""
    import threading

    calls = {"inner": 0, "outer": 0}

    def inner():
        calls["inner"] += 1
        return spark.range(4)

    def outer():
        calls["outer"] += 1
        base = memo.shared_frame(spark, "/tmp/sfA", "t_nest_in", inner)
        return base.withColumn("y", F.col("id") + 1)

    results = [None, None]

    def run(i):
        results[i] = memo.shared_frame(spark, "/tmp/sfA", "t_nest_out", outer)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
        assert not t.is_alive(), "shared_frame deadlocked on nested build"
    assert results[0] is results[1]
    assert calls == {"inner": 1, "outer": 1}
    assert results[0].count() == 4


def test_shared_frame_survives_cache_eviction(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(7)

    a = memo.shared_frame(spark, "/tmp/sfA", "t_evict", build)
    assert a.count() == 7
    spark.catalog.clearCache()  # the EXTRA sweep's between-query eviction
    b = memo.shared_frame(spark, "/tmp/sfA", "t_evict", build)
    assert b is a
    assert calls["n"] == 1
    # the checkpointed data is still readable post-eviction (a lazily
    # cached memo would silently recompute here instead)
    assert b.count() == 7
