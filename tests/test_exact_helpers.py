"""The DECIMAL-accumulation determinism trick, tested directly: for
datasets engineered to expose float-summation order dependence, the Spark
helpers and their SQL twins must produce byte-identical doubles."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from banking_streaming_etl_spark.functions import exact


def _datasets():
    rng = random.Random(7)
    yield "uniform_2dp", [round(rng.uniform(0, 1000), 2) for _ in range(5000)]
    yield "mixed_magnitudes", [
        round(rng.uniform(0, 1), 6) if i % 2 else round(rng.uniform(0, 9e6), 2)
        for i in range(5000)
    ]
    yield "negatives", [round(rng.uniform(-5000, 5000), 4) for _ in range(5000)]


@pytest.mark.parametrize("name,values", list(_datasets()))
def test_exact_aggregates_match_duckdb(spark, tmp_path, name, values):
    path = str(tmp_path / f"vals_{name}.parquet")
    df = spark.createDataFrame([(v,) for v in values], ["x"]).repartition(8)
    df.write.mode("overwrite").parquet(path)

    got = (
        spark.read.parquet(path)
        .agg(
            exact.exact_sum("x", "s"),
            exact.exact_avg("x", "a"),
            exact.exact_std("x", "d"),
        )
        .first()
    )

    con = duckdb.connect()
    want = con.execute(
        f"""SELECT {exact.sql_sum('x', 's')}, {exact.sql_avg('x', 'a')},
                   {exact.sql_std('x', 'd')}
            FROM read_parquet('{path}/*.parquet')"""
    ).fetchone()
    con.close()

    # byte-identical doubles — no tolerance
    assert got.s == want[0], (name, got.s, want[0])
    assert got.a == want[1], (name, got.a, want[1])
    assert got.d == want[2], (name, got.d, want[2])


def test_exact_sum_permutation_and_partition_invariant(spark):
    """Property (hypothesis): exact_sum is invariant to row order and
    partitioning, and equals the true decimal sum — the exact guarantee
    the oracle gate's determinism rests on. Plain float sums fail this
    on adversarial magnitude mixes; the decimal path must not."""
    from decimal import Decimal

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from banking_streaming_etl_spark.functions import exact

    cents = st.integers(min_value=-10**12, max_value=10**12)

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(vals=st.lists(cents, min_size=1, max_size=40))
    def run(vals):
        floats = [v / 100.0 for v in vals]
        want = float(sum(Decimal(v) for v in vals) / 100)
        outs = set()
        for order, parts in ((floats, 1), (list(reversed(floats)), 7)):
            df = spark.createDataFrame(
                [(x,) for x in order], "v double"
            ).repartition(parts)
            outs.add(df.agg(exact.exact_sum("v", "s")).collect()[0].s)
        assert outs == {want}, (outs, want)

    run()


def test_exact_regr2_matches_numpy_lstsq(spark):
    """The closed-form Cramer solve must agree with numpy's least-squares
    on the same data (loose tolerance: numpy solves in float64 without
    the 6-digit moment rounding)."""
    import numpy as np
    from pyspark.sql import functions as F

    from banking_streaming_etl_spark.functions import exact

    rng = [(float(i % 17), float((i * 7) % 13), 0.0) for i in range(200)]
    rows = [
        (x1, x2, 2.5 * x1 - 1.25 * x2 + 4.0 + 0.01 * ((i * 31) % 11 - 5))
        for i, (x1, x2, _) in enumerate(rng)
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    b1, b2, icept = exact.exact_regr2(
        "x1", "x2", "y", "b1", "b2", "icept"
    )
    got = df.agg(b1, b2, icept).collect()[0]

    a = np.array([[r[0], r[1], 1.0] for r in rows])
    yv = np.array([r[2] for r in rows])
    ref, *_ = np.linalg.lstsq(a, yv, rcond=None)
    assert abs(got.b1 - ref[0]) < 1e-3
    assert abs(got.b2 - ref[1]) < 1e-3
    assert abs(got.icept - ref[2]) < 1e-3


def test_portable_lcg_is_a_bijection_and_ansi_safe():
    """Property (hypothesis): every LCG row used by the sketch family
    (KMV / CMS / Bloom share the constant table) is a BIJECTION of
    x % 2^31 — odd multiplier mod a power of two — so "distinct keys map
    to distinct hashes" is a construction guarantee, not a probability;
    and every intermediate stays below 2^63, so ANSI mode can never
    overflow-throw."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from banking_streaming_etl_spark.operators import sketches

    M = sketches._M
    for a, _ in sketches._HASH_CONSTANTS:
        assert a % 2 == 1 and a < M

    @given(
        st.integers(min_value=0, max_value=2**62),
        st.integers(min_value=0, max_value=2**62),
    )
    @settings(max_examples=200, deadline=None)
    def check(x, y):
        for a, b in sketches._HASH_CONSTANTS:
            hx = ((x % M) * a + b) % M
            hy = ((y % M) * a + b) % M
            assert (x % M) * a + b < 2**63  # ANSI bound
            if x % M != y % M:
                assert hx != hy  # bijection on the residue class
            else:
                assert hx == hy

    check()
