"""Tests pinning the reference's semantic wrinkles (SURVEY.md §2.11) —
each a deliberate, documented decision in this engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.functions import scores
from banking_streaming_etl_spark.plans.approval import approval_pipeline

SF = "/root/testdata/sf0.001"


def _scored(spark):
    return approval_pipeline(spark, SF).cache()


def test_score_medio_is_product_not_sum(spark):
    """Wrinkle 1: production multiplies (t6=0 neutralizes); old code summed.
    Discriminating witness: a row where t6=0 but t5+t7 != 0 — the product
    is 0 there while the sum variant is not."""
    df = _scored(spark)
    row = df.filter(
        (F.col("t6_score") == 0.0)
        & F.col("t5_score").isNotNull()
        & (F.col("t5_score") + F.col("t7_score") != 0.0)
    ).first()
    assert row is not None  # such rows exist in the fixture
    assert row.score_medio == 0.0  # product semantics: t6=0 zeroes the score
    sum_variant = (row.t5_score + row.t6_score + row.t7_score) / 3.0
    assert sum_variant != 0.0  # the sum variant would NOT be zero here


def test_t7_is_signed_in_pipeline(spark):
    """Wrinkle 2: pipeline t7 is signed; dashboard's is absolute."""
    df = _scored(spark)
    has_negative = df.filter(F.col("t7_score") < 0).count()
    assert has_negative > 0  # morning hours -> negative signed score
    # dashboard variant is always >= 0
    d = datamodel.transactions(spark, SF).select(
        scores.time_score_abs().alias("abs_score")
    )
    assert d.filter(F.col("abs_score") < 0).count() == 0


def test_limit_check_strict_less_than(spark):
    """Wrinkle 4: production uses valor < limite (strict); equality denies."""
    import pyspark.sql.types as T

    row_schema = T.StructType(
        [
            T.StructField("valor_transacao", T.DoubleType()),
            T.StructField("modalidade_pagamento", T.StringType()),
            T.StructField("limite_click", T.DoubleType()),
            T.StructField("limite_error", T.DoubleType()),
            T.StructField("limite_purchase", T.DoubleType()),
            T.StructField("limite_signup", T.DoubleType()),
            T.StructField("limite_view", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(100.0, "click", 100.0, 1.0, 1.0, 1.0, 1.0)], row_schema
    ).select(scores.limite_aprovado().alias("ok"))
    assert df.first().ok is False  # valor == limite -> denied


def test_null_payer_approves_score_but_denies_saldo(spark):
    """NULL semantics: unmatched payer -> score approves (otherwise branch),
    saldo check denies, limite check denies (coalesce false). The fixture
    has no unmatched payers at any sf, so the NULL path is exercised with a
    synthetic enriched row (all dim columns NULL) pushed through the same
    flag expressions the pipeline uses."""
    import pyspark.sql.types as T

    from banking_streaming_etl_spark.plans.approval import (
        with_approval_flags,
        with_scores,
    )

    fields = [
        T.StructField("id_transacao", T.LongType()),
        T.StructField("id_usuario_pagador", T.LongType()),
        T.StructField("modalidade_pagamento", T.StringType()),
        T.StructField("data_horario", T.TimestampType()),
        T.StructField("valor_transacao", T.DoubleType()),
        T.StructField("saldo", T.DoubleType()),
        T.StructField("latitude_t", T.DoubleType()),
        T.StructField("longitude_t", T.DoubleType()),
        T.StructField("latitude_u", T.DoubleType()),
        T.StructField("longitude_u", T.DoubleType()),
    ] + [
        T.StructField(f"limite_{m}", T.DoubleType())
        for m in datamodel.MODALITIES
    ]
    import datetime

    row = (
        1,
        999_999,
        "click",
        datetime.datetime(2024, 1, 1, 9, 0, 0),
        50.0,
    ) + (None,) * (len(fields) - 5)
    enriched = spark.createDataFrame([row], T.StructType(fields))
    r = with_approval_flags(with_scores(enriched)).first()
    assert r.t5_score is None and r.score_medio is None
    assert r.score_aprovado is True  # otherwise() branch approves on NULL
    assert r.saldo_aprovado is False  # NULL saldo > valor -> otherwise False
    assert r.limite_aprovado is False  # coalesce(NULL, False)
    assert r.transacao_aprovada is False


def test_latency_columns_are_true_milliseconds(spark, tmp_path):
    """Wrinkle 3: reference computes *seconds* in columns named _ms; this
    engine computes true milliseconds (documented fix in streaming/pipeline)."""
    from banking_streaming_etl_spark.sources import stream as stream_src
    from banking_streaming_etl_spark.streaming import pipeline as spipe

    d = str(tmp_path / "chunks")
    stream_src.write_replay_chunks(spark, SF, d, n_chunks=1)
    tx = stream_src.read_transaction_stream(spark, d)
    out = spipe.approval_stream(
        tx, datamodel.users(spark, SF), datamodel.regions(spark, SF)
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lat_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    r = spark.sql(
        "SELECT max(tempo_processamento_ms) AS m FROM lat_out"
    ).first()
    # true millis: a batch takes < 5 minutes; second-granularity columns
    # would be tiny integers, millis are allowed to be any non-negative int
    assert r.m is not None and 0 <= r.m < 300_000


def test_synthetic_producer_deterministic(spark):
    from banking_streaming_etl_spark.plans.batchdev import synthetic_transactions

    a = synthetic_transactions(spark, SF).orderBy("data_horario").take(5)
    b = synthetic_transactions(spark, SF).orderBy("data_horario").take(5)
    # seeded rand: same draws; uuid differs by design
    assert [r.valor_transacao for r in a] == [r.valor_transacao for r in b]
    assert [r.modalidade_pagamento for r in a] == [r.modalidade_pagamento for r in b]


def test_approx_aggregates_near_exact(spark):
    from banking_streaming_etl_spark.plans.batchdev import approx_aggregates

    for r in approx_aggregates(spark, SF).collect():
        rel_err = abs(r.pagadores_aprox - r.pagadores_exato) / max(
            1, r.pagadores_exato
        )
        assert rel_err < 0.1
        assert r.p95_aprox is not None


def test_benford_digit_ladder_exact_at_power_boundaries(spark):
    """The Benford GROUP BY key must be engine-independent: the comparison
    ladder (_benford_digit) is pure IEEE compare/multiply/divide, so both
    Spark and DuckDB must produce the mathematically exact first
    significant digit of the double's value — including the doubles
    immediately adjacent to powers of 10, where a 1-ulp log10/pow
    divergence would flip the digit (the failure class this derivation
    replaces)."""
    import math
    from decimal import Decimal

    import duckdb

    from banking_streaming_etl_spark.plans.dashboard import _benford_digit

    def exact_first_digit(x: float) -> int:
        # Decimal(x) is the EXACT decimal expansion of the binary double
        for ch in format(Decimal(x), "f"):
            if ch in "123456789":
                return int(ch)
        raise AssertionError(f"no significant digit in {x!r}")

    values = []
    for p in (0.001, 0.01, 0.1, 1.0, 10.0, 100.0, 1e3, 1e4, 1e6, 1e9, 1e12):
        values += [
            math.nextafter(p, 0.0),  # just below: digit must be 9
            p,
            math.nextafter(p, math.inf),  # just above: digit must be 1
        ]
    values += [0.5, 2.5, 9.999999, 1234.5678, 7e-5, 3.14159e7]
    truth = [exact_first_digit(v) for v in values]

    df = spark.createDataFrame(list(enumerate(values)), "i int, x double")
    got_spark = [
        r.d
        for r in df.select("i", _benford_digit(F.col("x")).alias("d"))
        .orderBy("i")
        .collect()
    ]
    assert got_spark == truth

    # same ladder, DuckDB dialect (the oracle side of benford_digit_screen);
    # values arrive as a registered float64 frame — NOT SQL literals, which
    # DuckDB parses through DECIMAL and re-rounds (the driver's oracle also
    # reads binary doubles from parquet, never decimal text)
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "benford_vals",
        pd.DataFrame({"i": range(len(values)), "x": values}).astype(
            {"i": "int64", "x": "float64"}
        ),
    )
    rel = con.sql(
        """
        WITH bd0 AS (SELECT i, x FROM benford_vals),
        bd1 AS (SELECT i, CASE WHEN x < 1.0 THEN x * 1e16 ELSE x END AS y FROM bd0),
        bd2 AS (SELECT i, CASE WHEN y < 1.0 THEN y * 1e16 ELSE y END AS y FROM bd1),
        bd3 AS (SELECT i, CASE WHEN y >= 1e16 THEN y / 1e16 ELSE y END AS y FROM bd2),
        bd4 AS (SELECT i, CASE WHEN y >= 1e8 THEN y / 1e8 ELSE y END AS y FROM bd3),
        bd5 AS (SELECT i, CASE WHEN y >= 1e4 THEN y / 1e4 ELSE y END AS y FROM bd4),
        bd6 AS (SELECT i, CASE WHEN y >= 1e2 THEN y / 1e2 ELSE y END AS y FROM bd5),
        bd7 AS (SELECT i, CASE WHEN y >= 1e1 THEN y / 1e1 ELSE y END AS y FROM bd6)
        SELECT CAST(FLOOR(y) AS INTEGER) AS d FROM bd7 ORDER BY i
        """
    ).fetchall()
    con.close()
    assert [r[0] for r in rel] == truth
