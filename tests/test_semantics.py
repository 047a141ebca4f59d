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
    """Wrinkle 1: production multiplies (t6=0 neutralizes); old code summed."""
    df = _scored(spark)
    row = df.filter(
        (F.col("t6_score") == 0.0) & F.col("t5_score").isNotNull()
    ).first()
    assert row is not None
    assert row.score_medio == 0.0  # product semantics: t6=0 zeroes the score
    # and explicitly not the sum variant:
    sum_variant = (row.t5_score + row.t6_score + row.t7_score) / 3.0
    assert abs(sum_variant) > 0 or row.t5_score == -row.t7_score


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
    saldo check denies, limite check denies (coalesce false)."""
    df = _scored(spark)
    unmatched = df.filter(F.col("t5_score").isNull())
    if unmatched.count() == 0:
        return  # every payer matched at this sf
    r = unmatched.first()
    assert r.score_aprovado is True
    assert r.saldo_aprovado is False
    assert r.limite_aprovado is False
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
