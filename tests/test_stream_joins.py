"""Stream-stream join vs batch twin; dead-letter split on corrupt input."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.sources import stream as stream_src
from banking_streaming_etl_spark.streaming import joins as sjoins

SF = "/root/testdata/sf0.001"

import pytest


@pytest.fixture(scope="module")
def joins_replay_dir(spark):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="replay_joins_")
    stream_src.write_replay_chunks(spark, SF, d, n_chunks=2)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_join_matches_batch(spark, joins_replay_dir):
    tx = stream_src.read_transaction_stream(spark, joins_replay_dir)

    out = sjoins.payer_chain_join(tx)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("chain_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.id_tx_origem, r.id_tx_destino)
        for r in spark.sql("SELECT * FROM chain_out").collect()
    }

    # batch twin: plain self-join with the same time-range condition
    t = datamodel.transactions(spark, SF)
    a = t.select(
        F.col("id_transacao").alias("id_tx_origem"),
        F.col("id_usuario_recebedor").alias("u"),
        F.col("data_horario").alias("ts_a"),
    )
    b = t.select(
        F.col("id_transacao").alias("id_tx_destino"),
        F.col("id_usuario_pagador").alias("u"),
        F.col("data_horario").alias("ts_b"),
    )
    want = {
        (r.id_tx_origem, r.id_tx_destino)
        for r in a.join(b, "u")
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 1 hour"))
        )
        .collect()
    }
    assert len(want) > 0
    # append-mode stream emits only watermark-closed results; every emitted
    # pair must be correct, and coverage must be near-complete (the final
    # watermark leaves at most the tail unflushed)
    assert got <= want
    assert len(got) >= int(len(want) * 0.9)


def test_dead_letter_split(spark, tmp_path, joins_replay_dir):
    # copy the shared chunks so the injected garbage doesn't leak to others
    import shutil

    d = str(tmp_path / "chunks")
    shutil.copytree(joins_replay_dir, d)
    # inject corrupt lines, including a PARTIALLY-malformed record whose
    # key parses but whose event time is garbage (must be a dead letter —
    # it would otherwise silently vanish at the watermark)
    partial = '{"id_transacao": 77, "data_horario": "not-a-timestamp"}'
    with open(f"{d}/garbage.txt", "w") as f:
        f.write(f"not json at all\n{{broken:\n{partial}\n")

    raw = spark.readStream.format("text").load(d)
    valid, dead = sjoins.split_valid_invalid(
        raw, stream_src.transaction_schema()
    )
    q1 = valid.writeStream.format("memory").queryName("dlq_valid").start()
    q2 = dead.writeStream.format("memory").queryName("dlq_dead").start()
    q1.processAllAvailable()
    q2.processAllAvailable()
    q1.stop()
    q2.stop()

    n_valid = spark.sql("SELECT count(*) FROM dlq_valid").first()[0]
    dead_rows = spark.sql("SELECT * FROM dlq_dead").collect()
    assert n_valid == 1000
    assert {r.raw for r in dead_rows} == {
        "not json at all",
        "{broken:",
        '{"id_transacao": 77, "data_horario": "not-a-timestamp"}',
    }
    assert all(r.erro == "PARSE_ERROR" for r in dead_rows)


def test_stream_stream_left_outer_join(spark, joins_replay_dir):
    """Left-outer flavor: matched pairs behave exactly like the inner
    join; origins with no chained destination emit once, null-extended,
    after the watermark proves no match can still arrive."""
    tx = stream_src.read_transaction_stream(spark, joins_replay_dir)

    out = sjoins.payer_chain_join(tx, how="left_outer")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("chain_outer")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM chain_outer").collect()
    got_matched = {
        (r.id_tx_origem, r.id_tx_destino)
        for r in rows
        if r.id_tx_destino is not None
    }
    got_null = {r.id_tx_origem for r in rows if r.id_tx_destino is None}

    # batch truth
    t = datamodel.transactions(spark, SF)
    a = t.select(
        F.col("id_transacao").alias("id_tx_origem"),
        F.col("id_usuario_recebedor").alias("u"),
        F.col("data_horario").alias("ts_a"),
    )
    b = t.select(
        F.col("id_transacao").alias("id_tx_destino"),
        F.col("id_usuario_pagador").alias("u"),
        F.col("data_horario").alias("ts_b"),
    )
    pairs = (
        a.join(b, "u")
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 1 hour"))
        )
        .select("id_tx_origem", "id_tx_destino")
    )
    want_pairs = {(r.id_tx_origem, r.id_tx_destino) for r in pairs.collect()}
    matched_origins = {p[0] for p in want_pairs}
    all_origins = {r.id_tx_origem for r in a.collect()}
    want_null = all_origins - matched_origins

    assert got_matched <= want_pairs
    # every null-extension is genuinely unmatched in the batch truth
    assert got_null <= want_null
    assert len(got_null) > 0  # outer rows actually fire
    # an origin never emits both null-extended and matched
    assert not (got_null & {p[0] for p in got_matched})
