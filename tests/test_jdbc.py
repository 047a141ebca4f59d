"""JDBC round-trip (S2 read / K2 write) against embedded Derby.

Spark ships Derby in its own jars (it backs the Hive metastore), so the
JDBC code path — dialect DDL mapping, type propagation, partitioned
parallel scan — is exercised for real without an external database. The
column types mirror the reference's usuarios DDL wrinkles
(historic_data_mock.py:23-33): NUMERIC(15,2) balances -> Spark
Decimal(15,2), UUID keys carried as strings, and timestamps.
"""

from __future__ import annotations

import pytest

from banking_streaming_etl_spark.sources import batch

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "bankdb"
    return f"jdbc:derby:{db};create=true"


def _props():
    return {"driver": DRIVER}


def _sample_users(spark):
    from pyspark.sql import functions as F

    return spark.range(100).select(
        F.col("id").alias("id_usuario"),
        F.expr("uuid()").alias("id_externo"),
        (F.col("id") * 13 % 997 / F.lit(100))
        .cast("decimal(15,2)")
        .alias("saldo"),
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 1_000_000).cast("long")
        ).alias("criado_em"),
    )


def test_jdbc_roundtrip_decimal_uuid_timestamp(spark, derby_url):
    src = _sample_users(spark)
    batch.write_jdbc(
        src,
        derby_url,
        "usuarios",
        mode="overwrite",
        properties=_props(),
        create_table_column_types="id_externo VARCHAR(36)",
    )
    back = batch.read_jdbc(
        spark, derby_url, "usuarios", properties=_props(), cache=False
    )
    dt = dict(back.dtypes)
    # NUMERIC(15,2) survives as decimal(15,2) — no silent double widening
    assert dt["saldo"] == "decimal(15,2)"
    assert dt["id_externo"] == "string"
    assert dt["criado_em"] == "timestamp"
    want = {(r.id_usuario, r.saldo, r.criado_em) for r in src.collect()}
    got = {(r.id_usuario, r.saldo, r.criado_em) for r in back.collect()}
    assert got == want
    # UUIDs propagate verbatim
    src_uuid = {r.id_externo for r in src.collect()}
    back_uuid = {r.id_externo for r in back.collect()}
    assert back_uuid == src_uuid


def test_jdbc_partitioned_parallel_scan(spark, derby_url):
    """The scale path: range-partitioned read opens N cursors instead of
    one; partition count is the contract (each becomes a task)."""
    src = _sample_users(spark)
    batch.write_jdbc(
        src, derby_url, "usuarios_part", mode="overwrite", properties=_props()
    )
    back = batch.read_jdbc(
        spark,
        derby_url,
        "usuarios_part",
        properties=_props(),
        cache=False,
        partition_column="id_usuario",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    # no row lost or duplicated across the partition ranges
    assert back.select("id_usuario").distinct().count() == 100


def test_jdbc_append_mode_accumulates(spark, derby_url):
    """K2 semantics: the reference appends each micro-batch to the
    history table; append must not clobber prior rows."""
    src = _sample_users(spark).limit(10)
    batch.write_jdbc(
        src, derby_url, "historico", mode="overwrite", properties=_props()
    )
    batch.write_jdbc(
        src, derby_url, "historico", mode="append", properties=_props()
    )
    back = batch.read_jdbc(
        spark, derby_url, "historico", properties=_props(), cache=False
    )
    assert back.count() == 20


def test_jdbc_upsert_merge_is_idempotent(spark, derby_url):
    """K2 exactly-once flavor: stage + MERGE upsert — new keys insert,
    existing keys update, and replaying the same batch (post-failure
    retry) changes nothing."""
    from pyspark.sql import functions as F

    users = _sample_users(spark)
    batch.write_jdbc(
        users, derby_url, "upsert_t", mode="overwrite", properties=_props()
    )

    # second batch: 50 updated balances (keys 50..99) + 50 new keys
    delta = spark.range(50, 150).select(
        F.col("id").alias("id_usuario"),
        F.expr("uuid()").alias("id_externo"),
        F.lit(999.99).cast("decimal(15,2)").alias("saldo"),
        F.timestamp_micros(F.lit(1704067200000000)).alias("criado_em"),
    )
    for _ in range(2):  # second pass = simulated retry, must be a no-op
        batch.upsert_jdbc(
            delta, derby_url, "upsert_t", ["id_usuario"], properties=_props()
        )
        back = batch.read_jdbc(
            spark, derby_url, "upsert_t", properties=_props(), cache=False
        )
        assert back.count() == 150
        updated = back.filter("id_usuario >= 50").select("saldo").distinct()
        assert [r.saldo for r in updated.collect()] == [
            __import__("decimal").Decimal("999.99")
        ]
        untouched = back.filter("id_usuario < 50")
        assert untouched.filter("saldo = 999.99").count() == 0


def test_streaming_jdbc_upsert_sink(spark, derby_url, tmp_path):
    """The streaming exactly-once JDBC sink: foreachBatch + staged MERGE.
    Replaying the same stream into the same table (fresh checkpoint, same
    keys) must leave the row set unchanged — duplicate delivery collapses
    in the MERGE instead of double-appending."""
    from functools import partial

    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.sources import stream as stream_src

    replay = str(tmp_path / "chunks")
    stream_src.write_replay_chunks(
        spark, "/root/testdata/sf0.001", replay, n_chunks=2
    )

    def run(ckpt):
        tx = stream_src.read_transaction_stream(spark, replay).select(
            "id_transacao", "valor_transacao"
        )
        q = (
            tx.writeStream.outputMode("append")
            .foreachBatch(
                lambda b, e: batch.upsert_jdbc(
                    b, derby_url, "tx_upsert", ["id_transacao"],
                    properties=_props(),
                )
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # seed the target table so MERGE has something to merge into
    batch.write_jdbc(
        datamodel.transactions(spark, "/root/testdata/sf0.001")
        .select("id_transacao", "valor_transacao")
        .limit(1),
        derby_url,
        "tx_upsert",
        mode="overwrite",
        properties=_props(),
    )
    run("ckpt1")
    n1 = batch.read_jdbc(
        spark, derby_url, "tx_upsert", properties=_props(), cache=False
    ).count()
    run("ckpt2")  # full duplicate delivery
    n2 = batch.read_jdbc(
        spark, derby_url, "tx_upsert", properties=_props(), cache=False
    ).count()
    assert n1 == n2 == 1000
