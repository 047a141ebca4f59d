"""Format coverage: ORC and JSON batch roundtrips alongside parquet/CSV."""

from __future__ import annotations

from banking_streaming_etl_spark import datamodel

SF = "/root/testdata/sf0.001"


def _ids(df):
    return {r.id_transacao for r in df.select("id_transacao").collect()}


def test_orc_roundtrip(spark, tmp_path):
    t = datamodel.transactions(spark, SF).limit(100)
    path = str(tmp_path / "orc_out")
    t.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 100
    assert _ids(back) == _ids(t)
    assert dict(back.dtypes)["data_horario"] == "timestamp"


def test_json_roundtrip_with_schema(spark, tmp_path):
    t = datamodel.transactions(spark, SF).limit(100)
    path = str(tmp_path / "json_out")
    t.write.mode("overwrite").json(path)
    back = spark.read.schema(t.schema).json(path)
    assert back.count() == 100
    assert _ids(back) == _ids(t)


def test_avro_format_gated_with_clear_error(spark, tmp_path):
    """format('avro') needs the external spark-avro module (not bundled);
    the failure mode is the actionable built-in-but-external error, not a
    silent fallback. Parquet/ORC/JSON/CSV cover the bundled formats."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    t = datamodel.transactions(spark, SF).limit(5)
    with pytest.raises(AnalysisException, match="[Aa]vro"):
        t.write.mode("overwrite").format("avro").save(str(tmp_path / "a"))


def test_kafka_source_gated_with_clear_error(spark):
    """The Kafka source requires the connector jar (absent in this
    container); the failure mode is a clear find-data-source error at
    stream declaration, not a silent misbehavior."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from banking_streaming_etl_spark.sources.stream import read_kafka_stream

    with pytest.raises(AnalysisException, match="[Kk]afka"):
        read_kafka_stream(spark, "localhost:9092")


def test_wire_parse_is_source_agnostic(spark):
    """S1 contract without a broker: a Kafka-shaped input (binary value +
    broker timestamp, the exact columns format('kafka') emits) and a
    file-shaped input (string value) funnel through the SAME parse_wire
    and must yield identical parsed schemas and identical rows. This pins
    that every downstream plan (enrich -> scores -> sinks) is
    source-agnostic: swapping the replay source for Kafka changes only
    the reader node, not the pipeline."""
    import datetime

    from pyspark.sql import functions as F

    from banking_streaming_etl_spark.sources import stream as stream_src

    payload = (
        '{"id_transacao": 7, "id_usuario_pagador": 3,'
        ' "id_usuario_recebedor": 9, "id_regiao": 1,'
        ' "modalidade_pagamento": "click",'
        ' "data_horario": "2024-01-01T10:30:00.000001",'
        ' "valor_transacao": 42.5}'
    )
    broker_ts = datetime.datetime(2024, 1, 1, 10, 30, 1)
    kafka_shaped = spark.createDataFrame(
        [(None, payload.encode(), "bank_transactions", 0, 0, broker_ts, 0)],
        "key binary, value binary, topic string, partition int, offset long,"
        " timestamp timestamp, timestampType int",
    )
    file_shaped = spark.createDataFrame([(payload,)], "value string")

    from_kafka = stream_src.parse_wire(kafka_shaped, F.col("timestamp"))
    from_file = stream_src.parse_wire(file_shaped, F.lit(broker_ts))

    # name+type contract (the ingest mark's nullability legitimately
    # differs: Kafka's broker timestamp is nullable, a literal/clock isn't)
    assert [(f.name, f.dataType) for f in from_kafka.schema] == [
        (f.name, f.dataType) for f in from_file.schema
    ]
    assert from_kafka.collect() == from_file.collect()
    # and the parsed contract feeds the flagship enrichment unchanged
    from banking_streaming_etl_spark import datamodel

    enriched = datamodel.enrich(
        from_kafka,
        datamodel.users(spark, SF),
        datamodel.regions(spark, SF),
    )
    assert enriched.count() == 1


def test_streaming_progress_metrics(spark, tmp_path):
    from banking_streaming_etl_spark.sources import stream as stream_src
    from banking_streaming_etl_spark.streaming import metrics

    d = str(tmp_path / "chunks")
    stream_src.write_replay_chunks(spark, SF, d, n_chunks=2)
    tx = stream_src.read_transaction_stream(spark, d, max_files_per_trigger=1)
    q = (
        tx.writeStream.outputMode("append")
        .format("memory")
        .queryName("metrics_probe")
        .start()
    )
    q.processAllAvailable()
    prog = metrics.progress_dataframe(spark, q)
    q.stop()
    summary = metrics.throughput_summary(prog).first()
    assert summary.batches >= 2  # one per chunk
    assert summary.total_rows == 1000
    assert summary.avg_rows_per_s > 0


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC write/read preserves rows and pushes predicates to the scan
    (same contract as parquet)."""
    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.sources import batch as bsrc

    tx = datamodel.transactions(spark, "/root/testdata/sf0.001").select(
        "id_transacao", "id_usuario_pagador", "valor_transacao"
    )
    path = str(tmp_path / "tx_orc")
    bsrc.write_orc(tx, path)
    back = bsrc.read_orc(spark, path)
    assert back.count() == tx.count()

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter("valor_transacao > 100.0").explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "GreaterThan(valor_transacao" in plan


def test_json_lines_batch_matches_stream_parse(spark, tmp_path):
    """The batch JSON reader over the replay chunks yields the same rows
    as the streaming wire parser — the batch/stream unification holds at
    the source layer too."""
    from banking_streaming_etl_spark.sources import batch as bsrc
    from banking_streaming_etl_spark.sources import stream as ssrc

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    n = ssrc.write_replay_chunks(
        spark, "/root/testdata/sf0.001", str(tmp_path / "chunks"), n_chunks=2
    )
    df = bsrc.read_json_lines(spark, str(tmp_path / "chunks"))
    assert df.count() == n
