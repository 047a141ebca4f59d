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


def test_kafka_source_gated_with_clear_error(spark):
    """The Kafka source requires the connector jar (absent in this
    container); the failure mode is a clear find-data-source error at
    stream declaration, not a silent misbehavior."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from banking_streaming_etl_spark.sources.stream import read_kafka_stream

    with pytest.raises(AnalysisException, match="[Kk]afka"):
        read_kafka_stream(spark, "localhost:9092")


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
