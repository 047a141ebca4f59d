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
