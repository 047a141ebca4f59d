"""functions/avro_lite: dependency-free Avro binary codec.

Three layers of proof, so the codec is not merely round-tripped against
itself: (1) byte-exact conformance vectors hand-computed from the
public Apache Avro spec; (2) a hypothesis round-trip property over the
full primitive surface; (3) the Spark adapter decoding the reference's
BankTransaction schema (data/schema.avsc shape) back to the original
rows, batch and streaming."""

from __future__ import annotations

import json
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from banking_streaming_etl_spark.functions import avro_lite as A

#: the reference's wire schema (data/schema.avsc) — ids as strings,
#: epoch long, double value; `modalidade_pagamento` uses the wrapped
#: {"type": {"type": "string"}} form on purpose (the reference does).
BANK_AVSC = json.dumps(
    {
        "type": "record",
        "name": "BankTransaction",
        "fields": [
            {"name": "id_transacao", "type": "string"},
            {"name": "id_usuario_pagador", "type": "string"},
            {"name": "id_usuario_recebedor", "type": "string"},
            {"name": "id_regiao", "type": "string"},
            {"name": "modalidade_pagamento", "type": {"type": "string"}},
            {"name": "data_horario", "type": "long"},
            {"name": "valor_transacao", "type": "double"},
        ],
    }
)


def test_spec_conformance_vectors():
    """Hand-computed byte vectors from the Avro 1.x spec."""
    out = bytearray()
    A.write_long(1, out)
    assert bytes(out) == b"\x02"  # zigzag(1)=2
    out = bytearray()
    A.write_long(-1, out)
    assert bytes(out) == b"\x01"  # zigzag(-1)=1
    out = bytearray()
    A.write_long(64, out)
    assert bytes(out) == b"\x80\x01"  # zigzag(64)=128 -> two varint bytes
    out = bytearray()
    A.write_long(-64, out)
    assert bytes(out) == b"\x7f"  # zigzag(-64)=127
    # string "abc": length varint 0x06 + utf-8 bytes
    enc = A.encode_record(
        {"s": "abc"}, [("s", "string")]
    )
    assert enc == b"\x06abc"
    # double 1.0: 8 little-endian IEEE bytes
    enc = A.encode_record({"d": 1.0}, [("d", "double")])
    assert enc == struct.pack("<d", 1.0) == b"\x00" * 6 + b"\xf0?"
    # boolean: single byte 0/1; record = concatenated fields in order
    enc = A.encode_record(
        {"b": True, "n": 3}, [("b", "boolean"), ("n", "long")]
    )
    assert enc == b"\x01\x06"


def test_spec_long_boundaries():
    for n in (0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        out = bytearray()
        A.write_long(n, out)
        back, pos = A.read_long(bytes(out), 0)
        assert (back, pos) == (n, len(out)), n


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(max_size=40),
    n=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    i=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    d=st.floats(allow_nan=False),
    b=st.booleans(),
    raw=st.binary(max_size=32),
)
def test_roundtrip_property(s, n, i, d, b, raw):
    fields = [
        ("s", "string"),
        ("n", "long"),
        ("i", "int"),
        ("d", "double"),
        ("b", "boolean"),
        ("raw", "bytes"),
    ]
    rec = {"s": s, "n": n, "i": i, "d": d, "b": b, "raw": raw}
    back = A.decode_record(A.encode_record(rec, fields), fields)
    assert back == rec


def test_truncation_and_trailing_bytes_fail_loudly():
    fields = [("s", "string"), ("n", "long")]
    enc = A.encode_record({"s": "hello", "n": 7}, fields)
    with pytest.raises(ValueError):
        A.decode_record(enc[:-1], fields)
    with pytest.raises(ValueError):
        A.decode_record(enc + b"\x00", fields)


def test_corrupt_buffers_raise_valueerror_uniformly():
    """Every corruption class raises ValueError — never a leaked
    struct.error or IndexError (the ingestion-boundary contract)."""
    # truncated inside an IEEE double payload
    dfields = [("d", "double")]
    enc = A.encode_record({"d": 3.5}, dfields)
    with pytest.raises(ValueError, match="truncated"):
        A.decode_record(enc[:4], dfields)
    # truncated inside a float payload
    ffields = [("f", "float")]
    enc = A.encode_record({"f": 1.25}, ffields)
    with pytest.raises(ValueError, match="truncated"):
        A.decode_record(enc[:2], ffields)
    # corrupt NEGATIVE zigzag length for string/bytes: must say invalid
    # length, not a misleading empty-slice "truncated"
    neg = bytearray()
    A.write_long(-3, neg)
    with pytest.raises(ValueError, match="invalid string length"):
        A.decode_record(bytes(neg), [("s", "string")])
    with pytest.raises(ValueError, match="invalid bytes length"):
        A.decode_record(bytes(neg), [("raw", "bytes")])
    # varint cut mid-continuation
    with pytest.raises(ValueError, match="truncated varint"):
        A.decode_record(b"\x80", [("n", "long")])
    # missing boolean byte
    with pytest.raises(ValueError, match="truncated boolean"):
        A.decode_record(b"", [("b", "boolean")])


def test_parse_schema_rejects_nested():
    bad = {
        "type": "record",
        "name": "X",
        "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
    }
    with pytest.raises(ValueError):
        A.parse_schema(bad)


def test_spark_decode_matches_source_rows(spark, sf_dir):
    """Encode the first 50 transactions as Avro wire records, decode via
    the Arrow-batched Spark adapter, and match the original rows."""
    from pyspark.sql import functions as F

    from banking_streaming_etl_spark import datamodel

    fields = A.parse_schema(BANK_AVSC)
    src = (
        datamodel.transactions(spark, sf_dir)
        .orderBy("id_transacao")
        .limit(50)
        .select(
            F.col("id_transacao").cast("string"),
            F.col("id_usuario_pagador").cast("string"),
            F.col("id_usuario_recebedor").cast("string"),
            F.col("id_regiao").cast("string"),
            "modalidade_pagamento",
            F.unix_micros("data_horario").alias("data_horario"),
            "valor_transacao",
        )
        .collect()
    )
    blobs = [(A.encode_record(r.asDict(), fields),) for r in src]
    df = spark.createDataFrame(blobs, ["value"])
    out = A.decode_avro_column(df, BANK_AVSC)
    # plan check: the only Python is the Arrow-batched map (never
    # row-at-a-time BatchEvalPython)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in src)
    assert got == want and len(got) == 50


def test_streaming_decode_same_adapter(spark, sf_dir, tmp_path):
    """The same adapter decodes a STREAMING binary frame (the Kafka
    value shape): file-stream parquet blobs -> mapInPandas decode ->
    memory sink, matched against the batch decode."""
    from banking_streaming_etl_spark import datamodel

    fields = A.parse_schema(BANK_AVSC)
    rows = (
        datamodel.transactions(spark, sf_dir)
        .orderBy("id_transacao")
        .limit(30)
        .collect()
    )
    blobs = [
        (
            A.encode_record(
                {
                    "id_transacao": str(r.id_transacao),
                    "id_usuario_pagador": str(r.id_usuario_pagador),
                    "id_usuario_recebedor": str(r.id_usuario_recebedor),
                    "id_regiao": str(r.id_regiao),
                    "modalidade_pagamento": r.modalidade_pagamento,
                    "data_horario": int(r.data_horario.timestamp() * 1e6),
                    "valor_transacao": r.valor_transacao,
                },
                fields,
            ),
        )
        for r in rows
    ]
    src_dir = str(tmp_path / "avro_blobs")
    spark.createDataFrame(blobs, ["value"]).write.parquet(src_dir)
    stream = spark.readStream.schema("value binary").parquet(src_dir)
    q = (
        A.decode_avro_column(stream, BANK_AVSC)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("avro_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.table("avro_stream").collect())
    want = sorted(
        tuple(r)
        for r in A.decode_avro_column(
            spark.createDataFrame(blobs, ["value"]), BANK_AVSC
        ).collect()
    )
    assert got == want and len(got) == 30
