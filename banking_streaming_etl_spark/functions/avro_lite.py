"""Avro-lite: a dependency-free binary Avro codec for FLAT records.

The reference ships a vestigial Avro schema for its wire format
(data/schema.avsc — the producer actually emits JSON, producer.py:162).
Spark's official Avro support lives in the EXTERNAL spark-avro module,
absent from this environment (round 2-8 probes, COVERAGE.md), so the
format stayed gated. This module implements the relevant subset of the
PUBLIC Apache Avro 1.x binary encoding spec directly — zigzag-varint
ints/longs, little-endian IEEE float/double, length-prefixed
strings/bytes, single-byte booleans, flat (non-nested) records — which
fully covers the reference's 7-field BankTransaction record.

Decode runs as an Arrow-batched `mapInPandas` over a `value: binary`
column (the Kafka value shape): a documented Python ingestion-boundary
adapter, exactly like the multimodal byte ops — NOT a hot-path
expression. Once decoded, everything downstream is JVM-side.

Byte-level conformance is pinned in tests/test_avro_lite.py against
hand-computed vectors from the spec (zigzag: 1 -> 0x02, -1 -> 0x01;
string "abc" -> 0x06 'abc'; double 1.0 -> its little-endian IEEE
bytes), so the codec is not merely "tested against itself".
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Avro primitive -> (Spark type, python caster)
_PRIMITIVES = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
}


def parse_schema(avsc: str | dict) -> list[tuple[str, str]]:
    """Parse a flat-record .avsc into [(field_name, primitive_type)].

    Accepts the spec's shorthand (`"type": "string"`) and wrapped
    (`"type": {"type": "string"}`) forms — the reference schema uses
    both. Nested records/unions/arrays are out of scope and rejected
    loudly."""
    sch = json.loads(avsc) if isinstance(avsc, str) else avsc
    if sch.get("type") != "record":
        raise ValueError(f"avro_lite: not a record schema: {sch.get('type')}")
    fields: list[tuple[str, str]] = []
    for f in sch["fields"]:
        ftype = f["type"]
        if isinstance(ftype, dict):
            ftype = ftype.get("type")
        if ftype not in _PRIMITIVES:
            raise ValueError(
                f"avro_lite: unsupported field type {ftype!r} for "
                f"{f['name']!r} (flat primitive records only)"
            )
        fields.append((f["name"], ftype))
    return fields


def spark_schema(fields: list[tuple[str, str]]) -> T.StructType:
    return T.StructType(
        [T.StructField(n, _PRIMITIVES[t]) for n, t in fields]
    )


# --- varint / zigzag (Avro spec: int and long encoding) ---------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_varint(u: int, out: bytearray) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro_lite: truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 70:
            raise ValueError("avro_lite: varint longer than 10 bytes")


def write_long(n: int, out: bytearray) -> None:
    _write_varint(_zigzag_encode(n), out)


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _read_varint(buf, pos)
    return _zigzag_decode(u), pos


# --- record encode / decode --------------------------------------------------


def encode_record(rec: dict[str, Any], fields: list[tuple[str, str]]) -> bytes:
    """Binary-encode one record in schema field order (Avro spec:
    records are the concatenation of their field encodings)."""
    out = bytearray()
    for name, ftype in fields:
        v = rec[name]
        if ftype in ("long", "int"):
            write_long(int(v), out)
        elif ftype == "double":
            out += struct.pack("<d", float(v))
        elif ftype == "float":
            out += struct.pack("<f", float(v))
        elif ftype == "boolean":
            out.append(1 if v else 0)
        elif ftype == "string":
            b = str(v).encode("utf-8")
            write_long(len(b), out)
            out += b
        elif ftype == "bytes":
            write_long(len(v), out)
            out += bytes(v)
        else:  # pragma: no cover - parse_schema rejects these
            raise ValueError(ftype)
    return bytes(out)


def decode_record(
    buf: bytes, fields: list[tuple[str, str]]
) -> dict[str, Any]:
    """Decode one record; raises ValueError (uniformly — never a leaked
    struct.error/IndexError) on truncation, invalid lengths, or trailing
    bytes, so ingestion-boundary failures are one consistent class."""

    def _need(pos: int, n: int, what: str) -> None:
        if pos + n > len(buf):
            raise ValueError(f"avro_lite: truncated {what}")

    rec: dict[str, Any] = {}
    pos = 0
    for name, ftype in fields:
        if ftype in ("long", "int"):
            v, pos = read_long(buf, pos)
        elif ftype == "double":
            _need(pos, 8, "double")
            (v,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif ftype == "float":
            _need(pos, 4, "float")
            (v,) = struct.unpack_from("<f", buf, pos)
            pos += 4
        elif ftype == "boolean":
            _need(pos, 1, "boolean")
            v = buf[pos] != 0
            pos += 1
        elif ftype == "string":
            ln, pos = read_long(buf, pos)
            if ln < 0:
                raise ValueError(f"avro_lite: invalid string length {ln}")
            _need(pos, ln, "string")
            v = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif ftype == "bytes":
            ln, pos = read_long(buf, pos)
            if ln < 0:
                raise ValueError(f"avro_lite: invalid bytes length {ln}")
            _need(pos, ln, "bytes")
            v = bytes(buf[pos : pos + ln])
            pos += ln
        else:  # pragma: no cover
            raise ValueError(ftype)
        rec[name] = v
    if pos != len(buf):
        raise ValueError(
            f"avro_lite: {len(buf) - pos} trailing bytes after record"
        )
    return rec


# --- Spark adapters -----------------------------------------------------------


def encode_avro_column(df: DataFrame, avsc: str | dict) -> DataFrame:
    """Encode the schema's columns into ONE binary Avro column `value`
    via Arrow-batched mapInPandas — the producer-side twin of
    `decode_avro_column` (what a Kafka sink would put on the wire)."""
    import pandas as pd

    fields = parse_schema(avsc)
    names = [n for n, _ in fields]

    def _encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "value": [
                        encode_record(
                            {n: row[n] for n in names}, fields
                        )
                        for row in pdf.to_dict("records")
                    ]
                }
            )

    return df.select(*names).mapInPandas(
        _encode, schema=T.StructType([T.StructField("value", T.BinaryType())])
    )


def decode_avro_column(
    df: DataFrame, avsc: str | dict, value_col: str = "value"
) -> DataFrame:
    """Decode a binary Avro column into typed columns via Arrow-batched
    mapInPandas (works on batch AND streaming DataFrames — the Kafka
    `value` shape). Python at the ingestion boundary only, like the
    multimodal byte ops; the decoded frame is ordinary JVM columns."""
    import pandas as pd

    fields = parse_schema(avsc)
    out_schema = spark_schema(fields)
    names = [n for n, _ in fields]

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                decode_record(bytes(b), fields) for b in pdf[value_col]
            ]
            yield pd.DataFrame(
                {n: [r[n] for r in rows] for n in names}
            )

    return df.select(value_col).mapInPandas(_decode, schema=out_schema)
