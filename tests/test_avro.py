"""Registry-less Avro binary codec (S1/S4) — golden-byte and
DataFrame-level tests. Golden bytes are hand-derived from the Avro
spec's binary encoding (zigzag varints, length-prefixed strings,
little-endian IEEE doubles, union branch indexes)."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from pyspark.sql import Row

from kafka_cdc_elasticsearch_pipeline_spark.sources.avro import (
    avro_decode,
    avro_encode,
    confluent_frame,
    decode_record,
    encode_record,
    parse_record_schema,
    strip_confluent_frame,
)

SCHEMA = """
{"type": "record", "name": "t", "fields": [
  {"name": "a", "type": "long"},
  {"name": "b", "type": "string"}
]}
"""

NULLABLE_SCHEMA = """
{"type": "record", "name": "t", "fields": [
  {"name": "id", "type": "int"},
  {"name": "s", "type": ["null", "string"]},
  {"name": "d", "type": ["null", "double"]},
  {"name": "ok", "type": "boolean"}
]}
"""


def test_golden_bytes_long_and_string():
    fields = parse_record_schema(SCHEMA)
    # long 1 -> zigzag 2 -> 0x02 ; "foo" -> len 3 -> zigzag 6 -> 0x06 + bytes
    assert encode_record({"a": 1, "b": "foo"}, fields) == b"\x02\x06foo"
    assert decode_record(b"\x02\x06foo", fields) == {"a": 1, "b": "foo"}


@pytest.mark.parametrize(
    ("n", "raw"),
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
        (2**40, b"\x80\x80\x80\x80\x80\x40"),
        (-(2**62), b"\xff\xff\xff\xff\xff\xff\xff\xff\x7f"),
    ],
)
def test_zigzag_varint_goldens(n, raw):
    fields = parse_record_schema(
        '{"type":"record","name":"t","fields":[{"name":"a","type":"long"}]}'
    )
    assert encode_record({"a": n}, fields) == raw
    assert decode_record(raw, fields) == {"a": n}


def test_nullable_union_branches():
    fields = parse_record_schema(NULLABLE_SCHEMA)
    row = {"id": 7, "s": None, "d": 1.5, "ok": True}
    enc = encode_record(row, fields)
    # id 7 -> 0x0e ; s null -> branch 0 -> 0x00 ; d -> branch 1 + 8 bytes ; ok -> 0x01
    assert enc == b"\x0e\x00\x02" + struct.pack("<d", 1.5) + b"\x01"
    assert decode_record(enc, fields) == row


def test_confluent_frame_roundtrip():
    framed = confluent_frame(b"\x02\x06foo", schema_id=42)
    assert framed[:5] == b"\x00\x00\x00\x00\x2a"
    schema_id, body = strip_confluent_frame(framed)
    assert schema_id == 42 and body == b"\x02\x06foo"
    with pytest.raises(ValueError, match="magic"):
        strip_confluent_frame(b"\x01\x00\x00\x00\x2a")


def test_dataframe_roundtrip_with_nulls(spark):
    rows = [
        Row(id=1, s="hello", d=3.25, ok=True),
        Row(id=2, s=None, d=None, ok=False),
        Row(id=-3, s="", d=-0.5, ok=True),
    ]
    df = spark.createDataFrame(rows, "id int, s string, d double, ok boolean")
    enc = avro_encode(df, NULLABLE_SCHEMA, schema_id=7)
    dec = avro_decode(enc, NULLABLE_SCHEMA, confluent=True)
    got = sorted([r.asDict() for r in dec.collect()], key=lambda r: r["id"])
    want = sorted([r.asDict() for r in rows], key=lambda r: r["id"])
    assert got == want


def test_decode_value_python_fallback_keeps_metadata(spark):
    """kafka.decode_value falls back to the engine codec when the
    spark-avro jar is absent (this environment) and keeps the
    kafka_key/rowtime metadata columns."""
    from kafka_cdc_elasticsearch_pipeline_spark.sources.kafka import decode_value

    fields = parse_record_schema(SCHEMA)
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    raw = spark.createDataFrame(
        [
            Row(key=b"k1", timestamp=ts, value=encode_record({"a": 10, "b": "x"}, fields)),
            Row(key=b"k2", timestamp=ts, value=encode_record({"a": -5, "b": "yz"}, fields)),
        ],
        "key binary, timestamp timestamp, value binary",
    )
    out = {r.kafka_key: r for r in decode_value(raw, SCHEMA).collect()}
    assert set(out) == {"k1", "k2"}
    assert out["k1"].a == 10 and out["k1"].b == "x"
    assert out["k2"].a == -5 and out["k2"].b == "yz"
    assert out["k1"].rowtime == ts
