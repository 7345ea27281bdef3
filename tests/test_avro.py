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


V1_SCHEMA = """
{"type": "record", "name": "rating", "fields": [
  {"name": "rating_id", "type": "int"},
  {"name": "stars", "type": "int"},
  {"name": "legacy_code", "type": "string"}
]}
"""

V2_SCHEMA = """
{"type": "record", "name": "rating", "fields": [
  {"name": "rating_id", "type": "long"},
  {"name": "stars", "type": "int"},
  {"name": "channel", "type": "string", "default": "web"},
  {"name": "score", "type": "double", "default": 0.0}
]}
"""


def test_schema_resolution_plan_and_decode():
    """Registry evolution contract: v1-written records decode into the
    v2 reader shape — legacy field skipped (bytes still consumed),
    added fields defaulted, int promoted to long."""
    from kafka_cdc_elasticsearch_pipeline_spark.sources.avro import (
        decode_record_resolved,
        resolve_schemas,
    )

    plan = resolve_schemas(V1_SCHEMA, V2_SCHEMA)
    body = encode_record(
        {"rating_id": 7, "stars": 5, "legacy_code": "zzz"},
        parse_record_schema(V1_SCHEMA),
    )
    row = decode_record_resolved(body, plan)
    assert row == {"rating_id": 7, "stars": 5, "channel": "web", "score": 0.0}
    # identity resolution: v2 against itself round-trips incl. promotion target
    plan2 = resolve_schemas(V2_SCHEMA, V2_SCHEMA)
    body2 = encode_record(
        {"rating_id": 2**40, "stars": 1, "channel": "app", "score": 4.5},
        parse_record_schema(V2_SCHEMA),
    )
    assert decode_record_resolved(body2, plan2) == {
        "rating_id": 2**40, "stars": 1, "channel": "app", "score": 4.5,
    }


def test_schema_resolution_incompatible_rejected():
    from kafka_cdc_elasticsearch_pipeline_spark.sources.avro import resolve_schemas

    # reader-only field without a default = not backward compatible
    no_default = '{"type":"record","name":"t","fields":[{"name":"x","type":"int"},{"name":"y","type":"int"}]}'
    v1 = '{"type":"record","name":"t","fields":[{"name":"x","type":"int"}]}'
    with pytest.raises(ValueError, match="no"):
        resolve_schemas(v1, no_default)
    # narrowing promotion rejected
    narrower = '{"type":"record","name":"t","fields":[{"name":"x","type":"int"}]}'
    wider = '{"type":"record","name":"t","fields":[{"name":"x","type":"long"}]}'
    with pytest.raises(ValueError, match="promote"):
        resolve_schemas(wider, narrower)


def test_avro_decode_evolved_mixed_stream(spark):
    """One topic, two producer generations: records framed with
    schema id 1 (v1) and id 2 (v2) interleave; the consumer's fixed
    v2 reader schema shapes every row (string<->bytes and long
    promotion included), and an unregistered id raises."""
    from kafka_cdc_elasticsearch_pipeline_spark.sources.avro import (
        avro_decode_evolved,
    )

    v1_fields = parse_record_schema(V1_SCHEMA)
    v2_fields = parse_record_schema(V2_SCHEMA)
    payloads = [
        confluent_frame(
            encode_record({"rating_id": i, "stars": i % 5, "legacy_code": "x"}, v1_fields), 1
        )
        for i in range(3)
    ] + [
        confluent_frame(
            encode_record(
                {"rating_id": 100 + i, "stars": 1, "channel": "app", "score": 1.5}, v2_fields
            ),
            2,
        )
        for i in range(2)
    ]
    df = spark.createDataFrame(
        [Row(k=i, value=bytearray(p)) for i, p in enumerate(payloads)]
    )
    out = avro_decode_evolved(
        df, {1: V1_SCHEMA, 2: V2_SCHEMA}, V2_SCHEMA, keep_cols=("k",)
    )
    rows = {r.k: r for r in out.collect()}
    assert len(rows) == 5
    assert rows[0].channel == "web" and rows[0].score == 0.0  # v1 defaults
    assert rows[3].channel == "app" and rows[3].score == 1.5  # v2 native
    assert out.schema["rating_id"].dataType.simpleString() == "bigint"
    # unknown id -> registry-miss error
    bad = spark.createDataFrame([Row(k=9, value=bytearray(
        confluent_frame(encode_record({"rating_id": 1, "stars": 1, "legacy_code": ""}, v1_fields), 99)
    ))])
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown schema id"):
        avro_decode_evolved(bad, {1: V1_SCHEMA}, V2_SCHEMA).collect()


def test_decimal_logical_type_golden_bytes():
    """Debezium decimal wire shape: unscaled two's-complement
    big-endian in a length-prefixed bytes value. 123.45 at scale 2 ->
    unscaled 12345 -> 0x3039 (2 bytes); -0.01 -> -1 -> 0xFF."""
    import decimal

    schema = """
    {"type": "record", "name": "t", "fields": [
      {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                             "precision": 10, "scale": 2}}
    ]}
    """
    fields = parse_record_schema(schema)
    assert fields == [("d", "decimal:10:2", False)]
    enc = encode_record({"d": decimal.Decimal("123.45")}, fields)
    # len 2 -> zigzag 4 -> 0x04, then big-endian 0x30 0x39
    assert enc == b"\x04\x30\x39"
    assert decode_record(enc, fields) == {"d": decimal.Decimal("123.45")}
    neg = encode_record({"d": decimal.Decimal("-0.01")}, fields)
    assert neg == b"\x02\xff"
    assert decode_record(neg, fields) == {"d": decimal.Decimal("-0.01")}


def test_decimal_dataframe_roundtrip(spark):
    import decimal

    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.sources.avro import avro_decode

    schema = """
    {"type": "record", "name": "t", "fields": [
      {"name": "k", "type": "long"},
      {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                             "precision": 18, "scale": 2}}
    ]}
    """
    src = spark.createDataFrame(
        [Row(k=1, d=decimal.Decimal("0.05")), Row(k=2, d=decimal.Decimal("-12345678.90"))],
        "k bigint, d decimal(18,2)",
    )
    out = avro_decode(avro_encode(src, schema), schema)
    assert out.schema["d"].dataType.simpleString() == "decimal(18,2)"
    got = {r.k: str(r.d) for r in out.collect()}
    assert got == {1: "0.05", 2: "-12345678.90"}
