from __future__ import annotations

from pyspark.sql import Row

from kafka_cdc_elasticsearch_pipeline_spark.sources.cdc import (
    extract_key,
    insert_extract_ts,
    unwrap_envelope,
    wrap_envelope,
)


def test_envelope_roundtrip_with_nulls(spark):
    df = spark.createDataFrame(
        [Row(id=1, name="a", score=1.5), Row(id=2, name=None, score=None)]
    )
    raw = wrap_envelope(df, op="u")
    flat = unwrap_envelope(raw, df.schema)
    rows = sorted(flat.collect(), key=lambda r: r.id)
    assert [(r.id, r.name, r.score) for r in rows] == [(1, "a", 1.5), (2, None, None)]
    assert all(r._op == "u" for r in rows)


def test_extract_key_is_string_typed(spark):
    df = spark.createDataFrame([Row(id=42, v="x")])
    out = extract_key(df, "id")
    assert dict(out.dtypes)["kafka_key"] == "string"
    assert out.first().kafka_key == "42"


def test_insert_extract_ts(spark):
    df = spark.createDataFrame([Row(id=1)])
    out = insert_extract_ts(df)
    assert "EXTRACT_TS" in out.columns
    assert out.first().EXTRACT_TS is not None
