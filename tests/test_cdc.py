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


def test_cdc_envelope_roundtrip_recovers_delete_keys(spark):
    """wrap_envelope_cdc gives delete rows the Debezium delete shape
    (after NULL, before = the row image); unwrap_envelope_cdc recovers
    the key from before so a merge consumer always has it. Non-key
    columns of a delete stay NULL (after is gone)."""
    from pyspark.sql import types as T

    from kafka_cdc_elasticsearch_pipeline_spark.sources.cdc import (
        unwrap_envelope_cdc,
        wrap_envelope_cdc,
    )

    df = spark.createDataFrame(
        [
            Row(id=1, name="a", _op="c", ts=10),
            Row(id=2, name="b", _op="d", ts=20),
        ]
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    wire = wrap_envelope_cdc(df, op_col="_op", ts_col="ts")
    got = {r.id: r for r in unwrap_envelope_cdc(wire, schema, ["id"]).collect()}
    assert got[1].name == "a" and got[1]._op == "c" and got[1]._ts_ms == 10
    assert got[2].name is None and got[2]._op == "d" and got[2]._ts_ms == 20
