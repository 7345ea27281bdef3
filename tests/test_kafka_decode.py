"""Kafka value decoding: JSON path (no external jars) + Avro gating."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_cdc_elasticsearch_pipeline_spark.sources.kafka import (
    avro_available,
    decode_value,
    kafka_sink_writer,
)


def _raw(spark):
    rows = [
        ("42", json.dumps({"rating_id": 1, "stars": 4}), "2024-01-01 10:00:00"),
        ("43", json.dumps({"rating_id": 2, "stars": 1}), "2024-01-01 10:00:01"),
    ]
    return spark.createDataFrame(rows, "key string, value string, timestamp string").select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.col("timestamp").cast("timestamp").alias("timestamp"),
    )


def test_decode_value_json_path(spark):
    schema = T.StructType(
        [
            T.StructField("rating_id", T.LongType()),
            T.StructField("stars", T.IntegerType()),
        ]
    )
    out = decode_value(_raw(spark), schema).orderBy("rating_id").collect()
    assert [(r.kafka_key, r.rating_id, r.stars) for r in out] == [
        ("42", 1, 4),
        ("43", 2, 1),
    ]
    assert out[0].rowtime is not None  # ROWTIME preserved


def test_avro_string_schema_uses_python_fallback(spark):
    """Without the spark-avro jar, an Avro schema string routes to the
    engine's own binary decoder (sources.avro) instead of erroring —
    S1/S4 decode works in registry-less environments. (The richer
    end-to-end fallback coverage lives in tests/test_avro.py.)"""
    if avro_available(spark):
        pytest.skip("spark-avro present — fallback not exercised")
    from kafka_cdc_elasticsearch_pipeline_spark.sources.avro import (
        encode_record,
        parse_record_schema,
    )

    schema = '{"type":"record","name":"r","fields":[{"name":"x","type":"int"}]}'
    fields = parse_record_schema(schema)
    raw = spark.createDataFrame(
        [(b"k", encode_record({"x": 9}, fields), "2024-01-01 00:00:00")],
        "key binary, value binary, timestamp string",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    out = decode_value(raw, schema).collect()
    assert [(r.kafka_key, r.x) for r in out] == [("k", 9)]


def test_decode_value_tolerant_splits_malformed(spark):
    """T8 source half: malformed payloads route to the DLQ leg, valid
    ones decode — and the two legs partition the input exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kafka_cdc_elasticsearch_pipeline_spark.sources.kafka import (
        decode_value_tolerant,
    )

    rows = [
        ("k1", '{"user_id": 1, "stars": 5}'),
        ("k2", "{not json at all"),
        ("k3", '{"user_id": 3, "stars": 2}'),
        ("k4", ""),          # empty payload -> unparseable
    ]
    raw = spark.createDataFrame(
        [(k, bytearray(v.encode())) for k, v in rows], "key string, value binary"
    ).withColumn("timestamp", F.current_timestamp())
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("stars", T.IntegerType())]
    )
    good, dead = decode_value_tolerant(raw, schema)
    g = {r.kafka_key: (r.user_id, r.stars) for r in good.collect()}
    d = {r.kafka_key for r in dead.collect()}
    assert g == {"k1": (1, 5), "k3": (3, 2)}
    assert d == {"k2", "k4"}
    assert good.count() + dead.count() == len(rows)


def test_kafka_sink_writer_builder_shape(spark):
    """S8/R1: the sink builder must set key from the PARTITION BY
    column and serialize the full row as the value — verified on the
    batch twin of the payload projection (no broker needed)."""
    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.sources.kafka import kafka_sink_writer

    # builder needs a streaming frame (writeStream); rate source, no broker
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("value").alias("id"), F.lit("Ada").alias("full_name"))
    )
    writer = kafka_sink_writer(
        stream, "broker:9092", "derived-topic", key_col="full_name",
        checkpoint_dir="/tmp/ck-test",
    )
    # builder is configured but nothing started (no broker in CI)
    assert writer is not None
    # the payload projection: key = full_name, value = full-row JSON
    import json

    df = spark.createDataFrame(
        [(1, "Ada", 5), (2, "Grace", 3)], "id int, full_name string, stars int"
    )
    payload = df.select(
        F.col("full_name").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    ).collect()
    by_key = {r.key: json.loads(r.value) for r in payload}
    assert by_key["Ada"] == {"id": 1, "full_name": "Ada", "stars": 5}
