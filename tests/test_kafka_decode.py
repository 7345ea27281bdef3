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


def test_avro_gated_with_helpful_error(spark):
    if avro_available(spark):
        pytest.skip("spark-avro present — gating not exercised")
    schema = '{"type":"record","name":"r","fields":[{"name":"x","type":"int"}]}'
    with pytest.raises(RuntimeError, match="spark-avro"):
        decode_value(_raw(spark), schema).collect()
