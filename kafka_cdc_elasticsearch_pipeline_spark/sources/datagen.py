"""Datagen source (SURVEY §2.1 S5): the reference's ratings generator.

The reference runs the Confluent datagen connector with
``quickstart: ratings`` at ≤1 event/750 ms (docker-compose.yml:140-148).
Two twins:

- ``ratings_batch``: a deterministic, seedless (pure-function-of-id)
  generator used by the golden-scenario tests — same columns and value
  domains as the datagen quickstart (FIXTURES.md §A1).
- ``ratings_rate_stream``: the streaming twin on Spark's ``rate``
  source; each tick becomes one ratings event. Rate-limited exactly
  like the reference (rowsPerSecond ≈ 1.3).

Both derive every field arithmetically from a monotonic id — no RNG,
so any row is reproducible from its id alone (replays, retries and
exactly-once sinks all depend on that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANNELS = ("ios", "android", "web", "ios-test", "web-test")
MESSAGES = (
    "more peanuts please",
    "why is it so difficult to keep the bathrooms clean?",
    "your team here rocks!",
    "airport refurb looks great, will fly outta here more!",
    "(expletive deleted)",
)


def _ratings_columns(id_col):
    """Deterministic field derivations from a monotonic id."""
    return [
        id_col.alias("rating_id"),
        (id_col % 20 + 1).cast("int").alias("user_id"),  # FK -> customers 1..20
        (id_col % 5 + 1).cast("int").alias("stars"),
        (id_col % 1000).cast("int").alias("route_id"),
        F.element_at(F.array(*[F.lit(c) for c in CHANNELS]), (id_col % 5 + 1).cast("int")).alias(
            "channel"
        ),
        F.element_at(F.array(*[F.lit(m) for m in MESSAGES]), (id_col % 5 + 1).cast("int")).alias(
            "message"
        ),
    ]


def ratings_batch(spark: SparkSession, n: int = 1000, start_ts_ms: int = 1_700_000_000_000) -> DataFrame:
    """Deterministic batch ratings (one row per id in [0, n))."""
    base = spark.range(n)
    return base.select(
        *_ratings_columns(F.col("id")),
        (F.lit(start_ts_ms) + F.col("id") * 750).alias("rating_time"),  # 750 ms spacing
    )


def ratings_rate_stream(spark: SparkSession, rows_per_second: float = 1.3) -> DataFrame:
    """Streaming ratings at the reference's event rate (S5)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return rate.select(
        *_ratings_columns(F.col("value")),
        (F.unix_millis(F.col("timestamp"))).alias("rating_time"),
    )
