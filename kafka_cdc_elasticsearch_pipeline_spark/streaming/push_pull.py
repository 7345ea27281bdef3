"""Push vs pull queries (SURVEY §2.9 T1/T2).

- Push query (``EMIT CHANGES``, every reference SELECT): a running
  ``StreamingQuery`` continuously emitting changes — ``start_push``.
- Pull query (no EMIT, ksqldb-statements.sql:104-110): point-in-time
  read of the materialized state — ``pull`` is a plain batch filter
  over whatever sink the push query maintains.

Freshness contract (SURVEY §7): a pull sees state as of the last
completed micro-batch — the same read-your-last-commit semantics
ksqlDB gives against its RocksDB state stores.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def start_push(
    df: DataFrame,
    name: str,
    output_mode: str = "update",
    fmt: str = "memory",
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    **options,
) -> StreamingQuery:
    """T1 — EMIT CHANGES: start a continuous query to a sink."""
    writer = (
        df.writeStream.format(fmt)
        .queryName(name)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt_{name}_"),
        )
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def pull(spark: SparkSession, materialized_name: str, *predicates: Column) -> DataFrame:
    """T2 — pull query: batch read of the materialization + filters
    (the WINDOWSTART-range + key lookup shape of
    ksqldb-statements.sql:110)."""
    df = spark.table(materialized_name)
    for p in predicates:
        df = df.filter(p)
    return df
