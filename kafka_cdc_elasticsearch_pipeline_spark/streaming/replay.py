"""Deterministic streaming replay of the harness tables.

The reference's streams come from Kafka topics; CI has no broker, so
the engine replays parquet through Spark's *file* streaming source —
the semantics downstream (stateful aggregation, watermarks, output
modes) are identical, which is the point of Structured Streaming's
unified batch/stream model.

To make the replay exercise REAL incremental state (not one giant
micro-batch), ``replay_stream`` re-chunks the table into N files and
streams them with ``maxFilesPerTrigger=1`` → N micro-batches arriving
in event-time order, like a topic being consumed from earliest offset
(R2 — ``auto.offset.reset = earliest``, ksqldb-statements.sql:49).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table


def replay_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    chunks: int = 8,
    order_col: str | None = "ts",
    work_dir: str | None = None,
) -> tuple[DataFrame, str]:
    """Return (streaming DataFrame, temp dir) replaying table ``name``
    as ``chunks`` micro-batches in ``order_col`` order.

    The table is range-repartitioned on the order column and written as
    one file per chunk; file-source streaming then delivers them one
    per trigger. Caller owns cleanup of the temp dir.
    """
    batch = load_table(spark, sf_dir, name)
    tmp = work_dir or tempfile.mkdtemp(prefix=f"replay_{name}_")
    data_dir = os.path.join(tmp, "data")
    if order_col:
        staged = batch.repartitionByRange(chunks, order_col)
    else:
        staged = batch.repartition(chunks)
    staged.write.mode("overwrite").parquet(data_dir)
    # The file source replays oldest-modification-time first, but the
    # parallel write finishes parts in arbitrary order — stamp strictly
    # increasing mtimes in part-index order (repartitionByRange part i
    # IS range bucket i) so the replay is deterministic event-time
    # order. Without this, a later-range file can arrive first, jump
    # the watermark ahead, and make earlier events late (order-
    # sensitive operators then drop them nondeterministically).
    parts = sorted(
        f for f in os.listdir(data_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = time.time() - len(parts) - 60
    for i, f in enumerate(parts):
        os.utime(os.path.join(data_dir, f), (base + i, base + i))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    return stream, tmp


def run_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
) -> None:
    """Run a streaming DataFrame to completion into the in-memory sink.

    ``trigger(availableNow=True)`` processes everything the source has
    and stops — deterministic, CI-friendly. The result is then readable
    as ``spark.table(query_name)`` (the pull-query side of T2).
    """
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt_{query_name}_")
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
