"""Packaged lake sinks for Structured Streaming ``foreachBatch``.

The gate rows ``lake_streaming_append_exactly_once`` and
``lake_streaming_cdc_merge`` prove these shapes end-to-end (kill/
restart, doubled delivery); this module is the same contract as an
API a pipeline author actually mounts:

    q = (stream.writeStream
         .foreachBatch(lake_append_sink(spark, table, app_id="ingest"))
         .option("checkpointLocation", ckpt).start())

- ``lake_append_sink``: EXACTLY-ONCE appends — delegates to
  ``lakelog.txn_append_commit``, so a replayed/redelivered micro-batch
  is recognized by the table's manifest watermark and skipped
  atomically (Delta txnAppId/txnVersion twin).
- ``lake_merge_sink``: CDC MERGE — ``merge_upsert_versioned`` is
  last-write-wins by (ts, tiebreak), which makes redelivery a no-op by
  VALUE rather than by watermark; use it when batches are updates, not
  immutable events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from kafka_cdc_elasticsearch_pipeline_spark.sources import lakelog


def lake_append_sink(
    spark: SparkSession,
    table: str,
    app_id: str,
    stat_cols: Sequence[str] | None = None,
    bloom_cols: Sequence[str] | None = None,
    bloom_m: int = lakelog.BLOOM_BITS,
):
    """foreachBatch callable: exactly-once append of each micro-batch.
    Returns the committed version, or None when the batch was already
    in (foreachBatch ignores the return; tests use it)."""

    def sink(batch_df: DataFrame, batch_id: int):
        return lakelog.txn_append_commit(
            spark,
            table,
            batch_df,
            app_id=app_id,
            batch_id=batch_id,
            stat_cols=stat_cols,
            bloom_cols=bloom_cols,
            bloom_m=bloom_m,
        )

    return sink


def lake_merge_sink(
    spark: SparkSession,
    table: str,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str | None = None,
):
    """foreachBatch callable: versioned CDC MERGE of each micro-batch
    (last-write-wins upsert; replays converge by value)."""

    def sink(batch_df: DataFrame, batch_id: int):
        return lakelog.merge_upsert_versioned(
            spark, table, batch_df, keys, ts_col, tiebreak=tiebreak
        )

    return sink
