"""Partitioned data-lake layout (the at-rest side of a 100 TB
pipeline): Hive-style directory partitioning so date/tenant predicates
prune entire directories before any IO happens.

The reference's at-rest story is Elasticsearch indexes; a Spark-native
pipeline lands parquet partitioned by event date — `PartitionFilters`
in the scan (asserted in tests) means a one-day query over a 3-year
lake touches 1/1000th of the files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Land a DataFrame Hive-partitioned by ``partition_cols``."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def with_event_date(df: DataFrame, ts_col: str = "ts", out_col: str = "event_date") -> DataFrame:
    """Derive the partition column from event time (day granularity —
    the reference's ES template types ``*_TS`` as date for the same
    dashboard slicing)."""
    return df.withColumn(out_col, F.to_date(F.col(ts_col)))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned lake path; partition columns come back as
    regular columns and predicates on them prune directories."""
    return spark.read.parquet(path)


def active_rows(table: DataFrame, delete_pred) -> DataFrame:
    """Tombstone-aware read of a CDC lake table: rows matching
    ``delete_pred`` are RETAINED deletes, filtered out of the active
    view here rather than physically removed by the MERGE.

    Why retain: a delete physically removed at merge time loses its
    (ts, tiebreak) position, so a LATE-arriving older update for the
    same key would resurrect the row on a later merge. Stored as a
    winning tombstone, the delete keeps beating older changes in the
    last-write-wins reduce — exactly Delta/Iceberg/Kafka-compaction
    semantics (tombstones held for a retention horizon, reclaimed by
    vacuum — ``lakelog.vacuum`` on the txn-log path)."""
    return table.filter(~delete_pred)


def merge_upsert(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> None:
    """Copy-on-write MERGE of a CDC change batch into a parquet lake
    table: existing ∪ changes → latest-per-key → staged rewrite →
    swap. The lakehouse counterpart of the keyed ES sink (doc-id
    overwrite ≙ key merge) and the batch form of the reference's
    TABLE materialization.

    This is the format-agnostic COW pattern; a production lake
    delegates the swap to a table format's transaction log (Delta/
    Iceberg) and rewrites only the touched files. Semantics — dedup by
    (ts, tiebreak) last-write-wins — are identical, which is what the
    gate row checks.
    """
    import os
    import shutil

    from kafka_cdc_elasticsearch_pipeline_spark.operators.table import latest_per_key

    staging = path.rstrip("/") + ".__staging__"
    old = path.rstrip("/") + ".__old__"
    # Crash recovery BEFORE reading: a previous run that died between
    # its two swap renames left `path` absent and the full table parked
    # at `old` — roll that swap back first, or this merge would treat
    # the table as empty AND the rmtree below would delete the only
    # surviving full copy (round-4 review finding).
    if not os.path.exists(path) and os.path.exists(old):
        os.replace(old, path)
    if os.path.exists(path):
        merged = spark.read.parquet(path).unionByName(changes)
    else:
        merged = changes
    result = latest_per_key(merged, list(keys), ts_col, tiebreak=tiebreak)
    result.write.mode("overwrite").parquet(staging)
    # Swap via rename-aside (ADVICE r03): the old rmtree(path) →
    # replace(staging, path) sequence had a window with NO table at
    # `path` — a crash there lost the table (data stranded in
    # .__staging__), and concurrent readers errored. Now a valid table
    # exists at every step: park the old dir aside, one atomic rename
    # brings the new table live, then delete the parked copy. A crash
    # between the renames leaves `path` momentarily absent for at most
    # one rename (not a full delete+rewrite), both generations still on
    # disk, and the recovery branch above completes the rollback on the
    # next call.
    shutil.rmtree(old, ignore_errors=True)  # superseded prior generation
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(staging, path)
    shutil.rmtree(old, ignore_errors=True)
