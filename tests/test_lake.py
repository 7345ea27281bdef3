"""Partitioned-lake writes: date predicates must prune directories
(PartitionFilters), not just row groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.sources.lake import (
    read_partitioned,
    with_event_date,
    write_partitioned,
)
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table


def test_partition_pruning_on_event_date(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_lake")
    ev = with_event_date(load_table(spark, sf_dir, "events"))
    write_partitioned(ev, path, ["event_date"])

    lake = read_partitioned(spark, path)
    one_day = lake.filter(F.col("event_date") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the date predicate must land in PartitionFilters (directory
    # pruning), NOT PushedFilters (row-group skipping)
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in pf
    # and the result matches the unpartitioned filter
    want = ev.filter(F.col("event_date") == "2024-01-03").count()
    assert want > 0 and one_day.count() == want


def test_partitioned_roundtrip_complete(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_lake2")
    ev = with_event_date(load_table(spark, sf_dir, "events"))
    write_partitioned(ev, path, ["event_date"])
    assert read_partitioned(spark, path).count() == ev.count()


def test_merge_upsert_recovers_interrupted_swap(spark, sf_dir, tmp_path):
    """Crash between the two swap renames (table parked at .__old__,
    nothing at `path`): the next merge must roll the swap back and
    merge against the FULL prior generation — not treat the table as
    empty and delete the only surviving copy (round-4 review
    finding)."""
    import os

    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.operators.table import latest_per_key
    from kafka_cdc_elasticsearch_pipeline_spark.sources.lake import merge_upsert
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_table_crash")
    merge_upsert(
        spark, path, ev.filter(F.col("event_id") % 2 == 0),
        ["user_id"], "ts", tiebreak="event_id",
    )
    # simulate the mid-swap crash: generation parked aside, path gone
    os.replace(path, path + ".__old__")
    assert not os.path.exists(path)
    merge_upsert(
        spark, path, ev.filter(F.col("event_id") % 2 == 1),
        ["user_id"], "ts", tiebreak="event_id",
    )
    merged = spark.read.parquet(path)
    expect = latest_per_key(ev, ["user_id"], "ts", tiebreak="event_id")
    cols = sorted(merged.columns)
    assert sorted(tuple(r) for r in merged.select(*cols).collect()) == sorted(
        tuple(r) for r in expect.select(*cols).collect()
    )
    assert not os.path.exists(path + ".__old__")


def test_merge_upsert_incremental_equals_batch(spark, sf_dir, tmp_path):
    """Three-batch CDC merge == one-shot latest-per-key (associativity
    of last-write-wins), and a re-merge of an already-applied batch is
    idempotent."""
    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.operators.table import latest_per_key
    from kafka_cdc_elasticsearch_pipeline_spark.sources.lake import merge_upsert
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_table")
    for i in range(3):
        merge_upsert(
            spark, path, ev.filter(F.pmod("event_id", F.lit(3)) == i),
            ["user_id"], "ts", tiebreak="event_id",
        )
    merged = spark.read.parquet(path)
    expect = latest_per_key(ev, ["user_id"], "ts", tiebreak="event_id")
    cols = sorted(merged.columns)
    assert sorted(tuple(r) for r in merged.select(*cols).collect()) == sorted(
        tuple(r) for r in expect.select(*cols).collect()
    )
    # idempotent redelivery: re-applying batch 0 changes nothing
    merge_upsert(
        spark, path, ev.filter(F.pmod("event_id", F.lit(3)) == 0),
        ["user_id"], "ts", tiebreak="event_id",
    )
    again = spark.read.parquet(path)
    assert sorted(tuple(r) for r in again.select(*cols).collect()) == sorted(
        tuple(r) for r in expect.select(*cols).collect()
    )
