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
