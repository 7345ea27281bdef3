"""Bucketed co-located joins: the write-once-shuffle-never pattern.
The assertion that matters: joining two same-bucketed tables plans
with ZERO Exchange — at 100 TB that's the recurring fact⋈fact shuffle
paid once at ingest instead of per query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "orders_bucketed", "l_orderkey", n_buckets=8)
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the co-location (not a broadcast) is what
    # eliminates the shuffle — at 100 TB neither side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    want = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    assert bucketed_join(spark, lt, rt, "l_orderkey").count() == want
