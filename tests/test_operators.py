from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.functions.scalar import (
    str_concat,
    timestamp_ms_to_string,
)
from kafka_cdc_elasticsearch_pipeline_spark.operators.relational import (
    rekey,
    split_streams,
    topk,
)
from kafka_cdc_elasticsearch_pipeline_spark.operators.table import latest_per_key


def test_split_streams_null_in_neither(spark):
    """ksqlDB 3VL: NULL channel matches neither LIKE nor NOT LIKE."""
    df = spark.createDataFrame(
        [Row(id=1, channel="web"), Row(id=2, channel="web-TEST"), Row(id=3, channel=None)]
    )
    live, test = split_streams(df, "channel")
    assert [r.id for r in live.collect()] == [1]
    assert [r.id for r in test.collect()] == [2]


def test_latest_per_key_strategies_agree(spark, sf_dir):
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = latest_per_key(ev, ["user_id"], "ts", "event_id", method="max_by")
    b = latest_per_key(ev, ["user_id"], "ts", "event_id", method="window")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_latest_per_key_tiebreak(spark):
    """Equal timestamps resolve by the monotonic tiebreak (≙ offset)."""
    df = spark.createDataFrame(
        [Row(k="a", ts=5, seq=1, v="old"), Row(k="a", ts=5, seq=2, v="new")]
    )
    out = latest_per_key(df, ["k"], "ts", "seq").collect()
    assert len(out) == 1 and out[0].v == "new"


def test_topk_deterministic_with_ties(spark):
    df = spark.createDataFrame([Row(k=i, score=i % 3) for i in range(30)])
    out1 = topk(df, [F.col("score").desc(), F.col("k").asc()], 5).collect()
    out2 = topk(df, [F.col("score").desc(), F.col("k").asc()], 5).collect()
    assert out1 == out2
    assert [r.k for r in out1] == [2, 5, 8, 11, 14]


def test_topk_plan_avoids_global_sort(spark):
    df = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("s"))
    plan = topk(df, [F.col("s").desc(), F.col("k")], 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rekey_colocates_keys(spark):
    df = spark.range(100).select((F.col("id") % 4).alias("k"), F.col("id"))
    out = rekey(df, "k")
    # every key lives in exactly one partition after the re-key
    parts = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("k")
        .agg(F.countDistinct("p").alias("np"))
        .collect()
    )
    assert all(r.np == 1 for r in parts)


def test_concat_null_propagates(spark):
    """F2 risk register: ksqlDB `+` is NULL-propagating; concat_ws would
    silently differ (SURVEY §7)."""
    df = spark.createDataFrame([("x", None)], "a string, b string")
    out = df.select(str_concat(F.col("a"), F.lit(" "), F.col("b")).alias("c")).first()
    assert out.c is None


def test_timestamp_ms_to_string(spark):
    df = spark.createDataFrame([Row(ms=1594049400000)])  # 2020-07-06T15:30 UTC
    out = df.select(timestamp_ms_to_string(F.col("ms")).alias("s")).first()
    assert out.s == "2020-07-06 15:30:00"


def test_session_window_islands(spark):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.windows import session_agg
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-01 10:10:00", 20.0),  # same session (10 < 30 min)
        (1, "2024-01-01 10:41:00", 30.0),  # 31 min after last -> NEW session
        (2, "2024-01-01 09:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    out = session_agg(
        df, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]
    ).collect()
    sess_u1 = sorted(
        [(r.session_start.isoformat(), r.n) for r in out if r.user_id == 1]
    )
    assert sess_u1 == [("2024-01-01T10:00:00", 2), ("2024-01-01T10:41:00", 1)]
    assert [r.n for r in out if r.user_id == 2] == [1]


def test_hopping_window_fanout(spark):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.windows import hopping_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:20:00", 1.0)], "user_id int, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value")
    out = hopping_agg(
        df, "ts", "30 minutes", "15 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]
    ).collect()
    # one event in a 30/15 hop -> exactly the 10:00 and 10:15 windows
    assert sorted(r.window_start.isoformat() for r in out) == [
        "2024-01-01T10:00:00",
        "2024-01-01T10:15:00",
    ]


def test_salted_agg_equals_plain_agg(spark):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.skew import salted_agg
    from pyspark.sql import functions as F

    # one hot key (90% of rows) + a cold tail
    rows = [(1, float(i % 7)) for i in range(900)] + [
        (u, float(u)) for u in range(2, 102)
    ]
    df = spark.createDataFrame(rows, "user_id int, value double")
    got = {
        r.user_id: (r.n, r.total)
        for r in salted_agg(
            df,
            ["user_id"],
            partials=[
                (F.count(F.lit(1)), "pc"),
                (F.sum(F.col("value").cast("decimal(18,2)")), "ps"),
            ],
            finals=[("n", F.sum("pc")), ("total", F.sum("ps").cast("double"))],
            salt_buckets=8,
        ).collect()
    }
    want = {
        r.user_id: (r.n, r.total)
        for r in df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert got == want


def test_asof_join_inclusive_and_null_fill(spark):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 2, 5)], "id int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(100, 1, 10, "a"), (101, 1, 15, "b"), (102, 3, 1, "c")],
        "rid int, k int, ts int, payload string",
    )
    out = {r.id: r for r in asof_join(left, right, "k", left_ts="ts", right_ts="ts").collect()}
    assert out[1].asof_rid == 100  # inclusive: right at SAME ts matches
    assert out[2].asof_rid == 101  # latest prior, not first
    assert out[3].asof_rid is None  # no right rows for key 2 -> NULLs


def test_approx_distinct_within_error_bound(spark, sf_dir):
    from kafka_cdc_elasticsearch_pipeline_spark.queries import QUERIES

    exact = {
        r.channel: r.n_users
        for r in QUERIES["a_distinct_users_per_channel"].spark(spark, sf_dir).collect()
    }
    approx = {
        r.channel: r.n_users_approx
        for r in QUERIES["a_approx_distinct_users_per_channel"].spark(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for ch, n in exact.items():
        assert abs(approx[ch] - n) <= max(2, 0.05 * n)  # ~1% rsd, generous bound


def test_exact_decimal_stats_match_builtins(spark, sf_dir):
    """The decimal-sum formulation must agree with Spark's built-in
    var_samp/stddev/corr to float tolerance (the built-ins are the
    semantic reference; ours adds cross-engine determinism)."""
    from kafka_cdc_elasticsearch_pipeline_spark.queries import QUERIES
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table

    got = {
        r.channel: r
        for r in QUERIES["a_stats_per_channel"].spark(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.channel: r
        for r in ev.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.var_samp("value").alias("v"),
            F.stddev_samp("value").alias("s"),
            F.corr("value", F.get_json_object("props", "$.k").cast("double")).alias("c"),
        )
        .collect()
    }
    for ch, g in got.items():
        w = want[ch]
        assert abs(g.var_value - w.v) < 1e-4
        assert abs(g.stddev_value - w.s) < 1e-6
        assert abs(g.corr_vk - w.c) < 1e-6


def test_second_moment_stats_null_and_degenerate_groups(spark):
    """NULL-aware counts + pairwise-complete corr + NULL (not Inf/NaN)
    on 0/1-row groups — the round-1 advice finding. Planted frame:
    group 'a' has NULLs in both columns, 'b' is a single row, 'c' has
    zero variance in y."""
    import math

    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.operators.stats import (
        second_moment_stats,
    )

    rows = [
        Row(g="a", x=1.0, y=2.0),
        Row(g="a", x=3.0, y=None),
        Row(g="a", x=None, y=4.0),
        Row(g="a", x=5.0, y=6.0),
        Row(g="a", x=7.0, y=8.0),
        Row(g="b", x=9.0, y=1.0),
        Row(g="c", x=1.0, y=5.0),
        Row(g="c", x=2.0, y=5.0),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.g: r
        for r in second_moment_stats(
            df,
            F.col("g"),
            F.col("x").cast("decimal(18,2)"),
            F.col("y").cast("decimal(18,2)"),
        ).collect()
    }
    # Built-in comparison only on the well-formed group: under ANSI
    # mode Spark's own corr() THROWS DIVIDE_BY_ZERO on the degenerate
    # groups (1 row / zero variance) — exactly the failure class the
    # nullif guards exist to avoid.
    want = (
        df.filter(F.col("g") == "a")
        .groupBy("g")
        .agg(
            F.avg("x").alias("m"),
            F.var_samp("x").alias("v"),
            F.stddev_samp("x").alias("s"),
            F.corr("x", "y").alias("c"),
        )
        .collect()[0]
    )
    a = out["a"]
    assert abs(a.mean_value - want.m) < 1e-9
    assert abs(a.var_value - want.v) < 1e-6 and abs(a.stddev_value - want.s) < 1e-6
    assert abs(a.corr_vk - want.c) < 1e-6
    assert not math.isnan(a.corr_vk)
    # n is the raw row count; mean skipped the NULL x in group 'a'
    assert a.n == 5.0 and abs(a.mean_value - 4.0) < 1e-9
    # degenerate groups: NULL everywhere a division/√ would blow up
    b, c = out["b"], out["c"]
    assert b.var_value is None and b.stddev_value is None and b.corr_vk is None
    assert abs(b.mean_value - 9.0) < 1e-9
    assert c.var_value is not None  # two x values → variance exists
    assert c.corr_vk is None  # but y has zero variance → NULL corr


def test_scd2_is_current_slice_equals_latest_per_key(spark):
    """The SCD2 table's current slice must equal the TABLE reduce —
    one changelog, two consistent materializations."""
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.operators.scd import scd2_history
    from kafka_cdc_elasticsearch_pipeline_spark.operators.table import latest_per_key

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, user_id=i % 3, ts=t0 + datetime.timedelta(minutes=i), value=float(i))
        for i in range(12)
    ]
    # planted tie: same ts as event 11 for user 2, higher event_id wins
    rows.append(Row(event_id=99, user_id=2, ts=t0 + datetime.timedelta(minutes=11), value=99.0))
    df = spark.createDataFrame(rows)

    scd = scd2_history(df, ["user_id"], "ts", tiebreak="event_id")
    current = scd.filter("is_current").select("event_id", "user_id", "ts", "value")
    table = latest_per_key(df, ["user_id"], "ts", tiebreak="event_id")
    assert sorted(map(tuple, current.collect())) == sorted(map(tuple, table.collect()))
    # intervals chain: each non-current valid_to equals the successor's valid_from
    hist = scd.orderBy("user_id", "valid_from", "event_id").collect()
    by_user: dict = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    for versions in by_user.values():
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from
        assert versions[-1].is_current and versions[-1].valid_to is None
