"""Property-based tests (hypothesis): physical-strategy equivalences
that must hold for ANY input, not just the fixtures — the two
latest-per-key plans, salted vs plain aggregation, and session
islands vs a direct Python reference implementation."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.operators.table import latest_per_key

EPOCH = datetime.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # key
        st.integers(min_value=0, max_value=50),    # ts offset (collisions likely)
        st.integers(min_value=0, max_value=100),   # value
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=events)
@settings(**_SETTINGS)
def test_latest_per_key_strategies_agree_on_any_input(spark, rows):
    df = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(rows)],
        "k int, ts int, seq int, v int",
    )
    a = latest_per_key(df, ["k"], "ts", tiebreak="seq", method="max_by")
    b = latest_per_key(df, ["k"], "ts", tiebreak="seq", method="window")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and both agree with the obvious python reference
    want = {}
    for i, (k, t, v) in enumerate(rows):
        if k not in want or (t, i) > (want[k][1], want[k][2]):
            want[k] = (k, t, i, v)
    assert sorted(map(tuple, a.collect())) == sorted(want.values())


@given(rows=events)
@settings(**_SETTINGS)
def test_salted_agg_equals_plain_on_any_input(spark, rows):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k int, ts int, v int")
    got = {
        r.k: (r.n, r.total)
        for r in salted_agg(
            df,
            ["k"],
            partials=[(F.count(F.lit(1)), "pc"), (F.sum("v"), "ps")],
            finals=[("n", F.sum("pc")), ("total", F.sum("ps"))],
            salt_buckets=4,
        ).collect()
    }
    want = {}
    for k, _, v in rows:
        n, tot = want.get(k, (0, 0))
        want[k] = (n + 1, tot + v)
    assert got == want


@given(rows=events)
@settings(**_SETTINGS)
def test_session_islands_match_python_reference(spark, rows):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.windows import session_agg

    gap_minutes = 5
    df = spark.createDataFrame(rows, "k int, mins int, v int").select(
        "k",
        (F.lit(EPOCH) + F.make_interval(mins=F.col("mins"))).cast("timestamp_ntz").alias("ts"),
        "v",
    )
    got = sorted(
        (r.k, r.session_start.isoformat(), r.n)
        for r in session_agg(
            df, "ts", f"{gap_minutes} minutes", ["k"], [F.count(F.lit(1)).alias("n")]
        ).collect()
    )
    # python reference: closed-interval merge (diff <= gap stays)
    by_key: dict[int, list[int]] = {}
    for k, t, _ in rows:
        by_key.setdefault(k, []).append(t)
    want = []
    for k, ts in by_key.items():
        ts.sort()
        start, n, prev = ts[0], 0, None
        for t in ts:
            if prev is not None and t - prev > gap_minutes:
                want.append((k, (EPOCH + datetime.timedelta(minutes=start)).isoformat(), n))
                start, n = t, 0
            n += 1
            prev = t
        want.append((k, (EPOCH + datetime.timedelta(minutes=start)).isoformat(), n))
    assert got == sorted(want)
