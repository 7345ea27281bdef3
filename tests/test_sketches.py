"""Count-min sketch (operators/sketches.py) and reservoir sampling
(extensions/sampling.py) — the properties the gate rows rely on:

- CMS never undercounts and respects the e·N/w overcount bound on the
  gated fixture;
- CMS mergeability: sketch(a ∪ b) == cms_merge(sketch(a), sketch(b))
  counter-for-counter (the property that makes per-shard builds
  composable at 100 TB);
- reservoir: exactly min(k, |group|) rows per group, ranks 1..k,
  deterministic across re-runs, and the salted two-phase form is
  bit-identical to the single-phase form (the claim its docstring
  makes for the scale path).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions.sampling import (
    reservoir_sample_per_group,
)
from kafka_cdc_elasticsearch_pipeline_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table

DEPTH, WIDTH = 4, 1024


def test_cms_upper_bound_and_slack(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, F.col("user_id"), depth=DEPTH, width=WIDTH)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(exact, sketch, "user_id", depth=DEPTH, width=WIDTH)
    n_total = ev.count()
    slack = math.ceil(n_total * math.e / WIDTH)
    rows = est.collect()  # bounded: one row per distinct user (≤ ~200 at test SF)
    assert rows, "no users sketched"
    for r in rows:
        assert r.cms_estimate >= r.n_exact, f"CMS undercounted {r.user_id}"
        assert r.cms_estimate - r.n_exact <= slack, (
            f"CMS overcount {r.cms_estimate - r.n_exact} > slack {slack} "
            f"for {r.user_id}"
        )


def test_cms_merge_equals_whole(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    merged = cms_merge(
        cms_build(half_a, F.col("user_id"), depth=DEPTH, width=WIDTH),
        cms_build(half_b, F.col("user_id"), depth=DEPTH, width=WIDTH),
    )
    whole = cms_build(ev, F.col("user_id"), depth=DEPTH, width=WIDTH)
    # counter-for-counter equality, not just equal estimates
    diff = merged.withColumnRenamed("cnt", "cnt_m").join(
        whole, ["row_idx", "bucket"], "full"
    )
    bad = diff.filter(
        F.col("cnt_m").isNull()
        | F.col("cnt").isNull()
        | (F.col("cnt_m") != F.col("cnt"))
    )
    assert bad.count() == 0


def test_cms_unseen_key_estimates_small(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, F.col("user_id"), depth=DEPTH, width=WIDTH)
    probe = spark.range(1).select(F.lit(-999_999_999).alias("user_id"))
    [(row)] = cms_estimate(probe, sketch, "user_id", depth=DEPTH, width=WIDTH).collect()
    # an unseen key's estimate is pure collision mass: ≤ slack, never negative
    assert 0 <= row.cms_estimate <= math.ceil(ev.count() * math.e / WIDTH)


def test_cms_estimate_rejects_reserved_columns(spark, sf_dir):
    import pytest

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, F.col("user_id"))
    probe = ev.select("user_id", F.lit(1).alias("bucket")).limit(1)
    with pytest.raises(ValueError, match="collides"):
        cms_estimate(probe, sketch, "user_id")


def test_reservoir_exact_k_per_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k = 8
    out = reservoir_sample_per_group(docs, "source", "doc_id", k=k)
    sizes = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    group_sizes = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {s: min(k, n) for s, n in group_sizes.items()}
    ranks = out.groupBy("source").agg(F.max("sample_rank").alias("mx")).collect()
    assert all(r.mx <= k for r in ranks)


def test_reservoir_two_phase_equals_single_phase(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    single = reservoir_sample_per_group(docs, "source", "doc_id", k=8)
    for n_salts in (2, 4, 16):
        salted = reservoir_sample_per_group(
            docs, "source", "doc_id", k=8, n_salts=n_salts
        )
        sym = single.select("doc_id", "source", "sample_rank").exceptAll(
            salted.select("doc_id", "source", "sample_rank")
        )
        assert sym.count() == 0, f"n_salts={n_salts} diverged from single-phase"
        assert salted.count() == single.count()


def test_reservoir_small_group_keeps_all(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k_huge = 10_000_000
    out = reservoir_sample_per_group(docs, "source", "doc_id", k=k_huge, n_salts=4)
    assert out.count() == docs.count()


def test_cms_streaming_twin_equals_batch_sketch(spark, sf_dir):
    """The sketch is a groupBy of additive counters, so a streaming
    'complete'-mode aggregation over a micro-batched replay IS the
    incremental sketch — after the replay drains, every counter equals
    the batch build's (the streaming face of mergeability)."""
    from kafka_cdc_elasticsearch_pipeline_spark.streaming.replay import (
        cleanup,
        replay_stream,
        run_to_memory,
    )

    stream, tmp = replay_stream(spark, sf_dir, "events", chunks=4)
    try:
        streamed = cms_build(stream, F.col("user_id"), depth=DEPTH, width=WIDTH)
        run_to_memory(streamed, "cms_stream", output_mode="complete")
        got = sorted(map(tuple, spark.table("cms_stream").collect()))
    finally:
        cleanup(tmp)
    ev = load_table(spark, sf_dir, "events")
    want = sorted(
        map(tuple, cms_build(ev, F.col("user_id"), depth=DEPTH, width=WIDTH).collect())
    )
    assert got == want


def test_cms_estimate_preserves_duplicates_and_nulls(spark):
    """Output cardinality == input cardinality, via retry-deterministic
    value-grouping (round-8 advice replaced the pre-explode
    monotonically_increasing_id regroup key): duplicate probe rows and
    NULL-key rows each keep their own output row, and duplicates carry
    identical estimates."""
    from pyspark.sql import Row

    base = spark.createDataFrame(
        [Row(k="a")] * 5 + [Row(k="b")] * 2 + [Row(k=None)]
    )
    sketch = cms_build(base, F.col("k"), depth=DEPTH, width=WIDTH)
    probes = spark.createDataFrame(
        [Row(k="a"), Row(k="a"), Row(k=None), Row(k=None), Row(k="zzz")]
    )
    out = cms_estimate(probes, sketch, "k", depth=DEPTH, width=WIDTH).collect()
    assert len(out) == 5  # 2 dups + 2 nulls + 1 miss, none collapsed
    by_k: dict = {}
    for r in out:
        by_k.setdefault(r.k, []).append(r.cms_estimate)
    assert by_k["a"] == [5, 5][: len(by_k["a"])] and len(by_k["a"]) == 2
    assert len(by_k[None]) == 2  # NULL keys hash (xxhash64 seed-only)
    assert all(e >= 1 for e in by_k[None])  # the one sketched NULL row


def test_cms_estimate_rejects_map_probe_column(spark):
    """Round-9 advice: value-grouping requires groupable probe columns
    — a MapType side column must fail with the explicit contract error
    (stringify or drop it), not a deep AnalysisException at groupBy."""
    from kafka_cdc_elasticsearch_pipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2})],
        "k bigint, attrs map<string, bigint>",
    )
    sketch = cms_build(rows, F.col("k"))
    with pytest.raises(ValueError, match="MapType"):
        cms_estimate(rows, sketch, "k")
    # nested maps are just as ungroupable — the walk must recurse
    nested = rows.select("k", F.struct("attrs").alias("wrapped"))
    with pytest.raises(ValueError, match="MapType"):
        cms_estimate(nested, sketch, "k")
    arr = rows.select("k", F.array("attrs").alias("attrs_list"))
    with pytest.raises(ValueError, match="MapType"):
        cms_estimate(arr, sketch, "k")
    # the documented workaround passes
    ok = cms_estimate(
        rows.select("k", F.to_json("attrs").alias("attrs")), sketch, "k"
    )
    assert ok.count() == 2
