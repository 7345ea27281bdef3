"""Manifest-level data skipping + Z-order clustering (sources/lakelog.py).

The contract under test: per-file [min, max] stats recorded at commit
time let a reader PROVE files irrelevant to a comparison predicate and
skip them at file-listing time, and a Z-ordered compaction makes that
skipping effective on every clustered column at once. Pruning is an
optimization only — every test also checks the result is exactly the
filtered full scan.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.sources import lakelog


def _mk(spark, lo, hi, n=100):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"),
        (F.lit(lo) + F.pmod(F.col("id"), F.lit(hi - lo))).alias("v"),
    )


def _table(tmp_path, name):
    return os.path.join(str(tmp_path), name)


def test_commit_records_per_file_stats(spark, tmp_path):
    t = _table(tmp_path, "t1")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    lakelog.commit(t, df.repartition(4), "full", stat_cols=["k", "v"])
    man = lakelog.read_manifest(t, 1)
    stats = man["file_stats"][man["data_dirs"][0]]
    assert len(stats) >= 2  # several part files
    assert sum(s["n"] for s in stats.values()) == 1000
    ks = [s["cols"]["k"] for s in stats.values()]
    assert min(mn for mn, _ in ks) == 0
    assert max(mx for _, mx in ks) == 999
    for mn, mx in (s["cols"]["v"] for s in stats.values()):
        assert mn % 2 == 0 and mx % 2 == 0


@pytest.mark.parametrize(
    "op,val,expect",
    [
        ("==", 5, True),
        ("==", 11, False),
        ("==", -1, False),
        (">=", 10, True),
        (">=", 11, False),
        (">", 10, False),
        (">", 9, True),
        ("<=", 0, True),
        ("<=", -1, False),
        ("<", 0, False),
        ("<", 1, True),
    ],
)
def test_file_may_match_ops(op, val, expect):
    entry = {"cols": {"c": [0, 10]}}
    assert lakelog._file_may_match(entry, "c", op, val) is expect


def test_file_may_match_edge_cases():
    # all-null file: every supported op is null-rejecting => prune
    e = {"cols": {"c": [None, None]}}
    assert lakelog._file_may_match(e, "c", ">=", 0) is False
    # unknown column or kind mismatch: keep (never guess an ordering)
    assert lakelog._file_may_match({"cols": {"c": [0, 10]}}, "other", "==", 5) is True
    assert lakelog._file_may_match({"cols": {"c": ["a", "z"]}}, "c", ">=", 5) is True
    with pytest.raises(ValueError):
        lakelog._file_may_match({"cols": {"c": [0, 10]}}, "c", "!=", 5)
    # None probe: null-rejecting ops can never match -> prune cleanly
    # instead of TypeError on `mn <= None` (r05 advice item)
    for op in ("==", ">=", ">", "<=", "<"):
        assert lakelog._file_may_match({"cols": {"c": [0, 10]}}, "c", op, None) is False
    assert lakelog._file_may_match({"cols": {"c": ["a", "z"]}}, "c", "==", None) is False


def test_file_may_match_bloom():
    bits = lakelog._bloom_bits_py(42)
    entry = {
        "bloom": {
            "c": lakelog._pack_bloom(bits, lakelog.BLOOM_BITS, lakelog.BLOOM_K, "i")
        }
    }
    assert lakelog._file_may_match(entry, "c", "==", 42) is True
    # a value whose bits are absent is provably not in the file
    other = lakelog._bloom_bits_py(43)
    assert set(other) != set(bits)
    assert lakelog._file_may_match(entry, "c", "==", 43) is False
    # bloom never affects range ops
    assert lakelog._file_may_match(entry, "c", ">=", 43) is True


def test_append_commits_inherit_stats_and_prune(spark, tmp_path):
    t = _table(tmp_path, "t2")
    for lo in (0, 1000, 2000, 3000):
        batch = spark.range(lo, lo + 1000).select(F.col("id").alias("k"))
        lakelog.append_commit(spark, t, batch.coalesce(1), stat_cols=["k"])
    man = lakelog.read_manifest(t, 4)
    # stats carried forward: all four dirs statted in the head manifest
    assert set(man["file_stats"]) == set(man["data_dirs"])

    kept, skipped = lakelog.plan_scan(t, man, [("k", ">=", 3000)])
    assert len(kept) == 1 and skipped == 3

    got = lakelog.read(spark, t, where=[("k", ">=", 2500)])
    full = lakelog.read(spark, t).filter(F.col("k") >= 2500)
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in full.collect()
    )


def test_prune_everything_returns_empty_with_schema(spark, tmp_path):
    t = _table(tmp_path, "t3")
    lakelog.commit(
        t,
        spark.range(0, 10).select(F.col("id").alias("k")),
        "full",
        stat_cols=["k"],
    )
    got = lakelog.read(spark, t, where=[("k", ">", 99)])
    assert got.columns == ["k"]
    assert got.count() == 0


def test_unstatted_dirs_are_never_pruned(spark, tmp_path):
    t = _table(tmp_path, "t4")
    lakelog.commit(t, spark.range(0, 10).select(F.col("id").alias("k")), "full")
    man = lakelog.read_manifest(t, 1)
    kept, skipped = lakelog.plan_scan(t, man, [("k", ">", 99)])
    assert skipped == 0 and len(kept) >= 1
    assert lakelog.read(spark, t, where=[("k", ">", 99)]).count() == 0


def test_timestamp_stats_prune_as_strings(spark, tmp_path):
    t = _table(tmp_path, "t5")
    df = spark.createDataFrame(
        [Row(k=i, ts=f"2024-01-{d:02d} 12:00:00") for i, d in enumerate([1, 2, 3])]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    for d in range(3):
        lakelog.append_commit(
            spark, t, df.filter(F.col("k") == d).coalesce(1), stat_cols=["ts"]
        )
    man = lakelog.read_manifest(t, 3)
    kept, skipped = lakelog.plan_scan(
        t, man, [("ts", ">=", "2024-01-03 00:00:00")]
    )
    assert len(kept) == 1 and skipped == 2
    got = lakelog.read(spark, t, where=[("ts", ">=", "2024-01-03 00:00:00")])
    assert [r.k for r in got.collect()] == [2]


def _skip_fraction(t, man, where):
    kept, skipped = lakelog.plan_scan(t, man, where)
    return skipped / (len(kept) + skipped)


def test_zorder_compaction_skips_on_both_columns(spark, tmp_path):
    """Z-order vs linear sort: after OPTIMIZE ZORDER BY (x, y), a range
    predicate on EITHER column must prune a substantial file fraction;
    a linear sort on x prunes nothing for the same y predicate."""
    n, files = 4096, 16
    grid = spark.range(0, n).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("int").alias("y")
    )

    tz = _table(tmp_path, "tz")
    lakelog.commit(tz, grid, "full", stat_cols=["x", "y"])
    lakelog.compact(
        spark, tz, cluster_by=["x", "y"], n_files=files, stat_cols=["x", "y"]
    )
    man_z = lakelog.read_manifest(tz, lakelog.latest_version(tz))

    tl = _table(tmp_path, "tl")
    lakelog.commit(tl, grid, "full", stat_cols=["x", "y"])
    lakelog.compact(spark, tl, cluster_by=["x"], n_files=files, stat_cols=["x", "y"])
    man_l = lakelog.read_manifest(tl, lakelog.latest_version(tl))

    x_pred = [("x", "<", 8)]
    y_pred = [("y", "<", 8)]
    # Z-order: meaningful skipping on BOTH dimensions
    assert _skip_fraction(tz, man_z, x_pred) >= 0.5
    assert _skip_fraction(tz, man_z, y_pred) >= 0.5
    # linear: near-perfect on the sort column, nothing on the other
    assert _skip_fraction(tl, man_l, x_pred) >= 0.5
    assert _skip_fraction(tl, man_l, y_pred) == 0.0

    # clustering never changes content
    got = sorted(
        (r.x, r.y) for r in lakelog.read(spark, tz, where=y_pred).collect()
    )
    want = sorted((r.x, r.y) for r in grid.filter(F.col("y") < 8).collect())
    assert got == want


def test_zorder_key_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [Row(a=None, b=7), Row(a=1.0, b=7), Row(a=2.0, b=7)]
    )
    out = df.withColumn("z", lakelog.zorder_key(df, ["a", "b"], bits=4)).collect()
    zs = {r.a: r.z for r in out}
    # constant column contributes 0 bits; null maps to bucket 0
    assert zs[None] == 0
    assert zs[1.0] == 0  # min of range -> bucket 0
    assert zs[2.0] > zs[1.0]


def test_bloom_point_lookup_prunes_unclustered_files(spark, tmp_path):
    """Keys hash-distributed across files: every file's [min, max]
    spans the domain (range stats prune nothing), but the bloom
    bit-sets prove absence for most files on a point lookup."""
    t = _table(tmp_path, "tb")
    # 16 files, each holding a DISJOINT but interleaved key set whose
    # min/max nearly spans [0, 4096)
    df = spark.range(0, 4096).select(F.col("id").alias("k"))
    lakelog.commit(
        t, df.repartition(16, "k"), "full", stat_cols=["k"], bloom_cols=["k"]
    )
    man = lakelog.read_manifest(t, 1)

    # range predicate on the hash-distributed key: useless
    kept_r, skipped_r = lakelog.plan_scan(t, man, [("k", ">=", 4000)])
    assert skipped_r == 0

    # point lookup: bloom prunes most files (k=1234 lives in exactly one)
    kept_p, skipped_p = lakelog.plan_scan(t, man, [("k", "==", 1234)])
    assert skipped_p >= 8, f"bloom should prune most files, skipped {skipped_p}"
    got = lakelog.read(spark, t, where=[("k", "==", 1234)]).collect()
    assert [r.k for r in got] == [1234]

    # absent key: may prune everything, result must still be empty+typed
    got2 = lakelog.read(spark, t, where=[("k", "==", 99999)])
    assert got2.count() == 0 and got2.columns == ["k"]


def test_metadata_only_stats(spark, tmp_path):
    t = _table(tmp_path, "tm")
    for lo in (0, 500, 1000):
        lakelog.append_commit(
            spark,
            t,
            spark.range(lo, lo + 500).select(F.col("id").alias("k")),
            stat_cols=["k"],
        )
    stats = lakelog.metadata_stats(t, cols=["k"])
    assert stats["n_rows"] == 1500
    assert stats["cols"]["k"] == [0, 1499]
    # time travel: version 2's metadata reflects only two appends
    stats_v2 = lakelog.metadata_stats(t, version=2, cols=["k"])
    assert stats_v2["n_rows"] == 1000 and stats_v2["cols"]["k"] == [0, 999]


def test_metadata_stats_refuses_statless_snapshots(spark, tmp_path):
    t = _table(tmp_path, "tn")
    lakelog.commit(t, spark.range(5).select(F.col("id").alias("k")), "full")
    with pytest.raises(ValueError, match="fall back"):
        lakelog.metadata_stats(t)


def test_purge_rewrites_only_dirty_dirs(spark, tmp_path):
    t = _table(tmp_path, "tp")
    for lo in (0, 1000, 2000, 3000):
        lakelog.append_commit(
            spark,
            t,
            spark.range(lo, lo + 1000).select(F.col("id").alias("k")).coalesce(1),
            stat_cols=["k"],
            bloom_cols=["k"],
        )
    before = lakelog.read_manifest(t, 4)["data_dirs"]
    version, rewritten, inherited = lakelog.purge_rows(
        spark, t, "k", [1500, 1501], stat_cols=["k"], bloom_cols=["k"]
    )
    assert (version, rewritten, inherited) == (5, 1, 3)
    after = lakelog.read_manifest(t, 5)["data_dirs"]
    # three dirs inherited BY REFERENCE (same names), one replaced
    assert len(set(before) & set(after)) == 3
    got = sorted(r.k for r in lakelog.read(spark, t).collect())
    assert len(got) == 3998 and 1500 not in got and 1501 not in got
    # time travel still sees the pre-purge data (deletion completes at vacuum)
    assert lakelog.read(spark, t, version=4).filter(F.col("k") == 1500).count() == 1


def test_purge_no_match_is_metadata_only(spark, tmp_path):
    t = _table(tmp_path, "tp2")
    lakelog.append_commit(
        spark,
        t,
        spark.range(0, 100).select(F.col("id").alias("k")),
        stat_cols=["k"],
    )
    version, rewritten, inherited = lakelog.purge_rows(spark, t, "k", [999])
    # range stats prove absence: no new version, nothing rewritten
    assert (version, rewritten, inherited) == (1, 0, 1)
    assert lakelog.latest_version(t) == 1


def test_purge_keeps_null_keys(spark, tmp_path):
    from pyspark.sql import Row

    t = _table(tmp_path, "tp3")
    df = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=None)], "k int"
    )
    lakelog.commit(t, df, "full", stat_cols=["k"])
    lakelog.purge_rows(spark, t, "k", [1])
    got = sorted(
        (r.k if r.k is not None else -1) for r in lakelog.read(spark, t).collect()
    )
    assert got == [-1, 2]  # the NULL row survives the anti-filter


def test_merge_schema_read_unions_generations(spark, tmp_path):
    t = _table(tmp_path, "ts")
    lakelog.append_commit(
        spark, t, spark.range(0, 5).select(F.col("id").alias("k"))
    )
    lakelog.append_commit(
        spark,
        t,
        spark.range(5, 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
        ),
    )
    merged = lakelog.read(spark, t, merge_schema=True)
    assert set(merged.columns) == {"k", "extra"}
    rows = {r.k: r.extra for r in merged.collect()}
    assert rows[0] is None and rows[9] == 18


def test_change_feed_increments_partition_the_table(spark, tmp_path):
    t = _table(tmp_path, "cf")
    for lo in (0, 100, 200):
        lakelog.append_commit(
            spark, t, spark.range(lo, lo + 100).select(F.col("id").alias("k"))
        )
    a = {r.k for r in lakelog.read_changes(spark, t, 0, 1).collect()}
    b = {r.k for r in lakelog.read_changes(spark, t, 1).collect()}  # to head
    assert a == set(range(100))
    assert b == set(range(100, 300))
    # caught-up consumer: empty increment, schema preserved
    empty = lakelog.read_changes(spark, t, 3)
    assert empty.count() == 0 and empty.columns == ["k"]


def test_change_feed_refuses_non_additive_commits(spark, tmp_path):
    """compact records ``content_identical`` so feeds SKIP it (the
    layout-only claim); a rewrite WITHOUT the claim — purge — still
    refuses, because rows genuinely changed under the consumer."""
    t = _table(tmp_path, "cf2")
    df = spark.range(0, 10).select(
        F.col("id").alias("user_id"), F.col("id").alias("ts"),
        F.col("id").alias("event_id"),
    )
    lakelog.append_commit(spark, t, df)
    lakelog.compact(spark, t)
    # feed across the compact: the appended rows, rewrite skipped
    assert lakelog.read_changes(spark, t, 0).count() == 10
    lakelog.purge_rows(spark, t, "user_id", [3])
    with pytest.raises(ValueError, match="non-additive"):
        lakelog.read_changes(spark, t, 0)
    # resuming AFTER the rewrite works again
    lakelog.append_commit(spark, t, df)
    assert lakelog.read_changes(spark, t, 3).count() == 10


def test_history_lists_versions_newest_first(spark, tmp_path):
    t = _table(tmp_path, "th")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    lakelog.append_commit(spark, t, df)
    lakelog.txn_append_commit(spark, t, df, "app", 0)
    lakelog.compact(spark, t)
    h = lakelog.history(t)
    assert [r["version"] for r in h] == [3, 2, 1]
    assert [r["operation"] for r in h] == ["compact", "txn_append", "append"]
    assert h[0]["txns"] == {"app": 0}  # carried through the compact
    assert h[0]["n_data_dirs"] == 1 and h[1]["n_data_dirs"] == 2


def test_purge_then_vacuum_removes_bytes_on_disk(spark, tmp_path):
    """The GDPR completion contract: purge makes the key invisible,
    VACUUM makes it physically gone — no remaining parquet file under
    the table contains the key."""
    t = _table(tmp_path, "tv")
    for lo in (0, 1000):
        lakelog.append_commit(
            spark,
            t,
            spark.range(lo, lo + 1000).select(F.col("id").alias("k")).coalesce(1),
            stat_cols=["k"],
        )
    lakelog.purge_rows(spark, t, "k", [1500], stat_cols=["k"])
    # pre-vacuum: time travel still reaches the bytes (by design)
    assert lakelog.read(spark, t, version=2).filter(F.col("k") == 1500).count() == 1
    lakelog.vacuum(t, keep_last=1, min_age_s=0)
    # every parquet file still on disk is free of the key
    leftovers = spark.read.parquet(os.path.join(t, "data-*")).filter(
        F.col("k") == 1500
    )
    assert leftovers.count() == 0
    assert lakelog.read(spark, t).count() == 1999


def test_lake_append_sink_is_exactly_once_through_writestream(spark, tmp_path):
    import pyspark.sql.types as T

    from kafka_cdc_elasticsearch_pipeline_spark.streaming.lake_sink import (
        lake_append_sink,
    )

    src = _table(tmp_path, "src")
    t = _table(tmp_path, "sink_t")
    ckpt = _table(tmp_path, "ckpt")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    df.coalesce(1).write.parquet(src)

    sink = lake_append_sink(spark, t, app_id="ingest")

    def double_delivering(batch_df, batch_id):
        first = sink(batch_df, batch_id)
        second = sink(batch_df, batch_id)
        assert first is not None and second is None

    schema = T.StructType([T.StructField("k", T.LongType())])
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(double_delivering)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert lakelog.read(spark, t).count() == 100


def test_bloom_type_mismatch_never_prunes(spark, tmp_path):
    """A probe value whose Python string form differs from the JVM
    string cast (float vs bigint column) must KEEP files, not prune
    them — the guard that turns a wrong hash into a slow read instead
    of a silently empty one."""
    t = _table(tmp_path, "tbk")
    lakelog.commit(
        t,
        spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1),
        "full",
        bloom_cols=["k"],
    )
    man = lakelog.read_manifest(t, 1)
    kept_f, skipped_f = lakelog.plan_scan(t, man, [("k", "==", 42.0)])
    assert skipped_f == 0  # float probe vs integral column: no pruning
    got = lakelog.read(spark, t, where=[("k", "==", 42.0)]).collect()
    assert [r.k for r in got] == [42]
    # unsupported bloom column types are refused at commit time
    with pytest.raises(ValueError, match="int/string"):
        lakelog.commit(
            _table(tmp_path, "tbk2"),
            spark.range(3).select((F.col("id") * 1.5).alias("x")),
            "full",
            bloom_cols=["x"],
        )


def test_empty_pruned_read_uses_newest_schema(spark, tmp_path):
    t = _table(tmp_path, "tns")
    lakelog.append_commit(
        spark, t, spark.range(0, 5).select(F.col("id").alias("k")),
        stat_cols=["k"],
    )
    lakelog.append_commit(
        spark,
        t,
        spark.range(5, 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
        ),
        stat_cols=["k"],
    )
    got = lakelog.read(spark, t, where=[("k", ">", 99)], merge_schema=True)
    assert got.count() == 0
    assert "extra" in got.columns  # newest generation's schema survives
    empty_feed = lakelog.read_changes(spark, t, 2)
    assert empty_feed.count() == 0 and "extra" in empty_feed.columns


def test_zorder_key_rejects_overflow_and_uses_long(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(a=float(i), b=float(i)) for i in range(4)])
    with pytest.raises(ValueError, match="63"):
        lakelog.zorder_key(df, ["a", "b", "c", "d"], bits=16)
    # 4 cols x 8 bits = 32 interleaved bits: must not wrap negative
    df4 = spark.createDataFrame(
        [Row(a=float(i), b=float(i), c=float(i), d=float(i)) for i in range(64)]
    )
    zs = [
        r.z
        for r in df4.withColumn(
            "z", lakelog.zorder_key(df4, ["a", "b", "c", "d"], bits=8)
        ).collect()
    ]
    assert all(z >= 0 for z in zs)
    assert max(zs) > 2**31  # top of the range actually uses bits >= 32


def test_in_predicate_prunes_by_bloom_and_is_exact(spark, tmp_path):
    """The "in" prune op: a file survives if ANY member may match
    (bloom + range probes per member), the row filter applies isin
    exactly, None members are null-rejecting, an empty list matches
    nothing."""
    t = _table(tmp_path, "tin")
    df = spark.range(0, 4096).select(F.col("id").alias("k"))
    lakelog.commit(
        t, df.repartition(16, "k"), "full", stat_cols=["k"], bloom_cols=["k"]
    )
    man = lakelog.read_manifest(t, 1)

    keys = [7, 1234, 4000]
    kept, skipped = lakelog.plan_scan(t, man, [("k", "in", keys)])
    # three point probes keep at most three files (plus bloom FPs)
    assert skipped >= 8, f"bloom should prune most files, skipped {skipped}"
    got = sorted(
        r.k for r in lakelog.read(spark, t, where=[("k", "in", keys)]).collect()
    )
    assert got == keys

    # None members are ignored (null-rejecting), result unchanged
    got_n = sorted(
        r.k
        for r in lakelog.read(
            spark, t, where=[("k", "in", [None, 7, 1234, 4000])]
        ).collect()
    )
    assert got_n == keys

    # empty list: every file pruned, empty result with the schema intact
    empty = lakelog.read(spark, t, where=[("k", "in", [])])
    assert empty.count() == 0 and empty.columns == ["k"]
