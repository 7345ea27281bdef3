"""Measure the ES-aggs compiler (`search_serve.aggs_flat`) across
corpus size, against the strategy it replaces.

Claims under test (round-12 docstrings, made numbers):
- the whole bucket tree is ONE rollup pass (grouping sets: every
  prefix level in one shuffle with map-side partials), so wall
  tracks a single aggregation of the corpus — a naive per-level
  implementation (one groupBy per level, the obvious translation of
  an ES agg tree) re-scans and re-shuffles the corpus once per level;
- with a truncating terms level, the `reuse()` pin keeps the
  truncation branches on the bucket frame: unpinned, the self-union
  re-runs the whole match-set rollup once per plan reference
  (measured — no ReusedExchange fires there);
- `sorted_rank` (ES sort-by-field) costs what the relevance window
  costs: both are one rank window over the match set; the sort adds
  only the metadata join.

Protocol: synthetic metadata written to PARQUET first (scan cost must
be real — the pin's value is scans avoided), 3-day × 37-key × numeric
column shape, spec = date_histogram(1d) > terms(size 5) > avg.
Best-of-2 after one warm-up. Run on an idle machine; walls are
local[32] relative measures.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000,10000000")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
        search_serve as serve,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.operators import caching

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .appName("aggs_scale_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = {
        "by_day": {
            "date_histogram": {"field": "ts", "fixed_interval": "1d"},
            "aggs": {
                "by_key": {
                    "terms": {"field": "k", "size": 5},
                    "aggs": {"mean": {"avg": {"field": "v"}}},
                }
            },
        }
    }

    def naive_per_level(meta):
        """The strategy the compiler replaces: one groupBy per level
        (top count, per-day counts, per-(day,key) counts+avg), each a
        separate corpus aggregation — the obvious ES-tree translation."""
        day = F.timestamp_micros(
            (F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
             * F.lit(86_400_000_000)).cast("bigint")
        ).alias("by_day")
        a = meta.agg(F.count(F.lit(1))).collect()
        b = meta.groupBy(day).agg(F.count(F.lit(1))).collect()
        c = (
            meta.groupBy(day, F.col("k"))
            .agg(F.count(F.lit(1)).alias("doc_count"), F.avg("v"))
            .collect()
        )
        return len(a) + len(b) + len(c)

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    print(
        "| rows | rollup pin | rollup nopin | naive "
        "| rollup pin (computed) | rollup nopin (computed) "
        "| naive (computed) |"
    )
    print("|---|---|---|---|---|---|---|")
    for n in (int(s) for s in args.sizes.split(",")):
        root = tempfile.mkdtemp(prefix="aggs_probe_")
        try:
            path = os.path.join(root, "meta")
            (
                spark.range(0, n)
                .select(
                    F.col("id").alias("doc_id"),
                    F.expr(
                        "timestamp'2024-01-01' + make_interval(0,0,0,0,"
                        " cast(id % 72 as int), 0, 0)"
                    ).alias("ts"),
                    F.concat(F.lit("k"), (F.col("id") % 37).cast("string"))
                    .alias("k"),
                    (F.col("id") % 1000).alias("v"),
                )
                .write.mode("overwrite")
                .parquet(path)
            )
            meta = spark.read.parquet(path)

            def pinned():
                os.environ["SPARK_GRAFT_PIN_REUSED"] = "1"
                serve.aggs_flat(meta, spec).collect()
                caching.release_pinned()

            def unpinned():
                os.environ["SPARK_GRAFT_PIN_REUSED"] = "0"
                serve.aggs_flat(meta, spec).collect()

            pinned()  # warm-up (JIT + page cache)
            tp = timed(pinned)
            tu = timed(unpinned)
            os.environ["SPARK_GRAFT_PIN_REUSED"] = "1"
            tn = timed(lambda: naive_per_level(meta))
            # the REST serve's match set is COMPUTED (an index-scored
            # semi-join), not a page-cached parquet dir — emulate with
            # a per-row md5 predicate so every re-reference re-pays
            # the match-set computation, the regime the one-pass
            # design (and the pin) actually targets
            expensive = meta.filter(
                F.substring(
                    F.md5(F.concat_ws("|", "doc_id", "k", "v")), 1, 1
                ) != F.lit("z")
            )

            def pinned_x():
                os.environ["SPARK_GRAFT_PIN_REUSED"] = "1"
                serve.aggs_flat(expensive, spec).collect()
                caching.release_pinned()

            def unpinned_x():
                os.environ["SPARK_GRAFT_PIN_REUSED"] = "0"
                serve.aggs_flat(expensive, spec).collect()

            tpx = timed(pinned_x)
            tux = timed(unpinned_x)
            os.environ["SPARK_GRAFT_PIN_REUSED"] = "1"
            tnx = timed(lambda: naive_per_level(expensive))
            print(
                f"| {n:,} | {tp:.2f}s | {tu:.2f}s | {tn:.2f}s |"
                f" {tpx:.2f}s | {tux:.2f}s | {tnx:.2f}s |",
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # sort-by-field vs relevance window over the same match set
    n = 1_000_000
    root = tempfile.mkdtemp(prefix="aggs_probe_sort_")
    try:
        path = os.path.join(root, "meta")
        (
            spark.range(0, n)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(
                    "timestamp'2024-01-01' + make_interval(0,0,0,0,"
                    " cast(id % 72 as int), 0, 0)"
                ).alias("ts"),
                (F.rand(7) * 100).alias("score"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
        meta = spark.read.parquet(path)
        hits = meta.select(
            (F.col("doc_id") % 4).alias("query_id"), "doc_id",
            F.col("score").alias("_score"),
        )
        from pyspark.sql import Window

        def relevance():
            w = Window.partitionBy("query_id").orderBy(
                F.col("_score").desc(), F.col("doc_id").asc()
            )
            hits.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= 20
            ).collect()

        def by_field():
            serve.sorted_rank(
                hits, meta.select("doc_id", "ts"), [("ts", False)], k=20
            ).collect()

        relevance()  # warm-up
        print(
            f"\nsort over 1M-hit match set (4 queries, k=20): "
            f"relevance window {timed(relevance):.2f}s, "
            f"sorted_rank (metadata join + sort window) "
            f"{timed(by_field):.2f}s",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
