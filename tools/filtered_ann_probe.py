"""Measure filtered ANN serving (`ivfpq_search_from_index(allowed_ids=...)`)
across corpus size and filter selectivity.

Claims under test (round-10 docstrings, made numbers):
- the filter is a pre-decode semi-join on the code rows, so the
  filtered serve wall tracks the UNfiltered serve (probe-pruned scan +
  candidate decode), not the corpus — no corpus-sized broadcast, no
  post-rank refill loop;
- the documented recall caveat: at high selectivity a fixed nprobe's
  buckets may hold too few ALLOWED vectors to fill k, and raising
  nprobe (the knob the docstring names) restores fill.

Protocol: clustered synthetic corpus (8 clusters, deterministic
per-id vectors — structure matters, see the ANN drift probe's
corpus-design notes), IVF-PQ index built per size, serve wall =
best-of-2 for 3 queries, k=10, nprobe=2. Selectivity 1/3 (permissive)
and 1/30 (selective); `fill` counts hits actually returned out of 30.
Run on an idle machine; walls are local[32] relative measures.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4000,16000,64000")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
        search_index as si,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    spark = get_spark("filtered_ann_probe", master="local[32]",
                      shuffle_partitions=32)

    def corpus(n: int):
        # 8 planted clusters; deterministic per-id noise (no RNG)
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 8).alias("label"),
            F.expr(
                "transform(sequence(1, 64), i -> round("
                "  ((id % 8) * 89 + i * 37) % 17 - 8.0"
                "  + ((id * 131 + i * 17) % 1000) / 2500.0 - 0.2, 6))"
            ).alias("embedding"),
        )

    def timed(fn):
        t0 = time.monotonic()
        out = fn()
        return time.monotonic() - t0, out

    print("# filtered ANN serve: wall (best of 2) and k-fill, 3 queries, "
          "k=10, nprobe=2 unless noted")
    print("| corpus | unfiltered | filter 1/3 | filter 1/30 | fill@1/30 "
          "| fill@1/30 nprobe=8 |")
    print("|---|---|---|---|---|---|")
    for n in [int(s) for s in args.sizes.split(",")]:
        root = tempfile.mkdtemp(prefix="filtered_ann_")
        emb = corpus(n).localCheckpoint()
        si.ivfpq_index_build(spark, emb, root)
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        ).localCheckpoint()
        third = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")
        thirtieth = emb.filter(F.col("vec_id") % 30 == 0).select("vec_id")

        def serve(allowed, nprobe=2):
            return si.ivfpq_search_from_index(
                spark, root, queries, k=10, nprobe=nprobe,
                allowed_ids=allowed,
            ).count()

        w_plain = min(timed(lambda: serve(None))[0] for _ in range(2))
        w_third = min(timed(lambda: serve(third))[0] for _ in range(2))
        w_30 = min(timed(lambda: serve(thirtieth))[0] for _ in range(2))
        fill_30 = serve(thirtieth)
        fill_30_p8 = serve(thirtieth, nprobe=8)
        print(
            f"| {n:,} | {w_plain:.2f}s | {w_third:.2f}s | {w_30:.2f}s "
            f"| {fill_30}/30 | {fill_30_p8}/30 |"
        )
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
