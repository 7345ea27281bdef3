"""Calibrate IndexMaintenancePolicy.max_segments — the gauge→action
threshold (round-9 verdict #1's "SCALING.md note on the threshold
choice").

Protocol: N synthetic doc batches (rolling vocabulary, fixed batch
size) folded into a maintained BM25 index through `bm25_indexing_sink`
under three regimes — no policy (segments accumulate), max_segments=8
(the default), max_segments=2 (aggressive). Per regime we record:

- total ingest wall (N folds + whatever compactions the policy fired),
- how many policy compactions fired,
- the final segment count per table (== serve-time merge fan-in),
- serve wall (bm25_score_from_index, best of 3),
- on-disk dirs under the tf table with vacuum_keep_last=2 vs None.

What to look for: the no-policy serve wall grows with the segment
count (the merge-on-read fan-in the segment-probe table in SCALING.md
already prices), max_segments=2 buys the flattest serve at the price
of near-every-fold rewrites, and 8 sits where compactions amortize to
~1/8 of folds while the serve fan-in stays below the bend of that
curve. Run on an idle machine; wall-clock numbers are local[32]
relative measures, not absolutes.
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
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=500)
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
        search_index as si,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark
    from kafka_cdc_elasticsearch_pipeline_spark.sources import lakelog

    spark = get_spark("index_policy_probe", master="local[32]",
                      shuffle_partitions=32)

    def batch_df(i: int):
        # rolling vocabulary: ~1/4 shared words, 3/4 batch-local
        lo = i * args.batch_size
        return spark.range(lo, lo + args.batch_size).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.concat(F.lit("shared"), (F.col("id") % 97).cast("string")),
                F.concat(F.lit(f"b{i}w"), (F.col("id") % 311).cast("string")),
                F.concat(F.lit(f"b{i}x"), (F.col("id") % 173).cast("string")),
                F.concat(F.lit(f"b{i}y"), (F.col("id") % 59).cast("string")),
            ).alias("text"),
        )

    regimes = [
        ("none", None, None),
        ("max_segments=8", 8, None),
        ("max_segments=2", 2, None),
        ("max_segments=8 + vacuum(2)", 8, 2),
    ]
    print(f"# {args.batches} batches x {args.batch_size} docs, local[32]")
    print("| policy | ingest wall | compactions | final tf segments "
          "| serve (best of 3) | dirs under tf |")
    print("|---|---|---|---|---|---|")
    for name, max_seg, keep in regimes:
        root = tempfile.mkdtemp(prefix="policy_probe_")
        src = os.path.join(root, "docs")
        index = os.path.join(root, "idx")
        policy = None
        if max_seg is not None:
            policy = si.IndexMaintenancePolicy(
                max_segments=max_seg,
                vacuum_keep_last=keep,
                vacuum_min_age_s=0.0,
            )
        sink = si.bm25_indexing_sink(spark, src, index, policy=policy)
        compactions = 0
        t0 = time.monotonic()
        for i in range(args.batches):
            sink(batch_df(i), i)
            if policy is not None:
                status = si.read_maintenance_status(index)
                compactions += len(status.get("compacted", []))
        ingest = time.monotonic() - t0
        tf_table = si._tables(index)[si._TF]
        segs = si.index_read_amplification(index)[si._TF]["n_segments"]
        n_dirs = sum(1 for d in os.listdir(tf_table) if d != "_log")
        serve = min(
            _timed(lambda: si.bm25_score_from_index(
                spark, index, (0, 1, 2)).count())
            for _ in range(3)
        )
        n_versions = len(lakelog.versions(tf_table))
        print(
            f"| {name} | {ingest:.2f}s | {compactions} | {segs} "
            f"| {serve:.2f}s | {n_dirs} ({n_versions} manifests) |"
        )
        shutil.rmtree(root, ignore_errors=True)
    return 0


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


if __name__ == "__main__":
    raise SystemExit(main())
