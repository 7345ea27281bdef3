"""Planted-skew probe for the SemDeDup cluster-size cap (SCALING.md).

Worst case for label-blocked candidate generation: EVERY vector under
ONE coarse label. Measures candidate-pair volume and wall time for the
uncapped within-label pairing vs the capped (label, sub) pairing at
growing cluster sizes, so the O(n²) → O(n·cap) bound is a recorded
number, not a docstring claim.

    python tools/semdedup_skew_probe.py [--cap 100] [--sizes 2000,8000,32000]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=100)
    ap.add_argument("--sizes", default="2000,8000,32000")
    ap.add_argument("--dim", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import similarity as sim
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    spark = get_spark("semdedup-skew-probe", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    print(f"| cluster size | uncapped pairs | uncapped time | capped pairs (cap={args.cap}) | capped time |")
    print("|---|---|---|---|---|")
    for n in (int(s) for s in args.sizes.split(",")):
        # one label, smoothly varying directions (distinct centroid cosines)
        rows = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {args.dim}), "
                f"i -> CASE WHEN i = 1 THEN cos(id * 0.001) "
                f"WHEN i = 2 THEN sin(id * 0.001) ELSE 0.0d END)"
            ).alias("embedding"),
            F.lit(0).cast("bigint").alias("label"),
        )
        rows = rows.cache()
        rows.count()

        t0 = time.time()
        unc = sim.embedding_neardup_pairs(rows, threshold=-1.0).count()
        t_unc = time.time() - t0

        t0 = time.time()
        cap = sim.embedding_neardup_pairs_capped(
            rows, threshold=-1.0, max_cluster_size=args.cap
        ).count()
        t_cap = time.time() - t0

        n_blocks = math.ceil(n / args.cap)
        print(
            f"| {n:,} | {unc:,} | {t_unc:.2f}s | {cap:,} "
            f"(≤ {n_blocks}·C({args.cap},2)) | {t_cap:.2f}s |",
            flush=True,
        )
        rows.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
