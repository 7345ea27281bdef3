"""Scale probe for the relational count-min sketch and the salted
reservoir sampler (SCALING.md).

Two claims get measured instead of asserted:

1. **CMS shuffle volume is key-cardinality-independent.** The sketch
   aggregation's map-side partial combine collapses every partition to
   ≤ d×w rows before the exchange. The probe computes the EXACT record
   count each shuffle would carry — `distinct(partition_id, group
   cols)`, i.e. the partial-aggregate output — for the sketch vs the
   exact per-key count on a high-cardinality key domain. (Task-metric
   introspection under AQE re-creates plan nodes and zeroes the
   SQLMetrics, so the structural count is both more portable and
   exactly the number the metric would report.)

2. **The salted reservoir kills the giant-group straggler.** A
   single-phase per-group row_number sorts each group in ONE task;
   with one planted giant group the probe measures single-phase vs
   two-phase (n_salts=32) wall as the group grows.

    python tools/sketch_scale_probe.py [--sizes 1000000,4000000,16000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,4000000,16000000")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--width", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.sampling import (
        reservoir_sample_per_group,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.operators.sketches import (
        cms_build,
        cms_coords,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    spark = get_spark("sketch-scale-probe", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [int(s) for s in args.sizes.split(",")]

    print(
        f"CMS build (d={args.depth}, w={args.width}) vs exact per-key count, "
        "high-cardinality keys (all distinct)"
    )
    print(
        "| input rows | cms wall | cms shuffle rows | exact wall |"
        " exact shuffle rows |"
    )
    print("|---|---|---|---|---|")
    for n in sizes:
        rows = (
            spark.range(n)
            .select(F.col("id").alias("user_key"))
            .repartition(32)
            .cache()
        )
        rows.count()

        t0 = time.time()
        cms_build(rows, F.col("user_key"), depth=args.depth, width=args.width).count()
        t_cms = time.time() - t0
        # exact partial-agg output the sketch shuffle carries
        cms_shuf = (
            rows.select(
                F.spark_partition_id().alias("pid"),
                F.explode(
                    cms_coords(F.col("user_key"), args.depth, args.width)
                ).alias("c"),
            )
            .select("pid", "c.row_idx", "c.bucket")
            .distinct()
            .count()
        )

        t0 = time.time()
        rows.groupBy("user_key").agg(F.count(F.lit(1)).alias("n")).count()
        t_exact = time.time() - t0
        exact_shuf = (
            rows.select(F.spark_partition_id().alias("pid"), "user_key")
            .distinct()
            .count()
        )
        print(
            f"| {n:,} | {t_cms:.2f}s | {cms_shuf:,} | {t_exact:.2f}s |"
            f" {exact_shuf:,} |"
        )
        rows.unpersist()

    print()
    print("Reservoir k=64, ONE planted giant group (straggler worst case)")
    print("| group rows | single-phase wall | two-phase (S=32) wall |")
    print("|---|---|---|")
    for n in sizes:
        rows = (
            spark.range(n)
            .select(F.lit("g0").alias("grp"), F.col("id").alias("key"))
            .repartition(32)
            .cache()
        )
        rows.count()
        t0 = time.time()
        reservoir_sample_per_group(rows, "grp", "key", k=64).count()
        t1 = time.time() - t0
        t0 = time.time()
        reservoir_sample_per_group(rows, "grp", "key", k=64, n_salts=32).count()
        t2 = time.time() - t0
        print(f"| {n:,} | {t1:.2f}s | {t2:.2f}s |")
        rows.unpersist()


if __name__ == "__main__":
    main()
