"""Round-7 verdict #5 probe: batched vs sequential BPE trainer cost.

Measures, for a fixed merge budget (4 / 16 / 64 merges), the wall
clock and the number of pair-count Spark jobs (= driver round-trips)
the two trainers need on the sf documents corpus. Each trainer
iteration's count job is the expensive part — a vocab scan + (a,b)
shuffle — so jobs-per-merge is the number the batched form exists to
shrink: sequential pays 1 job/merge; batched with K merges/step pays
1/K. Usage:

    python tools/bpe_batch_probe.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .appName("bpe_batch_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kafka_cdc_elasticsearch_pipeline_spark.extensions import text as tx
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, args.sf, "documents").select("text").persist()
    docs.count()

    def run(label, fn, n_merges, n_jobs):
        t0 = time.monotonic()
        n_rules = fn().count()
        wall = time.monotonic() - t0
        print(
            f"{label:>28}: merges={n_merges:3d} rules_learned={n_rules:3d} "
            f"count_jobs={n_jobs:3d} jobs/merge={n_jobs / n_merges:.3f} "
            f"wall={wall:.1f}s"
        )

    print(f"corpus: {args.sf} ({docs.count()} docs), cores={args.cpus}")
    for budget in (4, 16, 64):
        run(
            f"sequential n={budget}",
            lambda b=budget: tx.bpe_train(docs, n_merges=b),
            budget, budget,
        )
        k = min(budget, 8)
        steps = budget // k
        run(
            f"batched k={k} steps={steps}",
            lambda s=steps, kk=k: tx.bpe_train_batched(
                docs, n_steps=s, merges_per_step=kk, window=256),
            budget, steps,
        )
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
