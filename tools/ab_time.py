"""A/B timing harness for optimization work: time registered queries
in isolation with optional extra Spark conf, using the SAME action as
bench.py (xxhash64 over every column → bit_xor agg → 8-byte collect),
or the noop sink (guide §1.4) to take the driver transfer out.

    python tools/ab_time.py [--repeat 3] [--noop] [--conf k=v ...] names...

Prints one line per query: name, best, all repeats. Honest-cold
protocol: release reuse() pins + clearCache between repeats, exactly
like bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="use the noop sink instead of the bench hash action")
    ap.add_argument("--conf", action="append", default=[], help="extra k=v Spark conf")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import release_pinned
    from kafka_cdc_elasticsearch_pipeline_spark.queries import QUERIES
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("ab_time", extra_conf={"spark.ui.showConsoleProgress": "false", **extra})
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in extra.items():
        spark.conf.set(k, v)

    # Same warmups as bench.py: JVM/footers + the Python worker fleet.
    for name in args.names:
        QUERIES[name].spark(spark, args.sf).limit(1).collect()
    cores = spark.sparkContext.defaultParallelism

    def _warm_workers(iterator):
        import numpy  # noqa: F401
        import pandas as pd  # noqa: F401

        yield from iterator

    spark.range(cores * 4, numPartitions=cores).mapInPandas(
        _warm_workers, schema="id long"
    ).count()

    for name in args.names:
        times = []
        for _ in range(max(1, args.repeat)):
            t0 = time.time()
            df = QUERIES[name].spark(spark, args.sf)
            spark.sparkContext.setJobDescription(f"ab:{name}")
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.select(
                    F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
                ).agg(F.expr("bit_xor(h)")).collect()
            spark.sparkContext.setJobDescription(None)
            times.append(round(time.time() - t0, 3))
            release_pinned()
            spark.catalog.clearCache()
        print(f"{name}: best={min(times)} runs={times}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
