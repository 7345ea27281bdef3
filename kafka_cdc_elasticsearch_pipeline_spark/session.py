"""SparkSession factory tuned for the engine.

Defaults target the grading harness (local[32], 128 GiB) but every
knob is chosen so the same plan shape survives a 1000-executor
cluster at ~100 TB:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting),
  so a plan tuned at sf0.1 re-plans itself at sf1000.
- Arrow-accelerated Python interop for the few Pandas-UDF operators.
- Broadcast threshold raised to 64 MiB: every dimension table in the
  reference's DAG (CUSTOMERS is 20 rows — customers.sql:26-45) is
  broadcast-able, and at 100 TB the dims are still ≪ fact tables.
- UTC session timezone: event-time semantics must not depend on the
  submitting host's zone.
- ``nanosAsLong``: the harness parquet stores TIMESTAMP(NANOS,false),
  which Spark's vectorized reader rejects; we read nanos as long and
  convert at the source boundary (see ``sources.tables``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf applied by default; all runtime-settable (non-static) so they
# can also be applied to an externally provided session.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime conf to an existing session (e.g. the
    driver-provided one). Safe: all keys are dynamic SQLConf."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a static conf on some builds — keep going
    return spark


def get_spark(
    app_name: str = "kafka-cdc-elasticsearch-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults."""
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(RUNTIME_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    # Local-mode niceties; ignored on a real cluster manager.
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    conf.setdefault("spark.ui.enabled", "false")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session: re-assert
    # the dynamic conf so behavior is deterministic either way.
    apply_runtime_conf(spark)
    return spark
