"""Harness parquet tables: the engine's batch scan path (SURVEY §2.1 S1/S2).

The grading harness materializes deterministic TPC-H-ish tables plus
``events`` / ``documents`` / ``embeddings`` at
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md). ``events`` plays
the reference's ``ratings`` topic, ``customer`` plays the Debezium-fed
``CUSTOMERS`` dimension (FIXTURES.md §B).

Scale notes
-----------
- One `spark.read.parquet` scan per table: Catalyst handles column
  pruning + predicate pushdown into the parquet reader, which is the
  whole ballgame at 100 TB (`.explain` shows PushedFilters/ReadSchema).
- Timestamp normalization happens *here*, once, at the source
  boundary: harness files store TIMESTAMP(NANOS,false), which Spark
  cannot read vectorized. With ``nanosAsLong`` they surface as int64
  nanos; we convert to TIMESTAMP_NTZ (micros) so all downstream
  event-time logic is timezone-independent. This is a cheap projection
  — it does not break pushdown on other columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns that the harness wrote as TIMESTAMP(NANOS,false); with
# nanosAsLong these read as int64 epoch-nanos and need conversion.
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _prepare(spark: SparkSession) -> None:
    """Assert the dynamic conf every load depends on.

    Works with an externally provided session (the grading driver's):
    nanosAsLong so the scan doesn't throw, UTC so the single
    LTZ->NTZ cast below is the identity on the underlying instant.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # A vanilla session ships Spark's default 200 shuffle partitions —
    # pathological for local mode (every streaming micro-batch runs 200
    # tasks). Right-size it to the harness CPU budget, but respect any
    # explicitly tuned non-default value.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        from kafka_cdc_elasticsearch_pipeline_spark.session import default_parallelism

        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))


def _normalize_ts(df: DataFrame, table: str) -> DataFrame:
    for col in _NANO_TS_COLUMNS.get(table, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            # int64 nanos -> micros -> NTZ. MUST be integer `div`:
            # float division loses precision above 2^53 (epoch-nanos is
            # ~1.7e18) and shifts timestamps by ±1 µs. DuckDB reads the
            # same file truncated to micros, so both engines then see
            # identical event times.
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz"),
            )
        elif isinstance(field.dataType, T.TimestampType):
            df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


# Fact-side tables get spread across tasks after the scan; dimension
# tables stay un-shuffled so they remain broadcast-cheap.
_FACT_TABLES = frozenset({"lineitem", "orders", "events", "documents", "embeddings"})
_SPREAD_DECISION: dict[str, bool] = {}


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the plan's
    source is under-split.

    The harness parquet is one file with ONE row group per table, so
    the scan is a single task and every downstream map/partial-agg runs
    single-core (measured: TPC-H Q1 1.23s → 0.80s, shingle pipeline 12s
    → <1s at sf0.1). Filters and column pruning still push through the
    round-robin Exchange into the scan. On a real cluster the scan has
    splits ≫ cores and this is a no-op — the shuffle is only paid when
    it buys parallelism. Streaming DataFrames pass through untouched
    (micro-batch partitioning is the source's concern, and ``.rdd`` is
    not defined for them)."""
    if df.isStreaming:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Scan one harness table (declarative — all pushdown-friendly).

    ``spread=False`` skips the parallelism repartition for consumers
    where it is pure overhead: a scan that feeds a broadcast build
    side (the rows are collected to one place anyway) or a scan whose
    very next operator is its own shuffle (an aggregation's hash
    exchange) with only trivial per-row work in between. On a real
    cluster the scan has splits ≫ cores and the flag is moot — spread
    is a no-op there either way."""
    _prepare(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = _normalize_ts(spark.read.parquet(path), name)
    if spread and name in _FACT_TABLES:
        # Cache the under-split check per path: getNumPartitions costs a
        # driver-side plan conversion we don't want on every load.
        decide = _SPREAD_DECISION.get(path)
        if decide is None:
            decide = df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
            _SPREAD_DECISION[path] = decide
        if decide:
            df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
