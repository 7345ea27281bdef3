"""Bucketed (pre-shuffled) tables for co-located joins (SURVEY §2.7 /
README scale notes).

At 100 TB the dominant recurring cost of the fact⋈fact join
(lineitem⋈orders every query) is re-shuffling both sides on the join
key. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same bucket count on the key, and every
subsequent join plans with ZERO Exchange on either side (the
plan-shape test asserts it).

This is the Spark-native equivalent of ksqlDB's co-partitioned topics
(both topics keyed by the join column must have equal partition
counts — the reference gets this by keying ratings-enriched on the
repartitioned key, readme.md:461-466).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_within: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed managed table. ``sort_within``
    additionally sorts each bucket by the key so downstream sort-merge
    joins skip their sort too."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_within:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with
    no Exchange (and no per-side Sort if written sorted)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)
