"""Named query registry: the contract between the engine and the
grading driver (``__spark_entry__.py``).

Each entry pairs a Spark implementation (``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL oracle string that DuckDB
runs on the same parquet tables. Column names are aliased identically
on both sides — the driver sorts columns by name before value-hashing.

Determinism rules every query follows (so the value-hash can be exact):
- double aggregates go through DECIMAL (exact) sums, then a single
  cast to double (+ round) — never naive float summation, whose
  result depends on reduction order;
- ``collect_list`` arrays are sorted, then STRING-JOINED
  (``array_join`` / ``array_to_string``) in the final projection —
  the driver canonicalizer pandas-sorts every column and dies on
  unhashable list cells, so no gated query may emit an
  array/map/struct column (lint: ``tools/check_oracle.py``,
  ``tests/test_registry_lint.py``);
- top-k orderings always include a unique tiebreak column;
- event-time logic is NTZ/UTC end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py's headline set


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), bench: bool = False):
    """Decorator: register a Spark query implementation under ``name``.

    Each registered callable first releases the PREVIOUS query's
    ``reuse()``-pinned caches (operators/caching.py): by the time a
    harness asks for query N+1 it has materialized query N's result,
    so N's working-set pins are dead weight. This bounds a session's
    storage memory to one query's pins no matter how many queries run.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import (
                release_pinned,
            )

            release_pinned()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = QuerySpec(wrapped, oracle, tuple(tags), bench)
        return fn

    return deco
