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
- ``collect_list`` arrays are sorted (multiset compare);
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
    """Decorator: register a Spark query implementation under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(fn, oracle, tuple(tags), bench)
        return fn

    return deco
