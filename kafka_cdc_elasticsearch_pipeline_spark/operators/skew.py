"""Skew-resilient aggregation (SURVEY §4 / README scale notes).

AQE's skew-join splitting handles skewed JOINS; a skewed GROUP BY key
(one celebrity user owning 10% of a 100 TB stream) still funnels one
reducer. Classic fix: salt the key, aggregate twice.

    phase 1: groupBy(key, salt)  — hot key spreads over ``salt_buckets``
             reducers, each emitting a partial
    phase 2: groupBy(key)        — combine ≤ salt_buckets partials/key

Only algebraic aggregates decompose this way; the helper takes the
(partial, final) column pairs explicitly so the decomposition is
visible and checkable. Note Spark's hash aggregation already does
map-side partials — salting matters when the *reduce* side is the
bottleneck: extreme per-key cardinality with memory-heavy state
(collect_list/distinct), or a straggler reducer on one giant key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: Sequence[tuple[Column, str]],
    finals: Sequence[tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partials``: (aggregate expression, alias) computed per
    (keys, salt) group. ``finals``: (output alias, combine expression
    over the partial columns) computed per keys group.

    The salt is a deterministic hash of a uniformly distributed column
    set — here a hash of the whole row via ``spark_partition_id`` would
    be nondeterministic, so we hash monotonically_increasing-free
    content: xxhash64 of all non-key columns modulo ``salt_buckets``.
    """
    non_keys = [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in non_keys]), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for expr, name in partials]
    )
    return phase1.groupBy(*keys).agg(*[expr.alias(name) for name, expr in finals])
