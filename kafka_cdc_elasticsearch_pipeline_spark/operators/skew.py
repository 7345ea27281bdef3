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


# ANALYZE-style statistics cache: a planner computes heavy-hitter
# stats once per (table, key) and reuses them across queries; repeated
# plan builds (bench repeats, interactive sessions) should not re-scan
# the fact table. Keyed by the plan's semantic hash, LRU-capped.
#
# Staleness tradeoff (documented, deliberate): semanticHash is a
# function of the PLAN, not the data — new files landing under the
# same source path keep the same hash, so a long session can serve a
# stale heavy-hitter list. That affects routing quality only (a newly
# hot key takes the cold path until refresh); join correctness never
# depends on the list. Call ``invalidate_hot_keys()`` after ingest, or
# pass ``use_cache=False`` for an always-fresh diagnostic.
_HOT_KEYS_CACHE: dict[tuple, list] = {}
_HOT_KEYS_CACHE_CAP = 64


def invalidate_hot_keys() -> int:
    """Drop all cached heavy-hitter lists (call after new data lands
    under an already-scanned path); returns how many were dropped."""
    n = len(_HOT_KEYS_CACHE)
    _HOT_KEYS_CACHE.clear()
    return n


def hot_keys(
    df: DataFrame,
    key: str,
    top_n: int = 10,
    min_share: float = 0.001,
    use_cache: bool = True,
) -> list:
    """The heavy-hitters diagnostic (util_heavy_hitters_lineitem) as a
    decision input: the top-``top_n`` keys holding at least
    ``min_share`` of the table. The ONLY driver-side materialization is
    this bounded top-N key list (≤ top_n scalars) — the decision data a
    planner needs; the table itself never leaves the executors.
    """
    cache_key = None
    if use_cache:
        try:
            cache_key = (
                df.semanticHash(), key, top_n, round(min_share, 9)
            )
        except Exception:  # noqa: BLE001 - streaming/exotic plans: skip cache
            cache_key = None
        if cache_key is not None and cache_key in _HOT_KEYS_CACHE:
            # LRU touch: move to the young end (dicts iterate in
            # insertion order, so the eviction below pops the oldest).
            result = _HOT_KEYS_CACHE.pop(cache_key)
            _HOT_KEYS_CACHE[cache_key] = result
            return result
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    per_key = df.groupBy(F.col(key).alias("_k")).agg(F.count(F.lit(1)).alias("_n"))
    top = (
        per_key.crossJoin(F.broadcast(total))
        .filter(F.col("_n").cast("double") / F.col("_total") >= min_share)
        .orderBy(F.col("_n").desc(), F.col("_k"))
        .limit(top_n)
        .select("_k")
        .collect()
    )
    result = [r._k for r in top]
    if cache_key is not None:
        while len(_HOT_KEYS_CACHE) >= _HOT_KEYS_CACHE_CAP:
            _HOT_KEYS_CACHE.pop(next(iter(_HOT_KEYS_CACHE)))
        _HOT_KEYS_CACHE[cache_key] = result
    return result


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicate-small / salt-big equi-join: the manual skew fix when
    the small side is too big to broadcast whole and AQE's runtime
    splitting is unavailable (e.g. a pinned shuffle plan).

    The big side gets a deterministic salt in [0, salt_buckets) hashed
    from its non-key columns; the small side is replicated once per
    bucket (rows × salt_buckets — cheap for a dim). Joining on
    (key, salt) spreads one hot key over ``salt_buckets`` reducers.
    Result is row-identical to the unsalted join for inner/left
    (each big row meets exactly one copy of each matching small row).
    """
    non_keys = [c for c in big.columns if c != big_key] or [big_key]
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in non_keys]), F.lit(salt_buckets)),
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = salted_big.join(
        replicated_small,
        on=[salted_big[big_key] == replicated_small[small_key],
            salted_big["_salt"] == replicated_small["_salt"]],
        how=how,
    )
    return joined.drop(salted_big["_salt"]).drop(replicated_small["_salt"])


def skew_aware_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    hot: list,
    salt_buckets: int = 8,
) -> DataFrame:
    """Split-path inner join driven by the heavy-hitters diagnostic:
    rows whose key is in ``hot`` go through the salted join (hot keys
    spread over ``salt_buckets`` reducers against a replicated dim
    slice); the long cold tail takes the ordinary shuffle join that AQE
    already handles. ``hot ∪ cold`` reassembles the exact unsalted
    result — the property the oracle gate checks.
    """
    if not hot:
        return big.join(small, big[big_key] == small[small_key], "inner")
    hot_lit = F.array(*[F.lit(k) for k in hot])
    big_hot = big.filter(F.array_contains(hot_lit, F.col(big_key)))
    big_cold = big.filter(~F.array_contains(hot_lit, F.col(big_key)))
    small_hot = small.filter(F.array_contains(hot_lit, F.col(small_key)))
    hot_joined = salted_join(
        big_hot, small_hot, big_key, small_key, salt_buckets, "inner"
    )
    cold_joined = big_cold.join(
        small, big_cold[big_key] == small[small_key], "inner"
    )
    return hot_joined.unionByName(cold_joined.select(*hot_joined.columns))
