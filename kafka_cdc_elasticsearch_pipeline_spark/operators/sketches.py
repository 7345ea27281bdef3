"""Mergeable frequency sketches as relational aggregations (count-min).

Spark ships HyperLogLog++ (``approx_count_distinct``, gated as
``a_approx_distinct_error_bound``) and a Greenwald-Khanna quantile
summary (``percentile_approx``, gated as
``a_approx_quantile_error_bound``) as JVM aggregates. It also has a
``count_min_sketch`` SQL aggregate, but that returns an opaque binary
whose point queries need driver-side deserialization — unusable as a
distributed operator. This module keeps the sketch RELATIONAL: a
count-min sketch IS a d×w counter matrix, and a counter matrix IS a
``(row_idx, bucket, cnt)`` DataFrame.

Why this shape survives 100 TB:

- **build** explodes each key into its d coordinates and counts —
  partial aggregation collapses every partition to ≤ d×w rows before
  the shuffle, so construction shuffles O(d×w) per partition
  regardless of input size (same argument as any map-side-combinable
  count).
- **merge** is union + re-sum: counters are additive, which is what
  makes per-shard / incremental builds composable — sketch each day's
  partition independently, merge the d×w-row sketches, never rescan.
- **estimate** joins the probe keys' coordinates against the
  BROADCAST sketch (d×w rows is broadcast-sized by construction) and
  takes min(cnt) per key — the classic CMS upper bound: never an
  undercount, overcount ≤ e·N/w with high probability.

The error contract is gated end-to-end as
``a_cms_heavy_hitters_bound`` (queries_core.py) in the same style as
the HLL error-bound row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RESERVED = ("row_idx", "bucket", "cnt", "__cms_mult")


def cms_coords(key: Column, depth: int, width: int, salt: str = "cms") -> Column:
    """``array<struct<row_idx,bucket>>`` — the d hash coordinates of a
    key. Each row of the sketch uses an independently-salted xxhash64,
    so the d estimates are (pairwise) independent and min() tightens
    the bound."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                F.pmod(
                    F.xxhash64(F.lit(f"{salt}:{i}"), key.cast("string")),
                    F.lit(width),
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key: Column, depth: int = 4, width: int = 1024, salt: str = "cms"
) -> DataFrame:
    """Build the (row_idx, bucket, cnt) sketch of ``key``'s frequency
    distribution. The explode multiplies rows by ``depth`` BEFORE the
    aggregation, but partial (map-side) combine reduces each partition
    to ≤ d×w rows, so the shuffle is sketch-sized, not data-sized."""
    coord = F.explode(cms_coords(key, depth, width, salt)).alias("c")
    return (
        df.select(coord)
        .select("c.row_idx", "c.bucket")
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width, salt):
    counters add. union + re-sum keeps the result ≤ d×w rows."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys_df: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys_df``: append
    ``cms_estimate`` = min over the key's d counters. The sketch side
    is broadcast (d×w rows by construction), so the probe is a
    map-side join — no shuffle of the probe set beyond the final
    per-key min (which groups on the probe's own rows).

    Output cardinality == input cardinality: duplicate probe rows (and
    NULL-key rows) are grouped BY VALUE with their multiplicity, the
    d-way min is folded once per distinct row, and ``sequence``-explode
    restores the copies. An earlier version grouped on a
    ``monotonically_increasing_id`` generated before the explode —
    nondeterministic under partial-stage retry, which could recompute
    a probe partition with fresh ids after some depth rows had already
    shuffled, splitting one probe row's min-fold into several rows
    with partial (inflated) minima (round-8 advice). Value-grouping is
    retry-deterministic and strictly cheaper when probes repeat.

    Value-grouping's contract (round-9 advice): every probe column
    must be GROUPABLE — Spark cannot group on a MapType column, so a
    probe DataFrame carrying one fails here with an explicit error
    instead of a deep AnalysisException. Stringify such a side column
    (``to_json``) or drop it before probing; the row-id grouping this
    replaced accepted any column type but was retry-nondeterministic,
    which is the worse trade."""
    for col in _RESERVED:
        if col in keys_df.columns:
            raise ValueError(
                f"probe column {col!r} collides with the sketch schema; "
                "rename it before cms_estimate"
            )
    from pyspark.sql import types as T

    def _holds_map(dt) -> bool:
        # Spark rejects a map ANYWHERE inside a grouping expression,
        # so the walk must recurse through structs/arrays (round-10
        # review: the top-level-only check missed struct<map<...>>)
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _holds_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_holds_map(f.dataType) for f in dt.fields)
        return False

    for f_ in keys_df.schema.fields:
        if _holds_map(f_.dataType):
            raise ValueError(
                f"probe column {f_.name!r} holds a MapType — not "
                "groupable, and cms_estimate groups probe rows by value "
                "(retry-deterministic multiplicity). to_json() or drop "
                "it before probing."
            )
    distinct = keys_df.groupBy(*keys_df.columns).agg(
        F.count(F.lit(1)).alias("__cms_mult")
    )
    probes = distinct.select(
        "*", F.explode(cms_coords(F.col(key_col), depth, width, salt)).alias("__cms_c")
    ).select("*", "__cms_c.row_idx", "__cms_c.bucket").drop("__cms_c")
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
        .groupBy("__cms_mult", *keys_df.columns)
        # A key that was sketched always hits a counter ≥ its true
        # count; coalesce(0) only fires for never-seen probe keys.
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
        .select(
            *keys_df.columns,
            "cms_estimate",
            F.explode(F.sequence(F.lit(1), F.col("__cms_mult"))).alias("__cms_i"),
        )
        .drop("__cms_mult", "__cms_i")
    )
