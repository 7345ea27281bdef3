"""As-of (temporal) join — the classic operator Spark lacks natively
(named in the build brief as a custom-operator example; DuckDB ships
it as ASOF JOIN, which is this operator's oracle).

Semantics: for each left row, attach the LATEST right row of the same
key with ``right.ts <= left.ts`` (inclusive), or NULLs when none
exists — "the price as of the trade", "the customer state as of the
rating".

Physical shape (the scalable formulation — NOT a per-row subquery):
union both sides tagged, ONE shuffle on the key, per-key sort on
(ts, tag), then a running ``last(right_payload, ignorenulls=True)``
window fills each left row with the most recent right row seen so
far. Right rows sort before left rows at equal timestamps, which is
exactly the inclusive bound. Cost = one shuffle + one sort over
|L|+|R| — the same shape as a sort-merge join, with no range-explode.

Right rows must be unique per (key, ts) for determinism — pre-reduce
with ``latest_per_key`` when they are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row
    (same ``key``, ``right_ts <= left_ts``) as ``right_prefix``-named
    columns (NULL-filled when no prior right row exists)."""
    r_payload_cols = [c for c in right.columns if c != key]
    r_struct = F.struct(*[F.col(c) for c in r_payload_cols])
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),  # right sorts FIRST at equal ts -> inclusive bound
        r_struct.alias("_r"),
        F.lit(None).cast(left.select(F.struct(*left.columns).alias("_l")).schema["_l"].dataType).alias("_l"),
    )
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        F.struct(*left.columns).alias("_l"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_r.unionByName(tagged_l).withColumn(
        "_latest_r", F.last("_r", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"_latest_r.{c}").alias(f"{right_prefix}{c}")
            for c in r_payload_cols
        ],
    )
