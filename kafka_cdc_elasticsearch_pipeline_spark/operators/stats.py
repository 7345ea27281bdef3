"""Second-moment statistics (mean / var_samp / stddev_samp / corr) as
one distributed aggregation pass with cross-engine determinism.

Why not the built-ins: Spark's var_samp/corr accumulate doubles, so the
result depends on partition reduction order — unreproducible across
runs and engines. Here every aggregate is an exact DECIMAL sum
(map-side combinable, order-independent), cast to double ONCE, and the
statistics are fixed scalar expression trees over those doubles.

NULL semantics match the built-ins:
- mean/var/stddev skip NULL x (null-aware count(x));
- corr is pairwise-complete — every sum in its formula is over rows
  where BOTH x and y are non-null;
- degenerate groups (0 or 1 usable rows, zero variance) yield NULL via
  nullif, never Inf/NaN. Spark yields NULL for var_samp(n=1) but NaN
  for zero-variance corr, while DuckDB doubles produce Inf/NaN — NULL
  is the one value both engines serialize identically, so the oracle
  hash is stable (round-1 advice finding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def second_moment_stats(
    df: DataFrame, group: Column, x: Column, y: Column, ndigits: int = 6
) -> DataFrame:
    """Group by ``group`` (pre-aliased) and compute n, mean_value,
    var_value, stddev_value for ``x`` plus corr_vk between ``x``/``y``.

    ``x`` and ``y`` should be exact types (DECIMAL) — the point of the
    operator is one deterministic double conversion after exact sums.
    Single shuffle; all sums combine map-side.
    """
    both = x.isNotNull() & y.isNotNull()
    agg = df.groupBy(group).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(x).cast("double").alias("nx"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.count(F.when(both, F.lit(1))).cast("double").alias("np"),
        F.sum(F.when(both, x)).cast("double").alias("sxp"),
        F.sum(F.when(both, x * x)).cast("double").alias("sx2"),
        F.sum(F.when(both, y)).cast("double").alias("syp"),
        F.sum(F.when(both, y * y)).cast("double").alias("sy2"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, nx, s1, s2 = F.col("n"), F.col("nx"), F.col("s1"), F.col("s2")
    np_, sxp, sx2 = F.col("np"), F.col("sxp"), F.col("sx2")
    syp, sy2, sxy = F.col("syp"), F.col("sy2"), F.col("sxy")

    def nz(c: Column) -> Column:
        return F.nullif(c, F.lit(0.0))

    group_name = agg.columns[0]
    return agg.select(
        group_name,
        "n",
        F.round(s1 / nz(nx), ndigits).alias("mean_value"),
        F.round((s2 - s1 * s1 / nz(nx)) / nz(nx - 1), ndigits).alias("var_value"),
        F.round(F.sqrt((s2 - s1 * s1 / nz(nx)) / nz(nx - 1)), ndigits).alias(
            "stddev_value"
        ),
        F.round(
            (np_ * sxy - sxp * syp)
            / nz(F.sqrt((np_ * sx2 - sxp * sxp) * (np_ * sy2 - syp * syp))),
            ndigits,
        ).alias("corr_vk"),
    )
