"""Column profiler: null counts, exact distinct counts, canonical
min/max per column — the data-quality sweep every warehouse/pipeline
runs on landing a table.

ONE aggregation pass produces every statistic (a per-column loop of
queries would scan the table N times); the wide 1-row result is then
unpivoted to (column, stats) rows driver-side-free via an inline
array-of-structs explode.

Canonical min/max rendering is type-aware so the output is
cross-engine stable: doubles go through round(6) → DECIMAL(18,6) →
string (raw double→string formatting diverges between engines on
scientific-notation boundaries), timestamps through a fixed
date_format, integers/strings verbatim.

Scale: the single pass is map-side partial-aggregated; exact distinct
counts expand the shuffle by #columns — at 100 TB switch
``exact_distinct=False`` for HyperLogLog++ sketches (same plan shape,
fixed-size state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon(col: F.Column, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.round(col.cast("double"), 6).cast("decimal(18,6)").cast("string")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Profile every column of ``df`` → one row per column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{f.name}__nulls")
        )
        if exact_distinct:
            aggs.append(F.countDistinct(c).alias(f"{f.name}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"{f.name}__distinct"))
        aggs.append(_canon(F.min(c), f.dataType).alias(f"{f.name}__min"))
        aggs.append(_canon(F.max(c), f.dataType).alias(f"{f.name}__max"))
    wide = df.agg(*aggs)

    entries = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{f.name}__nulls").alias("n_nulls"),
                F.col(f"{f.name}__distinct").alias("n_distinct"),
                F.col(f"{f.name}__min").alias("min_value"),
                F.col(f"{f.name}__max").alias("max_value"),
            )
            for f in df.schema.fields
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")
