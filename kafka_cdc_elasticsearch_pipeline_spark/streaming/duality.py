"""Stream/table duality (SURVEY §2.9 T1/T3/T5/T6).

The one genuinely non-trivial semantic in the reference: a TABLE over a
changelog is the *stateful aggregation* of its STREAM (readme.md:316-374
— 1 table row vs 4 stream events for key 42). These streaming operators
must converge to exactly what the batch operators in ``operators/``
produce on the same data — the gate queries in
``queries_streaming.py`` enforce that against the DuckDB oracle.

Scale notes
-----------
- Streaming latest-per-key = ``groupBy(key).agg(max_by(...))`` — Spark
  keeps one row of state per key in the state store (RocksDB provider
  at scale), identical to ksqlDB's RocksDB-backed table
  materialization.
- Windowed agg state is bounded by the watermark (T6): the reference
  never configures grace and inherits ksqlDB's 24 h default, so 24 h
  is our default watermark too.
- Output modes: ``update`` ≙ EMIT CHANGES on a table (per-key updates,
  T1); ``complete`` is used for CI memory-sink checks; ``append`` +
  watermark for final-on-close windowed emission.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_GRACE = "24 hours"  # ksqlDB 0.20 default grace period


def streaming_latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """T5 — TABLE semantics on a stream: stateful last-write-per-key.

    Same (order, tiebreak) resolution as the batch ``latest_per_key``
    so both paths agree deterministically.
    """
    cols = df.columns
    ord_cols = [order_col] + ([tiebreak] if tiebreak else [])
    value_struct = F.struct(*[F.col(c) for c in cols])
    ord_struct = F.struct(*[F.col(c) for c in ord_cols])
    agg = df.groupBy(*keys).agg(F.max_by(value_struct, ord_struct).alias("_latest"))
    return agg.select(*[F.col(f"_latest.{c}").alias(c) for c in cols])


def streaming_tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = DEFAULT_GRACE,
    window_alias: str = "window_start",
) -> DataFrame:
    """T3/T6 — streaming tumbling window with watermarked state.

    Watermark bounds state retention; with the reference-default 24 h
    grace, late events inside a day still land in their event-time
    bucket, exactly like ksqlDB's windowed table.
    """
    # Spark watermarks require TIMESTAMP (LTZ); our event time is NTZ
    # end-to-end. The loader pins the session timezone to UTC, so the
    # NTZ->LTZ cast here (and the cast back on the window bound) are
    # instant-preserving.
    if watermark:
        src = df.withColumn("_evt", F.col(ts_col).cast("timestamp")).withWatermark(
            "_evt", watermark
        )
        wcol = "_evt"
    else:
        src = df
        wcol = ts_col
    grouped = src.groupBy(F.window(F.col(wcol), duration).alias("_w"), *keys)
    out = grouped.agg(*aggs)
    start = F.col("_w.start")
    if watermark:
        start = start.cast("timestamp_ntz")
    return out.select(
        start.alias(window_alias),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in out.columns if c not in ("_w", *keys)],
    )
