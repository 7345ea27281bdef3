"""Stream–stream interval join (beyond the reference: its only join is
stream–table J1; real event pipelines also need event-to-event
correlation — attribution, funnel steps, request/response pairing).

Spark's stream–stream inner join with watermarks on BOTH sides and a
time-range join condition gives bounded state: each side buffers only
rows inside the watermark horizon, and the range condition lets the
state store evict rows whose match window has passed. That is the
100 TB-safe shape — an unbounded-state stream join is a leak, not an
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "24 hours"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Correlate each left event with right events of the same ``key``
    where ``right.ts`` ∈ (left.ts, left.ts + within].

    Works identically on streaming inputs (stateful, watermark-bounded)
    and batch inputs (plain range equi-join) — hand both the same
    frames and Structured Streaming's unified model does the rest.
    Inputs need (key, event_id, ts[, extra]) columns; event time is NTZ
    and cast to LTZ only for the watermark (UTC session ⇒ identity).
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("left_id"),
        F.col("ts").cast("timestamp").alias("l_ts"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("right_id"),
        F.col("ts").cast("timestamp").alias("r_ts"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        F.expr(
            f"l_key = r_key AND r_ts > l_ts AND r_ts <= l_ts + interval {within}"
        ),
    )
    return joined.select(
        F.col("left_id"),
        F.col("right_id"),
        F.col("l_key").alias(key),
        F.col("l_ts").cast("timestamp_ntz").alias("left_ts"),
        F.col("r_ts").cast("timestamp_ntz").alias("right_ts"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )


def interval_left_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """LEFT OUTER form of ``interval_join``: unmatched left events
    surface with a NULL right side — the funnel-drop/abandonment query
    (views that never converted).

    Streaming semantics worth naming: an outer NULL row can only be
    emitted once the engine is SURE no match can still arrive — i.e.
    when the watermark passes the left row's match window and its
    state is evicted. So unmatched rows within ``watermark + within``
    of the stream's head are still pending (correctly — their match
    may yet come), while every older unmatched row has been released.
    Matched rows emit immediately, as in the inner join. Same bounded
    state as the inner form; the NULL-row latency IS the correctness
    guarantee, not a defect."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("left_id"),
        F.col("ts").cast("timestamp").alias("l_ts"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("right_id"),
        F.col("ts").cast("timestamp").alias("r_ts"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        F.expr(
            f"l_key = r_key AND r_ts > l_ts AND r_ts <= l_ts + interval {within}"
        ),
        "left_outer",
    )
    return joined.select(
        F.col("left_id"),
        F.col("right_id"),
        F.col("l_key").alias(key),
        F.col("l_ts").cast("timestamp_ntz").alias("left_ts"),
        F.col("r_ts").cast("timestamp_ntz").alias("right_ts"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )
