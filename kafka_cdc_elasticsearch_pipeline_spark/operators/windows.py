"""Event-time windowed aggregation (SURVEY §2.4 A1/A2, §2.9 T3/T4).

The reference's windowed query (ksqldb-statements.sql:88-93):

    SELECT FULL_NAME, COUNT(*) AS RATINGS_COUNT,
           COLLECT_LIST(STARS) AS RATINGS
    FROM RATINGS_WITH_CUSTOMER_DATA
    WINDOW TUMBLING (SIZE 15 MINUTE) GROUP BY FULL_NAME

Spark's ``window()`` is the direct twin: tumbling windows aligned to
the epoch, exactly like ksqlDB/Kafka Streams aligns to epoch millis —
verified bucket-for-bucket against DuckDB ``time_bucket``.

Scale: groupBy(window, keys) is ONE shuffle with map-side partial
aggregation; at 100 TB the partials per (key, window) are tiny. Skewed
keys (one celebrity FULL_NAME) are handled by AQE skew split; for
pathological skew pre-salt with ``rekey``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    window_alias: str = "window_start",
) -> DataFrame:
    """Tumbling event-time window + grouped aggregation.

    Emits WINDOWSTART (T4 — ksqldb-statements.sql:96) as
    ``window_alias`` alongside the group keys and aggregates.
    """
    grouped = df.groupBy(F.window(F.col(ts_col), duration).alias("_w"), *keys)
    out = grouped.agg(*aggs)
    return out.select(
        F.col("_w.start").alias(window_alias),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in out.columns if c not in ("_w", *keys)],
    )


def hopping_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    window_alias: str = "window_start",
) -> DataFrame:
    """Hopping (sliding) event-time window (SURVEY §2.9 T7 — unused by
    the reference, ksqlDB ``WINDOW HOPPING`` twin, free in Spark).

    Each event lands in duration/slide overlapping windows; Spark's
    ``window(ts, duration, slide)`` fans the row out inside the
    aggregation operator itself — no separate explode, one shuffle.
    """
    grouped = df.groupBy(F.window(F.col(ts_col), duration, slide).alias("_w"), *keys)
    out = grouped.agg(*aggs)
    return out.select(
        F.col("_w.start").alias(window_alias),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in out.columns if c not in ("_w", *keys)],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session window (SURVEY §2.9 T7): per-key activity runs closed by
    a silence ``gap``. ``session_window`` merges per-event [ts, ts+gap]
    intervals inside the aggregation (closed at the end: an event
    landing exactly at a session's end extends it — verified) — in
    streaming this is the stateful session operator; in batch it is the
    same plan over a bounded input (one shuffle on the keys).

    Emits session_start = first event ts and session_end = last event
    ts + gap (Spark's session end bound), so the oracle's
    gaps-and-islands SQL can reproduce both bounds exactly.
    """
    grouped = df.groupBy(F.session_window(F.col(ts_col), gap).alias("_w"), *keys)
    out = grouped.agg(*aggs)
    return out.select(
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in out.columns if c not in ("_w", *keys)],
    )


def collect_sorted(col: str | Column, alias: str) -> Column:
    """A2 — ``COLLECT_LIST`` with deterministic (sorted) order.

    Both ksqlDB and Spark collect in nondeterministic arrival order
    (SURVEY §7 risk register); sorting makes results comparable as
    multisets, which is how the golden checks compare them.
    """
    return F.array_sort(F.collect_list(col)).alias(alias)
