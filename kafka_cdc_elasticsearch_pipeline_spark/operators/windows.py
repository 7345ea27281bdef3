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


def collect_sorted(col: str | Column, alias: str) -> Column:
    """A2 — ``COLLECT_LIST`` with deterministic (sorted) order.

    Both ksqlDB and Spark collect in nondeterministic arrival order
    (SURVEY §7 risk register); sorting makes results comparable as
    multisets, which is how the golden checks compare them.
    """
    return F.array_sort(F.collect_list(col)).alias(alias)
