"""Slowly-changing-dimension (SCD type 2) history from a changelog —
the CDC consumer's other half: S2's TABLE reduce keeps only the latest
row per key; SCD2 keeps EVERY version with its validity interval, so
joins can be as-of-time instead of as-of-now.

One window pass per key: valid_from = the version's event time,
valid_to = the next version's event time (NULL while current). The
(ts, tiebreak) order matches latest_per_key exactly, so the
``is_current`` slice of the SCD2 table IS the TABLE view — one
changelog, two consistent materializations.

Scale: a single shuffle on the key columns (the window partition);
no self-join — lead() reads the already-sorted run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Expand a changelog into SCD2 rows: input columns +
    (valid_from, valid_to, is_current)."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
