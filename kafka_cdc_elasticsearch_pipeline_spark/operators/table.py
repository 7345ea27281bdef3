"""TABLE (changelog) semantics: latest value per key (SURVEY §2.1 S2,
§2.4 A3, §2.9 T5).

ksqlDB's ``CREATE TABLE`` over a changelog topic materializes the last
write per primary key (ksqldb-statements.sql:42-43); the readme
demonstrates the duality — 1 row from the TABLE vs 4 change events
from the STREAM for key 42 (readme.md:316-374).

Two batch strategies, semantically identical, selectable because their
physical plans differ at scale:

- ``max_by``  (default): single hash aggregation with partial (map-side)
  combine. One shuffle of *pre-aggregated* partials — at 100 TB of
  changelog with N distinct keys this moves O(N) rows per partition,
  not O(rows). This is the plan you want for wide/hot changelogs.
- ``window``: ``row_number() OVER (PARTITION BY key ORDER BY ord DESC)``
  then ``rn = 1``. Full shuffle + per-key sort of *all* rows; only
  preferable when you also need the ranked history, or when rows are
  too wide for max_by's struct packing.

Ties on the ordering column are broken by ``tiebreak`` (Kafka offset ≙
monotonic id in fixtures) so both strategies — and the streaming twin
in ``streaming/`` — agree deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: str | None = None,
    method: str = "max_by",
) -> DataFrame:
    """Reduce a changelog to its latest row per key.

    Output columns = input columns (same order), one row per distinct
    ``keys`` combination — the ksqlDB TABLE view of a topic.
    """
    ord_cols = [order_col] + ([tiebreak] if tiebreak else [])
    if method == "max_by":
        value_struct = F.struct(*[F.col(c) for c in df.columns])
        ord_struct = F.struct(*[F.col(c) for c in ord_cols])
        agg = df.groupBy(*keys).agg(F.max_by(value_struct, ord_struct).alias("_latest"))
        return agg.select(*[F.col(f"_latest.{c}").alias(c) for c in df.columns])
    if method == "window":
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in ord_cols])
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    raise ValueError(f"unknown method: {method!r} (use 'max_by' or 'window')")
