"""Deterministic sampling operators for training-data pipelines.

Random sampling (``df.sample``) is useless for a reproducible data
pipeline — different executors/orderings give different corpora. These
operators sample by CONTENT HASH, so the decision for a row is a pure
function of the row: re-runs, retries, and incremental reprocessing
all keep/drop identically, and the oracle can replay the exact choice.

At 100 TB every operator here is a map-only filter (no shuffle): the
hash, the bucket compare, and the stratum rate lookup all evaluate
per-row against a broadcast rate table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "samp") -> Column:
    """Stable [0, 10000) bucket from md5 — portable across engines
    (mirrors ``('0x' || substr(md5(...), 1, 7))::BIGINT % 10000``)."""
    digest = F.md5(F.concat(F.lit(salt + "_"), key.cast("string")))
    return (
        F.conv(F.substring(digest, 1, 7), 16, 10).cast("bigint") % HASH_BUCKETS
    )


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, rates: dict[str, float],
    default_rate: float = 1.0, salt: str = "samp",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket falls below the stratum's rate. ``rates`` maps stratum
    value -> keep fraction (resolution 1/10000).

    The rate table joins as a broadcast map (here folded into a CASE
    expression — a dict of strata is dim-sized by definition); rows
    never shuffle. Rates resolve to INTEGER bucket cutoffs driver-side
    so no float→int cast can diverge between engines."""
    cut = F.lit(int(round(default_rate * HASH_BUCKETS)))
    for value, r in sorted(rates.items()):
        cut = F.when(
            F.col(stratum_col) == value, F.lit(int(round(r * HASH_BUCKETS)))
        ).otherwise(cut)
    keep = hash_bucket(F.col(key_col), salt) < cut
    return df.filter(keep)


# (The related train/holdout split lives in ``text.train_holdout_split``
# — same hash-bucket idea at 1/100 resolution, gated as
# ``ext_split_train_holdout``.)
