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


def temperature_resample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based source mixing (the GPT-3/Pile recipe): sample
    source ``s`` with probability ∝ n_s^alpha instead of its natural
    share n_s — ``alpha < 1`` flattens the mix so huge crawl sources
    stop drowning small high-quality ones. Given a total budget of
    ``budget_frac × N`` documents, source ``s`` keeps
    ``min(1, B·p_s/n_s)`` of its docs where ``p_s = n_s^alpha / Σ``
    (no replication: a source whose target exceeds its size caps at
    keeping everything — the leftover budget is deliberately NOT
    redistributed, so every source's keep rate is a closed-form,
    replayable number).

    Per-doc decisions are the same content-hash buckets as
    :func:`stratified_sample` — re-runs and the oracle replay keep/drop
    identically. The per-source rate table is dim-sized and broadcast;
    the corpus pass is map-only.

    Cross-engine float determinism: ``alpha`` ∈ {1.0, 0.5, 0.25} only,
    computed as chained ``sqrt`` (correctly rounded by IEEE 754 in
    both engines, unlike ``pow``); the Σ over sources folds in
    source-name order on both sides. Arbitrary alphas would need a
    tolerance oracle instead of a value hash.
    """
    cut = temperature_cutoffs(df, source_col, alpha, budget_frac)
    # Both rate-table columns carry the reserved __tr_ prefix so a
    # caller column named `cutoff` (or the source itself) can never
    # make the post-join filter ambiguous at analysis time.
    rate = F.broadcast(cut.withColumnRenamed(source_col, "__tr_src"))
    for reserved in ("__tr_src", "__tr_cutoff"):
        if reserved in df.columns:
            raise ValueError(
                f"input column {reserved!r} collides with "
                "temperature_resample's reserved internal namespace"
            )
    # Null-safe rate join: a NULL source forms its own stratum (groupBy
    # already gave it a row in the rate table); a plain equi-join would
    # silently DROP every null-source row while still counting them in
    # n_total. Cross-engine note: with null sources present, the fold
    # order of w_sum is engine-defined — oracle users should coalesce
    # the source first (the gate row synthesizes non-null sources).
    return (
        df.join(rate, F.col(source_col).eqNullSafe(F.col("__tr_src")))
        .filter(hash_bucket(F.col(key_col), salt) < F.col("__tr_cutoff"))
        .drop("__tr_src", "__tr_cutoff")
    )


def temperature_cutoffs(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """The per-source keep-rate table behind :func:`temperature_resample`
    — (source, __tr_cutoff) with the cutoff an integer hash-bucket
    bound in [0, HASH_BUCKETS]. Exposed separately so composed
    pipelines (``curation.curate``) can LABEL rows against the table
    instead of filtering, keeping the audit-trail shape."""
    chains = {1.0: 0, 0.5: 1, 0.25: 2}
    if alpha not in chains:
        raise ValueError(
            "alpha must be one of 1.0, 0.5, 0.25 (sqrt-chains are "
            "correctly rounded cross-engine; pow is not)"
        )
    from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import reuse

    # reuse(): the dim-sized per-source counts feed the total, the
    # weight table, AND (transitively) the w_sum fold and cutoffs —
    # without the pin every reference re-ran the corpus groupBy (r16:
    # the executed plan showed 5 full document scans for one rate
    # table).
    per = reuse(df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")))
    tot = per.agg(F.sum("n").alias("n_total"))  # not "N": Spark resolves case-insensitively
    w_expr: Column = F.col("n").cast("double") / F.col("n_total")
    for _ in range(chains[alpha]):
        w_expr = F.sqrt(w_expr)
    w = per.crossJoin(F.broadcast(tot)).select(
        source_col, "n", "n_total", w_expr.alias("w")
    )
    total_w = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(source_col, "w"))),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("w_sum")
    )
    cut = w.crossJoin(F.broadcast(total_w)).select(
        source_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac) * F.col("n_total") * F.col("w") / F.col("w_sum")
                / F.col("n"),
            )
            * F.lit(HASH_BUCKETS).cast("double")
        )
        .cast("bigint")
        .alias("__tr_cutoff"),
    )
    return cut


def reservoir_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "res",
    n_salts: int | None = None,
) -> DataFrame:
    """Deterministic fixed-size-per-group sample: each group keeps the
    ``k`` rows with the smallest ``(hash_bucket(key), key)`` — classic
    reservoir-sampling semantics (uniform k-subset per group) but as a
    pure function of the data, so re-runs, engines, and cluster
    layouts agree row-for-row and the oracle replays the exact subset.
    Appends ``sample_rank`` (1..k within the group).

    Scale path — let Catalyst do it: a ``row_number() <= k`` filter
    over a window makes Spark ≥3.5 plan Partial + Final
    ``WindowGroupLimit`` — a map-side per-partition top-k BEFORE the
    exchange, so each task holds at most k rows per (group, partition)
    and the post-shuffle sort ranks ≤ k·partitions survivors, never
    the raw group (plan-guarded in test_plan_shape). That is exactly
    the classic manual salted-two-phase rewrite, built in.

    ``n_salts=S`` still runs the rewrite by hand (stage 1: per-(group,
    hash-subgroup) top-k; stage 2: rank the ≤ k·S survivors) for
    engines without the rule — the union of per-subgroup top-k
    contains the group's global top-k for ANY subgroup assignment, so
    the two forms are bit-identical (unit-pinned in
    tests/test_sketches.py). On Spark it is strictly redundant: the
    probe (tools/sketch_scale_probe.py) measured it slower than the
    built-in at every size up to a planted 64M-row single group
    (9.1s vs 10.8s) because both phases re-shuffle the full input
    while WindowGroupLimit prunes before the one shuffle.
    """
    from pyspark.sql import Window

    order = [hash_bucket(F.col(key_col), salt), F.col(key_col)]
    if n_salts:
        sub = F.pmod(
            F.xxhash64(F.lit(salt + ":sub"), F.col(key_col).cast("string")),
            F.lit(n_salts),
        )
        w1 = Window.partitionBy(F.col(group_col), sub).orderBy(*order)
        df = (
            df.withColumn("__res_rn1", F.row_number().over(w1))
            .filter(F.col("__res_rn1") <= k)
            .drop("__res_rn1")
        )
    w2 = Window.partitionBy(F.col(group_col)).orderBy(*order)
    return df.withColumn("sample_rank", F.row_number().over(w2)).filter(
        F.col("sample_rank") <= k
    )


# (The related train/holdout split lives in ``text.train_holdout_split``
# — same hash-bucket idea at 1/100 resolution, gated as
# ``ext_split_train_holdout``.)
