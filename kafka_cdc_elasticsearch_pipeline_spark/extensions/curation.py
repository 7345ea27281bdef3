"""End-to-end corpus curation: the composed pipeline a training-data
run actually executes, as ONE declarative DataFrame — every document
gets a keep/drop verdict and the FIRST failing stage as its reason:

    1. exact_dup    not the minimum doc_id of its content fingerprint
    2. near_dup     appears as doc_b of a MinHash-LSH verified pair
                    (keep-lowest-id policy, matching stage 1's)
    3. low_quality  fails the Gopher-style keep rules
    4. sampled_out  dropped by deterministic stratified sampling
    5. kept

Composing the stages as columns (not sequential filters) means ONE
pass produces the full audit trail — at 100 TB you want the reasons
table as much as the kept set, and you never want to re-scan per
stage. The stage outputs are plain joins on doc_id, so Catalyst
pipelines them; the only shuffles are the ones the component operators
already pay (fingerprint window, LSH band join, sampling is map-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions.dedup import (
    minhash_lsh_pairs,
    normalized,
)
from kafka_cdc_elasticsearch_pipeline_spark.extensions.sampling import (
    HASH_BUCKETS,
    hash_bucket,
)
from kafka_cdc_elasticsearch_pipeline_spark.extensions.text import gopher_rules


def curate(
    docs: DataFrame,
    stratum_col: str = "source",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.9,
    temperature_alpha: float | None = None,
    temperature_budget: float = 0.5,
    image_neardup: bool = False,
) -> DataFrame:
    """Run the 4-stage curation pipeline; returns
    (doc_id, source, kept, reason) for every input document.

    ``temperature_alpha`` adds a FIFTH stage: temperature-based source
    mixing (``sampling.temperature_cutoffs``) applied to the documents
    that SURVIVE stages 1-4 — the per-source budgets are computed over
    the survivor counts, not the raw corpus, so dedup and quality
    drops genuinely change the mix (a source whose docs are mostly
    duplicates gets a budget matching its deduped size). Surviving
    docs dropped by the budget get reason ``temp_mixed_out``.

    ``image_neardup`` adds the MULTIMODAL stage: documents whose image
    payload is a near-duplicate of a lower-id document's (aHash banded
    Hamming, ``multimodal.image_neardup_pairs``) drop with reason
    ``image_dup`` — text and image dedup signals in the same one-pass
    audit trail, the shape a web-scale multimodal corpus actually
    curates with."""
    rates = rates or {}

    fp = docs.select(
        "doc_id", stratum_col, F.md5(normalized()).alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint")
    staged = fp.withColumn("keep_doc_id", F.min("doc_id").over(w))

    near = (
        minhash_lsh_pairs(docs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
    quality = gopher_rules(docs).select("doc_id", F.col("keep").alias("q_keep"))

    cut = F.lit(int(round(default_rate * HASH_BUCKETS)))
    for value, r in sorted(rates.items()):
        cut = F.when(
            F.col(stratum_col) == value, F.lit(int(round(r * HASH_BUCKETS)))
        ).otherwise(cut)
    samp_keep = hash_bucket(F.col("doc_id")) < cut

    joined = (
        staged.join(near, "doc_id", "left")
        .join(quality, "doc_id")
        .withColumn("samp_keep", samp_keep)
    )
    if image_neardup:
        from kafka_cdc_elasticsearch_pipeline_spark.extensions.multimodal import (
            image_neardup_pairs,
        )

        img = (
            image_neardup_pairs(docs.select("doc_id"))
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .withColumn("is_image_dup", F.lit(True))
        )
        joined = joined.join(img, "doc_id", "left")
    else:
        joined = joined.withColumn("is_image_dup", F.lit(None).cast("boolean"))
    reason = (
        F.when(F.col("doc_id") != F.col("keep_doc_id"), F.lit("exact_dup"))
        .when(F.col("is_near_dup"), F.lit("near_dup"))
        .when(F.col("is_image_dup"), F.lit("image_dup"))
        .when(~F.col("q_keep"), F.lit("low_quality"))
        .when(~F.col("samp_keep"), F.lit("sampled_out"))
        .otherwise(F.lit("kept"))
    )
    base = joined.select(
        "doc_id",
        stratum_col,
        reason.alias("reason"),
        (reason == "kept").alias("kept"),
    )
    if temperature_alpha is None:
        return base

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.sampling import (
        temperature_cutoffs,
    )

    # Budgets over the SURVIVORS of stages 1-4 (one extra dim-sized
    # aggregate on rows the plan already computed — the corpus still
    # scans once); the rate table is broadcast back onto the verdict.
    cuts = temperature_cutoffs(
        base.filter(F.col("kept")), stratum_col, temperature_alpha,
        temperature_budget,
    )
    rate = F.broadcast(cuts.withColumnRenamed(stratum_col, "__tr_src"))
    temp_keep = hash_bucket(F.col("doc_id"), "temp") < F.col("__tr_cutoff")
    reason5 = F.when(
        F.col("kept") & ~temp_keep, F.lit("temp_mixed_out")
    ).otherwise(F.col("reason"))
    return (
        base.join(rate, F.col(stratum_col).eqNullSafe(F.col("__tr_src")), "left")
        .select(
            "doc_id",
            stratum_col,
            reason5.alias("reason"),
            (reason5 == "kept").alias("kept"),
        )
    )


def target_overlap_scores(
    docs: DataFrame,
    target_source: str = "src0",
    min_target_count: int = 2,
    threshold: float = 0.5,
    use_bloom: bool = False,
    bloom_hashes: int = 4,
    bloom_bits: int = 262_144,
) -> DataFrame:
    """Importance-based data SELECTION against a target domain (the
    DSIR / CCNet-classifier family, integer-exact form): score every
    non-target document by how much of it looks like the target
    corpus — the fraction of its word bigrams that appear ≥
    ``min_target_count`` times in the target source — and select docs
    above ``threshold``. The log-ratio importance weight of DSIR needs
    cross-engine transcendental math (ln is not correctly-rounded
    everywhere); the hit-fraction form keeps every quantity an integer
    until one final division, so the verdict is an exact cross-engine
    fact while ranking documents the same direction.

    At 100 TB: the target dictionary is built from the (small, curated)
    target corpus and BROADCAST — the raw corpus streams past it
    map-side, one aggregation by doc_id; swap the exact dictionary for
    a bloom filter when the target outgrows broadcast range (false
    positives only INFLATE overlap slightly — the conservative
    direction for selection)."""
    toks = F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')")
    based = docs.select("doc_id", "source", toks.alias("w")).filter(
        F.size("w") >= 2
    )
    bigrams = based.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
            )
        ).alias("bg"),
    )
    target_set = (
        bigrams.filter(F.col("source") == target_source)
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_target_count)
        .select("bg")
    )
    raw = bigrams.filter(F.col("source") != target_source)
    if use_bloom:
        # the promised scale path: when the target dictionary outgrows
        # broadcast range, ship a BLOOM BIT-SET instead — built
        # RELATIONALLY (k xxhash64 positions per dict entry, bit_or
        # aggregation into 64-bit words, map_from_entries into one
        # scalar row) and probed via a broadcast crossJoin like every
        # scalar in this repo. ~2 KB/dict-thousand at these settings.
        # False positives only INFLATE overlap — the conservative
        # direction for selection: bloom-selected ⊇ exact-selected,
        # pinned in tests/test_extensions.py.
        k, m = bloom_hashes, bloom_bits
        positions = (
            f"transform(sequence(0, {k - 1}), j -> pmod(xxhash64(bg, j), {m}))"
        )
        sparse = (
            target_set.select(F.explode(F.expr(positions)).alias("pos"))
            .select(
                F.expr("cast(pos div 64 as int)").alias("wi"),
                F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("b"),
            )
            .groupBy("wi")
            .agg(F.expr("bit_or(b)").alias("bits"))
        )
        bloom = sparse.agg(
            F.map_from_entries(F.collect_list(F.struct("wi", "bits"))).alias("bfmap")
        )
        hit = F.expr(
            f"cast(forall({positions},"
            f" p -> (coalesce(element_at(bfmap, cast(p div 64 as int)), 0L)"
            f" & shiftleft(1L, cast(pmod(p, 64) as int))) != 0) as int)"
        )
        scored = (
            raw.crossJoin(F.broadcast(bloom))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.sum(hit).cast("bigint").alias("n_hits"),
            )
        )
    else:
        scored = (
            raw.join(
                F.broadcast(target_set.withColumn("hit", F.lit(1))), "bg", "left"
            )
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            )
        )
    overlap = F.round(F.col("n_hits") / F.col("n_bigrams"), 6)
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_hits",
        overlap.alias("target_overlap"),
        (overlap >= F.lit(threshold)).alias("selected"),
    )
