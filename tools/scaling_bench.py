"""Scaling measurement: run the dedup/text operators on synthetic
corpora of growing size and record wall times → SCALING.md.

The corpus is generated deterministically inside Spark (no driver
loops): each doc's words are drawn from a 50k-token vocabulary by
hashing (seed, position) — content independent across docs, 1% exact
duplicates planted. (The harness documents span only 31 distinct
words — any n-gram structure over them is degenerate, which is itself
a finding recorded in SCALING.md.)

    python tools/scaling_bench.py [--sizes 5000 20000 80000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


VOCAB_SIZE = 50_000  # natural-text-scale vocabulary; the harness docs
# have only 31 distinct words, which makes any n-gram index degenerate
# (31^3 possible shingles -> every doc pair collides)


def synth_docs(spark, n: int, words_per_doc: int = 60, dup_pct: int = 1):
    """Deterministic synthetic corpus: ``words_per_doc`` tokens drawn
    from a 50k-token vocabulary by hashing (seed, position); ``dup_pct``
    percent of docs are exact copies of their predecessor so the dedup
    ops have true positives to find."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    with_seed = base.withColumn(
        "seed", F.expr(f"doc_id - cast(pmod(doc_id, 100) < {dup_pct} as int)")
    )
    word_cols = F.expr(
        f"transform(sequence(1, {words_per_doc}),"
        f" p -> concat('w', lpad(cast(pmod(xxhash64(seed, p),"
        f" {VOCAB_SIZE}) as string), 6, '0')))"
    )
    return with_seed.select(
        "doc_id", F.array_join(word_cols, " ").alias("text")
    ).repartition(32)


def synth_vectors(spark, n: int, dim: int = 64, dup_pct: int = 1):
    """Deterministic synthetic embeddings: 64 components hashed from
    (seed, position) into [-1, 1]; ``dup_pct`` percent are exact copies
    of their predecessor so the near-dup ops have true positives."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    with_seed = base.withColumn(
        "seed", F.expr(f"vec_id - cast(pmod(vec_id, 100) < {dup_pct} as int)")
    )
    emb = F.expr(
        f"transform(sequence(1, {dim}),"
        " j -> cast((pmod(xxhash64(seed, j), 2000001) - 1000000) / 1e6 as float))"
    )
    return with_seed.select("vec_id", emb.alias("embedding")).repartition(32)


FINDING = """
## Finding: low-entropy corpora and n-gram indexes

An earlier run generated docs from the harness documents' own
vocabulary — which spans only **31 distinct words**. Over such a
corpus every doc pair shares shingles (31³ possible 3-grams), and any
exact n-gram index — including AllPairs prefix filtering — degenerates
to ~quadratic candidates (measured: 127M candidate pairs at 80k docs).
MinHash LSH was unaffected (banded signatures stay selective). Two
operational consequences, now encoded in the engine docs:

1. prefer the MinHash path on low-entropy/templated corpora; the exact
   prefix-filter join is for natural-vocabulary text;
2. 16-bit SimHash signatures showed the same degeneracy (quadratic
   Hamming-≤3 pairs as the corpus outgrew the 65k signature space) —
   the engine now uses 60-bit signatures with 15-bit pigeonhole
   blocks, and near-pair output tracks true near-duplicates.
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[5000, 20000, 80000])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.md"))
    ap.add_argument(
        "--repeat",
        type=int,
        default=2,
        help="best-of-N timed runs per op (each honest-cold: pins "
        "released between runs). Single-shot timings at these corpus "
        "sizes carry ±1s scheduler/GC noise that swamps the marginal-"
        "cost signal; min-of-2 keeps the protocol honest-cold while "
        "suppressing one-off hiccups.",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import dedup as dd
    from kafka_cdc_elasticsearch_pipeline_spark.extensions import similarity as sim
    from kafka_cdc_elasticsearch_pipeline_spark.extensions import text as tx
    from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import (
        release_pinned,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.sampling import (
        stratified_sample,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    spark = get_spark("scaling", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def _with_source(d):
        return d.withColumn(
            "source", F.concat(F.lit("src"), F.pmod(F.col("doc_id"), 20).cast("string"))
        )

    ops = {
        "exact_dedup": lambda d: dd.exact_dedup(d).count(),
        "minhash_lsh_pairs": lambda d: dd.minhash_lsh_pairs(d).count(),
        "ngram_jaccard_pairs": lambda d: dd.ngram_jaccard_pairs(d).count(),
        "substring_spans": lambda d: dd.substring_span_dedup(d).count(),
        "simhash_pairs": lambda d: dd.simhash_pairs(d).count(),
        "quality_score": lambda d: tx.quality_score(d).count(),
        "gopher_rules": lambda d: tx.gopher_rules(d).count(),
        "tfidf_top_terms": lambda d: tx.tfidf_top_terms(d).count(),
        "stratified_sample": lambda d: stratified_sample(
            _with_source(d), "source", "doc_id", {"src0": 0.1, "src1": 0.5}, 0.9
        ).count(),
        # r07 second wave: keeper policy (components + window), LM
        # scoring (vocab-sized equi-joins + ordered fold), corpus audit
        # (distinct (source,hash) equi-join + mergeable signatures)
        "cluster_canonical": lambda d: dd.cluster_canonical(d).count(),
        "bigram_lm_score": lambda d: tx.bigram_lm_score(d).count(),
        "corpus_overlap_matrix": lambda d: dd.corpus_overlap_matrix(
            _with_source(d)
        ).count(),
        # r08: BM25 candidate scoring (postings equi-join vs broadcast
        # query terms + ordered term fold) and one batched-BPE step
        # (one count job learning 4 disjoint rules; the jobs/merge
        # story lives in tools/bpe_batch_probe.py — this row tracks the
        # per-doc marginal of the counting pass itself)
        "bm25_candidates": lambda d: sim.bm25_scored_candidates(d).count(),
        "bpe_batched_step": lambda d: tx.bpe_train_batched(
            d, n_steps=1, merges_per_step=4
        ).count(),
    }
    vec_ops = {
        # 16-bit bands (bits=32): 8-bit bands degenerate quadratically past
        # ~20k vectors (see SCALING.md finding #2-vector)
        "rhp_lsh_neardup": lambda v: sim.rhp_lsh_neardup(
            v, threshold=0.9, bits=32, bands=2
        ).count(),
        "quantize_int8": lambda v: sim.quantize_int8(v).count(),
        "pq_encode": lambda v: sim.pq_codes_table(v).count(),
        # label from the duplicate SEED (recomputed from vec_id: the
        # synth drops it) so planted dups share a bucket and the
        # IVF-blocked candidate policy still finds them; 64 clusters —
        # bucket size grows with n, candidate volume with bucket size
        # × true-dup density, the shape to watch.
        "semdedup": lambda v: sim.semdedup(
            v.withColumn(
                "label",
                F.expr(
                    "pmod(xxhash64(vec_id - cast(pmod(vec_id, 100) < 1 as int),"
                    " 0), 64)"
                ),
            ),
            threshold=0.9,
        ).count(),
        # one Lloyd iteration = two broadcast-codebook assigns + one
        # positional-mean shuffle; marginal cost must track pq_encode
        "pq_refine_1iter": lambda v: sim.pq_refinement_distortion(
            v, iterations=1
        ).count(),
    }

    results: dict[str, dict[int, float]] = {k: {} for k in (*ops, *vec_ops)}
    outputs: dict[str, dict[int, int]] = {k: {} for k in (*ops, *vec_ops)}
    for n in args.sizes:
        # materialize the corpus once so generation cost is excluded
        docs = synth_docs(spark, n).persist()
        docs.count()
        def timed(fn, src, name):
            fn(src)  # warm (JIT, plans, python pools)
            release_pinned()  # warm run's reuse() pins
            best, out_n = None, 0
            for _ in range(max(1, args.repeat)):
                t0 = time.time()
                out_n = fn(src)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                release_pinned()
            results[name][n] = round(best, 2)
            outputs[name][n] = out_n

        for name, fn in ops.items():
            timed(fn, docs, name)
        docs.unpersist()
        vecs = synth_vectors(spark, n).persist()
        vecs.count()
        for name, fn in vec_ops.items():
            timed(fn, vecs, name)
        vecs.unpersist()
        print(json.dumps({"n_docs": n, **{k: v[n] for k, v in results.items()}}))

    smallest, largest = args.sizes[0], args.sizes[-1]
    scale = largest / smallest
    # Preserve the sections other probes maintain (media/skew, fact-
    # table) — this tool owns only the header + operator table.
    tail = ""
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = f.read()
        for marker in (
            # earliest-first: preserve every section another probe (or a
            # round's manual finding) owns — regenerating this tool's
            # table must never eat them
            "\n## Finding: SemDeDup under planted label skew",
            "\n## Finding: old vs new stateful API cost",
            "\n## Finding: sketch shuffle volume",
            "\n## Lake commit scaling",
            "\n## Round-7 second wave",
            "\n## Media decode + skew join scaling",
            "\n## Fact-table scale probe",
        ):
            at = old.find(marker)
            if at != -1:
                tail = old[at:]
                break
    with open(args.out, "w") as f:
        f.write(
            "# Operator scaling (synthetic corpora, local[32])\n\n"
            "Generated by `python tools/scaling_bench.py`. Docs are "
            "independently generated over a 50k-token vocabulary with 1% "
            "planted exact duplicates; warm wall-clock per op, generation "
            "excluded.\n\n"
            "**Protocol note (round 4, honest-cold timing):** earlier "
            "rounds' tables under-measured — the warm run left its "
            "`reuse()` subtree persisted, and Spark's CacheManager matches "
            "cached plans by canonicalized subtree, so the timed run "
            "silently read the warm run's cache and skipped the signature "
            "pipeline entirely. The bench now releases all pins between "
            "runs: every timed number below is the FULL query from parquet "
            "to result. Because each query carries ~0.7-1.5s of fixed "
            "driver/scheduling overhead at these corpus sizes, the honest "
            "wall-clock ratio overstates asymptotic growth; the marginal "
            "cost column (Δtime/Δdocs between the two largest sizes vs the "
            "two smallest) is the true scaling signal — flat marginal cost "
            "= linear operator.\n\n"
            f"| operator | " + " | ".join(f"{n:,} docs" for n in args.sizes)
            + f" | time ×@{scale:.0f}× data "
            "| marginal µs/doc (small→mid, mid→large) "
            f"| result rows @{largest:,} |\n"
        )
        f.write("|---|" + "---|" * (len(args.sizes) + 3) + "\n")
        mid = args.sizes[len(args.sizes) // 2]
        for name in (*ops, *vec_ops):
            times = [results[name][n] for n in args.sizes]
            ratio = times[-1] / times[0] if times[0] else float("inf")
            # guard the deltas so a 1- or 2-size run still writes the
            # file instead of dying on a zero denominator
            m1 = (results[name][mid] - results[name][smallest]) / max(
                mid - smallest, 1
            )
            m2 = (results[name][largest] - results[name][mid]) / max(
                largest - mid, 1
            )
            f.write(
                f"| {name} | "
                + " | ".join(f"{t:.2f}s" for t in times)
                + f" | {ratio:.1f}× | {m1 * 1e6:.0f}, {m2 * 1e6:.0f}"
                f" | {outputs[name][largest]:,} |\n"
            )
        f.write(
            f"\nA {scale:.0f}× corpus costing ≲{scale:.0f}× wall time means the "
            "operator scales ~linearly (no quadratic candidate blowup, no "
            "single-task bottleneck); sub-linear ratios reflect fixed "
            "per-query overhead amortizing. A marginal cost that HOLDS "
            "between the two deltas is linear scaling even when the "
            "end-to-end ratio looks super-linear (fixed overhead shrinks "
            "relative to real work); a GROWING marginal cost is genuine "
            "super-linearity (candidate-volume growth).\n\n"
            "Reading this table: `simhash_pairs` spent r02-r04 at a flat "
            "~150 µs/doc — linear but the most expensive dedup family; the "
            "cost was the nested-HOF signature fold evaluating INTERPRETED "
            "(60 re-folds of the word-hash array per doc). Round 5 moved "
            "the fold to an Arrow pandas_udf (one bit-unpack + segmented "
            "reduce in numpy, integer-identical — equality pinned in "
            "tests) — ~8 µs/doc, ~9× end-to-end at 80k docs. "
            "`ngram_jaccard_pairs` was the one GROWING row in "
            "r04 (47→158 µs/doc); profiling showed the growth was not "
            "candidate volume (799 pairs at 80k — flat) but the plan: the "
            "(shingle → df) aggregate joined back onto the exploded rows "
            "was corpus-sized, and Spark chose to BROADCAST it (4.6M-entry "
            "hash relation, rebuilt per join side). Round 5 rewrote df and "
            "prefix selection as WINDOW functions over the narrow rows — "
            "three hash shuffles, no corpus-sized build side (plan-guarded "
            "in test_plan_shape) — and added a df-cap that bounds index "
            "buckets with a MinHash fallback for hot-prefix docs. "
            "`tfidf_top_terms` marginal cost FALLS — the round-4 per-doc "
            "aggregation rewrite removed the window sort that previously "
            "grew with corpus size.\n"
            "\nVector ops (`rhp_lsh_neardup`, `quantize_int8`) run on "
            "synthetic 64-dim embeddings with 1% planted exact duplicates; "
            "the RHP verify threshold is 0.9 (near-dup regime) with 16-bit bands (bits=32) — 8-bit bands were measured ~quadratic past 20k vectors (73s @ 80k), the vector twin of the SimHash signature-width finding below; exact duplicates collide at any band width.\n"
            "\n`substring_spans` (r05) is the Lee-et-al. exact span dedup: "
            "a token-level explode (~60 rows/doc, same volume class as "
            "tfidf), one gram-hash shuffle electing keepers, removal rows "
            "proportional to TRUE duplication — on this corpus the 1% "
            "planted dup docs. `pq_encode` (r05) is the product-"
            "quantization index build: corpus × (broadcast 128-entry "
            "codebook) scoring + a map-side-combinable argmin — a strictly "
            "per-row pass, so its marginal cost must stay flat.\n"
        )
        f.write(FINDING)
        if tail:
            f.write(tail)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
