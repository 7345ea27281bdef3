"""Text analysis over the ``documents`` table: language ID, quality
scoring, token counting, fingerprinting.

All four are narrow per-row projections built from Catalyst expressions
— at 100 TB they fuse into the scan (one pass, no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions.textops import (
    explode_expensive,
    poly_hash16,
    words,
)

# Marker stopwords per language for the n-gram/stopword-hit heuristic.
# Deterministic argmax with lexicographic tiebreak; 'und' when nothing
# matches (zh has no latin-script markers — documented miss).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "es": ("el", "los", "que", "de", "no", "es", "por", "un"),
    "fr": ("le", "la", "les", "et", "des", "est", "pas", "une"),
}

EN_STOPWORDS = LANG_MARKERS["en"]
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _hits(words_col: str, markers: tuple[str, ...]) -> F.Column:
    arr = ", ".join(f"'{m}'" for m in markers)
    return F.expr(f"size(filter({words_col}, x -> array_contains(array({arr}), x)))")


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID: score = marker hits per language,
    predicted = argmax (ties → lexicographically first, zero → 'und')."""
    scored = docs.select(
        "doc_id", "lang", words("text").alias("w")
    ).select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        *[_hits("w", m).alias(f"score_{code}") for code, m in sorted(LANG_MARKERS.items())],
    )
    codes = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{c}") for c in codes])
    pred = F.lit("und")
    for c in reversed(codes):  # earlier codes win ties -> apply last
        pred = F.when((best > 0) & (F.col(f"score_{c}") == best), F.lit(c)).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length, word shape, punctuation and
    stopword ratios — the standard pre-training corpus filters
    (per-row arithmetic; deterministic doubles)."""
    w = words("text")
    n_chars = F.length("text")
    n_words = F.size(w)
    alpha = F.length(F.regexp_replace(F.lower(F.col("text")), r"[^a-z]", ""))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?'\"()-]", ""))
    stop = _hits("w2", EN_STOPWORDS)
    out = docs.select("doc_id", "text", w.alias("w2")).select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(alpha.cast("double") / n_chars, 6).alias("alpha_ratio"),
        F.round(punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(stop.cast("double") / n_words, 6).alias("stopword_ratio"),
        F.round(n_chars.cast("double") / n_words, 6).alias("avg_word_len"),
    )
    score = (
        F.when(F.col("n_words") >= 5, F.lit(1.0)).otherwise(F.lit(0.0))
        * (F.lit(1.0) - F.col("punct_ratio"))
        * F.col("alpha_ratio")
    )
    return out.withColumn("quality", F.round(score, 6))


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, and the
    chars/4 LLM budget estimate."""
    return docs.select(
        "doc_id",
        F.size(words("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4).alias("est_llm_tokens"),
    )


def chunk_documents(
    docs: DataFrame, chunk_size: int = 20, stride: int = 15
) -> DataFrame:
    """Sliding-window document chunking (context-window prep): word
    windows of ``chunk_size`` every ``stride`` words (overlap =
    chunk_size - stride); the last chunk per doc may be short.

    Partition-local fan-out: the chunk explode never shuffles — at
    100 TB this is a map-only stage that feeds straight into the
    tokenizer. Deterministic chunk ids: (doc_id, chunk_idx).
    """
    prepared = docs.select("doc_id", words("text").alias("w")).select(
        "doc_id", "w", F.expr(f"sequence(1, size(w), {stride})").alias("starts")
    )
    exploded = explode_expensive(prepared, "starts", "s")
    chunk = F.expr(f"slice(w, s, {chunk_size})")
    return exploded.select(
        "doc_id",
        ((F.col("s") - 1) / stride).cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_words"),
    )


# Deliberately RE2-safe patterns (no backrefs/lookaround): identical
# semantics under Java regex (Spark) and RE2 (DuckDB).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_URL = r"https?://[^ \t\n]+"
PII_LONG_NUM = r"[0-9][0-9][0-9][0-9]+"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII scrubbing pass (pre-training corpus hygiene): count and
    redact emails, URLs and long digit runs. Pure per-row regex
    projections — fuses into the scan, no shuffle, no Python."""
    t = F.col("text")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_URL, "[URL]"), PII_EMAIL, "[EMAIL]"
        ),
        PII_LONG_NUM,
        "[NUM]",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_URL), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(t, F.lit(PII_LONG_NUM), 0)).alias("n_long_nums"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_fp"),
    )


def train_holdout_split(
    docs: DataFrame, id_col: str = "doc_id", train_pct: int = 80
) -> DataFrame:
    """Deterministic content-stable train/holdout assignment: bucket =
    first 28 bits of md5(id) mod 100. Stable across runs, engines and
    cluster sizes (never ``rand()`` — resampling on every run silently
    leaks holdout into training), and portable to the DuckDB oracle."""
    bucket = (
        F.expr(f"cast(conv(substr(md5(cast({id_col} as string)), 1, 7), 16, 10) as bigint)")
        % 100
    )
    return docs.select(
        id_col,
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("holdout")).alias("split"),
    )


def vocab_top_shingles(docs: DataFrame, k: int = 50) -> DataFrame:
    """Vocabulary induction: top-k word-3-gram shingles by document
    frequency (deterministic tiebreak on the shingle itself) — the
    corpus-statistics pass behind stopword lists and domain filters.
    Map-side partial counts; only (shingle, count) pairs shuffle."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.dedup import _doc_shingles

    ex = explode_expensive(_doc_shingles(docs), "sh", "s")
    counts = ex.groupBy("s").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        counts.orderBy(F.col("doc_freq").desc(), F.col("s").asc())
        .limit(k)
        .select(F.col("s").alias("shingle"), "doc_freq")
    )


def bpe_pair_counts(docs: DataFrame, k: int = 50) -> DataFrame:
    """One BPE-trainer counting step: adjacent character-pair
    frequencies weighted by word frequency, top-k ranked with
    deterministic ties — the argmax is the next merge rule.

    Scale shape (why real BPE trainers distribute exactly this way):
    pairs are counted over the DISTINCT-WORD vocabulary (one
    corpus-sized word count, shared by every merge iteration), so each
    iteration scans ~10^6 vocab rows instead of ~10^12 tokens; the
    only shuffles carry (word, count) then (pair, count) rows."""
    w = F.explode(
        F.filter(F.split(F.lower(F.col("text")), "[ \t\n]+"), lambda t: t != "")
    ).alias("word")
    vocab = (
        docs.select(w)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        "wf",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("wf").alias("pair_count"))
    wnd = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        counts.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select("pair", "pair_count", "rank")
    )


def _bpe_learn(docs: DataFrame, n_merges: int = 4):
    """The SEQUENTIAL BPE merge LOOP (round-6 verdict #7): count
    adjacent symbol pairs over the distinct-word vocabulary, take the
    argmax as the next merge rule, apply it greedily left-to-right,
    re-count — ``n_merges`` times. Returns (merge-table DataFrame —
    (step, left_sym, right_sym, merged, pair_count) — final tokenized
    vocab (word, wf, syms)).

    One implementation, two forms: the sequential trainer IS the
    batched trainer at ``merges_per_step=1, window=1`` (each count
    job's top-1 candidate is the argmax, a 1-rule batch can't
    conflict, and the one-rule map apply is the single-rule fold) —
    property-pinned in tests/test_extensions.py, so delegating keeps
    exactly one copy of the subtle greedy-apply expression and the
    lineage-truncation fix (round-8 review finding #4)."""
    rules6, vocab = _bpe_learn_batched(
        docs, n_steps=n_merges, merges_per_step=1, window=1
    )
    rules = rules6.select(
        "step", "left_sym", "right_sym", "merged", "pair_count"
    )
    return rules, vocab


def bpe_train(docs: DataFrame, n_merges: int = 4) -> DataFrame:
    """The merge TABLE from ``n_merges`` BPE trainer iterations — see
    :func:`_bpe_learn` for the loop itself."""
    rules, _ = _bpe_learn(docs, n_merges)
    return rules


def _bpe_learn_batched(
    docs: DataFrame,
    n_steps: int = 2,
    merges_per_step: int = 4,
    window: int = 64,
):
    """BATCHED BPE training (round-7 verdict #5): each iteration
    counts pairs ONCE, then learns up to ``merges_per_step``
    pairwise-SYMBOL-DISJOINT merge rules from the top-``window``
    candidate pairs (greedy in (count DESC, a, b) order, skipping any
    pair sharing a symbol with an already-selected rule) and applies
    them all in a single left-to-right pass. This is the standard
    scale form of the trainer: the expensive vocab-scan+shuffle count
    job amortizes over K merges, so a 32k-merge production train does
    32k/K driver round-trips instead of 32k.

    Why disjointness makes the one-pass apply well-defined: two
    candidate positions can only be ADJACENT when they match the same
    ``(a, a)`` rule (an adjacent cross-rule match would need the
    rules to share a symbol), so the sequential trainer's
    every-other-candidate overlap rule carries over unchanged, and at
    any position at most one rule can fire (left symbols are distinct
    across the batch by disjointness — the apply fold keys a literal
    MAP on the left symbol).

    The candidate WINDOW is part of the algorithm, not an
    implementation detail: selection scans only the top-``window``
    pairs (a batch trainer's candidate queue), which keeps the
    driver collect W-row-bounded AND makes the relational oracle
    replay the identical selection. With ``merges_per_step=1`` the
    batched trainer is the sequential trainer (property-pinned).

    Returns (rules DataFrame — (step, sel, left_sym, right_sym,
    merged, pair_count) — final tokenized vocab)."""
    from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import reuse

    spark = docs.sparkSession
    w = F.explode(
        F.filter(F.split(F.lower(F.col("text")), "[ \t\n]+"), lambda t: t != "")
    ).alias("word")
    vocab = (
        docs.select(w)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
        .filter(F.length("word") >= 2)
        .select(
            "word",
            "wf",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
        )
    )
    vocab = reuse(vocab)
    rules: list[tuple[int, int, str, str, str, int]] = []
    for step in range(1, n_steps + 1):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "wf",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS a,"
                        " element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .select("wf", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        )
        # ONE count job per step; the collect is window-row-bounded.
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("wf").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(window)
            .collect()
        )
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in top:
            if len(batch) == merges_per_step:
                break
            if row.a in used or row.b in used:
                continue
            batch.append((row.a, row.b, int(row.c)))
            used.update((row.a, row.b))
        if not batch:
            break
        for sel, (a, b, c) in enumerate(batch, start=1):
            rules.append((step, sel, a, b, a + b, c))
        # apply every batch rule in ONE greedy left-to-right pass:
        # the literal map keys on the (batch-distinct) left symbol.
        mp = F.create_map(
            *[
                x
                for (a, b, _) in batch
                for x in (
                    F.lit(a),
                    F.struct(F.lit(b).alias("r"), F.lit(a + b).alias("m")),
                )
            ]
        )
        merged = F.aggregate(
            F.expr("sequence(1, size(syms))"),
            F.struct(
                F.expr("cast(array() as array<string>)").alias("acc"),
                F.lit(0).alias("skip"),
            ),
            lambda st, i: F.when(
                st["skip"] == 1,
                F.struct(st["acc"].alias("acc"), F.lit(0).alias("skip")),
            )
            .when(
                (i < F.size("syms"))
                & mp[F.element_at(F.col("syms"), i)].isNotNull()
                & (
                    F.element_at(F.col("syms"), i + F.lit(1))
                    == mp[F.element_at(F.col("syms"), i)]["r"]
                ),
                F.struct(
                    F.concat(
                        st["acc"],
                        F.array(mp[F.element_at(F.col("syms"), i)]["m"]),
                    ).alias("acc"),
                    F.lit(1).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        st["acc"], F.array(F.element_at(F.col("syms"), i))
                    ).alias("acc"),
                    F.lit(0).alias("skip"),
                )
            ),
            lambda st: st["acc"],
        )
        # localCheckpoint, not persist: each merge nests another fold
        # into the plan, and an unbounded lineage chain OOMs the
        # driver near ~16 chained merges (measured,
        # tools/bpe_batch_probe.py) — truncate per iteration so plan
        # depth stays O(1) however many merges the trainer runs.
        vocab = vocab.select("word", "wf", merged.alias("syms")).localCheckpoint(
            eager=True
        )
    rules_df = spark.createDataFrame(
        rules,
        "step int, sel int, left_sym string, right_sym string,"
        " merged string, pair_count bigint",
    )
    return rules_df, vocab


def bpe_train_batched(
    docs: DataFrame,
    n_steps: int = 2,
    merges_per_step: int = 4,
    window: int = 64,
) -> DataFrame:
    """The merge table from the BATCHED trainer — see
    :func:`_bpe_learn_batched`."""
    rules, _ = _bpe_learn_batched(docs, n_steps, merges_per_step, window)
    return rules


def bpe_token_counts(docs: DataFrame, n_merges: int = 4) -> DataFrame:
    """APPLY the learned tokenizer: per-document BPE token counts
    under the ``n_merges``-rule merge table — the number a training
    pipeline actually bills by (sequence lengths, packing budgets,
    per-source token accounting all start here).

    Costs one vocab-sized tokenization (the trainer's final vocab
    already IS every word's token split) plus one corpus explode
    joined word→n_tokens — the join side is the distinct-word vocab,
    broadcast-sized for natural corpora. Words shorter than 2 chars
    never entered the trainer vocab and count as one token."""
    _, vocab = _bpe_learn(docs, n_merges)
    wtoks = vocab.select("word", F.size("syms").alias("n_toks"))
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[ \t\n]+"), lambda t: t != "")
        ).alias("word"),
    )
    return (
        doc_words.join(F.broadcast(wtoks), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("n_toks"), F.lit(1)))
            .cast("bigint")
            .alias("n_tokens")
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetition detection (the Gopher/C4 duplicated-n-gram family):
    how much of a document is repeated 3-grams / repeated words.
    All-integer arithmetic — exact in any engine. High repetition is
    the strongest single signal of boilerplate/spam in web corpora."""
    w = words("text")
    raw_sh = F.expr(
        "transform(sequence(1, size(w2) - 2),"
        " i -> concat_ws(' ', element_at(w2, i), element_at(w2, i+1), element_at(w2, i+2)))"
    )
    out = (
        docs.select("doc_id", w.alias("w2"))
        .filter(F.size("w2") >= 3)
        .select(
            "doc_id",
            F.size("w2").alias("n_words"),
            F.size(F.array_distinct("w2")).alias("n_distinct_words"),
            F.size(raw_sh).alias("n_shingles"),
            F.size(F.array_distinct(raw_sh)).alias("n_distinct_shingles"),
        )
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_shingles",
        F.round(
            1 - F.col("n_distinct_shingles").cast("double") / F.col("n_shingles"), 6
        ).alias("dup_shingle_ratio"),
        F.round(
            1 - F.col("n_distinct_words").cast("double") / F.col("n_words"), 6
        ).alias("dup_word_ratio"),
    )


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Gopher-style keep/drop policy composed from the engine's quality
    metrics: word-count window, mean word length window, alpha ratio,
    stopword floor, repetition ceiling. Returns per-rule booleans plus
    the conjunction — the filter stage a pre-training pipeline runs
    over every document (single pass, no shuffle)."""
    q = quality_score(docs)
    r = repetition_stats(docs).select("doc_id", "dup_shingle_ratio")
    j = q.join(r, "doc_id", "left")
    rules = {
        "ok_word_count": (F.col("n_words") >= 10) & (F.col("n_words") <= 100000),
        "ok_word_len": (F.col("avg_word_len") >= 3) & (F.col("avg_word_len") <= 12),
        "ok_alpha": F.col("alpha_ratio") >= 0.6,
        "ok_stopwords": F.col("stopword_ratio") >= 0.01,
        "ok_repetition": F.coalesce(F.col("dup_shingle_ratio"), F.lit(0.0)) <= 0.3,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return j.select(
        "doc_id",
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of normalized content (exact-dup key)
    + 16-bit polynomial rolling hash (cheap locality-insensitive id)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("md5_fp"),
        F.expr(poly_hash16(f"trim(regexp_replace(lower(text), '\\\\s+', ' '))")).alias(
            "poly_fp"
        ),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF.

    idf is the raw rarity ratio N/df (not log-scaled): ln() is libm-
    dependent and could diverge across engines by an ulp; the ratio
    ranks identically and both engines derive it from exact integers.
    score = (tf * N) / df computed exactly in int64 then one IEEE
    division — bit-identical cross-engine. Ties break on the term.

    Scale: tokenize+tf is one shuffle on (doc_id, term); df is a
    map-side-combinable count on the already-aggregated tf rows (far
    smaller than the token stream); the per-doc top-k is a hash
    AGGREGATION (collect per doc, sort the per-doc array, slice k) —
    NOT a row_number window, which would sort every scored row within
    each shuffle partition. Measured at 16× rows the window version
    ran 4.7× wall (SCALING.md r03); the aggregation sorts only
    doc-vocabulary-sized arrays, which is flat per doc no matter the
    corpus size.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")).alias(
            "term"
        ),
    )
    # The tf table feeds BOTH the score join's left side and the df
    # aggregation derived from it, and ReusedExchange never fires, so
    # the tokenize+tf pass runs once per side. A reuse() pin here was
    # measured (r16, interleaved): a WASH at sf0.1 (1.28 vs 1.22 best)
    # AND at 80k docs (2.65 vs 2.68) — caching the token-level tf
    # table costs what the second pass costs, and at 100 TB a
    # corpus-token-sized pin is the wrong memory trade. Left unpinned.
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"), 6).alias(
                "tfidf"
            ),
        )
    )
    # struct sort order = (-tfidf asc ≡ tfidf desc, term asc): the same
    # (score desc, term) ranking the old window produced, tie-stable
    # because term is unique within a doc.
    top = scored.groupBy("doc_id").agg(
        F.expr(
            f"slice(array_sort(collect_list(struct(-tfidf AS neg, term, tf, tfidf))),"
            f" 1, {k})"
        ).alias("_top")
    )
    return top.select("doc_id", F.posexplode("_top").alias("_pos", "_t")).select(
        "doc_id",
        F.col("_t.term").alias("term"),
        F.col("_t.tf").alias("tf"),
        F.col("_t.tfidf").alias("tfidf"),
        (F.col("_pos") + 1).cast("int").alias("rank"),
    )


def bigram_lm_score(docs: DataFrame, train_pct: int = 80) -> DataFrame:
    """CCNet-style language-model quality scoring: train an add-1
    smoothed bigram LM on the (hash-stable) train split, score EVERY
    document by its mean smoothed bigram probability plus its
    out-of-vocabulary bigram rate — the "does this read like the
    reference corpus" filter a pre-training pipeline runs after the
    heuristic passes (CCNet trains a 5-gram LM on Wikipedia and buckets
    by perplexity; same architecture, smaller order).

    p(b|a) = (c(a,b) + 1) / (c(a) + V): every count is an exact int64,
    each probability is ONE IEEE division, and the per-document mean
    folds the probabilities in token-position order — bit-identical
    cross-engine. The production variant sums log-probabilities
    (geometric mean / perplexity); ln is libm-territory (not
    correctly-rounded in either engine), so this engine keeps the
    arithmetic mean — same filter architecture, exactly checkable
    (the tfidf ratio-idf discipline).

    Scale shape: counting is two map-side-combinable aggregations over
    the train split's token stream; scoring is two equi-joins of the
    corpus's bigram stream against the count tables — (a, b)-keyed and
    a-keyed shuffles whose build sides are vocabulary-sized, far below
    the corpus, with AQE handling the inevitable hot-bigram skew. The
    per-doc mean aggregates a doc-bounded array (ordered fold), never
    a corpus-wide sort.

    Returns (doc_id, split, n_bigrams, n_oov, oov_rate, lm_score) for
    every document with ≥ 2 tokens; the holdout rows are the actual
    use case (scored by a model they never trained).
    """
    wf = F.filter(words("text"), lambda t: t != "")
    bucket = (
        F.expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 7), 16, 10) as bigint)")
        % 100
    )
    base = (
        docs.select(
            "doc_id",
            wf.alias("w"),
            F.when(bucket < train_pct, F.lit("train"))
            .otherwise(F.lit("holdout"))
            .alias("split"),
        )
        .filter(F.size("w") >= 2)
    )
    train = base.filter(F.col("split") == "train")
    uni = (
        train.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    bigram_pairs = F.expr(
        "transform(sequence(1, size(w) - 1),"
        " i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"
    )
    big = (
        train.select(F.explode(bigram_pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    vocab_n = uni.agg(F.count(F.lit(1)).alias("v"))
    pos = (
        base.select("doc_id", "split", F.posexplode(bigram_pairs).alias("pos", "p"))
        .select("doc_id", "split", "pos", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    scored = (
        pos.join(big, ["a", "b"], "left")
        .join(uni.withColumnRenamed("word", "a"), "a", "left")
        .crossJoin(F.broadcast(vocab_n))  # 1-row scalar
        .select(
            "doc_id",
            "split",
            "pos",
            (
                (F.coalesce(F.col("c_ab"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c_a"), F.lit(0)) + F.col("v"))
            ).alias("p"),
            F.when(F.col("c_ab").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    per = scored.groupBy("doc_id", "split").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        F.array_sort(F.collect_list(F.struct("pos", "p"))).alias("ps"),
    )
    fold = F.aggregate(
        F.col("ps"), F.lit(0.0), lambda acc, s: acc + s["p"]
    )
    return per.select(
        "doc_id",
        "split",
        "n_bigrams",
        "n_oov",
        F.round(F.col("n_oov").cast("double") / F.col("n_bigrams"), 6).alias("oov_rate"),
        F.round(fold / F.col("n_bigrams"), 6).alias("lm_score"),
    )


def lm_quality_buckets(docs: DataFrame, train_pct: int = 80) -> DataFrame:
    """CCNet's final stage: bucket every document into head / middle /
    tail thirds by its LM quality score (CCNet splits the corpus into
    perplexity tertiles and trains preferentially on the head). The
    two cutoffs are ONE interpolated-percentile aggregation broadcast
    back over the corpus — never a global row_number sort, which is
    the tempting-but-wrong plan at 100 TB (the cutoff aggregation is
    map-side combinable; the bucket assignment is a per-row
    comparison). Spark ``percentile`` ≡ DuckDB ``quantile_cont``
    (both R-7 linear interpolation — the equivalence the
    a_quantiles_per_channel gate row already pins on this host).

    Higher lm_score = more like the training corpus = head.
    """
    lm = bigram_lm_score(docs, train_pct)
    from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import reuse

    lm = reuse(lm)
    cuts = lm.agg(
        F.expr("percentile(lm_score, array(1.0D / 3, 2.0D / 3))").alias("c")
    )
    return lm.crossJoin(F.broadcast(cuts)).select(  # 1-row scalar
        "doc_id",
        "split",
        "lm_score",
        F.when(F.col("lm_score") > F.col("c")[1], F.lit("head"))
        .when(F.col("lm_score") > F.col("c")[0], F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
