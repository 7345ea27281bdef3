"""Incrementally-maintained serving indexes over the lake change feed.

At 100 TB the steady-state cost of a search stack is MAINTAINING its
indexes under streaming appends, not rebuilding them — rebuild scans
the corpus per refresh, maintenance should touch O(changed rows).
This module composes three things the engine already has:

- the lake's row-level change feed (``lakelog.read_row_changes`` —
  signed insert/update/delete rows per commit range),
- the IVM signed-delta fold (``operators.ivm.delta_aggregate`` — the
  BM25 index tables tf/dl/df are all COUNTS, exactly the
  abelian-group aggregates IVM maintains),
- the lake's append/compact machinery (segments + merge-on-read,
  below).

**BM25 index** (tf, dl, df as lake tables). Maintenance APPENDS each
refresh's signed partial aggregate as a new segment — an O(delta)
write, never an index rewrite (the same LSM/segment shape Lucene
uses). Readers merge-on-read: group-sum the segments and drop groups
whose count reached 0; ``lakelog.compact`` folds segments back to one
dir when read amplification grows, and rebases over concurrent
appends. Scoring reuses the exact arithmetic of
``similarity.bm25_score_components``, so a maintained index provably
scores identically to a from-scratch build — that identity is the
gate row's hash.

The df (document-frequency) table cannot be folded from the token
stream alone — df counts DISTINCT docs per word, so a refresh must
observe tf-group TRANSITIONS (a (doc, word) group appearing is +1, a
group draining to 0 is −1). The transition join touches only the
refresh's affected groups (delta-sized), probing the persisted tf
restricted by a semi-join — and, for typical micro-batches (delta
word set ≤ ``_PROBE_WORD_CAP``, checked by a bounded limit-probe),
the word list is also pushed as an ``"in"`` predicate so the
segments' word blooms skip files at listing time: the probe's scan
cost follows the delta, not the accumulated segment count.

Crash safety mirrors ``streaming.lake_sink.lake_ivm_sink``: every
index table carries its own ``(app_id, source_version)`` watermark in
the manifest txns, each fold is idempotent per table, and df commits
FIRST — its transition math needs the persisted tf to sit exactly at
df's own watermark, so on replay tf/dl (whose deltas are
state-independent) catch up to df before the next joint range is
folded. ``app_id`` identifies a maintenance lineage (same contract as
``lake_sink``).

**PQ/IVF index** (codebook + codes as lake tables, already persisted
by ``ext_sim_index_persist_roundtrip``). Appends are assigned under
the PERSISTED codebook — encode is a pure function of (vector,
codebook), so appended codes are bit-identical to what a from-scratch
encode of the grown corpus produces under the same codebook, and the
codes table grows by an O(new vectors) append segment. The codebook
is deliberately FROZEN (retraining invalidates every stored code —
the full 100 TB re-encode); :func:`pq_assignment_balance` is the
drift gauge that tells the operator when that rebuild is actually
due.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions import similarity as sim
from kafka_cdc_elasticsearch_pipeline_spark.operators.ivm import delta_aggregate
from kafka_cdc_elasticsearch_pipeline_spark.sources import lakelog

# --- BM25: tf / dl / df lake tables ------------------------------------------

_TF, _DL, _DF = "bm25_tf", "bm25_dl", "bm25_df"

#: Delta word sets up to this size are collected and pushed as an
#: ``("word", "in", ...)`` predicate so segment blooms can skip files
#: in the df-transition probe; larger deltas (backfills) read the full
#: merged tf. Bounded by a limit(cap+1) probe — never an unbounded
#: collect.
_PROBE_WORD_CAP = 4096


def _tables(index_root: str) -> dict[str, str]:
    return {t: os.path.join(index_root, t) for t in (_TF, _DL, _DF)}


def _applied(table: str, app_id: str) -> int:
    """Highest source version folded into ``table`` (0 = nothing)."""
    head = lakelog.latest_version(table)
    if head is None:
        return 0
    return lakelog.read_manifest(table, head).get("txns", {}).get(app_id, 0)


def _merged(
    spark: SparkSession,
    table: str,
    keys: list[str],
    where: list | None = None,
) -> DataFrame | None:
    """Merge-on-read view of a segmented count table: group-sum the
    appended signed partials, drop drained groups. None if the table
    has no commits yet. ``where`` (lakelog's ``(col, op, value)``
    conjunction) restricts the view to the probed key domain — file
    skipping via the segments' bloom/range stats makes the group-sum
    touch only segments that may hold those keys; groups of every key
    the predicate keeps are summed over ALL their segments (bloom has
    no false negatives), so their merged counts are exact."""
    if lakelog.latest_version(table) is None:
        return None
    return (
        lakelog.read(spark, table, where=where)
        .groupBy(*keys)
        .agg(F.sum("n_rows").alias("n_rows"))
        .filter(F.col("n_rows") != 0)
    )


def _append_segment(
    table: str, delta: DataFrame, app_id: str, src_version: int, **commit_kw
) -> int | None:
    """O(delta) index refresh: append the signed partial aggregate as
    a new segment (parent dirs inherited, only the delta written),
    idempotently watermarked with the source version it folds —
    ``txn_append_commit`` makes a redelivered fold a manifest-level
    no-op (its ``spark`` arg is unused — the stage writes through the
    DataFrame itself)."""
    return lakelog.txn_append_commit(
        None, table, delta, app_id=app_id, batch_id=src_version, **commit_kw
    )


def _signed_tokens(feed: DataFrame) -> DataFrame:
    """(doc_id, word, _change_type) token stream of a change feed —
    the same split/lower/filter tokenizer as ``similarity.bm25_tokens``
    (kept literally in sync by ``tests/test_search_index.py``), with
    the sign column carried through the explode."""
    return feed.select(
        "doc_id",
        "_change_type",
        F.explode(
            F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')")
        ).alias("word"),
    )


def bm25_index_maintain(
    spark: SparkSession,
    source_table: str,
    index_root: str,
    app_id: str = "bm25",
) -> int:
    """Fold the source table's unapplied change feed into the tf/dl/df
    index tables; returns the source version the index now reflects.
    First call on an empty index folds the feed from version 0 — the
    initial build IS maintenance (appends synthesize their own insert
    feed), one code path for both.

    Work per refresh is O(changed rows): two delta-group aggregates
    (tf, dl), one delta-sized transition join for df, three segment
    appends. Nothing rescans the corpus or rewrites the index."""
    head = lakelog.latest_version(source_table)
    if head is None:
        raise FileNotFoundError(f"no committed version in {source_table}")
    t = _tables(index_root)
    a_df = _applied(t[_DF], app_id)

    def tf_dl_deltas(lo: int, hi: int) -> tuple[DataFrame, DataFrame]:
        feed = lakelog.read_row_changes(spark, source_table, lo, hi)
        toks = _signed_tokens(feed)
        return (
            delta_aggregate(toks, ["doc_id", "word"]),
            delta_aggregate(toks, ["doc_id"]),
        )

    # 1. catch tf/dl up to df's watermark (state-independent deltas; a
    #    crash between the df commit and the tf/dl commits lands here)
    for table, keys in ((t[_TF], ["doc_id", "word"]), (t[_DL], ["doc_id"])):
        a = _applied(table, app_id)
        if a < a_df:
            tf_d, dl_d = tf_dl_deltas(a, a_df)
            delta = tf_d if table == t[_TF] else dl_d
            kw = {"bloom_cols": ["word"]} if table == t[_TF] else {}
            _append_segment(table, delta, app_id, a_df, **kw)

    if head <= a_df:
        return a_df  # fully applied redelivery: touch nothing

    # 2. joint (a_df, head] round. df transitions need the persisted
    #    tf exactly at a_df — guaranteed by step 1 — and must be
    #    COMMITTED first so a crash can only leave df ahead (the
    #    recoverable direction).
    tf_delta, dl_delta = tf_dl_deltas(a_df, head)
    affected = tf_delta.select("doc_id", "word").distinct()
    # The transition probe only ever needs tf groups of the DELTA's
    # words. When that word set is small enough to collect (a bounded
    # limit-probe — typical micro-batches; a giant backfill falls back
    # to the full merge-on-read), push it as an "in" predicate so the
    # segments' word blooms skip files at listing time: the probe cost
    # follows the delta, not the accumulated segment count.
    delta_words = [
        r.word
        for r in affected.select("word")
        .distinct()
        .limit(_PROBE_WORD_CAP + 1)
        .collect()
    ]
    probe_where = (
        [("word", "in", delta_words)]
        if len(delta_words) <= _PROBE_WORD_CAP
        else None
    )
    old_tf = _merged(spark, t[_TF], ["doc_id", "word"], where=probe_where)
    if old_tf is None:
        old_slice = affected.limit(0).withColumn("old_n", F.lit(0)).select(
            "doc_id", "word", "old_n"
        )
    else:
        old_slice = old_tf.join(affected, ["doc_id", "word"], "left_semi").select(
            "doc_id", "word", F.col("n_rows").alias("old_n")
        )
    trans = (
        tf_delta.select("doc_id", "word", F.col("n_rows").alias("d_n"))
        .join(old_slice, ["doc_id", "word"], "full")
        .select(
            "word",
            (
                (
                    (F.coalesce(F.col("old_n"), F.lit(0))
                     + F.coalesce(F.col("d_n"), F.lit(0)))
                    > 0
                ).cast("int")
                - (F.coalesce(F.col("old_n"), F.lit(0)) > 0).cast("int")
            ).alias("c"),
        )
    )
    df_delta = (
        trans.groupBy("word")
        .agg(F.sum("c").alias("n_rows"))
        .filter(F.col("n_rows") != 0)
    )
    _append_segment(t[_DF], df_delta, app_id, head, bloom_cols=["word"])
    _append_segment(t[_TF], tf_delta, app_id, head, bloom_cols=["word"])
    _append_segment(t[_DL], dl_delta, app_id, head)
    return head


def bm25_read_index(
    spark: SparkSession, index_root: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tf, dl, df) merge-on-read views in the scoring schema —
    exactly what ``similarity.bm25_score_components`` consumes."""
    t = _tables(index_root)
    tf = _merged(spark, t[_TF], ["doc_id", "word"])
    dl = _merged(spark, t[_DL], ["doc_id"])
    df = _merged(spark, t[_DF], ["word"])
    if tf is None or dl is None or df is None:
        raise FileNotFoundError(f"no maintained index under {index_root}")
    return (
        tf.withColumnRenamed("n_rows", "tf"),
        dl.withColumnRenamed("n_rows", "dl"),
        df.withColumnRenamed("n_rows", "df"),
    )


def bm25_score_from_index(
    spark: SparkSession,
    index_root: str,
    query_ids: tuple[int, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 candidates scored FROM THE MAINTAINED INDEX — the serving
    path: no tokenization, no corpus scan, identical arithmetic (and
    therefore identical scores) to a from-scratch
    ``bm25_scored_candidates`` on the same snapshot. The persisted df
    is semi-joined to the query's terms before broadcasting
    (query-term-sized, never vocabulary-sized)."""
    tf, dl, df = bm25_read_index(spark, index_root)
    return sim.bm25_score_components(tf, dl, query_ids, df=df, k1=k1, b=b)


def bm25_index_compact(spark: SparkSession, index_root: str) -> None:
    """Fold each index table's segments back into one data dir when
    merge-on-read amplification grows — plain ``lakelog.compact`` of
    the MERGED view is wrong (it would freeze partial counts), so this
    rewrites the group-summed state and commits it as a purge-shaped
    version; prior versions stay readable until vacuum."""
    for table, keys in (
        (_tables(index_root)[_TF], ["doc_id", "word"]),
        (_tables(index_root)[_DL], ["doc_id"]),
        (_tables(index_root)[_DF], ["word"]),
    ):
        head = lakelog.latest_version(table)
        if head is None:
            continue
        merged = _merged(spark, table, keys)
        # every maintenance watermark survives the rewrite: commit
        # inherits the parent manifest's txns dict. Re-record the word
        # bloom the segments carried so the df-transition probe keeps
        # skipping after the rewrite. A maintain() racing this commit
        # raises CommitConflict — retry compaction at the new head.
        bloom = ["word"] if "word" in keys else None
        lakelog.commit(
            table, merged, "purge", expect_parent=head, bloom_cols=bloom
        )


def bm25_indexing_sink(
    spark: SparkSession,
    source_table: str,
    index_root: str,
    app_id: str = "bm25-ingest",
):
    """foreachBatch callable — the full streaming ingest-to-serving
    composition: each micro-batch of (doc_id, text) lands in the
    source lake table EXACTLY ONCE (``txn_append_commit``, redelivery
    a manifest no-op) and the BM25 index is folded forward to the new
    head in the same call. A replayed batch re-enters idempotently on
    both sides (the ingest skips by batch watermark; the maintain
    skips by source-version watermark), so at-least-once delivery
    yields an exactly-once index. ``app_id`` identifies a checkpoint
    lineage — same contract as ``streaming.lake_sink`` (derive it via
    ``app_id_for_checkpoint`` when resetting checkpoints)."""

    def sink(batch_df: DataFrame, batch_id: int):
        lakelog.txn_append_commit(
            spark, source_table, batch_df, app_id=app_id, batch_id=batch_id
        )
        return bm25_index_maintain(
            spark, source_table, index_root, app_id=f"{app_id}-idx"
        )

    return sink


def cdc_search_indexing_sink(
    spark: SparkSession,
    source_table: str,
    index_root: str,
    keys: tuple[str, ...] = ("doc_id",),
    ts_col: str = "_ts_ms",
    op_col: str = "_op",
    app_id: str = "cdc-search",
):
    """foreachBatch callable — the REFERENCE PIPELINE's shape end to
    end (kafka-cdc-elasticsearch-pipeline: Debezium change events from Kafka
    keep a search index current; here the maintained BM25 index plays
    the Elasticsearch/Lucene role). Each micro-batch of decoded
    Debezium rows (``sources.cdc.unwrap_envelope_cdc`` — op c/u/r
    upserts, op 'd' deletes with the key recovered from ``before``)
    MERGEs into the source lake table with a change feed
    (``lakelog.merge_apply_cdc``), and the serving index folds the
    commit's signed deltas forward in the same call: an update
    re-scores the document, a DELETE removes it (its tokens enter the
    fold at −1; df decrements through the tf-group transition, the
    doc's tf/dl groups drain to 0 and vanish on merge-on-read).

    Crash safety is the two-watermark scheme of
    ``streaming.lake_sink.lake_ivm_sink``: the source manifest carries
    (app_id, batch_id) so a redelivered batch skips the merge BEFORE
    burning a version; the index tables carry (app_id+"-idx",
    source_version) so the fold replays as an idempotent catch-up."""

    def sink(batch_df: DataFrame, batch_id: int):
        src_head = lakelog.latest_version(source_table)
        src_wm = -1
        if src_head is not None:
            src_wm = (
                lakelog.read_manifest(source_table, src_head)
                .get("txns", {})
                .get(app_id, -1)
            )
        if batch_id > src_wm:
            lakelog.merge_apply_cdc(
                spark,
                source_table,
                batch_df,
                list(keys),
                ts_col,
                op_col=op_col,
                txn=(app_id, batch_id),
            )
        return bm25_index_maintain(
            spark, source_table, index_root, app_id=f"{app_id}-idx"
        )

    return sink


# --- PQ index: frozen codebook, append-assign --------------------------------


def pq_index_build(
    spark: SparkSession,
    embeddings: DataFrame,
    index_root: str,
    m: int = sim.PQ_M,
    ks: int = sim.PQ_KS,
) -> tuple[str, str]:
    """Build and persist the PQ index: codebook (sampled from this
    base corpus, then FROZEN) and codes, each a versioned lake table.
    Returns (codebook_table, codes_table)."""
    cb_table = os.path.join(index_root, "pq_codebook")
    codes_table = os.path.join(index_root, "pq_codes")
    cb = sim.pq_codebook(embeddings, m, ks)
    lakelog.commit(cb_table, cb, "append")
    codes = sim.pq_encode(embeddings, lakelog.read(spark, cb_table), m)
    lakelog.append_commit(spark, codes_table, codes, stat_cols=["vec_id"])
    return cb_table, codes_table


def pq_index_append(
    spark: SparkSession,
    index_root: str,
    new_embeddings: DataFrame,
    m: int = sim.PQ_M,
) -> int:
    """Assign NEW vectors under the persisted (frozen) codebook and
    append their codes as an O(new) segment — no retraining, no
    re-encode of existing codes. Because ``pq_encode`` is a pure
    function of (vector, codebook), the grown codes table is
    bit-identical to a from-scratch encode of the grown corpus under
    the same codebook: that identity is the gate row's hash. Returns
    the committed codes version."""
    cb = lakelog.read(spark, os.path.join(index_root, "pq_codebook"))
    codes = sim.pq_encode(new_embeddings, cb, m)
    return lakelog.append_commit(
        spark,
        os.path.join(index_root, "pq_codes"),
        codes,
        stat_cols=["vec_id"],
    )


def pq_index_read(
    spark: SparkSession, index_root: str
) -> tuple[DataFrame, DataFrame]:
    """(codebook, codes) from the latest committed index snapshot."""
    return (
        lakelog.read(spark, os.path.join(index_root, "pq_codebook")),
        lakelog.read(spark, os.path.join(index_root, "pq_codes")),
    )


def pq_indexing_sink(
    spark: SparkSession,
    index_root: str,
    m: int = sim.PQ_M,
    app_id: str = "pq-ingest",
):
    """foreachBatch callable — streaming ANN ingest: each micro-batch
    of (vec_id, embedding) is assigned under the frozen persisted
    codebook and appended as an O(batch) codes segment. The index must
    already exist (:func:`pq_index_build` on the base corpus — the
    codebook sample needs data). Unlike the manual
    :func:`pq_index_append`, the sink appends through
    ``txn_append_commit`` keyed on (``app_id``, batch_id): foreachBatch
    is at-least-once, and a plain append would land a replayed batch's
    codes TWICE (duplicate candidate rows in every search). The
    watermark makes redelivery a manifest no-op — an exactly-once
    codes table. ``app_id`` identifies a checkpoint lineage (same
    contract as ``streaming.lake_sink``)."""

    def sink(batch_df: DataFrame, batch_id: int):
        cb = lakelog.read(spark, os.path.join(index_root, "pq_codebook"))
        codes = sim.pq_encode(batch_df, cb, m)
        return lakelog.txn_append_commit(
            spark,
            os.path.join(index_root, "pq_codes"),
            codes,
            app_id=app_id,
            batch_id=batch_id,
            stat_cols=["vec_id"],
        )

    return sink


def hybrid_search_from_index(
    spark: SparkSession,
    index_root: str,
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = (0, 1, 2),
    pool: int = 20,
    k: int = 10,
) -> DataFrame:
    """Retrieve-then-rerank SERVED FROM THE MAINTAINED INDEX — the
    production form of ``similarity.hybrid_search_topk``: BM25
    candidates come from the persisted tf/dl/df (no tokenization, no
    corpus scan), the top-``pool`` per query are reranked by embedding
    cosine, top-``k`` returned. Identical scores to the from-scratch
    two-stage on the same snapshot (pinned in
    tests/test_search_index.py); the expensive vector stage still
    touches only pool × |queries| rows."""
    from pyspark.sql import Window as W

    scored = bm25_score_from_index(spark, index_root, query_ids)
    w = W.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    cand = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= pool)
        .select("query_id", "doc_id")
    )
    return sim._cosine_rerank_topk(
        cand, embeddings, sim._query_embeddings(embeddings, query_ids), k
    )


# --- IVF-PQ index: frozen coarse quantizer + frozen residual codebook --------


def ivfpq_index_build(
    spark: SparkSession,
    embeddings: DataFrame,
    index_root: str,
    m: int = sim.PQ_M,
    ks: int = sim.PQ_KS,
) -> None:
    """Persist the FULL composed ANN index (FAISS-IVFPQ shape) as four
    lake tables: coarse centroids (from the base corpus's label
    partition, then FROZEN), per-vector bucket assignments, the
    residual PQ codebook (trained on base residuals, FROZEN), and the
    residual codes. Base vectors keep their own labels as buckets —
    the convention every ivf/ivfpq operator in ``similarity`` uses;
    appended vectors get ASSIGNED (:func:`ivfpq_index_append`)."""
    cents = sim.centroids(embeddings)
    lakelog.commit(os.path.join(index_root, "ivf_centroids"), cents, "append")
    cents = lakelog.read(spark, os.path.join(index_root, "ivf_centroids"))
    res = sim.residuals(embeddings, cents)
    cb = sim.pq_codebook(res, m, ks)
    lakelog.commit(os.path.join(index_root, "pq_codebook"), cb, "append")
    cb = lakelog.read(spark, os.path.join(index_root, "pq_codebook"))
    lakelog.append_commit(
        spark,
        os.path.join(index_root, "ivf_buckets"),
        embeddings.select("vec_id", "label"),
        stat_cols=["vec_id"],
    )
    lakelog.append_commit(
        spark,
        os.path.join(index_root, "pq_codes"),
        sim.pq_encode(res, cb, m),
        stat_cols=["vec_id"],
    )


def ivfpq_index_append(
    spark: SparkSession,
    index_root: str,
    new_embeddings: DataFrame,
    m: int = sim.PQ_M,
) -> None:
    """Grow the persisted IVF-PQ index by O(new vectors): each new
    vector is ASSIGNED to its nearest frozen coarse centroid (the
    k-means assignment step — broadcast centroids, the batch never
    shuffles), residual-encoded under the frozen codebook, and
    appended as one bucket segment + one codes segment. Nothing
    retrains and no existing code is touched, so the grown index is
    bit-identical to a from-scratch encode of the grown corpus under
    the SAME frozen artifacts — the identity the gate row hashes.
    :func:`pq_assignment_balance` over the codes (or a bucket-count
    twin over ``ivf_buckets``) is the drift gauge for when the frozen
    quantizers are due a retrain + full re-encode."""
    cents = lakelog.read(spark, os.path.join(index_root, "ivf_centroids"))
    cb = lakelog.read(spark, os.path.join(index_root, "pq_codebook"))
    assigned = sim.assign_centroids(
        new_embeddings.withColumn("label", F.lit(-1).cast("long")), cents
    ).select("vec_id", F.col("assigned_label").alias("label"))
    labeled = new_embeddings.select("vec_id", "embedding").join(
        assigned, "vec_id"
    )
    res = sim.residuals(labeled, cents)
    lakelog.append_commit(
        spark,
        os.path.join(index_root, "ivf_buckets"),
        labeled.select("vec_id", "label"),
        stat_cols=["vec_id"],
    )
    lakelog.append_commit(
        spark,
        os.path.join(index_root, "pq_codes"),
        sim.pq_encode(res, cb, m),
        stat_cols=["vec_id"],
    )


def ivfpq_search_from_index(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """ANN serving from the PERSISTED IVF-PQ index — the production
    read path of ``similarity.ivfpq_topk``: queries (query_id,
    q_embedding — the application supplies raw query vectors; the
    index stores only codes) probe their ``nprobe`` best buckets
    against the persisted centroids, candidates are reconstructed
    from codes + codebook with the centroid added back, and only
    probed-bucket rows are scored. Candidate volume = nprobe/n_buckets
    of the corpus; memory per candidate = m bytes + the broadcast
    codebook — never the float corpus."""
    from pyspark.sql import Window as W

    cents = lakelog.read(spark, os.path.join(index_root, "ivf_centroids"))
    cb = lakelog.read(spark, os.path.join(index_root, "pq_codebook"))
    buckets = lakelog.read(spark, os.path.join(index_root, "ivf_buckets"))
    codes = lakelog.read(spark, os.path.join(index_root, "pq_codes"))

    recon = (
        sim.pq_reconstruct(codes, cb)
        .join(buckets, "vec_id")
        .join(F.broadcast(cents), "label")
        .select(
            "vec_id",
            "label",
            F.expr(
                "zip_with(recon, centroid, (r, c) -> round(r + c, 6))"
            ).alias("recon"),
        )
    )
    scored_cents = queries.join(
        F.broadcast(
            cents.select(F.col("label").alias("probe_label"), "centroid")
        )
    ).select(
        "query_id",
        "q_embedding",
        "probe_label",
        F.round(sim.cosine(F.col("q_embedding"), F.col("centroid")), 6).alias(
            "cos_c"
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_c").desc(), F.col("probe_label").asc()
    )
    probes = (
        scored_cents.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "q_embedding", "probe_label")
    )
    scored = (
        recon.join(F.broadcast(probes), recon["label"] == probes["probe_label"])
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                sim.cosine(F.col("recon"), F.col("q_embedding")), 6
            ).alias("cosine"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    return sim._ranked_topk(scored, k)


def pq_assignment_balance(codes: DataFrame) -> DataFrame:
    """Retraining gauge for the frozen codebook: per subspace, how
    evenly the corpus spreads over its codes. (m, n_codes, n_vecs,
    max_share, imbalance) where ``max_share`` is the most-loaded
    code's fraction and ``imbalance`` = max_share × n_codes (1.0 =
    perfectly uniform; → n_codes as one code absorbs everything —
    appended data has drifted off the codebook's sample and ADC
    contrast is gone, time to retrain + re-encode). Shuffles (m, code)
    count rows only — corpus-size-independent."""
    per_code = codes.groupBy("m", "code").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_code.groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_codes"),
            F.sum("n").cast("bigint").alias("n_vecs"),
            F.max("n").alias("max_n"),
        )
        .select(
            "m",
            "n_codes",
            "n_vecs",
            F.round(F.col("max_n") / F.col("n_vecs"), 6).alias("max_share"),
            F.round(
                F.col("max_n") * F.col("n_codes") / F.col("n_vecs"), 6
            ).alias("imbalance"),
        )
    )
