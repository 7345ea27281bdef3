"""Training-shard layout operators: the last mile of a data pipeline —
after dedup/filter/sample, the kept corpus must be (a) shuffled into
shards deterministically and (b) packed into fixed-token-budget
sequences for the trainer.

Both are pure window/hash constructions: no Python, no state, and the
decision for every document is reproducible from the data alone (the
same property the sampling operators guarantee — re-runs and backfills
produce byte-identical shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_shuffle(docs: DataFrame, n_shards: int = 16, salt: str = "shuf") -> DataFrame:
    """Deterministic global shuffle into ``n_shards``: order = md5 of
    the doc id (a fixed pseudo-random permutation), shard = hash mod
    n_shards, position = rank within the shard.

    At 100 TB this is ONE shuffle on the shard key; the per-shard
    ordering is a within-partition sort. Unlike ``orderBy(rand())``,
    re-running yields the identical layout — which is what makes
    resumable shard-by-shard training possible."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "_"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    group_col: str = "source",
    order_col: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """GPT-style sequence packing plan: documents concatenate in
    ``order_col`` order within each ``group_col`` stream, and the token
    stream chops into fixed ``seq_len`` windows (documents may span a
    boundary — the standard packing that wastes no pad tokens).

    Emitted per document: its token count, the running offset of its
    first token in the group's stream, and the sequence index that
    token lands in. One window shuffle on the group key; the cumulative
    sum is exact integer arithmetic, so the layout is reproducible on
    any engine/cluster.

    ``counts``: optional (doc_id, n_tokens) frame replacing the
    default whitespace count — pass ``text.bpe_token_counts`` output
    to lay out sequences under the REAL tokenizer's lengths (the
    budget a training run actually packs against)."""
    if counts is None:
        toks = F.size(F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')"))
        base = docs.select("doc_id", group_col, toks.alias("n_tokens"))
    else:
        base = docs.select("doc_id", group_col).join(
            counts.select("doc_id", "n_tokens"), "doc_id"
        )
    w = Window.partitionBy(group_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_cum = base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = F.col("cum_tokens") - F.col("n_tokens")
    return with_cum.select(
        "doc_id",
        group_col,
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / seq_len).cast("bigint").alias("seq_id"),
    )


def length_bucket_batches(
    docs: DataFrame, batch_size: int = 8, bucket_width: int = 16
) -> DataFrame:
    """Length-bucketed INFERENCE batching: group documents into
    fixed-size batches of similar token length so each batch pads to
    its own maximum instead of the corpus maximum — the standard
    serving-layout trick (a batch of 20-token docs next to one
    4000-token doc wastes ~99.5% of its compute on pad tokens).

    bucket = n_tokens // bucket_width; within a bucket, docs order by
    doc_id and chop into ``batch_size`` batches; ``pad_waste`` is the
    per-doc padding cost (batch max − own length) the layout actually
    pays, so Σ pad_waste is the metric a layout change optimizes.
    Deterministic end-to-end. Plan shape: one shuffle on the bucket
    key, one window pass — no global sort; the bucket key is derived,
    so the shuffle is as balanced as the length distribution."""
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), "[ \t\n]+"), lambda t: t != "")
        ).alias("n_tokens"),
    )
    bucketed = toks.withColumn(
        "bucket", F.floor(F.col("n_tokens") / bucket_width).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    batched = bucketed.withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / batch_size).cast("int")
    )
    wb = Window.partitionBy("bucket", "batch_id")
    return batched.select(
        "doc_id",
        "n_tokens",
        "bucket",
        "batch_id",
        (F.max("n_tokens").over(wb) - F.col("n_tokens")).alias("pad_waste"),
    )
