"""Multimodal columns: opaque binary media + typed metadata
(BASELINE.json north-star; no media libraries exist in the harness, so
the *decoder* is stubbed while everything Spark-owned — schema, binary
payload handling, Arrow batch plumbing, partitioning — is real and
oracle-checked).

Pattern: media lives as a ``binary`` column next to typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. That is the correct 100 TB shape: Python cost
is paid per *batch* (10k rows/Arrow block), partitions stream through
workers without materializing, and the decoded schema is declared up
front so Catalyst can prune/push around the opaque stage.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions.textops import spread

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, mode string, decoder string"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (here: utf-8 bytes of the text —
    the harness has no real media; the engine only sees ``binary``).
    Spread across tasks first: decode stages are the most expensive
    per-row step in a real media pipeline."""
    return spread(docs).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def _real_decode_available() -> bool:
    try:  # pragma: no cover - harness ships no media libs
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_metadata(with_payload: DataFrame) -> DataFrame:
    """Decode stage over ``mapInPandas``.

    With a real imaging stack present this would open each payload and
    emit true (width, height, mode). The harness has none, so the
    decode is a DETERMINISTIC FAKE derived from the byte length —
    clearly labeled in the ``decoder`` column — while the Arrow
    batch-in/batch-out plumbing, schema contract and lazy iterator
    (no full-partition materialization) are the production shape.
    """
    use_real = _real_decode_available()

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blen = pdf["payload"].map(len)
            if use_real:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode requires PIL; harness runs the fake"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blen.astype("int32"),
                    "width": (64 + blen % 577).astype("int32"),
                    "height": (64 + (blen * 31) % 433).astype("int32"),
                    "mode": "RGB",
                    "decoder": "fake-deterministic",
                }
            )

    return with_payload.mapInPandas(decode, schema=DECODED_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, hist array<int>"
N_BINS = 16


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Feature-extraction stage: 16-bin byte histogram per payload via
    Arrow-batched ``mapInPandas`` + numpy — unlike the stubbed image
    decode this is REAL computation (bytes are bytes), so the whole
    Python path (Arrow batch in, vectorized numpy, Arrow batch out
    with an array column) is exercised and oracle-checked end-to-end.
    """

    def featurize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            hists = [
                np.bincount(
                    np.frombuffer(p, dtype=np.uint8) // (256 // N_BINS),
                    minlength=N_BINS,
                ).astype("int32")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "hist": hists})

    return with_payload.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def resize_metadata(decoded: DataFrame, scale_num: int = 1, scale_den: int = 2) -> DataFrame:
    """Resize planning stage: target dimensions from the decoded
    metadata (pure column math — the actual pixel resample would run
    inside the decode UDF when a real imaging stack is present)."""
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale_num / scale_den).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale_num / scale_den).cast("int").alias("out_height"),
    )


def frame_sample(decoded: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling stand-in: derive a deterministic frame count from
    the payload size and keep every n-th frame index — the partitioned
    explode pattern a video pipeline uses (rows fan out, no shuffle)."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("byte_len") % 100), F.lit(every_nth))
        ).alias("frame_idx"),
    )
