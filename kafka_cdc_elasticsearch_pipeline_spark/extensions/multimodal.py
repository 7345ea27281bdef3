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


def decode_image_metadata(with_payload: DataFrame) -> DataFrame:
    """Decode stage over ``mapInPandas``.

    PNG, GIF and baseline-JPEG payloads get a REAL decode via the
    pure-Python/numpy codecs in ``png.py`` / ``gif.py`` / ``jpeg.py``
    (no imaging library needed), labeled in the ``decoder`` column.
    Unrecognized payloads (the harness's text-bytes stand-ins) keep
    the clearly-labeled DETERMINISTIC FAKE derived from byte length.
    Either way the Arrow batch-in/batch-out plumbing, schema contract
    and lazy iterator (no full-partition materialization) are the
    production shape.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                _image_metadata_row(doc_id, bytes(payload))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=_DECODED_COLUMNS)

    return with_payload.mapInPandas(decode, schema=DECODED_SCHEMA)


_DECODED_COLUMNS = ["doc_id", "byte_len", "width", "height", "mode", "decoder"]


def _image_metadata_row(doc_id, data: bytes):
    """One sniff→decode metadata row (PNG / GIF / JPEG / labeled fake)
    — shared by the decode stage and the fused build+decode stage so
    both paths stay byte-identical."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.gif import gif_decode
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.jpeg import jpeg_decode
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import (
        PNG_SIG,
        png_decode,
    )

    if data[:8] == PNG_SIG:
        w, h, mode, _ = png_decode(data)
        return (doc_id, len(data), w, h, mode, "png-numpy")
    if data[:6] in (b"GIF89a", b"GIF87a"):
        w, h, _pal, _idx = gif_decode(data)
        return (doc_id, len(data), w, h, "P", "gif-lzw")
    if data[:2] == b"\xff\xd8":
        w, h, mode, _ = jpeg_decode(data)
        return (doc_id, len(data), w, h, mode, "jpeg-numpy")
    blen = len(data)
    return (
        doc_id,
        blen,
        64 + blen % 577,
        64 + (blen * 31) % 433,
        "RGB",
        "fake-deterministic",
    )


PNG_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, mode string,"
    " pixel_sum bigint, decoder string"
)


def _fill_png_pixels(doc_id: int):
    """The constant-fill fixture pixels for ``doc_id`` (dims, channels,
    value all doc_id-derived) — shared by the payload builder and the
    fused build+decode stage so the two paths stay byte-identical."""
    import numpy as np

    w = 8 + doc_id % 16
    h = 8 + (3 * doc_id) % 16
    ch = 1 if doc_id % 2 else 3
    v = doc_id % 251
    return np.full((h, w, ch) if ch > 1 else (h, w), v, dtype=np.uint8)


def attach_png_payload(docs: DataFrame) -> DataFrame:
    """Attach a REAL PNG payload per document, deterministically derived
    from ``doc_id`` (dims, channels, constant fill value) — the harness
    ships no media files, so the fixture is built in-stage, but the
    bytes are genuine spec-conformant PNGs cycling through all five
    scanline filters."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                png_encode(_fill_png_pixels(int(doc_id))) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


#: texture formula shared by the builder, the fingerprint test, and
#: the SQL oracle, over pixel index p = x + 16y on a 16×16 canvas:
#:   px = ((seed%239+1)·p² + (seed%251+3)·p + seed%241
#:         [+128 on a planted near-dup's two perturbed pixels]) mod 256
#: Seed-dependent quadratic coefficients with COPRIME moduli
#: (239·251·241 ≈ 14.5M period): a linear ramp or single-modulus seed
#: mix leaves doc pairs 256 apart with identical images and the hash
#: space degenerate (measured: 1961 "near-dup" pairs at 500 docs vs
#: 13 with this mix — 10 planted + 3 chance).
IMG_SIDE = 16


def _texture_pixels(doc_id: int, p):
    """Texture fixture pixels for ``doc_id`` over the precomputed pixel
    index grid ``p`` — shared by the payload builder and the fused
    build+hash stage so both paths stay byte-identical."""
    import numpy as np

    near_dup = doc_id % 50 == 1
    seed = doc_id - 1 if near_dup else doc_id
    px = (seed % 239 + 1) * p * p + (seed % 251 + 3) * p + seed % 241
    if near_dup:
        px = px + np.where((p == 0) | (p == IMG_SIDE), 128, 0)
    return (px % 256).astype(np.uint8)


def attach_texture_png_payload(docs: DataFrame) -> DataFrame:
    """Textured 16×16 grayscale PNGs for image NEAR-DUP fixtures: the
    pixel function is a closed-form hash ramp (so the relational
    oracle can recompute the fingerprint arithmetically), and every
    doc with ``doc_id % 50 == 1`` is a PLANTED near-duplicate of its
    predecessor — same seed, two pixels shifted by +128 — which flips
    ~1 of the 64 aHash cells. Constant-fill fixtures are useless here
    (every perceptual hash collapses); texture is the point."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        y, x = np.mgrid[0:IMG_SIDE, 0:IMG_SIDE]
        p = (x + IMG_SIDE * y).astype(np.int64)
        for pdf in batches:
            payloads = [
                png_encode(_texture_pixels(int(doc_id), p))
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def image_ahash(with_payload: DataFrame) -> DataFrame:
    """Average-hash fingerprints from REAL image decode: inflate +
    unfilter the PNG, average-pool the grayscale into an 8×8 grid,
    bit c = (cell_sum × 64 > image_sum) — all-integer, so the 64-bit
    fingerprint is an exact cross-engine fact. Emitted as a 64-char
    bitstring (bit 63 of a packed bigint would go negative).

    At 100 TB this is the image half of corpus dedup: decode +
    fingerprint are one Arrow mapInPandas pass (per-partition
    parallel, pixels never shuffle); only (doc_id, 64-char hash) rows
    leave the stage."""

    def fingerprint(batches: Iterator) -> Iterator:
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_decode

        for pdf in batches:
            rows = [
                (doc_id, _ahash_of_decoded(int(doc_id), *png_decode(bytes(payload))))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    return with_payload.mapInPandas(fingerprint, schema="doc_id bigint, ahash string")


def _ahash_of_decoded(doc_id: int, w: int, h: int, mode: str, px) -> str:
    """The aHash bit string over one decoded image — shared by
    :func:`image_ahash` and the fused :func:`texture_ahash` stage."""
    import numpy as np

    if w < 8 or h < 8:
        # an 8×8 pooled grid needs ≥1 pixel per cell; a smaller image
        # would silently hash to all-zeros (every such image "matches"
        # every other)
        raise ValueError(
            f"image_ahash needs images ≥8×8, got {w}×{h} (doc_id={doc_id})"
        )
    g = px if px.ndim == 2 else px.mean(axis=2).astype(np.int64)
    g = g.astype(np.int64)
    ch, cw = h // 8, w // 8
    cells = g[: ch * 8, : cw * 8].reshape(8, ch, 8, cw).sum(axis=(1, 3))
    bits = (cells * 64 > g.sum()).astype(np.uint8).ravel()
    return "".join("1" if b else "0" for b in bits)


def texture_ahash(docs: DataFrame) -> DataFrame:
    """:func:`attach_texture_png_payload` + :func:`image_ahash` fused
    into ONE ``mapInPandas`` stage: build → encode → decode → hash per
    row, so the PNG payload bytes never cross the JVM↔Python boundary
    between back-to-back Python operators. The codec round trip stays
    — the fingerprint is still computed from a REAL decode — and both
    paths share ``_texture_pixels`` / ``_ahash_of_decoded``, so the
    emitted rows are bit-identical to the two-stage composition."""

    def build_and_hash(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import (
            png_decode,
            png_encode,
        )

        y, x = np.mgrid[0:IMG_SIDE, 0:IMG_SIDE]
        p = (x + IMG_SIDE * y).astype(np.int64)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                decoded = png_decode(png_encode(_texture_pixels(d, p)))
                rows.append((doc_id, _ahash_of_decoded(d, *decoded)))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    return spread(docs).select("doc_id").mapInPandas(
        build_and_hash, schema="doc_id bigint, ahash string"
    )


def banded_hamming_pairs(
    hashes: DataFrame, hash_col: str = "ahash", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs over any 64-bit bitstring fingerprint
    column: split into 4×16-bit bands — Hamming ≤ 3 guarantees at
    least one equal band (pigeonhole, the same policy as SimHash text
    dedup) — equi-join candidates on (band index, band bits), verify
    exact Hamming on candidates only. Candidate volume follows band
    collisions, never all-pairs. Shared by the image (aHash), audio
    (energy profile) and video (frame-majority aHash) dedup paths.

    The fingerprint table feeds BOTH self-join sides; the planner
    broadcasts one side, so the two sides get different exchange types
    and ReusedExchange never fires — without a pin the whole upstream
    fingerprint pipeline (for images: a full Python encode+decode pass
    over every payload) runs once PER SIDE. ``reuse()`` pins the
    (doc_id, fp) rows — a few dozen bytes per doc — exactly like the
    MinHash/SimHash band tables already do."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.textops import reuse

    hashes = reuse(hashes.select("doc_id", F.col(hash_col).alias(hash_col)))
    bands = hashes.select(
        "doc_id",
        F.col(hash_col).alias("fp"),
        F.explode(
            F.expr(
                f"transform(sequence(0, 3),"
                f" b -> struct(b AS band, substring({hash_col}, b * 16 + 1, 16) AS bits))"
            )
        ).alias("s"),
    ).select("doc_id", "fp", F.col("s.band").alias("band"), F.col("s.bits").alias("bits"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("fp").alias("hash_a"), "band", "bits"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("fp").alias("hash_b"), "band", "bits"
    )
    cand = (
        a.join(b, ["band", "bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hash_a", "hash_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr(
                "size(filter(sequence(1, 64),"
                " i -> substring(hash_a, i, 1) <> substring(hash_b, i, 1)))"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def image_neardup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs by banded aHash
    (:func:`banded_hamming_pairs` over :func:`image_ahash`).

    ``docs`` may be (doc_id) rows — payloads get built in-stage via the
    fused :func:`texture_ahash` (one Python stage, payloads never cross
    the Arrow boundary) — or a prebuilt (doc_id, payload) frame (scale
    probes persist payloads so the timed wall is decode+hash+pair, not
    the synthetic encoder)."""
    hashes = (
        image_ahash(docs)
        if "payload" in docs.columns
        else texture_ahash(docs)
    )
    return banded_hamming_pairs(hashes, "ahash", max_hamming)


def image_decontamination(docs: DataFrame, split: DataFrame) -> DataFrame:
    """IMAGE-level benchmark decontamination: training documents whose
    image fingerprint is a near-duplicate (banded aHash, Hamming ≤ 3)
    of a holdout/eval document's — the multimodal twin of the 8-gram
    text sweep (``dedup.decontamination_flags``): text decontamination
    alone misses an eval image re-encoded alongside different captions.
    ``split`` is (doc_id, split) from ``text.train_holdout_split``.
    Candidates are cross-split band equi-joins; fingerprints come from
    the same real-decode pass as ``image_neardup_pairs`` (the fused
    :func:`texture_ahash` stage)."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.textops import reuse

    hashes = texture_ahash(docs).join(split, "doc_id")
    # reuse(): the band rows feed BOTH sides of the cross-split join —
    # without the pin the fused Python fingerprint pass (a full PNG
    # encode+decode per document) ran once per side (r16; the same
    # two-consumer pattern banded_hamming_pairs pinned in r15 —
    # verified live in the executed plan: 2 build_and_hash MapInPandas
    # stages outside any cached relation).
    bands = reuse(
        hashes.select(
            "doc_id",
            "split",
            "ahash",
            F.explode(
                F.expr(
                    "transform(sequence(0, 3),"
                    " b -> struct(b AS band, substring(ahash, b * 16 + 1, 16) AS bits))"
                )
            ).alias("s"),
        ).select(
            "doc_id",
            "split",
            "ahash",
            F.col("s.band").alias("band"),
            F.col("s.bits").alias("bits"),
        )
    )
    t = bands.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), F.col("ahash").alias("hash_t"),
        "band", "bits",
    )
    e = bands.filter(F.col("split") == "holdout").select(
        F.col("doc_id").alias("eval_doc_id"), F.col("ahash").alias("hash_e"),
        "band", "bits",
    )
    cand = (
        t.join(e, ["band", "bits"])
        .select("train_doc_id", "eval_doc_id", "hash_t", "hash_e")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr(
                "size(filter(sequence(1, 64),"
                " i -> substring(hash_t, i, 1) <> substring(hash_e, i, 1)))"
            ),
        )
        .filter(F.col("hamming") <= 3)
        .select("train_doc_id", "eval_doc_id", "hamming")
    )


def decode_png_stats(with_payload: DataFrame) -> DataFrame:
    """Real-decode stage with a content check: emits the decoded
    dimensions AND the sum over all reconstructed pixel bytes — a
    value only a correct inflate+unfilter pass can produce, which the
    relational oracle recomputes arithmetically."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_decode

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, mode, px = png_decode(bytes(payload))
                rows.append((doc_id, w, h, mode, int(px.sum()), "png-numpy"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mode", "pixel_sum", "decoder"],
            )

    return with_payload.mapInPandas(decode, schema=PNG_STATS_SCHEMA)


def png_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """:func:`attach_png_payload` + :func:`decode_png_stats` fused into
    ONE ``mapInPandas`` stage. The two-stage composition pays a full
    JVM↔Python round trip of every encoded payload between back-to-back
    Python operators; fused, the payload bytes never cross the Arrow
    boundary at all (r15 A/B at sf0.1: 1.01—1.07s → 0.61—0.67s,
    results bit-identical — both paths share ``_fill_png_pixels`` and
    the same codec). The separate operators remain the building blocks
    for payloads that arrive from storage."""

    def build_and_decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import (
            png_decode,
            png_encode,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                w, h, mode, px = png_decode(png_encode(_fill_png_pixels(int(doc_id))))
                rows.append((doc_id, w, h, mode, int(px.sum()), "png-numpy"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mode", "pixel_sum", "decoder"],
            )

    return spread(docs).select("doc_id").mapInPandas(
        build_and_decode, schema=PNG_STATS_SCHEMA
    )


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


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int,"
    " px_sum bigint, grad_x_sum bigint, grad_y_sum bigint, decoder string"
)


def attach_gradient_png_payload(docs: DataFrame) -> DataFrame:
    """PNG payloads carrying a GRADIENT image px(r,c) = r + c (dims
    small enough that r+c < 256, so no wraparound) — pixel statistics
    and finite-difference gradients have closed forms the oracle
    recomputes, while the payload still exercises the full PNG
    encode/decode (all five scanline filters carry non-trivial
    residuals on a gradient, unlike a constant fill)."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

    def build(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                png_encode(_gradient_pixels(int(doc_id))) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def _gradient_pixels(doc_id: int):
    """The gradient fixture pixels px(r,c) = r + c for ``doc_id`` —
    shared by the payload builder and the fused build+featurize stage
    so both paths stay byte-identical."""
    import numpy as np

    w = 8 + doc_id % 16
    h = 8 + (3 * doc_id) % 16
    return (np.arange(h)[:, None] + np.arange(w)[None, :]).astype(np.uint8)


_IMAGE_FEATURES_COLUMNS = [
    "doc_id",
    "width",
    "height",
    "px_sum",
    "grad_x_sum",
    "grad_y_sum",
    "decoder",
]


def _image_features_row(doc_id, data: bytes):
    """One decode→gradient feature row — shared by the featurize stage
    and the fused build+featurize stage (byte-identical paths)."""
    import numpy as np

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_decode

    w, h, mode, px = png_decode(data)
    plane = px[:, :, 0].astype(np.int64)
    return (
        doc_id,
        w,
        h,
        int(plane.sum()),
        int(np.diff(plane, axis=1).sum()),
        int(np.diff(plane, axis=0).sum()),
        "png-numpy+grad",
    )


def extract_image_features(with_payload: DataFrame) -> DataFrame:
    """Image feature stage over RECONSTRUCTED pixels (not raw bytes):
    decode PNG, compute the pixel sum and the summed horizontal /
    vertical finite differences with numpy — the image analogue of the
    audio FFT stage. A broken unfilter pass corrupts the gradient sums
    even when dimensions parse fine."""

    def featurize(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                _image_features_row(doc_id, bytes(payload))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=_IMAGE_FEATURES_COLUMNS)

    return with_payload.mapInPandas(featurize, schema=IMAGE_FEATURES_SCHEMA)


def gradient_roundtrip_features(docs: DataFrame) -> DataFrame:
    """:func:`attach_gradient_png_payload` + :func:`extract_image_features`
    fused into ONE ``mapInPandas`` stage (guide §4: the PNG bytes never
    cross the Arrow boundary between back-to-back Python operators).
    The full encode→decode→numpy-gradient chain stays, and both paths
    share ``_gradient_pixels`` / ``_image_features_row``, so rows are
    bit-identical to the two-stage composition."""

    def build_and_featurize(batches):
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

        for pdf in batches:
            rows = [
                _image_features_row(
                    doc_id, png_encode(_gradient_pixels(int(doc_id)))
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=_IMAGE_FEATURES_COLUMNS)

    return spread(docs).select("doc_id").mapInPandas(
        build_and_featurize, schema=IMAGE_FEATURES_SCHEMA
    )


GIF_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, n_colors int,"
    " index_sum bigint, decoder string"
)

_GIF_PALETTE4 = [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]


def attach_gif_payload(docs: DataFrame) -> DataFrame:
    """Attach a REAL single-frame GIF per document: constant index
    value v = doc_id % 4 over doc-derived dims. Constant runs drive
    the LZW dictionary straight into the KwKwK special case, so the
    decode only matches the oracle if the hard path is right."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.gif import gif_encode

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        pal = np.array(_GIF_PALETTE4, dtype=np.uint8)
        for pdf in batches:
            payloads = [
                gif_encode(_gif_index_pixels(int(doc_id)), pal)
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def _gif_index_pixels(doc_id: int):
    """Constant-index GIF fixture pixels — shared by the payload
    builder and the fused build+decode stage (byte-identical paths)."""
    import numpy as np

    w = 8 + doc_id % 16
    h = 8 + (3 * doc_id) % 16
    return np.full((h, w), doc_id % 4, dtype=np.uint8)


def gif_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """:func:`attach_gif_payload` + :func:`decode_gif_stats` fused into
    one ``mapInPandas`` stage (same rationale and discipline as
    :func:`png_roundtrip_stats`: the payload bytes never cross the
    Arrow boundary between back-to-back Python operators; the LZW
    encode+decode round trip stays)."""

    def build_and_decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.gif import (
            gif_decode,
            gif_encode,
        )

        pal = np.array(_GIF_PALETTE4, dtype=np.uint8)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                payload = gif_encode(_gif_index_pixels(int(doc_id)), pal)
                w, h, pal2, idx = gif_decode(payload)
                rows.append((doc_id, w, h, len(pal2), int(idx.sum()), "gif-lzw"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_colors", "index_sum", "decoder"],
            )

    return spread(docs).select("doc_id").mapInPandas(
        build_and_decode, schema=GIF_STATS_SCHEMA
    )


def decode_gif_stats(with_payload: DataFrame) -> DataFrame:
    """LZW decode stage: emits dims, palette size and the sum over all
    decoded palette indices."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.gif import gif_decode

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, pal, idx = gif_decode(bytes(payload))
                rows.append((doc_id, w, h, len(pal), int(idx.sum()), "gif-lzw"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_colors", "index_sum", "decoder"],
            )

    return with_payload.mapInPandas(decode, schema=GIF_STATS_SCHEMA)


GZIP_TEXT_SCHEMA = "doc_id bigint, n_chars int, n_tokens int, codec string"


def compress_text_payload(docs: DataFrame) -> DataFrame:
    """Model the compressed-at-rest corpus (the .jsonl.gz / .warc.gz
    reality of web-scale text): each document's utf-8 bytes are
    deflate-compressed into the binary payload column."""

    def compress(batches: Iterator) -> Iterator:
        import zlib

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        zlib.compress(t.encode("utf-8"), level=6) for t in pdf["text"]
                    ],
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(
        compress, schema="doc_id bigint, payload binary"
    )


def decompress_and_analyze(with_payload: DataFrame) -> DataFrame:
    """Ingest stage for compressed text: inflate each payload and run
    the basic text measures on the RECOVERED string — the oracle
    recomputes them from the uncompressed table, so a truncated or
    corrupted inflate shows up as a value mismatch, not a crash."""

    def analyze(batches: Iterator) -> Iterator:
        import re
        import zlib

        import pandas as pd

        # explicit [ \t\n]+ class on BOTH engines (not str.split(),
        # which spans all Unicode whitespace) — round-2 lesson
        ws = re.compile(r"[ \t\n]+")
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = zlib.decompress(bytes(payload)).decode("utf-8")
                tokens = [t for t in ws.split(text) if t]
                rows.append((doc_id, len(text), len(tokens), "zlib"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_chars", "n_tokens", "codec"]
            )

    return with_payload.mapInPandas(analyze, schema=GZIP_TEXT_SCHEMA)


JPEG_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, mode string,"
    " pixel_sum bigint, decoder string"
)


def attach_jpeg_payload(
    docs: DataFrame, px_base: int = 8, px_range: int = 16, gradient: bool = False
) -> DataFrame:
    """Attach a REAL baseline JPEG per document. Default: constant
    grayscale at quality 100 — the one regime where JPEG is exact
    after rounding (a constant block's DCT is a single integer DC
    coefficient and every quantizer step is 1), so the full
    entropy-decode + IDCT chain gets an exact arithmetic oracle.
    ``gradient=True`` swaps in a deterministic 2-D ramp (every block
    carries AC energy — the realistic sparse-coefficient shape) for
    throughput probes where the oracle is a timing, not a value;
    ``px_base``/``px_range`` size the image (w in
    [px_base, px_base+px_range))."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.jpeg import jpeg_encode

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                jpeg_encode(
                    _jpeg_pixels(int(doc_id), px_base, px_range, gradient),
                    quality=100,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def _jpeg_pixels(doc_id: int, px_base: int, px_range: int, gradient: bool):
    """JPEG fixture pixels — shared by the payload builder and the
    fused build+decode stage (byte-identical paths)."""
    import numpy as np

    w = px_base + doc_id % px_range
    h = px_base + (3 * doc_id) % px_range
    v = doc_id % 251
    if gradient:
        return (
            (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5 + v) % 256
        ).astype(np.uint8)
    return np.full((h, w), v, dtype=np.uint8)


def jpeg_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """:func:`attach_jpeg_payload` + :func:`decode_jpeg_stats` fused
    into one ``mapInPandas`` stage (same rationale and discipline as
    :func:`png_roundtrip_stats`; the full entropy-encode + Huffman
    decode + IDCT round trip stays)."""

    def build_and_decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.jpeg import (
            jpeg_decode,
            jpeg_encode,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = jpeg_encode(_jpeg_pixels(d, 8, 16, False), quality=100)
                w, h, mode, px = jpeg_decode(payload)
                rows.append((doc_id, w, h, mode, int(px.sum()), "jpeg-numpy"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mode", "pixel_sum", "decoder"],
            )

    return spread(docs).select("doc_id").mapInPandas(
        build_and_decode, schema=JPEG_STATS_SCHEMA
    )


def decode_jpeg_stats(with_payload: DataFrame) -> DataFrame:
    """Full baseline-JPEG decode stage: Huffman entropy decode, DPCM
    DC, AC run-lengths, dequantize, IDCT, level shift — emitting the
    reconstructed pixel sum."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from kafka_cdc_elasticsearch_pipeline_spark.extensions.jpeg import jpeg_decode

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, mode, px = jpeg_decode(bytes(payload))
                rows.append((doc_id, w, h, mode, int(px.sum()), "jpeg-numpy"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mode", "pixel_sum", "decoder"],
            )

    return with_payload.mapInPandas(decode, schema=JPEG_STATS_SCHEMA)


def _mixed_payload(doc_id: int, text: str, pal) -> bytes:
    """One heterogeneous fixture payload (PNG / GIF / JPEG / raw text
    bytes chosen by doc_id) — shared by the payload builder and the
    fused build+decode stage so both paths stay byte-identical."""
    import numpy as np

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.gif import gif_encode
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.jpeg import jpeg_encode
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

    w, h, v = 8 + doc_id % 8, 8 + doc_id % 8, doc_id % 251
    kind = doc_id % 4
    if kind == 0:
        return png_encode(np.full((h, w), v, dtype=np.uint8))
    if kind == 1:
        return gif_encode(np.full((h, w), doc_id % 4, dtype=np.uint8), pal)
    if kind == 2:
        return jpeg_encode(np.full((h, w), v, dtype=np.uint8))
    return text.encode("utf-8")


def attach_mixed_payload(docs: DataFrame) -> DataFrame:
    """A heterogeneous payload column — PNG / GIF / JPEG / raw text
    bytes chosen by doc_id — the real shape of a scraped corpus where
    format routing happens per row, not per table."""

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        pal = np.array(_GIF_PALETTE4, dtype=np.uint8)
        for pdf in batches:
            payloads = [
                _mixed_payload(int(doc_id), text, pal)
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id", "text").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def mixed_roundtrip_metadata(docs: DataFrame) -> DataFrame:
    """:func:`attach_mixed_payload` + :func:`decode_image_metadata`
    fused into ONE ``mapInPandas`` stage (guide §4: the heterogeneous
    payloads never cross the Arrow boundary between back-to-back
    Python operators). Per-row format routing is unchanged — each
    payload is still built by its REAL codec and re-sniffed/decoded by
    the shared ``_image_metadata_row`` — so rows are bit-identical to
    the two-stage composition."""

    def build_and_decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        pal = np.array(_GIF_PALETTE4, dtype=np.uint8)
        for pdf in batches:
            rows = [
                _image_metadata_row(doc_id, _mixed_payload(int(doc_id), text, pal))
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=_DECODED_COLUMNS)

    return spread(docs).select("doc_id", "text").mapInPandas(
        build_and_decode, schema=DECODED_SCHEMA
    )
