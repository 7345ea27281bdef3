"""Video columns: REAL MP4 (ISO-BMFF) container metadata parsing —
the video counterpart of png.py (image) and audio.py (audio).

An MP4 file is a tree of length-tagged boxes; the moov/mvhd box holds
the movie timescale + duration and each trak/tkhd holds track
dimensions (16.16 fixed point). Parsing that structure is what a
training pipeline's video ingest does BEFORE any frame decode (to
route, filter by resolution/duration, and plan frame sampling), and
it needs no codec: pure struct walking. The frame-sample stage
(multimodal.frame_sample) then plans the per-frame explode.

Codec-level frame decode (H.264 etc.) stays out of sandbox scope for
the same reason as JPEG/MP3 — an entropy decoder dwarfs its signal
here; the container walk, box bounds checking, fixed-point math and
Arrow plumbing are the real, tested surface.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

from kafka_cdc_elasticsearch_pipeline_spark.extensions.textops import spread

MP4_META_SCHEMA = (
    "doc_id bigint, timescale int, duration_ms bigint,"
    " width int, height int, n_tracks int, decoder string"
)


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def mp4_build_minimal(
    timescale: int, duration: int, width: int, height: int, n_tracks: int = 1
) -> bytes:
    """Build a minimal valid ISO-BMFF stream: ftyp + moov(mvhd,
    trak(tkhd)×n). Spec-conformant box sizes/offsets — a parser that
    mis-walks the tree reads garbage."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        struct.pack(">I", 0)  # version+flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", n_tracks + 1),  # next track id
    )
    traks = b""
    for track_id in range(1, n_tracks + 1):
        tkhd = _box(
            b"tkhd",
            struct.pack(">I", 7)  # version 0 + flags enabled|in-movie
            + struct.pack(">II", 0, 0)  # ctime, mtime
            + struct.pack(">I", track_id)
            + b"\x00" * 4  # reserved
            + struct.pack(">I", duration)
            + b"\x00" * 8  # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, rsvd
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
        )
        traks += _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_end) for each box in range,
    bounds-checked."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError(f"corrupt box {tag!r}: size {size} at {pos}")
        yield tag, pos + 8, pos + size
        pos += size


def mp4_parse_metadata(data: bytes):
    """Parse (timescale, duration, width, height, n_tracks) from an
    ISO-BMFF stream. Raises ValueError on non-MP4 / corrupt boxes."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (no ftyp)")
    timescale = duration = width = height = None
    n_tracks = 0
    for tag, s, e in _walk(data, 0, len(data)):
        if tag != b"moov":
            continue
        for tag2, s2, e2 in _walk(data, s, e):
            if tag2 == b"mvhd":
                version = data[s2]
                if version == 0:
                    timescale, duration = struct.unpack(">II", data[s2 + 12 : s2 + 20])
                else:  # version 1: 64-bit times
                    timescale, duration = struct.unpack(
                        ">IQ", data[s2 + 20 : s2 + 32]
                    )
            elif tag2 == b"trak":
                n_tracks += 1
                for tag3, s3, e3 in _walk(data, s2, e2):
                    if tag3 == b"tkhd" and width is None:
                        # width/height are the LAST 8 bytes of tkhd
                        w_fixed, h_fixed = struct.unpack(">II", data[e3 - 8 : e3])
                        width, height = w_fixed >> 16, h_fixed >> 16
    if timescale is None:
        raise ValueError("no moov/mvhd found")
    return timescale, duration, width or 0, height or 0, n_tracks


def _mp4_fixture_payload(doc_id: int) -> bytes:
    """One minimal-MP4 fixture payload — shared by the payload builder
    and the fused build+parse stage so both paths stay byte-identical."""
    return mp4_build_minimal(
        timescale=1000 * (1 + doc_id % 3),
        duration=5000 + (doc_id * 37) % 100000,
        width=320 + (doc_id % 8) * 160,
        height=240 + (doc_id % 6) * 120,
        n_tracks=1 + doc_id % 2,
    )


def attach_mp4_payload(docs: DataFrame) -> DataFrame:
    """Attach a REAL minimal MP4 container per document (deterministic
    timescale/duration/dims/tracks from ``doc_id``)."""

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                _mp4_fixture_payload(int(doc_id)) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


_MP4_META_COLUMNS = [
    "doc_id",
    "timescale",
    "duration_ms",
    "width",
    "height",
    "n_tracks",
    "decoder",
]


def _mp4_meta_row(doc_id, data: bytes):
    """One parsed-metadata row — shared by the parse stage and the
    fused build+parse stage (byte-identical paths)."""
    ts, dur, w, h, n = mp4_parse_metadata(data)
    return (doc_id, ts, dur * 1000 // ts, w, h, n, "mp4-bmff")


def parse_mp4_stats(with_payload: DataFrame) -> DataFrame:
    """Container-walk stage: emits the parsed movie metadata; the
    duration_ms integer math (duration * 1000 // timescale) only comes
    out right if the box tree was walked correctly."""

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                _mp4_meta_row(doc_id, bytes(payload))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=_MP4_META_COLUMNS)

    return with_payload.mapInPandas(parse, schema=MP4_META_SCHEMA)


def mp4_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """:func:`attach_mp4_payload` + :func:`parse_mp4_stats` fused into
    ONE ``mapInPandas`` stage (guide §4: the container bytes never
    cross the Arrow boundary between back-to-back Python operators).
    The box-tree build→walk round trip stays — metadata still comes
    from a REAL ISO-BMFF parse — and both paths share
    ``_mp4_fixture_payload`` / ``_mp4_meta_row``, so rows are
    bit-identical to the two-stage composition."""

    def build_and_parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                _mp4_meta_row(doc_id, _mp4_fixture_payload(int(doc_id)))
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=_MP4_META_COLUMNS)

    return spread(docs).select("doc_id").mapInPandas(
        build_and_parse, schema=MP4_META_SCHEMA
    )


# --- video near-duplicate detection (round-6 verdict #6) ---------------------
#
# Completes the every-modality dedup map (text / image / audio / video):
# frame-sampled perceptual fingerprints over REAL container + image
# decode, paired by the same 4×16-bit banded Hamming policy as the
# image and audio paths.

VIDEO_FRAME_SIDE = 16  # 16×16 grayscale frames, like the image fixture
VIDEO_FP_SCHEMA = "doc_id bigint, n_frames int, vhash string"


def _video_frame_count(seed0: int) -> int:
    return 8 + seed0 % 5


def _video_frame_seed(seed0: int, f: int) -> int:
    return seed0 * 31 + f * 7


def attach_texture_mp4_payload(docs: DataFrame) -> DataFrame:
    """REAL playable-shape MP4 per document: ftyp + moov (true box
    tree, dims/duration from doc_id) + an ``mdat`` box holding the
    frame stream as length-prefixed PNG-encoded 16×16 textured frames
    (frame f's pixel function is the closed-form hash ramp seeded by
    seed0*31 + f*7, so the relational oracle can recompute every
    sampled frame arithmetically). Every doc with ``doc_id % 50 == 1``
    is a PLANTED near-duplicate VIDEO of its predecessor — identical
    frame stream (same seed0, same frame count) except frame 0 carries
    the two-pixel +128 shift — i.e. a re-encode with one edited frame,
    the case video dedup exists to catch."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        side = VIDEO_FRAME_SIDE
        y, x = np.mgrid[0:side, 0:side]
        p = (x + side * y).astype(np.int64)
        for pdf in batches:
            payloads = [
                _texture_mp4_payload(int(doc_id), p) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def _texture_mp4_payload(doc_id: int, p) -> bytes:
    """One textured MP4 payload — shared by the payload builder and the
    fused build+fingerprint stage so both paths stay byte-identical."""
    import numpy as np

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

    side = VIDEO_FRAME_SIDE
    near_dup = doc_id % 50 == 1
    seed0 = doc_id - 1 if near_dup else doc_id
    frames = b""
    for f in range(_video_frame_count(seed0)):
        sf = _video_frame_seed(seed0, f)
        px = (sf % 239 + 1) * p * p + (sf % 251 + 3) * p + sf % 241
        if near_dup and f == 0:
            px = px + np.where((p == 0) | (p == side), 128, 0)
        enc = png_encode((px % 256).astype(np.uint8))
        frames += struct.pack(">I", len(enc)) + enc
    head = mp4_build_minimal(
        timescale=1000,
        duration=_video_frame_count(seed0) * 40,  # 25 fps
        width=side,
        height=side,
        n_tracks=1,
    )
    return head + _box(b"mdat", frames)


def mp4_extract_frames(data: bytes) -> list[bytes]:
    """Walk the top-level box tree, find ``mdat``, split its payload at
    the 4-byte length prefixes. Raises on truncated frames — a wrong
    walk reads garbage lengths and fails loudly, not silently."""
    frames: list[bytes] = []
    for tag, s, e in _walk(data, 0, len(data)):
        if tag != b"mdat":
            continue
        pos = s
        while pos < e:
            if pos + 4 > e:
                raise ValueError(f"truncated frame length at {pos}")
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            if pos + 4 + ln > e:
                raise ValueError(f"truncated frame payload at {pos}: {ln}")
            frames.append(data[pos + 4 : pos + 4 + ln])
            pos += 4 + ln
    return frames


def video_fingerprint(with_payload: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampled video fingerprint from REAL decode: walk the MP4
    container, pull every ``every_nth``-th frame from mdat, PNG-decode
    it, aHash it (8×8 integer cell sums vs the frame sum — the exact
    image-path arithmetic), then MAJORITY-VOTE each of the 64 bits
    across the sampled frames. Near-duplicate videos (same content,
    a frame edited / re-encoded) agree on most frame hashes, so the
    majority bits — and hence the banded pairing — survive the edit;
    the strict-majority tie rule (ties → 0) keeps the fingerprint an
    exact cross-engine fact.

    One Arrow mapInPandas pass: container walk + frame decode + hash
    never shuffle; only (doc_id, n_frames, 64-char vhash) rows leave
    the stage — at 100 TB of video that is the whole point."""

    def fingerprint(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                _video_fp_of_payload(int(doc_id), bytes(payload), every_nth)
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "vhash"])

    return with_payload.mapInPandas(fingerprint, schema=VIDEO_FP_SCHEMA)


def _video_fp_of_payload(doc_id: int, payload: bytes, every_nth: int):
    """(doc_id, n_frames, vhash) for one MP4 payload — shared by
    :func:`video_fingerprint` and the fused
    :func:`texture_video_fingerprint` stage."""
    import numpy as np

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_decode

    frames = mp4_extract_frames(payload)
    if not frames:
        raise ValueError(f"no mdat frames (doc_id={doc_id})")
    sampled = frames[::every_nth]
    votes = np.zeros(64, dtype=np.int64)
    for enc in sampled:
        w, h, mode, px = png_decode(enc)
        g = px if px.ndim == 2 else px.mean(axis=2).astype(np.int64)
        g = g.astype(np.int64)
        ch, cw = h // 8, w // 8
        cells = g[: ch * 8, : cw * 8].reshape(8, ch, 8, cw).sum(axis=(1, 3))
        votes += (cells * 64 > g.sum()).astype(np.int64).ravel()
    bits = (votes * 2 > len(sampled)).astype(np.uint8)
    return (doc_id, len(frames), "".join("1" if b else "0" for b in bits))


def texture_video_fingerprint(docs: DataFrame, every_nth: int = 2) -> DataFrame:
    """:func:`attach_texture_mp4_payload` + :func:`video_fingerprint`
    fused into ONE ``mapInPandas`` stage: the MP4 payloads — the
    heaviest synthetic fixtures in the suite — never cross the Arrow
    boundary between back-to-back Python operators. The container
    round trip stays (mux → walk → frame decode), and both paths share
    ``_texture_mp4_payload`` / ``_video_fp_of_payload``."""

    def build_and_fp(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        side = VIDEO_FRAME_SIDE
        y, x = np.mgrid[0:side, 0:side]
        p = (x + side * y).astype(np.int64)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rows.append(
                    _video_fp_of_payload(d, _texture_mp4_payload(d, p), every_nth)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "vhash"])

    return spread(docs).select("doc_id").mapInPandas(
        build_and_fp, schema=VIDEO_FP_SCHEMA
    )


def video_neardup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Video near-duplicate pairs: frame-majority fingerprints paired
    by the shared 4×16-bit banded-Hamming policy
    (:func:`multimodal.banded_hamming_pairs`) — candidate volume
    follows band collisions, never all-pairs, same as the image and
    audio modalities.

    ``docs`` may be (doc_id) rows — payloads get built in-stage — or a
    prebuilt (doc_id, payload) frame (scale probes persist payloads)."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.multimodal import (
        banded_hamming_pairs,
    )

    fps = (
        video_fingerprint(docs)
        if "payload" in docs.columns
        else texture_video_fingerprint(docs)
    )
    return banded_hamming_pairs(fps, "vhash", max_hamming)
