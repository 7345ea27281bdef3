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


def attach_mp4_payload(docs: DataFrame) -> DataFrame:
    """Attach a REAL minimal MP4 container per document (deterministic
    timescale/duration/dims/tracks from ``doc_id``)."""

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    mp4_build_minimal(
                        timescale=1000 * (1 + d % 3),
                        duration=5000 + (d * 37) % 100000,
                        width=320 + (d % 8) * 160,
                        height=240 + (d % 6) * 120,
                        n_tracks=1 + d % 2,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def parse_mp4_stats(with_payload: DataFrame) -> DataFrame:
    """Container-walk stage: emits the parsed movie metadata; the
    duration_ms integer math (duration * 1000 // timescale) only comes
    out right if the box tree was walked correctly."""

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ts, dur, w, h, n = mp4_parse_metadata(bytes(payload))
                rows.append((doc_id, ts, dur * 1000 // ts, w, h, n, "mp4-bmff"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "timescale",
                    "duration_ms",
                    "width",
                    "height",
                    "n_tracks",
                    "decoder",
                ],
            )

    return with_payload.mapInPandas(parse, schema=MP4_META_SCHEMA)
