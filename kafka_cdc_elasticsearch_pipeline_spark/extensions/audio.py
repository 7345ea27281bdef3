"""Audio columns: REAL WAV (RIFF/PCM) decode for the multimodal
pipeline — the audio counterpart of the PNG image path (png.py).

The harness ships no audio libraries, but WAV is stdlib territory:
``wave`` parses the RIFF container (fmt/data chunks, sample width,
channel interleave) and numpy vectorizes the PCM math. So unlike the
labeled deterministic fake used for undecodable payloads, the decode
stage here is genuine: a corrupted header, wrong sample width, or
broken interleave produces wrong numbers, and the oracle recomputes
the expected stats arithmetically.

Compressed codecs (MP3/AAC/FLAC) stay out of sandbox scope for the
same reason as JPEG (png.py): entropy-decoder implementations dwarf
their signal here. PCM-WAV is also what a training pipeline
normalizes audio to before featurization, so it is the right decode
target anyway.

Scale shape: payload build and decode both run as Arrow-batched
``mapInPandas`` stages — Python cost per batch, partitions stream
through workers, schema declared so Catalyst prunes around the opaque
stages. Same 100 TB story as the image path.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions.textops import spread

WAV_STATS_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_samples int,"
    " amp_sum bigint, peak int, decoder string"
)


def wav_encode(samples, sample_rate: int) -> bytes:
    """Encode an int16 numpy array of shape (n,) or (n, channels) to
    PCM WAV bytes via the stdlib ``wave`` writer."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    n_channels = 1 if arr.ndim == 1 else arr.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes):
    """Decode PCM WAV bytes -> (sample_rate, n_channels, n_frames,
    samples[int32 flat interleaved]). Raises on non-WAV or non-16-bit
    payloads."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {w.getsampwidth()} (16-bit only)")
        frames = w.readframes(w.getnframes())
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int32)
        return w.getframerate(), w.getnchannels(), w.getnframes(), samples


def _wav_fixture_samples(doc_id: int):
    """(samples, rate) for the deterministic WAV fixture — shared by
    the payload builder and the fused build+decode stage so the two
    paths stay byte-identical."""
    import numpy as np

    rate = 8000 + (doc_id % 4) * 4000
    ch = 1 + doc_id % 2
    n = 64 + doc_id % 128
    amp = (doc_id % 1999) - 999
    arr = np.full((n, ch) if ch > 1 else (n,), amp, dtype=np.int16)
    return arr, rate


def attach_wav_payload(docs: DataFrame) -> DataFrame:
    """Attach a REAL PCM-WAV payload per document, deterministically
    derived from ``doc_id`` (rate, channels, length, constant
    amplitude) — genuine RIFF containers, fixture-built in-stage since
    the harness ships no media files."""

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                arr, rate = _wav_fixture_samples(int(doc_id))
                payloads.append(wav_encode(arr, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


#: texture formula shared by the builder and the SQL oracle, over
#: sample index t on a 256-sample mono clip:
#:   s(t) = ((seed%239+1)·t² + (seed%251+3)·t + seed%241) mod 2048 − 1024
#: (coprime-moduli quadratic mix — constant-amplitude clips collapse
#: every energy fingerprint, exactly like flat images; see
#: multimodal.attach_texture_png_payload). A planted near-dup
#: (doc_id % 50 == 1) reuses its predecessor's seed with samples
#: t ∈ {0, 1} shifted by +512.
AUDIO_SAMPLES = 256


def attach_texture_wav_payload(docs: DataFrame) -> DataFrame:
    """Textured mono 16-bit WAVs for audio NEAR-DUP fixtures, with
    planted near-duplicates — genuine RIFF containers built in-stage."""

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        t = np.arange(AUDIO_SAMPLES, dtype=np.int64)
        for pdf in batches:
            payloads = [
                wav_encode(_texture_samples(int(doc_id), t), 8000)
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def _texture_samples(doc_id: int, t):
    """Texture fixture samples for ``doc_id`` over the precomputed
    sample-index vector ``t`` — shared by the payload builder and the
    fused build+fingerprint stage so both paths stay byte-identical."""
    near_dup = doc_id % 50 == 1
    seed = doc_id - 1 if near_dup else doc_id
    s = ((seed % 239 + 1) * t * t + (seed % 251 + 3) * t + seed % 241) % 2048 - 1024
    if near_dup:
        s = s.copy()
        s[0:2] += 512
    return s.astype("int16")


def audio_energy_fingerprint(with_payload: DataFrame) -> DataFrame:
    """64-bit audio fingerprints from REAL WAV decode: parse the RIFF
    container, deinterleave PCM, frame the clip into 64 windows,
    bit f = (frame_energy × 64 > clip_energy) — all-integer (energies
    are exact int64 sums of squares), so the fingerprint is a
    cross-engine fact. The audio twin of ``multimodal.image_ahash``;
    one Arrow pass, only (doc_id, 64-char hash) rows leave it.

    64 bits, not 32: banding needs 16-bit bands to stay selective —
    an 8-bit band space (256 buckets) measured ~quadratic candidate
    growth past 20k clips (19.2s at 80k vs 2.1s at 20k), the exact
    degeneracy SCALING.md records for 8-bit RHP-LSH bands."""

    def fingerprint(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                (doc_id, _energy_fp_of_decoded(int(doc_id), *wav_decode(bytes(payload))))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "fp"])

    return with_payload.mapInPandas(fingerprint, schema="doc_id bigint, fp string")


def _energy_fp_of_decoded(doc_id: int, rate: int, ch: int, n: int, samples) -> str:
    """The 64-bit energy fingerprint over one decoded clip — shared by
    :func:`audio_energy_fingerprint` and the fused
    :func:`texture_energy_fingerprint` stage."""
    import numpy as np

    s = samples.astype(np.int64)
    if ch > 1:  # average channels (integer floor division)
        s = s.reshape(-1, ch).sum(axis=1) // ch
    if len(s) < 64:
        # 64 frames need ≥1 sample each; shorter clips would silently
        # fingerprint as all-zeros and "match" every other short clip
        raise ValueError(
            f"audio fingerprint needs ≥64 samples, got {len(s)} (doc_id={doc_id})"
        )
    frame = len(s) // 64
    e = (s[: frame * 64] ** 2).reshape(64, frame).sum(axis=1)
    bits = (e * 64 > e.sum()).astype(np.uint8)
    return "".join("1" if b else "0" for b in bits)


def texture_energy_fingerprint(docs: DataFrame) -> DataFrame:
    """:func:`attach_texture_wav_payload` + :func:`audio_energy_fingerprint`
    fused into ONE ``mapInPandas`` stage (same rationale as
    ``multimodal.texture_ahash``: the WAV bytes never cross the Arrow
    boundary between back-to-back Python operators; the RIFF
    encode+decode round trip stays, and both paths share
    ``_texture_samples`` / ``_energy_fp_of_decoded``)."""

    def build_and_fp(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        t = np.arange(AUDIO_SAMPLES, dtype=np.int64)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = wav_encode(_texture_samples(d, t), 8000)
                rows.append((doc_id, _energy_fp_of_decoded(d, *wav_decode(payload))))
            yield pd.DataFrame(rows, columns=["doc_id", "fp"])

    return spread(docs).select("doc_id").mapInPandas(
        build_and_fp, schema="doc_id bigint, fp string"
    )


def audio_neardup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Audio near-duplicate pairs by banded energy fingerprints:
    4×16-bit bands — Hamming ≤ 3 guarantees an equal band (pigeonhole)
    — equi-join candidates, verify exact Hamming. Same candidate
    policy as SimHash text dedup and aHash image dedup; pairs volume
    follows band collisions, never all-pairs.

    ``docs`` may be (doc_id) rows — payloads get built in-stage — or a
    prebuilt (doc_id, payload) frame (scale probes persist payloads)."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.multimodal import (
        banded_hamming_pairs,
    )

    fps = (
        audio_energy_fingerprint(docs)
        if "payload" in docs.columns
        else texture_energy_fingerprint(docs)
    )
    return banded_hamming_pairs(fps, "fp", max_hamming)


_WAV_STATS_COLUMNS = [
    "doc_id",
    "sample_rate",
    "n_channels",
    "n_samples",
    "amp_sum",
    "peak",
    "decoder",
]


def _wav_stats_row(doc_id, data: bytes):
    """One decoded-stats row — shared by the decode stage and the fused
    build+decode stage so both paths stay byte-identical."""
    rate, ch, n, samples = wav_decode(data)
    return (
        doc_id,
        rate,
        ch,
        n,
        int(samples.sum()),
        int(abs(samples).max()) if len(samples) else 0,
        "wav-stdlib",
    )


def decode_wav_stats(with_payload: DataFrame) -> DataFrame:
    """Real-decode stage with a content check: emits the container
    metadata AND the sum/peak over all decoded samples — values only a
    correct fmt-chunk parse + PCM deinterleave can produce; the
    relational oracle recomputes them arithmetically."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                _wav_stats_row(doc_id, bytes(payload))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=_WAV_STATS_COLUMNS)

    return with_payload.mapInPandas(decode, schema=WAV_STATS_SCHEMA)


def wav_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """:func:`attach_wav_payload` + :func:`decode_wav_stats` fused into
    ONE ``mapInPandas`` stage (guide §4: the WAV bytes never cross the
    JVM↔Python Arrow boundary between back-to-back Python operators).
    The RIFF encode+decode round trip stays — stats still come from a
    REAL container parse — and both paths share
    ``_wav_fixture_samples`` / ``_wav_stats_row``, so the emitted rows
    are bit-identical to the two-stage composition, which remains the
    building block for storage-sourced payloads."""

    def build_and_decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                arr, rate = _wav_fixture_samples(int(doc_id))
                rows.append(_wav_stats_row(doc_id, wav_encode(arr, rate)))
            yield pd.DataFrame(rows, columns=_WAV_STATS_COLUMNS)

    return spread(docs).select("doc_id").mapInPandas(
        build_and_decode, schema=WAV_STATS_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples int,"
    " dominant_bin int, dominant_hz double, decoder string"
)

TONE_N = 256  # analysis frame length (FFT size)


def attach_tone_payload(docs: DataFrame) -> DataFrame:
    """WAV payloads carrying a PURE TONE at an integer FFT bin derived
    from ``doc_id`` — a signal whose spectral analysis has a closed
    form, so the whole decode → FFT feature chain gets an exact
    arithmetic oracle (an integer-bin sine has zero spectral leakage:
    argmax|FFT| recovers the bin exactly)."""

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n = np.arange(TONE_N)
        for pdf in batches:
            payloads = [
                wav_encode(_tone_samples(int(doc_id), n), 8000)
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(docs).select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )


def _tone_samples(doc_id: int, n):
    """The pure-tone fixture samples for ``doc_id`` over the
    precomputed sample-index vector ``n`` — shared by the payload
    builder and the fused build+featurize stage (byte-identical
    paths)."""
    import numpy as np

    k = 1 + doc_id % 100  # tone bin, < N/2
    return np.round(8000.0 * np.sin(2.0 * np.pi * k * n / TONE_N)).astype("<i2")


def extract_audio_features(with_payload: DataFrame) -> DataFrame:
    """Feature-extraction stage: decode PCM, run a real FFT (numpy
    rfft), emit the dominant frequency bin and its Hz value. This is
    the audio analogue of the image byte-histogram — genuine numerical
    analysis in the Arrow batch path, not a metadata echo: a broken
    deinterleave, dtype, or FFT windowing shifts the argmax and fails
    the oracle."""

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                _audio_features_row(doc_id, bytes(payload))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=_AUDIO_FEATURES_COLUMNS)

    return with_payload.mapInPandas(featurize, schema=AUDIO_FEATURES_SCHEMA)


_AUDIO_FEATURES_COLUMNS = [
    "doc_id",
    "sample_rate",
    "n_samples",
    "dominant_bin",
    "dominant_hz",
    "decoder",
]


def _audio_features_row(doc_id, data: bytes):
    """One decode→FFT feature row — shared by the featurize stage and
    the fused build+featurize stage (byte-identical paths)."""
    import numpy as np

    rate, ch, n, samples = wav_decode(data)
    mono = samples.reshape(n, ch).mean(axis=1)
    spectrum = np.abs(np.fft.rfft(mono))
    # bin 0 is DC; the dominant tone lives above it
    k = int(spectrum[1:].argmax()) + 1
    return (doc_id, rate, n, k, k * rate / len(mono), "wav-stdlib+rfft")


def tone_roundtrip_features(docs: DataFrame) -> DataFrame:
    """:func:`attach_tone_payload` + :func:`extract_audio_features`
    fused into ONE ``mapInPandas`` stage (guide §4: the WAV bytes never
    cross the Arrow boundary between back-to-back Python operators).
    The encode→decode→rfft chain stays — the dominant bin still comes
    from a REAL FFT over decoded PCM — and both paths share
    ``_tone_samples`` / ``_audio_features_row``, so rows are
    bit-identical to the two-stage composition."""

    def build_and_featurize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n = np.arange(TONE_N)
        for pdf in batches:
            rows = [
                _audio_features_row(
                    doc_id, wav_encode(_tone_samples(int(doc_id), n), 8000)
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=_AUDIO_FEATURES_COLUMNS)

    return spread(docs).select("doc_id").mapInPandas(
        build_and_featurize, schema=AUDIO_FEATURES_SCHEMA
    )
