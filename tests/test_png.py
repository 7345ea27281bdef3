"""PNG codec (extensions/png.py): round-trips across every scanline
filter, a known-bytes golden image produced by an INDEPENDENT encoder
(not ours), and the multimodal decode stage's PNG branch."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import (
    PNG_SIG,
    png_decode,
    png_encode,
)

# 1x1 PNG produced by an external encoder (the ubiquitous single-pixel
# data-URI image): 8-bit RGBA, our decoder must parse a stream it did
# not write.
GOLDEN_1PX_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_golden_external_png_decodes():
    w, h, mode, px = png_decode(base64.b64decode(GOLDEN_1PX_B64))
    assert (w, h) == (1, 1)
    assert mode == "RGBA"
    assert px.shape == (1, 1, 4)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("filter_cycle", [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_roundtrip_all_filters_and_channels(ch, filter_cycle):
    rng = np.random.default_rng(42 + ch * 10 + sum(filter_cycle))
    shape = (11, 7) if ch == 1 else (11, 7, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = png_encode(px, filter_cycle=filter_cycle)
    assert data[:8] == PNG_SIG
    w, h, mode, out = png_decode(data)
    assert (w, h) == (7, 11)
    assert mode == {1: "L", 3: "RGB", 4: "RGBA"}[ch]
    np.testing.assert_array_equal(out.reshape(px.shape), px)


def test_corrupt_crc_rejected():
    data = bytearray(png_encode(np.zeros((4, 4), dtype=np.uint8)))
    # flip a byte inside the IDAT body (after sig+IHDR chunk)
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC"):
        png_decode(bytes(data))


def test_non_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"plainly not an image")


def test_decode_stage_routes_png_vs_fake(spark):
    """multimodal.decode_image_metadata: PNG payloads take the real
    decoder, anything else keeps the labeled fake."""
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm

    png_bytes = png_encode(np.full((5, 9, 3), 17, dtype=np.uint8))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(png_bytes)),
            Row(doc_id=2, payload=bytearray(b"just text bytes")),
        ]
    )
    got = {r.doc_id: r for r in mm.decode_image_metadata(df).collect()}
    assert got[1].decoder == "png-numpy"
    assert (got[1].width, got[1].height, got[1].mode) == (9, 5, "RGB")
    assert got[2].decoder == "fake-deterministic"


def test_png_stats_pixel_sum(spark):
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm

    px = np.full((6, 4), 100, dtype=np.uint8)
    df = spark.createDataFrame([Row(doc_id=7, payload=bytearray(png_encode(px)))])
    r = mm.decode_png_stats(df).collect()[0]
    assert r.pixel_sum == 6 * 4 * 100
    assert (r.width, r.height, r.mode) == (4, 6, "L")


# --- WAV audio path (extensions/audio.py) ------------------------------------


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.audio import (
        wav_decode,
        wav_encode,
    )

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, size=300, dtype=np.int16)
    rate, ch, n, samples = wav_decode(wav_encode(mono, 16000))
    assert (rate, ch, n) == (16000, 1, 300)
    np.testing.assert_array_equal(samples, mono.astype(np.int32))

    stereo = rng.integers(-32768, 32767, size=(120, 2), dtype=np.int16)
    rate, ch, n, samples = wav_decode(wav_encode(stereo, 44100))
    assert (rate, ch, n) == (44100, 2, 120)
    np.testing.assert_array_equal(samples.reshape(120, 2), stereo.astype(np.int32))


def test_wav_rejects_non_wav():
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.audio import wav_decode

    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        wav_decode(b"definitely not audio bytes")


def test_wav_stats_stage(spark):
    import numpy as np
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.audio import (
        decode_wav_stats,
        wav_encode,
    )

    arr = np.full((50, 2), -7, dtype=np.int16)
    df = spark.createDataFrame(
        [Row(doc_id=3, payload=bytearray(wav_encode(arr, 8000)))]
    )
    r = decode_wav_stats(df).collect()[0]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 2, 50)
    assert r.amp_sum == -7 * 50 * 2
    assert r.peak == 7
    assert r.decoder == "wav-stdlib"


# --- MP4 container path (extensions/video.py) --------------------------------


def test_mp4_roundtrip_metadata():
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.video import (
        mp4_build_minimal,
        mp4_parse_metadata,
    )

    data = mp4_build_minimal(timescale=1000, duration=61234, width=1920,
                             height=1080, n_tracks=2)
    ts, dur, w, h, n = mp4_parse_metadata(data)
    assert (ts, dur, w, h, n) == (1000, 61234, 1920, 1080, 2)


def test_mp4_rejects_non_bmff_and_corrupt_box():
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.video import (
        mp4_build_minimal,
        mp4_parse_metadata,
    )

    with pytest.raises(ValueError, match="no ftyp"):
        mp4_parse_metadata(b"0000000000000000")
    data = bytearray(mp4_build_minimal(1000, 5000, 320, 240))
    moov_at = bytes(data).index(b"moov") - 4
    data[moov_at : moov_at + 4] = (10**9).to_bytes(4, "big")  # absurd size
    with pytest.raises(ValueError, match="corrupt box"):
        mp4_parse_metadata(bytes(data))


def test_mp4_mvhd_version1_64bit_times():
    """Parser must handle version-1 mvhd (64-bit duration) — real
    encoders emit it for long media."""
    import struct as _struct

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.video import (
        _box,
        mp4_parse_metadata,
    )

    mvhd_v1 = _box(
        b"mvhd",
        bytes([1, 0, 0, 0])  # version 1
        + _struct.pack(">QQ", 0, 0)  # 64-bit ctime/mtime
        + _struct.pack(">IQ", 90000, 2**33)  # timescale, 64-bit duration
        + b"\x00" * 80,
    )
    data = _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _box(b"moov", mvhd_v1)
    ts, dur, w, h, n = mp4_parse_metadata(data)
    assert (ts, dur, n) == (90000, 2**33, 0)


def test_audio_fft_features_recover_tone_bin(spark):
    """A 17-bin tone must come back as dominant_bin=17 through the
    full encode → WAV → decode → FFT chain."""
    import numpy as np
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.audio import (
        extract_audio_features,
        wav_encode,
    )

    n = np.arange(256)
    tone = np.round(8000 * np.sin(2 * np.pi * 17 * n / 256)).astype(np.int16)
    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(wav_encode(tone, 8000)))])
    r = extract_audio_features(df).collect()[0]
    assert r.dominant_bin == 17
    assert abs(r.dominant_hz - 17 * 8000 / 256) < 1e-9


def test_image_gradient_features(spark):
    """Gradient image r+c: decoded feature sums must match the closed
    forms (px_sum = wh(w+h-2)/2, grad_x = h(w-1), grad_y = w(h-1))."""
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import png_encode

    w, h = 13, 9
    px = (np.arange(h)[:, None] + np.arange(w)[None, :]).astype(np.uint8)
    df = spark.createDataFrame([Row(doc_id=5, payload=bytearray(png_encode(px)))])
    r = mm.extract_image_features(df).collect()[0]
    assert (r.width, r.height) == (w, h)
    assert r.px_sum == w * h * (w + h - 2) // 2
    assert r.grad_x_sum == h * (w - 1)
    assert r.grad_y_sum == w * (h - 1)
