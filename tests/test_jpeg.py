"""Baseline JPEG codec (extensions/jpeg.py): exact regimes (constant
and smooth grayscale at quality 100), lossy-regime tolerances,
compression actually compressing, multi-MCU DC prediction, byte
stuffing, and rejection of out-of-scope variants."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_cdc_elasticsearch_pipeline_spark.extensions.jpeg import (
    jpeg_decode,
    jpeg_encode,
)


def test_constant_gray_q100_exact():
    px = np.full((20, 13), 117, dtype=np.uint8)
    w, h, mode, out = jpeg_decode(jpeg_encode(px))
    assert (w, h, mode) == (13, 20, "L")
    np.testing.assert_array_equal(out, px)


def test_gradient_gray_q100_exact():
    px = ((np.arange(16)[:, None] + np.arange(24)[None, :]) * 3).astype(np.uint8)
    _, _, _, out = jpeg_decode(jpeg_encode(px))
    np.testing.assert_array_equal(out, px)


def test_rgb_noise_q100_tight_tolerance():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    w, h, mode, out = jpeg_decode(jpeg_encode(px))
    assert (w, h, mode) == (19, 17, "RGB")
    # only the YCbCr<->RGB float rounding remains at q100
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_lossy_quality_smooth_image():
    x = np.linspace(0, 2 * np.pi, 48)
    px = (127 + 100 * np.outer(np.sin(x), np.cos(x))).astype(np.uint8)
    enc100, enc50 = jpeg_encode(px), jpeg_encode(px, quality=50)
    assert len(enc50) < len(enc100)  # quantization actually compresses
    _, _, _, out = jpeg_decode(enc50)
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() <= 4


def test_multi_mcu_dc_prediction_chain():
    """Blocks differing only in DC level: DPCM across many MCUs must
    resynchronize exactly."""
    blocks = np.concatenate(
        [np.full((8, 8), v, dtype=np.uint8) for v in (10, 200, 60, 255, 0, 128)],
        axis=1,
    )
    _, _, _, out = jpeg_decode(jpeg_encode(blocks))
    np.testing.assert_array_equal(out, blocks)


def test_byte_stuffing_roundtrip():
    """A large noise image reliably produces 0xFF bytes in the entropy
    stream; stuffing/unstuffing must be transparent. Noise at q100 is
    within ±1 (DCT coefficients round to integers at encode), so any
    stuffing bug shows up as gross corruption, not ±1."""
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    data = jpeg_encode(px)
    _, _, _, out = jpeg_decode(data)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=32),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=15, deadline=None)
def test_gray_q100_roundtrip_property(w, h, seed):
    """Any-shape noise at q100: within the inherent ±1 coefficient-
    rounding envelope — a Huffman/DC-prediction/zigzag bug produces
    block-sized corruption, never ±1."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    got_w, got_h, mode, out = jpeg_decode(jpeg_encode(px))
    assert (got_w, got_h, mode) == (w, h, "L")
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


def test_restart_interval_roundtrip_gray_and_rgb():
    """DRI/RSTn support (ADVICE r03): an image encoded with restart
    markers every 2 MCUs — including RST index cycling past 7 —
    decodes exactly at q100; predictors reset at each marker."""
    rng = np.random.default_rng(11)
    gray = (np.arange(40)[:, None] * 2 + np.arange(48)[None, :] * 2).astype(np.uint8)
    data = jpeg_encode(gray, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI segment present
    # 5x6 blocks = 30 MCUs / interval 2 -> 14 RST markers, cycling >8
    n_rst = sum(data.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
    assert n_rst >= 14
    w, h, mode, out = jpeg_decode(data)
    np.testing.assert_array_equal(out, gray)
    rgb = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    _, _, _, out_rgb = jpeg_decode(jpeg_encode(rgb, restart_interval=3))
    base = jpeg_decode(jpeg_encode(rgb))[3]
    np.testing.assert_array_equal(out_rgb, base)  # RSTs change framing only


def test_marker_scanner_skips_fill_bytes():
    """0xFF fill bytes before a marker (ITU T.81 B.1.1.2) must not
    break the header scan — real encoders pad with them."""
    px = np.full((8, 8), 55, dtype=np.uint8)
    data = jpeg_encode(px)
    # inject two fill bytes before the DQT segment marker
    at = data.index(b"\xff\xdb")
    padded = data[:at] + b"\xff\xff" + data[at:]
    _, _, _, out = jpeg_decode(padded)
    np.testing.assert_array_equal(out, px)


def test_restart_out_of_sequence_rejected():
    px = np.full((24, 8), 99, dtype=np.uint8)  # 3 MCUs, interval 1
    data = bytearray(jpeg_encode(px, restart_interval=1))
    i = data.index(bytes([0xFF, 0xD0]))
    data[i + 1] = 0xD5  # corrupt the first RST's index
    with pytest.raises(ValueError, match="out of sequence"):
        jpeg_decode(bytes(data))


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError, match="no SOI"):
        jpeg_decode(b"GIF89a nope")
    data = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    sof_at = bytes(data).index(b"\xff\xc0")
    data[sof_at + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(data))


def test_decode_stage_routes_jpeg(spark):
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm

    px = np.full((5, 9), 33, dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(jpeg_encode(px)))]
    )
    r = mm.decode_image_metadata(df).collect()[0]
    assert r.decoder == "jpeg-numpy"
    assert (r.width, r.height, r.mode) == (9, 5, "L")


def test_jpeg_stats_stage(spark):
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm

    px = np.full((6, 4), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(doc_id=7, payload=bytearray(jpeg_encode(px)))]
    )
    r = mm.decode_jpeg_stats(df).collect()[0]
    assert (r.width, r.height, r.mode) == (4, 6, "L")
    assert r.pixel_sum == 6 * 4 * 100


def test_mixed_payload_routing(spark):
    """Heterogeneous payload column: each row must route to the codec
    its signature declares."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    decoded = mm.decode_image_metadata(mm.attach_mixed_payload(docs))
    got = {r.doc_id: r.decoder for r in decoded.collect()}
    expect = {0: "png-numpy", 1: "gif-lzw", 2: "jpeg-numpy", 3: "fake-deterministic"}
    for doc_id, decoder in got.items():
        assert decoder == expect[doc_id % 4]
