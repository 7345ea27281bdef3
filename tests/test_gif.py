"""GIF codec (extensions/gif.py): LZW round-trips, the KwKwK edge,
12-bit dictionary overflow with mid-stream clear, and an
independently hand-built 'uncompressed GIF' stream the encoder could
never produce."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_cdc_elasticsearch_pipeline_spark.extensions.gif import (
    _BitWriter,
    _sub_blocks,
    gif_decode,
    gif_encode,
)

PAL4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
PAL256 = np.arange(256 * 3, dtype=np.uint32).reshape(256, 3).astype(np.uint8)


def test_roundtrip_small():
    idx = np.array([[0, 1, 1, 0], [2, 3, 3, 2]], dtype=np.uint8)
    w, h, pal, out = gif_decode(gif_encode(idx, PAL4))
    assert (w, h) == (4, 2)
    np.testing.assert_array_equal(pal, PAL4)
    np.testing.assert_array_equal(out, idx)


def test_roundtrip_kwkwk_pattern():
    """Runs of a repeated symbol force the cScSc (KwKwK) decoder case."""
    idx = np.full((3, 50), 1, dtype=np.uint8)
    _, _, _, out = gif_decode(gif_encode(idx, PAL4))
    np.testing.assert_array_equal(out, idx)


def test_roundtrip_dictionary_overflow_resets():
    """>4096 dictionary entries: the encoder must emit a mid-stream
    CLEAR and the decoder must resynchronize."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, size=(120, 120), dtype=np.uint8)
    w, h, pal, out = gif_decode(gif_encode(idx, PAL256))
    assert (w, h) == (120, 120)
    np.testing.assert_array_equal(out, idx)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
    got_w, got_h, _, out = gif_decode(gif_encode(idx, PAL4))
    assert (got_w, got_h) == (w, h)
    np.testing.assert_array_equal(out, idx)


def test_decoder_reads_foreign_uncompressed_stream():
    """Hand-build a GIF whose LZW stream interleaves a CLEAR before
    every literal (the classic 'uncompressed GIF' trick). Our encoder
    never produces this shape, so decoding it checks the bitstream
    reader + clear handling independently of the encoder."""
    import struct

    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    mcs = 2
    clear, eoi = 4, 5
    bw = _BitWriter()
    for px in idx:
        bw.write(clear, 3)
        bw.write(px, 3)
    bw.write(eoi, 3)
    data = bytearray()
    data += b"GIF89a"
    data += struct.pack("<HHBBB", 8, 1, 0x80 | 0x11, 0, 0)
    data += PAL4.tobytes()
    data += struct.pack("<BHHHHB", 0x2C, 0, 0, 8, 1, 0)
    data.append(mcs)
    data += _sub_blocks(bw.finish())
    data.append(0x3B)
    w, h, pal, out = gif_decode(bytes(data))
    assert (w, h) == (8, 1)
    np.testing.assert_array_equal(out[0], np.array(idx, dtype=np.uint8))


def test_decoder_skips_extensions():
    """Graphic-control extensions (0x21) appear before the image in
    most real GIFs; the walker must skip them."""
    idx = np.array([[1, 2]], dtype=np.uint8)
    data = bytearray(gif_encode(idx, PAL4))
    at = bytes(data).index(0x2C, 13 + 12)  # image descriptor position
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    data[at:at] = gce
    w, h, _, out = gif_decode(bytes(data))
    assert (w, h) == (2, 1)
    np.testing.assert_array_equal(out, idx)


def test_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG? nope, neither")


def test_decode_stage_routes_gif(spark):
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm

    idx = np.array([[1, 2, 3]], dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(gif_encode(idx, PAL4)))]
    )
    r = mm.decode_image_metadata(df).collect()[0]
    assert r.decoder == "gif-lzw"
    assert (r.width, r.height, r.mode) == (3, 1, "P")


def test_gif_stats_stage(spark):
    from pyspark.sql import Row

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import multimodal as mm

    idx = np.full((6, 4), 3, dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(doc_id=9, payload=bytearray(gif_encode(idx, PAL4)))]
    )
    r = mm.decode_gif_stats(df).collect()[0]
    assert (r.width, r.height, r.n_colors) == (4, 6, 4)
    assert r.index_sum == 3 * 24
