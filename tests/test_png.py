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
