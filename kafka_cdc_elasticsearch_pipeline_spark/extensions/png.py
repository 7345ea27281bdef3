"""Minimal PNG codec on stdlib zlib + numpy — no imaging library.

The harness ships no PIL/opencv, but PNG itself is just deflate +
per-scanline byte filters (public spec, RFC 2083), so the *decode*
stage of the multimodal pipeline can be real for PNG payloads instead
of a stub: parse chunks (CRC-verified), inflate IDAT, undo filters
0-4, yield true (width, height, mode) + pixels.

Scope: 8-bit depth, color types 0 (gray) / 2 (RGB) / 6 (RGBA),
non-interlaced — the shapes a training-data pipeline normalizes to
anyway. Baseline JPEG has its own codec (jpeg.py); unrecognized
payloads keep the clearly-labeled deterministic fake
(multimodal.py).

The per-scanline unfilter loop is sequential BY SPEC (filters 1/3/4
predict from the already-reconstructed left neighbor), so rows can't
vectorize across bytes; cost is O(bytes) per image and lives inside an
Arrow-batched ``mapInPandas`` stage — per-partition parallelism is the
scale lever, exactly like a real decoder fleet.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CTYPE_CH = {0: 1, 2: 3, 6: 4}
_CH_CTYPE = {1: 0, 3: 2, 4: 6}
_CH_MODE = {1: "L", 3: "RGB", 4: "RGBA"}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(pixels: np.ndarray, filter_cycle: tuple[int, ...] = (0, 1, 2, 3, 4)) -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array; scanline filter
    types cycle through ``filter_cycle`` so a round-trip exercises
    every unfilter branch."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = _CH_CTYPE[ch]
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        row = flat[r]
        ft = filter_cycle[r % len(filter_cycle)]
        raw.append(ft)
        if ft == 0:
            enc = row
        elif ft == 2:  # Up
            enc = (row - prev) % 256
        else:  # Sub / Average / Paeth need the left neighbor
            enc = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                enc[i] = (row[i] - pred) % 256
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """Decode to (width, height, mode, pixels[h, w, ch] uint8).
    Raises ValueError on non-PNG, bad CRC, or out-of-scope variants."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, dims = 8, [], None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if ctype not in _CTYPE_CH:
                raise ValueError(f"unsupported color type {ctype} (0/2/6 only)")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            dims = (w, h, _CTYPE_CH[ctype])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if dims is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, ch = dims
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        off = r * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)

                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out[r] = cur
        prev = cur
    return w, h, _CH_MODE[ch], out.reshape(h, w, ch)
