"""Minimal GIF codec (GIF89a, single frame) — pure Python/numpy.

Second real image format next to png.py, exercising a genuinely
different compression family: GIF is LZW over palette indices (vs
PNG's deflate over filtered truecolor scanlines). Both directions are
implemented independently — the encoder runs the dictionary-building
compressor, the decoder the table-reconstruction decompressor with
the KwKwK special case, variable code widths (up to 12 bits,
LSB-first packing), clear-code resets and sub-block reassembly — so a
round-trip is a real cross-check, and the test suite additionally
feeds the decoder a hand-built "uncompressed GIF" stream (clear code
before every literal) it could never have produced itself.

Scope: 8-bit global palette, one image, no interlace, no animation
extensions (a frame-sampled video pipeline treats animation as the
container concern anyway — see video.py for the container walk).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIG = b"GIF89a"
_MAX_WIDTH = 12


class _BitWriter:
    """LSB-first bit packer (the GIF LZW byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.cur |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.cur & ((1 << width) - 1)
        self.cur >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()

    def reset():
        return {bytes([i]): i for i in range(1 << mcs)}, eoi + 1, mcs + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << width) and width < _MAX_WIDTH:
            width += 1
        elif next_code == (1 << _MAX_WIDTH):
            bw.write(clear, width)
            table, next_code, width = reset()
        w = bytes([b])
    if w:
        bw.write(table[w], width)
    bw.write(eoi, width)
    return bw.finish()


def _lzw_decode(data: bytes, mcs: int, expect: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    br = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    next_code = eoi + 1
    w: bytes | None = None

    def reset_table():
        return [bytes([i]) for i in range(1 << mcs)] + [b"", b""]

    table = reset_table()
    while len(out) < expect:
        code = br.read(width)
        if code == clear:
            table = reset_table()
            next_code = eoi + 1
            width = mcs + 1
            w = None
            continue
        if code == eoi:
            break
        if w is None:
            if code >= len(table):
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < next_code and code < len(table):
            entry = table[code]
        elif code == next_code:
            entry = w + w[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range (next={next_code})")
        out.extend(entry)
        if w is not None and next_code < (1 << _MAX_WIDTH):
            table.append(w + entry[:1])
            next_code += 1
            if next_code >= (1 << width) and width < _MAX_WIDTH:
                width += 1
        w = entry
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def gif_encode(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 index array over an (n, 3) uint8 palette
    (n a power of two, 2..256) into a single-frame GIF89a."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = len(pal)
    depth = max(1, int(n - 1).bit_length())
    if n != 1 << depth:
        raise ValueError("palette size must be a power of two")
    mcs = max(2, depth)
    out = bytearray()
    out += GIF_SIG
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(mcs)
    out += _sub_blocks(_lzw_encode(idx.tobytes(), mcs))
    out.append(0x3B)  # trailer
    return bytes(out)


def gif_decode(data: bytes):
    """Decode a single-frame GIF -> (width, height, palette[n,3],
    indices[h,w]). Raises ValueError on non-GIF / unsupported
    (interlaced, local-palette) variants."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ipacked & 0x80:
                raise ValueError("local color tables not supported")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            raw = _lzw_decode(bytes(lzw), mcs, iw * ih)
            if len(raw) != iw * ih:
                raise ValueError(f"decoded {len(raw)} pixels, expected {iw * ih}")
            idx = np.frombuffer(raw, dtype=np.uint8).reshape(ih, iw)
            return iw, ih, palette, idx
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image data in GIF")
