"""Baseline JPEG codec (JFIF, sequential DCT) — pure numpy, no
imaging library. Completes the media-decode set (png.py deflate,
gif.py LZW) with the entropy-coded transform family: Huffman + DPCM
DC / run-length AC over quantized 8x8 DCT blocks.

Self-describing by construction: the DQT (quantization) and DHT
(Huffman) segments we emit carry our own deterministic tables — the
JPEG container is designed for that, so no spec-appendix constants
are transcribed, and the decoder honors whatever tables the file
declares (it decodes any baseline 8-bit stream whose tables are in
the file, ours or not).

Scope: baseline sequential, 8-bit, grayscale (1 component) or YCbCr
4:4:4 (3 components, no subsampling), no progressive mode. Restart
intervals ARE supported (DRI + RSTn markers, encode and decode) and
the marker scanner skips 0xFF fill bytes — both appear routinely in
third-party baseline files (ADVICE r03). Lossiness: at quality=100
every quantizer step is
1, so a CONSTANT block round-trips exactly (its DCT is a single
integer DC coefficient) — which is what gives the oracle gate an
exact arithmetic target; general images round-trip within a small
tolerance (checked by tests, as for any JPEG implementation).

The per-block Python loops live inside Arrow ``mapInPandas`` stages
like the other codecs: per-partition parallelism is the scale lever.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT machinery -------------------------------------------------------

_N = 8


def _dct_matrix() -> np.ndarray:
    m = np.zeros((_N, _N))
    for u in range(_N):
        c = np.sqrt(1.0 / _N) if u == 0 else np.sqrt(2.0 / _N)
        for x in range(_N):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / (2 * _N))
    return m


_DCT_M = _dct_matrix()


def _zigzag_order() -> list[tuple[int, int]]:
    """Generate the standard zigzag walk programmatically."""
    order = []
    for s in range(2 * _N - 1):
        diag = [(s - j, j) for j in range(s + 1) if 0 <= s - j < _N and 0 <= j < _N]
        order.extend(diag if s % 2 == 1 else diag[::-1])
    return order


_ZIGZAG = _zigzag_order()


def quant_table(quality: int = 100) -> np.ndarray:
    """Deterministic quantization table: all-ones at quality 100
    (lossless-after-rounding for constant blocks); below that, a
    frequency-weighted ramp. Carried in the file's DQT segment."""
    if quality >= 100:
        return np.ones((_N, _N), dtype=np.int32)
    base = 1 + np.add.outer(np.arange(_N), np.arange(_N)) * 2
    scale = max(1, (100 - quality))
    return np.clip(base * scale // 10 + 1, 1, 255).astype(np.int32)


# --- Huffman tables (ours, canonical, declared via DHT) ----------------------
# DC: 12 category symbols (0..11), all 4-bit codes.
# AC: the 162 baseline symbols (EOB, ZRL, run 0-15 x size 1-10), all
# 8-bit codes. Canonical assignment never reaches the all-ones code.

_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriterMSB:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)
                self.cur = 0
                self.nbits = 0

    def flush_align(self) -> None:
        """Pad the current byte with 1-bits and emit it (the byte
        alignment required before a restart marker)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.cur = (self.cur << pad) | ((1 << pad) - 1)  # pad with 1s
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
            self.cur = 0
            self.nbits = 0

    def write_marker(self, m: int) -> None:
        """Emit a raw marker (NOT byte-stuffed — markers are how the
        decoder finds restart points in the entropy stream)."""
        self.out += bytes([0xFF, m])

    def finish(self) -> bytes:
        self.flush_align()
        return bytes(self.out)


class _BitReaderMSB:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> int:
        """Byte-align and consume one RSTn marker (skipping 0xFF fill
        bytes); returns n in 0..7 for the cycle check."""
        self.nbits = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # fill byte
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"expected RSTn marker, got {m:#04x}")
        self.pos += 2
        return m - 0xD0


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# --- segments ----------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th] + bits + vals)


# --- encoder -----------------------------------------------------------------


def jpeg_encode(
    pixels: np.ndarray, quality: int = 100, restart_interval: int = 0
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as
    baseline JFIF with 4:4:4 sampling and our declared tables.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (byte-aligned, DC predictors reset) every that-many MCUs — the
    error-resilience feature real encoders use, and the fixture for
    the decoder's restart support."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qt = quant_table(quality)

    if gray:
        comps = [px.astype(np.float64)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [y, cb, cr]

    bh, bw = -(-h // _N), -(-w // _N)
    padded = []
    for c in comps:
        p = np.empty((bh * _N, bw * _N))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]  # replicate edges into MCU padding
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p)

    bwtr = _BitWriterMSB()
    pred = [0] * len(comps)
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwtr.flush_align()
                bwtr.write_marker(0xD0 + rst % 8)
                rst += 1
                pred = [0] * len(comps)
            mcu += 1
            for ci, c in enumerate(padded):
                block = c[by * _N : (by + 1) * _N, bx * _N : (bx + 1) * _N] - 128.0
                coeff = _DCT_M @ block @ _DCT_M.T
                q = np.round(coeff / qt).astype(np.int64)
                # DC (DPCM)
                diff = int(q[0, 0]) - pred[ci]
                pred[ci] = int(q[0, 0])
                s = _category(diff)
                code, ln = _DC_ENC[s]
                bwtr.write(code, ln)
                if s:
                    bwtr.write(_value_bits(diff, s), s)
                # AC (RLE + ZRL + EOB)
                zz = [int(q[u, v]) for (u, v) in _ZIGZAG[1:]]
                run = 0
                last_nz = max((i for i, v in enumerate(zz) if v != 0), default=-1)
                for i, v in enumerate(zz):
                    if i > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = _AC_ENC[0xF0]
                        bwtr.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = _AC_ENC[(run << 4) | s]
                    bwtr.write(code, ln)
                    bwtr.write(_value_bits(v, s), s)
                    run = 0
                if last_nz < len(zz) - 1:
                    code, ln = _AC_ENC[0x00]
                    bwtr.write(code, ln)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_qt = bytes([0]) + bytes(int(qt[u, v]) for (u, v) in _ZIGZAG)
    out += _seg(0xFFDB, zz_qt)  # DQT id 0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 4:4:4, quant table 0
    out += _seg(0xFFC0, sof)  # SOF0 baseline
    out += _seg(0xFFC4, _dht_payload(0x00, _DC_BITS, _DC_VALS))  # DC table 0
    out += _seg(0xFFC4, _dht_payload(0x10, _AC_BITS, _AC_VALS))  # AC table 0
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += bwtr.finish()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReaderMSB, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def jpeg_decode(data: bytes):
    """Decode baseline JFIF -> (width, height, mode, pixels uint8).
    mode 'L' (1 comp) or 'RGB' (3 comps, 4:4:4). Honors the tables
    declared in the stream, skips 0xFF fill bytes between segments,
    and handles DRI/RSTn restart intervals; raises ValueError on
    non-JPEG / progressive / subsampled input."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    scan = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # Markers may be preceded by any number of 0xFF fill bytes
        # (ITU T.81 §B.1.1.2) — real encoders pad with them.
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq_tq = body[i]
                if pq_tq >> 4 != 0:
                    raise ValueError("16-bit quant tables not supported")
                vals = list(body[i + 1 : i + 65])
                qt = np.zeros((_N, _N), dtype=np.int32)
                for v, (u, x) in zip(vals, _ZIGZAG):
                    qt[u, x] = v
                qts[pq_tq & 0x0F] = qt
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                table = _build_decode_table(bits, vals)
                if tc_th >> 4 == 0:
                    dc_tables[tc_th & 0x0F] = table
                else:
                    ac_tables[tc_th & 0x0F] = table
                i += 17 + nv
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise ValueError("subsampled JPEG not supported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")

    # entropy data runs until the EOI marker
    end = data.rfind(b"\xff\xd9")
    br = _BitReaderMSB(data[pos:end])
    w, h, comps = frame
    nc = len(comps)
    bh, bw = -(-h // _N), -(-w // _N)
    planes = [np.zeros((bh * _N, bw * _N)) for _ in range(nc)]
    pred = [0] * nc
    mcu = 0
    rst_expect = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                n = br.restart()
                if n != rst_expect % 8:
                    raise ValueError(
                        f"restart marker out of sequence: RST{n},"
                        f" expected RST{rst_expect % 8}"
                    )
                rst_expect += 1
                pred = [0] * nc
            mcu += 1
            for ci in range(nc):
                _cid, tq = comps[ci]
                dc_t = dc_tables[scan[ci][1] >> 4]
                ac_t = ac_tables[scan[ci][1] & 0x0F]
                qt = qts[tq]
                q = np.zeros((_N, _N), dtype=np.int64)
                s = _read_symbol(br, dc_t)
                diff = _extend(br.read_bits(s), s) if s else 0
                pred[ci] += diff
                q[0, 0] = pred[ci]
                i = 1
                while i < 64:
                    sym = _read_symbol(br, ac_t)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    i += run
                    if i >= 64:
                        raise ValueError("AC run past block end")
                    u, v = _ZIGZAG[i]
                    q[u, v] = _extend(br.read_bits(size), size)
                    i += 1
                coeff = q * qt
                block = _DCT_M.T @ coeff @ _DCT_M + 128.0
                planes[ci][by * _N : (by + 1) * _N, bx * _N : (bx + 1) * _N] = block

    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, "L", out
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, "RGB", np.clip(np.round(rgb), 0, 255).astype(np.uint8)
