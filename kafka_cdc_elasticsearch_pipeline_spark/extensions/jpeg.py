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

Hot-path structure (round-5 rewrite, ~5-10× over the per-bit loops
SCALING.md r04 flagged as the slowest codec family):
- all DCT/IDCT/quantization is BATCHED across every block of the
  image (one BLAS batched matmul pair), never per block;
- the encoder emits (code, nbits) token pairs per block (a few Python
  ops per nonzero coefficient) and a single vectorized packer turns
  the whole token stream into stuffed bytes (np.repeat bit expansion
  + packbits + np.insert stuffing);
- the decoder splits/destuffs the entropy stream with numpy, then
  walks it with a 16-bit LOOKAHEAD table (one uint32 window read +
  one LUT index per Huffman symbol — never per bit); coefficients
  land in a flat (blocks, 64) array that one batched IDCT finishes.

The remaining per-symbol Python loop is irreducible (Huffman codes
are sequentially dependent within an entropy segment); everything
around it is numpy. The stages run inside Arrow ``mapInPandas`` like
the other codecs: per-partition parallelism is the scale lever.
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
#: zigzag position k -> row-major flat index, and its inverse
_ZZ_FLAT = np.array([u * _N + v for (u, v) in _ZIGZAG])
_INV_ZZ = np.argsort(_ZZ_FLAT)
#: powers of two for vectorized bit_length (JPEG categories <= 15)
_POW2 = 2 ** np.arange(16, dtype=np.int64)


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

# Array-indexed encoder tables (symbol -> code/len), for O(1) lookups
# without dict hashing in the token loop.
_DC_CODE = np.zeros(16, dtype=np.uint32)
_DC_LEN = np.zeros(16, dtype=np.uint8)
for _s, (_c, _l) in _DC_ENC.items():
    _DC_CODE[_s], _DC_LEN[_s] = _c, _l
_AC_CODE = np.zeros(256, dtype=np.uint32)
_AC_LEN = np.zeros(256, dtype=np.uint8)
for _s, (_c, _l) in _AC_ENC.items():
    _AC_CODE[_s], _AC_LEN[_s] = _c, _l


def _pack_tokens(codes: list[int], lens: list[int]) -> bytes:
    """Vectorized MSB-first packer: (code, nbits) token stream ->
    1-padded, 0xFF-stuffed entropy bytes. One np.repeat bit expansion,
    one packbits, one stuffing insert — no per-bit Python."""
    if not codes:
        return b""
    c = np.asarray(codes, dtype=np.uint32)
    ln = np.asarray(lens, dtype=np.int64)
    total = int(ln.sum())
    starts = np.concatenate(([0], np.cumsum(ln)[:-1]))
    tok = np.repeat(np.arange(len(c)), ln)
    j = np.arange(total) - np.repeat(starts, ln)  # bit index within token
    bits = (c[tok] >> (ln[tok] - 1 - j)).astype(np.uint8) & 1
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])  # 1-pad
    by = np.packbits(bits)
    ff = np.flatnonzero(by == 0xFF)
    if len(ff):
        by = np.insert(by, ff + 1, 0)  # byte stuffing
    return by.tobytes()


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


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

    nc = len(comps)
    bh, bw = -(-h // _N), -(-w // _N)
    n_mcu = bh * bw
    # Batched forward path: pad -> (n_mcu, 8, 8) blocks -> one einsum
    # DCT -> quantize -> zigzag, per component; then interleave rows
    # into per-MCU component order (the scan's block order).
    zz_all = np.empty((n_mcu * nc, 64), dtype=np.int64)
    for ci, c in enumerate(comps):
        p = np.empty((bh * _N, bw * _N))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]  # replicate edges into MCU padding
        p[:, w:] = p[:, w - 1 : w]
        blocks = (
            p.reshape(bh, _N, bw, _N).transpose(0, 2, 1, 3).reshape(-1, _N, _N)
            - 128.0
        )
        coeff = np.matmul(np.matmul(_DCT_M, blocks), _DCT_M.T)
        q = np.round(coeff / qt).astype(np.int64)
        zz_all[ci::nc] = q.reshape(-1, 64)[:, _ZZ_FLAT]

    # Bulk nonzero-AC structure: values, categories and value-bit
    # payloads for every coefficient, computed once vectorized; the
    # Python loop below only sequences tokens (run lengths, ZRL, EOB).
    nz_rows, nz_cols = np.nonzero(zz_all[:, 1:])
    nz_vals = zz_all[nz_rows, nz_cols + 1]
    nz_size = np.searchsorted(_POW2, np.abs(nz_vals), side="right")
    nz_vbits = np.where(nz_vals >= 0, nz_vals, nz_vals + (1 << nz_size) - 1)
    row_lo = np.searchsorted(nz_rows, np.arange(n_mcu * nc))
    row_hi = np.searchsorted(nz_rows, np.arange(n_mcu * nc), side="right")
    nz_cols_l = nz_cols.tolist()
    nz_size_l = nz_size.tolist()
    nz_vbits_l = nz_vbits.tolist()
    dc_l = zz_all[:, 0].tolist()
    ac_code_l, ac_len_l = _AC_CODE.tolist(), _AC_LEN.tolist()
    dc_code_l, dc_len_l = _DC_CODE.tolist(), _DC_LEN.tolist()
    eob_c, eob_l = ac_code_l[0x00], ac_len_l[0x00]
    zrl_c, zrl_l = ac_code_l[0xF0], ac_len_l[0xF0]

    entropy = bytearray()
    codes: list[int] = []
    lens: list[int] = []
    pred = [0] * nc
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            entropy += _pack_tokens(codes, lens)
            entropy += bytes([0xFF, 0xD0 + rst % 8])
            codes, lens = [], []
            rst += 1
            pred = [0] * nc
        for ci in range(nc):
            bi = mcu * nc + ci
            dc = dc_l[bi]
            diff = dc - pred[ci]
            pred[ci] = dc
            s = _category(diff)
            codes.append(dc_code_l[s])
            lens.append(dc_len_l[s])
            if s:
                codes.append(_value_bits(diff, s))
                lens.append(s)
            prev = 0
            for k in range(row_lo[bi], row_hi[bi]):
                pos = nz_cols_l[k]
                run = pos - prev
                prev = pos + 1
                while run > 15:
                    codes.append(zrl_c)
                    lens.append(zrl_l)
                    run -= 16
                sz = nz_size_l[k]
                sym = (run << 4) | sz
                codes.append(ac_code_l[sym])
                lens.append(ac_len_l[sym])
                codes.append(nz_vbits_l[k])
                lens.append(sz)
            if prev < 63:
                codes.append(eob_c)
                lens.append(eob_l)
    entropy += _pack_tokens(codes, lens)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_qt = bytes([0]) + bytes(int(qt[u, v]) for (u, v) in _ZIGZAG)
    out += _seg(0xFFDB, zz_qt)  # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # 4:4:4, quant table 0
    out += _seg(0xFFC0, sof)  # SOF0 baseline
    out += _seg(0xFFC4, _dht_payload(0x00, _DC_BITS, _DC_VALS))  # DC table 0
    out += _seg(0xFFC4, _dht_payload(0x10, _AC_BITS, _AC_VALS))  # AC table 0
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------

#: (bits, vals) -> 16-bit lookahead table, cached across images —
#: files from one encoder (ours included) share tables, so the LUT
#: build cost is paid once per table, not per image. The table is a
#: plain Python list of (symbol << 8 | code_length) — ONE list index
#: per Huffman symbol in the decode loop (numpy scalar indexing plus
#: two int() casts measured ~40% slower per symbol); 0 marks an
#: invalid prefix.
_LUT_CACHE: dict[bytes, list[int]] = {}


def _build_lut(bits: list[int], vals: list[int]) -> list[int]:
    """16-bit lookahead decode table: peek16 -> symbol << 8 | length."""
    key = bytes(bits) + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    packed = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            packed[lo:hi] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    lut = packed.tolist()
    if len(_LUT_CACHE) >= 64:  # bounded: tables are tiny and few
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = lut
    return lut


def _split_entropy(entropy: bytes) -> list[tuple[bytes, int | None]]:
    """Split the raw entropy stream at RSTn markers (skipping 0xFF
    fill bytes preceding them): [(segment_bytes, rst_index|None)];
    the final segment carries None."""
    raw = np.frombuffer(entropy, dtype=np.uint8)
    if len(raw) < 2:
        return [(entropy, None)]
    ff = np.flatnonzero(raw[:-1] == 0xFF)
    nxt = raw[ff + 1]
    rst_pos = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]
    segs: list[tuple[bytes, int | None]] = []
    start = 0
    for p in rst_pos.tolist():
        end = p
        # markers may be preceded by 0xFF fill bytes (T.81 B.1.1.2)
        while end > start and raw[end - 1] == 0xFF:
            end -= 1
        segs.append((entropy[start:end], int(raw[p + 1]) - 0xD0))
        start = p + 2
    segs.append((entropy[start:], None))
    return segs


def _destuff(seg: bytes) -> bytes:
    """Remove the 0x00 stuffed after each entropy 0xFF (vectorized);
    any 0xFF followed by something else inside a segment is a marker
    that has no business here."""
    a = np.frombuffer(seg, dtype=np.uint8)
    if len(a) < 2:
        return seg
    ffp = np.flatnonzero(a[:-1] == 0xFF)
    if len(ffp) == 0:
        return seg
    if np.any(a[ffp + 1] != 0x00):
        raise ValueError("unexpected marker inside entropy data")
    return np.delete(a, ffp + 1).tobytes()


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
    dc_tables: dict[int, list[int]] = {}
    ac_tables: dict[int, list[int]] = {}
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
                table = _build_lut(bits, vals)
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
    w, h, comps = frame
    nc = len(comps)
    bh, bw = -(-h // _N), -(-w // _N)
    n_mcu = bh * bw

    segs = _split_entropy(data[pos:end])
    if restart_interval:
        expected = -(-n_mcu // restart_interval)
        if len(segs) < expected:
            raise ValueError("expected restart marker")
        if len(segs) > expected:
            raise ValueError("unexpected marker inside entropy data")
    elif len(segs) > 1:
        raise ValueError("unexpected marker inside entropy data")

    dc_lut = [dc_tables[scan[ci][1] >> 4] for ci in range(nc)]
    ac_lut = [ac_tables[scan[ci][1] & 0x0F] for ci in range(nc)]

    # Coefficients accumulate as (flat index, value) Python lists — one
    # vectorized scatter at the end beats a numpy scalar setitem per
    # coefficient by ~2×.
    idxs: list[int] = []
    vals_out: list[int] = []
    mcu = 0
    for si, (segbytes, rst_n) in enumerate(segs):
        if rst_n is not None and rst_n != si % 8:
            raise ValueError(
                f"restart marker out of sequence: RST{rst_n},"
                f" expected RST{si % 8}"
            )
        seg = _destuff(segbytes)
        # 32-bit sliding window per byte offset: one index + shift per
        # peek, for both the 16-bit Huffman lookahead and value bits.
        b = np.frombuffer(seg + b"\x00\x00\x00", dtype=np.uint8).astype(np.uint32)
        u = ((b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]).tolist()
        nbits = len(seg) * 8
        bp = 0
        pred = [0] * nc
        n_here = (
            min(restart_interval, n_mcu - mcu) if restart_interval else n_mcu
        )
        for _ in range(n_here):
            for ci in range(nc):
                row64 = (mcu * nc + ci) << 6
                dlut = dc_lut[ci]
                alut = ac_lut[ci]
                if bp >= nbits:
                    raise ValueError("entropy stream truncated")
                word = u[bp >> 3]
                e = dlut[(word >> (16 - (bp & 7))) & 0xFFFF]
                if e == 0:
                    raise ValueError("invalid Huffman code")
                s = e >> 8
                bp += e & 0xFF
                if s:
                    word = u[bp >> 3]
                    v = (word >> (32 - s - (bp & 7))) & ((1 << s) - 1)
                    bp += s
                    # inline _extend: negative values arrive as
                    # (v + 2^s - 1) with the top bit clear
                    pred[ci] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                if bp > nbits:
                    raise ValueError("entropy stream truncated")
                idxs.append(row64)
                vals_out.append(pred[ci])
                i = 1
                while i < 64:
                    if bp >= nbits:
                        raise ValueError("entropy stream truncated")
                    word = u[bp >> 3]
                    e = alut[(word >> (16 - (bp & 7))) & 0xFFFF]
                    if e == 0:
                        raise ValueError("invalid Huffman code")
                    sym = e >> 8
                    bp += e & 0xFF
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    i += run
                    if i >= 64:
                        raise ValueError("AC run past block end")
                    word = u[bp >> 3]
                    v = (word >> (32 - size - (bp & 7))) & ((1 << size) - 1)
                    bp += size
                    if bp > nbits:
                        raise ValueError("entropy stream truncated")
                    idxs.append(row64 + i)
                    vals_out.append(
                        v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    )
                    i += 1
            mcu += 1

    zz_all = np.zeros(n_mcu * nc * 64, dtype=np.int64)
    if idxs:
        zz_all[idxs] = vals_out
    zz_all = zz_all.reshape(-1, 64)

    # Batched inverse path: inverse zigzag -> dequantize -> one einsum
    # IDCT per component -> reassemble planes.
    planes = []
    for ci in range(nc):
        _cid, tq = comps[ci]
        flat = zz_all[ci::nc][:, _INV_ZZ].astype(np.float64)
        coeff = flat.reshape(-1, _N, _N) * qts[tq]
        block = np.matmul(np.matmul(_DCT_M.T, coeff), _DCT_M) + 128.0
        plane = (
            block.reshape(bh, bw, _N, _N).transpose(0, 2, 1, 3).reshape(bh * _N, bw * _N)
        )
        planes.append(plane[:h, :w])

    if nc == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, "L", out
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, "RGB", np.clip(np.round(rgb), 0, 255).astype(np.uint8)
