"""Baseline JPEG (ITU-T T.81 / SOF0) codec in pure numpy.

Closes the S5 source gap (`/root/reference/app.py:85` accepts any
PIL-readable upload — JPEG first among them) without codec libraries:
everything here follows the public JPEG specification — canonical
Huffman coding over 8×8 DCT blocks, Annex K example tables for the
encoder, standard YCbCr color transform.

Decoder scope (what a baseline-compliant file may use):
- SOF0 (baseline sequential DCT, 8-bit), grayscale or 3-component YCbCr
- chroma subsampling 4:4:4 / 4:2:2 / 4:2:0 (any h/v factors ≤ 2)
- restart markers (DRI/RSTn), multiple DQT/DHT segments
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``ValueError`` — they are different coding processes, not baseline.

Encoder scope: quality-scaled Annex K quantization, 4:4:4 (no
subsampling), standard Huffman tables — enough to build deterministic
test fixtures and to round-trip the ETL path end-to-end.

The per-MCU entropy loop is Python (it is inherently sequential bit
I/O); the numeric heavy lifting (IDCT/DCT over all blocks, color
transform, upsampling) is vectorized numpy. In the engine this runs
inside ``mapInPandas`` — the distributed axis is across files, exactly
like every other decoder in this package.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# JPEG spec Annex K.1 example quantization tables (public).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K.3 example Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8×8 DCT-II basis, FIXED-POINT int64 at scale 2**18: literal values of
# round(cos((2n+1)kπ/16) · (0.5 if k else sqrt(1/8)) · 2**18). Hardcoded
# (not computed at import) and contracted in exact int64 arithmetic so the
# transform is bit-identical on every host: the float path (einsum
# optimize=True → BLAS GEMM) picks CPU-specific kernels whose summation
# order differs across microarchitectures, and the resulting last-ulp
# drift crossed pixel-rounding boundaries when the build moved boxes —
# exact integers have no order sensitivity at all. No literal sits within
# 1e-4 of a rounding tie (tests/test_codecs.py asserts this against a
# live recompute).
_DCT_SHIFT = 18
_C_INT = np.array(
    [
        [92682, 92682, 92682, 92682, 92682, 92682, 92682, 92682],
        [128553, 108982, 72820, 25571, -25571, -72820, -108982, -128553],
        [121095, 50159, -50159, -121095, -121095, -50159, 50159, 121095],
        [108982, -25571, -128553, -72820, 72820, 128553, 25571, -108982],
        [92682, -92682, -92682, 92682, 92682, -92682, -92682, 92682],
        [72820, -128553, 25571, 108982, -108982, -25571, 128553, -72820],
        [50159, -121095, 121095, -50159, -50159, 121095, -121095, 50159],
        [25571, -72820, 108982, -128553, 128553, -108982, 72820, -25571],
    ],
    dtype=np.int64,
)
# Float view only for magnitude documentation; all arithmetic uses _C_INT.
_C = _C_INT.astype(np.float64) / (1 << _DCT_SHIFT)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) integer-valued coefficient blocks → (N, 8, 8) spatial.

    Exact int64 contraction: |coef| ≤ 2047·255 < 2**19 (12-bit symbol ×
    quant entry), so stage 1 ≤ 2**19·2**18·8 = 2**40 and stage 2 ≤
    2**40·2**18·8 = 2**61 < 2**63 — no overflow; the only rounding is
    the single correctly-rounded float64 descale at the end."""
    b = np.asarray(blocks)
    bi = b.astype(np.int64) if b.dtype != np.int64 else b
    t = np.einsum("nkl,lj->nkj", bi, _C_INT)
    u = np.einsum("ki,nkj->nij", _C_INT, t)
    return u.astype(np.float64) * 2.0 ** (-2 * _DCT_SHIFT)


#: Encoder-side prescale: spatial samples are quantized to 2**-10 before
#: the integer DCT (they are integers for grayscale input but YCbCr
#: floats for color). Error ≤ 2**-11 per sample — invisible next to the
#: quantization table — and the bound chain stays in int64:
#: |sample−128|·2**10 ≤ 2**17 → stage 1 ≤ 2**17·2**18·8 = 2**38 →
#: stage 2 ≤ 2**38·2**18·8 = 2**59.
_DCT_PRESHIFT = 10


def _dct_blocks(blocks: np.ndarray) -> np.ndarray:
    bi = np.round(np.asarray(blocks) * (1 << _DCT_PRESHIFT)).astype(np.int64)
    t = np.einsum("nkl,jl->nkj", bi, _C_INT)
    u = np.einsum("ik,nkj->nij", _C_INT, t)
    return u.astype(np.float64) * 2.0 ** (
        -2 * _DCT_SHIFT - _DCT_PRESHIFT
    )


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes per the spec)
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list, values: list) -> dict:
    """(length, code) → symbol, canonical assignment (spec C.2)."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list, values: list) -> dict:
    """symbol → (code, length)."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over unstuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            # past-the-end reads pad with 1s (spec F.2.2.5 marker padding)
            self.pos += 1
            return 1
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """Spec F.2.2.1 EXTEND: map magnitude bits to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array, (h, w) gray or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at byte {pos}")
        # spec-legal 0xFF fill bytes may pad between segments (B.1.1.2)
        while pos < n and data[pos] == 0xFF and pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            # RSTn outside scan / standalone TEM — payload-less, skip
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, off).astype(np.int32)
                    off += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, off).astype(np.int32)
                    off += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (both Huffman sequential)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0}); "
                "only baseline/extended sequential Huffman is implemented"
            )
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                cnt = sum(bits)
                vals = list(seg[off + 17 : off + 17 + cnt])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + cnt
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_sel.append((cs, tables >> 4, tables & 0x0F))
            scan_start = pos + seglen
            return _decode_scan(
                data, scan_start, frame, scan_sel, qt, huff, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, start, frame, scan_sel, qt, huff, restart_interval):
    comps = frame["comps"]
    if len(scan_sel) != len(comps):
        raise ValueError(
            "non-interleaved scans unsupported (baseline files are "
            "normally single-scan interleaved)"
        )
    by_id = {c["id"]: c for c in comps}
    for cs, _, _ in scan_sel:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component id {cs}")
    order = [by_id[cs] for cs, _, _ in scan_sel]
    for (cs, td, ta), c in zip(scan_sel, order):
        c["td"], c["ta"] = td, ta
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        if (0, c["td"]) not in huff or (1, c["ta"]) not in huff:
            raise ValueError(
                f"missing Huffman table (dc {c['td']} / ac {c['ta']})"
            )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # split entropy-coded bytes on restart markers, unstuff 0xFF00
    segments = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            m = data[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next real marker ends the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    # per-component coefficient block grids
    for c in comps:
        c["bx"] = mcus_x * c["h"]
        c["by"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["by"] * c["bx"], 8, 8), dtype=np.int32)

    total_mcus = mcus_x * mcus_y
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {c["id"]: 0 for c in comps}
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for c in order:
            dc_tbl = huff.get((0, c["td"]))
            ac_tbl = huff.get((1, c["ta"]))
            if dc_tbl is None or ac_tbl is None:
                raise ValueError("missing Huffman table for scan")
            for v_blk in range(c["v"]):
                for h_blk in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    t = reader.decode_symbol(dc_tbl)
                    diff = _extend(reader.read_bits(t), t)
                    preds[c["id"]] += diff
                    zz[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    by = my * c["v"] + v_blk
                    bx = mx * c["h"] + h_blk
                    blk = np.zeros(64, dtype=np.int32)
                    blk[ZIGZAG] = zz * qt[c["tq"]]
                    c["coef"][by * c["bx"] + bx] = blk.reshape(8, 8)

    # IDCT all blocks per component (vectorized), assemble planes
    planes = []
    for c in comps:
        spatial = _idct_blocks(c["coef"].astype(np.float64)) + 128.0
        grid = spatial.reshape(c["by"], c["bx"], 8, 8)
        plane = grid.transpose(0, 2, 1, 3).reshape(c["by"] * 8, c["bx"] * 8)
        # upsample to full MCU-grid resolution, then crop to (h, w)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a quantization table (public formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _mag_bits(v: int) -> tuple[int, int]:
    """signed value → (size, magnitude-bit pattern)."""
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _encode_plane_blocks(
    plane: np.ndarray, qtab: np.ndarray, mcu: int = 8
) -> tuple[np.ndarray, int, int]:
    """plane → (quantized blocks in raster order, block rows, block cols).
    Pads (edge-replicate) to a multiple of ``mcu`` so partial MCUs fill."""
    h, w = plane.shape
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coef = _dct_blocks(blocks - 128.0)
    return np.round(coef / qtab).astype(np.int32), ph // 8, pw // 8


def _write_block(writer, zz, pred, dc_enc, ac_enc) -> int:
    """Entropy-encode one zigzagged block; returns the new DC pred."""
    size, bits = _mag_bits(int(zz[0]) - pred)
    code, length = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c2, l2 = ac_enc[0xF0]
            writer.write(c2, l2)  # ZRL
            run -= 16
        size, bits = _mag_bits(v)
        c2, l2 = ac_enc[(run << 4) | size]
        writer.write(c2, l2)
        writer.write(bits, size)
        run = 0
    if last < 63:
        c2, l2 = ac_enc[0x00]  # EOB
        writer.write(c2, l2)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JPEG bytes.

    ``subsample=True`` emits 4:2:0 (Y at full resolution, box-averaged
    half-resolution chroma — the common camera/export layout, ~2×
    smaller); default is 4:4:4. ``restart_interval=N`` emits a DRI
    segment and an RSTn marker every N MCUs (DC predictors reset,
    bitstream byte-aligned) — the error-resilience layout cameras
    write; also gives the decoder's DRI/RSTn path self-contained test
    coverage with no dependence on system-provided JPEG files."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        qtabs = [ql]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2

            def _half(p):
                pad = np.empty((eh, ew))
                pad[:h, :w] = p
                pad[h:, :w] = p[-1:, :]
                pad[:, w:] = pad[:, w - 1 : w]
                return pad.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))

            planes = [y, _half(cb), _half(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qtabs = [ql, qc, qc]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    for tid, q in enumerate([ql] if gray else [ql, qc]):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sh, sv = samps[i]
        sof += struct.pack("BBB", i + 1, (sh << 4) | sv, 0 if i == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in tables:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    encs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (nc - 1)

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    blocks, dims = [], []
    for p, q, (sh, sv) in zip(planes, qtabs, samps):
        # pad each plane so its block grid tiles the MCU grid exactly
        blk, br, bc = _encode_plane_blocks(p, q, mcu=8 * max(sh, sv))
        blocks.append(blk)
        dims.append((br, bc))

    writer = _BitWriter()
    mcus_y = dims[0][0] // samps[0][1]
    mcus_x = dims[0][1] // samps[0][0]
    preds = [0] * nc
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes(
                    [0xFF, 0xD0 + (mcu_no // restart_interval - 1) % 8]
                )
                writer = _BitWriter()
                preds = [0] * nc
            mcu_no += 1
            for ci in range(nc):
                sh, sv = samps[ci]
                br, bc = dims[ci]
                for v_blk in range(sv):
                    for h_blk in range(sh):
                        by = my * sv + v_blk
                        bx = mx * sh + h_blk
                        blk = blocks[ci][by * bc + bx]
                        zz = blk.reshape(64)[ZIGZAG]
                        preds[ci] = _write_block(
                            writer, zz, preds[ci], *encs[ci]
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
