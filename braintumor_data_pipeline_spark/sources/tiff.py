"""Uncompressed baseline TIFF reader/writer in pure numpy.

Covers the S5 gap's second format (`/root/reference/app.py:77-90`
accepts ``.tif`` uploads via PIL): TIFF 6.0 baseline, uncompressed
(Compression=1), 8-bit grayscale or RGB, strip-based, either byte
order. Compressed variants (LZW/Deflate/PackBits) raise ``ValueError``
— different codecs, out of scope for a no-external-libs environment.
"""

from __future__ import annotations

import struct

import numpy as np

# Baseline tag ids
_W, _H = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PX = 273, 277
_ROWS_PER_STRIP, _STRIP_COUNTS = 278, 279
_PLANAR = 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd_values(data: bytes, endian: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        payload = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        payload = data[off : off + total]
    if typ in (3,):  # SHORT
        return list(struct.unpack(endian + "H" * count, payload))
    if typ in (4,):  # LONG
        return list(struct.unpack(endian + "I" * count, payload))
    if typ in (1,):  # BYTE
        return list(payload)
    return None


def decode_tiff(data: bytes) -> np.ndarray:
    """Uncompressed 8-bit TIFF → (h, w) gray or (h, w, s) array."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    (n_entries,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(endian + "HHI", data[e : e + 8])
        vals = _read_ifd_values(data, endian, typ, count, data[e + 8 : e + 12])
        if vals is not None:
            tags[tag] = vals
    try:
        w = tags[_W][0]
        h = tags[_H][0]
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_COUNTS]
    except KeyError as exc:
        raise ValueError(f"missing required TIFF tag: {exc}") from exc
    compression = tags.get(_COMPRESSION, [1])[0]
    if compression != 1:
        raise ValueError(
            f"compressed TIFF (Compression={compression}) unsupported — "
            "only baseline uncompressed is implemented"
        )
    spp = tags.get(_SAMPLES_PER_PX, [1])[0]
    bits = tags.get(_BITS, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported BitsPerSample {bits}")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise ValueError("planar (non-chunky) TIFF unsupported")
    body = b"".join(
        data[o : o + c] for o, c in zip(offsets, counts)
    )
    arr = np.frombuffer(body, dtype=np.uint8, count=h * w * spp)
    out = arr.reshape(h, w, spp) if spp > 1 else arr.reshape(h, w)
    # PhotometricInterpretation 0 = WhiteIsZero → invert to the usual
    if spp == 1 and tags.get(_PHOTOMETRIC, [1])[0] == 0:
        out = 255 - out
    return out.copy()


def encode_tiff(img: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, 3) → little-endian uncompressed TIFF."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_tiff expects uint8")
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    body = img.tobytes()
    # layout: header(8) | body | BitsPerSample array (if rgb) | IFD
    body_off = 8
    extra_off = body_off + len(body)
    extra = b""
    if spp == 3:
        bits_vals_off = extra_off
        extra = struct.pack("<HHH", 8, 8, 8)
    ifd_off = extra_off + len(extra)

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(_W, 4, 1, w),
        entry(_H, 4, 1, h),
        (
            entry(_BITS, 3, 3, bits_vals_off)
            if spp == 3
            else entry(_BITS, 3, 1, 8)
        ),
        entry(_COMPRESSION, 3, 1, 1),
        entry(_PHOTOMETRIC, 3, 1, 2 if spp == 3 else 1),
        entry(_STRIP_OFFSETS, 4, 1, body_off),
        entry(_SAMPLES_PER_PX, 3, 1, spp),
        entry(_ROWS_PER_STRIP, 4, 1, h),
        entry(_STRIP_COUNTS, 4, 1, len(body)),
        entry(_PLANAR, 3, 1, 1),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00" * 4
    header = b"II*\x00" + struct.pack("<I", ifd_off)
    return header + body + extra + ifd
