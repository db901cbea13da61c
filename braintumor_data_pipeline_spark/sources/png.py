"""Minimal pure-Python PNG codec (SURVEY X7, S9).

The reference encodes processed images with ``cv2.imencode('.png', …)``
(`/root/reference/dataflow_pipeline.py:78-81`) and decodes with
``cv2.imdecode`` (`/root/reference/gcp_utils.py:34-35`). cv2 is not
available here, so this implements the subset of the public PNG spec
(RFC 2083) the pipeline needs: 8-bit grayscale and 8-bit RGB,
non-interlaced, zlib-compressed, filter type 0.

Determinism note (SURVEY §7): PNG *bytes* differ across encoders (zlib
levels, filter choices) — correctness tests hash DECODED PIXELS, never
the byte stream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 H×W (grayscale) or H×W×3 (RGB) → PNG bytes."""
    if img.dtype != np.uint8:
        raise ValueError(f"encode_png expects uint8, got {img.dtype}")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = img.reshape(h, w * channels)
    # filter byte 0 (None) per scanline
    stream = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (grayscale H×W or RGB H×W×3). Supports
    8-bit non-interlaced gray/RGB with any of the 5 standard filters."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or color_type not in (0, 2):
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color_type} "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    channels = 1 if color_type == 0 else 3
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - channels]) if i >= channels else 0
                line[i] = (line[i] + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)
