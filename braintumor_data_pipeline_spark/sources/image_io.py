"""Generic image decode dispatch (SURVEY S5) — the engine's analog of
`Image.open(...).convert('RGB')` / `cv2.imdecode`
(`/root/reference/app.py:85`, `preprocessor.py:68-71`,
`gcp_utils.py:34-36`).

Formats are detected by magic bytes: PNG, BMP, baseline JPEG (SOF0,
any ≤2× chroma subsampling, restart markers — sources/jpeg.py) and
uncompressed TIFF (sources/tiff.py) decode natively in pure
numpy/Python from the public specs; DICOM and NIfTI route to their
readers. Progressive JPEG and compressed TIFF raise ``ValueError``.
"""

from __future__ import annotations

import struct

import numpy as np

from .dicom import dcmread
from .nifti import middle_slice, read_nifti
from .png import decode_png


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 8-bit (grayscale palette) or 24-bit BMP → array.
    24-bit returns RGB (BMP stores BGR bottom-up)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError("compressed BMP unsupported")
    flip = h > 0
    h = abs(h)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            row = np.frombuffer(
                data, dtype=np.uint8, count=w * 3, offset=pixel_off + y * stride
            ).reshape(w, 3)
            out[h - 1 - y if flip else y] = row[:, ::-1]  # BGR → RGB
        return out
    if bpp == 8:
        stride = (w + 3) & ~3
        out = np.zeros((h, w), dtype=np.uint8)
        for y in range(h):
            row = np.frombuffer(
                data, dtype=np.uint8, count=w, offset=pixel_off + y * stride
            )
            out[h - 1 - y if flip else y] = row
        return out
    raise ValueError(f"unsupported BMP depth {bpp}")


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BMP writer (test fixtures)."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (stride - len(row))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def decode_image(data: bytes) -> np.ndarray:
    """Magic-byte dispatch → decoded array. 3-D medical volumes reduce to
    their middle slice, mirroring `preprocessor.py:56-58`."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if len(data) > 132 and data[128:132] == b"DICM":
        return dcmread(data).pixel_array
    if data[:2] == b"\x1f\x8b" or (
        len(data) >= 348 and data[344:348] in (b"n+1\x00", b"ni1\x00")
    ):
        return middle_slice(read_nifti(data))
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        return decode_tiff(data)
    raise ValueError("unrecognized image format")
