"""Minimal pure-Python NIfTI-1 reader (SURVEY S4).

The reference loads NIfTI volumes with SimpleITK and keeps only the
middle axial slice (`/root/reference/preprocessor.py:48-66`:
``middle_slice = volume.shape[0] // 2``). SimpleITK isn't available
here; this implements the subset of the public NIfTI-1 spec
(https://nifti.nimh.nih.gov/nifti-1) the pipeline needs: the 348-byte
header, scalar dtypes, optional gzip container, C/Fortran dim order.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
}


def read_nifti(data: bytes) -> np.ndarray:
    """NIfTI-1 bytes (optionally gzipped) → volume array (z, y, x)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if len(data) < 348:
        raise ValueError("truncated NIfTI header")
    (sizeof_hdr,) = struct.unpack("<i", data[:4])
    endian = "<"
    if sizeof_hdr != 348:
        (sizeof_hdr,) = struct.unpack(">i", data[:4])
        if sizeof_hdr != 348:
            raise ValueError("not a NIfTI-1 file")
        endian = ">"
    dim = struct.unpack(f"{endian}8h", data[40:56])
    ndim = dim[0]
    if not 1 <= ndim <= 7:
        raise ValueError(f"bad ndim {ndim}")
    shape = tuple(dim[1 : 1 + ndim])
    (datatype,) = struct.unpack(f"{endian}h", data[70:72])
    (vox_offset,) = struct.unpack(f"{endian}f", data[108:112])
    magic = data[344:348]
    if magic not in (b"n+1\x00", b"ni1\x00"):
        raise ValueError(f"bad NIfTI magic {magic!r}")
    if datatype not in _DTYPES:
        raise ValueError(f"unsupported datatype {datatype}")
    dt = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
    n = int(np.prod(shape))
    off = int(vox_offset) if magic == b"n+1\x00" else 0
    arr = np.frombuffer(data, dtype=dt, count=n, offset=off)
    # NIfTI stores Fortran order (x fastest); return as (z, y, x)
    return arr.reshape(shape[::-1])


def middle_slice(volume: np.ndarray) -> np.ndarray:
    """The reference's 3-D → 2-D reduction: volume[shape[0]//2]
    (`preprocessor.py:56-58`)."""
    if volume.ndim == 2:
        return volume
    return volume[volume.shape[0] // 2]


def write_nifti(volume: np.ndarray) -> bytes:
    """Minimal single-file (.nii) writer for test fixtures."""
    dtype_code = {v: k for k, v in _DTYPES.items()}[
        np.dtype(volume.dtype).type
    ]
    shape_zyx = volume.shape
    shape_xyz = shape_zyx[::-1]
    dim = [len(shape_xyz)] + list(shape_xyz) + [1] * (7 - len(shape_xyz))
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, dtype_code)
    struct.pack_into("<h", hdr, 72, np.dtype(volume.dtype).itemsize * 8)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    hdr[344:348] = b"n+1\x00"
    body = volume.astype(volume.dtype.newbyteorder("<"), copy=False).tobytes()
    return bytes(hdr) + b"\x00" * 4 + body
