"""Minimal pure-Python DICOM reader/writer (SURVEY S3).

The reference decodes DICOM with ``pydicom.dcmread(f, force=True)``
(`/root/reference/dataflow_pipeline.py:72-73`). pydicom is not in this
environment, so this implements the subset of the public DICOM standard
(PS3.5, Explicit VR Little Endian) the pipeline contract needs:

- 128-byte preamble + ``DICM`` magic (tolerated absent, like force=True);
- explicit-VR little-endian data elements, tags in ascending order;
- the attributes the reference's DoFn reads: PatientID, Study/Series/
  SOPInstanceUID, Modality, Rows, Columns, BitsAllocated,
  PixelRepresentation, WindowCenter/WindowWidth (DS, possibly
  multi-valued — backslash-separated per the standard), PixelData
  (uint8 or int16 little-endian).

Semantics mirrored from the reference:
- multi-valued WindowCenter/Width → FIRST element
  (`dataflow_pipeline.py:25-26`);
- absent/unparsable → None → min-max fallback path
  (`dataflow_pipeline.py:27-39`);
- empty PatientID → None hash (`dataflow_pipeline.py:90-91`).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# (group, element) tags — public DICOM dictionary
TAG_SOP_INSTANCE_UID = (0x0008, 0x0018)
TAG_MODALITY = (0x0008, 0x0060)
TAG_PATIENT_ID = (0x0010, 0x0020)
TAG_STUDY_UID = (0x0020, 0x000D)
TAG_SERIES_UID = (0x0020, 0x000E)
TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_BITS_ALLOCATED = (0x0028, 0x0100)
TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
TAG_WINDOW_CENTER = (0x0028, 0x1050)
TAG_WINDOW_WIDTH = (0x0028, 0x1051)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)

_SHORT_VRS = {b"AE", b"AS", b"AT", b"CS", b"DA", b"DS", b"DT", b"FL", b"FD",
              b"IS", b"LO", b"LT", b"PN", b"SH", b"SL", b"SS", b"ST", b"TM",
              b"UI", b"UL", b"US"}


@dataclass
class DicomDataset:
    """Parsed subset of a DICOM file — duck-typed after the slice of the
    pydicom API the reference uses (attribute access with defaults)."""

    elements: dict[tuple[int, int], tuple[bytes, bytes]] = field(
        default_factory=dict
    )  # tag -> (vr, raw value)

    # --- string attributes (reference: str(getattr(ds, name, ""))) ---
    def _str(self, tag) -> str:
        if tag not in self.elements:
            return ""
        return self.elements[tag][1].decode("ascii", "replace").rstrip("\x00 ")

    @property
    def PatientID(self) -> str:  # noqa: N802 — DICOM keyword
        return self._str(TAG_PATIENT_ID)

    @property
    def StudyInstanceUID(self) -> str:  # noqa: N802
        return self._str(TAG_STUDY_UID)

    @property
    def SeriesInstanceUID(self) -> str:  # noqa: N802
        return self._str(TAG_SERIES_UID)

    @property
    def SOPInstanceUID(self) -> str:  # noqa: N802
        return self._str(TAG_SOP_INSTANCE_UID)

    @property
    def Modality(self) -> str:  # noqa: N802
        return self._str(TAG_MODALITY)

    def get_window(self, tag) -> list[float] | None:
        """DS value(s): backslash-separated decimal strings → floats."""
        if tag not in self.elements:
            return None
        raw = self._str(tag)
        if not raw:
            return None
        try:
            return [float(p) for p in raw.split("\\")]
        except ValueError:
            return None

    @property
    def window_center(self) -> list[float] | None:
        return self.get_window(TAG_WINDOW_CENTER)

    @property
    def window_width(self) -> list[float] | None:
        return self.get_window(TAG_WINDOW_WIDTH)

    def _us(self, tag) -> int | None:
        if tag not in self.elements:
            return None
        return struct.unpack("<H", self.elements[tag][1][:2])[0]

    @property
    def pixel_array(self) -> np.ndarray:
        rows = self._us(TAG_ROWS)
        cols = self._us(TAG_COLS)
        bits = self._us(TAG_BITS_ALLOCATED) or 16
        signed = (self._us(TAG_PIXEL_REPRESENTATION) or 0) == 1
        raw = self.elements[TAG_PIXEL_DATA][1]
        if bits == 8:
            dt = np.int8 if signed else np.uint8
        else:
            dt = np.dtype("<i2") if signed else np.dtype("<u2")
        arr = np.frombuffer(raw, dtype=dt)[: rows * cols]
        return arr.reshape(rows, cols)


def dcmread(data: bytes) -> DicomDataset:
    """Parse explicit-VR little-endian DICOM bytes (preamble optional,
    like pydicom's force=True)."""
    pos = 0
    if len(data) > 132 and data[128:132] == b"DICM":
        pos = 132
    ds = DicomDataset()
    n = len(data)
    while pos + 8 <= n:
        group, elem = struct.unpack("<HH", data[pos : pos + 4])
        vr = data[pos + 4 : pos + 6]
        if vr in _SHORT_VRS:
            (length,) = struct.unpack("<H", data[pos + 6 : pos + 8])
            pos += 8
        else:  # OB/OW/UN/SQ…: 2 reserved bytes + 4-byte length
            (length,) = struct.unpack("<I", data[pos + 8 : pos + 12])
            pos += 12
        value = data[pos : pos + length]
        pos += length
        ds.elements[(group, elem)] = (vr, value)
    return ds


def _elem(tag: tuple[int, int], vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:  # even length per the standard
        value += b"\x00" if vr in (b"OB", b"UI") else b" "
    head = struct.pack("<HH", tag[0], tag[1]) + vr
    if vr in _SHORT_VRS:
        return head + struct.pack("<H", len(value)) + value
    return head + b"\x00\x00" + struct.pack("<I", len(value)) + value


def dcmwrite(
    pixels: np.ndarray,
    patient_id: str = "",
    study_uid: str = "",
    series_uid: str = "",
    sop_uid: str = "",
    modality: str = "MR",
    window_center: float | list[float] | None = None,
    window_width: float | list[float] | None = None,
) -> bytes:
    """Serialize a minimal explicit-VR-LE DICOM (test-fixture generator,
    the engine's analog of FIXTURES.md B1)."""

    def ds_val(v) -> bytes:
        if isinstance(v, (list, tuple)):
            return "\\".join(f"{x:g}" for x in v).encode()
        return f"{v:g}".encode()

    if pixels.dtype == np.uint8:
        bits, raw = 8, pixels.tobytes()
    else:
        bits, raw = 16, pixels.astype("<i2").tobytes()
    signed = 1 if pixels.dtype in (np.int16, np.int8) else 0

    body = b"".join(
        [
            _elem(TAG_SOP_INSTANCE_UID, b"UI", sop_uid.encode()),
            _elem(TAG_MODALITY, b"CS", modality.encode()),
            _elem(TAG_PATIENT_ID, b"LO", patient_id.encode()),
            _elem(TAG_STUDY_UID, b"UI", study_uid.encode()),
            _elem(TAG_SERIES_UID, b"UI", series_uid.encode()),
            _elem(TAG_ROWS, b"US", struct.pack("<H", pixels.shape[0])),
            _elem(TAG_COLS, b"US", struct.pack("<H", pixels.shape[1])),
            _elem(TAG_BITS_ALLOCATED, b"US", struct.pack("<H", bits)),
            _elem(TAG_PIXEL_REPRESENTATION, b"US", struct.pack("<H", signed)),
        ]
        + (
            [_elem(TAG_WINDOW_CENTER, b"DS", ds_val(window_center))]
            if window_center is not None
            else []
        )
        + (
            [_elem(TAG_WINDOW_WIDTH, b"DS", ds_val(window_width))]
            if window_width is not None
            else []
        )
        + [_elem(TAG_PIXEL_DATA, b"OW", raw)]
    )
    return b"\x00" * 128 + b"DICM" + body
