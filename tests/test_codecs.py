"""PNG + DICOM codec tests (SURVEY S3, S9, X7)."""

from __future__ import annotations

import numpy as np
import pytest

from braintumor_data_pipeline_spark.sources.dicom import dcmread, dcmwrite
from braintumor_data_pipeline_spark.sources.png import decode_png, encode_png


def test_png_roundtrip_gray():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(33, 47), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(16, 21, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_rejects_non_uint8():
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.int16))


def test_dicom_roundtrip_int16_with_window():
    rng = np.random.RandomState(3)
    px = rng.randint(-500, 3000, size=(32, 32)).astype(np.int16)
    blob = dcmwrite(
        px,
        patient_id="P001",
        study_uid="1.2.3",
        series_uid="1.2.3.4",
        sop_uid="1.2.3.4.5",
        modality="CT",
        window_center=[40.0, 80.0],  # MultiValue → first element wins
        window_width=[400.0, 200.0],
    )
    ds = dcmread(blob)
    assert np.array_equal(ds.pixel_array, px)
    assert ds.PatientID == "P001"
    assert ds.StudyInstanceUID == "1.2.3"
    assert ds.Modality == "CT"
    assert ds.window_center == [40.0, 80.0]
    assert ds.window_width == [400.0, 200.0]


def test_dicom_empty_patient_and_no_window():
    px = np.zeros((8, 8), dtype=np.uint8)
    ds = dcmread(dcmwrite(px, patient_id=""))
    assert ds.PatientID == ""
    assert ds.window_center is None
    assert ds.window_width is None
    assert np.array_equal(ds.pixel_array, px)


def test_dicom_without_preamble_like_force_true():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = dcmwrite(px)
    assert dcmread(blob[132:]).pixel_array.shape == (8, 8)
