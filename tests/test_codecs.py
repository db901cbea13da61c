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


# ---------------------------------------------------------------------------
# Baseline JPEG (sources/jpeg.py)
# ---------------------------------------------------------------------------


class TestJpeg:
    def _gradient(self, h=37, w=53):
        yy, xx = np.mgrid[0:h, 0:w]
        return ((yy * 3 + xx * 2) % 256).astype(np.uint8)

    def test_fixed_point_dct_table_matches_cosines(self):
        """The hardcoded int64 DCT basis must be the correct rounding of
        the orthonormal cosine basis at scale 2**18, with every entry
        comfortably far from a rounding tie — so the table can never be
        silently wrong AND never depends on a host libm's last ulp."""
        import math

        from braintumor_data_pipeline_spark.sources.jpeg import (
            _C_INT,
            _DCT_SHIFT,
        )

        scale = 1 << _DCT_SHIFT
        for k in range(8):
            norm = 0.5 if k else math.sqrt(0.125)
            for n in range(8):
                v = math.cos(math.pi * (2 * n + 1) * k / 16.0) * norm * scale
                assert int(_C_INT[k, n]) == round(v)
                tie_dist = abs(abs(v) % 1.0 - 0.5)
                assert tie_dist > 1e-4, (k, n, v)

    def test_flat_image_roundtrips_exactly(self):
        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.full((24, 24), 128, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, 95)), img)

    def test_gray_gradient_tight_error_odd_size(self):
        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._gradient()
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_rgb_444_and_420_roundtrip(self):
        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        yy, xx = np.mgrid[0:37, 0:53]
        img = np.stack(
            [
                np.clip(yy * 2 + 40, 0, 255),
                np.clip(xx * 2 + 30, 0, 255),
                np.clip(120 + yy - xx, 0, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        full = decode_jpeg(encode_jpeg(img, 90, subsample=False))
        sub = decode_jpeg(encode_jpeg(img, 90, subsample=True))
        assert full.shape == sub.shape == img.shape
        assert np.abs(full.astype(int) - img.astype(int)).max() <= 6
        assert np.abs(sub.astype(int) - img.astype(int)).max() <= 12

    def test_encoder_is_deterministic_pinned(self):
        """Golden: encoder bytes and decoded pixels are pinned, so any
        codec change that alters output is caught."""
        import hashlib

        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._gradient(16, 16)
        enc = encode_jpeg(img, 90)
        assert enc == encode_jpeg(img, 90)
        dec = decode_jpeg(enc)
        # pinned hashes (regenerate deliberately if the codec changes)
        assert hashlib.md5(enc).hexdigest() == ENC_MD5
        assert hashlib.md5(dec.tobytes()).hexdigest() == DEC_MD5

    def test_progressive_rejected(self):
        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        enc = bytearray(encode_jpeg(self._gradient(16, 16), 90))
        idx = enc.find(b"\xff\xc0")
        enc[idx + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError, match="coding process"):
            decode_jpeg(bytes(enc))

    def test_restart_markers_roundtrip(self):
        """DRI/RSTn decode path, self-contained (ADVICE r2): the encoder
        now emits restart markers; restarted and plain bitstreams must
        decode to the identical pixels (DC predictor resets and byte
        alignment cancel out)."""
        import numpy as np

        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.RandomState(21)
        for img in (
            self._gradient(24, 40),                                   # gray
            rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8),    # RGB
        ):
            plain = decode_jpeg(encode_jpeg(img, 90))
            restarted_bytes = encode_jpeg(img, 90, restart_interval=2)
            assert b"\xff\xdd" in restarted_bytes  # DRI present
            assert any(
                bytes([0xFF, 0xD0 + i]) in restarted_bytes for i in range(8)
            )
            assert np.array_equal(decode_jpeg(restarted_bytes), plain)

    def test_restart_markers_with_420_subsampling(self):
        """4:2:0 + DRI/RSTn together — the common camera layout."""
        import numpy as np

        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.RandomState(22)
        img = rng.randint(0, 256, size=(33, 49, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, 85, subsample=True))
        restarted = decode_jpeg(
            encode_jpeg(img, 85, subsample=True, restart_interval=1)
        )
        assert np.array_equal(restarted, plain)

    def test_fill_bytes_and_tem_markers_skipped(self):
        """Spec-legal 0xFF fill bytes between segments and standalone
        TEM (0xFF01) markers must not abort the marker loop."""
        import numpy as np

        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._gradient(16, 16)
        enc = encode_jpeg(img, 90)
        plain = decode_jpeg(enc)
        # insert fill bytes + TEM right after SOI
        patched = enc[:2] + b"\xff\xff\xff" + b"\xff\x01" + enc[2:]
        assert np.array_equal(decode_jpeg(patched), plain)

    def test_missing_quantization_table_is_value_error(self):
        """A stream whose scan references an undefined qtable must fail
        with ValueError, not a KeyError from deep inside the decoder."""
        from braintumor_data_pipeline_spark.sources.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        enc = encode_jpeg(self._gradient(16, 16), 90)
        # strip the DQT segment (FF DB, length 67)
        idx = enc.find(b"\xff\xdb")
        stripped = enc[:idx] + enc[idx + 2 + 67 :]
        with pytest.raises(ValueError, match="quantization table"):
            decode_jpeg(stripped)


ENC_MD5 = "f5714e5335c1b6d6e13f4b5b4bf8e970"
DEC_MD5 = "e36ec303412db9a8684999b6881e86d6"


# ---------------------------------------------------------------------------
# Uncompressed TIFF (sources/tiff.py)
# ---------------------------------------------------------------------------


class TestTiff:
    def test_gray_roundtrip(self):
        from braintumor_data_pipeline_spark.sources.tiff import (
            decode_tiff,
            encode_tiff,
        )

        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, size=(11, 7), dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(img)), img)

    def test_rgb_roundtrip(self):
        from braintumor_data_pipeline_spark.sources.tiff import (
            decode_tiff,
            encode_tiff,
        )

        rng = np.random.RandomState(10)
        img = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(img)), img)

    def test_big_endian_and_white_is_zero(self):
        """Hand-built MM (big-endian) file with PhotometricInterpretation
        WhiteIsZero → values invert."""
        import struct as st

        from braintumor_data_pipeline_spark.sources.tiff import decode_tiff

        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        body = img.tobytes()
        entries = []

        def entry(tag, typ, count, value):
            entries.append(st.pack(">HHII", tag, typ, count, value))

        entry(256, 4, 1, 4)
        entry(257, 4, 1, 3)
        entry(258, 3, 1, 8 << 16)  # SHORT value packed in upper bytes (BE)
        entry(259, 3, 1, 1 << 16)
        entry(262, 3, 1, 0)  # WhiteIsZero
        entry(273, 4, 1, 8)
        entry(277, 3, 1, 1 << 16)
        entry(278, 4, 1, 3)
        entry(279, 4, 1, len(body))
        ifd = st.pack(">H", len(entries)) + b"".join(entries) + b"\0" * 4
        data = b"MM\x00*" + st.pack(">I", 8 + len(body)) + body + ifd
        assert np.array_equal(decode_tiff(data), 255 - img)

    def test_compressed_rejected(self):
        import struct as st

        from braintumor_data_pipeline_spark.sources.tiff import (
            decode_tiff,
            encode_tiff,
        )

        data = bytearray(encode_tiff(np.zeros((2, 2), dtype=np.uint8)))
        # find the Compression entry (tag 259) in the little-endian IFD
        idx = data.find(st.pack("<HH", 259, 3))
        data[idx + 8] = 5  # LZW
        with pytest.raises(ValueError, match="unsupported"):
            decode_tiff(bytes(data))
