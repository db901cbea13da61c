"""NIfTI / BMP / dispatch / storage-helper tests (SURVEY S4-S8)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from braintumor_data_pipeline_spark.sources.dicom import dcmwrite
from braintumor_data_pipeline_spark.sources.image_io import (
    decode_bmp,
    decode_image,
    encode_bmp,
)
from braintumor_data_pipeline_spark.sources.nifti import (
    middle_slice,
    read_nifti,
    write_nifti,
)
from braintumor_data_pipeline_spark.sources.png import encode_png
from braintumor_data_pipeline_spark.sources.storage import (
    download_image_np,
    list_images,
    upload_dir,
)


def test_nifti_roundtrip_and_middle_slice():
    rng = np.random.RandomState(4)
    vol = rng.randint(-100, 2000, size=(9, 16, 12)).astype(np.int16)
    blob = write_nifti(vol)
    back = read_nifti(blob)
    assert np.array_equal(back, vol)
    # middle slice = volume[shape[0]//2] (preprocessor.py:56-58)
    assert np.array_equal(middle_slice(back), vol[4])


def test_nifti_gzip_container():
    import gzip

    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    assert np.array_equal(read_nifti(gzip.compress(write_nifti(vol))), vol)


def test_bmp_roundtrip_rgb():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_decode_image_dispatch():
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(decode_image(encode_png(gray)), gray)
    rgb = np.dstack([gray] * 3)
    assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(decode_image(dcmwrite(px)), px)
    vol = np.zeros((3, 4, 4), dtype=np.int16)
    vol[1] = 7
    assert (decode_image(write_nifti(vol)) == 7).all()
    from braintumor_data_pipeline_spark.sources.jpeg import encode_jpeg
    from braintumor_data_pipeline_spark.sources.tiff import encode_tiff

    jpg = decode_image(encode_jpeg(gray, quality=95))
    assert jpg.shape == gray.shape and np.abs(
        jpg.astype(int) - gray.astype(int)
    ).max() <= 8
    assert np.array_equal(decode_image(encode_tiff(rgb)), rgb)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"garbage")


def test_storage_helpers(spark, tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    img = np.full((6, 6), 9, dtype=np.uint8)
    (src / "a.png").write_bytes(encode_png(img))
    (src / "sub" / "b.PNG").write_bytes(encode_png(img))
    (src / "c.txt").write_text("not an image")

    dest = str(tmp_path / "bucket")
    uploaded = upload_dir(str(src), dest, prefix="raw")
    assert len(uploaded) == 3
    assert all(os.path.exists(p) for p in uploaded)

    # S7: case-insensitive suffix + limit, via the engine's binaryFile
    # scan (glob-matched directories are descended into, so both a.png
    # and sub/b.PNG appear; c.txt is suffix-filtered)
    listed_all = list_images(spark, dest + "/raw/*", suffix=".png", limit=50)
    assert len(listed_all) == 2
    assert len(list_images(spark, dest + "/raw/*", ".png", limit=1)) == 1

    # S8: exact-path fetch + decode; missing → None
    arr = download_image_np(spark, listed_all[0])
    assert arr is not None and arr.shape == (6, 6) and (arr == 9).all()
    assert download_image_np(spark, dest + "/raw/zzz.png") is None


class TestDicomDataSource:
    """spark.read.format('dicom') — the Spark 4 Python DataSource
    packaging of match+read+decode (see sources/dicom_datasource.py)."""

    @pytest.fixture(scope="class")
    def dicom_dir(self, tmp_path_factory):
        import numpy as np

        from braintumor_data_pipeline_spark.sources.dicom import dcmwrite

        d = tmp_path_factory.mktemp("ds_dicoms")
        rng = np.random.RandomState(7)
        for i in range(10):
            px = rng.randint(0, 2000, size=(32, 32)).astype(np.int16)
            kwargs = (
                {"window_center": [800.0, 400.0], "window_width": [1600.0, 200.0]}
                if i % 2
                else {}
            )
            (d / f"f_{i:02d}.dcm").write_bytes(
                dcmwrite(
                    px,
                    patient_id="" if i == 3 else f"P{i}",
                    study_uid=f"9.{i}",
                    series_uid=f"9.{i}.1",
                    sop_uid=f"9.{i}.1.0",
                    modality="CT",
                    **kwargs,
                )
            )
        (d / "skip.txt").write_text("not dicom")
        return str(d)

    @pytest.fixture(scope="class")
    def registered(self, spark):
        from braintumor_data_pipeline_spark.sources.dicom_datasource import (
            DicomDataSource,
        )

        spark.dataSource.register(DicomDataSource)
        return spark

    def test_reads_all_dicoms_skips_others(self, registered, dicom_dir):
        df = registered.read.format("dicom").load(dicom_dir)
        rows = df.collect()
        assert len(rows) == 10
        assert all(r.file_name.endswith(".dcm") for r in rows)

    def test_partition_planning(self, registered, dicom_dir):
        df = (
            registered.read.format("dicom")
            .option("filesPerPartition", "3")
            .load(dicom_dir)
        )
        assert df.rdd.getNumPartitions() == 4  # ceil(10/3)

    def test_semantics_match_reference_dofn(self, registered, dicom_dir):
        import numpy as np

        df = registered.read.format("dicom").load(dicom_dir)
        by_name = {r.file_name: r for r in df.collect()}
        # empty PatientID → NULL (dataflow_pipeline.py:90-91 semantics)
        assert by_name["f_03.dcm"].patient_id is None
        assert by_name["f_00.dcm"].patient_id == "P0"
        # MultiValue window → first element (dataflow_pipeline.py:25-26)
        assert by_name["f_01.dcm"].window_center == 800.0
        assert by_name["f_01.dcm"].window_width == 1600.0
        assert by_name["f_00.dcm"].window_center is None
        # stats are np.mean / population np.std over the PROCESSED uint8
        # image (window→CLAHE→blur), per the reference DoFn
        # (dataflow_pipeline.py:75-88)
        from braintumor_data_pipeline_spark.functions.imaging import (
            apply_windowing_pipeline,
            clahe,
            gaussian_blur,
        )
        from braintumor_data_pipeline_spark.sources.dicom import dcmread

        with open(f"{dicom_dir}/f_02.dcm", "rb") as f:
            ds = dcmread(f.read())
        wc = ds.window_center[0] if ds.window_center else None
        ww = ds.window_width[0] if ds.window_width else None
        img, _, _ = apply_windowing_pipeline(ds.pixel_array, wc, ww)
        img = gaussian_blur(clahe(img, clip_limit=2.0, tile_grid=(8, 8)), 0.5)
        assert by_name["f_02.dcm"].mean_intensity == pytest.approx(np.mean(img))
        assert by_name["f_02.dcm"].std_intensity == pytest.approx(np.std(img))

    def test_projection_still_decodes_lazily_per_partition(
        self, registered, dicom_dir
    ):
        df = registered.read.format("dicom").load(dicom_dir)
        out = df.select("patient_id").where("rows = 32").count()
        assert out == 10


class TestPngDirSink:
    """df.write.format('pngdir') — stage/commit/abort protocol around
    the reference's side-effect PNG write (sources/png_sink.py)."""

    @pytest.fixture(scope="class")
    def registered(self, spark):
        from braintumor_data_pipeline_spark.sources.png_sink import (
            PngDirDataSource,
        )

        spark.dataSource.register(PngDirDataSource)
        return spark

    def _frame(self, spark, n=6, bad=False):
        import numpy as np

        from braintumor_data_pipeline_spark.sources.png import encode_png

        rng = np.random.RandomState(11)
        rows = []
        for i in range(n):
            img = rng.randint(0, 255, size=(16, 16)).astype(np.uint8)
            rows.append((f"img_{i:02d}.png", bytearray(encode_png(img))))
        if bad:
            rows.append(("poison.png", None))
        return spark.createDataFrame(rows, "file_name string, content binary")

    def test_commit_publishes_all_files(self, registered, tmp_path):
        import numpy as np

        from braintumor_data_pipeline_spark.sources.png import decode_png

        out = str(tmp_path / "pngs")
        df = self._frame(registered).repartition(3)
        df.write.format("pngdir").option("path", out).mode("append").save()
        names = sorted(os.listdir(out))
        assert names == [f"img_{i:02d}.png" for i in range(6)]
        # round-trip one file through the engine's own decoder
        with open(os.path.join(out, "img_00.png"), "rb") as f:
            img = decode_png(f.read())
        assert img.shape == (16, 16) and img.dtype == np.uint8

    def test_failed_job_publishes_nothing(self, registered, tmp_path):
        from py4j.protocol import Py4JJavaError

        out = str(tmp_path / "pngs_fail")
        df = self._frame(registered, bad=True).repartition(2)
        with pytest.raises((Py4JJavaError, Exception)):
            df.write.format("pngdir").option("path", out).mode(
                "append"
            ).save()
        # abort must leave no published files and no staging debris
        leftover = []
        if os.path.isdir(out):
            for root, _dirs, files in os.walk(out):
                leftover += [os.path.join(root, f) for f in files]
        assert leftover == [], leftover


class TestDicomStreamSource:
    """spark.readStream.format('dicom') — directory-tailing micro-batch
    ingestion (the reference's unimplemented Pub/Sub roadmap item)."""

    def test_incremental_microbatches(self, spark, tmp_path):
        import numpy as np

        from braintumor_data_pipeline_spark.sources.dicom import dcmwrite
        from braintumor_data_pipeline_spark.sources.dicom_datasource import (
            DicomDataSource,
        )

        spark.dataSource.register(DicomDataSource)
        d = tmp_path / "landing"
        d.mkdir()
        rng = np.random.RandomState(3)

        def land(i):
            px = rng.randint(0, 500, size=(8, 8)).astype(np.int16)
            (d / f"s_{i:03d}.dcm").write_bytes(
                dcmwrite(
                    px,
                    patient_id=f"S{i}",
                    study_uid=f"7.{i}",
                    series_uid=f"7.{i}.1",
                    sop_uid=f"7.{i}.1.0",
                    modality="MR",
                )
            )

        for i in range(3):
            land(i)
        q = (
            spark.readStream.format("dicom")
            .load(str(d))
            .writeStream.format("memory")
            .queryName("dicom_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            assert spark.table("dicom_stream").count() == 3
            for i in range(3, 5):  # two more files land
                land(i)
            q.processAllAvailable()
            got = spark.table("dicom_stream")
            assert got.count() == 5  # incremental, no reprocessing
            assert sorted(
                r.patient_id for r in got.select("patient_id").collect()
            ) == ["S0", "S1", "S2", "S3", "S4"]
        finally:
            q.stop()


def test_generator_counts_and_repartition_invariance(spark, sf_dir):
    """The in-plan generator is a pure function of row id: results are
    identical under different parallelism, and the flag partition sizes
    follow id % 3 exactly."""
    from braintumor_data_pipeline_spark.sources.generator import (
        N_ROWS,
        synthetic_lineitem_pricing,
        synthetic_skew_stress_agg,
    )

    rows = {r.flag: r for r in synthetic_lineitem_pricing(spark, sf_dir).collect()}
    assert sum(r.n for r in rows.values()) == N_ROWS
    assert rows["A"].n == (N_ROWS + 2) // 3
    assert all(1 <= 1 and r.min_cents >= 100000 for r in rows.values())

    s1 = synthetic_skew_stress_agg(spark, sf_dir).collect()[0]
    # key k owns exactly 2k+1 rows; max key = floor(sqrt(N-1))
    import math

    kmax = math.isqrt(N_ROWS - 1)
    assert s1.n_keys == kmax + 1
    assert s1.max_key_rows >= 2 * (kmax - 1) + 1
    # repartition must not change the checksum (pure function of ids)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        s2 = synthetic_skew_stress_agg(spark, sf_dir).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert (s1.checksum, s1.n_keys, s1.max_key_rows) == (
        s2.checksum,
        s2.n_keys,
        s2.max_key_rows,
    )
