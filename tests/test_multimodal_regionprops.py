"""Multimodal plumbing + regionprops tests (SURVEY X11, multimodal N*)."""

from __future__ import annotations

import numpy as np
import pytest

from braintumor_data_pipeline_spark.functions.regionprops import region_properties
from braintumor_data_pipeline_spark.operators.multimodal import (
    audio_features_df,
    decode_audio,
    decode_video_frames,
    fake_audio_codec,
    images_as_binary_table,
    multimodal_image_features,
)


# --- regionprops (pure numpy) ---
def test_regionprops_empty_mask_zeros():
    props = region_properties(np.zeros((10, 10), dtype=np.uint8))
    assert props == {
        "eccentricity": 0.0,
        "major_axis_length": 0.0,
        "minor_axis_length": 0.0,
        "solidity": 0.0,
    }


def test_regionprops_square_is_solid_and_round():
    mask = np.zeros((30, 30), dtype=np.uint8)
    mask[5:25, 5:25] = 1
    p = region_properties(mask)
    assert p["solidity"] == pytest.approx(1.0, abs=1e-9)
    assert p["eccentricity"] == pytest.approx(0.0, abs=1e-9)
    # 4·sqrt(μ) with μ = (20²−1)/12 + 1/12 ≈ 33.33 → ≈ 23.09
    assert p["major_axis_length"] == pytest.approx(23.094, abs=0.01)
    assert p["major_axis_length"] == pytest.approx(p["minor_axis_length"])


def test_regionprops_elongated_eccentric():
    mask = np.zeros((40, 40), dtype=np.uint8)
    mask[18:22, 5:35] = 1  # 4×30 bar
    p = region_properties(mask)
    assert p["eccentricity"] > 0.95
    assert p["major_axis_length"] > 5 * p["minor_axis_length"]


def test_regionprops_concave_shape_low_solidity():
    mask = np.zeros((30, 30), dtype=np.uint8)
    mask[5:25, 5:9] = 1
    mask[5:9, 5:25] = 1  # L-shape
    p = region_properties(mask)
    assert p["solidity"] < 0.6


def test_regionprops_first_region_only():
    mask = np.zeros((30, 30), dtype=np.uint8)
    mask[2:6, 2:6] = 1  # first in scan order: 4×4 square
    mask[20:29, 20:22] = 1  # later elongated region must be ignored
    p = region_properties(mask)
    assert p["eccentricity"] == pytest.approx(0.0, abs=1e-9)


# --- multimodal binary-column plumbing ---
def test_image_binary_table_and_features(spark, sf_dir):
    tbl = images_as_binary_table(spark, sf_dir)
    rows = tbl.collect()
    assert len(rows) >= 1
    r = rows[0]
    assert r.format == "png" and r.width == 32 and r.height == 32
    assert r.n_bytes == len(r.payload) > 0

    feats = {f.image_id: f for f in multimodal_image_features(spark, sf_dir).collect()}
    assert set(feats) == {r.image_id for r in rows}
    for f in feats.values():
        assert 0 <= f.mean_v <= 255 and f.edge_energy > 0


def test_audio_stub_raises_without_codec():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_audio(b"\x00\x01")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_video_frames(b"\x00\x01")


def test_audio_features_with_fake_codec(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"key": [1, 2], "payload": [bytes(range(100)), b"\x80" * 50]}
    )
    df = spark.createDataFrame(pdf)
    out = {r.key: r for r in audio_features_df(df).collect()}
    assert out[1].n_samples == 100 and out[2].n_samples == 50
    # fake codec maps 0x80 → 0x80·257−32768 = 128
    assert out[2].rms == pytest.approx(128.0, abs=1e-9)
    assert out[1].peak == abs(0 * 257 - 32768)


def test_fake_codec_deterministic():
    a = fake_audio_codec(b"\x00\xff\x10")
    assert a.tolist() == [-32768, 32767, 0x10 * 257 - 32768]


def test_video_frame_sampling_with_fake_codec(spark):
    """Video plumbing: frame-sample fan-out (every 2nd of 8 frames) with
    per-frame features, codec injected."""
    from braintumor_data_pipeline_spark.operators.multimodal import (
        fake_video_codec,
        video_frame_features_df,
    )

    payload = bytes(range(128))  # 8 frames of 4x4
    df = spark.createDataFrame([(1, bytearray(payload))], "key int, payload binary")
    rows = video_frame_features_df(df, every_nth=2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4, 6]
    frames = fake_video_codec(payload)
    assert rows[0].mean_v == round(float(frames[0].mean()), 6)
    assert rows[-1].mean_v == round(float(frames[6].mean()), 6)


def test_video_stub_raises_without_codec():
    import pytest as _pytest

    from braintumor_data_pipeline_spark.operators.multimodal import (
        decode_video_frames,
    )

    with _pytest.raises(NotImplementedError):
        decode_video_frames(b"xx")


def test_image_resize_stage(spark, sf_dir):
    """Resize stage: 32x32 payloads come back as decodable 8x8 PNGs with
    nearest-neighbor values from the source grid."""
    from braintumor_data_pipeline_spark.operators.multimodal import (
        image_resize_df,
        images_as_binary_table,
    )
    from braintumor_data_pipeline_spark.sources.png import decode_png

    orig = {
        r.image_id: decode_png(bytes(r.payload))
        for r in images_as_binary_table(spark, sf_dir).collect()
    }
    small = image_resize_df(spark, sf_dir, out_size=8).collect()
    assert small and all(r.width == r.height == 8 for r in small)
    for r in small:
        img = decode_png(bytes(r.payload))
        assert img.shape == (8, 8)
        # nearest-neighbor: each output pixel equals SOME source pixel
        src = orig[r.image_id]
        assert img[0, 0] == src[0, 0]


def test_registered_audio_video_stages_value_pinned(spark, sf_dir):
    """The registered audio/video queries produce the hand-computable
    values of the fake codecs on a known payload."""
    import numpy as np

    from braintumor_data_pipeline_spark.registry import all_queries
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    text = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id = 0")
        .first()["text"]
    )
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    samples = raw.astype(np.int64) * 257 - 32768

    audio = {
        r.key: r
        for r in all_queries()["multimodal_audio_features"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert audio[0].n_samples == len(raw)
    assert audio[0].peak == int(np.abs(samples).max())
    assert audio[0].rms == pytest.approx(
        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), abs=1e-6
    )

    video = [
        r
        for r in all_queries()["multimodal_video_frame_sample"]
        .fn(spark, sf_dir)
        .collect()
        if r.key == 0
    ]
    n_frames = len(raw) // 16
    assert len(video) == len(range(0, n_frames, 10))
    fr0 = raw[:16].reshape(4, 4)
    assert video[0].frame_idx == 0
    assert video[0].mean_v == pytest.approx(round(float(fr0.mean()), 6))


def test_image_features_accept_jpeg_payloads(spark):
    """The multimodal consumer dispatches on magic bytes - a JPEG
    payload (S5 via sources/jpeg.py) flows through the same feature
    stage as PNG, with features matching the pre-encode pixels."""
    import pandas as pd

    from braintumor_data_pipeline_spark.operators.multimodal import (
        image_features_df,
    )
    from braintumor_data_pipeline_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    jpg = encode_jpeg(img, quality=95)
    pdf = pd.DataFrame(
        [{"image_id": 7, "format": "jpeg", "width": 32, "height": 32,
          "n_bytes": len(jpg), "payload": jpg}]
    )
    rows = image_features_df(spark.createDataFrame(pdf)).collect()
    assert len(rows) == 1 and rows[0].image_id == 7
    dec = decode_jpeg(jpg)  # lossy: compare features to DECODED pixels
    assert rows[0].mean_v == round(float(dec.mean()), 6)
    assert rows[0].std_v == round(float(dec.std()), 6)
