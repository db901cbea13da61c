"""Multimodal plumbing + regionprops tests (SURVEY X11, multimodal N*)."""

from __future__ import annotations

import numpy as np
import pytest

from braintumor_data_pipeline_spark.functions.regionprops import region_properties
from braintumor_data_pipeline_spark.operators.multimodal import (
    audio_features_df,
    decode_audio,
    decode_video_frames,
    images_as_binary_table,
    multimodal_image_features,
)
from braintumor_data_pipeline_spark.sources.mjpeg import (
    decode_mjpeg_frames,
    encode_mjpeg,
    split_mjpeg,
)
from braintumor_data_pipeline_spark.sources.wav import decode_wav, encode_wav


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


def test_regionprops_exact_matches_float_path():
    """The hash-stable integer-moment DAG (region_properties_exact, the
    mask_regionprops_exact oracle contract) must agree with the float
    regionprops to ~1e-9 on every shape class: solid, elongated, concave,
    staircase-diagonal (degenerate sliver hull), multi-region."""
    from braintumor_data_pipeline_spark.functions.regionprops import (
        region_properties_exact,
    )

    shapes = []
    solid = np.zeros((30, 30), dtype=np.uint8); solid[5:25, 5:25] = 1
    bar = np.zeros((32, 32), dtype=np.uint8); bar[18:22, 3:29] = 1
    ell = np.zeros((30, 30), dtype=np.uint8)
    ell[5:25, 5:9] = 1; ell[5:9, 5:25] = 1
    stair = np.zeros((32, 32), dtype=np.uint8)
    for i in range(28):
        stair[i, 2 + i // 2] = 1
    multi = np.zeros((30, 30), dtype=np.uint8)
    multi[2:6, 2:6] = 1; multi[20:29, 20:22] = 1
    single = np.zeros((8, 8), dtype=np.uint8); single[3, 4] = 1
    shapes += [solid, bar, ell, stair, multi, single]
    for mask in shapes:
        f = region_properties(mask)
        e = region_properties_exact(mask)
        assert e is not None
        assert e["solidity"] == pytest.approx(f["solidity"], abs=1e-12)
        assert e["ecc_micro"] / 1e6 == pytest.approx(
            f["eccentricity"], abs=2e-6
        )
        assert e["major_micro"] / 1e6 == pytest.approx(
            f["major_axis_length"], abs=2e-6
        )
        assert e["minor_micro"] / 1e6 == pytest.approx(
            f["minor_axis_length"], abs=2e-6
        )
    assert region_properties_exact(np.zeros((5, 5), dtype=np.uint8)) is None


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
        assert 0 <= f.mean_v <= 255 and f.edge_energy_micro > 0


def test_decoders_reject_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_audio(b"\x00\x01")
    with pytest.raises(ValueError, match="frames"):
        decode_video_frames(b"\x00\x01")


def test_wav_s16_roundtrip_bit_exact():
    s = np.array([-32768, -1, 0, 1, 32767, 12345], dtype=np.int16)
    dec, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert dec.shape == (6, 1)
    assert np.array_equal(dec.reshape(-1), s)


def test_wav_stereo_and_odd_data_padding():
    s = np.arange(10, dtype=np.int16).reshape(5, 2)
    dec, rate = decode_wav(encode_wav(s, 8000))
    assert dec.shape == (5, 2) and np.array_equal(dec, s)
    # odd byte count in a chunk forces the pad-byte path
    mono = np.array([7], dtype=np.int16)
    payload = encode_wav(mono, 8000)
    dec2, _ = decode_wav(payload)
    assert dec2.reshape(-1).tolist() == [7]


def test_wav_skips_foreign_chunks():
    """LIST/fact chunks between fmt and data must be walked over."""
    import struct

    s = np.array([100, -100], dtype=np.int16)
    canonical = encode_wav(s, 16000)
    # splice a LIST chunk in front of 'data'
    di = canonical.find(b"data")
    listed = (
        canonical[:di]
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + canonical[di:]
    )
    listed = listed[:4] + struct.pack("<I", len(listed) - 8) + listed[8:]
    dec, rate = decode_wav(listed)
    assert rate == 16000 and dec.reshape(-1).tolist() == [100, -100]


def test_wav_u8_and_float32_variants():
    import struct

    def wav(fmt_code, bits, data, rate=8000, ch=1):
        fmt = struct.pack("<HHIIHH", fmt_code, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) % 2 else b""))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    u8, _ = decode_wav(wav(1, 8, bytes([0, 128, 255])))
    assert u8.reshape(-1).tolist() == [-32768, 0, 32512]
    f32, _ = decode_wav(wav(3, 32, np.array([0.0, 0.5, -1.0], "<f4").tobytes()))
    assert f32.reshape(-1).tolist() == [0, 16384, -32767]
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(wav(1, 12, b"\x00\x00"))


def test_audio_features_real_wav_in_spark(spark):
    """audio_features_df over genuine WAV payloads: a full-scale square
    wave (RMS = peak = 32767) and a half-second of silence."""
    import pandas as pd

    square = np.tile(np.array([32767, -32767], dtype=np.int16), 100)
    silence = np.zeros(4000, dtype=np.int16)
    pdf = pd.DataFrame(
        {
            "key": [1, 2],
            "payload": [encode_wav(square, 16000), encode_wav(silence, 8000)],
        }
    )
    out = {r.key: r for r in audio_features_df(spark.createDataFrame(pdf)).collect()}
    assert out[1].n_samples == 200 and out[1].sample_rate == 16000
    assert out[1].rms == pytest.approx(32767.0) and out[1].peak == 32767
    assert out[2].n_samples == 4000 and out[2].duration_ms == 500.0
    assert out[2].rms == 0.0 and out[2].peak == 0


def test_mjpeg_split_and_sampling():
    """8 constant frames → marker split finds all 8; every-2nd sampling
    decodes frames 0/2/4/6 with near-exact constant values."""
    frames = [
        np.full((16, 16), 20 * (f + 1), dtype=np.uint8) for f in range(8)
    ]
    mj = encode_mjpeg(frames, quality=90)
    assert len(split_mjpeg(mj)) == 8
    out = list(decode_mjpeg_frames(mj, every_nth=2))
    assert [i for i, _ in out] == [0, 2, 4, 6]
    for i, fr in out:
        assert fr.shape == (16, 16)
        assert abs(float(fr.mean()) - 20 * (i + 1)) < 2.0


def test_video_frame_features_real_mjpeg_in_spark(spark):
    from braintumor_data_pipeline_spark.operators.multimodal import (
        video_frame_features_df,
    )

    frames = [np.full((8, 8), 50 + 30 * f, dtype=np.uint8) for f in range(6)]
    payload = encode_mjpeg(frames, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "key int, payload binary"
    )
    rows = video_frame_features_df(df, every_nth=3).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 3]
    assert abs(rows[0].mean_v - 50.0) < 2.0
    assert abs(rows[1].mean_v - 140.0) < 2.0


def test_registered_audio_query_pinned_goldens(spark, sf_dir):
    """multimodal_audio_features on the fixture docs — exact pinned
    values for the first three documents (deterministic text → PCM →
    WAV → decode → features)."""
    from braintumor_data_pipeline_spark.operators.multimodal import (
        multimodal_audio_features,
    )

    out = {r.key: r for r in multimodal_audio_features(spark, sf_dir).collect()}
    assert len(out) == 100
    g0, g1, g2 = out[0], out[1], out[2]
    # Exact unrounded doubles: recomputed independently from the raw
    # document bytes (DuckDB hex expansion), not from this code path.
    assert (g0.n_samples, g0.sample_rate, g0.duration_ms, g0.rms, g0.peak) == (
        128, 8000, 16.0, 11328.61669277741, 24544
    )
    assert (g1.n_samples, g1.sample_rate, g1.rms) == (
        441, 12000, 11330.205552089852
    )
    assert (g2.n_samples, g2.sample_rate, g2.duration_ms) == (348, 16000, 21.75)
    assert all(r.n_channels == 1 for r in out.values())


def test_registered_video_query_pinned_goldens(spark, sf_dir):
    """multimodal_video_frame_sample — every 4th of 12 frames per doc,
    pinned per-frame stats for doc 0."""
    from braintumor_data_pipeline_spark.operators.multimodal import (
        multimodal_video_frame_sample,
    )

    rows = multimodal_video_frame_sample(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    assert len(by_key) == 25
    d0 = sorted(by_key[0], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in d0] == [0, 4, 8]
    assert [(r.mean_v, r.std_v) for r in d0] == [
        (87.128906, 46.765821),
        (119.195312, 46.761038),
        (151.300781, 46.784322),
    ]


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


def test_registered_audio_stage_matches_recomputation(spark, sf_dir):
    """The registered audio query's features equal an independent
    numpy recomputation from the document bytes (text → PCM expansion →
    real WAV round-trip)."""
    import numpy as np

    from braintumor_data_pipeline_spark.registry import all_queries
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    text = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id = 0")
        .first()["text"]
    )
    raw = np.frombuffer(text.encode("utf-8")[:2048], dtype=np.uint8)
    samples = raw.astype(np.int64) * 257 - 32768

    audio = {
        r.key: r
        for r in all_queries()["multimodal_audio_features"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert audio[0].n_samples == len(raw)
    assert audio[0].sample_rate == 8000
    assert audio[0].peak == int(np.abs(samples).max())
    assert audio[0].rms == pytest.approx(
        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), abs=1e-6
    )


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
    a = dec.astype(np.int64)
    assert rows[0].mean_v == a.sum() / float(a.size)
    mean = a.sum() / float(a.size)
    assert rows[0].std_v == float(
        np.sqrt(int((a * a).sum()) / float(a.size) - mean * mean)
    )


def test_spectral_bands_concentrate_on_pure_tone():
    import math

    import numpy as np

    from braintumor_data_pipeline_spark.operators.multimodal import (
        SPEC_BINS,
        SPEC_WIN,
        spectral_band_energy_np,
    )

    # a pure bin-2 cosine over two complete windows: the bin-2 energy
    # must dominate every other bin by orders of magnitude
    n = 2 * SPEC_WIN
    tone = np.array(
        [round(1000 * math.cos(2 * math.pi * 2 * i / SPEC_WIN)) for i in range(n)],
        dtype=np.int16,
    ).reshape(-1, 1)
    e = dict(zip(SPEC_BINS, spectral_band_energy_np(tone)))
    assert e[2] > 100 * max(e[k] for k in SPEC_BINS if k != 2)
    # silence → all zeros; short input (no complete window) → all zeros
    assert spectral_band_energy_np(np.zeros((n, 1), np.int16)) == [0] * 4
    assert spectral_band_energy_np(np.zeros((3, 1), np.int16)) == [0] * 4


def test_float_regionprops_builder_is_test_tier(spark, sf_dir):
    """mask_regionprops (float surface) is deliberately NOT registered
    (VERDICT r3 item 9) — the exact companion carries the hash check —
    but the builder itself must keep working and agree with the exact
    query's floor-micro values."""
    from braintumor_data_pipeline_spark import registry
    from braintumor_data_pipeline_spark.operators.imaging_udf import (
        mask_regionprops,
    )

    qs = registry.all_queries()
    assert "mask_regionprops" not in qs
    assert "mask_regionprops_exact" in qs
    fl = {r.image_id: r for r in mask_regionprops(spark, sf_dir).collect()}
    ex = {
        r.image_id: r
        for r in qs["mask_regionprops_exact"].fn(spark, sf_dir).collect()
    }
    assert fl and set(ex) <= set(fl)
    for iid, e in ex.items():
        f = fl[iid]
        # float path rounds to 6dp, exact path floors ·1e6 — agree to 1e-5
        assert abs(f.eccentricity - e.ecc_micro / 1e6) < 1e-5
        assert abs(f.major_axis_length - e.major_micro / 1e6) < 1e-5
        assert abs(f.minor_axis_length - e.minor_micro / 1e6) < 1e-5
