"""Golden/property tests for the numpy image library (SURVEY §2.9, §5)."""

from __future__ import annotations

import numpy as np
import pytest

from braintumor_data_pipeline_spark.functions import imaging as im


# --- windowing (X1/X2): the two reference variants disagree on odd widths
def test_windowing_pipeline_variant():
    arr = np.array([[0, 100, 120, 200, 4000]], dtype=np.int16)
    out, wc, ww = im.apply_windowing_pipeline(arr, 120.0, 81.0)
    # low=79.5 high=160.5: 0→clip 79.5→0; 120→(40.5/81)*255=127.5→127
    assert out.dtype == np.uint8
    assert out[0, 0] == 0 and out[0, 4] == 255
    assert out[0, 2] == 127
    assert (wc, ww) == (120.0, 81.0)


def test_windowing_app_variant_differs_on_odd_width():
    arr = np.array([[120]], dtype=np.int16)
    app = im.apply_windowing_app(arr, 120, 81)  # low=80,high=160 → (40/80)*255
    assert app[0, 0] == 127  # 127.5 truncated
    arr2 = np.array([[80]], dtype=np.int16)
    assert im.apply_windowing_app(arr2, 120, 81)[0, 0] == 0
    pipe, _, _ = im.apply_windowing_pipeline(arr2.astype(float), 120.0, 81.0)
    assert pipe[0, 0] == 1  # (80-79.5)/81*255 = 1.57 → 1 ≠ app variant


def test_windowing_fallback_minmax():
    arr = np.array([[0, 50, 100]], dtype=np.int16)
    out, wc, ww = im.apply_windowing_pipeline(arr, None, None)
    assert wc is None and ww is None
    assert out[0, 0] == 0 and out[0, 2] == 255


def test_windowing_zero_width_falls_back():
    arr = np.array([[0, 10]], dtype=np.int16)
    out, wc, ww = im.apply_windowing_pipeline(arr, 50.0, 0.0)
    assert wc is None and ww is None  # ww>0 guard → fallback path


# --- grayscale (X6): fixed-point BT.601 matches the float formula ±1
def test_grayscale_matches_float_coefficients():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    gray = im.to_grayscale(img)
    ref = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
    assert np.abs(gray.astype(float) - ref).max() <= 1.0
    two_d = rng.randint(0, 256, size=(4, 4), dtype=np.uint8)
    assert im.to_grayscale(two_d) is two_d  # passthrough


# --- blur (X5)
def test_blur_sigma_zero_passthrough():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert im.gaussian_blur(img, 0.0) is img


def test_blur_preserves_constant_and_mean():
    img = np.full((16, 16), 77, dtype=np.uint8)
    assert np.array_equal(im.gaussian_blur(img, 1.5), img)
    rng = np.random.RandomState(11)
    noisy = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    out = im.gaussian_blur(noisy, 2.0)
    assert abs(float(out.mean()) - float(noisy.mean())) < 2.0
    assert out.std() < noisy.std()  # smoothing reduces variance


# --- CLAHE (X4)
def test_clahe_range_and_contrast():
    rng = np.random.RandomState(5)
    # low-contrast image concentrated in [100, 130]
    img = rng.randint(100, 131, size=(64, 64), dtype=np.uint8)
    out = im.clahe(img)
    assert out.dtype == np.uint8
    assert out.std() > img.std()  # contrast enhanced
    # clip limit 2.0 bounds the stretch, but range must widen markedly
    assert int(out.max()) - int(out.min()) > 3 * (int(img.max()) - int(img.min()))


def test_clahe_uniform_image_stays_flat():
    img = np.full((64, 64), 42, dtype=np.uint8)
    out = im.clahe(img)
    assert out.std() == pytest.approx(0.0, abs=1e-9)


# --- morphology (X8)
def test_morphology_open_removes_specks_close_fills_holes():
    mask = np.zeros((20, 20), dtype=np.uint8)
    mask[5:15, 5:15] = 1
    mask[10, 10] = 0  # hole → closed
    mask[0, 0] = 1  # speck → opened away
    out = im.morphology_open_close(mask)
    assert out[0, 0] == 0
    assert out[10, 10] == 1
    assert out[7, 7] == 1


# --- SSIM (X13)
def test_ssim_identity_and_symmetry():
    rng = np.random.RandomState(13)
    a = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    b = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    assert im.ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    assert im.ssim(a, b) == pytest.approx(im.ssim(b, a), abs=1e-9)
    assert im.ssim(a, b) < 0.5  # unrelated noise


def test_ssim_resizes_mismatched_shapes():
    a = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
    b = a[::2, ::2]
    assert im.ssim(a, b) > 0.5


# --- Butterworth (X14)
def test_butterworth_highpass_kills_flat_lowpass_keeps():
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    hp = im.butterworth_filter(img, high_pass=True)
    lp = im.butterworth_filter(img, high_pass=False)
    assert hp.dtype == np.uint8 and lp.dtype == np.uint8
    flat = np.full((32, 32), 99, dtype=np.uint8)
    assert im.butterworth_filter(flat, high_pass=True).max() == 0


# --- BF-score (X15)
def test_bf_score_with_and_without_gt():
    mask = np.zeros((32, 32), dtype=np.uint8)
    mask[8:24, 8:24] = 1
    s_self = im.bf_score(mask, mask)
    assert s_self == pytest.approx(1.0, abs=1e-9)  # identical edges
    s_solo = im.bf_score(mask, None)
    assert 0.0 <= s_solo <= 1.0
    shifted = np.roll(mask, 4, axis=0)
    assert im.bf_score(mask, shifted) < s_self


# --- overlay (X12)
def test_overlay_marks_mask_and_boundary():
    img = np.full((12, 12), 100, dtype=np.uint8)
    mask = np.zeros((12, 12), dtype=np.uint8)
    mask[4:8, 4:8] = 1
    out = im.overlay_segmentation(img, mask, overlay_color=(255, 0, 0), alpha=0.5)
    assert out.shape == (12, 12, 3)
    assert tuple(out[4, 4]) == (255, 0, 0)  # boundary painted solid
    assert tuple(out[5, 5]) == (227, 100, 100)  # interior blended +0.5·255
    assert tuple(out[0, 0]) == (100, 100, 100)  # background untouched


# --- dummy GT (X16): seeded determinism
def test_dummy_gt_deterministic_and_perturbed():
    mask = np.zeros((40, 40), dtype=np.uint8)
    mask[10:30, 10:30] = 1
    g1 = im.generate_dummy_ground_truth(mask, seed=42)
    g2 = im.generate_dummy_ground_truth(mask, seed=42)
    g3 = im.generate_dummy_ground_truth(mask, seed=43)
    assert np.array_equal(g1, g2)
    assert not np.array_equal(g1, g3)
    assert g1.sum() > 0 and not np.array_equal(g1, mask)


def test_augment_preserves_mass_and_moves_positions(spark, sf_dir):
    """Augmentation conserves pixel mass; non-identity policies change
    the position-weighted checksum (the grid images are asymmetric)."""
    from braintumor_data_pipeline_spark.operators.imaging_udf import (
        imaging_udf_augment,
        imaging_udf_stats,
    )

    aug = {r.image_id: r for r in imaging_udf_augment(spark, sf_dir).collect()}
    stats = {r.image_id: r for r in imaging_udf_stats(spark, sf_dir).collect()}
    assert aug
    import numpy as np

    for iid, r in aug.items():
        assert r.policy == iid % 6
        # mass conservation vs the stats query's mean
        assert abs(r.sum_v / 1024.0 - stats[iid].mean_v) < 1e-9


def test_integer_dft_matches_numpy_fft():
    """The fixed-point separable DFT behind butterworth_band_energy must
    agree with np.fft.fft2 to coefficient-quantization precision
    (relative error ~2^-12 per stage) — ties the exact-oracle
    formulation to the true Fourier math, not just to itself."""
    import numpy as np

    from braintumor_data_pipeline_spark.operators.imaging_udf import (
        _DFT_SCALE,
        _dft2_int,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32))
    re, im = _dft2_int(img)
    approx = (re + 1j * im) / (_DFT_SCALE * _DFT_SCALE)
    truth = np.fft.fft2(img)
    scale = np.abs(truth).max()
    assert np.abs(approx - truth).max() / scale < 2e-3


def test_butterworth_band_energy_matches_float_filter_physics():
    """Parseval check: the integer hp/lp weighted spectral energies must
    track the spatial energy of the float butterworth_filter output
    (before its uint8 rescale) within quantization tolerance."""
    import numpy as np

    from braintumor_data_pipeline_spark.operators.imaging_udf import (
        _DFT_SCALE,
        _W_HP_GRID,
        _W_LP_GRID,
        _dft2_int,
        _weighted_power,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (32, 32))
    re, im_ = _dft2_int(img)
    n = 32
    for w_grid, high_pass in ((_W_HP_GRID, True), (_W_LP_GRID, False)):
        e_int = _weighted_power(re, im_, w_grid)
        # descale: coefficients S² on F → S⁴ on |F|², S on weights,
        # and 1/N² for the inverse-transform energy (Parseval)
        e_scaled = e_int / (_DFT_SCALE**5) / (n * n)
        # float reference: energy of ifft2(fftshift-filtered spectrum)
        u, v = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = np.sqrt((u - 16) ** 2 + (v - 16) ** 2)
        if high_pass:
            h = 1 / (1 + (30.0 / (d + 1e-8)) ** 4)
        else:
            h = 1 / (1 + (d / (30.0 + 1e-8)) ** 4)
        f = np.fft.fftshift(np.fft.fft2(img)) * h
        filt = np.fft.ifft2(np.fft.ifftshift(f))
        e_ref = float((np.abs(filt) ** 2).sum())
        assert abs(e_scaled - e_ref) / max(e_ref, 1.0) < 5e-3, (
            high_pass,
            e_scaled,
            e_ref,
        )


def test_sobel_energy_np_matches_sobel_magnitude():
    """_sobel_energy_np (the exact integer core of the
    edge_spectrum_agreement oracle) must equal sobel_magnitude² on a
    0/255 image."""
    import numpy as np

    from braintumor_data_pipeline_spark.functions import imaging as im
    from braintumor_data_pipeline_spark.operators.imaging_udf import (
        _sobel_energy_np,
    )

    rng = np.random.RandomState(11)
    b = (rng.rand(32, 32) > 0.6).astype(np.uint8) * 255
    e = _sobel_energy_np(b)
    mag = im.sobel_magnitude(b)
    assert np.allclose(e.astype(np.float64), mag**2)


def test_float_butterworth_and_pair_metrics_are_test_tier(spark, sf_dir):
    """The float FFT surfaces stay as working unregistered builders."""
    from braintumor_data_pipeline_spark import registry
    from braintumor_data_pipeline_spark.operators.imaging_udf import (
        butterworth_stats,
        image_pair_metrics,
    )

    qs = registry.all_queries()
    assert "butterworth_stats" not in qs
    assert "image_pair_metrics" not in qs
    assert "butterworth_band_energy" in qs
    assert "edge_spectrum_agreement" in qs
    rows = butterworth_stats(spark, sf_dir).collect()
    assert rows and all(r.hp_mean >= 0 for r in rows)
    rows = image_pair_metrics(spark, sf_dir).collect()
    assert rows and all(-1.0 <= r.ssim_images <= 1.0 for r in rows)
