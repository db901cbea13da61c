"""Hypothesis property tests over the numpy imaging/segmentation library
(SURVEY §5.3) — invariants that must hold for EVERY input, not just the
golden fixtures. All numpy-only (no Spark session) so hundreds of
examples run in seconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from braintumor_data_pipeline_spark.functions.imaging import (
    apply_windowing_pipeline,
    gaussian_blur,
    morphology_open_close,
    normalize_minmax,
    region_growing_np,
    ssim,
    to_grayscale,
)

small_u8 = arrays(
    np.uint8, st.tuples(st.integers(4, 16), st.integers(4, 16))
)
small_i16 = arrays(
    np.int16, st.tuples(st.integers(4, 16), st.integers(4, 16))
)


@given(small_i16)
@settings(max_examples=60, deadline=None)
def test_normalize_minmax_range_and_extremes(arr):
    out = normalize_minmax(arr)
    assert out.dtype == np.uint8
    if arr.max() > arr.min():
        # guarded variant maps extremes to the full range ends
        assert out.min() == 0
        assert out.max() == 255
    else:
        assert (out == 0).all()  # flat image → all zeros (guarded denom)


@given(
    small_i16,
    st.floats(-500, 2000),
    st.floats(1, 1000),
)
@settings(max_examples=60, deadline=None)
def test_windowing_pipeline_monotone_and_bounded(arr, wc, ww):
    out, owc, oww = apply_windowing_pipeline(arr, wc, ww)
    assert out.dtype == np.uint8
    assert (owc, oww) == (wc, ww)
    # windowing = monotone clip+rescale: value order never inverts
    flat_in = arr.astype(np.float64).ravel()
    flat_out = out.astype(np.int64).ravel()
    order = np.argsort(flat_in, kind="stable")
    assert (np.diff(flat_out[order]) >= 0).all()


@given(small_i16)
@settings(max_examples=30, deadline=None)
def test_windowing_invalid_width_falls_back_to_minmax(arr):
    out, owc, oww = apply_windowing_pipeline(arr, 100.0, 0.0)
    ref = normalize_minmax(arr.astype(np.float32))
    assert (owc, oww) == (None, None)
    assert (out == ref).all()


@given(arrays(np.uint8, st.tuples(st.integers(5, 12), st.integers(5, 12)),
              elements=st.integers(0, 1)))
@settings(max_examples=60, deadline=None)
def test_morphology_binary_shape_preserving(mask):
    out = morphology_open_close(mask)
    assert out.shape == mask.shape
    assert set(np.unique(out)).issubset({0, 1})


@given(small_u8)
@settings(max_examples=30, deadline=None)
def test_blur_sigma_nonpositive_is_identity(img):
    assert (gaussian_blur(img, 0.0) == img).all()
    assert (gaussian_blur(img, -1.0) == img).all()


@given(small_u8, st.floats(0.3, 3.0))
@settings(max_examples=30, deadline=None)
def test_blur_stays_in_input_range(img, sigma):
    out = gaussian_blur(img, sigma)
    assert out.shape == img.shape
    # convolution with a non-negative normalized kernel cannot escape
    # the input's [min, max] envelope (±1 for uint8 rounding)
    assert out.min() >= max(int(img.min()) - 1, 0)
    assert out.max() <= min(int(img.max()) + 1, 255)


@given(arrays(np.uint8, st.tuples(st.integers(8, 16), st.integers(8, 16)),
              elements=st.integers(0, 255)))
@settings(max_examples=20, deadline=None)
def test_ssim_self_is_one(img):
    assert abs(ssim(img, img) - 1.0) < 1e-9


@given(arrays(np.uint8, st.tuples(st.integers(3, 3), st.integers(4, 4),
                                  st.integers(3, 3)),
              elements=st.integers(0, 255)))
@settings(max_examples=30, deadline=None)
def test_grayscale_equal_channels_identity(rgb3):
    # (h, w, 3) with identical channels → grayscale equals that channel
    rgb = np.stack([rgb3[..., 0]] * 3, axis=-1)
    out = to_grayscale(rgb)
    assert (out.astype(int) - rgb3[..., 0].astype(int) <= 1).all()
    assert (rgb3[..., 0].astype(int) - out.astype(int) <= 1).all()


@given(
    arrays(np.uint8, st.tuples(st.integers(6, 14), st.integers(6, 14)),
           elements=st.integers(0, 255)),
    st.floats(0.0, 1.0),
)
@settings(max_examples=40, deadline=None)
@example(
    # hypothesis-discovered boundary pair (r8): Δ = 85/255 = exactly 1/3
    # against threshold f64(1/3) — the f32 predicate (reference
    # contract) admits it, an f64 replication rejects it. Pinned so the
    # test forever exercises an exact f32/f64 disagreement point.
    img=np.array([[102] + [17] * 5] + [[17] * 6] * 5, dtype=np.uint8),
    threshold=0.3333333333333333,
)
def test_region_growing_invariants(img, threshold):
    sy, sx = img.shape[0] // 2, img.shape[1] // 2
    mask = region_growing_np(
        img, (sy, sx), threshold=threshold, max_iterations=None,
        morphology=False,
    )
    assert set(np.unique(mask)).issubset({0, 1})
    assert mask[sy, sx] == 1  # seed always in region (pre-morphology)
    # every admitted pixel satisfies the admission predicate — in the
    # FLOAT32 arithmetic the reference normalizes with and the oracles
    # replay via REAL casts (segmentation.py:464 doctrine); a float64
    # replication disagrees on exact-boundary pairs like Δ=85, t=1/3
    norm = img.astype(np.float32) / 255.0
    seed_norm = float(img[sy, sx]) / 255.0
    admissible = np.abs(norm - seed_norm) <= threshold
    assert (mask.astype(bool) <= admissible).all()
    # threshold 1.0 floods the whole image (everything is admissible)
    if threshold == 1.0:
        assert mask.all()


@given(
    arrays(np.uint8, st.tuples(st.integers(6, 12), st.integers(6, 12)),
           elements=st.integers(0, 255)),
)
@settings(max_examples=30, deadline=None)
def test_region_growing_cap_bounds_area(img):
    """The reference's max_iterations quirk: the region can never hold
    more pixels than cap·(1+neighbors) and capped ⊆ uncapped."""
    sy, sx = 3, 3
    capped = region_growing_np(
        img, (sy, sx), threshold=0.5, max_iterations=10, morphology=False
    )
    uncapped = region_growing_np(
        img, (sy, sx), threshold=0.5, max_iterations=None, morphology=False
    )
    assert (capped.astype(bool) <= uncapped.astype(bool)).all()
    assert capped.sum() <= 10 * 9  # 10 dequeues × (self + 8 neighbors)


# ---------------------------------------------------------------------------
# Hash-stability kernels (the oracle-exactness machinery itself)
# ---------------------------------------------------------------------------
@given(
    arrays(
        np.uint8,
        st.tuples(st.integers(4, 14), st.integers(4, 14)),
        elements=st.integers(0, 1),
    )
)
@settings(max_examples=150, deadline=None)
def test_regionprops_exact_convex_area_vs_rational(mask):
    """region_properties_exact's rasterized convex_area must equal the
    exact-rational row-interval count (the mask_regionprops_exact
    oracle's formulation) on ARBITRARY masks — the bit-equality argument
    in functions/regionprops.py, checked by brute Fraction arithmetic."""
    from fractions import Fraction
    from math import ceil, floor

    from braintumor_data_pipeline_spark.functions.regionprops import (
        _label_first_region,
        region_properties_exact,
    )

    props = region_properties_exact(mask)
    region = _label_first_region(mask > 0)
    ys, xs = np.nonzero(region)
    if props is None:
        assert len(ys) == 0
        return
    pts = list(zip(ys.tolist(), xs.tolist()))
    total = 0
    for y in range(min(ys), max(ys) + 1):
        lo = hi = None
        for ay, ax in pts:
            for by, bx in pts:
                if ay <= by and ay <= y <= by:
                    if by == ay:
                        cand = [Fraction(ax), Fraction(bx)]
                    else:
                        cand = [Fraction(ax * (by - y) + bx * (y - ay), by - ay)]
                    for v in cand:
                        lo = v if lo is None or v < lo else lo
                        hi = v if hi is None or v > hi else hi
        total += floor(hi) - ceil(lo) + 1
    assert props["convex_area"] == total


@given(
    st.lists(
        st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_money_micro_quantization_order_independent(vals):
    """The money/state micro-unit trick: quantizing each value to 1e-6
    then summing LONGs must give the identical total under ANY
    accumulation order — the property that kills the
    round(sum(double)) hash-flake class."""
    import random

    micros = [int(np.rint(v * 1e6)) for v in vals]
    total = sum(micros)
    shuffled = micros[:]
    random.Random(42).shuffle(shuffled)
    assert sum(shuffled) == total
    # reversed and pairwise-chunked orders too
    assert sum(reversed(micros)) == total
    mid = len(micros) // 2
    assert sum(micros[:mid]) + sum(micros[mid:]) == total


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), max_size=12))
@settings(max_examples=100, deadline=None)
def test_bpe_roundtrip_any_corpus(words):
    """For ANY tiny corpus: every learned-merge encoding of every word
    concatenates back to the word (+ END_MARK) — no symbol is ever lost
    or invented by merge application."""
    from collections import Counter

    from braintumor_data_pipeline_spark.operators.bpe import (
        END_MARK,
        encode_word,
        learn_bpe_merges,
    )

    freqs = sorted(Counter(w for w in words if w and " " not in w).items())
    merges = learn_bpe_merges(freqs, n_merges=6)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w, _ in freqs:
        assert "".join(encode_word(w, ranks)) == w + END_MARK


# --- pHash / spectral / HLL kernel properties (numpy-only) -----------

phash_img = arrays(np.uint8, st.tuples(st.just(32), st.just(32)))


@given(phash_img)
@settings(max_examples=40, deadline=None)
def test_phash_bands_stable_and_bounded(img):
    from braintumor_data_pipeline_spark.operators.phash import (
        phash_bands_np,
    )

    b = phash_bands_np(img)
    assert b == phash_bands_np(img.copy())  # deterministic
    assert all(0 <= x < (1 << 16) for x in b)
    # exactly 32 bits set: the threshold is the 32nd order statistic,
    # so at most 32 coefficients can exceed it; with distinct values
    # exactly 32 do. Ties only reduce the count.
    assert sum(bin(x).count("1") for x in b) <= 32


@given(st.integers(0, 10**6), st.integers(0, 31), st.integers(0, 31))
@settings(max_examples=40, deadline=None)
def test_phash_single_pixel_flip_moves_few_bits(tag, y, x):
    """On GENERIC (noise) images a 1-LSB single-pixel change moves the
    hash by at most a few bits. Degenerate images (constant regions →
    massed DCT ties at the threshold) do NOT have this property — that
    is exactly why the registered query derives its pixel channel from
    md5 noise rather than the structured grid channel (phash.py
    _V_SPARK note), so the test generates the same class of input."""
    import hashlib

    import numpy as np

    from braintumor_data_pipeline_spark.operators.phash import (
        phash_bands_np,
    )

    img = np.array(
        [
            int(
                hashlib.md5(f"pp{tag}_{i}_{j}".encode()).hexdigest()[:2], 16
            )
            for i in range(32)
            for j in range(32)
        ],
        dtype=np.uint8,
    ).reshape(32, 32)
    pert = img.copy()
    pert[y, x] = pert[y, x] ^ 1  # ±1 LSB flip
    a, b = phash_bands_np(img), phash_bands_np(pert)
    ham = sum(bin(p ^ q).count("1") for p, q in zip(a, b))
    # single-coefficient perturbation ≤ 2^28 ≪ noise-DCT spread ~2^41;
    # a loose bound still catches wrong-axis / wrong-threshold bugs
    assert ham <= 8


@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=300))
@settings(max_examples=60, deadline=None)
def test_spectral_energy_nonneg_and_window_additive(samples):
    from braintumor_data_pipeline_spark.operators.multimodal import (
        SPEC_WIN,
        spectral_band_energy_np,
    )

    arr = np.array(samples, dtype=np.int16).reshape(-1, 1)
    e = spectral_band_energy_np(arr)
    assert all(x >= 0 for x in e)
    # energies are per-window additive: truncating to complete windows
    # and summing window-by-window must equal the one-shot result
    n_win = len(samples) // SPEC_WIN
    parts = [0, 0, 0, 0]
    for w in range(n_win):
        pe = spectral_band_energy_np(
            arr[w * SPEC_WIN : (w + 1) * SPEC_WIN]
        )
        parts = [a + b for a, b in zip(parts, pe)]
    assert e == parts


@given(st.sets(st.integers(0, 10**9), max_size=80))
@settings(max_examples=40, deadline=None)
def test_hll_estimate_monotone_registers(keys):
    """Registers from a superset dominate registers from a subset —
    HLL insert-monotonicity, which is what makes the streaming build
    (max-aggregation) order- and replay-independent."""
    import hashlib

    from braintumor_data_pipeline_spark.operators.sketch import (
        HLL_M,
        HLL_REST_BITS,
        hll_estimate,
    )

    def registers(ks):
        regs = [0] * HLL_M
        for k in ks:
            h = int(hashlib.md5(f"hll|{k}".encode()).hexdigest()[:12], 16)
            b, rest = h % HLL_M, h // HLL_M
            rho = (
                HLL_REST_BITS + 1
                if rest == 0
                else HLL_REST_BITS + 1 - rest.bit_length()
            )
            regs[b] = max(regs[b], rho)
        return regs

    sub = {k for k in keys if k % 2 == 0}
    r_all, r_sub = registers(keys), registers(sub)
    assert all(a >= s for a, s in zip(r_all, r_sub))
    assert hll_estimate(r_all) >= 0.0
