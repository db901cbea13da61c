"""Perceptual-hash image near-dup: kernel determinism, perturbation
robustness, and the banded-join pair query (operators/phash.py)."""

from __future__ import annotations

import hashlib

import numpy as np

from braintumor_data_pipeline_spark.operators.phash import (
    COEF,
    GRID,
    phash_bands_np,
    phash_hamming_pairs,
    phash_signatures,
)


def _md5_noise_image(tag: str) -> np.ndarray:
    v = np.array(
        [
            int(hashlib.md5(f"{tag}_{y}_{x}".encode()).hexdigest()[:2], 16)
            for y in range(GRID)
            for x in range(GRID)
        ],
        dtype=np.uint8,
    )
    return v.reshape(GRID, GRID)


def _hamming(a, b) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_coef_table_shape_and_symmetry():
    # 8 frequency rows over a 32-sample axis; DC row is the constant
    # scale; odd rows are antisymmetric, even rows symmetric (cosine).
    assert len(COEF) == 8 and all(len(r) == GRID for r in COEF)
    assert all(c == 1 << 14 for c in COEF[0])
    for u in (1, 3, 5, 7):
        assert all(
            COEF[u][i] == -COEF[u][GRID - 1 - i] for i in range(GRID)
        )
    for u in (2, 4, 6):
        assert all(COEF[u][i] == COEF[u][GRID - 1 - i] for i in range(GRID))


def test_bands_deterministic_and_16bit():
    img = _md5_noise_image("pht0")
    b = phash_bands_np(img)
    assert b == phash_bands_np(img.copy())
    assert all(0 <= x < (1 << 16) for x in b)
    # a different image hashes differently
    assert b != phash_bands_np(_md5_noise_image("pht1"))


def test_small_perturbation_small_hamming():
    yy, xx = np.mgrid[0:GRID, 0:GRID]
    lattice = (((xx + yy) % 13) == 0).astype(np.int64)
    for tag in ("pha", "phb", "phc"):
        img = _md5_noise_image(tag)
        pert = np.minimum(255, img.astype(np.int64) + 8 * lattice).astype(
            np.uint8
        )
        assert _hamming(phash_bands_np(img), phash_bands_np(pert)) <= 4
    # a heavy, dense perturbation moves the hash far
    heavy = ((_md5_noise_image("pha").astype(np.int64) + 128) % 256).astype(
        np.uint8
    )
    assert _hamming(phash_bands_np(_md5_noise_image("pha")), phash_bands_np(heavy)) > 10


def test_pair_query_finds_each_variant(spark, sf_dir):
    # sf0.001 has exactly one complete grid image → pids {0, 1}; the
    # perturbed variant must surface as the (0, 1) near-dup pair.
    sigs = {r.pid for r in phash_signatures(spark, sf_dir).collect()}
    assert sigs == {0, 1}
    pairs = phash_hamming_pairs(spark, sf_dir).collect()
    assert [(p.pid_a, p.pid_b) for p in pairs] == [(0, 1)]
    assert pairs[0].hamming <= 4
