"""Region properties (SURVEY X11) — numpy reimplementation of the
skimage.measure.regionprops subset used by `evaluation.py:41-58`:
eccentricity, major/minor axis length, solidity — computed for the FIRST
labeled region only (labels in scan order), zeros for an empty mask.

Method (public image-moment math):
- central second moments μ20, μ02, μ11 over the region's pixel coords;
- covariance eigenvalues λ1 ≥ λ2 → axis lengths 4√λ, eccentricity
  √(1 − λ2/λ1) (the standard ellipse-of-inertia definitions skimage
  uses);
- solidity = area / convex_area where convex_area counts pixels whose
  centers lie in the convex hull (monotone-chain hull + per-row
  rasterization).
"""

from __future__ import annotations

import math

import numpy as np


def _label_first_region(mask: np.ndarray) -> np.ndarray:
    """Return the first 8-connected component in row-major scan order
    (matches skimage's label ordering for props[0])."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros_like(mask, dtype=bool)
    from collections import deque

    h, w = mask.shape
    start = (int(ys[0]), int(xs[0]))
    seen = np.zeros((h, w), dtype=bool)
    seen[start] = True
    q = deque([start])
    while q:
        y, x = q.popleft()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                    seen[ny, nx] = True
                    q.append((ny, nx))
    return seen


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull; points (N,2) as (y,x) float."""
    pts = points[np.lexsort((points[:, 1], points[:, 0]))]
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def _point_in_hull(y: float, x: float, hull: np.ndarray, eps: float = 1e-9) -> bool:
    n = len(hull)
    if n == 1:
        return abs(y - hull[0][0]) < eps and abs(x - hull[0][1]) < eps
    if n == 2:
        a, b = hull
        cr = (b[0] - a[0]) * (x - a[1]) - (b[1] - a[1]) * (y - a[0])
        if abs(cr) > eps:
            return False
        return (
            min(a[0], b[0]) - eps <= y <= max(a[0], b[0]) + eps
            and min(a[1], b[1]) - eps <= x <= max(a[1], b[1]) + eps
        )
    for i in range(n):
        a = hull[i]
        b = hull[(i + 1) % n]
        cr = (b[0] - a[0]) * (x - a[1]) - (b[1] - a[1]) * (y - a[0])
        if cr < -eps:
            return False
    return True


def region_properties_exact(mask: np.ndarray) -> dict[str, float] | None:
    """Hash-stable regionprops of the first region (SURVEY X11) — the
    same quantities as :func:`region_properties`, but computed through a
    DAG a SQL engine can replay bit-for-bit:

    - the ellipse terms derive from EXACT integer pixel-coordinate sums
      (n, Σy, Σx, Σy², Σx², Σxy — all < 2^53, lossless in float64) via
      ``μ20 = Σy²/n − (Σy/n)² + 1/12`` etc.; every +,−,×,÷,√ is a single
      correctly-rounded IEEE op, so DuckDB running the identical formula
      on the identical integers produces the identical doubles (the
      ``imaging_udf_stats`` technique; no ``x**2``/``pow`` — only ``x*x``,
      since ``pow`` is not required to be correctly rounded);
    - ``convex_area`` reuses the rasterized hull count, which is provably
      the integer row-interval count of the hull cross-section: interior
      tests are cross products of integers ≤ 31 (exact in float64) and
      the hull∩row endpoints are rationals p/q with q ≤ 31, so the 1e-9
      tie epsilon can never straddle a pixel center (min non-zero
      distance to an integer is 1/(31·30) ≈ 1e-3) — a SQL oracle can
      recompute it with exact integer interpolation (pairwise segment
      min/max per row, scaled by lcm(1..31));
    - floats are surfaced as ``floor(x·1e6)`` BIGINTs (no decimal-string
      rounding semantics in the loop — the ssim_window_map tie-safety
      rule); ``solidity`` is an exact int/int division, identical on both
      engines.

    Returns None for an empty mask (the SQL side emits no row — the
    relational encoding of "no region").
    """
    region = _label_first_region(mask > 0)
    ys, xs = np.nonzero(region)
    n = len(ys)
    if n == 0:
        return None
    y64, x64 = ys.astype(np.int64), xs.astype(np.int64)
    sy, sx = int(y64.sum()), int(x64.sum())
    syy = int((y64 * y64).sum())
    sxx = int((x64 * x64).sum())
    sxy = int((y64 * x64).sum())
    cy, cx = sy / n, sx / n
    mu20 = syy / n - cy * cy + 1.0 / 12.0
    mu02 = sxx / n - cx * cx + 1.0 / 12.0
    mu11 = sxy / n - cy * cx
    tr = mu20 + mu02
    disc = max((tr / 2) * (tr / 2) - (mu20 * mu02 - mu11 * mu11), 0.0)
    s = math.sqrt(disc)
    l1 = tr / 2 + s
    l2 = max(tr / 2 - s, 0.0)
    ecc = math.sqrt(1.0 - l2 / l1) if l1 > 0 else 0.0

    pts = np.stack([ys.astype(float), xs.astype(float)], axis=1)
    hull = _convex_hull(pts)
    convex_area = 0
    for y in range(int(ys.min()), int(ys.max()) + 1):
        for x in range(int(xs.min()), int(xs.max()) + 1):
            if _point_in_hull(float(y), float(x), hull):
                convex_area += 1
    return {
        "area": n,
        "convex_area": convex_area,
        "solidity": n / convex_area,
        "ecc_micro": int(math.floor(ecc * 1e6)),
        "major_micro": int(math.floor(4.0 * math.sqrt(l1) * 1e6)),
        "minor_micro": int(math.floor(4.0 * math.sqrt(l2) * 1e6)),
    }


def region_properties(mask: np.ndarray) -> dict[str, float]:
    """eccentricity, major/minor axis length, solidity of the first
    region; all zeros when the mask is empty (`evaluation.py:54-58`)."""
    region = _label_first_region(mask > 0)
    ys, xs = np.nonzero(region)
    area = float(len(ys))
    if area == 0:
        return {
            "eccentricity": 0.0,
            "major_axis_length": 0.0,
            "minor_axis_length": 0.0,
            "solidity": 0.0,
        }
    cy, cx = ys.mean(), xs.mean()
    dy, dx = ys - cy, xs - cx
    # normalized central moments + the 1/12 pixel-extent correction
    # skimage applies via its inertia tensor
    mu20 = float((dy * dy).mean()) + 1.0 / 12.0
    mu02 = float((dx * dx).mean()) + 1.0 / 12.0
    mu11 = float((dy * dx).mean())
    tr = mu20 + mu02
    det = mu20 * mu02 - mu11 * mu11
    disc = max((tr / 2) ** 2 - det, 0.0)
    l1 = tr / 2 + disc**0.5
    l2 = max(tr / 2 - disc**0.5, 0.0)
    major = 4.0 * l1**0.5
    minor = 4.0 * l2**0.5
    ecc = (1.0 - l2 / l1) ** 0.5 if l1 > 0 else 0.0

    pts = np.stack([ys.astype(float), xs.astype(float)], axis=1)
    hull = _convex_hull(pts)
    y0, y1 = int(ys.min()), int(ys.max())
    x0, x1 = int(xs.min()), int(xs.max())
    convex_area = 0
    for y in range(y0, y1 + 1):
        for x in range(x0, x1 + 1):
            if _point_in_hull(float(y), float(x), hull):
                convex_area += 1
    solidity = area / convex_area if convex_area else 0.0
    return {
        "eccentricity": ecc,
        "major_axis_length": major,
        "minor_axis_length": minor,
        "solidity": solidity,
    }
