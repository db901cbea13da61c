"""Pixel-relation encoding of the reference's image operators (SURVEY §1.1).

The reference operates on dense uint8 arrays; the SQL-checkable encoding
is a pixel relation ``(image_id, y, x, v)``. Because the DuckDB oracle
can only see the fixture tables, the pixel relation is **derived
deterministically from ``orders``** (pure int64 arithmetic — identical
in both engines):

    image_id = o_orderkey % 4
    idx      = o_orderkey div 4          (unique per image: orderkeys unique)
    y        = idx % 128,  x = idx div 128
    v        = (o_orderkey * 2654435761) % 256     (Knuth multiplicative)
    v2       = (o_orderkey * 2246822519) % 256     (second channel for GT)

On this relation, DICOM windowing, min-max normalization, histograms and
argmax are plain SQL — which is exactly how they'd run over an exploded
100 TB pixel store (all per-image ops partition by image_id: one shuffle
key, perfectly parallel, no skew because images are equal-sized).

uint8-cast trap: numpy ``astype(np.uint8)`` TRUNCATES toward zero, Spark
``CAST(double AS INT)`` truncates, but DuckDB ``CAST`` ROUNDS — so every
cast here is an explicit ``floor()`` on both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table as _t

# DuckDB CTE producing the identical relation (integer ops only).
PIXELS_SQL = """
      SELECT CAST(o_orderkey % 4 AS INT) AS image_id,
             CAST((o_orderkey // 4) % 128 AS INT) AS y,
             CAST((o_orderkey // 4) // 128 AS INT) AS x,
             CAST((o_orderkey * 2654435761) % 256 AS INT) AS v,
             CAST((o_orderkey * 2246822519) % 256 AS INT) AS v2
      FROM orders
"""


def pixels_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic pixel relation (see module docstring)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    k = F.col("o_orderkey")
    idx = F.expr("o_orderkey div 4")
    return o.select(
        (k % 4).cast("int").alias("image_id"),
        (idx % 128).cast("int").alias("y"),
        F.expr("(o_orderkey div 4) div 128").cast("int").alias("x"),
        ((k * F.lit(2654435761)) % 256).cast("int").alias("v"),
        ((k * F.lit(2246822519)) % 256).cast("int").alias("v2"),
    )


@register(
    "pixel_relation",
    oracle=f"SELECT image_id, y, x, v, v2 FROM ({PIXELS_SQL})",
    tags=("pixels",),
)
def pixel_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pixels_df(spark, sf_dir)


# ---------------------------------------------------------------------------
# DICOM intensity windowing — BOTH reference variants (SURVEY X1 vs X2)
# ---------------------------------------------------------------------------
@register(
    "pixel_windowing",
    oracle=f"""
    SELECT image_id, y, x, v,
           CAST(floor((least(greatest(CAST(v AS DOUBLE), 79.5), 160.5) - 79.5)
                      / greatest(160.5 - 79.5, 1e-6) * 255.0) AS INT)
             AS v_win_pipeline,
           CAST(floor((least(greatest(CAST(v AS DOUBLE), 80.0), 160.0) - 80.0)
                      / (160.0 - 80.0) * 255.0) AS INT)
             AS v_win_app
    FROM ({PIXELS_SQL})
    """,
    tags=("pixels", "imaging"),
)
def pixel_windowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DICOM windowing with wc=120, ww=81 — deliberately odd width because
    the reference ships TWO disagreeing implementations:

    - pipeline variant (`dataflow_pipeline.py:30-39`): float ``ww/2.0``
      → low=79.5, high=160.5, denominator guarded by max(.,1e-6);
    - app variant (`preprocessor.py:150-158`): integer ``ww//2``
      → low=80, high=160, unguarded denominator.

    Both are kept, column-per-variant; floor() replicates astype(uint8).
    """
    wc, ww = 120.0, 81.0
    px = pixels_df(spark, sf_dir)
    vf = F.col("v").cast("double")

    lo_p, hi_p = wc - ww / 2.0, wc + ww / 2.0
    clip_p = F.least(F.greatest(vf, F.lit(lo_p)), F.lit(hi_p))
    win_p = F.floor(
        (clip_p - F.lit(lo_p)) / F.greatest(F.lit(hi_p - lo_p), F.lit(1e-6)) * 255.0
    ).cast("int")

    lo_a, hi_a = wc - ww // 2, wc + ww // 2
    clip_a = F.least(F.greatest(vf, F.lit(lo_a)), F.lit(hi_a))
    win_a = F.floor((clip_a - F.lit(lo_a)) / F.lit(hi_a - lo_a) * 255.0).cast("int")

    return px.select(
        "image_id", "y", "x", "v",
        win_p.alias("v_win_pipeline"),
        win_a.alias("v_win_app"),
    )


# ---------------------------------------------------------------------------
# Min-max normalization per image (SURVEY X3 / A6)
# ---------------------------------------------------------------------------
@register(
    "pixel_minmax_normalize",
    oracle=f"""
    SELECT image_id, y, x,
           CAST(floor((CAST(v AS DOUBLE) - mn) / greatest(mx - mn, 1e-6)
                      * 255.0) AS INT) AS v_norm
    FROM (
      SELECT image_id, y, x, v,
             CAST(min(v) OVER (PARTITION BY image_id) AS DOUBLE) AS mn,
             CAST(max(v) OVER (PARTITION BY image_id) AS DOUBLE) AS mx
      FROM ({PIXELS_SQL})
    )
    """,
    tags=("pixels", "imaging"),
)
def pixel_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v−min)/max(max−min,1e-6)·255 per image, the pipeline's guarded
    variant (`dataflow_pipeline.py:37-39`). min/max via window aggregates
    partitioned by image_id — one shuffle, no driver round-trip."""
    px = pixels_df(spark, sf_dir)
    w = Window.partitionBy("image_id")
    mn = F.min("v").over(w).cast("double")
    mx = F.max("v").over(w).cast("double")
    v_norm = F.floor(
        (F.col("v").cast("double") - mn) / F.greatest(mx - mn, F.lit(1e-6)) * 255.0
    ).cast("int")
    return px.select("image_id", "y", "x", v_norm.alias("v_norm"))


# ---------------------------------------------------------------------------
# Per-image fixed-bin histogram (SURVEY A7)
# ---------------------------------------------------------------------------
@register(
    "pixel_histogram",
    oracle=f"""
    SELECT image_id,
           CAST(least(floor((CAST(v AS DOUBLE) - mn) / ((mx - mn) / 50.0)),
                      49) AS BIGINT) AS bin_id,
           count(*) AS n
    FROM (
      SELECT image_id, v,
             CAST(min(v) OVER (PARTITION BY image_id) AS DOUBLE) AS mn,
             CAST(max(v) OVER (PARTITION BY image_id) AS DOUBLE) AS mx
      FROM ({PIXELS_SQL})
    )
    GROUP BY image_id, bin_id
    """,
    tags=("pixels", "histogram", "agg"),
)
def pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 equal-width bins over [min,max] per image (`app.py:185-208`),
    right-closed last bin (max → bin 49), np.histogram-compatible."""
    px = pixels_df(spark, sf_dir)
    w = Window.partitionBy("image_id")
    mn = F.min("v").over(w).cast("double")
    mx = F.max("v").over(w).cast("double")
    bin_id = F.least(
        F.floor((F.col("v").cast("double") - mn) / ((mx - mn) / F.lit(50.0))),
        F.lit(49),
    ).cast("bigint")
    return (
        px.select("image_id", bin_id.alias("bin_id"))
        .groupBy("image_id", "bin_id")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Auto-seed argmax with row-major tie-break (SURVEY A5, app.py:107-113)
# ---------------------------------------------------------------------------
@register(
    "pixel_argmax_seed",
    oracle=f"""
    SELECT image_id, y, x, v
    FROM (
      SELECT image_id, y, x, v,
             row_number() OVER (
               PARTITION BY image_id ORDER BY v DESC, y, x
             ) AS rn
      FROM ({PIXELS_SQL})
    )
    WHERE rn = 1
    """,
    tags=("pixels", "agg", "window"),
)
def pixel_argmax_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.unravel_index(np.argmax(img)) — the FIRST maximum in row-major
    order: order by (v DESC, y, x), keep row 1 per image."""
    px = pixels_df(spark, sf_dir)
    w = Window.partitionBy("image_id").orderBy(F.desc("v"), "y", "x")
    return (
        px.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("image_id", "y", "x", "v")
    )


@register(
    "pixel_histogram_equalize",
    oracle=f"""
    WITH px AS ({PIXELS_SQL}),
    counts AS (
      SELECT image_id, v, CAST(count(*) AS BIGINT) AS n_pixels
      FROM px GROUP BY image_id, v
    ),
    cdf AS (
      SELECT image_id, v, n_pixels,
             sum(n_pixels) OVER (PARTITION BY image_id ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             first_value(n_pixels) OVER (PARTITION BY image_id ORDER BY v)
               AS cdf_min,
             sum(n_pixels) OVER (PARTITION BY image_id) AS n
      FROM counts
    )
    SELECT image_id, v, n_pixels,
           CAST(((c - cdf_min) * 255) // greatest(n - cdf_min, 1)
                AS BIGINT) AS v_eq
    FROM cdf
    ORDER BY image_id, v
    """,
    tags=("pixels", "imaging", "window"),
)
def pixel_histogram_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global histogram equalization as pure relational algebra — the
    classic contrast stretch next to the reference's CLAHE (X4,
    `preprocessor.py`/`utils.py` use cv2's tile-based variant; this is
    the cv2.equalizeHist global form): LUT(v) = (cdf(v) − cdf_min)·255
    / (n − cdf_min), floored, where cdf_min is the cdf of the smallest
    PRESENT intensity. Output is the per-image LUT itself — one row
    per (image, distinct intensity) with its pixel count and equalized
    value; applying it is a broadcast join back onto the pixel
    relation. Everything is BIGINT (counts, prefix sums, one integer
    floor-division); all windows are image-partitioned and run over
    the per-(image, intensity) AGGREGATED grain (≤256 rows per image
    regardless of image size — the LUT never scales with pixels)."""
    px = pixels_df(spark, sf_dir)
    counts = px.groupBy("image_id", "v").agg(
        F.count("*").alias("n_pixels")
    )
    w_cdf = (
        Window.partitionBy("image_id")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_first = Window.partitionBy("image_id").orderBy("v")
    w_all = Window.partitionBy("image_id")
    cdf = counts.select(
        "image_id",
        "v",
        "n_pixels",
        F.sum("n_pixels").over(w_cdf).alias("c"),
        F.first("n_pixels").over(w_first).alias("cdf_min"),
        F.sum("n_pixels").over(w_all).alias("n"),
    )
    v_eq = F.expr(
        "((c - cdf_min) * 255) div greatest(n - cdf_min, 1)"
    ).cast("long")
    return cdf.select(
        "image_id", "v", "n_pixels", v_eq.alias("v_eq")
    ).orderBy("image_id", "v")
