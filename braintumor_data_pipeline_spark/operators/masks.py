"""Mask algebra + segmentation metrics as pure SQL (SURVEY §2.4 A3-A11,
§2.6, J1) over the synthetic pixel relation (see ``pixels.py``).

Masks: pred = (v ≥ 128), gt = (v2 ≥ 128) — two independent pseudo-random
bits per pixel. Elementwise mask comparison over same-shape arrays is an
equi-join on (image_id, y, x); here both bits live on one row already,
so the "join" is pre-fused and each metric is a conditional aggregation
(count_if per confusion quadrant) — one shuffle on image_id, map-side
partial aggregation, no UDFs.

Conventions replicated from the reference:
- Dice:      2·|A∩B|/(|A|+|B|);   both empty → 1.0 (`evaluation.py:88-93`)
- Jaccard:   |A∩B|/|A∪B|;          both empty → 1.0 (`evaluation.py:120-125`)
- Sens/Spec: tp/(tp+fn), tn/(tn+fp); zero denominator → 0 (`evaluation.py:154-156`)
- tumor probability: 0.4/0.3/0.3 heuristic blend, clamped to 1.0,
  empty region → 0.0 (`utils.py:136-159`)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from .pixels import PIXELS_SQL, pixels_df

_MASKED_SQL = f"""
      SELECT image_id, y, x, v,
             CASE WHEN v >= 128 THEN 1 ELSE 0 END AS pred,
             CASE WHEN v2 >= 128 THEN 1 ELSE 0 END AS gt
      FROM ({PIXELS_SQL})
"""

_CONFUSION_SQL = f"""
      SELECT image_id,
             CAST(sum(CASE WHEN pred = 1 AND gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred = 1 AND gt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN pred = 0 AND gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN pred = 0 AND gt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM ({_MASKED_SQL})
      GROUP BY image_id
"""


def masked_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = pixels_df(spark, sf_dir)
    return px.select(
        "image_id",
        "y",
        "x",
        "v",
        F.when(F.col("v") >= 128, 1).otherwise(0).alias("pred"),
        F.when(F.col("v2") >= 128, 1).otherwise(0).alias("gt"),
    )


def confusion_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = masked_df(spark, sf_dir)

    def quad(p: int, g: int) -> Column:
        return F.sum(
            F.when((F.col("pred") == p) & (F.col("gt") == g), 1).otherwise(0)
        )

    return m.groupBy("image_id").agg(
        quad(1, 1).alias("tp"),
        quad(1, 0).alias("fp"),
        quad(0, 1).alias("fn"),
        quad(0, 0).alias("tn"),
    )


@register(
    "mask_confusion",
    oracle=f"SELECT image_id, tp, fp, fn, tn FROM ({_CONFUSION_SQL})",
    tags=("masks", "agg"),
)
def mask_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP/FP/FN/TN per image (`evaluation.py:148-151`) — the four
    logical_and combinations as conditional counts."""
    return confusion_df(spark, sf_dir)


@register(
    "mask_metrics",
    oracle=f"""
    SELECT image_id,
           round(CASE WHEN 2*tp + fp + fn > 0
                      THEN 2.0 * tp / (2*tp + fp + fn) ELSE 1.0 END, 6)
             AS dice,
           round(CASE WHEN tp + fp + fn > 0
                      THEN tp * 1.0 / (tp + fp + fn) ELSE 1.0 END, 6)
             AS jaccard,
           round(CASE WHEN tp + fn > 0
                      THEN tp * 1.0 / (tp + fn) ELSE 0.0 END, 6)
             AS sensitivity,
           round(CASE WHEN tn + fp > 0
                      THEN tn * 1.0 / (tn + fp) ELSE 0.0 END, 6)
             AS specificity
    FROM ({_CONFUSION_SQL})
    """,
    tags=("masks", "agg"),
)
def mask_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dice, Jaccard, sensitivity, specificity per image with the
    reference's empty-mask conventions (see module docstring).
    2·|A∩B|/(|A|+|B|) rewritten on confusion counts: |A|+|B| = 2tp+fp+fn,
    |A∪B| = tp+fp+fn."""
    c = confusion_df(spark, sf_dir)
    tp, fp, fn, tn = (F.col(k) for k in ("tp", "fp", "fn", "tn"))
    dice = F.when(
        2 * tp + fp + fn > 0, 2.0 * tp / (2 * tp + fp + fn)
    ).otherwise(1.0)
    jac = F.when(tp + fp + fn > 0, tp * F.lit(1.0) / (tp + fp + fn)).otherwise(1.0)
    sens = F.when(tp + fn > 0, tp * F.lit(1.0) / (tp + fn)).otherwise(0.0)
    spec = F.when(tn + fp > 0, tn * F.lit(1.0) / (tn + fp)).otherwise(0.0)
    return c.select(
        "image_id",
        F.round(dice, 6).alias("dice"),
        F.round(jac, 6).alias("jaccard"),
        F.round(sens, 6).alias("sensitivity"),
        F.round(spec, 6).alias("specificity"),
    )


@register(
    "mask_region_means",
    oracle=f"""
    SELECT image_id, pred AS mask_bit,
           count(*) AS n_pixels,
           CAST(sum(v) AS DOUBLE) / count(*) AS mean_v
    FROM ({_MASKED_SQL})
    GROUP BY image_id, pred
    """,
    tags=("masks", "agg"),
)
def mask_region_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region vs non-region mean intensity (`utils.py:133-140`) + area
    (A3: np.sum(mask) = count of 1-pixels). Exact integer sum ÷ count —
    bit-identical both engines, no rounding boundary in the hash."""
    m = masked_df(spark, sf_dir)
    return (
        m.groupBy("image_id", F.col("pred").alias("mask_bit"))
        .agg(
            F.count("*").alias("n_pixels"),
            (F.sum(F.col("v").cast("long")).cast("double") / F.count("*"))
            .alias("mean_v"),
        )
    )


# Boundary-pixel perimeter proxy (SURVEY X9 alternative): a mask pixel is
# boundary if any 4-neighbor is off-mask or absent from the relation.
_BOUNDARY_SQL = f"""
      SELECT m.image_id, count(*) AS perimeter_px
      FROM ({_MASKED_SQL}) m
      WHERE m.pred = 1
        AND 4 > (
          SELECT count(*)
          FROM ({_MASKED_SQL}) nb
          WHERE nb.image_id = m.image_id AND nb.pred = 1
            AND abs(nb.y - m.y) + abs(nb.x - m.x) = 1
        )
      GROUP BY m.image_id
"""


@register(
    "mask_boundary_perimeter",
    oracle=f"""
    WITH m AS (SELECT image_id, y, x FROM ({_MASKED_SQL}) WHERE pred = 1),
    nbcount AS (
      SELECT a.image_id, a.y, a.x, count(b.y) AS nb
      FROM m a
      LEFT JOIN m b
        ON b.image_id = a.image_id
       AND abs(b.y - a.y) + abs(b.x - a.x) = 1
      GROUP BY a.image_id, a.y, a.x
    )
    SELECT image_id, count(*) AS perimeter_px
    FROM nbcount
    WHERE nb < 4
    GROUP BY image_id
    """,
    tags=("masks", "join", "agg"),
)
def mask_boundary_perimeter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perimeter via boundary-pixel count: a 4-neighbor self-join on the
    mask relation (the SQL-checkable proxy for cv2.arcLength contours,
    `evaluation.py:26-32`). Join condition is an equi-join on image_id
    plus the adjacency band — at scale, partitioned by image_id so each
    image's neighborhood join is local to one partition."""
    m = (
        masked_df(spark, sf_dir)
        .filter(F.col("pred") == 1)
        .select("image_id", "y", "x")
        .transform(persist_tracked)  # feeds both self-join sides; build the grid once
    )
    a = m.alias("a")
    b = m.alias("b")
    nbcount = (
        a.join(
            b,
            (F.col("b.image_id") == F.col("a.image_id"))
            & (
                (F.abs(F.col("b.y") - F.col("a.y")) + F.abs(F.col("b.x") - F.col("a.x")))
                == 1
            ),
            "left",
        )
        .groupBy(F.col("a.image_id").alias("image_id"), F.col("a.y"), F.col("a.x"))
        .agg(F.count(F.col("b.y")).alias("nb"))
    )
    return (
        nbcount.filter(F.col("nb") < 4)
        .groupBy("image_id")
        .agg(F.count("*").alias("perimeter_px"))
    )


@register(
    "tumor_probability",
    oracle=f"""
    WITH conf AS ({_CONFUSION_SQL}),
    stats AS (
      SELECT image_id,
             sum(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS area,
             count(*) AS n_pixels,
             avg(CASE WHEN pred = 1 THEN CAST(v AS DOUBLE) END) AS tumor_mean,
             avg(CASE WHEN pred = 0 THEN CAST(v AS DOUBLE) END) AS non_tumor_mean
      FROM ({_MASKED_SQL})
      GROUP BY image_id
    ),
    perim AS (
      WITH m AS (SELECT image_id, y, x FROM ({_MASKED_SQL}) WHERE pred = 1),
      nbcount AS (
        SELECT a.image_id, a.y, a.x, count(b.y) AS nb
        FROM m a
        LEFT JOIN m b
          ON b.image_id = a.image_id
         AND abs(b.y - a.y) + abs(b.x - a.x) = 1
        GROUP BY a.image_id, a.y, a.x
      )
      SELECT image_id, count(*) AS perimeter_px
      FROM nbcount WHERE nb < 4 GROUP BY image_id
    )
    SELECT s.image_id,
           round(CASE WHEN s.area = 0 THEN 0.0 ELSE least(1.0,
             0.4 * least(s.tumor_mean / (coalesce(s.non_tumor_mean, 0) + 1e-6)
                         / 2.0, 1.0)
           + 0.3 * greatest(0.0,
               1.0 - abs(s.area * 1.0 / s.n_pixels - 0.05) / 0.1)
           + 0.3 * least(4 * pi() * s.area
                         / (coalesce(p.perimeter_px, 0)
                            * coalesce(p.perimeter_px, 0) + 1e-6), 1.0)
           ) END, 6) AS probability
    FROM stats s
    LEFT JOIN perim p ON p.image_id = s.image_id
    """,
    tags=("masks", "scoring", "agg"),
)
def tumor_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's tumor-probability heuristic (`utils.py:136-159`):

        p = min(1, 0.4·min(contrast/2, 1)
                 + 0.3·max(0, 1 − |size_ratio − 0.05|/0.1)
                 + 0.3·min(compactness, 1)),  empty region → 0.0

    with contrast = tumor_mean/(non_tumor_mean+1e-6), compactness =
    4π·area/(perimeter²+1e-6). Perimeter is the boundary-pixel proxy
    (documented deviation: the reference uses cv2.arcLength)."""
    stats = (
        masked_df(spark, sf_dir)
        .groupBy("image_id")
        .agg(
            F.sum("pred").alias("area"),
            F.count("*").alias("n_pixels"),
            F.avg(F.when(F.col("pred") == 1, F.col("v").cast("double"))).alias(
                "tumor_mean"
            ),
            F.avg(F.when(F.col("pred") == 0, F.col("v").cast("double"))).alias(
                "non_tumor_mean"
            ),
        )
    )
    perim = mask_boundary_perimeter(spark, sf_dir).withColumnRenamed(
        "image_id", "p_image_id"
    )
    j = stats.join(
        F.broadcast(perim), stats.image_id == perim.p_image_id, "left"
    )
    contrast = F.col("tumor_mean") / (
        F.coalesce(F.col("non_tumor_mean"), F.lit(0.0)) + F.lit(1e-6)
    )
    size_ratio = F.col("area") * F.lit(1.0) / F.col("n_pixels")
    pperim = F.coalesce(F.col("perimeter_px"), F.lit(0)).cast("double")
    compact = (
        F.lit(4 * math.pi) * F.col("area") / (pperim * pperim + F.lit(1e-6))
    )
    prob = F.when(F.col("area") == 0, F.lit(0.0)).otherwise(
        F.least(
            F.lit(1.0),
            F.lit(0.4) * F.least(contrast / 2.0, F.lit(1.0))
            + F.lit(0.3)
            * F.greatest(
                F.lit(0.0), F.lit(1.0) - F.abs(size_ratio - 0.05) / F.lit(0.1)
            )
            + F.lit(0.3) * F.least(compact, F.lit(1.0)),
        )
    )
    return j.select("image_id", F.round(prob, 6).alias("probability"))


@register(
    "mask_moments_ellipse",
    oracle=f"""
    WITH px AS ({_MASKED_SQL}),
    mom AS (
      SELECT image_id,
             count(*) AS area,
             avg(CAST(x AS DOUBLE)) AS cx, avg(CAST(y AS DOUBLE)) AS cy,
             avg(CAST(x AS DOUBLE) * x) AS mxx,
             avg(CAST(y AS DOUBLE) * y) AS myy,
             avg(CAST(x AS DOUBLE) * y) AS mxy
      FROM px WHERE pred = 1
      GROUP BY image_id
    ),
    cov AS (
      SELECT image_id, area,
             mxx - cx * cx AS mu20,
             myy - cy * cy AS mu02,
             mxy - cx * cy AS mu11
      FROM mom
    ),
    eig AS (
      SELECT image_id, area,
             (mu20 + mu02 + sqrt(4 * mu11 * mu11
                                 + (mu20 - mu02) * (mu20 - mu02))) / 2 AS l1,
             (mu20 + mu02 - sqrt(4 * mu11 * mu11
                                 + (mu20 - mu02) * (mu20 - mu02))) / 2 AS l2
      FROM cov
    )
    SELECT image_id, area,
           round(4 * sqrt(l1), 6) AS major_axis,
           round(4 * sqrt(greatest(l2, 0)), 6) AS minor_axis,
           round(CASE WHEN l1 > 0 THEN sqrt(1 - l2 / l1) ELSE 0 END, 6)
             AS eccentricity
    FROM eig
    """,
    tags=("masks", "moments", "agg"),
)
def mask_moments_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ellipse-of-inertia properties of the WHOLE pred mask from image
    moments, as pure SQL aggregates: central second moments → covariance
    eigenvalues → axis lengths (4√λ) and eccentricity — the same public
    moment math `functions/regionprops.py` applies per component
    (X11's first-region/solidity variant stays UDF-side; the moments
    themselves are fully oracle-checkable)."""
    m = masked_df(spark, sf_dir).filter(F.col("pred") == 1)
    xd = F.col("x").cast("double")
    yd = F.col("y").cast("double")
    mom = m.groupBy("image_id").agg(
        F.count("*").alias("area"),
        F.avg(xd).alias("cx"),
        F.avg(yd).alias("cy"),
        F.avg(xd * xd).alias("mxx"),
        F.avg(yd * yd).alias("myy"),
        F.avg(xd * yd).alias("mxy"),
    )
    mu20 = F.col("mxx") - F.col("cx") * F.col("cx")
    mu02 = F.col("myy") - F.col("cy") * F.col("cy")
    mu11 = F.col("mxy") - F.col("cx") * F.col("cy")
    common = F.sqrt(4 * mu11 * mu11 + (mu20 - mu02) * (mu20 - mu02))
    l1 = (mu20 + mu02 + common) / 2
    l2 = (mu20 + mu02 - common) / 2
    return mom.select(
        "image_id",
        "area",
        F.round(4 * F.sqrt(l1), 6).alias("major_axis"),
        F.round(4 * F.sqrt(F.greatest(l2, F.lit(0.0))), 6).alias("minor_axis"),
        F.round(
            F.when(l1 > 0, F.sqrt(1 - l2 / l1)).otherwise(0.0), 6
        ).alias("eccentricity"),
    )
