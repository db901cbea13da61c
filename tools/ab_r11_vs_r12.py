"""Interleaved same-session A/B: r12 (current) vs r11 formulations of
ngram_jaccard_pairs and region_grow_component (VERDICT r12 item 1).

The r11 bodies are reconstructed inline from git history
(653aa74~1:operators/{dedup,segmentation}.py); the current bodies come
from the registry. Variants alternate within ONE session (A,B,A,B,...)
so box drift hits both arms equally — robust where a cross-round
bench-vs-bench comparison is not. Noop sink per guide §1.4.

Usage: python tools/ab_r11_vs_r12.py [-n N]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from braintumor_data_pipeline_spark.operators.segmentation import (
    GRID,
    SEED_YX,
    THRESHOLD,
    grid_images_df,
    region_growing_np,
)
from braintumor_data_pipeline_spark.operators.dedup import _t
from braintumor_data_pipeline_spark import registry
from braintumor_data_pipeline_spark.session import get_spark


# ---- r11 ngram_jaccard_pairs (verbatim reconstruction) ----------------


def _shingles_df_r11(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    starts = F.when(
        F.size(t) >= 3, F.sequence(F.lit(1), F.size(t) - 2)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ",
            F.element_at(t, i),
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
        ),
    )
    shingle_h = F.conv(
        F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10
    ).cast("bigint")
    return (
        toks.select("doc_id", F.explode(sh).alias("shingle"))
        .select("doc_id", shingle_h.alias("shingle"))
        .distinct()
    )


def ngram_r11(spark, sf_dir):
    sh = _shingles_df_r11(spark, sf_dir).persist()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("n_inter") * F.lit(1.0) / (
        F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("n_inter")
    )
    return (
        inter.join(F.broadcast(ca), F.col("ca.doc_id") == F.col("doc_a"))
        .join(F.broadcast(cb), F.col("cb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.05)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ---- r11 region_grow_component (verbatim reconstruction) --------------


def _bfs_apply_r11(pdf: pd.DataFrame) -> pd.DataFrame:
    img = np.zeros((GRID, GRID), dtype=np.uint8)
    img[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = pdf["v"].to_numpy()
    mask = region_growing_np(
        img, SEED_YX, threshold=THRESHOLD, connectivity=4,
        max_iterations=None, morphology=False,
    )
    ys, xs = np.nonzero(mask)
    return pd.DataFrame(
        {
            "image_id": np.full(
                len(ys), int(pdf["image_id"].iloc[0]), dtype="int32"
            ),
            "y": ys.astype("int32"),
            "x": xs.astype("int32"),
        }
    )


def region_grow_r11(spark, sf_dir):
    g = grid_images_df(spark, sf_dir)
    return g.groupBy("image_id").applyInPandas(
        _bfs_apply_r11, schema="image_id int, y int, x int"
    )


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_r11_vs_r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs = registry.all_queries()

    pairs = {
        "ngram_jaccard_pairs": (
            specs["ngram_jaccard_pairs"].fn,
            ngram_r11,
        ),
        "region_grow_component": (
            specs["region_grow_component"].fn,
            region_grow_r11,
        ),
    }

    out = {}
    for name, (cur_fn, r11_fn) in pairs.items():
        walls = {"r12": [], "r11": []}
        # warmup both arms once, untimed
        for fn in (cur_fn, r11_fn):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for i in range(n):
            # alternate starting arm each rep to cancel ordering effects
            order = (
                [("r12", cur_fn), ("r11", r11_fn)]
                if i % 2 == 0
                else [("r11", r11_fn), ("r12", cur_fn)]
            )
            for tag, fn in order:
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}:{i}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls[tag].append(time.time() - t0)
        out[name] = {
            tag: {
                "median": round(statistics.median(w), 3),
                "min": round(min(w), 3),
                "max": round(max(w), 3),
                "all": [round(x, 3) for x in w],
            }
            for tag, w in walls.items()
        }
        print(f"{name}: {out[name]}", flush=True)
    load = os.getloadavg()
    print(
        json.dumps(
            {
                "results": out,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "loadavg_1m": round(load[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
