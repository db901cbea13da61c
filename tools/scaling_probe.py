"""Empirical scaling probe: how do the headline aggregates scale as the
fact table grows N×?

The 100 TB argument in SCALE.md is structural (shuffle shapes, partial
aggregation, broadcast joins); this probe adds measurement. It
replicates the sf0.1 lineitem N× (union of N shifted copies — key
ranges offset so join/group cardinalities scale with the data, the way
a bigger SF would), writes it to a temp parquet, and times a
scan-heavy aggregate (pricing_summary shape) and a shuffle-heavy
group-by at each N. Near-linear wall-clock growth with flat per-row
cost is the local-mode signature of a plan whose cost is dominated by
the scan + map-side combine — the shape that scales out on a cluster.

Usage: python tools/scaling_probe.py [sf_dir] [factors...]
Writes one JSON line per factor; temp data is removed afterwards.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from braintumor_data_pipeline_spark.session import get_spark
from braintumor_data_pipeline_spark.sources.fixtures import load_table
from braintumor_data_pipeline_spark.functions.money import dec_col


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="scaling-probe")
    base = load_table(spark, sf_dir, "lineitem")
    n_base = base.count()
    tmp = tempfile.mkdtemp(prefix="scaling_probe_")
    try:
        for n in factors:
            path = os.path.join(tmp, f"x{n}")
            copies = [
                base.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)
                )
                for i in range(n)
            ]
            df = copies[0]
            for c in copies[1:]:
                df = df.unionAll(c)
            df.write.mode("overwrite").parquet(path)
            li = spark.read.parquet(path)

            t0 = time.time()
            li.filter(F.col("l_shipdate") <= "1998-09-02").groupBy(
                "l_returnflag", "l_linestatus"
            ).agg(
                F.sum(dec_col("l_quantity")).alias("sq"),
                F.sum(dec_col("l_extendedprice")).alias("sp"),
                F.count("*").alias("c"),
            ).collect()
            t_scan = time.time() - t0

            t0 = time.time()
            li.groupBy("l_orderkey").agg(
                F.count("*").alias("c"), F.max("l_extendedprice").alias("m")
            ).agg(F.count("*"), F.sum("c")).collect()
            t_shuffle = time.time() - t0

            rows = n_base * n
            print(
                json.dumps(
                    {
                        "factor": n,
                        "rows": rows,
                        "scan_agg_s": round(t_scan, 3),
                        "shuffle_agg_s": round(t_shuffle, 3),
                        "scan_ns_per_row": round(t_scan / rows * 1e9, 1),
                        "shuffle_ns_per_row": round(t_shuffle / rows * 1e9, 1),
                    }
                )
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
