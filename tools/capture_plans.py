"""Capture .explain("formatted") for the bench headline queries into
plans/r<round>/<query>_<tag>.txt — the optimization round's plan evidence.

Usage: python tools/capture_plans.py <tag> [round] [name ...]
  tag   : "before" | "after" (file suffix)
  round : default r12
  names : default = bench HEADLINE set + etl pipeline
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    rnd = sys.argv[2] if len(sys.argv) > 2 else "r12"
    from braintumor_data_pipeline_spark import registry
    from braintumor_data_pipeline_spark.session import get_spark
    import bench

    names = sys.argv[3:] or list(bench.HEADLINE) + ["etl_pipeline_48imgs"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    specs = registry.all_queries()
    etl_dir = None
    for name in names:
        if name == "etl_pipeline_48imgs":
            from braintumor_data_pipeline_spark.plans.etl import (
                process_dicom_files,
            )

            etl_dir = etl_dir or bench._make_etl_inputs()
            df = process_dicom_files(spark, etl_dir)
        else:
            df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
