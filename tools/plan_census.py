"""Catalog-wide physical-plan census: for every registered query, count
Exchange / BroadcastExchange / Sort / Python-eval nodes in the initial
physical plan and rank by weight. Plan-building only — nothing executes.

Usage: python tools/plan_census.py [sf_dir] > /tmp/census.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from braintumor_data_pipeline_spark import registry
    from braintumor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-census")
    rows = []
    for name, spec in registry.all_queries().items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            rows.append((name, -1, -1, -1, -1, f"ERR {type(e).__name__}"))
            continue
        # count per-line on node-name prefixes so ReusedExchange (a free
        # runtime reuse, not a shuffle) is not tallied (ADVICE r12)
        heads = [
            ln.lstrip("+-*: |(0123456789) ") for ln in plan.splitlines()
        ]
        ex = sum(h.startswith("Exchange") for h in heads)
        bx = sum(h.startswith("BroadcastExchange") for h in heads)
        srt = plan.count("Sort ")
        py = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInArrow")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        rows.append((name, ex, bx, srt, py, ""))
    rows.sort(key=lambda r: -(r[1] + r[2]))
    print(f"{'query':45s} shuffles bcasts sorts py")
    for name, ex, bx, srt, py, err in rows:
        print(f"{name:45s} {ex:8d} {bx:6d} {srt:5d} {py:2d} {err}")
    spark.stop()


if __name__ == "__main__":
    main()
