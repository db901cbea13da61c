"""Property tests for the r5 operators — invariants the DuckDB
value-parity oracle cannot express (they hold for ANY input, not just
the fixture's values), asserted at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from braintumor_data_pipeline_spark import registry


def _run(spark, sf_dir, name):
    return registry.all_queries()[name].fn(spark, sf_dir).collect()


def test_set_cover_greedy_invariants(spark, sf_dir):
    rows = _run(spark, sf_dir, "greedy_set_cover_top5")
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    docs = [r["doc_id"] for r in rows]
    assert len(set(docs)) == len(docs), "a doc was picked twice"
    gains = [r["gain"] for r in rows]
    # greedy marginal gains are non-increasing: round k+1's best doc was
    # available at round k, so its gain then was >= its gain now
    assert all(a >= b for a, b in zip(gains, gains[1:])), gains
    assert all(g > 0 for g in gains)


def test_cuped_invariants(spark, sf_dir):
    rows = _run(spark, sf_dir, "cuped_adjusted_uplift")
    assert sorted(r["arm"] for r in rows) == ["A", "B"]
    for r in rows:
        # rho^2 is a squared correlation
        assert 0.0 <= r["var_reduction"] <= 1.0
        assert r["mean_cuped"] is not None
        assert r["n_users"] > 0


def test_snapshot_diff_partition_of_keys(spark, sf_dir):
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = _run(spark, sf_dir, "state_snapshot_diff")
    kinds = {r["change_kind"]: r["n_keys"] for r in rows}
    assert set(kinds) <= {"added", "changed", "unchanged", "removed"}
    assert kinds.get("removed", 0) == 0  # event state only grows
    # the census partitions snapshot B's key set exactly
    e = load_table(spark, sf_dir, "events")
    n_keys_b = (
        e.select("user_id", F.date_trunc("week", "ts").alias("wk"))
        .distinct()
        .count()
    )
    assert sum(kinds.values()) == n_keys_b


def test_copurchase_triangle_bounds(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "copurchase_triangle_stats")
    assert row["n_edges"] > 0
    # every triangle contributes 3 wedges
    assert row["n_wedges"] >= 3 * row["n_triangles"]
    assert 0.0 <= row["transitivity"] <= 1.0


def test_jackknife_influence_sums_to_zero(spark, sf_dir):
    rows = _run(spark, sf_dir, "jackknife_source_influence")
    # sum_g (s_g*N - S*n_g) = S*N - S*N = 0 exactly, in integers
    assert sum(r["influence_num"] for r in rows) == 0
    for r in rows:
        assert r["influence_den"] > 0


def test_frequency_cap_census(spark, sf_dir):
    rows = _run(spark, sf_dir, "source_frequency_cap")
    for r in rows:
        assert r["n_kept"] <= 10
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_kept"] == min(10, r["n_docs"])
