"""Sketch guarantees: count-min overestimates, bloom never misses
(operators/sketch.py)."""

from __future__ import annotations

from braintumor_data_pipeline_spark.operators.sketch import (
    CM_SEEDS,
    CM_W,
    bloom_semijoin_reduction,
    countmin_build,
    countmin_heavy_hitters,
)
from braintumor_data_pipeline_spark.sources.fixtures import load_table


def test_countmin_overestimates_and_bounded_state(spark, sf_dir):
    rows = countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.est_count >= r.exact_count for r in rows)
    # estimates are sorted and the sketch itself is fixed-size
    ests = [r.est_count for r in rows]
    assert ests == sorted(ests, reverse=True)
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey AS key"
    )
    assert countmin_build(li).count() <= CM_SEEDS * CM_W


def test_bloom_no_false_negatives(spark, sf_dir):
    r = bloom_semijoin_reduction(spark, sf_dir).collect()[0]
    assert r.n_true <= r.n_bloom_pass <= r.n_total
    assert r.n_false_pos == r.n_bloom_pass - r.n_true
    # n_bloom_pass − n_false_pos is exactly the true matches that
    # passed; equality with n_true means NO true match was rejected —
    # the bloom contract.
    assert r.n_bloom_pass - r.n_false_pos == r.n_true
    assert r.n_true > 0


def test_hll_registers_and_estimate_accuracy(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.sketch import (
        HLL_M,
        hll_estimate,
        hll_register_sketch,
    )

    rows = hll_register_sketch(spark, sf_dir).collect()
    assert len(rows) == HLL_M
    regs = [r.register for r in sorted(rows, key=lambda r: r.bucket)]
    assert all(0 <= r <= 43 for r in regs)
    exact = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    est = hll_estimate(regs)
    # m=64 gives a ~13% standard error; 35% is a 2.7-sigma gate that
    # still catches any structural bug (off-by-one rho, wrong bucket).
    assert abs(est - exact) / exact < 0.35
