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


def test_hll_merge_equals_direct_union(spark, sf_dir):
    """Bucket-wise max of per-group registers must equal the registers
    built directly from the union of all keys — the mergeability
    identity that makes distributed/incremental HLL correct."""
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.operators.sketch import (
        hll_bucket_rho,
        hll_mergeable_groups,
        hll_spine_registers,
    )

    out = hll_mergeable_groups(spark, sf_dir)
    merged = {
        r.bucket: r.register
        for r in out.filter(F.col("grp") == "__merged__").collect()
    }
    direct_keys = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
    )
    direct = {
        r.bucket: r.register
        for r in hll_spine_registers(hll_bucket_rho(direct_keys)).collect()
    }
    assert merged == direct


def test_containment_catches_doc_in_doc_where_jaccard_cannot(spark):
    """A short doc embedded whole in a long one: containment ≈ 1,
    Jaccard small — the asymmetric measure's reason to exist."""
    from pyspark.sql import functions as F

    import braintumor_data_pipeline_spark.operators.dedup as dd

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} w{i + 1} w{i + 2}" for i in range(0, 300, 3))
    long_doc = filler + " " + short + " " + filler
    df = spark.createDataFrame(
        [(1, short, "en", "t", len(short)),
         (2, long_doc, "en", "t", len(long_doc))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.createOrReplaceTempView("containment_fixture")
    toks = df.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    starts = F.when(
        F.size(t) >= 3, F.sequence(F.lit(1), F.size(t) - 2)
    ).otherwise(F.array().cast("array<int>"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i),
                    F.element_at(t, i + 1),
                    F.element_at(t, i + 2),
                ),
            )
        ).alias("shingle"),
    ).distinct()
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()
    )
    n_short = sh.filter("doc_id = 1").count()
    n_long = sh.filter("doc_id = 2").count()
    cont = inter / n_short
    jac = inter / (n_short + n_long - inter)
    assert cont >= 0.9  # the short doc is (almost) fully contained
    assert jac < 0.2    # Jaccard would never flag this pair


def test_hll_intersection_estimate_error_bounded(spark, sf_dir):
    """Raw-HLL inclusion-exclusion: each set estimate within ~3 std
    errors (1.04/sqrt(64) ≈ 13% per sketch) of exact; the intersection
    (difference of three estimates) gets a looser additive bound."""
    from braintumor_data_pipeline_spark.operators.sketch import (
        hll_set_intersection_estimate,
    )

    r = hll_set_intersection_estimate(spark, sf_dir).collect()[0]
    for est, exact in ((r.est_a, r.exact_a), (r.est_b, r.exact_b)):
        assert abs(est - exact) / max(exact, 1) < 0.5
    assert abs(r.est_inter - r.exact_inter) <= 0.5 * max(
        r.exact_a, r.exact_b, 1
    )
