"""Invariants for the experiments module (A/B stats, robust stats,
mergeable sketches) — mathematical properties the oracle hash can't
express, checked at sf0.001."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from braintumor_data_pipeline_spark.operators import experiments as X
from braintumor_data_pipeline_spark.sources.fixtures import load_table


def test_chi_square_cells_partition_users(spark, sf_dir):
    row = X.ab_chi_square_conversion(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert row.conv_a + row.nonconv_a + row.conv_b + row.nonconv_b == n_users
    assert row.chi2 is None or row.chi2 >= 0.0


def test_welch_t_sign_matches_means(spark, sf_dir):
    row = X.ab_welch_t_purchase_value(spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert (row.welch_t > 0) == (row.mean_a > row.mean_b)


def test_winsorized_bounds_and_moments(spark, sf_dir):
    rows = X.winsorized_event_value_stats(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    raw = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert rows
    for r in rows:
        assert raw[r.event_type].lo <= r.lo_bound <= r.hi_bound
        assert r.hi_bound <= raw[r.event_type].hi
        assert r.lo_bound <= r.wins_mean <= r.hi_bound
        assert r.wins_std >= 0.0
        # clipping can only shrink population std
        full_std = (
            e.filter(F.col("event_type") == r.event_type)
            .agg(F.stddev_pop("value"))
            .collect()[0][0]
        )
        assert r.wins_std <= full_std + 1e-9


def test_kl_terms_sum_nonnegative_and_shares_partition(spark, sf_dir):
    rows = X.kl_domain_balance(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # Gibbs: total KL >= 0 (individual terms may be negative)
    assert sum(r.kl_term for r in rows) >= -1e-9


def test_variance_merge_is_exact_everywhere(spark, sf_dir):
    rows = X.mergeable_variance_states(spark, sf_dir).collect()
    assert rows
    assert all(r.merge_exact == 1 for r in rows)


def test_binned_quantile_brackets_exact_quantile(spark, sf_dir):
    rows = {r.q: r for r in X.binned_quantile_sketch(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    vals = sorted(r[0] for r in o.select("o_totalprice").collect())
    n = len(vals)
    for q, r in rows.items():
        exact = vals[max(0, math.ceil(q * n) - 1)]
        assert r.est_lo_edge <= exact <= r.est_hi_edge + 1e-6
        assert 0 <= r.bin <= 1023


def test_token_entropy_bounds(spark, sf_dir):
    rows = X.token_entropy_quality(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # entropy is rounded to 6dp in-query → allow the half-ulp slack
        assert -1e-6 <= r.entropy <= math.log(r.n_tokens) + 1e-6
        if r.n_distinct == 1:
            assert abs(r.entropy) < 1e-6
        # max entropy iff all tokens distinct
        if r.n_distinct == r.n_tokens and r.n_tokens > 1:
            assert abs(r.entropy - math.log(r.n_tokens)) < 1e-6


def test_ols_r2_in_unit_interval_and_slope_positive(spark, sf_dir):
    import numpy as np

    rows = X.ols_price_on_quantity(spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        # cross-check the sum algebra against numpy's lstsq per group
        xy = li.filter(F.col("l_returnflag") == r.l_returnflag).select(
            "l_quantity", "l_extendedprice"
        ).collect()
        x = np.array([v[0] for v in xy])
        y = np.array([v[1] for v in xy])
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope - slope) < 1e-3
        assert abs(r.intercept - intercept) < 1e-2


def test_ks_and_mwu_ranges(spark, sf_dir):
    ks = X.ks_two_sample_purchase_value(spark, sf_dir).collect()[0]
    assert 0.0 <= ks.ks_d <= 1.0
    assert ks.d_numer <= ks.n_a * ks.n_b

    mwu = X.mann_whitney_u_purchase_value(spark, sf_dir).collect()[0]
    assert 0 <= mwu.two_u_a <= 2 * mwu.n_a * mwu.n_b
    assert 0.0 <= mwu.u_a_frac <= 1.0
    # same arms → same sample sizes across the two tests
    assert (mwu.n_a, mwu.n_b) == (ks.n_a, ks.n_b)


def test_ks_detects_identical_distributions_as_zero(spark, sf_dir):
    """Sanity of the KS algebra: comparing an arm against itself must
    give D = 0 — replay the integer formula on a degenerate split."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = e.select(F.round(F.col("value") * 100).cast("long").alias("c"))
    # duplicate every row into both pseudo-arms
    both = cents.withColumn("arm", F.explode(F.array(F.lit("A"), F.lit("B"))))
    per_v = both.groupBy("c").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("cb"),
    )
    row = per_v.agg(
        F.max(F.abs(F.col("ca") - F.col("cb"))).alias("maxdiff")
    ).collect()[0]
    assert row.maxdiff == 0


def test_acf_bounded_and_complete(spark, sf_dir):
    rows = X.acf_daily_revenue(spark, sf_dir).collect()
    assert [r.lag_k for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    for r in rows:
        assert -1.0 - 1e-6 <= r.acf <= 1.0 + 1e-6


def test_dow_seasonality_weighted_mean_is_one(spark, sf_dir):
    rows = X.dow_seasonality_profile(spark, sf_dir).collect()
    assert len(rows) == 7
    total_days = sum(r.n_days for r in rows)
    weighted = sum(r.seasonal_index * r.n_days for r in rows) / total_days
    assert abs(weighted - 1.0) < 1e-4
    assert all(r.seasonal_index > 0 for r in rows)


def test_time_to_conversion_order_stats_monotone(spark, sf_dir):
    r = X.time_to_conversion_stats(spark, sf_dir).collect()[0]
    assert r.n_converted > 0
    assert r.min_s <= r.median_s <= r.p90_s <= r.max_s
    assert r.min_s >= 0
    e = load_table(spark, sf_dir, "events")
    assert r.n_converted <= e.select("user_id").distinct().count()


def test_bootstrap_ci_brackets_and_replicates(spark, sf_dir):
    r = X.bootstrap_ci_mean_purchase(spark, sf_dir).collect()[0]
    assert r.n_replicates == 32
    assert r.lo_rep <= r.ci_lo <= r.ci_hi <= r.hi_rep
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    true_mean = e.agg(F.avg("value")).collect()[0][0]
    # replicate means are half-samples of the same population — the
    # full-sample mean must land inside (or within a hair of) the
    # replicate envelope
    spread = max(r.hi_rep - r.lo_rep, 0.01)
    assert r.lo_rep - spread <= true_mean <= r.hi_rep + spread


def test_psi_terms_and_bins(spark, sf_dir):
    rows = X.psi_value_drift_halves(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bin <= 9
        assert r.n_ref > 0 and r.n_cur > 0
        # each PSI term is nonnegative by construction (p−q)ln(p/q) ≥ 0
        assert r.psi_term >= -1e-6
    # two halves of the same stationary stream → low drift
    assert sum(r.psi_term for r in rows) < 0.25


def test_decile_lift_partitions_and_lorenz(spark, sf_dir):
    rows = X.decile_lift_table(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    # deciles ordered by spend desc → monotone nonincreasing share
    shares = [r.revenue_share for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(shares, shares[1:]))
    assert rows[0].lift >= 1.0


def test_feature_scaling_stats_shape_and_bounds(spark, sf_dir):
    rows = X.feature_scaling_stats(spark, sf_dir).collect()
    assert [r.dim for r in rows] == list(range(1, 65))
    for r in rows:
        assert r.min_v <= r.mean <= r.max_v
        assert r.std >= 0.0


def test_label_chi2_identity_vs_direct(spark, sf_dir):
    r = X.label_uniformity_chi2(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "embeddings")
    obs = [x[1] for x in e.groupBy("label").count().collect()]
    n, k = sum(obs), len(obs)
    direct = sum((o - n / k) ** 2 / (n / k) for o in obs)
    assert abs(r.chi2 - direct) < 1e-4
    assert r.dof == k - 1


def test_mutual_information_nonnegative_total(spark, sf_dir):
    rows = X.mutual_information_lang_source(spark, sf_dir).collect()
    assert rows
    total = sum(r.mi_term for r in rows)
    assert total >= -1e-6
    # MI ≤ min(H(lang), H(source)) ≤ ln(cell count) — loose sanity cap
    import math

    assert total <= math.log(len(rows)) + 1e-6


def test_median_imputation_counts_and_mean_shift(spark, sf_dir):
    rows = X.median_imputation_report(spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    totals = {
        r[0]: r[1] for r in li.groupBy("l_returnflag").count().collect()
    }
    for r in rows:
        assert r.n_rows == totals[r.l_returnflag]
        # ~12.5% masked (md5 first hex < '2' = 2/16)
        frac = r.n_imputed / r.n_rows
        assert 0.05 < frac < 0.22
        # imputed value is the median of survivors → within group range
        assert r.imputed_value > 0
        assert abs(r.mean_after_impute - r.imputed_value) < r.mean_after_impute


def test_event_path_trigrams_counts(spark, sf_dir):
    rows = X.event_path_trigrams_top10(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.n >= rows[-1].n for r in rows)
    e = load_table(spark, sf_dir, "events")
    # total trigrams = sum over users of max(0, n_events - 2)
    per_user = e.groupBy("user_id").count().collect()
    total_tri = sum(max(0, r[1] - 2) for r in per_user)
    assert sum(r.n for r in rows) <= total_tri


def test_backtest_wmape_ranges(spark, sf_dir):
    r = X.backtest_naive_wmape(spark, sf_dir).collect()[0]
    assert r.n_days_scored > 0
    assert 0.0 <= r.wmape_naive1
    assert 0.0 <= r.wmape_naive7
    assert abs(r.bias_naive7) <= r.wmape_naive7 + 1e-9
    assert r.seasonal_wins in (0, 1)


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    rows = X.kaplan_meier_user_lifetime(spark, sf_dir).collect()
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9
        prev = r.survival
        assert r.n_events >= 1
        assert r.n_at_risk >= r.n_events
    # risk sets shrink over time
    risks = [r.n_at_risk for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))


def test_cohort_ltv_monotone_within_cohort(spark, sf_dir):
    rows = X.cohort_ltv_curve(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_w].append(r)
    for members in by_cohort.values():
        ltvs = [m.cum_ltv_per_user for m in members]
        assert all(a <= b + 1e-9 for a, b in zip(ltvs, ltvs[1:]))
        assert all(m.week_idx >= 0 for m in members)


def test_with_ties_includes_full_tie_group(spark, sf_dir):
    rows = X.top_orders_with_ties(spark, sf_dir).collect()
    assert len(rows) >= 10
    # every price at the boundary rank appears fully: rank gaps follow
    # tie-group sizes
    from collections import Counter

    by_rank = Counter(r.rnk for r in rows)
    seen = 1
    for rnk in sorted(by_rank):
        assert rnk == seen
        seen += by_rank[rnk]


def test_dau_split_partitions(spark, sf_dir):
    rows = X.dau_new_vs_returning(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.dau == r.new_users + r.returning_users
    # all users are new on day 1; new-user counts sum to user total
    assert rows[0].returning_users == 0
    e = load_table(spark, sf_dir, "events")
    assert sum(r.new_users for r in rows) == e.select("user_id").distinct().count()


def test_weighted_median_between_minmax(spark, sf_dir):
    rows = X.weighted_median_price_by_qty(spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    rng = {
        r[0]: (r[1], r[2])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice"), F.max("l_extendedprice"))
        .collect()
    }
    for r in rows:
        lo, hi = rng[r.l_returnflag]
        assert lo <= r.weighted_median <= hi
        assert r.total_weight > 0


def test_string_agg_shapes(spark, sf_dir):
    rows = X.string_agg_top_suppliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        parts = r.top_suppliers.split("|")
        assert len(parts) == r.n_top <= 3
        assert all(p.startswith("Supplier") for p in parts)


def test_hash_collision_monotone_in_width(spark, sf_dir):
    rows = X.hash_key_collision_audit(spark, sf_dir).collect()
    assert [r.prefix_hex_chars for r in rows] == [4, 6, 8]
    # wider prefixes can only reduce collisions
    colls = [r.n_collisions for r in rows]
    assert colls[0] >= colls[1] >= colls[2] >= 0
    assert all(r.n_keys == rows[0].n_keys for r in rows)


def test_xcorr_bounded_and_complete(spark, sf_dir):
    rows = X.xcorr_views_purchases_daily(spark, sf_dir).collect()
    assert [r.lag_k for r in rows] == [-2, -1, 0, 1, 2]
    for r in rows:
        assert -1.0 - 1e-6 <= r.xcorr <= 1.0 + 1e-6


def test_cep_chain_subset_of_purchases(spark, sf_dir):
    r = X.cep_view_click_purchase_chain(spark, sf_dir).collect()[0]
    assert 0 <= r.n_users_matched <= r.n_matches <= r.n_purchases_total


def test_did_consistent_with_cell_means(spark, sf_dir):
    r = X.diff_in_diff_purchase_value(spark, sf_dir).collect()[0]
    expect = (r.mean_a_post - r.mean_a_pre) - (r.mean_b_post - r.mean_b_pre)
    assert abs(r.did_estimate - expect) < 1e-5


def test_seasonal_decompose_window_algebra(spark, sf_dir):
    rows = X.seasonal_decompose_daily(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 4 <= r.trend7_n <= 7  # edges shrink, interior full
        # resid identity: win_n*y - win_sum
        y_cents = round(r.revenue * 100)
        assert r.resid_scaled_cents == r.trend7_n * y_cents - r.trend7_sum_cents
    # interior days have full windows
    assert sum(1 for r in rows if r.trend7_n == 7) == len(rows) - 6


def test_heaps_growth_monotone_concave(spark, sf_dir):
    rows = X.heaps_vocab_growth(spark, sf_dir).collect()
    assert len(rows) == 5
    toks = [r.total_tokens for r in rows]
    vocab = [r.vocab for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    assert all(v <= t for v, t in zip(vocab, toks))
    # sub-linear growth: vocab/token ratio decreases as corpus grows
    ratios = [v / t for v, t in zip(vocab, toks)]
    assert ratios[0] >= ratios[-1]


def test_daily_bands_ordered(spark, sf_dir):
    rows = X.daily_value_percentile_bands(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p10 <= r.p50 <= r.p90
        assert r.n_events > 0


def test_debounce_partitions_events(spark, sf_dir):
    rows = X.event_debounce_5s(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_events == r.n_kept + r.n_debounced
        assert r.n_kept >= 1


def test_trimmed_mean_tighter_than_range(spark, sf_dir):
    rows = X.trimmed_mean_event_values(spark, sf_dir).collect()
    assert rows
    wins = {r.event_type: r for r in X.winsorized_event_value_stats(spark, sf_dir).collect()}
    for r in rows:
        assert r.n_kept <= r.n_total
        assert r.n_kept >= r.n_total - 2 * (r.n_total // 10)
        w = wins[r.event_type]
        # trimmed mean lives within the winsorized clip band
        assert w.lo_bound - 1e-6 <= r.trimmed_mean <= w.hi_bound + 1e-6


def test_join_explosion_matches_actual_join(spark, sf_dir):
    r = X.join_explosion_audit(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    actual = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert r.join_output_rows == actual
    assert r.max_key_fanout >= 1
    assert r.n_matching_keys <= min(r.rows_left, r.rows_right)


def test_survivorship_elects_longest_then_lowest(spark, sf_dir):
    rows = X.survivorship_golden_record(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cluster_size >= 2
        assert r.survivor_chars > 0


def test_linear_classifier_scores_bounded_and_deterministic(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.llm_pipeline import (
        linear_quality_classifier_scores,
    )

    rows = linear_quality_classifier_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # weights are in [-128, 127]/256 → mean-pooled score in [-0.5, 0.5)
        assert -0.5 - 1e-9 <= r.score <= 0.5 + 1e-9
        assert r.keep == (1 if r.score > 0 else 0)
    again = linear_quality_classifier_scores(spark, sf_dir).collect()
    assert rows == again


def test_table_catalog_counts(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.llm_pipeline import (
        table_catalog_report,
    )

    rows = {r.tbl: r for r in table_catalog_report(spark, sf_dir).collect()}
    assert len(rows) == 10
    assert rows["nation"].n_rows == 25
    assert rows["region"].n_rows == 5
    assert all(r.n_cols >= 2 for r in rows.values())


def test_rfm_segments_partition_users(spark, sf_dir):
    rows = X.rfm_segments(spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    n_purchasers = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_purchasers
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.avg_monetary > 0


def test_ratio_to_parent_shares_sum_to_one(spark, sf_dir):
    rows = X.ratio_to_parent_revenue(spark, sf_dir).collect()
    from collections import defaultdict

    by_region = defaultdict(float)
    region_share = {}
    for r in rows:
        by_region[r.r_name] += r.share_of_region
        region_share[r.r_name] = r.region_share_of_total
    for v in by_region.values():
        assert abs(v - 1.0) < 1e-4
    assert abs(sum(region_share.values()) - 1.0) < 1e-4


def test_attribution_mass_conserved(spark, sf_dir):
    rows = X.linear_attribution_credit(spark, sf_dir).collect()
    assert rows
    total = sum(r.attributed_purchases for r in rows)
    # total credit = number of purchases that had >= 1 touchpoint
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tu"), F.unix_micros("ts").alias("tt")
    )
    attributed = (
        p.join(
            t,
            (F.col("tu") == F.col("user_id"))
            & (F.col("tt") <= F.col("t"))
            & (F.col("t") - F.col("tt") <= 3600000000),
            "left_semi",
        )
        .count()
    )
    assert abs(total - attributed) < 1e-3


def test_locf_fills_all_but_leading_holes(spark, sf_dir):
    r = X.locf_gap_fill_daily(spark, sf_dir).collect()[0]
    assert r.n_days > 0
    assert 0 < r.n_holes < r.n_days
    # only holes BEFORE the first observation can stay unfilled
    assert r.n_filled >= r.n_holes - 3
    assert r.fill_abs_err_cents >= 0


def test_variant_extraction_matches_from_json(spark, sf_dir):
    rows = X.variant_props_analytics(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    total = sum(r.n for r in rows)
    assert total == e.count()
    ks = [r.k_mod for r in rows]
    assert ks == sorted(ks)


def test_growth_accounting_identity(spark, sf_dir):
    rows = X.growth_accounting_weekly(spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        F.floor(F.unix_micros("ts") / 604800000000).cast("long").alias("w"),
        "user_id",
    ).distinct()
    actives = {r.w: r[1] for r in wk.groupBy("w").count().collect()}
    for r in rows:
        assert r.new_users + r.retained + r.resurrected == actives[r.week]
    assert rows[0].retained == 0 and rows[0].resurrected == 0


def test_active_days_histogram_totals(spark, sf_dir):
    rows = X.active_days_histogram(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    assert sum(r.n_users for r in rows) == e.select("user_id").distinct().count()
    assert all(r.active_days >= 1 for r in rows)


def test_qq_deciles_monotone(spark, sf_dir):
    rows = X.qq_deciles_arms(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 10))
    qa = [r.q_a for r in rows]
    qb = [r.q_b for r in rows]
    assert qa == sorted(qa) and qb == sorted(qb)
    for r in rows:
        assert abs(r.qq_gap - (r.q_a - r.q_b)) < 1e-6


def test_fact_consistency_buckets_partition_orders(spark, sf_dir):
    rows = X.fact_consistency_audit(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "orders")
    assert sum(r.n_orders for r in rows) == e.count()


def test_sentiment_scores_consistent(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.text import (
        sentiment_lexicon_scores,
    )

    rows = sentiment_lexicon_scores(spark, sf_dir).collect()
    assert rows
    assert any(r.label == 1 for r in rows) and any(r.label == -1 for r in rows)
    for r in rows:
        assert r.label == (0 if r.polarity == 0 else (1 if r.polarity > 0 else -1))
        assert r.n_matched >= abs(r.polarity) / 2  # max |weight| = 2


def test_chi2_independence_terms_nonnegative(spark, sf_dir):
    rows = X.chi2_independence_type_dow(spark, sf_dir).collect()
    assert rows
    total_obs = sum(r.observed for r in rows)
    total_exp = sum(r.expected for r in rows)
    assert abs(total_obs - total_exp) < 0.01  # marginals consistent
    for r in rows:
        assert r.chi2_term >= -1e-6
        assert r.expected > 0


def test_burstiness_function_vs_content_words(spark, sf_dir):
    rows = X.token_burstiness_topk(spark, sf_dir).collect()
    assert len(rows) == 20
    vmrs = [r.vmr for r in rows]
    assert vmrs == sorted(vmrs, reverse=True)
    # burstiness is at least Poisson-level for the top tokens
    assert vmrs[0] >= 0.5


def test_interarrival_cv_near_one_for_random_stream(spark, sf_dir):
    rows = X.interarrival_poisson_check(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert r.mean_gap_s > 0
        # synthetic uniform-random arrivals are approximately Poisson
        assert 0.3 < r.cv < 3.0


def _pav_reference(pos, n):
    """Textbook weighted PAV over (pos, n) bins in score order: merge
    adjacent blocks while the left pooled rate exceeds the right,
    comparing rationals by integer cross-multiplication."""
    blocks = [[p, w] for p, w in zip(pos, n)]  # [S, N] per block
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][0] * out[-1][1] > out[-1][0] * out[-2][1]:
            s2, w2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += w2
    # walk input bins, assigning each to its covering merged block
    res = []
    bi = 0
    acc = 0
    for p, w in zip(pos, n):
        res.append(tuple(out[bi]))
        acc += w
        if acc == out[bi][1]:
            bi += 1
            acc = 0
    return res  # list of (S, N) pooled per input bin


def test_isotonic_pav_matches_stack_algorithm(spark, sf_dir):
    rows = X.isotonic_calibration_pav(spark, sf_dir).collect()
    assert rows
    pos = [r.n_pos for r in rows]
    n = [r.n for r in rows]
    ref = _pav_reference(pos, n)
    for r, (s, w) in zip(rows, ref):
        assert r.iso_rate_ppm == (s * 1_000_000) // w
    # the fit is monotone non-decreasing in score order
    iso = [r.iso_rate_ppm for r in rows]
    assert iso == sorted(iso)
    # raw rates ppm are exact integer floors
    for r in rows:
        assert r.raw_rate_ppm == (r.n_pos * 1_000_000) // r.n
    # pooling preserves mass: weighted mean of fit == overall rate
    tot_fit = sum((s * 1_000_000) // w * w_ for (s, w), w_ in zip(ref, n))
    # (exact check: sum of S over distinct blocks equals total positives)
    seen = set()
    s_sum = 0
    for s, w in ref:
        if (s, w) not in seen:
            seen.add((s, w))
            s_sum += s
    assert s_sum == sum(pos)


def test_conformal_split_and_rank_exact(spark, sf_dir):
    rows = X.conformal_interval_coverage(spark, sf_dir).collect()
    assert rows
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    for r in rows:
        # the three hash splits partition each group's orders
        assert r.n_train > 0 and r.n_calib > 0 and r.n_test > 0
        # exact split-conformal rank k = ceil(0.9*(m+1)), capped at m
        m = r.n_calib
        assert r.k_rank == min((9 * (m + 1) + 9) // 10, m)
        # threshold is a genuine cents value (non-negative)
        assert r.q_cents_floor >= 0
        # finite-sample coverage should sit near the 90% target
        assert 700_000 <= r.coverage_ppm <= 1_000_000
    assert sum(r.n_train + r.n_calib + r.n_test for r in rows) == n_orders
