"""Invariant tests for the classifier-evaluation / skyline /
repeated-span operators (value parity vs DuckDB is verify_local's
job; these pin the semantic guarantees the oracles can't express)."""

from __future__ import annotations

from braintumor_data_pipeline_spark.operators.analytics import (
    pareto_frontier_orders,
)
from braintumor_data_pipeline_spark.operators.dedup import (
    blocking_quality_report,
)
from braintumor_data_pipeline_spark.operators.experiments import (
    classifier_auc_exact,
    cohens_kappa_langid,
    pr_threshold_sweep,
)
from braintumor_data_pipeline_spark.operators.llm_pipeline import (
    repeated_span_detection,
)


def test_auc_bounds_and_signal(spark, sf_dir):
    """AUC ∈ [0,1]. The fixture's text is synthetic for every lang, so
    the stopword score is near-chance by construction — pin the band
    that catches rank-algebra bugs (a broken tie/rank formula lands at
    0 or 1, not near 0.5)."""
    row = classifier_auc_exact(spark, sf_dir).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    assert 0.0 <= row.auc <= 1.0
    assert 0.25 <= row.auc <= 0.75


def test_pr_sweep_monotone(spark, sf_dir):
    """Raising the threshold can only shrink the predicted-positive
    set: recall is non-increasing; tp+fn is the constant positive
    count; all ratios live in [0,1]."""
    rows = sorted(
        pr_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 8
    n_pos = {r.tp + r.fn for r in rows}
    assert len(n_pos) == 1
    recalls = [r.recall_ for r in rows if r.recall_ is not None]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        for v in (r.precision_, r.recall_, r.f1):
            assert v is None or 0.0 <= v <= 1.0


def test_kappa_bounds(spark, sf_dir):
    row = cohens_kappa_langid(spark, sf_dir).collect()[0]
    assert -1.0 <= row.kappa <= 1.0
    assert 0 <= row.n_agree <= row.n_docs


def test_blocking_report_consistent(spark, sf_dir):
    """Caught pairs can't exceed either side; ratios in [0,1]."""
    row = blocking_quality_report(spark, sf_dir).collect()[0]
    assert row.n_caught <= row.n_true_pairs
    assert row.n_caught <= row.n_candidate_pairs
    if row.pairs_completeness is not None:
        assert 0.0 <= row.pairs_completeness <= 1.0
    assert 0.0 <= row.reduction_ratio <= 1.0
    # sub-quadratic blocking must actually reduce the pair space
    total_pairs = row.n_docs * (row.n_docs - 1) / 2
    assert row.n_candidate_pairs < total_pairs


def test_pareto_frontier_is_antichain(spark, sf_dir):
    """Frontier points must be mutually non-dominated: sorted by price
    DESC, dates must be STRICTLY increasing (any tie or decrease means
    one point weakly dominates another)."""
    rows = pareto_frontier_orders(spark, sf_dir).collect()
    assert rows
    prices = [r.price for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert len(set(prices)) == len(prices)
    dates = [r.odate for r in rows]
    assert all(a < b for a, b in zip(dates, dates[1:]))


def test_pareto_frontier_dominates_everything(spark, sf_dir):
    """Completeness: every order is weakly dominated by some frontier
    point (the frontier is a dominating set)."""
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    frontier = pareto_frontier_orders(spark, sf_dir).collect()
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderdate")
        .collect()
    )
    for o in orders:
        assert any(
            f.price >= o.o_totalprice and f.odate >= o.o_orderdate
            for f in frontier
        )


def test_repeated_spans_bounded(spark, sf_dir):
    """Merged spans cover ≤ the whole doc; every span ≥ the 8-token
    window; fractions consistent with the counts."""
    rows = repeated_span_detection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_spans
        # islands merge overlapping 8-token windows → each span ≥ 8
        assert r.repeated_tokens >= 8 * 1
        assert r.repeated_tokens >= r.n_spans * 8 - 0  # each span ≥ 8
        assert r.repeated_tokens <= r.n_tokens
        assert abs(r.repeated_frac - round(r.repeated_tokens / r.n_tokens, 6)) < 1e-9


def test_u_shape_mass_conservation(spark, sf_dir):
    """Attributed mass must equal the attributed purchase value: for
    every k-group, the weights across channels sum to 1 per purchase,
    so Σ attributed_usd == Σ value of purchases with ≥1 touch."""
    from braintumor_data_pipeline_spark.operators.experiments import (
        attribution_u_shape_by_k,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    rows = attribution_u_shape_by_k(spark, sf_dir).collect()
    assert rows
    attributed = sum(r.attributed_usd for r in rows)
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t"), "value"
    )
    touch = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tu"), F.unix_micros("ts").alias("tt")
    )
    touched = (
        p.join(
            touch,
            (F.col("tu") == F.col("user_id"))
            & (F.col("tt") <= F.col("t"))
            & (F.col("t") - F.col("tt") <= 3600000000),
            "left_semi",
        )
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert abs(attributed - touched) < 0.01 * len(rows)


def test_calibration_bins_consistent(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.experiments import (
        calibration_reliability_bins,
    )

    rows = calibration_reliability_bins(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bin <= 7
        assert 0 <= r.n_pos <= r.n
        assert 0.0 <= r.mean_score <= 1.0
        assert 0.0 <= r.obs_rate <= 1.0
        assert 0.0 <= r.brier <= 1.0
        # mean score must fall inside (or at the edge of) its bin
        assert r.bin / 8 - 1e-6 <= r.mean_score <= (r.bin + 1) / 8 + 1e-6


def test_markov_accuracy_bounds(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.experiments import (
        markov_next_event_accuracy,
    )

    rows = markov_next_event_accuracy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test
        assert 0.0 <= r.accuracy <= 1.0


def test_ndcg_bounds_and_perfect_cases(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.similarity import (
        ndcg_label_relevance,
    )

    rows = ndcg_label_relevance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_rel <= 5
        if r.n_rel == 0:
            assert r.ndcg is None
        else:
            assert 0.0 < r.ndcg <= 1.0
        assert 0.0 <= r.recall_at_5 <= 1.0
        # all-relevant top-5 is by construction ideally ordered
        if r.n_rel == 5:
            assert r.ndcg == 1.0


def test_modularity_global_sum(spark, sf_dir):
    """Connected components have no cross-component edges, so
    Σ e_c = m and the global Q = 1 − Σ d_c²/(4m²) ∈ (−1, 1]; degree
    sums must double-count every edge."""
    from braintumor_data_pipeline_spark.operators.components import (
        component_modularity,
    )

    rows = component_modularity(spark, sf_dir).collect()
    assert rows
    m = sum(r.n_edges_in for r in rows)
    assert sum(r.deg_sum for r in rows) == 2 * m
    if m:
        q = sum(
            (4 * m * r.n_edges_in - r.deg_sum**2) / (4 * m * m)
            for r in rows
        )
        assert -1.0 <= q <= 1.0


def test_churn_no_leakage_and_labels(spark, sf_dir):
    """Every labeled user has pre-cutoff activity; churned users have
    zero events in the label window (spot-check via recompute)."""
    from braintumor_data_pipeline_spark.operators.experiments import (
        churn_labels_point_in_time,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    rows = churn_labels_point_in_time(spark, sf_dir).collect()
    assert rows
    churned = {r.user_id for r in rows if r.churned == 1}
    retained = {r.user_id for r in rows if r.churned == 0}
    e = load_table(spark, sf_dir, "events")
    future_users = {
        r.user_id
        for r in e.filter(
            (F.col("ts") >= "2024-01-20") & (F.col("ts") < "2024-01-27")
        )
        .select("user_id")
        .distinct()
        .collect()
    }
    assert churned.isdisjoint(future_users)
    assert retained <= future_users
    for r in rows:
        assert r.n_events_14d >= 1
        assert 1 <= r.days_active_14d <= 14


def test_rendezvous_minimal_movement(spark, sf_dir):
    """HRW's defining guarantee: growing 8→9 shards moves docs ONLY to
    the new shard — every pre-existing shard reports zero arrivals."""
    from braintumor_data_pipeline_spark.operators.llm_pipeline import (
        rendezvous_shard_assignment,
    )

    rows = rendezvous_shard_assignment(spark, sf_dir).collect()
    assert rows
    by_shard = {r.shard: r for r in rows}
    for s, r in by_shard.items():
        if s < 8:
            assert r.n_moved_in == 0
    if 8 in by_shard:
        total = sum(r.n_docs for r in rows)
        assert by_shard[8].n_moved_in == by_shard[8].n_docs
        # expected ~1/9 of the corpus lands on the new shard
        assert by_shard[8].n_docs < 0.3 * total


def test_log_compaction_semantics(spark, sf_dir):
    """Compacted keys are unique; a tombstone-latest key is absent."""
    from braintumor_data_pipeline_spark.operators.cdc import (
        log_compaction_tombstones,
    )

    rows = log_compaction_tombstones(spark, sf_dir).collect()
    assert rows
    ids = [r.user_id for r in rows]
    assert len(ids) == len(set(ids))


def test_twap_single_event_null(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.timeseries import (
        twap_daily_value,
    )

    rows = twap_daily_value(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_events == 1:
            assert r.twap_usd is None
        else:
            assert r.twap_usd is None or r.twap_usd >= 0.0


def test_video_shot_boundaries_find_scene_cuts(spark, sf_dir):
    """The generator plants exactly two scene jumps (f=4 and f=8), so
    every video must segment into 3 shots, detected from REAL
    PNG-decoded pixels (lossless round trip)."""
    from braintumor_data_pipeline_spark.operators.multimodal import (
        VID_BOUNDARY_THRESHOLD,
        VID_FRAMES,
        video_shot_boundaries,
    )

    rows = video_shot_boundaries(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_frames == VID_FRAMES
        assert r.n_shots == 3
        assert r.max_transition_diff > VID_BOUNDARY_THRESHOLD
        assert r.total_abs_diff >= r.max_transition_diff


def test_histogram_equalize_lut_monotone(spark, sf_dir):
    """The equalization LUT must be monotone non-decreasing in v, span
    [0, 255], and map the smallest present intensity to 0."""
    from collections import defaultdict

    from braintumor_data_pipeline_spark.operators.pixels import (
        pixel_histogram_equalize,
    )

    rows = pixel_histogram_equalize(spark, sf_dir).collect()
    assert rows
    per_img = defaultdict(list)
    for r in rows:
        per_img[r.image_id].append(r)
    for img, lut in per_img.items():
        lut.sort(key=lambda r: r.v)
        assert lut[0].v_eq == 0
        eqs = [r.v_eq for r in lut]
        assert all(a <= b for a, b in zip(eqs, eqs[1:]))
        assert all(0 <= e <= 255 for e in eqs)


def test_lsh_tuning_curve_monotone(spark, sf_dir):
    """More bands with fewer rows per band can only be MORE permissive:
    candidate pairs are non-increasing as rows_per_band grows, and the
    strictest config (1×8) matches the full-signature dedup-group
    count."""
    from braintumor_data_pipeline_spark.operators.dedup import (
        lsh_tuning_curve,
        minhash_dedup_groups,
    )

    rows = sorted(
        lsh_tuning_curve(spark, sf_dir).collect(),
        key=lambda r: r.rows_per_band,
    )
    assert [r.n_bands * r.rows_per_band for r in rows] == [8, 8, 8, 8]
    pairs = [r.n_candidate_pairs for r in rows]
    assert all(a >= b for a, b in zip(pairs, pairs[1:]))
    groups = minhash_dedup_groups(spark, sf_dir).collect()
    expected_strict = sum(
        g.n_members * (g.n_members - 1) // 2 for g in groups
    )
    assert rows[-1].n_candidate_pairs == expected_strict


def test_group_kfold_partitions_users(spark, sf_dir):
    """Fold counts must partition the user set (disjoint folds whose
    sizes sum to the distinct-user count)."""
    from braintumor_data_pipeline_spark.operators.llm_pipeline import (
        group_kfold_assignment,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = group_kfold_assignment(spark, sf_dir).collect()
    assert {r.fold for r in rows} <= set(range(5))
    total_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == total_users


def test_sorted_neighborhood_exact_candidate_count(spark, sf_dir):
    """Width-3 sliding window over N sorted docs yields exactly 2N-3
    pairs; gap-1 pairs chain through the whole order."""
    from braintumor_data_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = sorted_neighborhood_pairs(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == 2 * n - 3
    gap1 = [r for r in rows if r.rank_gap == 1]
    gap2 = [r for r in rows if r.rank_gap == 2]
    assert len(gap1) == n - 1 and len(gap2) == n - 2
    for r in rows:
        assert r.doc_a != r.doc_b
        assert r.same_key in (0, 1)


def test_nearest_centroid_partitions_corpus(spark, sf_dir):
    """Every vector gets exactly one prediction: per-label point counts
    sum to the corpus size; accuracies in [0,1]."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        nearest_centroid_accuracy,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = nearest_centroid_accuracy(spark, sf_dir).collect()
    assert rows
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_points for r in rows) == total
    for r in rows:
        assert 0 <= r.n_correct <= r.n_points
        assert 0.0 <= r.accuracy <= 1.0


def test_minhash_calibration_consistency(spark, sf_dir):
    """Estimator calibration table: buckets cover only observed
    k_match values (full-signature collisions land at k=8 with exact
    Jaccard 1.0 for identical texts); micro-average is Σ∩/Σ∪."""
    from braintumor_data_pipeline_spark.operators.dedup import (
        MINHASH_K,
        minhash_jaccard_estimation_error,
    )

    rows = minhash_jaccard_estimation_error(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.k_match <= MINHASH_K
        assert abs(r.est_jaccard - round(r.k_match / MINHASH_K, 6)) < 1e-9
        assert 0 <= r.sum_inter <= r.sum_union
        assert abs(
            r.micro_avg_exact - round(r.sum_inter / r.sum_union, 6)
        ) < 1e-9
        assert r.n_pairs > 0


def test_fellegi_sunter_u_probs_form_distribution(spark, sf_dir):
    """The 8 pattern u-probabilities under independence must sum to 1;
    pair counts must total the candidate-set size."""
    from braintumor_data_pipeline_spark.operators.dedup import (
        fellegi_sunter_patterns,
        minhash_lsh_pairs,
    )

    rows = fellegi_sunter_patterns(spark, sf_dir).collect()
    assert len(rows) <= 8
    # observed patterns carry the full candidate mass
    assert sum(r.n_pairs for r in rows) == minhash_lsh_pairs(
        spark, sf_dir
    ).count()
    # recompute the full 8-pattern distribution sum from any row's
    # factors is not possible from the output alone, but the OBSERVED
    # patterns' u_probs must each be a valid probability
    for r in rows:
        assert 0.0 <= r.u_prob <= 1.0


def test_lcc_consistent_with_global_triangles(spark, sf_dir):
    """Σ per-node triangle credits = 3 × global triangle count; every
    LCC in [0,1]."""
    from braintumor_data_pipeline_spark.operators.graph import (
        local_clustering_coefficient,
        triangle_stats,
    )

    rows = local_clustering_coefficient(spark, sf_dir).collect()
    glob = triangle_stats(spark, sf_dir).collect()[0]
    assert sum(r.n_triangles for r in rows) == 3 * glob.n_triangles
    for r in rows:
        assert 0.0 <= r.lcc <= 1.0
        assert r.deg >= 2


def test_assortativity_bounds(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    row = degree_assortativity(spark, sf_dir).collect()[0]
    assert row.n_edges > 0
    if row.assortativity is not None:
        assert -1.0 - 1e-9 <= row.assortativity <= 1.0 + 1e-9


def test_t_closeness_bounds_and_zero_grid_cells(spark, sf_dir):
    """t ∈ [0,1); classes covering the whole corpus would score 0;
    weighted average of class distances over a partition is bounded by
    the max class distance."""
    from braintumor_data_pipeline_spark.operators.llm_pipeline import (
        t_closeness_report,
    )

    rows = t_closeness_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.t_closeness < 1.0
        assert r.tvd_num >= 0
        assert r.n_docs >= 1


def test_partition_health_invariants(spark, sf_dir):
    """Median-relative sizes bracket 1.0 somewhere; freshness lag is
    within the day; fingerprints are mergeable (sum over days equals
    the whole-table sum)."""
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.sources.maintenance import (  # noqa: F401
        _register_partition_health_queries,
    )
    from braintumor_data_pipeline_spark import registry
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    qs = registry.all_queries()
    fresh = qs["partition_freshness_skew_report"].fn(spark, sf_dir).collect()
    assert fresh
    assert any(r.size_vs_median >= 1.0 for r in fresh)
    assert any(r.size_vs_median <= 1.0 for r in fresh)
    for r in fresh:
        assert 0 <= r.freshness_lag_s < 86_400

    fp = qs["partition_fingerprints_daily"].fn(spark, sf_dir).collect()
    total_rows = sum(r.n_rows for r in fp)
    assert total_rows == load_table(spark, sf_dir, "events").count()


def test_confusion_matrix_row_shares(spark, sf_dir):
    from collections import defaultdict

    from braintumor_data_pipeline_spark.operators.experiments import (
        langid_confusion_matrix,
    )

    rows = langid_confusion_matrix(spark, sf_dir).collect()
    assert rows
    per_lang = defaultdict(float)
    for r in rows:
        per_lang[r.lang] += r.row_share
    for lang, s in per_lang.items():
        assert abs(s - 1.0) < 1e-4


def test_cluster_size_distribution_covers_corpus(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.dedup import (
        dup_cluster_size_distribution,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = dup_cluster_size_distribution(spark, sf_dir).collect()
    assert rows
    covered = sum(r.n_docs_covered for r in rows)
    assert covered == load_table(spark, sf_dir, "documents").count()
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-4


def test_rcte_hierarchy_rollup_subtree_containment(spark, sf_dir):
    """Every ancestor's descendant count is at least its direct
    children count; deeper ancestors aggregate supersets."""
    from braintumor_data_pipeline_spark.operators.recursive import (
        rcte_hierarchy_rollup,
    )

    rows = rcte_hierarchy_rollup(spark, sf_dir).collect()
    assert rows
    by_anc = {r.ancestor: r for r in rows}
    for r in rows:
        assert r.n_descendants >= 1
        assert r.subtree_cents > 0
        # parent-of-parent (if present) must cover at least as many
        parent = r.ancestor // 10
        if parent in by_anc and parent != r.ancestor:
            assert by_anc[parent].n_descendants >= r.n_descendants


def test_interval_union_coverage_bounds(spark, sf_dir):
    """Coverage ≤ window count × window length and ≤ a full day + the
    10-min spill past midnight; merged spans ≤ windows."""
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.operators.intervals import (
        interval_union_coverage,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = interval_union_coverage(spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    per_day = {
        r.d: r.n
        for r in e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        n_windows = per_day[r.d]
        assert 1 <= r.n_merged_spans <= n_windows
        assert r.covered_s <= n_windows * 600
        assert r.covered_s <= 86_400 + 600
        assert r.covered_s >= 600  # at least one full window


def test_embedding_norm_outliers_two_tails(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.similarity import (
        embedding_norm_outliers,
    )

    rows = embedding_norm_outliers(spark, sf_dir).collect()
    assert rows
    outliers = [r for r in rows if r.is_outlier == 1]
    small = [r for r in rows if r.is_outlier == 0]
    assert len(small) == 5  # the 5 smallest norms always reported
    for r in rows:
        assert r.norm >= 0.0
        assert abs(r.norm - round((r.norm2_fix ** 0.5) / 4096, 6)) < 1e-9
    if outliers:
        assert min(o.norm2_fix for o in outliers) > max(
            s.norm2_fix for s in small
        )


def test_interpolated_quartiles_ordering(spark, sf_dir):
    """Q1 ≤ Q2 ≤ Q3 within each group, all within [min, max]."""
    from collections import defaultdict

    from braintumor_data_pipeline_spark.operators.analytics import (
        interpolated_quartiles_by_group,
    )

    rows = interpolated_quartiles_by_group(spark, sf_dir).collect()
    assert rows
    per_grp = defaultdict(dict)
    for r in rows:
        per_grp[r.grp][r.quartile] = r.value
    for grp, qs in per_grp.items():
        assert set(qs) == {1, 2, 3}
        assert qs[1] <= qs[2] <= qs[3]


def test_watermark_sizing_consistency(spark, sf_dir):
    """p95 lateness ≤ max lateness; disordered count ≤ event count;
    totals cover the events table."""
    from braintumor_data_pipeline_spark.streaming.events import (
        watermark_sizing_report,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = watermark_sizing_report(spark, sf_dir).collect()
    assert rows
    assert sum(r.n_events for r in rows) == load_table(
        spark, sf_dir, "events"
    ).count()
    for r in rows:
        assert 0 <= r.n_disordered <= r.n_events
        assert 0 <= r.p95_disorder_s <= r.max_disorder_s


def test_spearman_bounds_and_tie_handling(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.experiments import (
        spearman_rho_qty_price,
    )

    rows = spearman_rho_qty_price(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.spearman_rho <= 1.0
        assert r.n > 0


def test_rich_club_monotone_membership(spark, sf_dir):
    """Clubs shrink as k grows; φ ∈ [0,1]; club-internal edges can't
    exceed the club's complete-graph bound."""
    from braintumor_data_pipeline_spark.operators.graph import (
        rich_club_coefficient,
    )

    rows = sorted(
        rich_club_coefficient(spark, sf_dir).collect(), key=lambda r: r.k
    )
    assert rows
    sizes = [r.n_k for r in rows]
    assert all(a >= b for a, b in zip(sizes, sizes[1:]))
    for r in rows:
        assert 2 * r.e_k <= r.n_k * (r.n_k - 1)
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0


def test_map_mrr_bounds_and_fixed_point_consistency(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.similarity import (
        AP_SCALE,
        retrieval_map_mrr_by_label,
    )

    rows = retrieval_map_mrr_by_label(spark, sf_dir).collect()
    assert rows, "expected at least one query label"
    for r in rows:
        assert 0.0 <= r.map_at_5 <= 1.0
        assert 0.0 <= r.mrr_at_5 <= 1.0
        # MRR recomputes exactly from its integer numerator
        assert r.mrr_at_5 == round(
            r.sum_rr_fix / (AP_SCALE * r.n_queries), 6
        )
        # every per-query RR numerator divides 60 evenly, so the sum
        # of n_queries terms is bounded by 60·n_queries
        assert r.sum_rr_fix <= AP_SCALE * r.n_queries
        assert r.sum_ap_fix <= AP_SCALE * 5 * r.n_queries


def test_mcc_operating_points_bounds_and_cell_parity(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.experiments import (
        mcc_operating_points,
        pr_threshold_sweep,
    )

    mcc_rows = {
        r.threshold: r for r in mcc_operating_points(spark, sf_dir).collect()
    }
    assert len(mcc_rows) == 8
    for r in mcc_rows.values():
        if r.mcc is not None:
            assert -1.0 <= r.mcc <= 1.0
        if r.youden_j is not None:
            assert -1.0 <= r.youden_j <= 1.0
            assert r.balanced_acc == round((r.youden_j + 1) / 2, 6) or abs(
                r.balanced_acc - (r.youden_j + 1) / 2
            ) < 2e-6
    # confusion cells must agree with the PR sweep at shared thresholds
    pr_rows = {
        r.threshold: r for r in pr_threshold_sweep(spark, sf_dir).collect()
    }
    shared = set(mcc_rows) & set(pr_rows)
    assert shared
    for t in shared:
        assert (mcc_rows[t].tp, mcc_rows[t].fp, mcc_rows[t].fn) == (
            pr_rows[t].tp,
            pr_rows[t].fp,
            pr_rows[t].fn,
        )


def test_harmonic_centrality_consistency_with_bfs(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.graph import (
        BFS_HOPS,
        HARM_SCALE,
        bfs_levels_from_min_vertex,
        harmonic_centrality_seeds,
    )

    rows = harmonic_centrality_seeds(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # each reached target contributes between 840//BFS_HOPS and 840
        assert r.harmonic_fix <= HARM_SCALE * r.n_reached
        assert r.harmonic_fix >= (HARM_SCALE // BFS_HOPS) * r.n_reached
        assert r.harmonic == round(r.harmonic_fix / HARM_SCALE, 6)
    # the min vertex is one of the seeds: its multi-source result must
    # exactly reproduce the single-source BFS level relation
    bfs = bfs_levels_from_min_vertex(spark, sf_dir).collect()
    src = min(r.source_doc for r in rows)
    assert src == min(b.doc_id for b in bfs if b.level == 0)
    exp_fix = sum(HARM_SCALE // b.level for b in bfs if b.level > 0)
    got = [r for r in rows if r.source_doc == src][0]
    assert got.harmonic_fix == exp_fix
    assert got.n_reached == sum(1 for b in bfs if b.level > 0)
