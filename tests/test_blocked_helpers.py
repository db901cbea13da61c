"""Property tests for the r6 blocked two-level window helpers
(operators/indexing.py) — the scale-safe replacements for
single-partition rank / running-sum / running-max windows — and for the
r6 operators built on them.

Each helper is compared against the NAIVE global-window formulation on
adversarial frames (duplicate keys where allowed, negative values,
single row, all-equal keys, power-of-two sizes straddling block
boundaries) — the naive window is fine at test scale and serves as the
executable spec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from braintumor_data_pipeline_spark.operators.indexing import (
    RANGE_BLOCKS,
    blocked_cummax,
    blocked_cumsum,
    blocked_rank,
    exact_ntile,
)


def _frame(spark, n, key_fn, val_fn):
    """Deterministic frame: key/value derived from md5 of the id so the
    distribution is adversarially uneven but reproducible."""
    return spark.range(n).select(
        F.col("id").alias("tb"),
        key_fn(F.col("id")).alias("k"),
        val_fn(F.col("id")).alias("v"),
    )


def _h(col, mod):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % mod
    )


SIZES = [1, 7, RANGE_BLOCKS, RANGE_BLOCKS + 1, 5000]


@pytest.mark.parametrize("n", SIZES)
def test_blocked_rank_matches_naive(spark, n):
    # keys with heavy duplication AND negative values; tiebreak unique
    df = _frame(spark, n, lambda c: _h(c, 97) - 48, lambda c: c).persist()
    w = Window.orderBy("k", "tb")
    naive = df.select("tb", F.row_number().over(w).alias("r"))
    blocked = blocked_rank(df, "k", "tb").select(
        "tb", F.col("_rank").alias("r")
    )
    assert naive.join(blocked, ["tb", "r"]).count() == n
    df.unpersist()


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("inclusive", [True, False])
def test_blocked_cumsum_matches_naive(spark, n, inclusive):
    # DISTINCT keys (the helper's contract), signed values
    df = _frame(
        spark, n, lambda c: c * 3 - n, lambda c: _h(c, 1001) - 500
    ).persist()
    hi = 0 if inclusive else -1
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
    naive = df.select(
        "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("s")
    )
    blocked = blocked_cumsum(df, "k", "v", "s", inclusive=inclusive).select(
        "k", "s"
    )
    assert naive.join(blocked, ["k", "s"]).count() == n
    df.unpersist()


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("inclusive", [True, False])
def test_blocked_cummax_matches_naive(spark, n, inclusive):
    df = _frame(
        spark, n, lambda c: c * 2 - n, lambda c: _h(c, 5000) - 2500
    ).persist()
    hi = 0 if inclusive else -1
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
    naive = df.select("k", F.max("v").over(w).alias("m"))
    blocked = blocked_cummax(df, "k", "v", "m", inclusive=inclusive).select(
        "k", "m"
    )
    # strict frame: first row's running max is NULL on both sides —
    # join on null-safe equality
    joined = naive.alias("a").join(
        blocked.alias("b"),
        (F.col("a.k") == F.col("b.k"))
        & F.col("a.m").eqNullSafe(F.col("b.m")),
    )
    assert joined.count() == n
    df.unpersist()


def test_blocked_rank_clustered_keys_matches_naive(spark):
    """Zipf-ish key distribution (ADVICE r6 / VERDICT r6 task 2): 90%
    of rows in a narrow value band, 10% spread across a 10^6× wider
    range. The r6 min/max-interpolated boundaries packed the band into
    one block; the r7 approx_percentile boundaries split it by count.
    Result identity is asserted either way — this pins the semantics
    while the scaling probe pins the balance."""
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("tb"),
        F.when(_h(F.col("id"), 10) < 9, _h(F.col("id") + 7, 1000))
        .otherwise(_h(F.col("id") + 13, 1_000_000_000))
        .alias("k"),
        F.col("id").alias("v"),
    ).persist()
    w = Window.orderBy("k", "tb")
    naive = df.select("tb", F.row_number().over(w).alias("r"))
    blocked = blocked_rank(df, "k", "tb").select(
        "tb", F.col("_rank").alias("r")
    )
    assert naive.join(blocked, ["tb", "r"]).count() == n
    df.unpersist()


def test_blocked_rank_all_equal_keys_matches_naive(spark):
    """All-equal keys: every boundary equals the key, one block —
    documented degeneracy; ranks must still match (ties broken by tb)."""
    n = 3000
    df = spark.range(n).select(
        F.col("id").alias("tb"), F.lit(42).alias("k")
    )
    w = Window.orderBy("k", "tb")
    naive = df.select("tb", F.row_number().over(w).alias("r"))
    blocked = blocked_rank(df, "k", "tb").select(
        "tb", F.col("_rank").alias("r")
    )
    assert naive.join(blocked, ["tb", "r"]).count() == n


def test_blocked_rank_null_keys_not_dropped(spark):
    """NULL keys (ADVICE r6): before r7 a NULL key produced a NULL
    _blk and the offsets join silently dropped the row. Now NULLs land
    in block 0 and rank FIRST — matching Spark's ASC NULLS FIRST naive
    window this helper replaces."""
    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("tb"),
        F.when(_h(F.col("id"), 5) == 0, F.lit(None).cast("long"))
        .otherwise(_h(F.col("id"), 300))
        .alias("k"),
    ).persist()
    w = Window.orderBy(F.asc("k"), "tb")  # Spark ASC = NULLS FIRST
    naive = df.select("tb", F.row_number().over(w).alias("r"))
    blocked = blocked_rank(df, "k", "tb").select(
        "tb", F.col("_rank").alias("r")
    )
    assert blocked.count() == n  # nothing dropped
    assert naive.join(blocked, ["tb", "r"]).count() == n
    df.unpersist()


@pytest.mark.parametrize("n", [1, 9, 10, 11, 100, 997])
@pytest.mark.parametrize("k", [3, 10])
def test_exact_ntile_matches_native(spark, n, k):
    df = spark.range(n).select(F.col("id").alias("tb"), _h(F.col("id"), 37).alias("k"))
    w = Window.orderBy("k", "tb")
    native = df.select("tb", F.ntile(k).over(w).alias("q"))
    ranked = blocked_rank(df, "k", "tb").crossJoin(
        F.broadcast(df.agg(F.count("*").alias("_n")))
    )
    mine = ranked.select("tb", exact_ntile("_rank", "_n", k).alias("q"))
    assert native.join(mine, ["tb", "q"]).count() == n


def test_temperature_mix_sums_to_budget(spark):
    from braintumor_data_pipeline_spark.operators.llm_pipeline import (
        MIX_BUDGET,
        temperature_mix_allocation,
    )

    out = temperature_mix_allocation(spark, "/root/testdata/sf0.001").persist()
    rows = out.collect()
    assert sum(r["alloc"] for r in rows) == MIX_BUDGET
    # monotone: a source with more docs never gets a SMALLER allocation
    # than one with fewer (√n weights are monotone; largest-remainder
    # can differ by at most 1, and equal-n sources tie-break by name)
    by_docs = sorted(rows, key=lambda r: (r["n_docs"], r["source"]))
    for a, b in zip(by_docs, by_docs[1:]):
        if b["n_docs"] > a["n_docs"]:
            assert b["alloc"] >= a["alloc"]
    out.unpersist()


def test_semdedup_report_invariants(spark):
    from braintumor_data_pipeline_spark.operators.similarity import (
        SEMDEDUP_CAP,
        semdedup_prune_report,
    )

    rows = semdedup_prune_report(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 1
    total_members = sum(r["n_members"] for r in rows)
    # every embedding is assigned to exactly one (cluster, subcluster)
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    n_vec = load_table(spark, "/root/testdata/sf0.001", "embeddings").count()
    assert total_members == n_vec
    for r in rows:
        # the hard cap is the linearity guarantee: no subcluster ever
        # exceeds SEMDEDUP_CAP members, so pairs <= N*CAP/2
        assert 1 <= r["n_members"] <= SEMDEDUP_CAP
        assert r["subcluster"] >= 0
        # keep-first: at least one member of any dup-bearing cluster
        # survives; pair count bounds pruned count
        assert 0 <= r["n_pruned"] < max(r["n_members"], 1)
        assert r["n_pruned"] <= r["n_dup_pairs"]
