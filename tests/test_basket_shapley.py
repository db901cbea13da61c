"""Property tests for the late-r8 operators (KNN-Shapley data
valuation + market-basket association mining) — invariants the DuckDB
value-parity oracle cannot express, asserted at sf0.001.
"""

from __future__ import annotations

import os
import sys
from fractions import Fraction

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from braintumor_data_pipeline_spark import registry


def _run(spark, sf_dir, name):
    return registry.all_queries()[name].fn(spark, sf_dir).collect()


def _numpy_shapley(sf_dir):
    """Independent exact-rational replay of the Jia et al. closed form
    over the raw parquet — same rounding/tie rules, Fraction arithmetic
    end-to-end, no Spark and no scaled-integer shortcut."""
    import numpy as np
    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.similarity import (
        SHAP_K,
        SHAP_L,
        SHAP_M,
        SHAP_Q,
    )

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vid = t.column("vec_id").to_numpy()
    lab = t.column("label").to_numpy()
    emb = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    nrm = np.sqrt((emb * emb).sum(axis=1))
    is_q = vid < SHAP_Q
    totals: dict[int, Fraction] = {}
    eff_checks = []
    for qi in np.where(is_q)[0]:
        sims = np.round(
            (emb[~is_q] @ emb[qi]) / (nrm[~is_q] * nrm[qi]), 4
        )
        nids = vid[~is_q]
        order = np.lexsort((nids, -sims))[:SHAP_M]
        eq = (lab[~is_q][order] == lab[qi]).astype(int)
        m = len(order)
        s = [Fraction(0)] * (m + 1)
        s[m - 1] = Fraction(int(eq[m - 1]), m)
        for i in range(m - 2, -1, -1):
            s[i] = s[i + 1] + Fraction(
                int(eq[i]) - int(eq[i + 1]), SHAP_K
            ) * Fraction(min(SHAP_K, i + 1), i + 1)
        for rank, tr in enumerate(order):
            totals.setdefault(int(nids[tr]), Fraction(0))
            totals[int(nids[tr])] += s[rank]
        # Shapley efficiency: the values over the ranked pool sum to
        # the K-NN utility v(D) = (#correct in top-K)/K exactly.
        eff_checks.append(
            (sum(s[:m]), Fraction(int(eq[:SHAP_K].sum()), SHAP_K))
        )
    return totals, eff_checks, SHAP_L


def test_knn_shapley_matches_exact_rational_replay(spark, sf_dir):
    totals, eff_checks, L = _numpy_shapley(sf_dir)
    for got, want in eff_checks:
        assert got == want, "efficiency axiom violated in replay"
    rows = _run(spark, sf_dir, "knn_shapley_data_values")
    assert rows, "empty result"
    expect = sorted(
        ((v * L, nid) for nid, v in totals.items()),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    for r, (sv, nid) in zip(rows, expect):
        assert sv.denominator == 1, "scaled value not integral"
        assert r["nid"] == nid
        assert r["shapley_scaled"] == int(sv)


def test_knn_shapley_bounds(spark, sf_dir):
    """Per-appearance value is bounded by the single-point utility
    range: |mean contribution| <= 1 (value of one point for one test
    probe can never exceed 1/K * K = 1)."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        SHAP_L,
    )

    for r in _run(spark, sf_dir, "knn_shapley_data_values"):
        per_app = r["shapley_scaled"] / (SHAP_L * r["n_appearances"])
        assert -1.0 <= per_app <= 1.0
        assert 0 <= r["n_same_label"] <= r["n_appearances"]


def _baskets(sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o
          ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    by_cust: dict[int, set[int]] = {}
    for c, p in rows:
        by_cust.setdefault(c, set()).add(p)
    return by_cust


def test_apriori_triples_antimonotone(spark, sf_dir):
    """Every reported triple's support must be exact, >= 2, and every
    sub-pair's support >= BASKET_SUP (anti-monotonicity — the gate
    Apriori candidate generation is supposed to enforce)."""
    from braintumor_data_pipeline_spark.operators.basket import (
        BASKET_SUP,
    )

    by_cust = _baskets(sf_dir)
    for r in _run(spark, sf_dir, "frequent_triples_apriori"):
        a, b, c = r["item_a"], r["item_b"], r["item_c"]
        assert a < b < c
        sup = sum(
            1 for s in by_cust.values() if a in s and b in s and c in s
        )
        assert sup == r["support"] and sup >= 2
        for x, y in ((a, b), (a, c), (b, c)):
            psup = sum(1 for s in by_cust.values() if x in s and y in s)
            assert psup >= BASKET_SUP, "sub-pair below support gate"


def test_assoc_rules_consistency(spark, sf_dir):
    """confidence = support/|ant|, lift = confidence * N / |con|,
    recomputed from raw baskets; mirrored rules carry equal lift."""
    by_cust = _baskets(sf_dir)
    n = len(by_cust)
    rows = _run(spark, sf_dir, "assoc_rules_lift")
    lifts = {}
    for r in rows:
        ant, con = r["antecedent"], r["consequent"]
        ca = sum(1 for s in by_cust.values() if ant in s)
        cc = sum(1 for s in by_cust.values() if con in s)
        cab = sum(1 for s in by_cust.values() if ant in s and con in s)
        assert cab == r["support_count"]
        assert abs(r["confidence"] - round(cab / ca, 6)) < 1e-9
        assert abs(r["lift"] - round(cab * n / (ca * cc), 6)) < 1e-9
        lifts[(ant, con)] = r["lift"]
    for (a, b), v in lifts.items():
        if (b, a) in lifts:
            assert lifts[(b, a)] == v
