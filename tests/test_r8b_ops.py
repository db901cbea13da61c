"""Property/replay tests for the late-r8 operator batch (ANOVA F,
Tukey, SPRT, Simpson screen, quantile normalization, Kendall τ,
Mann-Kendall, ridge, label propagation, HITS, DBSCAN, top-eigen
squaring, DP Laplace, RAKE, CDC chunking, activity bitmaps,
stickiness, revenue decomposition, log-rank, James-Stein) —
invariants the DuckDB value-parity oracle cannot express (they hold
for ANY input) plus independent pure-Python replays, at sf0.001.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from braintumor_data_pipeline_spark import registry


def _run(spark, sf_dir, name):
    return registry.all_queries()[name].fn(spark, sf_dir).collect()


def test_anova_f_matches_numpy_replay(spark, sf_dir):
    """Recompute one-way ANOVA independently from the raw fixture via
    pure Python and compare to the operator's single output row."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    groups = defaultdict(list)
    for ty, v in zip(
        t.column("event_type").to_pylist(), t.column("value").to_pylist()
    ):
        groups[ty].append(round(v * 100))
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    s = sum(sum(g) for g in groups.values())
    ssb = sum(sum(g) ** 2 / len(g) for g in groups.values()) - s * s / n
    sst = sum(c * c for g in groups.values() for c in g) - s * s / n
    ssw = sst - ssb
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))

    (row,) = _run(spark, sf_dir, "anova_f_event_value")
    assert row["k_groups"] == k == 5
    assert row["n_total"] == n
    assert math.isclose(row["f_stat"], f_ref, rel_tol=1e-5)
    assert math.isclose(row["ss_between"], ssb / 10000, rel_tol=1e-6)
    assert math.isclose(row["ss_within"], ssw / 10000, rel_tol=1e-6)


def test_sprt_decision_consistency(spark, sf_dir):
    """Every decided user's crossing LLR must actually sit beyond the
    decided boundary, the crossing index must be within the trial
    count, and 'continue' users must carry NULL crossing fields."""
    from braintumor_data_pipeline_spark.operators.experiments import (
        _SPRT_C1,
        _SPRT_C2,
        _SPRT_LNA,
        _SPRT_LNB,
    )

    rows = _run(spark, sf_dir, "sprt_purchase_rate")
    assert rows, "every user has events at every SF"
    seen = set()
    for r in rows:
        assert r["user_id"] not in seen
        seen.add(r["user_id"])
        if r["decision"] == "continue":
            assert r["n_at"] is None and r["k_at"] is None
            # no prefix may have crossed: final LLR inside the band is
            # necessary (not sufficient, but cheap) — recompute it
            llr = r["k_total"] * _SPRT_C1 + (
                r["n_trials"] - r["k_total"]
            ) * _SPRT_C2
            assert _SPRT_LNB < llr < _SPRT_LNA
        else:
            assert 1 <= r["n_at"] <= r["n_trials"]
            assert 0 <= r["k_at"] <= r["n_at"]
            llr = r["k_at"] * _SPRT_C1 + (r["n_at"] - r["k_at"]) * _SPRT_C2
            if r["decision"] == "h1":
                assert llr >= _SPRT_LNA
            else:
                assert r["decision"] == "h0"
                assert llr <= _SPRT_LNB
            assert math.isclose(r["llr_at"], round(llr, 6), abs_tol=1e-9)


def test_sprt_first_crossing_is_first(spark, sf_dir):
    """Replay one decided user's full stream in Python and assert the
    reported crossing is the FIRST index that exits the band."""
    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.experiments import (
        _SPRT_C1,
        _SPRT_C2,
        _SPRT_LNA,
        _SPRT_LNB,
    )

    rows = _run(spark, sf_dir, "sprt_purchase_rate")
    decided = [r for r in rows if r["decision"] != "continue"]
    if not decided:
        return
    target = decided[0]
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    evs = sorted(
        (ts, eid, ty)
        for ts, eid, ty, uid in zip(
            t.column("ts").to_pylist(),
            t.column("event_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("user_id").to_pylist(),
        )
        if uid == target["user_id"]
    )
    k = 0
    for n, (_, _, ty) in enumerate(evs, start=1):
        k += ty == "purchase"
        llr = k * _SPRT_C1 + (n - k) * _SPRT_C2
        if llr >= _SPRT_LNA or llr <= _SPRT_LNB:
            assert n == target["n_at"] and k == target["k_at"]
            return
    raise AssertionError("replay never crossed but operator decided")


def test_simpsons_screen_signs(spark, sf_dir):
    """group_sign/overall_sign are in {-1,0,1}; flipped is exactly the
    strict sign-product test; overall_sign is one shared value."""
    rows = _run(spark, sf_dir, "simpsons_paradox_screen")
    assert {r["returnflag"] for r in rows} == {"A", "N", "R"}
    overall = {r["overall_sign"] for r in rows}
    assert len(overall) == 1
    for r in rows:
        assert r["group_sign"] in (-1, 0, 1)
        assert r["overall_sign"] in (-1, 0, 1)
        assert r["flipped"] == (r["group_sign"] * r["overall_sign"] < 0)


def test_label_propagation_within_components(spark, sf_dir):
    """LPA communities refine connected components: two nodes sharing a
    community label after any number of sync rounds must be in the same
    component (labels only travel along edges). Also: every node keeps
    a label that exists somewhere in its component."""
    lpa = {
        r["part_id"]: r["community"]
        for r in _run(spark, sf_dir, "label_propagation_communities")
    }
    cc = {
        r["part_id"]: r["component"]
        for r in _run(spark, sf_dir, "copurchase_components")
    }
    assert set(lpa) == set(cc)
    comm_to_comp = {}
    for node, comm in lpa.items():
        comp = cc[node]
        assert comm_to_comp.setdefault(comm, comp) == comp, (
            "community label crossed a component boundary"
        )
    # mode-label communities must be at least as numerous as components
    assert len(set(lpa.values())) >= len(set(cc.values()))


def test_dp_laplace_noise_is_seeded_laplace(spark, sf_dir):
    """Noise replays exactly from the cell key (seeded, not sampled),
    and the released value is count + noise."""
    import hashlib

    rows = _run(spark, sf_dir, "dp_laplace_noisy_counts")
    assert rows
    for r in rows:
        h = hashlib.md5(
            f"{r['lang']}|{r['source']}".encode()
        ).hexdigest()[:12]
        u = (int(h, 16) + 0.5) / 2**48
        if u >= 0.5:
            noise = -round(math.log(2.0 * (1.0 - u)), 6)
        else:
            noise = round(math.log(2.0 * u), 6)
        assert math.isclose(r["noise"], round(noise, 6), abs_tol=1e-9)
        assert math.isclose(
            r["noisy_n"], round(r["true_n"] + noise, 6), abs_tol=1e-9
        )
        assert r["true_n"] >= 1


def test_rake_scores_replay(spark, sf_dir):
    """Replay RAKE in pure Python over the raw fixture text and compare
    the full top-50 (phrase, score) list."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.text import STOPWORDS

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    phrases = []
    for text in t.column("text").to_pylist():
        run = []
        for w in text.split(" "):
            if w in STOPWORDS:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    freq = Counter(w for p in phrases for w in p)
    deg = defaultdict(int)
    for p in phrases:
        for w in p:
            deg[w] += len(p)
    ws = {w: deg[w] * 1000000 // freq[w] for w in freq}
    agg = {}
    occ = Counter()
    for p in phrases:
        agg[" ".join(p)] = (len(p), sum(ws[w] for w in p))
        occ[" ".join(p)] += 1
    top = sorted(
        ((v[1], k) for k, v in agg.items()), key=lambda x: (-x[0], x[1])
    )[:50]

    rows = _run(spark, sf_dir, "rake_keyword_scores")
    assert [(r["score_scaled"], r["phrase"]) for r in rows] == top
    for r in rows:
        assert r["n_words"] == agg[r["phrase"]][0]
        assert r["n_occurrences"] == occ[r["phrase"]]


def test_tukey_consistent_with_anova(spark, sf_dir):
    """10 ordered pairs; antisymmetric diffs; q and diff share sign;
    the pair means must bracket zero consistently with the per-type
    means implied by the ANOVA moments."""
    rows = _run(spark, sf_dir, "tukey_pairwise_contrasts")
    assert len(rows) == 10
    pairs = {(r["type_a"], r["type_b"]) for r in rows}
    assert all(a < b for a, b in pairs)
    for r in rows:
        if r["diff_dollars"] != 0:
            assert (r["q_stat"] > 0) == (r["diff_dollars"] > 0)


def test_quantile_normalize_same_target_distribution(spark, sf_dir):
    """After normalization every group must report (near-)identical
    pooled extremes — that IS the point of quantile normalization. The
    shared maximum is exactly the pooled max for the group(s) whose
    final rank maps to k = N."""
    import pyarrow.parquet as pq

    rows = _run(spark, sf_dir, "quantile_normalize_event_values")
    assert len(rows) == 5
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    cents = sorted(round(v * 100) for v in t.column("value").to_pylist())
    pooled_max = cents[-1] / 100.0
    for r in rows:
        # r = n_g maps to k = n_g*N//n_g = N exactly → pooled max
        assert math.isclose(r["norm_max"], round(pooled_max, 6), abs_tol=1e-9)
        assert r["norm_min"] >= round(cents[0] / 100.0, 6) - 1e-9
        assert r["n"] >= 1


def test_cdc_chunk_accounting_and_replay(spark, sf_dir):
    """Replay the cut rule in Python: chunk counts/chars must tie out
    exactly, and total_chars must equal the corpus char count."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.dedup import CDC_MOD, CDC_W

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    store = Counter()
    total_chars = 0
    for text in t.column("text").to_pylist():
        total_chars += len(text)
        prev = 0
        for i in range(CDC_W, len(text) + 1):
            h = int(
                hashlib.md5(text[i - CDC_W : i].encode()).hexdigest()[:8], 16
            )
            if h % CDC_MOD == 0:
                store[text[prev:i]] += 1
                prev = i
        if prev < len(text):
            store[text[prev:]] += 1

    (row,) = _run(spark, sf_dir, "cdc_chunk_dedup")
    assert row["distinct_chunks"] == len(store)
    assert row["total_chunks"] == sum(store.values())
    assert row["total_chars"] == total_chars
    assert row["distinct_chars"] == sum(len(c) for c in store)
    assert row["dup_chunks"] == sum(v - 1 for v in store.values())
    assert row["max_copies"] == max(store.values())
    ratio = 1.0 - sum(len(c) for c in store) / total_chars
    assert math.isclose(row["char_dedup_ratio"], round(ratio, 6), abs_tol=1e-9)


def test_cdc_chunk_short_doc_guard(spark, tmp_path):
    """Docs shorter than CDC_W must contribute ZERO w-gram positions.

    Regression for the r8 ADVICE finding: Spark's sequence(CDC_W, len)
    DESCENDS when len < CDC_W, inventing positions whose substring start
    is <= 0 (counted from the string end) — any such phantom w-gram
    hashing to 0 mod CDC_MOD added a cut the oracle's empty
    range(CDC_W, len+1) never produces. The fixture can't catch this
    (min doc length 44), so replay on a synthetic corpus of sub-window
    docs, including the exact-boundary lengths 7 and 8.
    """
    import hashlib
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.dedup import (
        CDC_MOD,
        CDC_W,
        cdc_chunk_dedup,
    )

    texts = [
        "a",  # len 1
        "ab",  # len 2
        "abcdefg",  # len 7 == CDC_W - 1 (descending-sequence trigger)
        "abcdefgh",  # len 8 == CDC_W exactly (one position)
        "abcdefg",  # duplicate short doc → copies=2 for its chunk
        "the quick brown fox jumps over the lazy dog " * 3,  # long doc
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    store = Counter()
    total_chars = 0
    for text in texts:
        total_chars += len(text)
        prev = 0
        for i in range(CDC_W, len(text) + 1):
            h = int(
                hashlib.md5(text[i - CDC_W : i].encode()).hexdigest()[:8],
                16,
            )
            if h % CDC_MOD == 0:
                store[text[prev:i]] += 1
                prev = i
        if prev < len(text):
            store[text[prev:]] += 1

    (row,) = cdc_chunk_dedup(spark, str(tmp_path)).collect()
    assert row["distinct_chunks"] == len(store)
    assert row["total_chunks"] == sum(store.values())
    assert row["total_chars"] == total_chars
    assert row["distinct_chars"] == sum(len(c) for c in store)
    assert row["max_copies"] == max(store.values()) >= 2


def test_kendall_tau_replay(spark, sf_dir):
    """Replay Kendall τ-b in pure Python from the raw fixture."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    rev = defaultdict(int)
    users = defaultdict(set)
    for ts, v, uid in zip(
        t.column("ts").to_pylist(),
        t.column("value").to_pylist(),
        t.column("user_id").to_pylist(),
    ):
        d = ts.date()
        rev[d] += math.floor(v * 100 + 0.5)
        users[d].add(uid)
    days = sorted(rev)
    pts = [(rev[d], len(users[d])) for d in days]
    nc = nd = tx = ty = 0
    n = len(pts)
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    npairs = n * (n - 1) // 2
    tau = (nc - nd) / math.sqrt((npairs - tx) * (npairs - ty))

    (row,) = _run(spark, sf_dir, "kendall_tau_daily")
    assert row["n_days"] == n
    assert row["n_pairs"] == npairs
    assert (row["nc"], row["nd"]) == (nc, nd)
    assert (row["tied_x"], row["tied_y"]) == (tx, ty)
    assert math.isclose(row["tau_b"], round(tau, 6), abs_tol=1e-9)


def test_bitmap_activity_streaks(spark, sf_dir):
    """Bitmap invariants: popcount ties out with the distinct active
    days recomputed from the fixture; streak counts are consistent
    (triples ≤ pairs ≤ active_days − 1 when active_days ≥ 1)."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ref = defaultdict(set)
    for ts, uid in zip(
        t.column("ts").to_pylist(), t.column("user_id").to_pylist()
    ):
        ref[(uid, ts.year, ts.month)].add(ts.day)

    rows = _run(spark, sf_dir, "bitmap_activity_index")
    assert len(rows) == len(ref)
    for r in rows:
        key = (r["user_id"], r["month"].year, r["month"].month)
        days = ref[key]
        assert r["day_bitmap"] == sum(1 << (d - 1) for d in days)
        assert r["active_days"] == len(days)
        pairs = sum(1 for d in days if d + 1 in days)
        triples = sum(1 for d in days if d + 1 in days and d + 2 in days)
        assert r["consecutive_day_pairs"] == pairs
        assert r["consecutive_day_triples"] == triples


def test_dbscan_invariants(spark, sf_dir):
    """DBSCAN structure: every embedding classified exactly once; core
    points carry their own component's label; border points carry some
    core neighbor's label; noise carries NULL; cluster labels are
    core-point ids; roles partition consistently with the near-dup
    graph degrees."""
    from collections import defaultdict

    rows = _run(spark, sf_dir, "dbscan_lsh_clusters")
    pairs = _run(spark, sf_dir, "embedding_neardup_pairs")
    from braintumor_data_pipeline_spark.operators.similarity import (
        DBSCAN_MINPTS,
    )

    nbrs = defaultdict(set)
    for p in pairs:
        nbrs[p["vec_a"]].add(p["vec_b"])
        nbrs[p["vec_b"]].add(p["vec_a"])
    core = {v for v, ns in nbrs.items() if len(ns) >= DBSCAN_MINPTS - 1}
    by_id = {r["vec_id"]: r for r in rows}
    assert len(by_id) == len(rows)
    for r in rows:
        v = r["vec_id"]
        if r["role"] == "core":
            assert v in core
            assert r["cluster"] is not None
        elif r["role"] == "border":
            assert v not in core
            assert nbrs[v] & core, "border must touch a core"
            assert r["cluster"] in {by_id[c]["cluster"] for c in nbrs[v] & core}
        else:
            assert r["role"] == "noise"
            assert v not in core and not (nbrs[v] & core)
            assert r["cluster"] is None
    # core labels are consistent within core-core neighborhoods
    for v in core:
        for u in nbrs[v] & core:
            assert by_id[v]["cluster"] == by_id[u]["cluster"]


def test_power_iteration_matches_numpy_eigh(spark, sf_dir):
    """The integer power iteration must land on numpy's top eigenpair
    of the SAME scaled covariance: |cos(v, v_numpy)| ≥ 0.999 and the
    Rayleigh estimate within the power-iteration gap of λ_max."""
    import numpy as np
    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.similarity import POWER_Q

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    x = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    q = np.floor(x * POWER_Q + 0.5).astype(np.int64)
    n = len(q)
    c = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    evals, evecs = np.linalg.eigh(c.astype(np.float64))
    lam, top = evals[-1], evecs[:, -1]

    rows = _run(spark, sf_dir, "power_iteration_top_eigen")
    assert len(rows) == 64
    v = np.array([r["v_scaled"] for r in sorted(rows, key=lambda r: r["dim"])])
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.999, f"direction off: |cos|={cos}"
    ray = rows[0]["eigenvalue_scaled"]
    assert all(r["eigenvalue_scaled"] == ray for r in rows)
    assert abs(ray - lam) / lam < 0.01, f"rayleigh {ray} vs eigh {lam}"


def test_ridge_lambda_zero_is_ols_and_shrinks(spark, sf_dir):
    """λ=0 must reproduce plain OLS recomputed from raw data via
    numpy lstsq; growing λ must shrink the feature coefficients toward
    zero (monotone |θ1|, |θ2|); numpy ridge replay must match."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
    # SQL round() is HALF_UP — replicate with floor(x+0.5), not
    # numpy's banker's rounding (price cents hit exact .5 boundaries)
    x1 = np.floor(np.array(t.column("l_quantity").to_pylist()) + 0.5)
    x2 = np.floor(np.array(t.column("l_discount").to_pylist()) * 100 + 0.5)
    y = np.floor(
        np.array(t.column("l_extendedprice").to_pylist()) * 100 + 0.5
    )
    X = np.column_stack([np.ones_like(x1), x1, x2])

    rows = _run(spark, sf_dir, "ridge_regression_grid")
    assert [r["lam"] for r in rows] == [0, 10000, 1000000]
    for r in rows:
        # the operator leaves the intercept unpenalized
        A = X.T @ X + r["lam"] * np.diag([0.0, 1.0, 1.0])
        theta = np.linalg.solve(A, X.T @ y) / 100
        assert abs(r["theta0"] - theta[0]) < 1e-3
        assert abs(r["theta1"] - theta[1]) < 1e-6
        assert abs(r["theta2"] - theta[2]) < 1e-4
        yhat = (theta[0] + 25 * theta[1] + 5 * theta[2])
        assert abs(r["yhat_q25_d5"] - yhat) < 1e-3


def test_mann_kendall_replay(spark, sf_dir):
    """Exact S / Var(S) / Z replay in pure Python."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    rev = defaultdict(int)
    for ts, v in zip(t.column("ts").to_pylist(), t.column("value").to_pylist()):
        rev[ts.date()] += math.floor(v * 100 + 0.5)
    ys = [rev[d] for d in sorted(rev)]
    n = len(ys)
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(ys)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0

    (row,) = _run(spark, sf_dir, "mann_kendall_trend")
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert math.isclose(row["var_s"], round(var, 6), abs_tol=1e-9)
    assert math.isclose(row["z_stat"], round(z, 6), abs_tol=1e-9)
    assert row["trend"] == (
        "increasing" if s > 0 else "decreasing" if s < 0 else "no_trend"
    )


def test_hits_replay(spark, sf_dir):
    """Replay the exact integer HITS trajectory in pure Python from
    the raw fixture and compare the full top-20 tables."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.graph import (
        HITS_ROUNDS,
        HITS_VSCALE,
    )

    ot = pq.read_table(os.path.join(sf_dir, "orders.parquet"))
    lt = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
    cust_of = dict(
        zip(ot.column("o_orderkey").to_pylist(), ot.column("o_custkey").to_pylist())
    )
    edges = set()
    for ok, pk in zip(
        lt.column("l_orderkey").to_pylist(), lt.column("l_partkey").to_pylist()
    ):
        edges.add((cust_of[ok], pk))
    by_cust = defaultdict(list)
    by_part = defaultdict(list)
    for c, p in edges:
        by_cust[c].append(p)
        by_part[p].append(c)
    h = {c: HITS_VSCALE for c in by_cust}
    for _ in range(HITS_ROUNDS):
        a = {p: sum(h[c] for c in cs) for p, cs in by_part.items()}
        m = max(max(a.values()) // HITS_VSCALE, 1)
        a = {p: v // m for p, v in a.items()}
        h = {c: sum(a[p] for p in ps) for c, ps in by_cust.items()}
        m = max(max(h.values()) // HITS_VSCALE, 1)
        h = {c: v // m for c, v in h.items()}
    top_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    top_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    rows = _run(spark, sf_dir, "hits_hubs_authorities")
    got_a = [
        (r["node_id"], r["score_scaled"])
        for r in rows
        if r["side"] == "authority"
    ]
    got_h = [
        (r["node_id"], r["score_scaled"]) for r in rows if r["side"] == "hub"
    ]
    assert got_a == top_a
    assert got_h == top_h


def test_stickiness_bounds_and_replay(spark, sf_dir):
    """avg_dau ≤ mau (a day's actives are a subset of the month's);
    stickiness in (0, 1]; dau_min ≤ avg ≤ dau_max; replay MAU."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    mau = defaultdict(set)
    for ts, uid in zip(
        t.column("ts").to_pylist(), t.column("user_id").to_pylist()
    ):
        mau[(ts.year, ts.month)].add(uid)

    rows = _run(spark, sf_dir, "stickiness_dau_mau")
    assert len(rows) == len(mau)
    for r in rows:
        assert r["mau"] == len(mau[(r["month"].year, r["month"].month)])
        assert r["dau_min"] <= r["avg_dau"] <= r["dau_max"]
        assert 0 < r["stickiness"] <= 1
        assert math.isclose(
            r["stickiness"], round(r["avg_dau"] / r["mau"], 6), abs_tol=2e-6
        )


def test_revenue_decomposition_parts_sum_to_delta(spark, sf_dir):
    """The whole point of the identity: the three attribution parts
    must sum EXACTLY (pre-rounding algebra) to ΔRPU = rpu_B − rpu_A."""
    rows = {r["arm"]: r for r in _run(spark, sf_dir, "revenue_decomposition_by_arm")}
    a, b = rows["A"], rows["B"]
    assert a["delta_from_conversion"] == a["delta_from_aov"] == 0.0
    d_rpu = b["rpu"] - a["rpu"]
    parts = (
        b["delta_from_conversion"]
        + b["delta_from_aov"]
        + b["delta_interaction"]
    )
    # parts computed pre-rounding sum to the exact delta; 6-dp rounding
    # of four quantities bounds the discrepancy by 2e-6
    assert abs(parts - d_rpu) < 2e-6
    # consistency: rpu = conversion_rate * aov (up to rounding)
    for r in (a, b):
        assert abs(r["rpu"] - r["conversion_rate"] * r["aov"]) < 1e-4


def test_logrank_replay(spark, sf_dir):
    """Replay the log-rank statistic in pure Python using the exact
    lifetime/censoring definitions shared with kaplan_meier."""
    import hashlib
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    first = {}
    last = {}
    for ts, uid in zip(
        t.column("ts").to_pylist(), t.column("user_id").to_pylist()
    ):
        us = int(ts.timestamp() * 1_000_000)
        first[uid] = min(first.get(uid, us), us)
        last[uid] = max(last.get(uid, us), us)
    stream_end = max(last.values())
    users = []
    for uid in first:
        arm = (
            "A"
            if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"
            else "B"
        )
        life = (last[uid] - first[uid]) // 3_600_000_000
        cens = last[uid] >= stream_end - 86_400_000_000
        users.append((arm, life, cens))
    grid = defaultdict(lambda: [0, 0, 0, 0])  # d_t, d_at, c_t, c_at
    for arm, life, cens in users:
        g = grid[life]
        g[0] += not cens
        g[1] += (arm == "A") and not cens
        g[2] += 1
        g[3] += arm == "A"
    n_all = len(users)
    n_a = sum(1 for a, _, _ in users if a == "A")
    seen_t = seen_a = 0
    o = e = v = 0.0
    n_times = 0
    for life in sorted(grid):
        d_t, d_at, c_t, c_at = grid[life]
        n_t = n_all - seen_t
        n_at = n_a - seen_a
        seen_t += c_t
        seen_a += c_at
        if d_t == 0:
            continue
        n_times += 1
        frac = n_at / n_t
        o += d_at
        e += d_t * frac
        if n_t > 1:
            v += d_t * frac * (1 - frac) * (n_t - d_t) / (n_t - 1)
    chi2 = (o - e) ** 2 / v

    (row,) = _run(spark, sf_dir, "logrank_test_arms")
    assert row["n_users_a"] == n_a
    assert row["n_users_b"] == n_all - n_a
    assert row["n_event_times"] == n_times
    assert row["observed_a"] == o
    assert math.isclose(row["expected_a"], round(e, 6), abs_tol=1e-6)
    assert math.isclose(row["logrank_chi2"], round(chi2, 6), abs_tol=1e-6)


def test_james_stein_shrinks_toward_grand(spark, sf_dir):
    """0 ≤ shrink ≤ 1 (positive part); every js_mean lies between the
    raw mean and the grand mean; replay the shrink factor exactly."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    per = defaultdict(lambda: [0, 0, 0])  # n, s1, s2
    for ty, v, uid in zip(
        t.column("event_type").to_pylist(),
        t.column("value").to_pylist(),
        t.column("user_id").to_pylist(),
    ):
        if ty != "purchase":
            continue
        c = round(v * 100)
        g = per[uid]
        g[0] += 1
        g[1] += c
        g[2] += c * c
    k = len(per)
    n_all = sum(g[0] for g in per.values())
    s_all = sum(g[1] for g in per.values())
    q_all = sum(g[2] for g in per.values())
    sb_int = sum(g[1] * g[1] // g[0] for g in per.values())
    grand = s_all / n_all
    shrink = max(
        0.0,
        1.0
        - (k - 3)
        * ((q_all - sb_int) / (n_all - k))
        / (sb_int - s_all * s_all // n_all),
    )

    rows = _run(spark, sf_dir, "james_stein_group_means")
    assert len(rows) == k
    for r in rows:
        assert math.isclose(
            r["shrink_factor"], round(shrink, 6), abs_tol=1e-9
        )
        assert 0.0 <= r["shrink_factor"] <= 1.0
        lo, hi = sorted((r["raw_mean"], round(grand / 100, 6)))
        assert lo - 1e-6 <= r["js_mean"] <= hi + 1e-6
        n, s1, _ = per[r["user_id"]]
        assert r["n"] == n
        assert math.isclose(
            r["raw_mean"], round(s1 / n / 100, 6), abs_tol=1e-9
        )


def test_decision_stump_replay(spark, sf_dir):
    """Replay the full Gini split curve in pure Python; the flagged
    best split must be the true argmin with t tie-break."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
    hist = defaultdict(lambda: [0, 0])
    for q, rf in zip(
        t.column("l_quantity").to_pylist(), t.column("l_returnflag").to_pylist()
    ):
        g = hist[round(q)]
        g[0] += 1
        g[1] += rf == "R"
    n_all = sum(g[0] for g in hist.values())
    pos_all = sum(g[1] for g in hist.values())

    def gini(n, pos):
        p = pos / n
        return 1 - p * p - (1 - p) * (1 - p)

    curve = {}
    n_l = pos_l = 0
    for x in sorted(hist):
        n_l += hist[x][0]
        pos_l += hist[x][1]
        if n_l == n_all:
            break
        gw = (
            n_l * gini(n_l, pos_l)
            + (n_all - n_l) * gini(n_all - n_l, pos_all - pos_l)
        ) / n_all
        curve[x] = (n_l, pos_l, n_all - n_l, pos_all - pos_l, gw)
    best_t = min(curve, key=lambda x: (curve[x][4], x))

    rows = _run(spark, sf_dir, "decision_stump_gini")
    assert len(rows) == len(curve)
    for r in rows:
        ref = curve[r["t"]]
        assert (r["n_l"], r["pos_l"], r["n_r"], r["pos_r"]) == ref[:4]
        assert math.isclose(r["weighted_gini"], round(ref[4], 6), abs_tol=1e-9)
        assert r["is_best_split"] == (r["t"] == best_t)


def test_markov_entropy_rate_replay(spark, sf_dir):
    """Replay per-state conditional entropies (with the operator's
    6-dp per-cell quantization) and check the weighted contributions
    sum to the plug-in entropy rate."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    by_user = defaultdict(list)
    for ts, eid, ty, uid in zip(
        t.column("ts").to_pylist(),
        t.column("event_id").to_pylist(),
        t.column("event_type").to_pylist(),
        t.column("user_id").to_pylist(),
    ):
        by_user[uid].append((ts, eid, ty))
    trans = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            trans[(a[2], b[2])] += 1
    row_n = defaultdict(int)
    for (s, _), c in trans.items():
        row_n[s] += c
    n = sum(trans.values())
    h_row = defaultdict(float)
    for (s, _), c in trans.items():
        p = c / row_n[s]
        h_row[s] += round(-p * math.log(p), 6)

    rows = _run(spark, sf_dir, "markov_entropy_rate")
    assert {r["state"] for r in rows} == set(row_n)
    total = 0.0
    for r in rows:
        s = r["state"]
        assert r["n_transitions"] == row_n[s]
        assert math.isclose(
            r["row_entropy_nats"], round(h_row[s], 6), abs_tol=2e-6
        )
        assert math.isclose(
            r["weighted_contribution_nats"],
            round(row_n[s] / n * h_row[s], 6),
            abs_tol=2e-6,
        )
        total += r["weighted_contribution_nats"]
    # plug-in entropy rate of a 5-state chain: 0 < H <= ln 5
    assert 0 < total <= math.log(5) + 1e-6


def test_fano_replay(spark, sf_dir):
    """Exact replay of per-type daily-count Fano factors."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    daily = defaultdict(int)
    for ts, ty in zip(
        t.column("ts").to_pylist(), t.column("event_type").to_pylist()
    ):
        daily[(ty, ts.date())] += 1
    by_type = defaultdict(list)
    for (ty, _), c in daily.items():
        by_type[ty].append(c)
    rows = _run(spark, sf_dir, "fano_overdispersion")
    assert {r["event_type"] for r in rows} == set(by_type)
    for r in rows:
        cs = by_type[r["event_type"]]
        n = len(cs)
        mean = sum(cs) / n
        var = (sum(c * c for c in cs) - sum(cs) ** 2 / n) / (n - 1)
        assert r["n_days"] == n
        assert math.isclose(r["mean_daily"], round(mean, 6), abs_tol=1e-6)
        assert math.isclose(r["var_daily"], round(var, 6), abs_tol=1e-6)
        assert math.isclose(
            r["fano_factor"], round(var / mean, 6), abs_tol=1e-6
        )
        assert r["overdispersed"] == (var / mean > 1.5)


def test_page_hinkley_replay(spark, sf_dir):
    """Sequential Python replay of the PH gap; the gap is always ≥ 0
    and resets follow the running-minimum definition."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from braintumor_data_pipeline_spark.operators.timeseries import (
        PH_DELTA_CENTS,
        PH_LAMBDA_CENTS,
    )

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    cents = defaultdict(int)
    cnt = defaultdict(int)
    for ts, v in zip(t.column("ts").to_pylist(), t.column("value").to_pylist()):
        d = ts.date()
        cents[d] += math.floor(v * 100 + 0.5)
        cnt[d] += 1
    s_c = s_n = 0.0
    m = 0.0
    m_min = math.inf
    rows = {r["day"]: r for r in _run(spark, sf_dir, "page_hinkley_drift")}
    assert len(rows) == len(cents)
    for i, d in enumerate(sorted(cents), start=1):
        xbar = cents[d] / cnt[d]
        s_c += cents[d]
        s_n += cnt[d]
        mu = s_c / s_n
        m += xbar - mu - PH_DELTA_CENTS
        m_min = min(m_min, m)
        gap = m - m_min
        r = rows[d]
        assert r["t"] == i
        assert math.isclose(r["day_mean"], round(xbar / 100, 6), abs_tol=1e-6)
        assert math.isclose(r["running_mean"], round(mu / 100, 6), abs_tol=1e-6)
        assert math.isclose(r["ph_gap_cents"], round(gap, 6), abs_tol=1e-5)
        assert r["ph_gap_cents"] >= 0
        assert r["drift_alarm"] == (r["ph_gap_cents"] > PH_LAMBDA_CENTS)
