"""Similarity-search quality checks (SURVEY J5)."""

from __future__ import annotations

from braintumor_data_pipeline_spark.operators.similarity import (
    ann_lsh_cosine,
    knn_bruteforce_cosine,
)


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """The LSH path must find a decent share of the true top-5 neighbors
    for the query set (vec_id < 50) — quality gate on the approximate
    plan, not just 'it returns rows'."""
    exact = {
        (r.qid, r.nid) for r in knn_bruteforce_cosine(spark, sf_dir).collect()
    }
    approx = {
        (r.qid, r.nid)
        for r in ann_lsh_cosine(spark, sf_dir).collect()
        if r.qid < 50
    }
    assert exact, "bruteforce returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall too low: {recall:.2f}"


def test_neardup_lsh_recall_vs_allpairs(spark, sf_dir):
    """The registered near-dup query is LSH-bucketed (sub-quadratic);
    its output must be a subset of the exact all-pairs result (the LSH
    never invents pairs — exact re-check) with solid recall."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        embedding_neardup_allpairs,
        embedding_neardup_pairs,
    )

    lsh = {(r.vec_a, r.vec_b) for r in embedding_neardup_pairs(spark, sf_dir).collect()}
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_neardup_allpairs(spark, sf_dir).collect()
    }
    assert exact, "all-pairs reference returned nothing"
    assert lsh <= exact, "LSH produced a pair the exact check rejects"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.7, f"near-dup LSH recall too low: {recall:.2f}"


def test_bruteforce_sims_sane(spark, sf_dir):
    rows = knn_bruteforce_cosine(spark, sf_dir).collect()
    assert all(-1.0 <= r.sim <= 1.0 for r in rows)
    # each query has exactly 5 ranked neighbors
    from collections import Counter

    per_q = Counter(r.qid for r in rows)
    assert set(per_q.values()) == {5}


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF (learned 16-cell quantizer, nprobe=4) must recover a solid
    share of the true top-5 — and by construction scans only ~nprobe/K
    of the base side per query."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        ann_ivf_cosine,
    )

    exact = {
        (r.qid, r.nid) for r in knn_bruteforce_cosine(spark, sf_dir).collect()
    }
    approx = {(r.qid, r.nid) for r in ann_ivf_cosine(spark, sf_dir).collect()}
    assert exact, "bruteforce returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall:.2f}"


def test_ivf_each_query_ranked(spark, sf_dir):
    from collections import Counter

    from braintumor_data_pipeline_spark.operators.similarity import (
        ann_ivf_cosine,
    )

    rows = ann_ivf_cosine(spark, sf_dir).collect()
    per_q = Counter(r.qid for r in rows)
    # every query probes nonempty cells → full top-5 unless the corpus
    # inside the probed cells is smaller than 5 (never at these SFs)
    assert set(per_q.values()) == {5}
    assert all(1 <= r.rn <= 5 for r in rows)


def test_persisted_ivf_index_matches_inline(spark, sf_dir, tmp_path):
    """Build-once/query-many: searching the persisted, cell-clustered
    index returns exactly the inline IVF plan's results."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        ann_ivf_cosine,
        build_ivf_index,
        query_ivf_index,
    )

    idx = str(tmp_path / "ivf_index")
    cents = build_ivf_index(spark, sf_dir, idx)
    from_index = {
        (r.qid, r.nid, r.sim)
        for r in query_ivf_index(spark, sf_dir, idx, cents).collect()
    }
    inline = {
        (r.qid, r.nid, r.sim) for r in ann_ivf_cosine(spark, sf_dir).collect()
    }
    assert from_index == inline


def test_pq_adc_recall_vs_bruteforce(spark, sf_dir):
    """PQ-ADC with a 10% re-rank budget must recover most true top-5
    neighbors (measured 0.744 at sf0.01 on these random embeddings —
    the hard case for PQ; gate leaves noise margin)."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        knn_bruteforce_cosine,
        pq_adc_topk,
    )

    exact = {
        (r.qid, r.nid) for r in knn_bruteforce_cosine(spark, sf_dir).collect()
    }
    approx = {(r.qid, r.nid) for r in pq_adc_topk(spark, sf_dir).collect()}
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall too low: {recall:.2f}"


def test_pq_codes_pack_unpack(spark, sf_dir):
    """Every packed PQ code is 32 bits (M=8 nibbles), and each nibble is
    a valid codebook id < 16."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        PQ_M,
        _pq_assign,
        _pq_codebooks,
        _pq_subvectors,
    )
    from pyspark.sql import functions as F

    books = _pq_codebooks(spark, sf_dir)
    assert len(books) == PQ_M and all(len(b) == 16 for b in books)
    sub = _pq_subvectors(spark, sf_dir)
    codes = sub.select(
        _pq_assign(F.col("sv"), F.col("m"), books).alias("code")
    )
    bad = codes.filter((F.col("code") < 0) | (F.col("code") > 15)).count()
    assert bad == 0


def test_hybrid_rrf_formula_and_ordering(spark, sf_dir):
    """RRF scores must equal the formula applied to the reported ranks,
    descend monotonically, and dense rank 1 must be the query vector
    itself (cosine 1.0 with vec_id 0)."""
    from braintumor_data_pipeline_spark.operators.similarity import (
        hybrid_rrf_fusion_topk,
    )

    rows = hybrid_rrf_fusion_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    prev = float("inf")
    for r in rows:
        expect = 0.0
        if r.sparse_rank is not None:
            assert r.sparse_rank >= 1
            expect += 1.0 / (60 + r.sparse_rank)
        if r.dense_rank is not None:
            assert r.dense_rank >= 1
            expect += 1.0 / (60 + r.dense_rank)
        assert abs(r.rrf - expect) < 1e-6
        assert r.rrf <= prev + 1e-12
        prev = r.rrf
    by_dense = {r.dense_rank: r.doc_id for r in rows if r.dense_rank}
    if 1 in by_dense:
        assert by_dense[1] == 0


def test_trajectory_l1_identity(spark, sf_dir):
    """The L1 identity must match a brute-force python computation."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.operators.similarity import (
        behavior_trajectory_pairs,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    rows = behavior_trajectory_pairs(spark, sf_dir).collect()
    assert len(rows) > 0
    e = load_table(spark, sf_dir, "events")
    t0 = e.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    vec = defaultdict(lambda: defaultdict(int))
    for r in e.select("user_id", F.unix_micros("ts").alias("t")).collect():
        vec[r.user_id][(r.t - t0) // 86400000000] += 1
    for r in rows:
        days = set(vec[r.ua]) | set(vec[r.ub])
        l1 = sum(abs(vec[r.ua][d] - vec[r.ub][d]) for d in days)
        assert r.l1 == l1
    l1s = [r.l1 for r in rows]
    assert l1s == sorted(l1s)


def test_link_prediction_candidates_are_nonedges(spark, sf_dir):
    from braintumor_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from braintumor_data_pipeline_spark.operators.graph import (
        link_prediction_common_neighbors,
    )

    rows = link_prediction_common_neighbors(spark, sf_dir).collect()
    edges = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }
    edges |= {(b, a) for a, b in edges}
    for r in rows:
        assert (r.doc_a, r.doc_b) not in edges
        assert r.common_neighbors >= 2
        assert r.doc_a < r.doc_b


def test_pca_covariance_matches_numpy_and_is_psd(spark):
    """embedding_pca_covariance's exact integer moments reconstruct the
    numpy covariance matrix to quantization precision (2^-20 per
    value), and the resulting matrix is symmetric PSD with descending
    eigenvalues — the driver-side eigendecomposition (model state, like
    the IVF centroids) that completes the PCA."""
    import numpy as np

    from braintumor_data_pipeline_spark import registry
    from braintumor_data_pipeline_spark.operators.similarity import (
        _PCA_DIM,
        _PCA_Q,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.001"
    rows = (
        registry.all_queries()["embedding_pca_covariance"]
        .fn(spark, sf)
        .collect()
    )
    assert len(rows) == _PCA_DIM * (_PCA_DIM + 1) // 2
    n = rows[0].n
    cov = np.zeros((_PCA_DIM, _PCA_DIM))
    for r in rows:
        c = (float(r.sxy) / n - (r.si / n) * (r.sj / n)) / (_PCA_Q**2)
        cov[r.i, r.j] = c
        cov[r.j, r.i] = c

    x = np.stack(
        load_table(spark, sf, "embeddings")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    ref = np.cov(x, rowvar=False, bias=True)
    assert np.abs(cov - ref).max() < 1e-5

    vals = np.linalg.eigvalsh(cov)
    assert vals.min() > -1e-9  # PSD up to fp error
    evals, evecs = np.linalg.eigh(cov)
    proj = (x - x.mean(0)) @ evecs[:, ::-1][:, :2]
    v = proj.var(axis=0, ddof=0)
    assert v[0] >= v[1] > 0  # top component explains the most variance


def test_ivf_index_append_matches_full_build(spark, tmp_path):
    """Incremental index maintenance: build the IVF index from 80% of
    the vectors, append the remaining 20% under the same centroids —
    queries against the appended index return EXACTLY the results of a
    full build (same centroids either way, and cell assignment is a
    pure function of vector + centroids)."""
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.operators.similarity import (
        _nearest_cell,
        _vectors,
        append_to_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    full_dir = str(tmp_path / "ivf_full")
    incr_dir = str(tmp_path / "ivf_incr")

    cents = build_ivf_index(spark, sf, full_dir)
    full = {
        (r.qid, r.rn): (r.nid, r.sim)
        for r in query_ivf_index(spark, sf, full_dir, cents).collect()
    }

    vec = _vectors(spark, sf)
    n = vec.count()
    cut = int(n * 0.8)
    unit = F.transform("v", lambda x: x / F.col("nrm"))
    old = vec.filter(F.col("vec_id") < cut).select(
        F.col("vec_id").alias("nid"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
        _nearest_cell(unit, cents).alias("cell"),
    )
    old.repartition("cell").sortWithinPartitions("cell").write.mode(
        "overwrite"
    ).parquet(incr_dir)
    append_to_ivf_index(
        spark, sf, incr_dir, cents, vec.filter(F.col("vec_id") >= cut)
    )

    incr = {
        (r.qid, r.rn): (r.nid, r.sim)
        for r in query_ivf_index(spark, sf, incr_dir, cents).collect()
    }
    assert incr == full
    assert len(full) > 0
