"""Cross-run MinHash signature store (VERDICT r8 item 7): bucketed
build-once layout, capped probe join with NO store-side Exchange, and
an independent pure-Python replay of the probe semantics."""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

import pyarrow.parquet as pq

from braintumor_data_pipeline_spark.operators.dedup import (
    BAND_ROWS,
    LSH_BUCKET_CAP,
    MINHASH_A,
    MINHASH_B,
    MINHASH_K,
    STORE_BATCH_MOD,
    STORE_N_BUCKETS,
    ensure_minhash_band_store,
    minhash_store_probe_dedup,
)


def _py_bands(text: str) -> list[tuple[int, str]]:
    mins = [None] * MINHASH_K
    for tok in text.split(" "):
        h0 = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        for i in range(MINHASH_K):
            v = (MINHASH_A[i] * h0 + MINHASH_B[i]) % (1 << 32)
            if mins[i] is None or v < mins[i]:
                mins[i] = v
    out = []
    for b in range(MINHASH_K // BAND_ROWS):
        payload = ",".join(
            str(mins[i]) for i in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
        )
        out.append((b, hashlib.md5(payload.encode()).hexdigest()))
    return out


def test_store_probe_matches_pure_python_replay(spark, sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    docs = list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    buckets = defaultdict(list)  # (band, band_sig) -> store doc_ids
    for doc_id, text in docs:
        if doc_id % STORE_BATCH_MOD != 0:
            for key in _py_bands(text):
                buckets[key].append(doc_id)
    expect = {}
    for doc_id, text in docs:
        if doc_id % STORE_BATCH_MOD == 0:
            hit_bands, matches = set(), set()
            for key in _py_bands(text):
                members = buckets.get(key, [])
                if 0 < len(members) <= LSH_BUCKET_CAP:
                    hit_bands.add(key[0])
                    matches.update(members)
            expect[doc_id] = (
                len(hit_bands),
                len(matches),
                min(matches) if matches else -1,
                1 if matches else 0,
            )

    rows = minhash_store_probe_dedup(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (
            r["n_hit_bands"],
            r["n_store_matches"],
            r["min_store_doc"],
            r["is_near_dup"],
        )
        for r in rows
    }
    assert got == expect
    # every batch doc appears exactly once, including clean ones
    assert len(rows) == len(expect) > 0


def test_store_probe_plan_no_store_side_exchange(spark, sf_dir):
    """The store scan must expose its bucketing: with broadcast off the
    probe plans as SMJ where ONLY the batch side (and the final
    aggregation) exchange — the bucketed store side reads in place.
    At 100 TB that asymmetry IS the operator: the batch moves to the
    data, never the reverse."""
    ensure_minhash_band_store(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = minhash_store_probe_dedup(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert (
            f"SelectedBucketsCount: {STORE_N_BUCKETS} "
            f"out of {STORE_N_BUCKETS}" in plan
        )
        n_exchanges = plan.count("Exchange hashpartitioning")
        # batch signature-build exchange + batch→join exchange + final
        # groupBy(doc_id) exchange; the bucketed store side adds NONE
        assert n_exchanges <= 3, f"store side shuffles:\n{plan[:3000]}"
        # and the distinct-set aggregation must not plan an Expand
        # (bounded collect_set, not a multi-countDistinct rewrite)
        assert "Expand" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_store_build_idempotent_and_capped(spark, sf_dir):
    """Second ensure() is a no-op (same files); bucket_n in the layout
    equals the true bucket population, so the probe's precomputed cap
    filter equals a recount."""
    full = ensure_minhash_band_store(spark, sf_dir)
    st = spark.table(full)
    snap1 = sorted(
        (r["doc_id"], r["band"], r["band_sig"], r["bucket_n"])
        for r in st.collect()
    )
    assert ensure_minhash_band_store(spark, sf_dir) == full
    snap2 = sorted(
        (r["doc_id"], r["band"], r["band_sig"], r["bucket_n"])
        for r in spark.table(full).collect()
    )
    assert snap1 == snap2
    recount = defaultdict(int)
    for _d, b, s, _n in snap1:
        recount[(b, s)] += 1
    for _d, b, s, n in snap1:
        assert recount[(b, s)] == n
