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


def test_store_lifecycle_append_merge_tombstone(spark, tmp_path):
    """Daily-refresh lifecycle end-to-end (the SCALE.md maintenance
    contract): init on day-0 corpus → append day-1 batch (bucketed
    append + ONE count merge, no recount) → probe day-2 batch honoring
    tombstones. Includes a 20-member dup cluster split 10/10 across
    day-0/day-1 so the bucket CROSSES the cap at the merge (10 ≤ 16
    before, 20 > 16 after) — the transition fused per-row counts
    cannot represent."""
    import uuid

    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.operators.dedup import (
        store_counts,
        store_lifecycle_append,
        store_lifecycle_init,
        store_lifecycle_probe,
        store_tombstones,
    )

    def doc(i, text):
        return (i, text)

    hot = "alpha beta gamma delta epsilon zeta eta theta"
    small = "iota kappa lmbda mu nu xi omicron pi"
    rows = []
    # 20-member exact-dup cluster: ids 0..9 day-0, 10..19 day-1
    rows += [doc(i, hot) for i in range(20)]
    # 3-member small cluster: 2 in day-0, 1 probed on day-2
    rows += [doc(100, small), doc(101, small)]
    # unique docs everywhere
    rows += [doc(200 + i, f"unique tokens document number {i} " + "x" * i)
             for i in range(6)]
    day0 = [r for r in rows if r[0] < 10 or r[0] in (100, 101, 200, 201)]
    day1 = [r for r in rows if 10 <= r[0] < 20 or r[0] in (202, 203)]
    day2 = [doc(300, hot), doc(301, small), doc(302, "never seen words")]

    def df(rs):
        return spark.createDataFrame(rs, "doc_id long, text string")

    db = f"lifecycle_{uuid.uuid4().hex[:8]}"
    rows_t, counts_p, tomb_p = store_lifecycle_init(
        spark, df(day0), db, str(tmp_path / "store")
    )
    # day-0: hot bucket has 10 members — under the cap, NOT tombstoned
    assert store_tombstones(spark, tomb_p).count() == 0
    pre = {
        r["doc_id"]: (r["n_store_matches"], r["min_store_doc"])
        for r in store_lifecycle_probe(spark, rows_t, tomb_p, df(day2))
        .collect()
    }
    assert pre[300] == (10, 0)  # hot cluster visible before overflow
    assert pre[301] == (2, 100)
    assert pre[302] == (0, -1)

    store_lifecycle_append(spark, rows_t, counts_p, tomb_p, df(day1))

    # counts merged == recount from the appended rows relation
    merged = {
        (r["band"], r["band_sig"]): r["n"]
        for r in store_counts(spark, counts_p).collect()
    }
    recount = {
        (r["band"], r["band_sig"]): r["cnt"]
        for r in spark.table(rows_t)
        .groupBy("band", "band_sig")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert merged == recount
    # the hot cluster's buckets (one per band) crossed the cap
    tombs = store_tombstones(spark, tomb_p).count()
    assert tombs >= 1
    assert all(merged[k] == 20 for k in {
        (r["band"], r["band_sig"])
        for r in store_tombstones(spark, tomb_p).collect()
    })

    post = {
        r["doc_id"]: (r["n_store_matches"], r["min_store_doc"])
        for r in store_lifecycle_probe(spark, rows_t, tomb_p, df(day2))
        .collect()
    }
    # overflowed cluster now excluded (group-dedup's job, not the pair
    # join's); small cluster unaffected; clean doc still clean
    assert post[300] == (0, -1)
    assert post[301] == (2, 100)
    assert post[302] == (0, -1)

    # appended layout is still bucketed: the probe's store side reads
    # in place (no Exchange between the scan and the join)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            store_lifecycle_probe(spark, rows_t, tomb_p, df(day2))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


_STORE_WRITER_SNIPPET = """
import sys
sys.path.insert(0, sys.argv[3])
from braintumor_data_pipeline_spark.session import get_spark
from braintumor_data_pipeline_spark.operators.dedup import (
    ensure_minhash_band_store,
)
spark = get_spark(app_name="store-race-" + sys.argv[1],
                  master="local[2]", shuffle_partitions=4)
print("TABLE=" + ensure_minhash_band_store(spark, sys.argv[2]), flush=True)
spark.stop()
"""


def test_store_build_two_process_cold_race(spark, sf_dir, tmp_path):
    """Two fresh processes building the band store from scratch
    concurrently (the same stage/rename/adopt protocol as the bucketed
    warehouse): both must succeed, the surviving layout is complete,
    and no stage dirs leak."""
    import glob
    import re
    import shutil
    import subprocess
    import sys as _sys
    import tempfile
    import uuid

    # private sf dir → private store path, never touching the shared one
    d = tmp_path / f"store_race_{uuid.uuid4().hex[:8]}"
    d.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        str(d / "documents.parquet"),
    )
    sf = str(d)

    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", _STORE_WRITER_SNIPPET, f"r{i}", sf,
             os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        assert "TABLE=" in out

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf.rstrip("/").rsplit("/", 1)[-1])
    base = os.path.join(
        tempfile.gettempdir(), "braintumor_minhash_store", tag
    )
    path = os.path.join(base, "band_store")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not glob.glob(f"{path}.tmp*"), "stage dirs leaked"
    got = spark.read.parquet(path)
    t = pq.read_table(os.path.join(sf, "documents.parquet"))
    n_store_docs = sum(
        1 for i in t.column("doc_id").to_pylist()
        if i % STORE_BATCH_MOD != 0
    )
    # one row per (store doc × band)
    assert got.count() == n_store_docs * (MINHASH_K // BAND_ROWS)
    shutil.rmtree(base, ignore_errors=True)


def test_store_fingerprint_rejects_stale_and_partial_layouts(
    spark, sf_dir, tmp_path
):
    """ADVICE r9: validity is the source FINGERPRINT, not bare _SUCCESS.
    (a) a partial dir at the publish path (crashed build) must not block
    publication; (b) a regenerated documents.parquet at the same path
    must trigger a rebuild — the old layout goes ASIDE, never adopted;
    (c) day-old .stale-* siblings are reaped on the next publish."""
    import shutil
    import tempfile
    import time
    import uuid

    from braintumor_data_pipeline_spark.operators.dedup import (
        _STORE_LAYOUT_VERSION,
        _STORE_MARKER,
        _store_marker_content,
        _store_marker_valid,
        _documents_fingerprint,
    )

    leaf = f"fpstore_{uuid.uuid4().hex[:8]}"
    d = tmp_path / leaf
    d.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        str(d / "documents.parquet"),
    )
    sf = str(d)
    base = os.path.join(
        tempfile.gettempdir(), "braintumor_minhash_store", leaf
    )
    path = os.path.join(base, "band_store")

    # (a) pre-plant a partial layout (no marker) at the publish path
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass  # _SUCCESS alone used to mean "done" — it must no longer
    full = ensure_minhash_band_store(spark, sf)
    fp1 = _documents_fingerprint(sf)
    assert _store_marker_valid(
        path, _store_marker_content(fp1, _STORE_LAYOUT_VERSION)
    )
    n1 = spark.table(full).count()
    assert n1 > 0
    stale_now = [s for s in os.listdir(base) if s.startswith("band_store.stale-")]
    assert stale_now, "partial layout should have been renamed aside"

    # (c) age the aside dirs past the reap horizon
    for s in stale_now:
        old = time.time() - 2 * 86400
        os.utime(os.path.join(base, s), (old, old))

    # (b) regenerate the fixture: HALVE the documents
    t = pq.read_table(str(d / "documents.parquet"))
    pq.write_table(t.slice(0, t.num_rows // 2), str(d / "documents.parquet"))
    fp2 = _documents_fingerprint(sf)
    assert fp2 != fp1
    full2 = ensure_minhash_band_store(spark, sf)
    assert _store_marker_valid(
        path, _store_marker_content(fp2, _STORE_LAYOUT_VERSION)
    )
    n2 = spark.table(full2).count()
    assert 0 < n2 < n1  # rebuilt from the smaller fixture, not adopted
    # aged asides reaped; the layout just displaced is fresh and kept
    left = [s for s in os.listdir(base) if s.startswith("band_store.stale-")]
    assert not (set(stale_now) & set(left)), "day-old stale dirs not reaped"
    shutil.rmtree(base, ignore_errors=True)


def test_versioned_publish_pointer_flip_keeps_previous(spark, tmp_path):
    """ADVICE r9: the counts swap must never expose an absent relation.
    The publish is write-new-version + atomic pointer replace; after a
    flip the PREVIOUS version dir still exists (a reader mid-scan keeps
    its files), and versions older than previous are pruned."""
    from braintumor_data_pipeline_spark.operators.dedup import (
        _VERSION_PTR,
        _versioned_current,
        _versioned_publish,
    )

    root = str(tmp_path / "counts")
    def df(n):
        return spark.createDataFrame(
            [(1, "a", n)], "band int, band_sig string, n long"
        )

    v1 = _versioned_publish(df(1), root)
    assert _versioned_current(root) == v1
    v2 = _versioned_publish(df(2), root)
    assert _versioned_current(root) == v2
    assert os.path.isdir(v1), "previous version must survive one flip"
    v3 = _versioned_publish(df(3), root)
    assert _versioned_current(root) == v3
    assert os.path.isdir(v2) and os.path.isdir(v1)  # two-predecessor slack
    v4 = _versioned_publish(df(4), root)
    assert _versioned_current(root) == v4
    # current + previous + one slack survive; older pruned
    assert os.path.isdir(v3) and os.path.isdir(v2) and not os.path.isdir(v1)
    assert spark.read.parquet(_versioned_current(root)).collect()[0]["n"] == 4
    # pointer file is the only non-version entry (no leaked .ptr tmp)
    extras = [
        e for e in os.listdir(root)
        if not e.startswith("v-") and e != _VERSION_PTR
    ]
    assert not extras


def test_store_lifecycle_query_matches_pure_python_replay(spark, sf_dir):
    """Registered lifecycle query vs an independent pure-Python replay
    of the two-epoch semantics: final store = everything outside the
    probe batch; tombstones = merged bucket count > cap; probe excludes
    tombstoned buckets wholesale and counts the batch doc's own bands
    that hit them."""
    from braintumor_data_pipeline_spark.operators.dedup import (
        minhash_store_lifecycle_dedup,
    )

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    docs = list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    buckets = defaultdict(list)
    for doc_id, text in docs:
        if doc_id % STORE_BATCH_MOD != 0:
            for key in _py_bands(text):
                buckets[key].append(doc_id)
    tomb = {k for k, members in buckets.items() if len(members) > LSH_BUCKET_CAP}
    expect = {}
    for doc_id, text in docs:
        if doc_id % STORE_BATCH_MOD == 0:
            matches, n_tomb = set(), 0
            for key in _py_bands(text):
                if key in tomb:
                    n_tomb += 1
                else:
                    matches.update(buckets.get(key, []))
            expect[doc_id] = (
                len(matches),
                min(matches) if matches else -1,
                n_tomb,
                1 if matches else 0,
            )

    rows = minhash_store_lifecycle_dedup(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (
            r["n_store_matches"],
            r["min_store_doc"],
            r["n_tomb_bands"],
            r["is_near_dup"],
        )
        for r in rows
    }
    assert got == expect
    assert len(rows) == len(expect) > 0


def test_versioned_publish_concurrent_reader_never_sees_absent_relation(
    spark, tmp_path
):
    """The ADVICE hazard, exercised: a reader hammering the counts
    relation WHILE the maintainer flips versions must always resolve a
    complete relation — never ENOENT, never a half-written dir. (The old
    rmtree-then-rename swap fails this within a few flips.)"""
    import threading

    from braintumor_data_pipeline_spark.operators.dedup import (
        _versioned_current,
        _versioned_publish,
    )

    root = str(tmp_path / "counts")
    _versioned_publish(
        spark.createDataFrame([(0, "x", 0)], "band int, band_sig string, n long"),
        root,
    )

    stop = threading.Event()
    errors: list[BaseException] = []
    seen: list[int] = []

    def reader():
        while not stop.is_set():
            try:
                # resolve + read the full relation, as a probe would
                rows = spark.read.parquet(_versioned_current(root)).collect()
                assert len(rows) == 1
                seen.append(rows[0]["n"])
            except BaseException as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for i in range(1, 13):
            _versioned_publish(
                spark.createDataFrame(
                    [(0, "x", i)], "band int, band_sig string, n long"
                ),
                root,
            )
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)
    assert not errors, f"reader observed a broken relation: {errors[:1]}"
    assert seen, "readers never completed a read"
    # every observed value is a version that actually existed (0..12),
    # and reads are monotone-consistent per the pointer (old or new,
    # never garbage)
    assert set(seen) <= set(range(13))


def test_store_lifecycle_compact_one_file_per_bucket(spark, tmp_path):
    """Compaction closes the append loop: after several bucketed
    appends the rows relation fragments (files/bucket grows); compact
    rewrites it to EXACTLY one file per bucket, rows bit-identical,
    probe results unchanged, and the probe's store side still reads in
    place (bucketed, no Exchange)."""
    import uuid

    from braintumor_data_pipeline_spark.operators.dedup import (
        store_layout_stats,
        store_lifecycle_append,
        store_lifecycle_compact,
        store_lifecycle_init,
        store_lifecycle_probe,
    )

    def df(rs):
        return spark.createDataFrame(rs, "doc_id long, text string")

    day0 = [(i, f"base document tokens {i} " + "pad " * (i % 5))
            for i in range(40)]
    days = [
        [(100 * d + i, f"day {d} document {i} fresh tokens")
         for i in range(10)]
        for d in range(1, 4)
    ]
    # one small dup cluster across epochs so the probe has matches
    shared = "alpha beta gamma delta epsilon zeta"
    day0 += [(900, shared)]
    days[0] += [(901, shared)]
    probe_batch = [(950, shared), (951, "never seen anywhere")]

    db = f"compact_{uuid.uuid4().hex[:8]}"
    rows_t, counts_p, tomb_p = store_lifecycle_init(
        spark, df(day0), db, str(tmp_path / "store")
    )
    for d in days:
        store_lifecycle_append(spark, rows_t, counts_p, tomb_p, df(d))

    before_stats = store_layout_stats(spark, rows_t)
    assert before_stats["files_per_bucket"] > 1
    before_rows = sorted(
        (r["doc_id"], r["band"], r["band_sig"])
        for r in spark.table(rows_t).collect()
    )
    before_probe = sorted(
        (r["doc_id"], r["n_store_matches"], r["min_store_doc"])
        for r in store_lifecycle_probe(
            spark, rows_t, tomb_p, df(probe_batch)
        ).collect()
    )
    assert (950, 2, 900) in before_probe  # both cluster members found
    assert (951, 0, -1) in before_probe

    store_lifecycle_compact(spark, rows_t)

    after_stats = store_layout_stats(spark, rows_t)
    assert after_stats["n_files"] == after_stats["n_buckets"]
    after_rows = sorted(
        (r["doc_id"], r["band"], r["band_sig"])
        for r in spark.table(rows_t).collect()
    )
    assert after_rows == before_rows  # bit-identical relation
    after_probe = sorted(
        (r["doc_id"], r["n_store_matches"], r["min_store_doc"])
        for r in store_lifecycle_probe(
            spark, rows_t, tomb_p, df(probe_batch)
        ).collect()
    )
    assert after_probe == before_probe

    # compacted layout still exposes its bucketing to the planner
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            store_lifecycle_probe(spark, rows_t, tomb_p, df(probe_batch))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_store_lifecycle_compact_adopts_stale_sibling_after_crash(
    spark, tmp_path
):
    """ADVICE r11: the compact swap is two renames — a maintainer
    SIGKILLed between live→aside and stage→live leaves NO live dir.
    The next maintainer call must ADOPT the newest .stale-* sibling
    (the complete pre-swap rows) instead of failing on a missing
    path, and then compact normally — rows preserved."""
    import os
    import uuid

    from braintumor_data_pipeline_spark.operators.dedup import (
        _table_location,
        store_layout_stats,
        store_lifecycle_append,
        store_lifecycle_compact,
        store_lifecycle_init,
    )

    def df(rs):
        return spark.createDataFrame(rs, "doc_id long, text string")

    day0 = [(i, f"crashy base doc {i} " + "pad " * (i % 4))
            for i in range(30)]
    day1 = [(100 + i, f"crashy day1 doc {i} tokens") for i in range(8)]

    db = f"crashadopt_{uuid.uuid4().hex[:8]}"
    rows_t, counts_p, tomb_p = store_lifecycle_init(
        spark, df(day0), db, str(tmp_path / "store")
    )
    store_lifecycle_append(spark, rows_t, counts_p, tomb_p, df(day1))
    before_rows = sorted(
        (r["doc_id"], r["band"], r["band_sig"])
        for r in spark.table(rows_t).collect()
    )

    # simulate the crash window: live dir moved aside, stage never
    # renamed in (a decoy OLDER sibling must not win the adoption)
    loc = _table_location(spark, rows_t)
    old_decoy = f"{loc}.stale-00000000-decoy"
    os.makedirs(old_decoy)
    os.utime(old_decoy, (1, 1))
    os.rename(loc, f"{loc}.stale-{uuid.uuid4().hex[:8]}")
    assert not os.path.isdir(loc)

    store_lifecycle_compact(spark, rows_t)

    after = store_layout_stats(spark, rows_t)
    assert 0 < after["n_files"] <= after["n_buckets"]
    after_rows = sorted(
        (r["doc_id"], r["band"], r["band_sig"])
        for r in spark.table(rows_t).collect()
    )
    assert after_rows == before_rows


def test_store_probe_shapes_agree_build_once_vs_lifecycle(spark, sf_dir):
    """The registered probe (fused layout-time bucket_n, row predicate
    bucket_n <= CAP) and the lifecycle probe (tombstone anti-join,
    tombstone = count > CAP) implement the SAME exclusion semantics —
    on identical store/batch splits they must agree doc-for-doc."""
    import uuid

    from braintumor_data_pipeline_spark.operators.dedup import (
        store_lifecycle_init,
        store_lifecycle_probe,
    )
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from pyspark.sql import functions as F

    store_docs = docs.filter(F.col("doc_id") % STORE_BATCH_MOD != 0)
    batch_docs = docs.filter(F.col("doc_id") % STORE_BATCH_MOD == 0)

    db = f"shapes_{uuid.uuid4().hex[:8]}"
    rows_t, _counts, tomb_p = store_lifecycle_init(
        spark, store_docs, db, f"/tmp/braintumor_shapes_{uuid.uuid4().hex[:8]}"
    )
    lifecycle = {
        r["doc_id"]: (r["n_store_matches"], r["min_store_doc"])
        for r in store_lifecycle_probe(
            spark, rows_t, tomb_p, batch_docs
        ).collect()
    }
    registered = {
        r["doc_id"]: (r["n_store_matches"], r["min_store_doc"])
        for r in minhash_store_probe_dedup(spark, sf_dir).collect()
    }
    assert lifecycle == registered
    assert len(lifecycle) > 0


_TWO_FP_WRITER = """
import sys
sys.path.insert(0, sys.argv[3])
from braintumor_data_pipeline_spark.session import get_spark
from braintumor_data_pipeline_spark.operators.dedup import (
    ensure_minhash_band_store,
    _documents_fingerprint,
)
spark = get_spark(app_name="fp-race-" + sys.argv[1],
                  master="local[2]", shuffle_partitions=4)
full = ensure_minhash_band_store(spark, sys.argv[2])
n = spark.table(full).select("doc_id").distinct().count()
print(f"RESULT={n}", flush=True)
spark.stop()
"""


def test_store_foreign_fingerprint_never_adopted_across_processes(
    spark, sf_dir, tmp_path
):
    """The ADVICE foreign-sf_dir scenario, process-isolated and
    deterministic: two fixtures share a leaf name (same store path and
    table name). Alternating fresh processes build for one fixture,
    then the other, then the first again — each MUST return a store
    consistent with its OWN fixture (distinct doc counts prove no
    silent adoption of the other's layout), displacing the foreign
    layout aside each time. (The concurrent same-fingerprint race is
    covered by test_store_build_two_process_cold_race.)"""
    import glob
    import re
    import shutil
    import subprocess
    import sys as _sys
    import tempfile
    import uuid

    from braintumor_data_pipeline_spark.operators.dedup import (
        _STORE_LAYOUT_VERSION,
        _STORE_MARKER,
        _store_marker_content,
        _documents_fingerprint,
    )

    leaf = f"fprace_{uuid.uuid4().hex[:8]}"
    d1 = tmp_path / "a" / leaf
    d2 = tmp_path / "b" / leaf
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        str(d1 / "documents.parquet"),
    )
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    pq.write_table(t.slice(0, t.num_rows // 2), str(d2 / "documents.parquet"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(sf):
        out = subprocess.run(
            [_sys.executable, "-c", _TWO_FP_WRITER, "seq", sf, repo],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        m = re.search(r"RESULT=(\d+)", out.stdout)
        assert m, out.stdout
        return int(m.group(1))

    n_full = sum(
        1
        for i in pq.read_table(str(d1 / "documents.parquet"))
        .column("doc_id").to_pylist()
        if i % STORE_BATCH_MOD != 0
    )
    n_half = sum(
        1
        for i in pq.read_table(str(d2 / "documents.parquet"))
        .column("doc_id").to_pylist()
        if i % STORE_BATCH_MOD != 0
    )
    assert n_full != n_half

    assert run(str(d1)) == n_full   # cold build
    assert run(str(d2)) == n_half   # foreign layout present -> rebuild
    assert run(str(d1)) == n_full   # and back -> rebuild again

    base = os.path.join(
        tempfile.gettempdir(), "braintumor_minhash_store", leaf
    )
    path = os.path.join(base, "band_store")
    with open(os.path.join(path, _STORE_MARKER)) as f:
        assert f.read().strip() == _store_marker_content(
            _documents_fingerprint(str(d1)), _STORE_LAYOUT_VERSION
        )
    assert not glob.glob(f"{path}.tmp*"), "stage dirs leaked"
    # each displacement renamed the loser aside (fresh -> not reaped)
    asides = [
        x for x in os.listdir(base) if x.startswith("band_store.stale-")
    ]
    assert len(asides) == 2
    shutil.rmtree(base, ignore_errors=True)
