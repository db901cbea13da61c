"""Empirical scaling probe: how do the headline aggregates scale as the
fact table grows N×?

The 100 TB argument in SCALE.md is structural (shuffle shapes, partial
aggregation, broadcast joins); this probe adds measurement. It
replicates the sf0.1 lineitem N× (union of N shifted copies — key
ranges offset so join/group cardinalities scale with the data, the way
a bigger SF would), writes it to a temp parquet, and times a
scan-heavy aggregate (pricing_summary shape) and a shuffle-heavy
group-by at each N. Near-linear wall-clock growth with flat per-row
cost is the local-mode signature of a plan whose cost is dominated by
the scan + map-side combine — the shape that scales out on a cluster.

Usage: python tools/scaling_probe.py [sf_dir] [factors...]
Writes one JSON line per factor; temp data is removed afterwards.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from braintumor_data_pipeline_spark.session import get_spark
from braintumor_data_pipeline_spark.sources.fixtures import load_table
from braintumor_data_pipeline_spark.functions.money import dec_col


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="scaling-probe")
    base = load_table(spark, sf_dir, "lineitem")
    n_base = base.count()
    tmp = tempfile.mkdtemp(prefix="scaling_probe_")
    try:
        for n in factors:
            path = os.path.join(tmp, f"x{n}")
            copies = [
                base.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)
                )
                for i in range(n)
            ]
            df = copies[0]
            for c in copies[1:]:
                df = df.unionAll(c)
            df.write.mode("overwrite").parquet(path)
            li = spark.read.parquet(path)

            t0 = time.time()
            li.filter(F.col("l_shipdate") <= "1998-09-02").groupBy(
                "l_returnflag", "l_linestatus"
            ).agg(
                F.sum(dec_col("l_quantity")).alias("sq"),
                F.sum(dec_col("l_extendedprice")).alias("sp"),
                F.count("*").alias("c"),
            ).collect()
            t_scan = time.time() - t0

            t0 = time.time()
            li.groupBy("l_orderkey").agg(
                F.count("*").alias("c"), F.max("l_extendedprice").alias("m")
            ).agg(F.count("*"), F.sum("c")).collect()
            t_shuffle = time.time() - t0

            rows = n_base * n
            print(
                json.dumps(
                    {
                        "factor": n,
                        "rows": rows,
                        "scan_agg_s": round(t_scan, 3),
                        "shuffle_agg_s": round(t_shuffle, 3),
                        "scan_ns_per_row": round(t_scan / rows * 1e9, 1),
                        "shuffle_ns_per_row": round(t_shuffle / rows * 1e9, 1),
                    }
                )
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


# ---------------------------------------------------------------------------
# Headline-shape probe (VERDICT r3 task 3): the 5 heaviest headline
# PLAN SHAPES, generator-fed (zero I/O — sources/generator.py style LCG
# columns over spark.range) at 1×/10×/50× the sf0.1 row counts. Each
# builder mirrors its registered query's physical structure (same
# operator chain, same broadcast/shuffle skeleton); wall-time curves go
# to SCALE.md. Near-linear growth = the plan's cost is scan + map-side
# combine, the shape that scales out.
#
# Usage: python tools/scaling_probe.py headline [factors...]
# ---------------------------------------------------------------------------

_MIX_A = 2_654_435_761
_MIX_C = 1_013_904_223
_MIX_M = 2_147_483_648


def _mix(col, salt: int):
    return (col * _MIX_A + _MIX_C + salt) % _MIX_M


def _star_join_shape(spark, s: int):
    """star_join_revenue: fact scan → 2 broadcast dim joins → 1-shuffle
    group agg (600k·s fact rows, fixed-size broadcastable dims)."""
    n = 600_000 * s
    fact = spark.range(n).select(
        F.col("id").alias("orderkey"),
        (_mix(F.col("id"), 1) % 25).alias("nation_id"),
        (_mix(F.col("id"), 2) % 1000).alias("supp_id"),
        (100 + _mix(F.col("id"), 3) % 99900).alias("price_cents"),
    )
    nation = spark.range(25).select(
        F.col("id").alias("nation_id"),
        (F.col("id") % 5).alias("region_id"),
    )
    supp = spark.range(1000).select(
        F.col("id").alias("supp_id"),
        (_mix(F.col("id"), 9) % 7).alias("supp_class"),
    )
    return (
        fact.join(F.broadcast(nation), "nation_id")
        .join(F.broadcast(supp), "supp_id")
        .groupBy("region_id", "supp_class")
        .agg(F.count("*").alias("n"), F.sum("price_cents").alias("cents"))
    )


def _minhash_groups_shape(spark, s: int):
    """minhash_dedup_groups: token explode → k-affine min-agg per doc →
    signature hash → group-by-signature (5k·s docs × 50 tokens; ~25%
    duplicate docs so groups actually form)."""
    from braintumor_data_pipeline_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_K,
    )

    docs = 5_000 * s
    tok_per_doc = 50
    distinct = (docs * 3) // 4
    t = spark.range(docs * tok_per_doc).select(
        (F.col("id") / tok_per_doc).cast("long").alias("doc_id"),
        (F.col("id") % tok_per_doc).alias("pos"),
    )
    # duplicate docs: token stream depends on doc_id % distinct
    h0 = _mix((F.col("doc_id") % distinct) * tok_per_doc + F.col("pos"), 77)
    hs = F.array(
        *[
            (F.lit(MINHASH_A[i]) * h0 + F.lit(MINHASH_B[i])) % F.lit(1 << 32)
            for i in range(MINHASH_K)
        ]
    )
    wide = (
        t.select("doc_id", hs.alias("hs"))
        .groupBy("doc_id")
        .agg(*[F.min(F.col("hs")[i]).alias(f"m{i}") for i in range(MINHASH_K)])
    )
    sig = F.md5(
        F.concat_ws(",", *[F.col(f"m{i}").cast("string") for i in range(MINHASH_K)])
    )
    return (
        wide.select("doc_id", sig.alias("sig_hash"))
        .groupBy("sig_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_members"))
    )


def _ngram_pairs_shape(spark, s: int):
    """ngram_jaccard_pairs: shingle inverted index → candidate self-join
    → pair intersection counts → Jaccard filter (5k·s docs × 40
    shingles; bounded dup-cluster size keeps pairs linear-ish, as the
    registered query's banding does)."""
    docs = 5_000 * s
    sh_per_doc = 40
    distinct = (docs * 9) // 10
    t = spark.range(docs * sh_per_doc).select(
        (F.col("id") / sh_per_doc).cast("long").alias("doc_id"),
        _mix(
            (F.col("id") % (sh_per_doc * distinct)), 123
        ).alias("shingle"),
    )
    sh = t.distinct().persist()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    out = (
        inter.join(ca, F.col("da") == F.col("ca.doc_id"))
        .join(cb, F.col("db") == F.col("cb.doc_id"))
        .select(
            "da",
            "db",
            (
                F.col("n_common")
                / (F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )
    return out


def _region_grow_shape(spark, s: int):
    """region_grow_component: pixel grids → per-image applyInPandas
    numpy BFS (146·s images of 1024 px, same UDF as the registered
    query)."""
    from braintumor_data_pipeline_spark.operators.segmentation import (
        _bfs_apply,
    )

    images = 146 * s
    px = spark.range(images * 1024).select(
        (F.col("id") / 1024).cast("int").alias("image_id"),
        ((F.col("id") % 1024) / 32).cast("int").alias("y"),
        (F.col("id") % 32).cast("int").alias("x"),
        (_mix(F.col("id"), 31) % 256).cast("int").alias("v"),
    )
    return px.groupBy("image_id").applyInPandas(
        _bfs_apply, schema="image_id int, y int, x int"
    )


def _session_windows_shape(spark, s: int):
    """events_session_30m: session_window group-agg (100k·s events over
    2k·s users across 30 days)."""
    n = 100_000 * s
    users = 2_000 * s
    ev = spark.range(n).select(
        (_mix(F.col("id"), 5) % users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_704_067_200) + _mix(F.col("id"), 6) % (30 * 86_400)
        ).alias("ts"),
        (_mix(F.col("id"), 8) % 10_000).alias("cents"),
    )
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("cents"))
        .select("user_id", F.col("w.start").alias("start"), "n_events", "cents")
    )


def _repeated_spans_shape(spark, s: int):
    """repeated_span_detection: window-hash grain → ≥2-docs screen →
    semi-join back → per-doc island merge (5k·s docs × 60 token
    windows; ~20% of window hashes shared across docs so spans form).
    Mirrors the registered query's plan: one content-keyed groupBy
    (never pair enumeration) + doc-partitioned windows."""
    from pyspark.sql import Window as W

    docs = 5_000 * s
    win_per_doc = 60
    shared = (docs * win_per_doc) // 5
    t = spark.range(docs * win_per_doc).select(
        (F.col("id") / win_per_doc).cast("long").alias("doc_id"),
        (F.col("id") % win_per_doc).alias("start_pos"),
        ((F.col("id") % win_per_doc) + 7).alias("end_pos"),
        _mix(F.col("id") % shared, 211).alias("h"),
    )
    t = t.persist()
    rep = (
        t.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = t.join(rep, "h", "left_semi")
    w_prev = (
        W.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = hits.withColumn(
        "is_new",
        F.when(
            F.col("start_pos")
            > F.coalesce(F.max("end_pos").over(w_prev), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    ).withColumn("island_id", F.sum("is_new").over(w_run))
    return (
        islands.groupBy("doc_id", "island_id")
        .agg((F.max("end_pos") - F.min("start_pos") + 1).alias("span_len"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"), F.sum("span_len").alias("rep_toks"))
    )


def _clustered_corpus(spark, s: int):
    """Duplicate-heavy skew corpus (VERDICT r4 task 5): 5k·s docs where
    25% sit in 8 LARGE exact-dup clusters (each cluster ~156·s docs —
    identical token streams, hence identical minhash signatures and
    identical band signatures in EVERY band: the hottest possible LSH
    keys), 12.5% sit in SMALL 4-doc dup clusters (r8: the tier whose
    pairs SURVIVE the band-frequency cap — their count grows linearly
    with the corpus, exercising the capped enumeration path with
    non-degenerate output), the rest unique. This is the shape real
    crawl data has and the uniform-dup probes above do not: hot
    shingles and a band-sig key whose bucket grows linearly with
    corpus size, plus a long tail of legitimate near-dup groups."""
    docs = 5_000 * s
    tok_per_doc = 50
    n_clustered = docs // 4
    n_small_end = n_clustered + docs // 8
    t = spark.range(docs * tok_per_doc).select(
        (F.col("id") / tok_per_doc).cast("long").alias("doc_id"),
        (F.col("id") % tok_per_doc).alias("pos"),
    )
    # content seed: docs < n_clustered collapse to 8 identical streams;
    # the next docs//8 collapse in groups of 4 (seed offset by `docs` so
    # small-cluster seeds never collide with unique docs' doc_id seeds)
    seed = (
        F.when(F.col("doc_id") < n_clustered, F.col("doc_id") % 8)
        .when(
            F.col("doc_id") < n_small_end,
            F.lit(docs) + (F.col("doc_id") / 4).cast("long"),
        )
        .otherwise(F.col("doc_id"))
    )
    return t.select(
        "doc_id", _mix(seed * tok_per_doc + F.col("pos"), 77).alias("h0")
    )


def main_dedup_skew() -> int:
    """Stress the dedup path on the clustered-duplicate corpus. Three
    measurements per factor, mirroring the registered queries' plans:

    1. GROUP path (minhash_dedup_groups shape): full-signature groupBy —
       the production dedup path; must stay linear (min-aggregable
       partials, hot signature handled by map-side combine).
    2. Candidate VOLUME by bucket-count math (SCALE.md "blocking
       evaluated by counting"): sum m(m-1)/2 over (band, band_sig)
       buckets — an aggregation, never enumeration. Reports how many
       pairs naive enumeration WOULD emit (quadratic in cluster size)
       without paying for them.
    3. STAR-REDUCED edge build + one propagation join (the
       dedup_connected_components plan): output sum m per bucket, so
       hot buckets cost linear rows; partial-aggregable hub min/count
       means the hot (band, band_sig) key never serializes a partition.

    Usage: python tools/scaling_probe.py dedup-skew [factors...]
    """
    from braintumor_data_pipeline_spark.operators.dedup import (
        BAND_ROWS,
        LSH_BUCKET_CAP as _LSH_CAP,
        MINHASH_A,
        MINHASH_B,
        MINHASH_K,
    )

    factors = [int(x) for x in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="dedup-skew-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    def sigs_df(s: int):
        tok = _clustered_corpus(spark, s)
        hs = F.array(
            *[
                (F.lit(MINHASH_A[i]) * F.col("h0") + F.lit(MINHASH_B[i]))
                % F.lit(1 << 32)
                for i in range(MINHASH_K)
            ]
        )
        return (
            tok.select("doc_id", hs.alias("hs"))
            .groupBy("doc_id")
            .agg(
                *[
                    F.min(F.col("hs")[i]).alias(f"m{i}")
                    for i in range(MINHASH_K)
                ]
            )
        )

    n_bands = MINHASH_K // BAND_ROWS

    def bands_of(sigs):
        cols = []
        for b in range(n_bands):
            cols.append(
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"m{i}").cast("string")
                                for i in range(
                                    b * BAND_ROWS, (b + 1) * BAND_ROWS
                                )
                            ],
                        )
                    ).alias("band_sig"),
                )
            )
        return sigs.select(
            "doc_id", F.explode(F.array(*cols)).alias("bs")
        ).select("doc_id", "bs.band", "bs.band_sig")

    # untimed warmup of all three sub-plans
    w = sigs_df(1).persist()
    w.count()
    bands_of(w).groupBy("band", "band_sig").count().count()
    w.unpersist()

    for s in factors:
        sigs = sigs_df(s).persist()

        # 1. group path
        t0 = time.time()
        sig_hash = F.md5(
            F.concat_ws(
                ",", *[F.col(f"m{i}").cast("string") for i in range(MINHASH_K)]
            )
        )
        groups = (
            sigs.select("doc_id", sig_hash.alias("sig"))
            .groupBy("sig")
            .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n"))
        )
        n_groups = groups.count()
        t_group = time.time() - t0

        bands = bands_of(sigs).persist()
        # 2. candidate volume by counting (one aggregation, no pairs)
        t0 = time.time()
        vol = (
            bands.groupBy("band", "band_sig")
            .agg(F.count("*").alias("m"))
            .agg(
                F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("naive_pairs"),
                F.max("m").alias("hot_bucket"),
            )
            .collect()[0]
        )
        t_count = time.time() - t0

        # 3. star-reduced edges + one propagation join (the CC plan)
        t0 = time.time()
        hubs = bands.groupBy("band", "band_sig").agg(
            F.min("doc_id").alias("hub"), F.count("*").alias("m")
        )
        star = (
            bands.join(hubs.filter(F.col("m") > 1), ["band", "band_sig"])
            .filter(F.col("doc_id") != F.col("hub"))
            .select("hub", "doc_id")
            .distinct()
        )
        n_edges = star.count()
        t_star = time.time() - t0

        # 4. band-frequency-capped pair enumeration (the
        #    minhash_lsh_pairs_capped plan): oversized buckets dropped
        #    by COUNT before any member list exists; surviving buckets
        #    expand i<j combos in-array (bounded by the cap). Pairs must
        #    stay ∝ N·CAP while naive_candidate_pairs blows up.
        t0 = time.time()
        small = (
            bands.groupBy("band", "band_sig")
            .agg(F.count("*").alias("bucket_n"))
            .filter(
                (F.col("bucket_n") >= 2)
                & (F.col("bucket_n") <= _LSH_CAP)
            )
            .select("band", "band_sig")
        )
        capped = (
            bands.join(small, ["band", "band_sig"])
            .groupBy("band", "band_sig")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) ->"
                        " transform(slice(ids, i + 2, size(ids)),"
                        " y -> struct(x AS doc_a, y AS doc_b))))"
                    )
                ).alias("p")
            )
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
        n_capped = capped.count()
        t_capped = time.time() - t0

        bands.unpersist()
        sigs.unpersist()
        print(
            json.dumps(
                {
                    "shape": "clustered_dup_dedup",
                    "factor": s,
                    "docs": 5_000 * s,
                    "clustered_docs": (5_000 * s) // 4,
                    "n_groups": n_groups,
                    "group_path_s": round(t_group, 3),
                    "naive_candidate_pairs": int(vol["naive_pairs"]),
                    "hot_bucket_m": int(vol["hot_bucket"]),
                    "count_math_s": round(t_count, 3),
                    "star_edges": n_edges,
                    "star_path_s": round(t_star, 3),
                    "capped_pairs": n_capped,
                    "capped_pairs_per_doc": round(n_capped / (5_000 * s), 2),
                    "capped_path_s": round(t_capped, 3),
                }
            ),
            flush=True,
        )
    return 0


HEADLINE_SHAPES = {
    "star_join": _star_join_shape,
    "minhash_groups": _minhash_groups_shape,
    "ngram_pairs": _ngram_pairs_shape,
    "region_grow": _region_grow_shape,
    "session_windows": _session_windows_shape,
    "repeated_spans": _repeated_spans_shape,
}


def main_headline() -> int:
    factors = [int(x) for x in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="headline-scaling-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    for name, build in HEADLINE_SHAPES.items():
        # untimed per-shape warmup: the first execution of a shape pays
        # whole-stage-codegen compilation, which would otherwise be
        # billed entirely to the smallest factor and mask the curve
        build(spark, 1).write.format("noop").mode("overwrite").save()
        timings = {}
        rates = {}
        for s in factors:
            t0 = time.time()
            build(spark, s).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            timings[f"x{s}"] = round(dt, 3)
            rates[f"x{s}"] = round(dt / s, 3)  # per-unit-scale cost
        print(
            json.dumps(
                {
                    "shape": name,
                    "factors": factors,
                    "wall_s": timings,
                    "wall_per_scale_s": rates,
                }
            ),
            flush=True,
        )
    return 0


def main_verify_skew() -> int:
    """Time the dedup VERIFY stage itself — candidate pairs → bounded
    levenshtein — on the clustered-duplicate corpus (VERDICT r5 task
    8: the r5 sf0.1 sweep caught all clique pairs of one hot band key
    landing in ONE levenshtein task; the fix repartitions the pair
    relation on the uniform (doc_a, doc_b) key before the DP. This
    probe validates that fix beyond sf0.1 by growing the clusters).

    Corpus: 5k·s docs, 25% in 8 exact-dup-family clusters (size 156·s;
    members share a ~134-char text differing only in a 6-char tail, so
    every within-cluster pair passes the ≥0.8 gate and pays the real
    bounded-DP cost). Candidate pairs come from a self-join ON THE
    CLUSTER KEY — the band-join shape, so the pair relation leaves the
    join partitioned by 8 hot keys, exactly the straggler layout.

    Two timings per factor over the identical pair volume:
    - hot_layout_s: verify directly on the join output (≤8 non-empty
      partitions carry ALL pairs — the pre-fix serialization);
    - repart_s: verify after .repartition(defaultParallelism,
      doc_a, doc_b) (the registered lsh_pairs_edit_verified plan).
    Pass criteria: repart_s / pairs stays ~flat as clusters grow
    (stage linear in its input) and repart_s ≪ hot_layout_s at every
    factor (the exchange buys even spread).

    Usage: python tools/scaling_probe.py verify-skew [factors...]
    """
    factors = [int(x) for x in sys.argv[2:]] or [1, 2, 4]
    spark = get_spark(app_name="verify-skew-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    par = spark.sparkContext.defaultParallelism

    def corpus(s: int):
        docs = 5_000 * s
        n_clustered = docs // 4
        ckey = F.when(
            F.col("id") < n_clustered, F.col("id") % 8
        ).otherwise(F.col("id"))
        # ~134 chars: 4×md5(cluster) body + 6-char per-doc tail
        text = F.concat(
            F.repeat(F.md5(ckey.cast("string")), 4),
            F.substring(F.md5(F.col("id").cast("string")), 1, 6),
        )
        return spark.range(docs).select(
            F.col("id").alias("doc_id"),
            ckey.alias("ckey"),
            text.alias("text"),
        )

    def verify_time(pairs_df, texts):
        da = texts.select(
            F.col("doc_id").alias("ida"), F.col("text").alias("ta")
        )
        db = texts.select(
            F.col("doc_id").alias("idb"), F.col("text").alias("tb")
        )
        lev = F.expr(
            "levenshtein(ta, tb, cast(floor(0.2 * greatest(length(ta),"
            " length(tb), 1)) + 2 as int))"
        )
        mx = F.greatest(F.length("ta"), F.length("tb"), F.lit(1))
        t0 = time.time()
        n = (
            pairs_df.join(F.broadcast(da), pairs_df.doc_a == F.col("ida"))
            .join(F.broadcast(db), pairs_df.doc_b == F.col("idb"))
            .select(lev.alias("lev"), mx.alias("mx"))
            .filter(
                (F.col("lev") >= 0)
                & (F.lit(1.0) - F.col("lev") / F.col("mx") >= 0.8)
            )
            .count()
        )
        return n, time.time() - t0

    for s in factors:
        d = corpus(s).persist()
        d.count()
        texts = d.select("doc_id", "text")
        clustered = d.filter(F.col("ckey") < 8).select("doc_id", "ckey")
        a = clustered.select(F.col("doc_id").alias("doc_a"), "ckey")
        b = clustered.select(
            F.col("doc_id").alias("doc_b"), F.col("ckey").alias("ckey_b")
        )
        # band-join shape: shuffle both sides on the 8-value hot key
        pairs = (
            a.hint("shuffle_hash")
            .join(
                b,
                (F.col("ckey") == F.col("ckey_b"))
                & (F.col("doc_a") < F.col("doc_b")),
            )
            .select("doc_a", "doc_b")
        ).persist()
        n_pairs = pairs.count()

        n_hot, t_hot = verify_time(pairs, texts)
        n_rep, t_rep = verify_time(
            pairs.repartition(par, "doc_a", "doc_b"), texts
        )
        assert n_hot == n_rep, (n_hot, n_rep)  # repartition is row-preserving
        pairs.unpersist()
        d.unpersist()
        print(
            json.dumps(
                {
                    "shape": "verify_stage_skew",
                    "factor": s,
                    "docs": 5_000 * s,
                    "cluster_m": 156 * s + (1 if s > 1 else 1),
                    "pairs": n_pairs,
                    "survivors": n_rep,
                    "hot_layout_s": round(t_hot, 3),
                    "repart_s": round(t_rep, 3),
                    "repart_us_per_pair": round(t_rep / max(n_pairs, 1) * 1e6, 3),
                }
            ),
            flush=True,
        )
    return 0


def main_blocked_rank() -> int:
    """Measure the r6 global-window rewrite: naive
    ``row_number() OVER (ORDER BY key)`` (one Exchange SinglePartition
    carrying EVERY row through one task) vs ``indexing.blocked_rank``
    (range-block + parallel per-block windows + ≤RANGE_BLOCKS broadcast
    offsets) on a growing user-grain aggregate — the exact frame class
    the audit now rejects (rfm/decile/gini/RRF/norm-outlier shape).

    Both paths compute the identical rank (asserted via a full
    anti-join count at the smallest factor); the probe times a count()
    over the ranked relation. Expect the naive path's wall to grow
    superlinearly with one hot task while blocked stays near-linear
    with flat per-row cost — the local[32] proxy for the cluster
    argument (at 1000 executors the naive plan is not slow, it is
    DEAD: one task sorts the entire corpus).

    Usage: python tools/scaling_probe.py blocked-rank [factors...]
    """
    from braintumor_data_pipeline_spark.operators.indexing import (
        blocked_rank,
    )
    from pyspark.sql import Window

    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="blocked-rank-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    def _mdh(col, digits=12):
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, digits), 16, 10
        ).cast("long")

    def frame(n_users: int, dist: str):
        # per-user aggregate shape: unique key; two key distributions —
        # "uniform" (hash-uniform values, the r6 probe) and "clustered"
        # (Zipf-ish: 90% of keys inside a 100k-wide band of a 10^14
        # range — the adversarial shape for value-interpolated
        # boundaries; VERDICT r6 task 2)
        ids = spark.range(n_users)
        if dist == "uniform":
            key = _mdh(F.col("id"))
        else:
            key = F.when(
                _mdh(F.col("id"), 2) % 10 < 9,
                _mdh(F.col("id") + 7) % 100_000,
            ).otherwise(_mdh(F.col("id") + 13) % (10**14))
        return ids.select(F.col("id").alias("user_id"), key.alias("cents"))

    base_users = 500_000
    for dist in ("uniform", "clustered"):
        checked = False
        for n in factors:
            users = frame(base_users * n, dist).persist()
            users.count()

            t0 = time.time()
            w = Window.orderBy("cents", "user_id")
            naive = users.select(
                "user_id", F.row_number().over(w).alias("rank")
            )
            naive.select(F.max("rank")).collect()
            t_naive = time.time() - t0

            t0 = time.time()
            blocked = blocked_rank(users, "cents", "user_id").select(
                "user_id", F.col("_rank").alias("rank")
            )
            blocked.select(F.max("rank")).collect()
            t_blocked = time.time() - t0

            if not checked:  # identity proof once, at the cheapest factor
                diff = (
                    naive.join(
                        blocked, ["user_id", "rank"], "left_anti"
                    ).count()
                )
                assert diff == 0, f"rank mismatch rows: {diff}"
                checked = True

            # block balance: rows in the hottest _blk (the quantity
            # count-balanced boundaries are supposed to bound)
            from braintumor_data_pipeline_spark.operators.indexing import (
                _with_range_block,
            )

            hot = (
                _with_range_block(users, "cents")
                .groupBy("_blk")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )

            users.unpersist()
            print(
                json.dumps(
                    {
                        "shape": "blocked_rank_vs_naive",
                        "dist": dist,
                        "factor": n,
                        "rows": base_users * n,
                        "hot_block_rows": int(hot),
                        "naive_global_window_s": round(t_naive, 3),
                        "blocked_rank_s": round(t_blocked, 3),
                        "blocked_ns_per_row": round(
                            t_blocked / (base_users * n) * 1e9, 1
                        ),
                    }
                ),
                flush=True,
            )
    return 0


def main_graph_cc() -> int:
    """Scale the repeat-co-purchase components twin
    (graph_twins.copurchase_components shape): replicate sf0.1
    lineitem N× with BOTH key spaces offset (copies stay disjoint, so
    the graph gains components without densifying — the way a bigger
    corpus actually grows), build the support-2 edge list, run the
    bounded min-label propagation, and report edges / rounds-to-
    convergence / wall. Pass criteria: rounds stay flat (component
    diameter is a property of order structure, not corpus size) and
    wall grows ~linearly with edges — each round is one edges⋈labels
    join + min-groupBy, all partial-aggregable.

    Usage: python tools/scaling_probe.py graph-cc [factors...]
    """
    from braintumor_data_pipeline_spark.operators.graph_twins import (
        CC_ROUNDS,
        _sym,
    )

    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="graph-cc-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )

    for n in factors:
        copies = [
            base.select(
                (F.col("l_orderkey") + F.lit(i * 10_000_000)).alias(
                    "l_orderkey"
                ),
                (F.col("l_partkey") + F.lit(i * 10_000_000)).alias(
                    "l_partkey"
                ),
            )
            for i in range(n)
        ]
        li = copies[0]
        for c in copies[1:]:
            li = li.unionAll(c)
        t0 = time.time()
        a, b = li.alias("a"), li.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
                & (F.col("b.l_partkey") > F.col("a.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("pa"),
                F.col("b.l_partkey").alias("pb"),
            )
            .agg(F.countDistinct("a.l_orderkey").alias("n_ord"))
            .filter(F.col("n_ord") >= 2)
            .select("pa", "pb")
        )
        edges = _sym(pairs).localCheckpoint()
        n_edges = edges.count()
        t_edges = time.time() - t0

        t0 = time.time()
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint()
        )
        rounds = 0
        for _ in range(CC_ROUNDS):
            nbr = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy(F.col("src").alias("n2"))
                .agg(F.min("label").alias("nl"))
            )
            new = (
                labels.join(nbr, labels.node == nbr.n2, "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nl"), F.col("label")),
                    ).alias("label"),
                    (F.col("nl") < F.col("label")).alias("_chg"),
                )
            ).localCheckpoint()
            changed = new.agg(
                F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("c")
            ).collect()[0]["c"]
            labels = new.select("node", "label")
            rounds += 1
            if not changed:
                break
        n_comp = labels.select("label").distinct().count()
        t_cc = time.time() - t0
        print(
            json.dumps(
                {
                    "shape": "copurchase_components_scale",
                    "factor": n,
                    "edges_directed": n_edges,
                    "edge_build_s": round(t_edges, 3),
                    "rounds": rounds,
                    "components": n_comp,
                    "propagation_s": round(t_cc, 3),
                    "ms_per_kedge_round": round(
                        t_cc / max(rounds, 1) / max(n_edges / 1000, 1) * 1000,
                        2,
                    ),
                }
            ),
            flush=True,
        )
    return 0


def main_semdedup() -> int:
    """Scale the r7 SemDeDup formulation (VERDICT r6 task 1): grow a
    synthetic embedding corpus N×, let K ≈ N/SEMDEDUP_STRIDE scale WITH
    it, and time the two stages separately:

    - route_s: seed selection + two-level assignment + cap rank
      (_semdedup_capped — the O(N·√K) routing);
    - pair_s: same-(cluster, subcluster) enumeration + integer cosine
      gate + report (_semdedup_report_from — bounded by N·CAP/2).

    Corpus: 64-dim integer vectors around 96·s true centers (center
    id = _mix(id) % (96·s), coordinate = center base ± small noise) so
    clusters actually form and pair volume is realistic. Pass criteria:
    cand_pairs grows ~linearly with N (K scaling keeps E[cluster] at
    STRIDE) and pair_us_per_pair stays flat.

    An ADVERSARIAL single-blob corpus (every vector identical up to
    noise → the router sends everything to ONE cluster) is probed at
    the smallest factor: without the cap this is N²/2 pairs; the probe
    asserts the capped pair count is ≤ N·CAP/2 and reports both.

    Usage: python tools/scaling_probe.py semdedup [factors...]
    """
    from braintumor_data_pipeline_spark.operators.similarity import (
        SEMDEDUP_CAP,
        _semdedup_capped,
        _semdedup_report_from,
    )

    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="semdedup-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    base_n = 50_000

    def corpus(n_vec: int, n_centers: int):
        center = _mix(F.col("id"), 3) % n_centers
        dim = F.sequence(F.lit(0), F.lit(63))
        qv = F.transform(
            dim,
            lambda d: (
                (_mix(center * 64 + d, 11) % 2048 - 1024)
                + (_mix(F.col("id") * 64 + d, 23) % 128 - 64)
            ).cast("long"),
        )
        return spark.range(n_vec).select(
            F.col("id").alias("vec_id"), qv.alias("qv")
        )

    # untimed warmup of both sub-plans
    wq = corpus(2_000, 8)
    _semdedup_report_from(_semdedup_capped(wq), wq).count()

    for s in factors:
        n_vec = base_n * s
        q = corpus(n_vec, 96 * s).persist()
        q.count()

        t0 = time.time()
        capped = _semdedup_capped(q).persist()
        capped.count()
        t_route = time.time() - t0

        # candidate-pair volume by bucket-count math (never enumerated
        # twice): sum m(m-1)/2 over (cluster, subcluster)
        vol = (
            capped.groupBy("cluster", "subcluster")
            .agg(F.count("*").alias("m"))
            .agg(
                F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("pairs"),
                F.max("m").alias("hot"),
                F.count("*").alias("n_buckets"),
            )
            .collect()[0]
        )
        assert int(vol["hot"]) <= SEMDEDUP_CAP

        t0 = time.time()
        report = _semdedup_report_from(capped, q)
        n_dup = report.agg(F.sum("n_dup_pairs")).collect()[0][0]
        t_pair = time.time() - t0
        capped.unpersist()
        q.unpersist()

        print(
            json.dumps(
                {
                    "shape": "semdedup_k_scaled",
                    "factor": s,
                    "vectors": n_vec,
                    "buckets": int(vol["n_buckets"]),
                    "hot_bucket_m": int(vol["hot"]),
                    "cand_pairs": int(vol["pairs"]),
                    "dup_pairs": int(n_dup or 0),
                    "route_s": round(t_route, 3),
                    "pair_s": round(t_pair, 3),
                    "pair_us_per_pair": round(
                        t_pair / max(int(vol["pairs"]), 1) * 1e6, 3
                    ),
                }
            ),
            flush=True,
        )

    # adversarial one-blob corpus: every vector near ONE center
    n_vec = base_n
    q = corpus(n_vec, 1).persist()
    q.count()
    capped = _semdedup_capped(q).persist()
    vol = (
        capped.groupBy("cluster", "subcluster")
        .agg(F.count("*").alias("m"))
        .agg(
            F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("pairs"),
            F.max("m").alias("hot"),
        )
        .collect()[0]
    )
    capped.unpersist()
    q.unpersist()
    capped_pairs = int(vol["pairs"])
    assert int(vol["hot"]) <= SEMDEDUP_CAP
    assert capped_pairs <= n_vec * SEMDEDUP_CAP // 2
    print(
        json.dumps(
            {
                "shape": "semdedup_adversarial_one_blob",
                "vectors": n_vec,
                "uncapped_pairs_would_be": n_vec * (n_vec - 1) // 2,
                "capped_pairs": capped_pairs,
                "hot_bucket_m": int(vol["hot"]),
                "bound_n_cap_over_2": n_vec * SEMDEDUP_CAP // 2,
            }
        ),
        flush=True,
    )
    return 0


# ---------------------------------------------------------------------------
# Quick probe gate (VERDICT r6 task 6): the release-gate pass that keeps
# a future formulation change from silently reintroducing a superlinear
# stage. Runs the four scale probes at x1/x4 only and asserts the
# scale-relevant ratios against stored bands. Bands are deliberately
# loose (2-2.5x) — they catch a complexity-class regression (a linear
# stage going quadratic shows up as ~4x per-unit growth at x4), not
# machine noise.
#
# Usage: python tools/scaling_probe.py quick
# ---------------------------------------------------------------------------

#: (probe, metric) -> max allowed ratio metric(x4)/metric(x1). Rationale:
#: a per-unit cost that is flat-or-falling with scale stays < ~1.5 even
#: on a noisy box; a stage whose complexity class regressed (linear ->
#: quadratic) multiplies its per-unit cost by ~the scale factor (4x).
QUICK_BANDS = {
    ("blocked-rank", "blocked_ns_per_row"): 1.5,
    ("verify-skew", "repart_us_per_pair"): 2.0,
    ("graph-cc", "ms_per_kedge_round"): 2.5,
    ("semdedup", "pair_us_per_pair"): 2.0,
    # capped-LSH pair volume per doc must stay flat with scale (0.19 on
    # the clustered corpus at every factor probed, 1x..64x — SCALE.md
    # r8/r9 tables); growth here means the count-first bucket cap no
    # longer bounds the pair stage
    ("dedup-skew", "capped_pairs_per_doc"): 1.5,
}
#: semdedup candidate pairs must grow ~linearly with N (x4 data -> ~x4
#: pairs when K scales; the old fixed-K formulation grew x16)
SEMDEDUP_PAIR_GROWTH_MAX = 6.0
#: graph-cc convergence rounds must stay flat (diameter is a property
#: of order structure, not volume)
GRAPH_CC_EXTRA_ROUNDS_MAX = 2


def main_kcenter() -> int:
    """Per-step wall flatness of the k-center farthest-point loop
    (VERDICT r7 task 3): run the REAL ``_kcenter_loop`` (the exact code
    path ``kcenter_coreset_select`` executes) over a zero-I/O synthetic
    corpus large enough that per-pass compute dominates job overhead,
    and report the per-step argmax walls. With the r8 persist-chain
    (each step's ``mind`` cached, predecessor dropped after the
    successor materializes) every step is ONE cached-scan pass and the
    walls are flat in t; the pre-fix lazy chain replayed the whole
    lineage, making step k cost ~k passes (wall_last/wall_first ≈ t-1).

    Usage: python tools/scaling_probe.py kcenter [factors...]
    """
    factors = [int(x) for x in sys.argv[2:]] or [1]
    from braintumor_data_pipeline_spark.operators.similarity import (
        _kcenter_loop,
    )

    spark = get_spark(app_name="kcenter-probe")
    t_steps = 8
    dim = 16
    for n in factors:
        rows = 400_000 * n
        q = (
            spark.range(rows)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    f"transform(sequence(1, {dim}), d -> "
                    f"(id * {_MIX_A} % {_MIX_M}"
                    f" + cast(d as bigint) * {_MIX_C} % {_MIX_M}) % 4096)"
                ).alias("qv"),
            )
            .persist()
        )
        t0 = time.time()
        sel, walls = _kcenter_loop(q, t_steps)
        total = time.time() - t0
        print(
            json.dumps(
                {
                    "factor": n,
                    "rows": rows,
                    "steps": t_steps,
                    "total_s": round(total, 3),
                    "step_walls_s": [round(w, 3) for w in walls],
                    "wall_last_over_first": round(
                        walls[-1] / max(walls[0], 1e-9), 2
                    ),
                    "centers": len(sel),
                }
            ),
            flush=True,
        )
    return 0


#: a per-unit metric where BOTH endpoints are below this absolute value
#: carries no signal (3-decimal rounding can make x1 = 0.0 and the
#: ratio explode on a fast box) — treat the band as passed (ADVICE r7)
QUICK_ABS_FLOOR = 0.005
#: k-center per-step walls must be flat: the lazy-lineage regression
#: multiplies step t's wall by ~t (×7 at t=8); cached steps stay ~×1
KCENTER_STEP_RATIO_MAX = 2.5


def main_quick() -> int:
    import subprocess

    here = os.path.abspath(__file__)
    results: dict = {}
    for probe in (
        "blocked-rank",
        "verify-skew",
        "graph-cc",
        "semdedup",
        "dedup-skew",
        "kcenter",
    ):
        args = ["1"] if probe == "kcenter" else ["1", "4"]
        proc = subprocess.run(
            [sys.executable, here, probe, *args],
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            print(f"RED  probe {probe} exited {proc.returncode}")
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            return 1
        rows = [
            json.loads(ln)
            for ln in proc.stdout.splitlines()
            if ln.startswith("{")
        ]
        results[probe] = rows
        for r in rows:
            print(json.dumps(r), flush=True)

    failures = []

    def ratio(probe, metric, key=None):
        rows = [
            r
            for r in results[probe]
            if r.get("factor") in (1, 4)
            and (key is None or all(r.get(k) == v for k, v in key.items()))
        ]
        x1 = next(r[metric] for r in rows if r["factor"] == 1)
        x4 = next(r[metric] for r in rows if r["factor"] == 4)
        return x4 / max(x1, 1e-9), x1, x4

    for (probe, metric), band in QUICK_BANDS.items():
        keys = [{"dist": d} for d in ("uniform", "clustered")] if probe == "blocked-rank" else [None]
        for key in keys:
            r, x1, x4 = ratio(probe, metric, key)
            tag = f"{probe}/{metric}" + (f"[{key['dist']}]" if key else "")
            if x1 < QUICK_ABS_FLOOR and x4 < QUICK_ABS_FLOOR:
                print(
                    f"ok   {tag}: both endpoints < {QUICK_ABS_FLOOR} "
                    f"({x1} -> {x4}) — below signal floor, band skipped"
                )
                continue
            if r > band:
                failures.append(
                    f"{tag}: per-unit ratio x4/x1 = {r:.2f} > {band} "
                    f"({x1} -> {x4}) — superlinear stage reintroduced?"
                )
            else:
                print(f"ok   {tag}: x4/x1 = {r:.2f} <= {band}")

    g, p1, p4 = ratio("semdedup", "cand_pairs")
    if g > SEMDEDUP_PAIR_GROWTH_MAX:
        failures.append(
            f"semdedup/cand_pairs growth {g:.2f} > "
            f"{SEMDEDUP_PAIR_GROWTH_MAX} ({p1} -> {p4}) — K no longer "
            "scaling with N?"
        )
    else:
        print(f"ok   semdedup/cand_pairs growth = {g:.2f}")
    rr, r1, r4 = ratio("graph-cc", "rounds")
    if r4 > r1 + GRAPH_CC_EXTRA_ROUNDS_MAX:
        failures.append(
            f"graph-cc rounds grew {r1} -> {r4} — convergence no longer "
            "volume-free?"
        )
    else:
        print(f"ok   graph-cc rounds: {r1} -> {r4}")

    kc = results["kcenter"][0]
    kr = kc["wall_last_over_first"]
    if kr > KCENTER_STEP_RATIO_MAX:
        failures.append(
            f"kcenter wall_last_over_first = {kr} > "
            f"{KCENTER_STEP_RATIO_MAX} ({kc['step_walls_s']}) — lazy "
            "lineage replay reintroduced?"
        )
    else:
        print(f"ok   kcenter step walls flat: ratio {kr}")

    for f in failures:
        print(f"RED  {f}")
    print(f"\n{len(failures)} probe-band violation(s)")
    return 1 if failures else 0


def main_store_probe() -> int:
    """Store-vs-recompute incremental dedup (SCALE.md r9, VERDICT r8
    item 7): on the s-scaled clustered corpus, build the MinHash band
    store ONCE (bucketed, bucket counts at layout time — the
    ``minhash_store_probe_dedup`` layout), then time (a) probing a
    FIXED 625-doc batch against the prebuilt store vs (b) recomputing
    BOTH sides' signatures per run (the ``incremental_dedup_new_batch``
    shape, same cap). The probe must stay ~flat as the corpus grows —
    its cost is batch signatures + a scan of the 4-rows/doc store —
    while recompute pays full corpus re-tokenization every run.

    Usage: python tools/scaling_probe.py store-probe [factors...]
    """
    import tempfile

    from braintumor_data_pipeline_spark.operators.dedup import (
        BAND_ROWS,
        LSH_BUCKET_CAP as _CAP,
        MINHASH_A,
        MINHASH_B,
        MINHASH_K,
    )

    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="store-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    n_bands = MINHASH_K // BAND_ROWS
    # pay the REAL per-token base-hash cost (one md5 per token, as the
    # operator does over text) — the synthetic corpus's precomputed
    # integer h0 would otherwise make corpus re-signature nearly free
    # and hide exactly the cost the store exists to amortize
    h0_md5 = F.conv(
        F.substring(F.md5(F.col("h0").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    hs = F.array(
        *[
            (F.lit(MINHASH_A[i]) * h0_md5 + F.lit(MINHASH_B[i]))
            % F.lit(1 << 32)
            for i in range(MINHASH_K)
        ]
    )

    def bands_from_tokens(tok):
        wide = (
            tok.select("doc_id", hs.alias("hs"))
            .groupBy("doc_id")
            .agg(
                *[
                    F.min(F.col("hs")[i]).alias(f"m{i}")
                    for i in range(MINHASH_K)
                ]
            )
        )
        arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"m{i}").cast("string")
                                for i in range(
                                    b * BAND_ROWS, (b + 1) * BAND_ROWS
                                )
                            ],
                        )
                    ).alias("band_sig"),
                )
                for b in range(n_bands)
            ]
        )
        return wide.select("doc_id", F.explode(arr).alias("bs")).select(
            "doc_id",
            F.col("bs.band").alias("band"),
            F.col("bs.band_sig").alias("band_sig"),
        )

    def capped_probe(batch_bands, store_bands_with_n):
        s_side = store_bands_with_n.filter(
            F.col("bucket_n") <= _CAP
        ).alias("s")
        return (
            batch_bands.alias("b")
            .join(
                s_side,
                (F.col("b.band") == F.col("s.band"))
                & (F.col("b.band_sig") == F.col("s.band_sig")),
                "left",
            )
            .groupBy(F.col("b.doc_id"))
            .agg(
                F.size(F.collect_set(F.col("s.doc_id"))).alias("n_matches")
            )
        )

    spark.sql("CREATE DATABASE IF NOT EXISTS store_probe_wh")
    base = tempfile.mkdtemp(prefix="braintumor_store_probe_")
    # untimed warmup of both plan shapes
    wtok = _clustered_corpus(spark, 1)
    bands_from_tokens(wtok.filter(F.col("doc_id") % 97 == 0)).count()

    for s in factors:
        tok = _clustered_corpus(spark, s).persist()
        tok.count()
        # fixed 625-doc batch drawn from the SMALL-cluster tier
        # ([docs/4, docs/4 + docs/8) — 4-doc clusters): every batch doc
        # (id ≡ 0 mod 8 = first member of an even cluster) has exactly
        # 3 store siblings, so the match path is exercised (the giant
        # clusters' buckets are cap-dropped and contribute nothing)
        lo = (5_000 * s) // 4
        is_batch = (
            (F.col("doc_id") % 8 == 0)
            & (F.col("doc_id") >= lo)
            & (F.col("doc_id") < lo + 5_000)
        )
        # the batch ARRIVES as its own input in production — extracting
        # it from the corpus is not part of the probe's cost
        batch_tok = tok.filter(is_batch).persist()
        batch_tok.count()

        # layout build (amortized once per corpus, reported not banded)
        t0 = time.time()
        sb = bands_from_tokens(tok.filter(~is_batch))
        counts = sb.groupBy("band", "band_sig").agg(
            F.count("*").alias("bucket_n")
        )
        table = f"store_probe_wh.bands_x{s}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            sb.join(counts, ["band", "band_sig"])
            .select("doc_id", "band", "band_sig", "bucket_n")
            .write.mode("overwrite")
            .bucketBy(8, "band", "band_sig")
            .sortBy("band", "band_sig")
            .option("path", os.path.join(base, f"x{s}"))
            .saveAsTable(table)
        )
        build_s = time.time() - t0

        # (a) probe the prebuilt store: batch signatures only.
        # Aggregate a value DERIVED FROM THE STORE SIDE — a bare
        # count() of the per-doc groups lets Catalyst eliminate the
        # left join (group count is join-invariant) and the store is
        # never scanned, timing nothing.
        t0 = time.time()
        n_probe = (
            capped_probe(bands_from_tokens(batch_tok), spark.table(table))
            .agg(
                F.count("*").alias("rows"),
                F.sum("n_matches").alias("total_matches"),
            )
            .collect()[0]
        )
        probe_s = time.time() - t0

        # (b) recompute both sides from tokens (no store)
        t0 = time.time()
        all_bands = bands_from_tokens(tok)
        store_bands = all_bands.filter(~is_batch)
        counts2 = store_bands.groupBy("band", "band_sig").agg(
            F.count("*").alias("bucket_n")
        )
        n_re = (
            capped_probe(
                all_bands.filter(is_batch),
                store_bands.join(counts2, ["band", "band_sig"]),
            )
            .agg(
                F.count("*").alias("rows"),
                F.sum("n_matches").alias("total_matches"),
            )
            .collect()[0]
        )
        recompute_s = time.time() - t0

        batch_tok.unpersist()
        tok.unpersist()
        assert tuple(n_probe) == tuple(n_re), (n_probe, n_re)
        print(
            json.dumps(
                {
                    "shape": "minhash_store_probe",
                    "factor": s,
                    "corpus_docs": 5_000 * s,
                    "batch_docs": 625,
                    "store_build_s": round(build_s, 3),
                    "probe_s": round(probe_s, 3),
                    "recompute_both_s": round(recompute_s, 3),
                    "recompute_over_probe": round(
                        recompute_s / max(probe_s, 1e-9), 2
                    ),
                    "batch_rows_out": int(n_probe["rows"]),
                    "total_matches": int(n_probe["total_matches"]),
                }
            ),
            flush=True,
        )
    return 0


def main_store_probe_append() -> int:
    """Post-append probe degradation + compaction trigger (VERDICT r9
    task 8): the r9 store-probe table measures a BUILD-ONCE store; the
    lifecycle appends instead, and every bucketed append adds one file
    per (task × bucket) — the classic small-file decay of an append-only
    layout. This probe holds the corpus FIXED, appends daily slices to
    the rows relation, times the (assert-identical) capped probe after
    0/1/2/4/8 appends, then compacts (one fresh bucketed rewrite of the
    same rows) and times again — the gap between the appended and
    compacted probe is the compaction trigger band SCALE.md records.

    Usage: python tools/scaling_probe.py store-probe-append [factor]
    """
    import shutil
    import tempfile

    from braintumor_data_pipeline_spark.operators.dedup import (
        BAND_ROWS,
        LSH_BUCKET_CAP as _CAP,
        MINHASH_A,
        MINHASH_B,
        MINHASH_K,
    )

    s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="store-probe-append")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    n_bands = MINHASH_K // BAND_ROWS
    h0_md5 = F.conv(
        F.substring(F.md5(F.col("h0").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    hs = F.array(
        *[
            (F.lit(MINHASH_A[i]) * h0_md5 + F.lit(MINHASH_B[i]))
            % F.lit(1 << 32)
            for i in range(MINHASH_K)
        ]
    )

    def bands_from_tokens(tok):
        wide = (
            tok.select("doc_id", hs.alias("hs"))
            .groupBy("doc_id")
            .agg(
                *[
                    F.min(F.col("hs")[i]).alias(f"m{i}")
                    for i in range(MINHASH_K)
                ]
            )
        )
        arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"m{i}").cast("string")
                                for i in range(
                                    b * BAND_ROWS, (b + 1) * BAND_ROWS
                                )
                            ],
                        )
                    ).alias("band_sig"),
                )
                for b in range(n_bands)
            ]
        )
        return wide.select("doc_id", F.explode(arr).alias("bs")).select(
            "doc_id",
            F.col("bs.band").alias("band"),
            F.col("bs.band_sig").alias("band_sig"),
        )

    def lifecycle_probe(batch_bands, rows_df, tomb_df):
        live = rows_df.join(
            F.broadcast(tomb_df), ["band", "band_sig"], "left_anti"
        ).alias("s")
        return (
            batch_bands.alias("b")
            .join(
                live,
                (F.col("b.band") == F.col("s.band"))
                & (F.col("b.band_sig") == F.col("s.band_sig")),
                "left",
            )
            .groupBy(F.col("b.doc_id"))
            .agg(
                F.size(F.collect_set(F.col("s.doc_id"))).alias("n_matches")
            )
        )

    def timed_agg(df):
        t0 = time.time()
        row = df.agg(
            F.count("*").alias("rows"),
            F.sum("n_matches").alias("total_matches"),
        ).collect()[0]
        return time.time() - t0, (int(row["rows"]), int(row["total_matches"]))

    tok = _clustered_corpus(spark, s).persist()
    tok.count()
    lo = (5_000 * s) // 4
    is_batch = (
        (F.col("doc_id") % 8 == 0)
        & (F.col("doc_id") >= lo)
        & (F.col("doc_id") < lo + 5_000)
    )
    batch_bands = bands_from_tokens(tok.filter(is_batch)).persist()
    batch_bands.count()
    store_tok = tok.filter(~is_batch)
    # 9 epochs: epoch 0 = half the store (the init build), epochs 1..8
    # are the daily append slices
    # doc_ids are non-negative, so cast-to-long truncation == floor div
    slice16 = (F.col("doc_id") / 313).cast("long") % 16
    epoch = F.when(slice16 < 8, F.lit(0)).otherwise(slice16 - 7)

    spark.sql("CREATE DATABASE IF NOT EXISTS store_probe_wh")
    base = tempfile.mkdtemp(prefix="braintumor_store_append_")
    table = f"store_probe_wh.append_rows_x{s}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        bands_from_tokens(store_tok.filter(epoch == 0))
        .write.mode("overwrite")
        .bucketBy(8, "band", "band_sig")
        .sortBy("band", "band_sig")
        .option("path", os.path.join(base, "rows"))
        .saveAsTable(table)
    )

    def n_files():
        d = os.path.join(base, "rows")
        return sum(
            1
            for dp, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    def checkpoint(n_appends):
        # tombstones from a fresh recount (maintenance-side cost, NOT
        # probed — the lifecycle keeps counts merged; recounting here
        # only builds the same tiny relation for the harness)
        rows_df = spark.table(table)
        tomb = (
            rows_df.groupBy("band", "band_sig")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > _CAP)
            .select("band", "band_sig")
            .persist()
        )
        tomb.count()
        # probe the appended layout (min of 2 — scheduler noise)
        p1, agg1 = timed_agg(lifecycle_probe(batch_bands, rows_df, tomb))
        p2, agg2 = timed_agg(lifecycle_probe(batch_bands, rows_df, tomb))
        assert agg1 == agg2
        # recompute-both reference, asserted identical before timing
        included = store_tok.filter(
            (slice16 < 8) | (slice16 - 7 <= n_appends)
        )
        ref_bands = bands_from_tokens(included)
        ref_tomb = (
            ref_bands.groupBy("band", "band_sig")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > _CAP)
            .select("band", "band_sig")
        )
        _, agg_ref = timed_agg(
            lifecycle_probe(batch_bands, ref_bands, ref_tomb)
        )
        assert agg1 == agg_ref, (n_appends, agg1, agg_ref)
        tomb.unpersist()
        # isolate the LAYOUT cost from the batch-dominated probe: a
        # full one-column store scan (sum over doc_id) — pure
        # file-listing + footer + column-chunk read
        t0 = time.time()
        rows_df.agg(F.sum("doc_id")).collect()
        s1 = time.time() - t0
        t0 = time.time()
        rows_df.agg(F.sum("doc_id")).collect()
        s2 = time.time() - t0
        return min(p1, p2), agg1, min(s1, s2)

    # untimed warmup of the probe plan shape (JIT/codegen)
    timed_agg(lifecycle_probe(batch_bands, spark.table(table),
                              spark.table(table).limit(0)
                              .select("band", "band_sig")))
    results = []
    probe_s, agg, scan_s = checkpoint(0)
    results.append((0, n_files(), probe_s, agg, scan_s))
    for k in range(1, 9):
        (
            bands_from_tokens(store_tok.filter(epoch == k))
            .write.mode("append")
            .bucketBy(8, "band", "band_sig")
            .sortBy("band", "band_sig")
            .saveAsTable(table)
        )
        if k in (1, 2, 4, 8):
            probe_s, agg, scan_s = checkpoint(k)
            results.append((k, n_files(), probe_s, agg, scan_s))

    # compaction: ONE fresh bucketed rewrite of the appended rows
    t0 = time.time()
    compact_table = f"{table}_compact"
    spark.sql(f"DROP TABLE IF EXISTS {compact_table}")
    (
        # one task per bucket (repartition hash == bucket hash on the
        # same columns/count) -> exactly 8 output files, the layout the
        # init build would have produced. Read the RAW PATH, not the
        # catalog table: a bucketed-table scan makes the planner drop
        # the aligning repartition (observed: 175 output files from the
        # catalog read vs 8 from the path read of the same data).
        spark.read.parquet(os.path.join(base, "rows"))
        .repartition(8, "band", "band_sig")
        .write.mode("overwrite")
        .bucketBy(8, "band", "band_sig")
        .sortBy("band", "band_sig")
        .option("path", os.path.join(base, "rows_compact"))
        .saveAsTable(compact_table)
    )
    compact_s = time.time() - t0
    rows_c = spark.table(compact_table)
    tomb_c = (
        rows_c.groupBy("band", "band_sig")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > _CAP)
        .select("band", "band_sig")
    )
    c1, agg_c1 = timed_agg(lifecycle_probe(batch_bands, rows_c, tomb_c))
    c2, agg_c2 = timed_agg(lifecycle_probe(batch_bands, rows_c, tomb_c))
    assert agg_c1 == agg_c2 == results[-1][3]
    compact_probe_s = min(c1, c2)
    t0 = time.time()
    rows_c.agg(F.sum("doc_id")).collect()
    cs1 = time.time() - t0
    t0 = time.time()
    rows_c.agg(F.sum("doc_id")).collect()
    compact_scan_s = min(cs1, time.time() - t0)

    for k, nf, p, agg, sc in results:
        print(
            json.dumps(
                {
                    "shape": "store_probe_append",
                    "factor": s,
                    "appends": k,
                    "store_files": nf,
                    "probe_s": round(p, 3),
                    "store_scan_s": round(sc, 3),
                    "scan_vs_compacted": round(
                        sc / max(compact_scan_s, 1e-9), 2
                    ),
                    "batch_rows_out": agg[0],
                    "total_matches": agg[1],
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "shape": "store_probe_append_compacted",
                "factor": s,
                "compact_rewrite_s": round(compact_s, 3),
                "compacted_files": sum(
                    1
                    for dp, _, fs in os.walk(os.path.join(base, "rows_compact"))
                    for f in fs
                    if f.endswith(".parquet")
                ),
                "probe_s": round(compact_probe_s, 3),
                "store_scan_s": round(compact_scan_s, 3),
            }
        ),
        flush=True,
    )
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "quick":
        raise SystemExit(main_quick())
    if len(sys.argv) > 1 and sys.argv[1] == "store-probe":
        raise SystemExit(main_store_probe())
    if len(sys.argv) > 1 and sys.argv[1] == "store-probe-append":
        raise SystemExit(main_store_probe_append())
    if len(sys.argv) > 1 and sys.argv[1] == "semdedup":
        raise SystemExit(main_semdedup())
    if len(sys.argv) > 1 and sys.argv[1] == "kcenter":
        raise SystemExit(main_kcenter())
    if len(sys.argv) > 1 and sys.argv[1] == "headline":
        raise SystemExit(main_headline())
    if len(sys.argv) > 1 and sys.argv[1] == "graph-cc":
        raise SystemExit(main_graph_cc())
    if len(sys.argv) > 1 and sys.argv[1] == "dedup-skew":
        raise SystemExit(main_dedup_skew())
    if len(sys.argv) > 1 and sys.argv[1] == "verify-skew":
        raise SystemExit(main_verify_skew())
    if len(sys.argv) > 1 and sys.argv[1] == "blocked-rank":
        raise SystemExit(main_blocked_rank())
    raise SystemExit(main())
