"""Fixed-size probabilistic sketches, engine-owned and oracle-exact.

At 100 TB the frequency table itself can be too big to shuffle; sketches
replace it with O(1)-size state that map-side combines. Two classics,
built from plain DataFrame ops so Catalyst keeps them in codegen, with
every hash an md5-prefix BIGINT that DuckDB replays bit-for-bit (the
dedup/minhash doctrine, `dedup.py:39-56`):

- **Count-min**: d×w counter grid. The shuffle carries at most d·w
  partial counters PER PARTITION regardless of key cardinality — the
  whole point vs an exact groupBy(key). Estimates are min over d rows
  of a broadcast-joined 1 k-row sketch; the overestimate guarantee
  (est ≥ exact, error ≤ εN with prob 1−δ) is asserted in tests.
- **Bloom filter**: the dim side's keys become an m-bit bitmap held as
  64 BIGINT words built by a `bit_or` aggregate; the probe side tests
  k bit positions against ONE broadcast row carrying the word array —
  no explode, no per-row join, pure codegen. This is the engine-owned
  version of the runtime semi-join reduction Spark's
  `spark.sql.optimizer.runtime.bloomFilter` injects automatically
  (covered in `tests/test_plans.py`): at 100 TB you build it once and
  reuse it across queries, and the false-positive rows it admits are
  counted here explicitly.

Words carry 60 bits, not 64: DuckDB's checked arithmetic refuses
`1::BIGINT << 63`, and staying clear of the sign bit keeps every
mask positive on both engines.

Reference parity: the reference has no aggregation engine at all (it
delegates to BigQuery, `/root/reference/README.md:165-178`); sketches
are part of the engine-owned scale surface this repo adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from ..sources.fixtures import load_table as _t

# --- count-min parameters (d rows × w buckets; ε = e/w, δ = e^-d) ----
CM_SEEDS = 4
CM_W = 256

# --- HLL parameters: m = 64 registers over a 48-bit hash -------------
HLL_M = 64
HLL_REST_BITS = 42  # 48-bit hash minus the 6 bucket bits
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)

# --- bloom parameters: m = 64 words × 60 usable bits, k hashes -------
BF_WORDS = 64
BF_BITS_PER_WORD = 60
BF_M = BF_WORDS * BF_BITS_PER_WORD
BF_K = 3
BF_NATION_MOD = 5  # dim-side predicate: nations with key % 5 == 3
BF_NATION_RES = 3  # (~20% of suppliers; non-empty at every fixture SF)


def _h_spark(prefix: str, seed_col, key_col):
    """48-bit md5-prefix hash of '<prefix><seed>|<key>' as LONG."""
    s = F.concat(
        F.lit(prefix),
        seed_col.cast("string"),
        F.lit("|"),
        key_col.cast("string"),
    )
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def _h_duck(prefix: str, seed_sql: str, key_sql: str) -> str:
    return (
        f"('0x' || substr(md5('{prefix}' || CAST({seed_sql} AS VARCHAR)"
        f" || '|' || CAST({key_sql} AS VARCHAR)), 1, 12))::BIGINT"
    )


def countmin_build(keys: DataFrame, key: str = "key") -> DataFrame:
    """The sketch relation (seed, bucket, cnt): ≤ d·w rows total; the
    groupBy's map-side combine bounds shuffle volume at d·w partial
    counters per upstream partition, independent of key cardinality."""
    seeds = F.array(*[F.lit(i) for i in range(CM_SEEDS)])
    return (
        keys.select(F.col(key), F.explode(seeds).alias("seed"))
        .select(
            "seed",
            (_h_spark("cm", F.col("seed"), F.col(key)) % CM_W).alias(
                "bucket"
            ),
        )
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "countmin_heavy_hitters",
    oracle=f"""
    WITH keys AS (SELECT l_partkey AS key FROM lineitem),
    seeds AS (SELECT unnest(range({CM_SEEDS})) AS seed),
    cm AS (
      SELECT seed,
             {_h_duck("cm", "seed", "key")} % {CM_W} AS bucket,
             count(*) AS cnt
      FROM keys CROSS JOIN seeds
      GROUP BY 1, 2
    ),
    cand AS (SELECT key, count(*) AS exact_count FROM keys GROUP BY key),
    est AS (
      SELECT cand.key, min(cm.cnt) AS est_count,
             min(cand.exact_count) AS exact_count
      FROM cand JOIN seeds ON true
      JOIN cm ON cm.seed = seeds.seed
             AND cm.bucket = {_h_duck("cm", "seeds.seed", "cand.key")} % {CM_W}
      GROUP BY cand.key
    )
    SELECT key, est_count, exact_count
    FROM est ORDER BY est_count DESC, key LIMIT 20
    """,
    tags=("sketch", "agg", "approx"),
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part keys by count-min estimate, with the exact count
    alongside (est ≥ exact always; w=256 « 2k distinct keys, so bucket
    collisions make the overestimates visible). The sketch is ~1 k rows
    and broadcast; candidate keys here come from a distinct scan — in
    production they arrive from outside (a stream, a prior round), which
    is what lets the sketch replace the exact groupBy at scale."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("key")
    )
    cm = countmin_build(li)
    cand = li.groupBy("key").agg(F.count("*").alias("exact_count"))
    seeds = F.array(*[F.lit(i) for i in range(CM_SEEDS)])
    probe = cand.select(
        "key", "exact_count", F.explode(seeds).alias("seed")
    ).select(
        "key",
        "exact_count",
        "seed",
        (_h_spark("cm", F.col("seed"), F.col("key")) % CM_W).alias(
            "bucket"
        ),
    )
    est = (
        probe.join(F.broadcast(cm), ["seed", "bucket"])
        .groupBy("key")
        .agg(
            F.min("cnt").alias("est_count"),
            F.min("exact_count").alias("exact_count"),
        )
    )
    return est.orderBy(F.desc("est_count"), "key").limit(20)


def bloom_bitmap(dim_keys: DataFrame, key: str = "key") -> DataFrame:
    """(word, mask) for all 64 words — the full spine, so positional
    array indexing on the probe side stays aligned even for words with
    no bits set."""
    spark = dim_keys.sparkSession
    seeds = F.array(*[F.lit(i) for i in range(BF_K)])
    pos = _h_spark("bf", F.col("seed"), F.col(key)) % BF_M
    bits = (
        dim_keys.select(F.col(key), F.explode(seeds).alias("seed"))
        .select(pos.alias("pos"))
        .select(
            (F.col("pos") / BF_BITS_PER_WORD).cast("long").alias("word"),
            F.expr(
                f"shiftleft(1L, cast(pos % {BF_BITS_PER_WORD} as int))"
            ).alias("bitv"),
        )
        .groupBy("word")
        .agg(F.bit_or("bitv").alias("mask"))
    )
    spine = spark.range(BF_WORDS).select(F.col("id").alias("word"))
    return spine.join(bits, "word", "left").select(
        "word", F.coalesce("mask", F.lit(0)).alias("mask")
    )


_BF_PROBE_DUCK = " AND ".join(
    f"""(bm[CAST(({_h_duck("bf", str(s), "l_suppkey")} % {BF_M})
         // {BF_BITS_PER_WORD} AS INT) + 1]
       & (1::BIGINT << CAST(({_h_duck("bf", str(s), "l_suppkey")} % {BF_M})
         % {BF_BITS_PER_WORD} AS INT))) != 0"""
    for s in range(BF_K)
)


@register(
    "bloom_semijoin_reduction",
    oracle=f"""
    WITH dimk AS (
      SELECT s_suppkey AS key FROM supplier
      WHERE s_nationkey % {BF_NATION_MOD} = {BF_NATION_RES}
    ),
    seeds AS (SELECT unnest(range({BF_K})) AS seed),
    bits AS (
      SELECT CAST(({_h_duck("bf", "seed", "key")} % {BF_M})
                  // {BF_BITS_PER_WORD} AS BIGINT) AS word,
             1::BIGINT << CAST(({_h_duck("bf", "seed", "key")} % {BF_M})
                  % {BF_BITS_PER_WORD} AS INT) AS bitv
      FROM dimk CROSS JOIN seeds
    ),
    words AS (
      SELECT t.w AS word, coalesce(bit_or(bits.bitv), 0) AS mask
      FROM range({BF_WORDS}) t(w) LEFT JOIN bits ON bits.word = t.w
      GROUP BY t.w
    ),
    bmv AS (SELECT list(mask ORDER BY word) AS bm FROM words),
    probe AS (
      SELECT l_suppkey,
             ({_BF_PROBE_DUCK}) AS bloom_pass,
             l_suppkey IN (SELECT key FROM dimk) AS true_match
      FROM lineitem CROSS JOIN bmv
    )
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(sum(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(sum(CASE WHEN bloom_pass AND NOT true_match
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM probe
    """,
    tags=("sketch", "join", "bloom"),
)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-side bloom pruning as one codegen pass: the dim side
    (one nation band's suppliers) builds a 3840-bit bitmap, the fact scan
    tests k=3 positions against a single broadcast row holding the
    64-word array, and the output quantifies the reduction — total
    rows, bloom survivors, true matches, and the false positives the
    bitmap admits. The fact table never shuffles and never joins
    per-row; the bitmap is the only state that moves."""
    sup = _t(spark, sf_dir, "supplier")
    dim_keys = sup.filter(
        F.col("s_nationkey") % BF_NATION_MOD == BF_NATION_RES
    ).select(F.col("s_suppkey").alias("key"))
    bm = bloom_bitmap(dim_keys)
    bm_row = bm.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(word, mask))),"
            " s -> s.mask)"
        ).alias("bm")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey")
    probe = li.crossJoin(F.broadcast(bm_row))
    checks = []
    for s in range(BF_K):
        pos = _h_spark("bf", F.lit(s), F.col("l_suppkey")) % BF_M
        word = (pos / BF_BITS_PER_WORD).cast("int")
        mask = F.expr(
            f"shiftleft(1L, cast("
            f"(conv(substring(md5(concat('bf', '{s}', '|',"
            f" cast(l_suppkey as string))), 1, 12), 16, 10)"
            f" % {BF_M}) % {BF_BITS_PER_WORD} as int))"
        )
        checks.append(
            (F.element_at("bm", word + F.lit(1)).bitwiseAND(mask)) != 0
        )
    bloom_pass = checks[0] & checks[1] & checks[2]
    flagged = probe.join(
        F.broadcast(dim_keys.withColumn("hit", F.lit(True))),
        probe.l_suppkey == dim_keys.key,
        "left",
    ).select(
        bloom_pass.alias("bloom_pass"),
        F.coalesce("hit", F.lit(False)).alias("true_match"),
    )
    return flagged.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias(
            "n_bloom_pass"
        ),
        F.sum(F.when(F.col("true_match"), 1).otherwise(0)).alias("n_true"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("true_match"), 1).otherwise(
                0
            )
        ).alias("n_false_pos"),
    )


@register(
    "hll_register_sketch",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
    hashed AS (
      SELECT ('0x' || substr(md5('hll|' || CAST(key AS VARCHAR)), 1, 12))
               ::BIGINT AS h
      FROM keys
    ),
    rho AS (
      SELECT h % {HLL_M} AS bucket,
             CASE WHEN h // {HLL_M} = 0 THEN {HLL_REST_BITS + 1}
                  ELSE {HLL_REST_BITS + 1} - length(bin(h // {HLL_M}))
             END AS rho
      FROM hashed
    )
    SELECT CAST(t.b AS INT) AS bucket,
           CAST(coalesce(max(rho.rho), 0) AS INT) AS register
    FROM range({HLL_M}) t(b) LEFT JOIN rho ON rho.bucket = t.b
    GROUP BY t.b
    """,
    tags=("sketch", "agg", "approx"),
)
def hll_register_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register build over orders.o_custkey: 64 registers,
    each the max leading-zero rank of a 48-bit md5 hash — max() is
    partial-aggregable, so the shuffle carries ≤ m partial registers
    per partition no matter how many keys flow through (THE
    fixed-state cardinality sketch at 100 TB; Spark's own
    approx_count_distinct is this with a bigger m). The registers
    (not the float estimate) are the hash-checked output: integer
    max/bucket arithmetic replays exactly in DuckDB, while the
    harmonic-mean estimate — float by nature — is asserted to ±25%
    in tests. The DISTINCT on the input only mirrors HLL's
    insert-idempotence (duplicates cannot change any register); the
    streaming build would skip it."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    ).distinct()
    return hll_spine_registers(hll_bucket_rho(o))


def hll_bucket_rho(keys: DataFrame, key: str = "key") -> DataFrame:
    """Stateless HLL projection (bucket, rho) — shared by the batch
    query and the streaming build (it contains no aggregation, so it
    composes under any output mode)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll|"), F.col(key).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    rest = (F.col("h") / HLL_M).cast("long")
    rho = F.when(rest == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
        F.lit(HLL_REST_BITS + 1) - F.length(F.expr(f"bin(h div {HLL_M})"))
    )
    return keys.select(h.alias("h")).select(
        (F.col("h") % HLL_M).alias("bucket"), rho.alias("rho")
    )


def hll_spine_registers(bucket_rho: DataFrame) -> DataFrame:
    """(bucket, rho) → all-m (bucket, register) via the full spine, so
    empty buckets read 0 (they matter: the linear-counting correction
    counts them)."""
    spark = bucket_rho.sparkSession
    per_bucket = bucket_rho.groupBy("bucket").agg(
        F.max("rho").alias("register")
    )
    spine = spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
    return spine.join(per_bucket, "bucket", "left").select(
        "bucket",
        F.coalesce("register", F.lit(0)).cast("int").alias("register"),
    )


def hll_estimate(registers: list[int]) -> float:
    """Driver-side estimate from the 64 registers (float by nature —
    tested to tolerance, never hash-compared). Standard HLL with the
    small-range linear-counting correction."""
    import math

    m = HLL_M
    s = sum(2.0 ** -r for r in registers)
    est = HLL_ALPHA * m * m / s
    v = sum(1 for r in registers if r == 0)
    if est <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    return est


@register(
    "hll_mergeable_groups",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT event_type AS grp, user_id AS key FROM events
    ),
    rho AS (
      SELECT grp,
             h % {HLL_M} AS bucket,
             CASE WHEN h // {HLL_M} = 0 THEN {HLL_REST_BITS + 1}
                  ELSE {HLL_REST_BITS + 1} - length(bin(h // {HLL_M}))
             END AS rho
      FROM (
        SELECT grp,
               ('0x' || substr(md5('hll|' || CAST(key AS VARCHAR)), 1, 12))
                 ::BIGINT AS h
        FROM keys
      )
    ),
    spine AS (
      SELECT g.grp, t.b AS bucket
      FROM (SELECT DISTINCT grp FROM keys) g, range({HLL_M}) t(b)
    ),
    per_group AS (
      SELECT s.grp, CAST(s.bucket AS INT) AS bucket,
             CAST(coalesce(max(rho.rho), 0) AS INT) AS register
      FROM spine s
      LEFT JOIN rho ON rho.grp = s.grp AND rho.bucket = s.bucket
      GROUP BY s.grp, s.bucket
    )
    SELECT grp, bucket, register FROM per_group
    UNION ALL
    SELECT '__merged__' AS grp, bucket,
           CAST(max(register) AS INT) AS register
    FROM per_group GROUP BY bucket
    """,
    tags=("sketch", "agg", "approx"),
)
def hll_mergeable_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE property that makes sketches work on a cluster: HLL
    registers merge by bucket-wise max, so per-group (or per-partition,
    or per-day) sketches combine into the union's sketch without
    touching raw data again. Output: per-event-type register vectors
    PLUS the '__merged__' vector = bucket-wise max over the groups —
    which tests pin equal to the registers built directly from the
    distinct union of all keys (insert-idempotence + max associativity
    make this an identity, not an approximation). At 100 TB this is
    the pattern for incremental cardinality rollups: store m integers
    per (day, segment), answer any union query by max-merging stored
    vectors."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(F.col("event_type").alias("grp"), F.col("user_id").alias("key"))
        .distinct()
    )
    rho = ev.select(
        "grp",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll|"), F.col("key").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long").alias("h"),
    ).select(
        "grp",
        (F.col("h") % HLL_M).alias("bucket"),
        F.when(F.expr(f"h div {HLL_M}") == 0, F.lit(HLL_REST_BITS + 1))
        .otherwise(
            F.lit(HLL_REST_BITS + 1) - F.length(F.expr(f"bin(h div {HLL_M})"))
        )
        .alias("rho"),
    )
    # full (grp × bucket) spine WITHOUT a join: explode a constant
    # 0..m−1 sequence per group row — narrow, and m is a plan constant
    spine = (
        ev.select("grp")
        .distinct()
        .select(
            "grp",
            F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("bucket"),
        )
        .select("grp", F.col("bucket").cast("int").alias("bucket"))
    )
    per_group = (
        spine.join(rho.groupBy("grp", "bucket").agg(F.max("rho").alias("r")),
                   ["grp", "bucket"], "left")
        .select(
            "grp",
            "bucket",
            F.coalesce("r", F.lit(0)).cast("int").alias("register"),
        )
    )
    merged = per_group.groupBy("bucket").agg(
        F.max("register").cast("int").alias("register")
    ).select(F.lit("__merged__").alias("grp"), "bucket", "register")
    return per_group.unionAll(merged)


def _hll_z(keys: DataFrame) -> DataFrame:
    """Distinct-keys frame → 1-row scalar aggregate: the harmonic-mean
    denominator Z = Σ_buckets 2^(43 − register) as an EXACT BIGINT
    (2^43 per empty bucket; registers ≤ 43). Keeping Z integral makes
    the HLL estimate a single deterministic float division instead of
    an order-dependent float sum — the same doctrine as the integer
    money sums. Returned as a groupless aggregate so joining it is a
    scalar broadcast in the plan."""
    regs = hll_spine_registers(hll_bucket_rho(keys))
    return regs.agg(
        F.sum(
            F.expr("CAST(power(2, 43 - register) AS BIGINT)")
        ).alias("z"),
        F.sum(F.when(F.col("register") == 0, 1).otherwise(0)).alias("v"),
    )


_HLL_EST = "0.709 * 64.0 * 64.0 * CAST(power(2, 43) AS DOUBLE)"


@register(
    "hll_set_intersection_estimate",
    oracle=f"""
    WITH va AS (SELECT DISTINCT user_id AS key FROM events
                WHERE event_type = 'view'),
    vb AS (SELECT DISTINCT user_id AS key FROM events
           WHERE event_type = 'purchase'),
    vu AS (SELECT key FROM va UNION SELECT key FROM vb),
    reg AS (
      SELECT st.tag, st.b AS bucket,
             CAST(coalesce(max(r.rho), 0) AS INT) AS register
      FROM (SELECT s.tag, t.b
            FROM (VALUES ('a'), ('b'), ('u')) s(tag),
                 range({HLL_M}) t(b)) st
      LEFT JOIN (
        SELECT tag,
               h % {HLL_M} AS bucket,
               CASE WHEN h // {HLL_M} = 0 THEN {HLL_REST_BITS + 1}
                    ELSE {HLL_REST_BITS + 1} - length(bin(h // {HLL_M}))
               END AS rho
        FROM (
          SELECT 'a' AS tag, ('0x' || substr(md5('hll|' ||
                   CAST(key AS VARCHAR)), 1, 12))::BIGINT AS h FROM va
          UNION ALL
          SELECT 'b', ('0x' || substr(md5('hll|' ||
                   CAST(key AS VARCHAR)), 1, 12))::BIGINT FROM vb
          UNION ALL
          SELECT 'u', ('0x' || substr(md5('hll|' ||
                   CAST(key AS VARCHAR)), 1, 12))::BIGINT FROM vu
        )
      ) r ON r.tag = st.tag AND r.bucket = st.b
      GROUP BY st.tag, st.b
    ),
    z AS (
      SELECT tag,
             CAST(sum(CAST(power(2, 43 - register) AS BIGINT)) AS BIGINT)
               AS z,
             CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v
      FROM reg GROUP BY tag
    ),
    wide AS (
      SELECT max(CASE WHEN tag = 'a' THEN z END) AS za,
             max(CASE WHEN tag = 'b' THEN z END) AS zb,
             max(CASE WHEN tag = 'u' THEN z END) AS zu,
             max(CASE WHEN tag = 'a' THEN v END) AS va0,
             max(CASE WHEN tag = 'b' THEN v END) AS vb0,
             max(CASE WHEN tag = 'u' THEN v END) AS vu0
      FROM z
    ),
    -- standard HLL small-range fix: raw <= 2.5m with empty buckets ->
    -- linear counting m*ln(m/V)
    corr AS (
      SELECT
        CASE WHEN {_HLL_EST} / za <= 160.0 AND va0 > 0
             THEN 64.0 * ln(64.0 / va0) ELSE {_HLL_EST} / za END AS ea,
        CASE WHEN {_HLL_EST} / zb <= 160.0 AND vb0 > 0
             THEN 64.0 * ln(64.0 / vb0) ELSE {_HLL_EST} / zb END AS eb,
        CASE WHEN {_HLL_EST} / zu <= 160.0 AND vu0 > 0
             THEN 64.0 * ln(64.0 / vu0) ELSE {_HLL_EST} / zu END AS eu
      FROM wide
    )
    SELECT (SELECT count(*) FROM va) AS exact_a,
           (SELECT count(*) FROM vb) AS exact_b,
           (SELECT count(*) FROM va JOIN vb USING (key)) AS exact_inter,
           round(ea, 6) AS est_a,
           round(eb, 6) AS est_b,
           round(ea + eb - eu, 6) AS est_inter
    FROM corr
    """,
    tags=("sketch", "approx", "setop", "agg"),
)
def hll_set_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: estimate |viewers ∩ purchasers| by
    inclusion-exclusion over three HLL sketches (|A|+|B|−|A∪B|) beside
    the exact semijoin counts — the pattern that answers audience-
    overlap questions over 100 TB with 3×64 integers of state. The
    harmonic denominators are exact BIGINTs (Σ 2^(43−register)), so
    the raw-HLL estimates are single float divisions — hash-stable,
    unlike a float Σ2^-r accumulation. (Raw estimator, no
    linear-counting correction — documented, tests bound the error.)"""
    from ..sources.fixtures import load_table as _lt

    e = load_table_events = _lt(spark, sf_dir, "events")
    # r12 diamond rule: each distinct user set feeds the union, its
    # own sketch, its exact count and the semijoin — persist both so
    # the scan+filter+distinct builds once per set, not four times.
    va = (
        e.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .transform(persist_tracked)
    )
    vb = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .transform(persist_tracked)
    )
    vu = va.union(vb).distinct()
    za = _hll_z(va).select(F.col("z").alias("za"), F.col("v").alias("va0"))
    zb = _hll_z(vb).select(F.col("z").alias("zb"), F.col("v").alias("vb0"))
    zu = _hll_z(vu).select(F.col("z").alias("zu"), F.col("v").alias("vu0"))
    na = va.agg(F.count("*").alias("exact_a"))
    nb = vb.agg(F.count("*").alias("exact_b"))
    inter = va.join(vb, "key").agg(F.count("*").alias("exact_inter"))
    est = F.lit(0.709 * 64.0 * 64.0) * F.expr("CAST(power(2, 43) AS DOUBLE)")

    def corrected(zc, vc):
        # standard HLL small-range fix: raw <= 2.5m and empty buckets
        # exist -> linear counting m*ln(m/V); both branches are single
        # deterministic float expressions over exact integers
        raw = est / F.col(zc)
        return F.when(
            (raw <= 160.0) & (F.col(vc) > 0),
            64.0 * F.log(64.0 / F.col(vc)),
        ).otherwise(raw)
    return (
        za.crossJoin(F.broadcast(zb))
        .crossJoin(F.broadcast(zu))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(inter))
        .select(
            "exact_a",
            "exact_b",
            "exact_inter",
            F.round(corrected("za", "va0"), 6).alias("est_a"),
            F.round(corrected("zb", "vb0"), 6).alias("est_b"),
            F.round(
                corrected("za", "va0")
                + corrected("zb", "vb0")
                - corrected("zu", "vu0"),
                6,
            ).alias("est_inter"),
        )
    )
