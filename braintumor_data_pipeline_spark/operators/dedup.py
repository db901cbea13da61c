"""Deduplication operators over ``documents`` (SURVEY X21, N*).

Four tiers, mirroring a production LLM-data dedup stack:

1. **exact** — hash-groupBy on raw text (one shuffle on the hash key).
2. **normalized-exact** — lowercase/collapse-whitespace → md5 → groupBy.
3. **MinHash + LSH banding** — tokens → k seeded md5 min-hashes → band
   signatures → bucket self-join for candidate pairs. All hashing is
   ``md5`` over deterministic strings, so DuckDB can replay it exactly.
4. **n-gram Jaccard** — 3-token shingles (shuffle-free array slicing;
   the oracle uses lead() windows — two independent constructions),
   inverted-index self-join on shingle, exact Jaccard per pair.

Scale notes (100 TB of documents):
- every stage shuffles on content-derived keys (hash / band signature /
  shingle), never on doc_id — uniform distribution, no skew by design;
- LSH banding bounds the candidate-pair blowup: pairs are only generated
  within a bucket, and the band count (4 bands × 2 rows) trades recall
  vs cost exactly as in the MinHash literature;
- the inverted-index Jaccard join prunes by shingle co-occurrence —
  disjoint documents never meet (vs. a quadratic cross join).

SimHash lives here too, computed bit-arithmetically from md5 hex chars
so both engines replay it (60-bit signature to stay in signed int64).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from ..sources.fixtures import load_table as _t

MINHASH_K = 8
BAND_ROWS = 2  # 8 hashes → 4 bands of 2

# Affine permutation constants for MinHash: h_i = (A_i·h0 + B_i) mod 2³²
# over a 32-bit base hash h0 = first 8 hex chars of md5(token). A_i odd
# makes x → A·x+B a BIJECTION on Z_2³² (k genuinely distinct
# permutations — without the mod the map is order-preserving and every
# seed's min picks the same token). A_i is a 24-bit odd multiplier, B_i
# a 32-bit offset, both derived from md5 of the seed index —
# deterministic, engine-independent; the pre-mod product < 2^56 so the
# arithmetic is exact BIGINT on Spark and DuckDB alike. One md5 per
# token + k long multiply-adds replaces k md5 calls per token (the
# dominant signature-build cost), and min() aggregates over LONGs
# instead of 32-char strings.
import hashlib as _hashlib

MINHASH_A = tuple(
    int(_hashlib.md5(f"A{i}".encode()).hexdigest()[:6], 16) | 1
    for i in range(MINHASH_K)
)
MINHASH_B = tuple(
    int(_hashlib.md5(f"B{i}".encode()).hexdigest()[:8], 16)
    for i in range(MINHASH_K)
)


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
    tags=("dedup", "agg"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    ).select("keep_id", "n_copies")


@register(
    "dedup_normalized",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY norm_hash
    """,
    tags=("dedup", "agg"),
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-hash dedup: lowercase, collapse whitespace, md5.
    Shuffling the 32-byte hash instead of the document body is the
    at-scale trick — the wide text column never crosses the wire."""
    d = _t(spark, sf_dir, "documents")
    norm = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    )
    return (
        d.select(norm.alias("norm_hash"), "doc_id")
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signature_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id × seed → min over tokens of A_seed·h0(token) + B_seed.

    MinHash with k independent permutations approximated by k affine
    transforms of ONE 32-bit base hash per token (see MINHASH_A/B);
    min over a long is order-free and partial-aggregable (map-side
    combine). Formulation: one row per token carrying the k-hash ARRAY,
    k parallel min-aggregates, then an unpivot of the k-wide result
    (docs×k rows, tiny) — k× fewer rows through the explode/shuffle
    than the naive token×seed cross, and long arithmetic instead of k
    md5 calls per token (~2× faster signature build at sf0.1).
    """
    d = _t(spark, sf_dir, "documents")
    h0 = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast(
        "bigint"
    )
    hs = F.array(
        *[
            (F.lit(MINHASH_A[i]) * h0 + F.lit(MINHASH_B[i])) % F.lit(1 << 32)
            for i in range(MINHASH_K)
        ]
    )
    wide = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("doc_id", hs.alias("hs"))
        .groupBy("doc_id")
        .agg(*[F.min(F.col("hs")[i]).alias(f"m{i}") for i in range(MINHASH_K)])
    )
    sm = F.array(
        *[
            F.struct(
                F.lit(i).alias("seed"), F.col(f"m{i}").alias("minhash")
            )
            for i in range(MINHASH_K)
        ]
    )
    return wide.select("doc_id", F.explode(sm).alias("x")).select(
        "doc_id",
        F.col("x.seed").alias("seed"),
        F.col("x.minhash").alias("minhash"),
    )


_MINHASH_SEED_VALUES = ", ".join(
    f"({i}, {MINHASH_A[i]}, {MINHASH_B[i]})" for i in range(MINHASH_K)
)

_MINHASH_ORACLE_SIG = f"""
    SELECT doc_id, seed, min((a * h0 + b) % 4294967296) AS minhash
    FROM (SELECT doc_id,
                 ('0x' || substr(md5(token), 1, 8))::BIGINT AS h0
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM documents)),
         (VALUES {_MINHASH_SEED_VALUES}) AS seeds(seed, a, b)
    GROUP BY doc_id, seed
"""


@register(
    "minhash_signatures",
    oracle=_MINHASH_ORACLE_SIG,
    tags=("dedup", "minhash"),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signature_df(spark, sf_dir)


def bands_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, band_sig): the banded LSH bucket assignment shared
    by pair enumeration and the connected-components star reduction."""
    sigs = minhash_signature_df(spark, sf_dir)
    return (
        sigs.withColumn("band", (F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s.minhash.cast("string"),
                    ),
                    ",",
                )
            ).alias("band_sig")
        )
    )


# Candidate-pair relation as a standalone SQL fragment — the oracle for
# ``minhash_lsh_pairs`` and the edge source for the graph operators
# (operators/graph.py), which analyze the near-dup candidate graph.
LSH_PAIRS_SQL = f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
      SELECT doc_id,
             seed // {BAND_ROWS} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM sigs
      GROUP BY doc_id, band
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig
     AND a.doc_id < b.doc_id
"""


@register(
    "minhash_lsh_pairs",
    oracle=LSH_PAIRS_SQL,
    tags=("dedup", "minhash", "join"),
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: band the k-hash signature
    ({MINHASH_K // BAND_ROWS} bands × 2 rows), hash each band,
    self-join on (band, band_sig). The join key is the band signature —
    pairs appear only when a full band collides, which is the standard
    sub-quadratic near-dup candidate generation. The band relation feeds
    both self-join sides, so it persists (built once, not twice)."""
    bands = bands_df(spark, sf_dir).transform(persist_tracked)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


#: drop LSH band buckets with more than this many members before pair
#: enumeration: a bucket of m docs emits m·(m−1)/2 pairs, so one
#: degenerate bucket (boilerplate, empty docs, template spam) can emit
#: more pairs than the rest of the corpus combined. With the cap, pair
#: volume is bounded by N·(CAP−1)/2 per band — linear in corpus size —
#: and the dropped buckets are exactly the ones group-level dedup
#: (``minhash_dedup_groups``) already collapses without pairs.
LSH_BUCKET_CAP = 16


@register(
    "minhash_lsh_pairs_capped",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
      SELECT doc_id,
             seed // {BAND_ROWS} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM sigs
      GROUP BY doc_id, band
    ),
    counted AS (
      SELECT doc_id, band, band_sig
      FROM bands
      QUALIFY count(*) OVER (PARTITION BY band, band_sig)
              BETWEEN 2 AND {LSH_BUCKET_CAP}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM counted a
    JOIN counted b
      ON a.band = b.band AND a.band_sig = b.band_sig
     AND a.doc_id < b.doc_id
    """,
    tags=("dedup", "minhash", "join", "skew"),
)
def minhash_lsh_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-frequency-capped LSH candidate pairs: count each (band,
    band_sig) bucket FIRST, keep only buckets with 2..{LSH_BUCKET_CAP}
    members, then enumerate pairs inside the survivors by sorting each
    bucket's (bounded) member list and expanding i<j combinations with
    array transforms — no self-join at all.

    This is the production defense for the pair path (SCALE.md
    "Edge-list degeneracy caveat" made a checked query): uncapped pair
    enumeration is quadratic inside dup cliques (this fixture's shared
    vocabulary yields 9.2M pairs from 5k docs at sf0.1), while the
    capped form is bounded by N·(CAP−1)/2 pairs per band BY
    CONSTRUCTION. Plan shape: one shuffle to build bands, one
    count-aggregate on (band, band_sig), a shuffle join of bands
    against the small-bucket keys (both sides partitioned on the same
    key), then a groupBy on the SAME key (no extra exchange) whose
    collect_list is bounded by the cap — the m²-blowup bucket
    self-join never exists in the plan. Oversized buckets are dropped
    before any member list materializes, so a 100M-member degenerate
    bucket costs one count row, not an aggregation buffer."""
    bands = bands_df(spark, sf_dir)
    counts = bands.groupBy("band", "band_sig").agg(
        F.count("*").alias("bucket_n")
    )
    small = counts.filter(
        (F.col("bucket_n") >= 2) & (F.col("bucket_n") <= LSH_BUCKET_CAP)
    ).select("band", "band_sig")
    kept = bands.join(small, ["band", "band_sig"])
    pairs = (
        kept.groupBy("band", "band_sig")
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
    )
    return pairs.distinct()


@register(
    "minhash_dedup_groups",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    per_doc AS (
      SELECT doc_id,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS sig_hash
      FROM sigs
      GROUP BY doc_id
    )
    SELECT sig_hash, min(doc_id) AS keep_id, count(*) AS n_members
    FROM per_doc
    GROUP BY sig_hash
    """,
    tags=("dedup", "minhash", "agg"),
)
def minhash_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS (not pairs): docs sharing the full k-hash MinHash
    signature collapse to one group with keep_id = min(doc_id).

    This is the at-scale dedup shape: linear in corpus size (two
    shuffles: signature build, then group-by-signature), whereas pair
    enumeration (``minhash_lsh_pairs``) is inherently quadratic inside
    dup clusters — on this fixture's tiny shared vocabulary, 5k docs
    already produce 9.2M candidate pairs. Pairs stay in the catalog for
    parity/verification; pipelines dedup via groups."""
    sigs = minhash_signature_df(spark, sf_dir)
    per_doc = sigs.groupBy("doc_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s.minhash.cast("string"),
                ),
                ",",
            )
        ).alias("sig_hash")
    )
    return per_doc.groupBy("sig_hash").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_members")
    )


_SHINGLES_ORACLE = """
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(concat(tok, ' ',
                    lead(tok, 1) OVER w, ' ',
                    lead(tok, 2) OVER w)), 1, 15))::BIGINT AS shingle
      FROM (SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS i
            FROM documents)
      WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
"""


def shingle_arrays_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh_arr, n_sh): each document's DISTINCT 3-token shingle
    set as a SORTED array of 60-bit md5-prefix hashes, plus its size —
    built entirely NARROW (split → per-element hash → array_distinct →
    array_sort), no shuffle anywhere.

    This is the shared base of every shingle consumer. Doing distinct
    per-doc in the array (instead of a row-level ``.distinct()`` after
    explode) removes one full exchange from every downstream query,
    and having the per-doc set SIZE and SORTED ORDER available as
    narrow columns removes the per-doc count aggregation (+ its join)
    and the PPJoin prefix row_number window outright.

    The shingle is carried as a 60-bit hash, not the raw string: joins
    move and compare 8-byte longs instead of ~20-40-byte strings.
    Collisions are negligible (~n²/2⁶¹) and the oracle hashes
    identically, so comparisons stay exact."""
    d = _t(spark, sf_dir, "documents")
    # materialize the token array FIRST: referencing split() inside the
    # transform lambda would inline a fresh split per element access
    # (O(n²) tokenization per doc — measured 5× slower)
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    starts = F.when(
        F.size(t) >= 3, F.sequence(F.lit(1), F.size(t) - 2)
    ).otherwise(F.array().cast("array<int>"))
    hashed = F.transform(
        starts,
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at(t, i),
                        F.element_at(t, i + 1),
                        F.element_at(t, i + 2),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    return toks.select(
        "doc_id",
        F.array_sort(F.array_distinct(hashed)).alias("sh_arr"),
    ).withColumn("n_sh", F.size("sh_arr"))


def shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-token shingles per document as rows — explode of
    :func:`shingle_arrays_df`, still fully NARROW (the old row-level
    ``.distinct()`` exchange is gone; dedup happens per-doc in the
    array), vs the window-lead formulation the DuckDB oracle uses
    (same shingle set, two independent constructions)."""
    return shingle_arrays_df(spark, sf_dir).select(
        "doc_id", F.explode("sh_arr").alias("shingle")
    )


def shingles_with_count_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_sh, shingle) rows: :func:`shingles_df` with the
    per-doc distinct-set size carried as a narrow column, so join
    consumers never need a count aggregation + re-join."""
    return shingle_arrays_df(spark, sf_dir).select(
        "doc_id", "n_sh", F.explode("sh_arr").alias("shingle")
    )


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLES_ORACLE}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter) >= 0.05
    """,
    tags=("dedup", "join"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via an inverted-index self-join
    on shingle (co-occurrence pruning: disjoint docs never pair). The
    shuffle key is the shingle — content-uniform, skew-free.

    Each side of the self-join CARRIES its per-doc set size n_sh (a
    narrow column of :func:`shingle_arrays_df`), so the pair aggregate
    already holds everything the Jaccard needs — the former per-doc
    count aggregation and its two broadcast joins (whose identical
    subplan Catalyst built and shuffled TWICE) are gone: 4 exchanges +
    3 broadcasts → 1 exchange + 1 broadcast (r12, plan diff in
    plans/r12/). The shingle relation feeds both self-join sides;
    persisting it materializes the tokenize work once. MEMORY_AND_DISK
    spills gracefully at scale, and Spark's ContextCleaner unpersists
    when the query's reference is collected."""
    sh = shingles_with_count_df(spark, sf_dir).transform(persist_tracked)
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") * F.lit(1.0) / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return inter.filter(jac >= 0.05).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


# SimHash relation as a standalone fragment (oracle for
# ``simhash_signatures``; signature source for the hamming-band pairs).
SIMHASH_SQL = """
    WITH tok AS (
      SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
      FROM documents
    ),
    bits AS (
      SELECT doc_id, b,
             sum(CASE WHEN
                   (strpos('0123456789abcdef', substring(h, b // 4 + 1, 1)) - 1)
                   // CAST(pow(2, 3 - b % 4) AS BIGINT) % 2 = 1
                 THEN 1 ELSE -1 END) AS w
      FROM tok, (SELECT unnest(range(60)) AS b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN w > 0
               THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash60
    FROM bits
    GROUP BY doc_id
"""


@register(
    "simhash_signatures",
    oracle=SIMHASH_SQL,
    tags=("dedup", "simhash"),
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash from token md5s: bit b of a token hash votes ±1,
    signature bit = sign of the vote sum. Bits are extracted from hex
    chars arithmetically (char b//4, bit 3-b%4) so DuckDB replays the
    exact signature; 60 bits keeps the sum inside signed int64."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).select("doc_id", F.md5("t").alias("h"))

    def vote(b: int):
        # bit b lives in hex char b//4 (1-based), position 3-b%4 — all
        # constants per b, so each vote is a plain string expression
        char = F.substring(F.col("h"), b // 4 + 1, 1)
        nibble = F.instr(F.lit("0123456789abcdef"), char) - 1
        bit = F.floor(nibble / F.lit(float(2 ** (3 - b % 4)))).cast(
            "bigint"
        ) % 2
        return F.when(bit == 1, 1).otherwise(-1)

    # ONE row per token carrying all 60 votes; 60 parallel partial-
    # aggregable sums; the signature is then a pure projection — 60×
    # fewer rows through the explode/shuffle than a token×bit cross
    wide = tok.groupBy("doc_id").agg(
        *[F.sum(vote(b)).alias(f"w{b}") for b in range(60)]
    )
    sig = None
    for b in range(60):
        term = F.when(F.col(f"w{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return wide.select("doc_id", sig.cast("bigint").alias("simhash60"))


@register(
    "lsh_pairs_edit_verified",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
      SELECT doc_id,
             seed // {BAND_ROWS} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM sigs
      GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           levenshtein(da.text, db.text) AS edit_dist,
           round(1.0 - levenshtein(da.text, db.text)
                 / greatest(length(da.text), length(db.text), 1), 6)
             AS edit_sim
    FROM cand
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    WHERE abs(length(da.text) - length(db.text))
          <= 0.2 * greatest(length(da.text), length(db.text), 1) + 1e-9
      AND 1.0 - levenshtein(da.text, db.text)
          / greatest(length(da.text), length(db.text), 1) >= 0.8
    """,
    tags=("dedup", "minhash", "verify"),
)
def lsh_pairs_edit_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage of production dedup: LSH candidates re-checked
    with exact edit-distance similarity (≥0.8 kept). LSH bounds the
    quadratic work; the expensive exact measure runs only on survivors —
    candidates × O(len²) instead of corpus². Joins back to text via the
    doc_id key (broadcastable at fixture scale; bucketed at 100 TB).

    Two result-preserving prunes keep the O(len²) work off most pairs:
    (1) levenshtein ≥ |len_a − len_b|, so sim ≥ 0.8 REQUIRES the length
    gap ≤ 0.2·max_len — a codegen-cheap prefilter (same predicate in the
    oracle, provably implied by the final one); (2) Spark's bounded
    levenshtein(a, b, t) abandons the DP once distance exceeds t, and
    any distance above ~0.2·max_len fails the final filter anyway, so
    the bound changes no output, only cost.

    Skew fix (r5, found by the sf0.1 full-catalog sweep): the pair
    relation comes out of the band self-join PARTITIONED BY the band
    key, so every pair from one hot bucket (a large dup cluster shares
    identical band_sigs — at sf0.1 that is 9.5M pairs in ONE task) sits
    in one partition, serializing the expensive levenshtein stage on a
    single core. The verify stage needs no co-location whatsoever
    (row-local map), so hash-REPARTITION the narrow 2-column pair
    relation on (doc_a, doc_b) — pair keys are unique, hence uniform —
    before the text join + DP. One extra exchange of 16 bytes/row buys
    an even spread of the O(len·t) work; result identity is trivial
    (repartition is a row-preserving reshuffle) and oracle-checked."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_a", "doc_b"
    )
    da = d.select(F.col("doc_id").alias("ida"), F.col("text").alias("ta"))
    db = d.select(F.col("doc_id").alias("idb"), F.col("text").alias("tb"))
    la, lb = F.length("ta"), F.length("tb")
    mx = F.greatest(la, lb, F.lit(1))
    len_ok = F.abs(la - lb) <= 0.2 * mx + 1e-9
    # bound safely above 0.2*mx: lev > bound ⟹ sim < 0.8 ⟹ row dropped
    # (F.levenshtein only takes a literal threshold — expr() for a
    # per-row bound)
    lev = F.expr(
        "levenshtein(ta, tb, cast(floor(0.2 * greatest(length(ta),"
        " length(tb), 1)) + 2 as int))"
    )
    return (
        pairs.join(F.broadcast(da), pairs.doc_a == F.col("ida"))
        .join(F.broadcast(db), pairs.doc_b == F.col("idb"))
        .filter(len_ok)
        .select("doc_a", "doc_b", lev.alias("lev"), mx.alias("mx"))
        .filter(
            (F.col("lev") >= 0)
            & (F.lit(1.0) - F.col("lev") / F.col("mx") >= 0.8)
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("lev").alias("edit_dist"),
            F.round(F.lit(1.0) - F.col("lev") / F.col("mx"), 6).alias(
                "edit_sim"
            ),
        )
    )


@register(
    "lsh_verify_pair_sample",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
      SELECT doc_id,
             seed // {BAND_ROWS} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM sigs
      GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    samp AS (
      SELECT doc_a, doc_b FROM cand
      WHERE ('0x' || substr(md5(doc_a || ':' || doc_b), 1, 4))::BIGINT
            % 100 = 0
    )
    SELECT doc_a, doc_b,
           levenshtein(da.text, db.text) AS edit_dist,
           round(1.0 - levenshtein(da.text, db.text)
                 / greatest(length(da.text), length(db.text), 1), 6)
             AS edit_sim
    FROM samp
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    WHERE abs(length(da.text) - length(db.text))
          <= 0.2 * greatest(length(da.text), length(db.text), 1) + 1e-9
      AND 1.0 - levenshtein(da.text, db.text)
          / greatest(length(da.text), length(db.text), 1) >= 0.8
    """,
    tags=("dedup", "minhash", "verify", "sampling"),
)
def lsh_verify_pair_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1% HASH-SAMPLE of the LSH verify stage — the
    sf0.1-verifiable twin of ``lsh_pairs_edit_verified`` (SKIP_SF01
    class (b) points here): the full verify oracle levenshteins all
    ~9.5M clique pairs at sf0.1 (>600 s in DuckDB), so the twin keeps
    candidates whose pair-key md5 lands in 1 of 100 residues —
    membership is a pure function of (doc_a, doc_b), so both engines
    verify the IDENTICAL pair subset (~95k pairs at sf0.1) through the
    identical edit-distance + 0.8-similarity semantics. Sampled QA of
    an expensive verify stage is itself the production pattern (you
    spot-check the verifier at scale, you don't rerun it twice). The
    Spark side is the registered plan end-to-end: same bands, same
    uniform (doc_a, doc_b) repartition, same bounded levenshtein."""
    d = _t(spark, sf_dir, "documents")
    keep = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_a"), F.col("doc_b"))), 1, 4
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        == 0
    )
    pairs = (
        minhash_lsh_pairs(spark, sf_dir)
        .filter(keep)
        .repartition(
            spark.sparkContext.defaultParallelism, "doc_a", "doc_b"
        )
    )
    da = d.select(F.col("doc_id").alias("ida"), F.col("text").alias("ta"))
    db = d.select(F.col("doc_id").alias("idb"), F.col("text").alias("tb"))
    la, lb = F.length("ta"), F.length("tb")
    mx = F.greatest(la, lb, F.lit(1))
    len_ok = F.abs(la - lb) <= 0.2 * mx + 1e-9
    lev = F.expr(
        "levenshtein(ta, tb, cast(floor(0.2 * greatest(length(ta),"
        " length(tb), 1)) + 2 as int))"
    )
    return (
        pairs.join(F.broadcast(da), pairs.doc_a == F.col("ida"))
        .join(F.broadcast(db), pairs.doc_b == F.col("idb"))
        .filter(len_ok)
        .select("doc_a", "doc_b", lev.alias("lev"), mx.alias("mx"))
        .filter(
            (F.col("lev") >= 0)
            & (F.lit(1.0) - F.col("lev") / F.col("mx") >= 0.8)
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("lev").alias("edit_dist"),
            F.round(F.lit(1.0) - F.col("lev") / F.col("mx"), 6).alias(
                "edit_sim"
            ),
        )
    )


@register(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH sh AS ({SIMHASH_SQL}),
    bands AS (
      SELECT doc_id, b.band,
             (simhash60 >> (15 * b.band)) & 32767 AS band_val,
             simhash60
      FROM sh, (SELECT unnest(range(4)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash60 AS sa, b.simhash60 AS sb
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 3
    """,
    tags=("dedup", "simhash", "join"),
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming distance ≤ 3, found EXACTLY by
    pigeonhole banding: split the 60-bit signature into 4 bands of 15
    bits — any pair within distance 3 differs in at most 3 bands, so at
    least one band matches and the band-equality self-join cannot miss
    a qualifying pair (this blocking is exact, unlike probabilistic
    MinHash banding). Candidates then verify with one
    ``bit_count(xor)`` — integer ops end to end, exact on both engines.

    Scale: the shuffle key is (band, band_val) — 15 bits of
    content-derived signature, uniform by construction; candidate cost
    is bucket-quadratic, bounded by band width (more bits per band →
    smaller buckets → more bands to keep the distance guarantee:
    bands = distance + 1)."""
    sigs = simhash_signatures(spark, sf_dir).transform(persist_tracked)
    bands = sigs.select(
        "doc_id",
        "simhash60",
        F.explode(
            F.array(*[F.lit(i) for i in range(4)])
        ).alias("band"),
    ).select(
        "doc_id",
        "simhash60",
        "band",
        F.expr("shiftright(simhash60, 15 * band) & 32767").alias("band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash60").alias("sa"),
            F.col("b.simhash60").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long")
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= 3
    )


@register(
    "shingle_containment_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLES_ORACLE}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           round(n_inter * 1.0 / ca.n_sh, 6) AS cont_a_in_b,
           round(n_inter * 1.0 / cb.n_sh, 6) AS cont_b_in_a
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE 2 * n_inter >= ca.n_sh OR 2 * n_inter >= cb.n_sh
    """,
    tags=("dedup", "join"),
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment
    |A∩B| / |A| — the measure Jaccard misses when a short document is
    embedded whole inside a much longer one (boilerplate, quoted
    passages, doc-in-doc training-set contamination). Jaccard for a
    500-shingle doc inside a 50k-shingle doc is ~0.01; containment is
    ~1.0. Same inverted-index self-join as ``ngram_jaccard_pairs``
    (shuffle key = shingle hash, co-occurrence pruning), different
    final algebra. The keep threshold (either direction ≥ ½) is
    evaluated by INTEGER cross-multiplication — no float in any
    filter, so the cut is engine-exact; the reported ratios are
    display-rounded only.

    r12: per-doc set sizes ride the self-join as narrow columns
    (:func:`shingles_with_count_df`) — the count aggregation and both
    broadcast count-joins are gone, same plan diff as
    ``ngram_jaccard_pairs``."""
    sh = shingles_with_count_df(spark, sf_dir).transform(persist_tracked)
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("n_inter"))
    )
    keep = (2 * F.col("n_inter") >= F.col("na")) | (
        2 * F.col("n_inter") >= F.col("nb")
    )
    return inter.filter(keep).select(
        "doc_a",
        "doc_b",
        F.round(F.col("n_inter") / F.col("na"), 6).alias("cont_a_in_b"),
        F.round(F.col("n_inter") / F.col("nb"), 6).alias("cont_b_in_a"),
    )


@register(
    "incremental_dedup_new_batch",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
      SELECT doc_id,
             seed // {BAND_ROWS} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed))
               AS band_sig
      FROM sigs
      GROUP BY doc_id, band
    )
    SELECT n.doc_id AS new_doc_id,
           CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_old_matches,
           min(o.doc_id) AS first_old_match
    FROM bands n
    JOIN bands o
      ON o.band = n.band AND o.band_sig = n.band_sig
     AND o.doc_id % 2 = 0
    WHERE n.doc_id % 2 = 1
    GROUP BY n.doc_id
    """,
    tags=("dedup", "minhash", "join", "incremental"),
)
def incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: screen a NEW batch of documents
    against the EXISTING corpus without ever re-shuffling the corpus
    pairwise. Shape: the historical band index (doc_id, band,
    band_sig) is the build-once artifact — at 100 TB it lives as
    parquet bucketed by (band, band_sig), exactly like
    ``build_ivf_index`` persists centroid cells — and each arriving
    batch computes only ITS OWN signatures and probes the index with
    an equi-join. Cost per batch ∝ batch size + collisions, never
    corpus². Fixture split: even doc_ids play the corpus, odd ones the
    arriving batch; output = new docs colliding with ≥1 old doc, their
    collision count and earliest colliding corpus doc."""
    bands = bands_df(spark, sf_dir).transform(persist_tracked)
    old = bands.filter(F.col("doc_id") % 2 == 0).alias("o")
    new = bands.filter(F.col("doc_id") % 2 == 1).alias("n")
    return (
        new.join(
            old,
            (F.col("o.band") == F.col("n.band"))
            & (F.col("o.band_sig") == F.col("n.band_sig")),
        )
        .groupBy(F.col("n.doc_id").alias("new_doc_id"))
        .agg(
            F.countDistinct(F.col("o.doc_id")).alias("n_old_matches"),
            F.min(F.col("o.doc_id")).alias("first_old_match"),
        )
    )


PPJOIN_T_NUM, PPJOIN_T_DEN = 1, 2  # Jaccard threshold t = 0.5, exact


@register(
    "prefix_filter_jaccard_pairs",
    # The oracle is the PLAIN inverted-index formulation (no prefix
    # pruning) at the same threshold — an independent construction that
    # proves the pruned candidate set lost no qualifying pair.
    oracle=f"""
    WITH sh AS ({_SHINGLES_ORACLE}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE {PPJOIN_T_DEN} * n_inter >=
          {PPJOIN_T_NUM} * (ca.n_sh + cb.n_sh - n_inter)
    """,
    tags=("dedup", "join", "prefix-filter"),
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard join (the AllPairs/PPJoin family,
    Bayardo et al. / Xiao et al.): for threshold t = 1/2, a doc with n
    shingles only needs its first p = n − ⌈t·n⌉ + 1 shingles (under a
    GLOBAL canonical order — here the 60-bit shingle hash ascending)
    in the inverted index; any pair with Jaccard ≥ t provably shares a
    prefix shingle. Candidates come from the prefix-only index — a
    fraction of `ngram_jaccard_pairs`' full index — then each
    candidate pair is verified EXACTLY against the full shingle sets.

    At 100 TB this is THE set-similarity-join scaling lever beyond the
    plain inverted index: index volume (and the quadratic bucket
    blowup inside hot shingles) shrinks by ~t/(1+t) per doc, while the
    verify stage stays proportional to true candidates. All arithmetic
    is integer (threshold as the exact cross-multiplied
    2·inter ≥ 1·union, prefix length in
    integer div); the oracle recomputes the same pair set with NO
    prefix filter, so the driver hash certifies zero pruning loss.

    r12 restructure (plan diff in plans/r12/): the per-doc shingle set
    is already a SORTED array (:func:`shingle_arrays_df`), so the
    prefix is a narrow ``slice`` of it — the row_number window (one
    exchange + sort) and the counts join are gone — and the verify
    stage intersects the two full sets with ``array_intersect`` per
    candidate pair instead of double-exploding both sets through a
    join + groupBy (two more exchanges gone). Per-pair verify cost is
    O(|A|+|B|), same as the streamed join, but with zero shuffle."""
    arr = shingle_arrays_df(spark, sf_dir).transform(persist_tracked)
    # p = n − ceil(t·n) + 1, with ceil(n/2) = (n+1) div 2 exactly
    plen = (
        F.col("n_sh")
        - F.expr(
            f"({PPJOIN_T_NUM} * n_sh + {PPJOIN_T_DEN} - 1) "
            f"div {PPJOIN_T_DEN}"
        )
        + F.lit(1)
    )
    pref = arr.select(
        "doc_id", F.explode(F.slice("sh_arr", F.lit(1), plen)).alias("shingle")
    )
    a = pref.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = pref.select(F.col("doc_id").alias("doc_b"), "shingle")
    cands = (
        a.join(b, ["shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = arr.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_arr").alias("arr_a"),
        F.col("n_sh").alias("na"),
    )
    sb = arr.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_arr").alias("arr_b"),
        F.col("n_sh").alias("nb"),
    )
    verified = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("arr_a", "arr_b"))
        )
    )
    return (
        verified.filter(
            F.lit(PPJOIN_T_DEN) * F.col("n_inter")
            >= F.lit(PPJOIN_T_NUM)
            * (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "blocking_quality_report",
    oracle=f"""
    WITH sh AS ({_SHINGLES_ORACLE}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
      HAVING 2 * count(*) >= (SELECT ca.n_sh FROM counts ca
                              WHERE ca.doc_id = doc_a)
                           + (SELECT cb.n_sh FROM counts cb
                              WHERE cb.doc_id = doc_b)
                           - count(*)
    ),
    cand AS (SELECT * FROM ({LSH_PAIRS_SQL}) lsh),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
    hit AS (
      SELECT CAST(count(*) AS BIGINT) AS n_caught
      FROM truth SEMI JOIN cand
        ON truth.doc_a = cand.doc_a AND truth.doc_b = cand.doc_b
    ),
    d AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT n_docs, n_true AS n_true_pairs, n_cand AS n_candidate_pairs,
           n_caught,
           CASE WHEN n_true > 0
                THEN round(CAST(n_caught AS DOUBLE) / n_true, 6)
           END AS pairs_completeness,
           round(1.0 - CAST(n_cand AS DOUBLE)
                 / (n_docs * (n_docs - 1) / 2), 6) AS reduction_ratio
    FROM t, c, hit, d
    """,
    tags=("dedup", "evaluation", "minhash", "join"),
)
def blocking_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation — the entity-resolution literature's
    two numbers for judging a candidate-generation scheme before
    trusting it on 100 TB: **pairs completeness** (what fraction of the
    TRUE near-dup pairs the LSH banding actually surfaces = blocking
    recall) and **reduction ratio** (what fraction of the N·(N−1)/2
    all-pairs space it prunes away). Truth here is exact 3-gram Jaccard
    ≥ 0.5 from the inverted-index join (threshold test done as the
    integer cross-multiplication 2·|∩| ≥ |∪| — no float compare);
    candidates are the MinHash band-collision pairs. The intersection
    is a semi-join on the pair key; every output is a count, so the
    whole report is one row of exact BIGINTs with two final divisions.
    Scale: both pair sets are bounded by their own sub-quadratic
    generation (shingle co-occurrence / band collision); the report
    only ever joins PAIRS, never enumerates the N² space it measures.

    r12: per-doc set sizes ride the truth self-join as narrow columns
    (:func:`shingles_with_count_df`) — counts agg + both broadcast
    count-joins gone, as in ``ngram_jaccard_pairs``."""
    sh = shingles_with_count_df(spark, sf_dir).transform(persist_tracked)
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("n_inter"))
    )
    truth = (
        inter.filter(
            2 * F.col("n_inter")
            >= F.col("na") + F.col("nb") - F.col("n_inter")
        )
        .select("doc_a", "doc_b")
    ).transform(persist_tracked)
    cand = minhash_lsh_pairs(spark, sf_dir)
    t = truth.agg(F.count("*").alias("n_true"))
    c = cand.agg(F.count("*").alias("n_cand"))
    hit = truth.join(cand, ["doc_a", "doc_b"], "left_semi").agg(
        F.count("*").alias("n_caught")
    )
    d = _t(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    out = t.crossJoin(c).crossJoin(hit).crossJoin(d)
    return out.select(
        "n_docs",
        F.col("n_true").alias("n_true_pairs"),
        F.col("n_cand").alias("n_candidate_pairs"),
        "n_caught",
        F.when(
            F.col("n_true") > 0,
            F.round(F.col("n_caught").cast("double") / F.col("n_true"), 6),
        ).alias("pairs_completeness"),
        F.round(
            F.lit(1.0)
            - F.col("n_cand").cast("double")
            / (F.col("n_docs") * (F.col("n_docs") - 1) / 2),
            6,
        ).alias("reduction_ratio"),
    )


#: Banding configurations swept by ``lsh_tuning_curve``: every (bands,
#: rows) factorization of the 8-hash signature. The S-curve threshold
#: t ≈ (1/b)^(1/r) moves from ~0 (8×1: any single hash collision
#: pairs) to strict (1×8: the full-signature-equality dedup-groups
#: criterion).
LSH_CONFIGS = ((8, 1), (4, 2), (2, 4), (1, 8))


@register(
    "lsh_tuning_curve",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    cfg AS (SELECT * FROM (VALUES (8, 1), (4, 2), (2, 4), (1, 8))
            AS t(n_bands, rows_per_band)),
    buckets AS (
      SELECT c.n_bands, c.rows_per_band,
             s.seed // c.rows_per_band AS band,
             md5(string_agg(CAST(s.minhash AS VARCHAR), ','
                            ORDER BY s.seed)) AS band_sig,
             s.doc_id
      FROM sigs s CROSS JOIN cfg c
      GROUP BY c.n_bands, c.rows_per_band, s.doc_id,
               s.seed // c.rows_per_band
    ),
    sizes AS (
      SELECT n_bands, rows_per_band, band, band_sig,
             CAST(count(*) AS BIGINT) AS m
      FROM buckets
      GROUP BY n_bands, rows_per_band, band, band_sig
    )
    SELECT n_bands, rows_per_band,
           CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_colliding_buckets,
           CAST(sum(m * (m - 1) / 2) AS BIGINT) AS n_candidate_pairs
    FROM sizes
    GROUP BY n_bands, rows_per_band
    ORDER BY n_bands DESC
    """,
    tags=("dedup", "minhash", "tuning", "agg"),
)
def lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH parameter-tuning table — the measurement an operator
    runs BEFORE committing a banding scheme to 100 TB: for every
    (bands × rows) factorization of the 8-hash MinHash signature, the
    number of colliding buckets and the TOTAL candidate-pair count the
    scheme would emit. The pair count is Σ_buckets m·(m−1)/2 — computed
    from bucket SIZES alone, never by enumerating pairs, so the most
    permissive configuration (8 bands × 1 row) costs the same two
    partial-aggregable shuffles as the strictest. Reading the output:
    candidate volume vs band strictness IS the empirical S-curve; pick
    the cheapest config whose recall (verified separately by
    ``blocking_quality_report``) clears the bar."""
    sigs = minhash_signature_df(spark, sf_dir)
    outs = []
    for n_bands, rows_per_band in LSH_CONFIGS:
        buckets = (
            sigs.withColumn(
                "band", (F.col("seed") / rows_per_band).cast("int")
            )
            .groupBy("doc_id", "band")
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("seed", "minhash"))
                            ),
                            lambda s: s.minhash.cast("string"),
                        ),
                        ",",
                    )
                ).alias("band_sig")
            )
        )
        sizes = buckets.groupBy("band", "band_sig").agg(
            F.count("*").alias("m")
        )
        outs.append(
            sizes.agg(
                F.sum(F.when(F.col("m") >= 2, 1).otherwise(0)).alias(
                    "n_colliding_buckets"
                ),
                F.sum(
                    F.col("m") * (F.col("m") - 1) / 2
                ).cast("long").alias("n_candidate_pairs"),
            ).select(
                F.lit(n_bands).alias("n_bands"),
                F.lit(rows_per_band).alias("rows_per_band"),
                "n_colliding_buckets",
                "n_candidate_pairs",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy(F.col("n_bands").desc())


SN_WINDOW = 3  # sorted-neighborhood sliding window size (pairs at gap 1..2)
SN_PREFIX = 24  # sort-key length (lowercased text prefix)


@register(
    "sorted_neighborhood_pairs",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lower(substr(text, 1, {SN_PREFIX})) AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, k,
             row_number() OVER (ORDER BY k, doc_id) AS r
      FROM keyed
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.r - a.r AS BIGINT) AS rank_gap,
           CAST(a.k = b.k AS INTEGER) AS same_key
    FROM ranked a
    JOIN ranked b ON b.r > a.r AND b.r <= a.r + {SN_WINDOW - 1}
    ORDER BY a.r, b.r
    """,
    tags=("dedup", "blocking", "join", "window"),
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking — the OTHER classic sub-quadratic
    candidate generator next to LSH (Hernández–Stolfo): sort the corpus
    by a normalized key (lowercased 24-char text prefix) and emit every
    pair within a width-3 sliding window of the sort order —
    exactly 2N−3 candidates, the cheapest blocking there is, strong on
    prefix-preserving near-dups that token-set methods miss.

    The global sort rank is built with the blocked row_number +
    broadcast-offset plan (indexing.py's pattern: the block id is the
    key's FIRST BYTE, monotone in the sort order, so per-block windows
    + a prefix-sum over the tiny per-block count frame reproduce the
    global row_number with no global window). Neighbor pairs then come
    from two integer equi-joins on rank+1 / rank+2 — no window over raw
    rows anywhere. The oracle runs the naive global row_number; both
    compute the identical candidate set."""
    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.lower(F.substring("text", 1, SN_PREFIX)).alias("k"),
    )
    from pyspark.sql import Window as W

    blocked = keyed.withColumn("_blk", F.ascii(F.substring("k", 1, 1)))
    counts = blocked.groupBy("_blk").agg(F.count("*").alias("_cnt"))
    woff = W.orderBy("_blk").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "_blk", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
    )
    wblk = W.partitionBy("_blk").orderBy("k", "doc_id")
    ranked = (
        blocked.join(F.broadcast(offsets), "_blk")
        .withColumn("r", F.row_number().over(wblk) + F.col("_off"))
        .select("doc_id", "k", "r")
    ).transform(persist_tracked)
    pairs = None
    for gap in range(1, SN_WINDOW):
        b = ranked.select(
            F.col("doc_id").alias("doc_b"),
            F.col("k").alias("kb"),
            (F.col("r") - gap).alias("r"),
        )
        p = ranked.join(b, "r").select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            F.lit(gap).cast("long").alias("rank_gap"),
            (F.col("k") == F.col("kb")).cast("int").alias("same_key"),
            F.col("r").alias("_ra"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    return (
        pairs.orderBy("_ra", "rank_gap")
        .select("doc_a", "doc_b", "rank_gap", "same_key")
    )


@register(
    "minhash_jaccard_estimation_error",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    cand AS (SELECT * FROM ({LSH_PAIRS_SQL}) lsh),
    kmatch AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                  AS BIGINT) AS k_match
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.doc_a
      JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
      GROUP BY c.doc_a, c.doc_b
    ),
    sh AS ({_SHINGLES_ORACLE}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ),
    joined AS (
      SELECT k.k_match,
             coalesce(i.n_inter, 0) AS n_inter,
             ca.n_sh + cb.n_sh - coalesce(i.n_inter, 0) AS n_union
      FROM kmatch k
      LEFT JOIN inter i ON i.doc_a = k.doc_a AND i.doc_b = k.doc_b
      JOIN counts ca ON ca.doc_id = k.doc_a
      JOIN counts cb ON cb.doc_id = k.doc_b
    )
    SELECT k_match,
           round(CAST(k_match AS DOUBLE) / {MINHASH_K}, 6) AS est_jaccard,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(n_inter) AS BIGINT) AS sum_inter,
           CAST(sum(n_union) AS BIGINT) AS sum_union,
           round(CAST(sum(n_inter) AS DOUBLE) / sum(n_union), 6)
             AS micro_avg_exact
    FROM joined
    GROUP BY k_match
    ORDER BY k_match
    """,
    tags=("dedup", "minhash", "evaluation", "agg"),
)
def minhash_jaccard_estimation_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash-as-estimator calibration — does the signature agreement
    actually track Jaccard on THIS corpus? For every LSH candidate
    pair, the estimated similarity (matching minhashes / k) is bucketed
    against the EXACT 3-gram Jaccard, micro-averaged the
    float-sum-free way: per k_match bucket, Σ|∩| and Σ|∪| accumulate
    as BIGINTs and divide once at the end (a mean of per-pair ratios
    would be a distributed float sum — the hash-flake class this repo
    bans). Reading the table: est_jaccard vs micro_avg_exact per
    bucket IS the estimator's calibration curve; systematic deviation
    means the banding threshold is mis-set for the corpus. Cost is
    bounded by the candidate set (never all pairs); exact Jaccard
    joins the shingle index only for pairs the LSH already surfaced
    (pairs sharing no shingle keep |∩| = 0 via the left join)."""
    cand = minhash_lsh_pairs(spark, sf_dir).transform(persist_tracked)
    sigs = minhash_signature_df(spark, sf_dir)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), "seed", F.col("minhash").alias("ma")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), "seed", F.col("minhash").alias("mb")
    )
    kmatch = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)
            ).alias("k_match")
        )
    )
    # r12: exact Jaccard for the surfaced pairs via array_intersect of
    # the per-doc sorted shingle arrays — the shingle self-join +
    # pair groupBy + count agg + two broadcast count-joins collapse
    # into two joins and a narrow intersect (same plan diff family as
    # prefix_filter_jaccard_pairs).
    # n_sh > 0 keeps the algebra identical to the oracle's, which
    # builds counts from EXPLODED shingles and so never has a row for
    # a zero-shingle doc. Unreachable today (LSH candidates require
    # signatures built from shingles) but guards the inner joins below
    # against a future upstream change (ADVICE r12).
    arr = shingle_arrays_df(spark, sf_dir).filter(F.col("n_sh") > 0)
    ca = arr.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_arr").alias("arr_a"),
        F.col("n_sh").alias("na"),
    )
    cb = arr.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_arr").alias("arr_b"),
        F.col("n_sh").alias("nb"),
    )
    joined = (
        kmatch.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("arr_a", "arr_b"))
        )
        .select(
            "k_match",
            F.coalesce(F.col("n_inter"), F.lit(0)).alias("n_inter2"),
            (
                F.col("na") + F.col("nb")
                - F.coalesce(F.col("n_inter"), F.lit(0))
            ).alias("n_union"),
        )
    )
    return (
        joined.groupBy("k_match")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("n_inter2").alias("sum_inter"),
            F.sum("n_union").alias("sum_union"),
        )
        .select(
            "k_match",
            F.round(F.col("k_match").cast("double") / MINHASH_K, 6).alias(
                "est_jaccard"
            ),
            "n_pairs",
            "sum_inter",
            "sum_union",
            F.round(
                F.col("sum_inter").cast("double") / F.col("sum_union"), 6
            ).alias("micro_avg_exact"),
        )
        .orderBy("k_match")
    )


FS_LEN_TOL = 16  # token-length agreement band (absolute)


@register(
    "fellegi_sunter_patterns",
    oracle=f"""
    WITH cand AS (SELECT * FROM ({LSH_PAIRS_SQL}) lsh),
    attrs AS (
      SELECT doc_id, lang, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    pat AS (
      SELECT CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS lang_agree,
             CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS source_agree,
             CASE WHEN abs(a.n_tok - b.n_tok) <= {FS_LEN_TOL}
                  THEN 1 ELSE 0 END AS len_agree
      FROM cand c
      JOIN attrs a ON a.doc_id = c.doc_a
      JOIN attrs b ON b.doc_id = c.doc_b
    ),
    n_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM attrs),
    u_lang AS (
      SELECT CAST(sum(m * (m - 1)) AS BIGINT) AS agree2
      FROM (SELECT count(*) AS m FROM attrs GROUP BY lang)
    ),
    u_source AS (
      SELECT CAST(sum(m * (m - 1)) AS BIGINT) AS agree2
      FROM (SELECT count(*) AS m FROM attrs GROUP BY source)
    ),
    lens AS (SELECT n_tok, CAST(count(*) AS BIGINT) AS m
             FROM attrs GROUP BY n_tok),
    u_len AS (
      -- ordered agreeing pairs via a band join over the LENGTH
      -- HISTOGRAM (distinct lengths², not docs²), minus the n self-pairs
      SELECT CAST(sum(la.m * lb.m) - (SELECT n FROM n_all) AS BIGINT)
        AS agree2
      FROM lens la JOIN lens lb
        ON lb.n_tok BETWEEN la.n_tok - {FS_LEN_TOL}
                        AND la.n_tok + {FS_LEN_TOL}
    )
    SELECT lang_agree, source_agree, len_agree,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(
             (CASE WHEN lang_agree = 1
                   THEN CAST(ul.agree2 AS DOUBLE) / (n.n * (n.n - 1))
                   ELSE 1 - CAST(ul.agree2 AS DOUBLE) / (n.n * (n.n - 1))
              END)
           * (CASE WHEN source_agree = 1
                   THEN CAST(us.agree2 AS DOUBLE) / (n.n * (n.n - 1))
                   ELSE 1 - CAST(us.agree2 AS DOUBLE) / (n.n * (n.n - 1))
              END)
           * (CASE WHEN len_agree = 1
                   THEN CAST(ule.agree2 AS DOUBLE) / (n.n * (n.n - 1))
                   ELSE 1 - CAST(ule.agree2 AS DOUBLE) / (n.n * (n.n - 1))
              END), 6) AS u_prob
    FROM pat, n_all n, u_lang ul, u_source us, u_len ule
    GROUP BY lang_agree, source_agree, len_agree,
             n.n, ul.agree2, us.agree2, ule.agree2
    ORDER BY lang_agree, source_agree, len_agree
    """,
    tags=("dedup", "linkage", "evaluation", "agg"),
)
def fellegi_sunter_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter agreement-pattern table — probabilistic record
    linkage's first artifact: every LSH candidate pair is reduced to
    its agreement vector over (lang, source, token-length within ±16),
    counted per pattern, next to the U-PROBABILITY of that pattern
    among RANDOM pairs under field independence (the FS u-weights; a
    pattern whose candidate share vastly exceeds its u_prob carries
    linkage evidence). Exactness: each field's random-agreement
    probability is the rational Σ m_v(m_v−1) / N(N−1) from its value
    histogram — for the length band, agreeing pairs come from a BAND
    JOIN OVER THE LENGTH HISTOGRAM (distinct-lengths² work, never
    docs²) minus the N self-pairs; the three-factor product is one
    float expression per output row (≤8 rows). Scale: candidate-bounded
    pattern counts + three value-histogram aggregates; the band join
    touches an aggregated frame whose size is the length domain."""
    cand = minhash_lsh_pairs(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    attrs = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    ).transform(persist_tracked)
    a = attrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("src_a"),
        F.col("n_tok").alias("tok_a"),
    )
    b = attrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("src_b"),
        F.col("n_tok").alias("tok_b"),
    )
    pat = (
        cand.join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
        .select(
            F.when(F.col("lang_a") == F.col("lang_b"), 1)
            .otherwise(0)
            .alias("lang_agree"),
            F.when(F.col("src_a") == F.col("src_b"), 1)
            .otherwise(0)
            .alias("source_agree"),
            F.when(
                F.abs(F.col("tok_a") - F.col("tok_b")) <= FS_LEN_TOL, 1
            )
            .otherwise(0)
            .alias("len_agree"),
        )
    )
    n_all = attrs.agg(F.count("*").alias("n"))
    u_lang = (
        attrs.groupBy("lang")
        .agg(F.count("*").alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1)).alias("lang2"))
    )
    u_source = (
        attrs.groupBy("source")
        .agg(F.count("*").alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1)).alias("src2"))
    )
    lens = attrs.groupBy("n_tok").agg(F.count("*").alias("m"))
    la = lens.select(F.col("n_tok").alias("ta"), F.col("m").alias("ma"))
    lb = lens.select(F.col("n_tok").alias("tb"), F.col("m").alias("mb"))
    # raw ordered agreeing length pairs (self-pairs included; the "− n"
    # correction happens in the final projection so every broadcast
    # side below stays a plain GROUPLESS aggregate — the scalar-
    # subquery shape the plan audit certifies structurally). The ±TOL
    # band is an EQUI join on (length + offset) — the offset domain
    # explodes as a literal array, so no nested-loop range join ever
    # appears even over the tiny histogram frame.
    lb_exp = lb.select(
        "tb",
        "mb",
        F.explode(
            F.array(
                *[F.lit(o) for o in range(-FS_LEN_TOL, FS_LEN_TOL + 1)]
            )
        ).alias("off"),
    ).select((F.col("tb") + F.col("off")).alias("ta"), "mb")
    u_len_raw = la.join(F.broadcast(lb_exp), "ta").agg(
        F.sum(F.col("ma") * F.col("mb")).alias("len_raw")
    )
    counts = pat.groupBy("lang_agree", "source_agree", "len_agree").agg(
        F.count("*").alias("n_pairs")
    )
    out = (
        counts.crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(u_lang))
        .crossJoin(F.broadcast(u_source))
        .crossJoin(F.broadcast(u_len_raw))
        .withColumn("len2", F.col("len_raw") - F.col("n"))
    )
    denom = (F.col("n") * (F.col("n") - 1)).cast("double")

    def prob(flag: str, num: str):
        base = F.col(num).cast("double") / denom
        return F.when(F.col(flag) == 1, base).otherwise(1 - base)

    u_prob = (
        prob("lang_agree", "lang2")
        * prob("source_agree", "src2")
        * prob("len_agree", "len2")
    )
    return out.select(
        "lang_agree",
        "source_agree",
        "len_agree",
        "n_pairs",
        F.round(u_prob, 6).alias("u_prob"),
    ).orderBy("lang_agree", "source_agree", "len_agree")


@register(
    "dup_cluster_size_distribution",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    per_doc AS (
      SELECT doc_id,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed))
               AS sig_hash
      FROM sigs GROUP BY doc_id
    ),
    clusters AS (
      SELECT sig_hash, CAST(count(*) AS BIGINT) AS n_members
      FROM per_doc GROUP BY sig_hash
    ),
    tot AS (SELECT CAST(sum(n_members) AS BIGINT) AS n_docs FROM clusters)
    SELECT n_members AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(count(*) * n_members AS BIGINT) AS n_docs_covered,
           round(CAST(count(*) * n_members AS DOUBLE) / t.n_docs, 6)
             AS corpus_share
    FROM clusters, tot t
    GROUP BY n_members, t.n_docs
    ORDER BY cluster_size
    """,
    tags=("dedup", "minhash", "evaluation", "agg"),
)
def dup_cluster_size_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-cluster size histogram — the first chart in every
    dedup report: how many signature clusters have 1, 2, 3… members
    and what corpus share each size class covers (the dedup savings
    estimate is 1 − Σ clusters/Σ docs, readable straight off this
    table). Two stacked partial-aggregable groupBys (doc → signature →
    size class); the share divides exact BIGINTs per size row."""
    sigs = minhash_signature_df(spark, sf_dir)
    per_doc = sigs.groupBy("doc_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s.minhash.cast("string"),
                ),
                ",",
            )
        ).alias("sig_hash")
    )
    clusters = per_doc.groupBy("sig_hash").agg(
        F.count("*").alias("n_members")
    )
    tot = clusters.agg(F.sum("n_members").alias("n_docs"))
    return (
        clusters.groupBy(F.col("n_members").alias("cluster_size"))
        .agg(F.count("*").alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("n_clusters") * F.col("cluster_size")).alias(
                "n_docs_covered"
            ),
            F.round(
                (F.col("n_clusters") * F.col("cluster_size")).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("corpus_share"),
        )
        .orderBy("cluster_size")
    )


@register(
    "quality_keep_dedup_groups",
    oracle="""
    WITH q AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
               AS norm_hash,
             (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
              * 1000000)
             // CAST(len(string_split(text, ' ')) AS BIGINT) AS q_fix
      FROM documents
    ),
    g AS (
      SELECT norm_hash,
             CAST(count(*) AS BIGINT) AS n_members,
             min(doc_id) AS first_doc_id
      FROM q GROUP BY norm_hash HAVING count(*) >= 2
    ),
    best AS (
      SELECT norm_hash, doc_id AS kept_doc_id, q_fix AS kept_q_fix
      FROM (
        SELECT q.norm_hash, q.doc_id, q.q_fix,
               row_number() OVER (PARTITION BY q.norm_hash
                                  ORDER BY q.q_fix DESC, q.doc_id) AS rn
        FROM q JOIN g ON g.norm_hash = q.norm_hash
      ) WHERE rn = 1
    )
    SELECT g.norm_hash, g.n_members, b.kept_doc_id, b.kept_q_fix,
           g.first_doc_id,
           CAST(b.kept_doc_id <> g.first_doc_id AS BIGINT)
             AS keep_differs_from_first
    FROM g JOIN best b ON b.norm_hash = g.norm_hash
    ORDER BY g.norm_hash
    """,
    tags=("dedup", "llm", "curation"),
)
def quality_keep_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection for exact-dup groups (the
    FineWeb practice: keep the BEST member, not the first): group by
    the normalized-text md5, and inside every ≥2-member group keep the
    doc maximizing a lexical-diversity score — distinct tokens per
    token, held EXACTLY as the integer q_fix = distinct·10⁶ div total
    (no float ever ranks), ties to the smaller doc_id. Reports, per
    group, the kept member vs the naive keep-first choice.

    Scale shape: the shuffle key is the 32-byte norm hash (text never
    crosses the wire beyond the map-side hash+score projection); the
    argmax is one partial-aggregable max(struct(q_fix, -doc_id));
    groups are dup-cluster-sized — never corpus-sized partitions."""
    d = _t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    norm = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    )
    q = d.select(
        "doc_id",
        norm.alias("norm_hash"),
        F.expr(
            "(cast(size(array_distinct(split(text, ' '))) as bigint)"
            " * 1000000L) div cast(size(split(text, ' ')) as bigint)"
        ).alias("q_fix"),
    )
    agg = (
        q.groupBy("norm_hash")
        .agg(
            F.count("*").alias("n_members"),
            F.min("doc_id").alias("first_doc_id"),
            F.max(
                F.struct(F.col("q_fix"), (-F.col("doc_id")).alias("nd"))
            ).alias("m"),
        )
        .filter(F.col("n_members") >= 2)
    )
    return agg.select(
        "norm_hash",
        "n_members",
        (-F.col("m.nd")).alias("kept_doc_id"),
        F.col("m.q_fix").alias("kept_q_fix"),
        "first_doc_id",
        (F.col("m.nd") != -F.col("first_doc_id"))
        .cast("long")
        .alias("keep_differs_from_first"),
    ).orderBy("norm_hash")


#: Content-defined chunking parameters: W-byte rolling fingerprint
#: window, a cut AFTER position i whenever the w-gram hash ≡ 0
#: (mod CDC_MOD) — expected chunk length ≈ CDC_MOD chars. No min/max
#: clamp: the pure content-defined rule keeps both engines' cut sets
#: trivially identical and makes the boundary-shift property exact
#: (an edit perturbs only the chunks whose w-grams it touches).
CDC_W = 8
CDC_MOD = 64


@register(
    "cdc_chunk_dedup",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text, g.i AS i
      FROM documents,
           LATERAL (SELECT unnest(range({CDC_W}, length(text) + 1)) AS i)
             AS g
    ),
    cuts AS (
      SELECT doc_id, text, i AS cut
      FROM pos
      WHERE CAST(('0x' || substring(
              md5(substring(text, i - {CDC_W} + 1, {CDC_W})), 1, 8))
            AS BIGINT) % {CDC_MOD} = 0
      UNION ALL
      SELECT doc_id, text, length(text) AS cut FROM documents
    ),
    dedup_cuts AS (
      SELECT DISTINCT doc_id, text, cut FROM cuts
    ),
    chunks AS (
      SELECT doc_id,
             substring(text,
                       coalesce(lag(cut) OVER w, 0) + 1,
                       cut - coalesce(lag(cut) OVER w, 0)) AS chunk
      FROM dedup_cuts
      WINDOW w AS (PARTITION BY doc_id ORDER BY cut)
    ),
    sized AS (
      SELECT md5(chunk) AS h, length(chunk) AS len
      FROM chunks WHERE length(chunk) > 0
    ),
    per_hash AS (
      SELECT h, count(*) AS copies, min(len) AS len
      FROM sized GROUP BY h
    )
    SELECT CAST(count(*) AS BIGINT) AS distinct_chunks,
           CAST(sum(copies) AS BIGINT) AS total_chunks,
           CAST(sum(copies * len) AS BIGINT) AS total_chars,
           CAST(sum(len) AS BIGINT) AS distinct_chars,
           CAST(sum(CASE WHEN copies > 1 THEN copies - 1 ELSE 0 END)
                AS BIGINT) AS dup_chunks,
           round(1.0 - CAST(sum(len) AS DOUBLE)
                       / sum(copies * len), 6) AS char_dedup_ratio,
           CAST(max(copies) AS BIGINT) AS max_copies
    FROM per_hash
    """,
    tags=("dedup", "cdc", "text", "agg"),
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the Rabin/FastCDC family used by
    storage dedup and sub-document training-data dedup): split every
    document at positions where the {CDC_W}-gram hash ≡ 0 mod
    {CDC_MOD}, hash each chunk, and report corpus-level chunk-store
    statistics — distinct vs total chunks/chars, the char-level dedup
    ratio a content-addressed store would realize, and the hottest
    chunk. Boundaries move WITH content, not offsets, so an insertion
    re-chunks only its neighborhood — the property offset-based
    shingling lacks. Distributed shape: one positions explode per doc
    (relational here for oracle parity; at 100 TB this per-doc pass
    belongs in mapInPandas with the identical cut rule), a per-doc
    window for lag(cut) (hash shuffle on doc_id — docs bound the
    partition), then map-side-combinable hash aggregation; the report
    is exact integers plus one 6-dp ratio."""
    d = _t(spark, sf_dir, "documents")
    # Guard the position explode: sequence(CDC_W, len) DESCENDS (step
    # -1) when len < CDC_W, inventing positions whose substring start
    # (i - CDC_W + 1 <= 0) counts from the string END — cuts the
    # oracle's empty range(CDC_W, len+1) never produces. Short docs
    # must contribute zero w-gram positions (their only cut is the
    # unioned end-of-doc sentinel), mirroring the oracle exactly.
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.when(
                F.length("text") >= CDC_W,
                F.sequence(F.lit(CDC_W), F.length("text")),
            ).otherwise(F.expr("array()").cast("array<int>"))
        ).alias("i"),
    )
    is_cut = (
        F.conv(
            F.substring(
                F.md5(F.substring(F.col("text"), F.col("i") - CDC_W + 1, CDC_W)),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CDC_MOD
        == 0
    )
    cuts = (
        pos.filter(is_cut)
        .select("doc_id", "text", F.col("i").alias("cut"))
        .unionAll(
            d.select("doc_id", "text", F.length("text").alias("cut"))
        )
        .distinct()
    )
    chunks = cuts.select(
        "doc_id",
        F.expr(
            "substring(text, coalesce(lag(cut) over "
            "(partition by doc_id order by cut), 0) + 1, "
            "cut - coalesce(lag(cut) over "
            "(partition by doc_id order by cut), 0))"
        ).alias("chunk"),
    )
    sized = chunks.filter(F.length("chunk") > 0).select(
        F.md5("chunk").alias("h"), F.length("chunk").alias("len")
    )
    per_hash = sized.groupBy("h").agg(
        F.count("*").alias("copies"), F.min("len").alias("len")
    )
    return per_hash.agg(
        F.count("*").cast("long").alias("distinct_chunks"),
        F.sum("copies").cast("long").alias("total_chunks"),
        F.sum(F.col("copies") * F.col("len"))
        .cast("long")
        .alias("total_chars"),
        F.sum("len").cast("long").alias("distinct_chars"),
        F.sum(
            F.when(F.col("copies") > 1, F.col("copies") - 1).otherwise(0)
        )
        .cast("long")
        .alias("dup_chunks"),
        F.round(
            1.0
            - F.sum("len").cast("double")
            / F.sum(F.col("copies") * F.col("len")),
            6,
        ).alias("char_dedup_ratio"),
        F.max("copies").cast("long").alias("max_copies"),
    )


# ---------------------------------------------------------------------------
# Cross-run MinHash signature store (VERDICT r8 item 7): persist band
# signatures once, bucketed by band key, and dedup each ARRIVING batch
# against the store via the capped path WITHOUT rescanning the corpus —
# the production daily-refresh shape. ``incremental_dedup_new_batch``
# above recomputes BOTH sides per run; here the store side is a
# build-once bucketed layout whose bucket sizes (the cap input) were
# computed at layout time, so a probe costs: batch tokenization + one
# exchange of the (small) batch to the store's bucketing. The corpus
# text is never re-read.
# ---------------------------------------------------------------------------

#: doc_id % STORE_BATCH_MOD == 0 plays the arriving batch (~12.5%);
#: the rest is the standing corpus whose signatures live in the store.
STORE_BATCH_MOD = 8
STORE_N_BUCKETS = 8

#: Layout-format version of the persisted band store. The source
#: fingerprint only detects changed documents bytes; bump this whenever
#: the stored ENCODING changes — _band_sigs_of (minhash seeds/params,
#: band math), STORE_N_BUCKETS, the bucket_n fusion, or the row schema
#: — so cached stores built by older code are invalidated (ADVICE r10
#: class, completed tree-wide in r11).
_STORE_LAYOUT_VERSION = "1"


def _band_sigs_of(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig) for an arbitrary documents-shaped frame.

    Same construction as :func:`bands_df` (one md5 per token, k affine
    permutations, per-band md5 over the BAND_ROWS minhash values in
    seed order) expressed over wide per-doc min columns so it can run
    on a FILTERED side without touching the shared builders' plans.
    """
    h0 = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast(
        "bigint"
    )
    hs = F.array(
        *[
            (F.lit(MINHASH_A[i]) * h0 + F.lit(MINHASH_B[i])) % F.lit(1 << 32)
            for i in range(MINHASH_K)
        ]
    )
    wide = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("doc_id", hs.alias("hs"))
        .groupBy("doc_id")
        .agg(*[F.min(F.col("hs")[i]).alias(f"m{i}") for i in range(MINHASH_K)])
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{i}").cast("string")
                            for i in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
                        ],
                    )
                ).alias("band_sig"),
            )
            for b in range(MINHASH_K // BAND_ROWS)
        ]
    )
    return wide.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig")
    )


#: Marker/validation ride the shared publication protocol
#: (``maintenance.publish_derived_layout`` — r10 consolidation).
from ..sources.maintenance import _LAYOUT_MARKER as _STORE_MARKER  # noqa: E402
from ..sources.maintenance import _marker_valid as _store_marker_valid  # noqa: E402
from ..sources.maintenance import (  # noqa: E402
    layout_marker_content as _store_marker_content,
)

#: (table, fingerprint) pairs this process has already registered —
#: skips the DROP/CREATE metadata round-trip on repeat ensure() calls.
_STORE_REGISTERED: set[tuple[str, str]] = set()


def _documents_fingerprint(sf_dir: str) -> str:
    """Fingerprint of the source documents fixture (shared scheme —
    see ``maintenance.fixture_fingerprint``)."""
    from ..sources.maintenance import fixture_fingerprint

    return fixture_fingerprint(sf_dir, "documents")


def ensure_minhash_band_store(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the corpus band-signature store for ``sf_dir``
    (idempotent, cross-process race-safe — the same stage/marker/rename
    publication protocol as ``maintenance.write_events_partitioned``);
    returns the fully qualified table name.

    Layout: (doc_id, band, band_sig, bucket_n) bucketed AND sorted by
    (band, band_sig) into {STORE_N_BUCKETS} buckets — the probe join's
    store side therefore needs NO Exchange, and ``bucket_n`` (the
    band-bucket population, the capped path's input) is computed ONCE
    here at layout time, so probes never aggregate the store. At 100 TB
    the daily maintenance story is: append each accepted batch's bands
    (bucketed appends preserve the layout), merge its per-bucket counts
    into a (band, band_sig, n) side relation with a map-side-combinable
    sum, and tombstone buckets that newly exceed LSH_BUCKET_CAP —
    probes read counts, never recount; see SCALE.md "r9: signature
    store".

    Validity is a FINGERPRINT marker (source footer row count + size)
    stamped inside the stage dir before the atomic rename — a bare
    ``_SUCCESS`` check would silently adopt a store built from a
    regenerated documents.parquet at the same path, or from a different
    sf_dir sharing the leaf name (``/a/sf0.01`` vs ``/b/sf0.01``). A
    stale or partial layout at the publish path is atomically renamed
    ASIDE (readers keep their POSIX handles; ``reap_stale_siblings``
    prunes day-old remains), never deleted live and never a permanent
    block on publication.
    """
    import re
    import tempfile

    from ..sources.maintenance import publish_derived_layout

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    db = f"minhash_store_wh_{tag}"
    full = f"{db}.band_store"
    base = os.path.join(tempfile.gettempdir(), "braintumor_minhash_store", tag)
    path = os.path.join(base, "band_store")
    fp = _documents_fingerprint(sf_dir)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    ddl_cols = "`doc_id` bigint, `band` int, `band_sig` string, `bucket_n` bigint"

    def _register(location: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {full}")
        spark.sql(
            f"CREATE TABLE {full} ({ddl_cols}) USING PARQUET "
            f"CLUSTERED BY (band, band_sig) SORTED BY (band, band_sig) "
            f"INTO {STORE_N_BUCKETS} BUCKETS LOCATION '{location}'"
        )
        _STORE_REGISTERED.add((full, fp))

    if _store_marker_valid(
        path, _store_marker_content(fp, _STORE_LAYOUT_VERSION)
    ):
        if (full, fp) not in _STORE_REGISTERED or not spark.catalog.tableExists(
            full
        ):
            _register(path)  # fresh session over an intact layout: adopt
        return full

    def build(stage: str) -> None:
        corpus = _t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % STORE_BATCH_MOD != 0
        )
        sb = _band_sigs_of(corpus)
        counts = sb.groupBy("band", "band_sig").agg(
            F.count("*").alias("bucket_n")
        )
        rows = sb.join(counts, ["band", "band_sig"]).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("band").cast("int").alias("band"),
            "band_sig",
            F.col("bucket_n").cast("long").alias("bucket_n"),
        )
        spark.sql(f"DROP TABLE IF EXISTS {full}")
        (
            rows.write.mode("overwrite")
            .bucketBy(STORE_N_BUCKETS, "band", "band_sig")
            .sortBy("band", "band_sig")
            .option("path", stage)
            .saveAsTable(full)
        )

    publish_derived_layout(path, fp, build, version=_STORE_LAYOUT_VERSION)
    _register(path)
    return full


@register(
    "minhash_store_probe_dedup",
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
      SELECT doc_id,
             seed // {BAND_ROWS} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM sigs
      GROUP BY doc_id, band
    ),
    store AS (
      SELECT doc_id, band, band_sig,
             count(*) OVER (PARTITION BY band, band_sig) AS bucket_n
      FROM bands WHERE doc_id % {STORE_BATCH_MOD} <> 0
    ),
    batch AS (
      SELECT doc_id, band, band_sig
      FROM bands WHERE doc_id % {STORE_BATCH_MOD} = 0
    )
    SELECT b.doc_id AS doc_id,
           CAST(count(DISTINCT s.band) AS BIGINT) AS n_hit_bands,
           CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_store_matches,
           CAST(coalesce(min(s.doc_id), -1) AS BIGINT) AS min_store_doc,
           CAST(count(s.doc_id) > 0 AS BIGINT) AS is_near_dup
    FROM batch b
    LEFT JOIN (SELECT * FROM store WHERE bucket_n <= {LSH_BUCKET_CAP}) s
      ON b.band = s.band AND b.band_sig = s.band_sig
    GROUP BY b.doc_id
    """,
    tags=("dedup", "minhash", "incremental", "store", "join"),
)
def minhash_store_probe_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup against a PERSISTED signature store:
    the standing corpus's band signatures live in a bucketed table
    (built once by :func:`ensure_minhash_band_store`, bucket sizes
    precomputed at layout time); the arriving batch (doc_id %
    {STORE_BATCH_MOD} == 0, ~12.5%) computes only ITS OWN signatures
    and probes the store with a capped equi-join. Per batch doc:
    how many bands hit, how many distinct store docs collide, the
    earliest such doc (-1 when clean), and the near-dup verdict.

    100 TB shape: the store side of the join is a bucketed scan with
    NO Exchange (asserted in tests/test_store_dedup.py) and no
    aggregation — ``bucket_n`` was computed when the layout was built;
    degenerate boilerplate buckets (> {LSH_BUCKET_CAP} members) are
    filtered by that precomputed count BEFORE the join, so a 100M-doc
    template cluster contributes zero probe pairs. Per-batch cost is
    batch tokenization + one exchange of the batch to the store's
    bucketing — corpus text is never re-read, which is the whole point
    of a store (vs ``incremental_dedup_new_batch``, which recomputes
    both sides every run)."""
    store_table = ensure_minhash_band_store(spark, sf_dir)
    store = spark.table(store_table).filter(
        F.col("bucket_n") <= LSH_BUCKET_CAP
    ).alias("s")
    batch = _band_sigs_of(
        _t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % STORE_BATCH_MOD == 0
        )
    ).alias("b")
    return (
        batch.join(
            store,
            (F.col("b.band") == F.col("s.band"))
            & (F.col("b.band_sig") == F.col("s.band_sig")),
            "left",
        )
        .groupBy(F.col("b.doc_id").alias("doc_id"))
        # collect_set, not countDistinct: two countDistincts would plan
        # an Expand (3x the joined rows through two extra exchanges);
        # the sets here are bounded BY CONSTRUCTION (≤ bands, ≤
        # bands·CAP members), so this is one map-side-combinable
        # exchange with O(CAP) state per key.
        .agg(
            F.size(F.collect_set(F.col("s.band")))
            .cast("long")
            .alias("n_hit_bands"),
            F.size(F.collect_set(F.col("s.doc_id")))
            .cast("long")
            .alias("n_store_matches"),
            F.coalesce(
                F.array_min(F.collect_set(F.col("s.doc_id"))), F.lit(-1)
            )
            .cast("long")
            .alias("min_store_doc"),
            (F.size(F.collect_set(F.col("s.doc_id"))) > 0)
            .cast("long")
            .alias("is_near_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Signature-store LIFECYCLE (the daily-refresh maintenance contract in
# SCALE.md "r9: cross-run MinHash signature store", fixture-exercised in
# tests/test_store_dedup.py). The registered probe above fuses bucket_n
# into the rows — correct for a build-once store, but appends would
# leave old rows' counts stale. The production lifecycle therefore
# keeps THREE relations:
#   rows       (doc_id, band, band_sig)  — bucketed, append-only
#   counts     (band, band_sig, n)       — merged per batch (one
#                                          map-side-combinable sum)
#   tombstones (band, band_sig)          — buckets whose TOTAL n
#                                          exceeds LSH_BUCKET_CAP;
#                                          tiny by construction (only
#                                          degenerate buckets), so the
#                                          probe excludes them with a
#                                          BROADCAST anti-join
# Appends never rewrite rows; counts never require a recount; probes
# never aggregate the store.
# ---------------------------------------------------------------------------


_VERSION_PTR = "CURRENT"


def _versioned_current(root: str) -> str:
    """Resolve a versioned relation root to its live version directory
    (the one the CURRENT pointer names)."""
    with open(os.path.join(root, _VERSION_PTR)) as f:
        return os.path.join(root, f.read().strip())


def _versioned_publish(df: DataFrame, root: str) -> str:
    """Publish ``df`` as a NEW version directory under ``root`` and flip
    the one-line CURRENT pointer with ``os.replace`` — a single atomic
    file swap, so a concurrent reader resolves either the old version or
    the new one and NEVER observes an absent relation (the window a
    rmtree-then-rename swap of the live dir leaves open). Versions older
    than the immediately previous one are best-effort pruned — a reader
    can only be holding current-or-previous across one flip.

    Concurrency contract: any number of concurrent READERS, one
    MAINTAINER (the daily-refresh job — appends are inherently serial:
    each merge consumes the previous counts). Two concurrent publishers
    to the same root could prune each other's fresh version; that is a
    maintainer-discipline violation, not a crash/reader hazard."""
    import shutil
    import uuid

    os.makedirs(root, exist_ok=True)
    prev = None
    try:
        with open(os.path.join(root, _VERSION_PTR)) as f:
            prev = f.read().strip()
    except OSError:
        pass
    v = f"v-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(os.path.join(root, v))
    tmp = os.path.join(root, f".ptr-{os.getpid()}-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(v)
    os.replace(tmp, os.path.join(root, _VERSION_PTR))
    # keep current + the two newest predecessors (one is the guarantee;
    # the second is cheap slack for a reader straddling rapid flips),
    # prune the rest
    keep = {v, prev}
    others = sorted(
        (
            d
            for d in os.listdir(root)
            if d.startswith("v-") and d not in keep
        ),
        key=lambda d: os.path.getmtime(os.path.join(root, d)),
        reverse=True,
    )
    for d in others[1:]:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return os.path.join(root, v)


def store_counts(spark: SparkSession, counts_root: str) -> DataFrame:
    """The live (band, band_sig, n) counts relation."""
    return spark.read.parquet(_versioned_current(counts_root))


def store_tombstones(spark: SparkSession, tomb_root: str) -> DataFrame:
    """The live (band, band_sig) tombstone relation."""
    return spark.read.parquet(_versioned_current(tomb_root))


def store_lifecycle_init(
    spark: SparkSession, docs: DataFrame, db: str, base: str
) -> tuple[str, str, str]:
    """Build the three-relation store from a documents-shaped frame.
    Returns (rows_table, counts_root, tombstones_root) — counts and
    tombstones are VERSIONED relation roots (read them through
    :func:`store_counts` / :func:`store_tombstones`)."""
    rows_table = f"{db}.store_rows"
    counts_root = os.path.join(base, "counts")
    tomb_root = os.path.join(base, "tombstones")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {rows_table}")
    bands = _band_sigs_of(docs)
    (
        bands.write.mode("overwrite")
        .bucketBy(STORE_N_BUCKETS, "band", "band_sig")
        .sortBy("band", "band_sig")
        .option("path", os.path.join(base, "rows"))
        .saveAsTable(rows_table)
    )
    counts = (
        spark.table(rows_table)
        .groupBy("band", "band_sig")
        .agg(F.count("*").alias("n"))
    )
    _versioned_publish(counts, counts_root)
    _rewrite_tombstones(spark, counts_root, tomb_root)
    return rows_table, counts_root, tomb_root


def _rewrite_tombstones(
    spark: SparkSession, counts_root: str, tomb_root: str
) -> None:
    _versioned_publish(
        store_counts(spark, counts_root)
        .filter(F.col("n") > LSH_BUCKET_CAP)
        .select("band", "band_sig"),
        tomb_root,
    )


def store_lifecycle_append(
    spark: SparkSession,
    rows_table: str,
    counts_path: str,
    tomb_path: str,
    batch_docs: DataFrame,
) -> None:
    """Accept a batch into the store: append its bands (bucketed append
    preserves the layout — each append writes its own per-bucket
    files), MERGE its per-bucket counts into the counts relation with
    one sum (no recount of the store), and extend the tombstones with
    buckets the merge pushed past the cap. Tombstoning is monotone:
    once a bucket overflows it stays excluded — exactly the capped
    path's semantics, where an overflowed bucket's members are the
    group-dedup tier's job, not the pair join's.

    The counts swap is a pointer FLIP, not delete-then-rename: the
    merged relation lands in a fresh version dir and ``os.replace``
    swings the CURRENT pointer — a crash or concurrent probe at any
    instant resolves a complete counts relation (old or new), never
    nothing, and a crash before the flip leaks only an unreferenced
    version dir the next successful publish prunes."""
    batch_bands = _band_sigs_of(batch_docs)
    (
        batch_bands.write.mode("append")
        .bucketBy(STORE_N_BUCKETS, "band", "band_sig")
        .sortBy("band", "band_sig")
        .saveAsTable(rows_table)
    )
    old = store_counts(spark, counts_path)
    delta = batch_bands.groupBy("band", "band_sig").agg(
        F.count("*").alias("n")
    )
    merged = (
        old.unionByName(delta)
        .groupBy("band", "band_sig")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    _versioned_publish(merged, counts_path)
    _rewrite_tombstones(spark, counts_path, tomb_path)


def store_lifecycle_probe(
    spark: SparkSession,
    rows_table: str,
    tomb_path: str,
    batch_docs: DataFrame,
) -> DataFrame:
    """Probe an arriving batch against the lifecycle store: bucketed
    store scan (no Exchange), overflowed buckets excluded by a
    BROADCAST anti-join on the (tiny) tombstone relation, then the same
    bounded collect_set aggregation as the registered probe."""
    tomb = store_tombstones(spark, tomb_path)
    store = (
        spark.table(rows_table)
        .join(F.broadcast(tomb), ["band", "band_sig"], "left_anti")
        .alias("s")
    )
    batch = _band_sigs_of(batch_docs).alias("b")
    return (
        batch.join(
            store,
            (F.col("b.band") == F.col("s.band"))
            & (F.col("b.band_sig") == F.col("s.band_sig")),
            "left",
        )
        .groupBy(F.col("b.doc_id").alias("doc_id"))
        .agg(
            F.size(F.collect_set(F.col("s.doc_id")))
            .cast("long")
            .alias("n_store_matches"),
            F.coalesce(
                F.array_min(F.collect_set(F.col("s.doc_id"))), F.lit(-1)
            )
            .cast("long")
            .alias("min_store_doc"),
        )
    )


def _table_location(spark: SparkSession, table: str) -> str:
    """Filesystem path backing an external table (local-path form)."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r["col_name"].strip() == "Location":
            loc = r["data_type"].strip()
            return loc[len("file:"):] if loc.startswith("file:") else loc
    raise ValueError(f"no Location row for {table}")


def store_layout_stats(spark: SparkSession, rows_table: str) -> dict:
    """Files-per-bucket of the rows relation — the input to the
    compaction trigger band (SCALE.md r10: compact at ~16-32
    files/bucket, or when the appended-layout scan crosses ~1.5x the
    compacted scan)."""
    loc = _table_location(spark, rows_table)
    n = sum(
        1
        for dp, _, fs in os.walk(loc)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "n_files": n,
        "n_buckets": STORE_N_BUCKETS,
        "files_per_bucket": n / STORE_N_BUCKETS,
    }


def store_lifecycle_compact(spark: SparkSession, rows_table: str) -> None:
    """Rewrite the appended rows relation into ONE file per bucket —
    the periodic maintenance step the append-only layout needs (each
    bucketed append adds one file per task×bucket; SCALE.md r10
    measures the scan decay and the trigger band).

    Mechanics: read the RAW PARQUET PATH (reading the bucketed catalog
    table makes the planner drop the aligning repartition — observed
    175 output files instead of 8 on identical data), repartition onto
    the bucket hash (repartition and bucketing use the same Murmur3 →
    one task holds exactly one bucket → one file per bucket), write to
    a stage dir via a throwaway external table (DROP keeps the files),
    then swap: live dir renamed ASIDE, stage renamed in, REFRESH TABLE
    to invalidate the cached file listing.

    Concurrency contract (same as the versioned relations): one
    MAINTAINER — compaction is serial with appends in the daily loop.
    Cross-process readers mid-scan keep POSIX handles on the aside dir
    (reaped only after a day); probes PLANNED before the compaction in
    this session must be re-built after it (their cached listing names
    the old files). Rows are bit-identical — compaction evaluates no
    expressions.

    Crash window (ADVICE r11): the swap is TWO renames, not one — a
    SIGKILL between ``live→aside`` and ``stage→live`` leaves no live
    dir at ``loc`` (the in-process ``except OSError`` restore cannot
    run). The rows are never lost — they sit complete in the newest
    ``.stale-*`` sibling — and the next maintainer call recovers by
    ADOPTING that sibling (see the entry check below), mirroring how
    ``publish_derived_layout`` treats a partial dir as displaceable
    rather than fatal. Single-maintainer serialization makes the
    adoption race-free."""
    import shutil
    import uuid

    loc = _table_location(spark, rows_table)
    if not os.path.isdir(loc):
        # recover from a previous maintainer killed mid-swap: the
        # newest aside sibling holds the complete pre-swap rows
        parent_dir = os.path.dirname(loc)
        leaf = os.path.basename(loc)
        asides = sorted(
            (
                os.path.join(parent_dir, d)
                for d in os.listdir(parent_dir)
                if d.startswith(f"{leaf}.stale-")
            ),
            key=os.path.getmtime,
        )
        if not asides:
            raise RuntimeError(
                f"rows relation missing at {loc} and no .stale-* "
                "sibling to adopt — store needs a rebuild"
            )
        os.rename(asides[-1], loc)
        spark.sql(f"REFRESH TABLE {rows_table}")
    nonce = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
    stage = f"{loc}.compact-{nonce}"
    tmp_tbl = f"{rows_table}_compact_stage"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    (
        spark.read.parquet(loc)
        .repartition(STORE_N_BUCKETS, "band", "band_sig")
        .write.mode("overwrite")
        .bucketBy(STORE_N_BUCKETS, "band", "band_sig")
        .sortBy("band", "band_sig")
        .option("path", stage)
        .saveAsTable(tmp_tbl)
    )
    spark.sql(f"DROP TABLE {tmp_tbl}")  # external: files stay in stage
    aside = f"{loc}.stale-{nonce}"
    try:
        os.rename(loc, aside)
        os.rename(stage, loc)
    except OSError:
        # failed mid-swap: restore the live dir if it was moved aside
        if not os.path.isdir(loc) and os.path.isdir(aside):
            os.rename(aside, loc)
        shutil.rmtree(stage, ignore_errors=True)
        raise
    spark.sql(f"REFRESH TABLE {rows_table}")
    from ..sources.maintenance import reap_stale_siblings

    reap_stale_siblings(loc)


@register(
    "minhash_store_lifecycle_dedup",
    # Two-epoch replay: the oracle recomputes the FINAL store state
    # (init corpus + appended batch) from scratch — counts as one
    # recount, tombstones as merged-count > cap — while the Spark side
    # arrives at the same state INCREMENTALLY (bucketed append + one
    # count merge + tombstone extension). Any drift in the merge or
    # tombstone logic hash-mismatches.
    oracle=f"""
    WITH sigs AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
      SELECT doc_id,
             seed // {BAND_ROWS} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM sigs
      GROUP BY doc_id, band
    ),
    store AS (
      SELECT doc_id, band, band_sig FROM bands
      WHERE doc_id % {STORE_BATCH_MOD} <> 0
    ),
    counts AS (
      SELECT band, band_sig, count(*) AS n FROM store GROUP BY band, band_sig
    ),
    tomb AS (
      SELECT band, band_sig FROM counts WHERE n > {LSH_BUCKET_CAP}
    ),
    batch AS (
      SELECT doc_id, band, band_sig FROM bands
      WHERE doc_id % {STORE_BATCH_MOD} = 0
    ),
    live AS (
      SELECT s.* FROM store s
      WHERE NOT EXISTS (SELECT 1 FROM tomb t
                        WHERE t.band = s.band AND t.band_sig = s.band_sig)
    ),
    probe AS (
      SELECT b.doc_id AS doc_id,
             CAST(count(DISTINCT l.doc_id) AS BIGINT) AS n_store_matches,
             CAST(coalesce(min(l.doc_id), -1) AS BIGINT) AS min_store_doc,
             CAST(count(l.doc_id) > 0 AS BIGINT) AS is_near_dup
      FROM batch b
      LEFT JOIN live l ON b.band = l.band AND b.band_sig = l.band_sig
      GROUP BY b.doc_id
    ),
    tombhits AS (
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tomb_bands
      FROM batch b
      JOIN tomb t ON b.band = t.band AND b.band_sig = t.band_sig
      GROUP BY b.doc_id
    )
    SELECT p.doc_id AS doc_id,
           p.n_store_matches AS n_store_matches,
           p.min_store_doc AS min_store_doc,
           CAST(coalesce(th.n_tomb_bands, 0) AS BIGINT) AS n_tomb_bands,
           p.is_near_dup AS is_near_dup
    FROM probe p LEFT JOIN tombhits th ON p.doc_id = th.doc_id
    """,
    tags=("dedup", "minhash", "incremental", "store", "lifecycle"),
)
def minhash_store_lifecycle_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature store's DAILY-REFRESH loop as one registered query
    (VERDICT r9 task 4 — the registered probe covers only the
    build-once shape; this is the production maintenance contract from
    SCALE.md "r9: signature store"):

    1. **init** the three-relation store from the day-0 corpus
       (doc_id % {STORE_BATCH_MOD} ∉ {{0, 1}});
    2. **append** the day-1 batch (doc_id % MOD == 1): bucketed
       row append + ONE map-side-combinable count merge (no recount)
       + tombstone extension for buckets the merge pushed past
       LSH_BUCKET_CAP;
    3. **compact** (VERDICT r10 task 3 — the r10 formulation stopped
       at pytest evidence for this step): assert via
       :func:`store_layout_stats` that the append FRAGMENTED the
       layout (> 1 file/bucket), run :func:`store_lifecycle_compact`,
       and assert exactly ONE file per bucket remains. Rows are
       bit-identical by contract, so the two-epoch oracle is
       unchanged — which is precisely what makes the compaction path
       driver-hashable: a compaction that altered ANY row, dropped a
       bucket, or broke the probe's Exchange-free scan would
       hash-mismatch or raise here;
    4. **probe** the day-2 batch (doc_id % MOD == 0) against the
       compacted store, overflowed buckets excluded by a broadcast
       anti-join on the tombstones.

    Output per probe doc: distinct store matches, earliest match (-1
    when clean), how many of its bands hit TOMBSTONED buckets (the
    overflow path's visible effect), and the near-dup verdict.

    100 TB shape: identical to the lifecycle API it drives — appends
    never rewrite rows, counts never recount the store, probes never
    aggregate it, the counts/tombstone swaps are atomic pointer
    flips a concurrent probe can never observe mid-swap, and
    compaction is the measured-trigger maintenance step (SCALE.md r10
    band: ~16-32 files/bucket), serial with appends. Each call runs
    a fresh lifecycle under a uuid-keyed tmp dir (no cross-process
    contention by construction). The result is materialized with an
    eager ``localCheckpoint`` so the per-call database and data dirs
    can be dropped IMMEDIATELY (ADVICE r10: per-call uuid databases
    used to accumulate as dangling catalog entries pointing at reaped
    paths); day-old dirs from crashed calls are still reaped at call
    start."""
    import shutil
    import tempfile
    import time
    import uuid

    parent = os.path.join(tempfile.gettempdir(), "braintumor_store_lc")
    os.makedirs(parent, exist_ok=True)
    for d in os.listdir(parent):  # reap abandoned lifecycles (>1 day)
        p = os.path.join(parent, d)
        try:
            if time.time() - os.path.getmtime(p) > 86400:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    tag = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
    base = os.path.join(parent, tag)
    db = f"store_lc_{tag}"

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    epoch = F.col("doc_id") % STORE_BATCH_MOD
    day0 = docs.filter((epoch != 0) & (epoch != 1))
    day1 = docs.filter(epoch == 1)
    day2 = docs.filter(epoch == 0)

    try:
        rows_t, counts_p, tomb_p = store_lifecycle_init(spark, day0, db, base)
        store_lifecycle_append(spark, rows_t, counts_p, tomb_p, day1)

        frag = store_layout_stats(spark, rows_t)
        if frag["files_per_bucket"] <= 1.0:
            raise RuntimeError(
                f"append did not fragment the layout: {frag} — the "
                "compaction step below would be vacuous"
            )
        store_lifecycle_compact(spark, rows_t)
        compacted = store_layout_stats(spark, rows_t)
        # AT MOST one file per bucket, not exactly STORE_N_BUCKETS files:
        # a bucketed write emits NO file for an empty (band, band_sig)
        # hash bucket, so an SF where some bucket is empty would fail an
        # equality assert for layout reasons, not correctness (ADVICE
        # r11). files_per_bucket <= 1.0 is the compaction contract.
        if not 0 < compacted["n_files"] <= STORE_N_BUCKETS:
            raise RuntimeError(
                f"compaction must leave at most one file per bucket "
                f"(and a non-empty store at least one): {compacted}"
            )

        probe = store_lifecycle_probe(spark, rows_t, tomb_p, day2)
        tomb = store_tombstones(spark, tomb_p)
        tomb_hits = (
            _band_sigs_of(day2)
            .join(F.broadcast(tomb), ["band", "band_sig"])
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tomb_bands"))
        )
        out = probe.join(tomb_hits, ["doc_id"], "left").select(
            "doc_id",
            "n_store_matches",
            "min_store_doc",
            F.coalesce(F.col("n_tomb_bands"), F.lit(0))
            .cast("long")
            .alias("n_tomb_bands"),
            (F.col("n_store_matches") > 0).cast("long").alias("is_near_dup"),
        )
        # The eager checkpoint below replaces the returned plan with an
        # RDD scan, so tools/plan_audit.py cannot see the probe's real
        # shape — assert it HERE, on every execution (stronger than the
        # audit: a probe plan that regrew a store-side Exchange or lost
        # the bucketed scan fails the driver gate, not just a review):
        plan = out._jdf.queryExecution().executedPlan().toString()
        if f"SelectedBucketsCount: {STORE_N_BUCKETS} " not in plan:
            raise RuntimeError(
                "lifecycle probe lost its bucketed store scan "
                "(no SelectedBucketsCount in plan)"
            )
        # eager: severs lineage from the catalog tables so the finally
        # below can reclaim them; output is one bounded row per probe doc
        return out.localCheckpoint(eager=True)
    finally:
        # cleanup must never mask an in-flight exception (a dead
        # session makes DROP DATABASE itself raise — the original
        # error is the diagnosis)
        try:
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        except Exception:
            pass
        shutil.rmtree(base, ignore_errors=True)
