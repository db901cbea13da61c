"""Training-data pipeline operators over ``documents`` (north-star N*):
deterministic sampling, train/test splitting, PII masking, fixed-size
chunking with overlap, and a column-profiling pass.

The reference has no text surface at all (its ETL is image-only,
`/root/reference/dataflow_pipeline.py:68-110`); these are the standard
LLM-corpus preparation stages, each expressed as pure built-in
DataFrame ops so they run JVM-side at 100 TB:

- **hash sampling / splits** use md5(doc_id) — content-independent,
  deterministic, reproducible across engines and runs (never
  ``rand()``, which cannot be oracle-checked and resamples per retry);
- **PII masking** is regexp_replace (codegen) — no UDF;
- **chunking** is sequence+explode over token offsets: one shuffle-free
  narrow fan-out, linear in corpus size, and each chunk carries
  provenance (doc_id, chunk_id, token span);
- **profiling** is a single aggregate pass computing per-column
  null/distinct/extremes (the pre-training sanity scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import dec_sum
from ..caching import persist_tracked
from ..registry import register
from ..sources.fixtures import load_table as _t


@register(
    "hash_sample_documents",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
    """,
    tags=("sampling", "filter"),
)
def hash_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample: md5(doc_id) prefix below '1a' (26/256).
    Reproducible, engine-independent, and — unlike rand(seed) — stable
    under retries, repartitions, and speculative execution."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    ).select("doc_id", "lang", "n_chars")


@register(
    "train_test_split_documents",
    oracle="""
    SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT CASE
               WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
               THEN 'train' ELSE 'test'
             END AS split,
             n_chars
      FROM documents
    )
    GROUP BY split
    """,
    tags=("sampling", "agg"),
)
def train_test_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~81/19 train/test split on the same hash (first hex digit < 'd'):
    membership is a pure function of the key, so the split is identical
    on every engine, every run, and under any parallelism."""
    d = _t(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "d",
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "pii_mask_documents",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g'),
             '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS masked,
           length(text) -
             length(regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '', 'g'),
                 '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '', 'g'),
               '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '', 'g')) AS masked_chars
    FROM documents
    """,
    tags=("text", "projection"),
)
def pii_mask_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: email, phone-shaped, and IPv4-shaped spans →
    placeholder tokens, plus how many characters were redacted — all
    regexp_replace, fully codegen, no UDF. (The fixture corpus has no
    real PII; the operator is the point, and masked_chars counts
    whatever matched.)"""
    d = _t(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9()\- ]{7,}[0-9]"
    ip = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

    def scrub(col, repl_email, repl_phone, repl_ip):
        out = F.regexp_replace(col, email, repl_email)
        out = F.regexp_replace(out, phone, repl_phone)
        return F.regexp_replace(out, ip, repl_ip)

    masked = scrub(F.col("text"), "<EMAIL>", "<PHONE>", "<IP>")
    stripped = scrub(F.col("text"), "", "", "")
    return d.select(
        "doc_id",
        masked.alias("masked"),
        (F.length("text") - F.length(stripped)).alias("masked_chars"),
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap


@register(
    "doc_chunks_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, t,
             unnest(range(0,
               greatest(len(t) - {CHUNK_TOKENS} + {CHUNK_STRIDE}, 1),
               {CHUNK_STRIDE})) AS start0
      FROM toks
    )
    SELECT doc_id,
           CAST(start0 / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           start0 AS tok_start,
           array_to_string(t[start0 + 1 : start0 + {CHUNK_TOKENS}], ' ')
             AS chunk_text
    FROM spans
    """,
    tags=("text", "chunking"),
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking with overlap (32-token windows, stride 24):
    tokens → sequence of start offsets → explode → slice. Narrow
    (shuffle-free) fan-out; each chunk keeps (doc_id, chunk_id,
    tok_start) provenance for downstream dedup/packing stages."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    # same start set as the oracle: range(0, max(n-K+S, 1), S)
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - CHUNK_TOKENS + CHUNK_STRIDE, F.lit(1)) - 1,
        F.lit(CHUNK_STRIDE),
    )
    return (
        toks.select("doc_id", "t", F.explode(starts).alias("tok_start"))
        .select(
            "doc_id",
            (F.col("tok_start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            "tok_start",
            F.concat_ws(
                " ", F.slice("t", F.col("tok_start") + 1, CHUNK_TOKENS)
            ).alias("chunk_text"),
        )
    )


@register(
    "profile_lineitem_columns",
    oracle="""
    SELECT 'l_quantity' AS col, count(*) AS n,
           count(*) - count(l_quantity) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           round(min(l_quantity), 6) AS min_v,
           round(max(l_quantity), 6) AS max_v,
           round(avg(l_quantity), 4) AS mean_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           round(min(l_extendedprice), 6),
           round(max(l_extendedprice), 6),
           round(avg(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           count(*) - count(l_discount),
           count(DISTINCT l_discount),
           round(min(l_discount), 6),
           round(max(l_discount), 6),
           round(avg(l_discount), 4)
    FROM lineitem
    """,
    tags=("profiling", "agg"),
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the pre-training data sanity scan): null count,
    distinct count, min/max/mean per numeric column — one aggregate
    per column batched into a single job via unionByName (Spark shares
    the scan; at scale swap exact distinct for approx_count_distinct)."""
    li = _t(spark, sf_dir, "lineitem")

    def prof(c: str) -> DataFrame:
        return li.agg(
            F.lit(c).alias("col"),
            F.count("*").alias("n"),
            (F.count("*") - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.round(F.min(c), 6).alias("min_v"),
            F.round(F.max(c), 6).alias("max_v"),
            F.round(F.avg(c), 4).alias("mean_v"),
        )

    out = prof("l_quantity")
    for c in ("l_extendedprice", "l_discount"):
        out = out.unionByName(prof(c))
    return out


PACK_BUDGET = 128  # tokens per training sequence


@register(
    "chunk_packing_greedy",
    # The greedy fill is a linear recurrence in (fill, pack_id) over
    # docs ordered by doc_id within source — the DuckDB oracle replays
    # it step-by-step with a recursive CTE (the region_grow_capped
    # list-state technique), one recursion level per document.
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk AS (
      SELECT source, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS pack_id,
             CAST(n_tokens AS BIGINT) AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET}
                  THEN w.pack_id + 1 ELSE w.pack_id END,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET}
                  THEN CAST(d.n_tokens AS BIGINT)
                  ELSE w.fill + d.n_tokens END
      FROM walk w
      JOIN d ON d.source = w.source AND d.rn = w.rn + 1
    )
    SELECT source, pack_id, doc_id, n_tokens FROM walk
    """,
    tags=("text", "packing", "udf"),
)
def chunk_packing_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedily fill 128-token training sequences with
    whole documents, never splitting one (oversize docs get a pack of
    their own). Greedy fill is inherently sequential-stateful — the
    distributed axis is the ``source`` key (packs never cross sources),
    the per-group fill runs in applyInPandas ordered by doc_id
    (deterministic); the oracle replays the same recurrence as a
    recursive CTE, upgrading this from rows-only to hash-checked.
    Invariants (budget respected, order preserved, determinism) are
    additionally pinned in tests.

    At scale: grouping key count ≈ corpora/shards, so parallelism comes
    from sharding the corpus (e.g. pack per (source, doc_id div N));
    state per group is one integer — nothing accumulates.
    """
    import pandas as pd

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, fill, pid = [], 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > PACK_BUDGET:
                pid += 1
                fill = 0
            pack_ids.append(pid)
            fill += int(n)
        out = pdf.assign(pack_id=pack_ids)
        return out[["source", "pack_id", "doc_id", "n_tokens"]]

    return d.groupBy("source").applyInPandas(
        pack, schema="source string, pack_id long, doc_id long, n_tokens int"
    )


@register(
    "corpus_prep_end_to_end",
    oracle=f"""
    WITH kept AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
    ),
    quality AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN kept k ON d.doc_id = k.doc_id
      WHERE d.n_chars >= 30
    ),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM quality
    ),
    chunks AS (
      SELECT doc_id,
             unnest(range(0,
               greatest(len(t) - {CHUNK_TOKENS} + {CHUNK_STRIDE}, 1),
               {CHUNK_STRIDE})) AS start0
      FROM toks
    )
    SELECT CASE
             WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
             THEN 'train' ELSE 'test'
           END AS split,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks
    FROM chunks
    GROUP BY split
    """,
    tags=("text", "dedup", "chunking", "sampling", "agg"),
)
def corpus_prep_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-preparation pipeline — every stage a proven
    operator, chained as one lazy plan so Catalyst fuses the narrow
    stages and the only shuffles are the dedup groupBy and the final
    split aggregate:

      normalized exact-dedup (keep min doc_id)
      → quality gate (n_chars ≥ 30)
      → chunk 32/24
      → deterministic train/test split
      → per-split doc & chunk counts
    """
    d = _t(spark, sf_dir, "documents")
    norm_hash = F.md5(
        F.trim(F.regexp_replace(F.lower("text"), " +", " "))
    )
    kept = (
        d.select("doc_id", norm_hash.alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    quality = (
        d.join(kept, "doc_id", "left_semi")
        .filter(F.col("n_chars") >= 30)
        .select("doc_id", F.split("text", " ").alias("t"))
    )
    n = F.size("t")
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - CHUNK_TOKENS + CHUNK_STRIDE, F.lit(1)) - 1,
        F.lit(CHUNK_STRIDE),
    )
    chunks = quality.select(
        "doc_id", F.explode(starts).alias("tok_start")
    )
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "d",
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return (
        chunks.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
        )
    )


@register(
    "stratified_sample_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_sampled,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sampled_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)
          < CASE WHEN c_mktsegment = 'BUILDING' THEN '33' ELSE '0d' END
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sampling", "join", "agg"),
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: ~20% of BUILDING-segment
    orders, ~5% of every other segment (per-stratum md5 thresholds —
    51/256 and 13/256). Same reproducibility argument as
    hash_sample_documents, but with per-group rates, the shape used to
    rebalance source mix in a training corpus. Unlike df.sampleBy, the
    hash predicate is engine-independent and pushable below the join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    thresh = F.when(F.col("c_mktsegment") == "BUILDING", "33").otherwise("0d")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
            < thresh
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_sampled"),
            dec_sum("o_totalprice").alias("sampled_value"),
        )
        .orderBy("c_mktsegment")
    )


SEG_TOKENS = 16  # fixed segment width (stand-in for newline lines)


@register(
    "line_dedup_documents",
    # The oracle replays the identical pipeline relationally: segment,
    # hash, corpus df + canonical keeper, filter, reassemble in order.
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    seg0 AS (
      SELECT doc_id, toks,
             unnest(range((len(toks) + {SEG_TOKENS - 1}) // {SEG_TOKENS}))
               AS i
      FROM t
    ),
    seg AS (
      SELECT doc_id, CAST(i AS INT) AS pos,
             array_to_string(
               toks[(i * {SEG_TOKENS} + 1):(i * {SEG_TOKENS} + {SEG_TOKENS})],
               ' ') AS seg
      FROM seg0
    ),
    hs AS (
      SELECT doc_id, pos, seg,
             ('0x' || substr(md5(seg), 1, 15))::BIGINT AS h
      FROM seg
    ),
    stats AS (SELECT h, count(*) AS df, min(doc_id) AS keeper
              FROM hs GROUP BY h),
    kept AS (
      SELECT s.doc_id, s.pos, s.seg
      FROM hs s JOIN stats st USING (h)
      WHERE st.df = 1 OR s.doc_id = st.keeper
    ),
    totals AS (SELECT doc_id, count(*) AS n_segments FROM seg
               GROUP BY doc_id),
    ka AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(seg, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_segments,
           t.n_segments - coalesce(ka.n_kept, 0) AS n_removed,
           coalesce(ka.clean_text, '') AS clean_text
    FROM totals t LEFT JOIN ka USING (doc_id)
    """,
    tags=("text", "dedup", "corpus"),
)
def line_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style cross-corpus line dedup: drop every repeated line
    except ONE canonical survivor (the min-doc_id occurrence), then
    reassemble each document preserving line order. The fixture corpus
    has no newlines, so the "line" here is a fixed 16-token segment —
    the plumbing (segment with position, corpus-wide df on a 60-bit
    segment hash, keeper join, ordered reassembly) is exactly the
    newline-line pipeline a 100 TB corpus runs.

    Scale shape: both shuffles key on the content hash (uniform, 8-byte
    keys); the doc-order reassembly groups by doc_id once; the wide text
    column only travels exploded as its segments, never joined whole.
    A doc whose every line is dropped still yields a row (empty
    clean_text), so downstream counts stay honest.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n_seg = F.expr(f"(size(t) + {SEG_TOKENS - 1}) div {SEG_TOKENS}")
    segs = F.transform(
        F.sequence(F.lit(0), (n_seg - 1).cast("int")),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("t"), i * SEG_TOKENS + 1, SEG_TOKENS)
        ),
    )
    exploded = toks.select(
        "doc_id", F.posexplode(segs).alias("pos", "seg")
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("seg")), 1, 15), 16, 10).cast("bigint"),
    )
    stats = exploded.groupBy("h").agg(
        F.count("*").alias("df"), F.min("doc_id").alias("keeper")
    )
    kept = exploded.join(stats, "h").filter(
        (F.col("df") == 1) | (F.col("doc_id") == F.col("keeper"))
    )
    totals = exploded.groupBy("doc_id").agg(
        F.count("*").alias("n_segments")
    )
    ka = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s.seg,
            ),
        ).alias("clean_text"),
    )
    return totals.join(ka, "doc_id", "left").select(
        "doc_id",
        "n_segments",
        (F.col("n_segments") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


@register(
    "decontamination_scan",
    # Same hash split rule as train_test_split_documents; segment
    # machinery shared with line_dedup_documents. Oracle replays both.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' AS is_train
      FROM documents
    ),
    seg0 AS (
      SELECT doc_id, is_train, toks,
             unnest(range((len(toks) + {SEG_TOKENS - 1}) // {SEG_TOKENS}))
               AS i
      FROM d
    ),
    seg AS (
      SELECT doc_id, is_train,
             ('0x' || substr(md5(array_to_string(
                toks[(i * {SEG_TOKENS} + 1):(i * {SEG_TOKENS} + {SEG_TOKENS})],
                ' ')), 1, 15))::BIGINT AS h
      FROM seg0
    ),
    train_h AS (SELECT DISTINCT h FROM seg WHERE is_train),
    test_seg AS (SELECT doc_id, h FROM seg WHERE NOT is_train)
    SELECT t.doc_id,
           count(*) AS n_segments,
           CAST(sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_contaminated,
           sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*) AS contamination_rate
    FROM test_seg t LEFT JOIN train_h tr ON tr.h = t.h
    GROUP BY t.doc_id
    """,
    tags=("text", "dedup", "corpus"),
)
def decontamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination scan: for every TEST-split document
    (same md5 hash rule as ``train_test_split_documents``), how many of
    its 16-token segments also occur anywhere in the TRAIN split — the
    pre-release leakage check every training corpus runs against its
    eval sets. The segment unit and 60-bit hashing are shared with
    ``line_dedup_documents``.

    Scale shape: the train side reduces to DISTINCT segment hashes
    (8-byte keys) before the join, the join keys on the content hash
    (uniform), and the test side aggregates per doc — text never joins
    whole. At real scale the train-hash relation is the big side and
    the eval sets are small: the same plan broadcast-joins the eval
    segments instead, unchanged semantics.
    """
    d = _t(spark, sf_dir, "documents")
    is_train = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "d"
    )
    toks = d.select(
        "doc_id", is_train.alias("is_train"), F.split("text", " ").alias("t")
    )
    n_seg = F.expr(f"(size(t) + {SEG_TOKENS - 1}) div {SEG_TOKENS}")
    segs = F.transform(
        F.sequence(F.lit(0), (n_seg - 1).cast("int")),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("t"), i * SEG_TOKENS + 1, SEG_TOKENS)
        ),
    )
    seg = toks.select(
        "doc_id",
        "is_train",
        F.explode(segs).alias("seg"),
    ).select(
        "doc_id",
        "is_train",
        F.conv(F.substring(F.md5(F.col("seg")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    train_h = seg.filter("is_train").select("h").distinct()
    test_seg = seg.filter(~F.col("is_train")).select("doc_id", "h")
    joined = test_seg.join(
        train_h.withColumn("hit", F.lit(1)), "h", "left"
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) * F.lit(1.0)
            / F.count("*")
        ).alias("contamination_rate"),
    )


# Language-mix weights for ``domain_mix_resample`` — illustrative of an
# LLM pre-training mixture: downsample the over-represented head
# language, upsample the tails past 1 epoch. Fractional parts are
# hash-thresholded at 1/256 granularity (2 hex chars of md5).
MIX_WEIGHTS = {"en": 0.5, "zh": 2.25, "es": 1.5, "de": 1.0, "fr": 3.0}


@register(
    "domain_mix_resample",
    oracle="""
    WITH w AS (
      SELECT * FROM (VALUES
        ('en', 0, 128), ('zh', 2, 64), ('es', 1, 128),
        ('de', 1, 0), ('fr', 3, 0)
      ) AS t(lang, full_epochs, frac_256)
    ),
    reps AS (
      SELECT d.doc_id, d.lang, e.epoch
      FROM documents d
      JOIN w USING (lang),
           (SELECT unnest(range(4)) AS epoch) e
      WHERE e.epoch < w.full_epochs
         OR (e.epoch = w.full_epochs
             AND substring(md5(CAST(d.doc_id AS VARCHAR) || ':'
                               || CAST(e.epoch AS VARCHAR)), 1, 2)
                 < substring(to_hex(256 + w.frac_256), 2, 2))
    )
    SELECT doc_id, lang, CAST(epoch AS INT) AS epoch FROM reps
    """,
    tags=("sampling", "join"),
)
def domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture resampling: each language gets a target weight
    (``MIX_WEIGHTS``); weight w emits floor(w) full copies (epochs
    0..floor(w)−1) plus a deterministic hash-thresholded sample of rate
    frac(w) as the final partial epoch — the standard up/down-sampling
    a data-mixing stage performs before sequence packing. Languages
    outside the weight table are dropped (weight 0).

    Determinism at scale: the partial-epoch membership test is
    md5(doc_id:epoch) against a 1/256-granular threshold — reproducible
    under retries/speculation (the hash_sample_documents argument), and
    the epoch fan-out is a broadcast join against a 5-row weight dim +
    a 4-row epoch range, so the fact side never shuffles at all."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    rows = []
    for lang, w in MIX_WEIGHTS.items():
        full = int(w)
        frac256 = int(round((w - full) * 256))
        rows.append((lang, full, frac256))
    wdf = spark.createDataFrame(
        rows, "lang string, full_epochs int, frac_256 int"
    )
    # epoch fan-out as a literal-array explode (a generator, not a
    # BroadcastNestedLoopJoin — keeps the plan audit's cartesian scan
    # clean and the fact side join-free)
    epochs = F.explode(
        F.array(*[F.lit(i) for i in range(4)])
    ).alias("epoch")
    thresh = F.substring(
        F.hex(F.lit(256) + F.col("frac_256")).cast("string"), 2, 2
    )
    # Spark hex() uppercases; md5() is lowercase hex — normalize so the
    # lexicographic threshold compare matches DuckDB's to_hex (lower)
    thresh = F.lower(thresh)
    keep = (F.col("epoch") < F.col("full_epochs")) | (
        (F.col("epoch") == F.col("full_epochs"))
        & (
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("epoch").cast("string"),
                    )
                ),
                1,
                2,
            )
            < thresh
        )
    )
    return (
        d.join(F.broadcast(wdf), "lang")
        .select("doc_id", "lang", "full_epochs", "frac_256", epochs)
        .filter(keep)
        .select("doc_id", "lang", "epoch")
    )


@register(
    "stratified_exact_k_sample",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('sk|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= 10
    """,
    tags=("sampling", "window", "topk"),
)
def stratified_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum deterministic sampling: within each language
    the 10 docs with the SMALLEST md5 rank — the sample is uniform in
    distribution but a pure function of the data, so retries,
    speculation, and re-runs of a 100 TB job select identical rows
    (the property `rand()`-based sampling loses). The per-stratum
    window is the top-k shape: a per-partition heap of k rows per
    stratum, never a global sort. Complements the rate-based
    `hash_sample_documents` / `stratified_sample_orders` (fraction
    deterministic, size binomial) with the exact-size variant."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("sk|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )


@register(
    "weighted_sample_wor",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                 + 1.0) / 4503599627370497.0) / n_chars AS k
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, round(k * 1000.0, 6) AS sample_key_milli
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT 200
    """,
    tags=("sampling", "topk"),
)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis: each
    doc draws u ~ Uniform(0,1) and keeps key u^(1/w) (w = n_chars, so
    longer docs are proportionally likelier); the top-k keys ARE a
    weighted sample without replacement. Ranking by ln(u)/w is the
    monotone-equivalent, overflow-free form. u comes from md5(doc_id)'s
    first 13 hex digits mapped into (0,1) — 16^13 = 2^52 so numerator
    and denominator are exact doubles — making the sample a pure
    function of the key: identical on any engine, under retries and
    speculative execution, with no rand() in the plan. The top-k is a
    distributed TakeOrdered (no global sort); ties break on doc_id.
    This is the mixture-sampling primitive for length-weighted corpus
    draws (contrast hash_sample_documents: unweighted)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        + 1.0
    ) / F.lit(4503599627370497.0)
    keyed = d.select(
        "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("k")
    )
    return (
        keyed.orderBy(F.desc("k"), "doc_id")
        .limit(200)
        .select(
            "doc_id",
            "n_chars",
            F.round(F.col("k") * 1000.0, 6).alias("sample_key_milli"),
        )
    )


@register(
    "filter_cascade_report",
    oracle="""
    WITH tagged AS (
      SELECT n_chars,
             CASE
               WHEN n_chars < 120 THEN 'too_short'
               WHEN lang = 'zh' THEN 'lang_filtered'
               WHEN len(string_split(text, ' ')) <= 20 THEN 'too_few_tokens'
               WHEN 5 * length(regexp_replace(text, '[^0-9]', '', 'g'))
                    > n_chars THEN 'digit_heavy'
               ELSE 'admitted'
             END AS reason
      FROM documents
    ),
    totals AS (SELECT count(*) AS total FROM tagged)
    SELECT CASE reason
             WHEN 'too_short' THEN 1 WHEN 'lang_filtered' THEN 2
             WHEN 'too_few_tokens' THEN 3 WHEN 'digit_heavy' THEN 4
             ELSE 5 END AS stage,
           reason,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           round(count(*) * 100.0 / (SELECT total FROM totals), 6)
             AS share_pct
    FROM tagged GROUP BY reason
    """,
    tags=("filter", "quality", "corpus"),
)
def filter_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter cascade observability: every document is
    attributed to the FIRST rule that kills it (fixed rule order →
    deterministic attribution, the way production pipelines report
    'why did 40% of my crawl disappear'), with per-reason doc counts,
    char volume, and share. One pass, one aggregate — rules are plain
    codegen predicates; the total arrives as a broadcast scalar
    subquery, not a driver round trip. Rules here are fixture-scaled
    stand-ins (length floor, language allowlist, token floor, digit
    ratio) for the fasttext/KenLM tiers a real corpus uses — the
    attribution algebra is what the operator owns."""
    d = _t(spark, sf_dir, "documents")
    n_digits = F.length(F.regexp_replace("text", "[^0-9]", ""))
    reason = (
        F.when(F.col("n_chars") < 120, "too_short")
        .when(F.col("lang") == "zh", "lang_filtered")
        .when(F.size(F.split("text", " ")) <= 20, "too_few_tokens")
        .when(5 * n_digits > F.col("n_chars"), "digit_heavy")
        .otherwise("admitted")
    )
    stage = (
        F.when(F.col("reason") == "too_short", 1)
        .when(F.col("reason") == "lang_filtered", 2)
        .when(F.col("reason") == "too_few_tokens", 3)
        .when(F.col("reason") == "digit_heavy", 4)
        .otherwise(5)
    )
    tagged = d.select("n_chars", reason.alias("reason"))
    total = tagged.agg(F.count("*").alias("total"))
    return (
        tagged.groupBy("reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            stage.alias("stage"),
            "reason",
            "n_docs",
            "sum_chars",
            F.round(F.col("n_docs") * 100.0 / F.col("total"), 6).alias(
                "share_pct"
            ),
        )
    )


@register(
    "k_anonymity_report",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
             count(*) AS cell_n
      FROM documents
      GROUP BY lang, source, len_bucket
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(sum(CASE WHEN cell_n < k THEN 1 ELSE 0 END) AS BIGINT)
             AS cells_below_k,
           CAST(sum(CASE WHEN cell_n < k THEN cell_n ELSE 0 END) AS BIGINT)
             AS docs_below_k
    FROM cells, (VALUES (2), (5), (10)) AS ks(k)
    GROUP BY k
    """,
    tags=("privacy", "agg", "quality"),
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before releasing a corpus: bucket every
    document into its quasi-identifier cell (lang × source × length
    centile) and report, for each candidate k, how many cells — and
    how many documents — sit in groups smaller than k (those are the
    re-identifiable ones a release would suppress or generalize). One
    aggregation over the corpus, then a tiny cells×k cross of a 3-row
    literal — the k spine is a plan constant, not a data join. All
    integers; at 100 TB the cell relation is bounded by the
    quasi-identifier domain, not the corpus."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        "source",
        F.expr("n_chars div 100").alias("len_bucket"),
    ).agg(F.count("*").alias("cell_n"))
    ks = F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k")
    return (
        cells.select(ks, "cell_n")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("cell_n") < F.col("k"), 1).otherwise(0)).alias(
                "cells_below_k"
            ),
            F.sum(
                F.when(F.col("cell_n") < F.col("k"), F.col("cell_n")).otherwise(
                    0
                )
            ).alias("docs_below_k"),
        )
        .select(F.col("k").cast("long").alias("k"), "cells_below_k",
                "docs_below_k")
    )


@register(
    "linear_quality_classifier_scores",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    feat AS (
      -- hashing trick: token → one of 1024 feature buckets
      SELECT doc_id,
             ('0x' || substr(md5('feat|' || token), 1, 6))::BIGINT % 1024
               AS bucket,
             count(*) AS tf
      FROM tok GROUP BY doc_id, ('0x' || substr(md5('feat|' || token),
                                 1, 6))::BIGINT % 1024
    ),
    -- deterministic dyadic weights in [-128, 127]/256: exact in binary,
    -- so tf·w sums have no float rounding at all
    weighted AS (
      SELECT doc_id,
             CAST(sum(tf * ((('0x' || substr(md5('w|' ||
                      CAST(bucket AS VARCHAR)), 1, 4))::BIGINT % 256)
                      - 128)) AS BIGINT) AS raw256,
             CAST(sum(tf) AS BIGINT) AS n_tok
      FROM feat GROUP BY doc_id
    )
    -- score = raw256 / (256·n_tok) rounded to 6 decimals IN INTEGER
    -- SPACE (half away from zero on BIGINTs): the rational can land
    -- exactly on a .5 tie at the 6th decimal (e.g. -406/6400 =
    -- -0.0634375 at sf0.1), where double round() tie-handling diverges
    -- between engines; floor((2·|10^6·raw256| + den) // (2·den)) is
    -- engine-identical exact arithmetic, then ONE IEEE division by 1e6
    SELECT doc_id,
           n_tok AS n_tokens,
           CAST(CASE WHEN raw256 < 0 THEN -1 ELSE 1 END
                * ((2 * abs(1000000 * raw256) + 256 * n_tok)
                   // (2 * 256 * n_tok)) AS DOUBLE) / 1e6 AS score,
           CAST(CASE WHEN raw256 > 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM weighted
    ORDER BY doc_id
    """,
    tags=("text", "quality", "classifier", "agg"),
)
def linear_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering plumbing (the fastText-classifier
    stage of CCNet/RefinedWeb-style pipelines) as pure engine algebra:
    hashing-trick features (md5 → 1024 buckets), a broadcast-scale
    linear model whose weights here are md5-derived dyadic rationals
    (k/256 — EXACT in binary, so the dot product is an integer sum;
    swap in real trained weights as a 1024-row broadcast table and the
    plan is unchanged), per-doc mean-pooled score and a keep/drop
    decision. Two partial-aggregable shuffles; the model never leaves
    the closure."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("feat|"), F.col("token"))), 1, 6),
            16,
            10,
        ).cast("long")
        % 1024
    )
    feat = tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("tf")
    )
    weight = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w|"), F.col("bucket").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 256
    ) - 128
    weighted = feat.groupBy("doc_id").agg(
        F.sum(F.col("tf") * weight).alias("raw256"),
        F.sum("tf").alias("n_tok"),
    )
    # 6-decimal rounding done in exact BIGINT space (half away from
    # zero), then ONE IEEE division to present: the rational
    # raw256/(256·n_tok) can land exactly on a .5 tie at the 6th
    # decimal (sf0.1 doc 1982: -406/6400 = -0.0634375), where
    # double-based round() tie-handling diverges across engines.
    # |2·10⁶·raw256| ≤ 2.56·10⁸·n_tok — BIGINT-safe to n_tok ~ 3·10¹⁰.
    score_fix = F.when(F.col("raw256") < 0, -1).otherwise(1) * F.expr(
        "(2 * abs(1000000 * raw256) + 256 * n_tok) div (2 * 256 * n_tok)"
    )
    return weighted.select(
        "doc_id",
        F.col("n_tok").alias("n_tokens"),
        (score_fix.cast("double") / F.lit(1e6)).alias("score"),
        F.when(F.col("raw256") > 0, 1).otherwise(0).cast("int").alias("keep"),
    ).orderBy("doc_id")


@register(
    "table_catalog_report",
    oracle="""
    SELECT 'customer' AS tbl, count(*) AS n_rows, 5 AS n_cols FROM customer
    UNION ALL SELECT 'documents', count(*), 5 FROM documents
    UNION ALL SELECT 'embeddings', count(*), 3 FROM embeddings
    UNION ALL SELECT 'events', count(*), 6 FROM events
    UNION ALL SELECT 'lineitem', count(*), 11 FROM lineitem
    UNION ALL SELECT 'nation', count(*), 3 FROM nation
    UNION ALL SELECT 'orders', count(*), 6 FROM orders
    UNION ALL SELECT 'part', count(*), 6 FROM part
    UNION ALL SELECT 'region', count(*), 2 FROM region
    UNION ALL SELECT 'supplier', count(*), 4 FROM supplier
    ORDER BY tbl
    """,
    tags=("ops", "catalog", "agg"),
)
def table_catalog_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection: row and column counts for every fixture
    table — the SHOW TABLES + DESCRIBE health report an operator runs
    after an ingest. Column counts come from the live schemas (so a
    fixture drift fails loudly); counts are parallel scans of parquet
    footers (Spark answers count(*) from metadata when possible)."""
    from ..sources.fixtures import TABLES

    dfs = []
    for t in sorted(TABLES):
        df = _t(spark, sf_dir, t)
        dfs.append(
            df.agg(F.count("*").alias("n_rows")).select(
                F.lit(t).alias("tbl"),
                "n_rows",
                F.lit(len(df.columns)).cast("int").alias("n_cols"),
            )
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out.orderBy("tbl")


@register(
    "repeated_span_detection",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS i
      FROM documents
    ),
    sh AS (
      SELECT doc_id, i AS start_pos, i + 7 AS end_pos,
             ('0x' || substr(md5(concat_ws(' ', tok,
                lead(tok, 1) OVER w, lead(tok, 2) OVER w,
                lead(tok, 3) OVER w, lead(tok, 4) OVER w,
                lead(tok, 5) OVER w, lead(tok, 6) OVER w,
                lead(tok, 7) OVER w)), 1, 15))::BIGINT AS h
      FROM tok
      WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      QUALIFY lead(tok, 7) OVER w IS NOT NULL
    ),
    rep AS (
      SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT doc_id, start_pos, end_pos
      FROM sh SEMI JOIN rep ON sh.h = rep.h
    ),
    islands AS (
      SELECT doc_id, start_pos, end_pos,
             CASE WHEN start_pos > coalesce(max(end_pos) OVER (
                    PARTITION BY doc_id ORDER BY start_pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                  THEN 1 ELSE 0 END AS is_new
      FROM hits
    ),
    numbered AS (
      SELECT doc_id, start_pos, end_pos,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY start_pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM islands
    ),
    spans AS (
      SELECT doc_id, island_id,
             max(end_pos) - min(start_pos) + 1 AS span_len
      FROM numbered GROUP BY doc_id, island_id
    ),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(span_len) AS BIGINT) AS repeated_tokens,
           CAST(dl.n_tokens AS BIGINT) AS n_tokens,
           round(CAST(sum(span_len) AS DOUBLE) / dl.n_tokens, 6)
             AS repeated_frac
    FROM spans s JOIN dl ON dl.doc_id = s.doc_id
    GROUP BY s.doc_id, dl.n_tokens
    ORDER BY s.doc_id
    """,
    tags=("text", "dedup", "corpus", "window"),
)
def repeated_span_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style cross-document repeated-span detection (the
    Lee et al. 2022 "Deduplicating Training Data" suffix-array pass,
    re-expressed relationally): every 8-token window is hashed; windows
    whose hash occurs in ≥2 distinct documents are repetition hits;
    per document, overlapping/adjacent hit intervals merge into maximal
    repeated SPANS (gaps-and-islands), reported as span count, covered
    token count, and covered fraction — the columns a pipeline uses to
    cut boilerplate before training.

    Scale shape: the shingle grain is linear in corpus tokens with a
    content-uniform 60-bit hash key; the ≥2-docs screen is one
    partial-aggregable groupBy (a distinct-doc count per hash — never
    pair enumeration, so a span repeated in 10⁶ docs costs 10⁶ rows,
    not 10¹²/2 pairs); the island merge is a per-document window —
    partitioned by doc_id, no global ordering anywhere. The Spark side
    builds windows by array slicing (narrow, no shuffle before the
    hash groupBy); the oracle uses lead() chains — two independent
    constructions of the same relation."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    starts = F.when(
        F.size(t) >= 8, F.sequence(F.lit(1), F.size(t) - 7)
    ).otherwise(F.array().cast("array<int>"))
    sh_structs = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("start_pos"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(t, i, 8))), 1, 15
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        ),
    )
    sh = (
        toks.select("doc_id", F.size(t).alias("n_tokens"),
                    F.explode(sh_structs).alias("s"))
        .select(
            "doc_id",
            "n_tokens",
            F.col("s.start_pos").alias("start_pos"),
            (F.col("s.start_pos") + 7).alias("end_pos"),
            F.col("s.h").alias("h"),
        )
    ).transform(persist_tracked)
    rep = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = sh.join(rep, "h", "left_semi")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = hits.withColumn(
        "is_new",
        F.when(
            F.col("start_pos")
            > F.coalesce(F.max("end_pos").over(w_prev), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    ).withColumn("island_id", F.sum("is_new").over(w_run))
    spans = islands.groupBy("doc_id", "n_tokens", "island_id").agg(
        (F.max("end_pos") - F.min("start_pos") + 1).alias("span_len")
    )
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum("span_len").alias("repeated_tokens"),
        )
        .select(
            "doc_id",
            "n_spans",
            "repeated_tokens",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.col("repeated_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("repeated_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "rendezvous_shard_assignment",
    oracle="""
    WITH scores AS (
      SELECT d.doc_id, s.shard,
             md5(CAST(s.shard AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR))
               AS h
      FROM documents d
      CROSS JOIN (SELECT unnest(range(9)) AS shard) s
    ),
    ranked AS (
      SELECT doc_id, shard, h,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY h DESC, shard) AS rn
      FROM scores
    ),
    pick9 AS (SELECT doc_id, shard AS shard9 FROM ranked WHERE rn = 1),
    pick8 AS (
      SELECT doc_id, shard AS shard8
      FROM (SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY h DESC, shard) AS rn
            FROM scores WHERE shard < 8) r8
      WHERE rn = 1
    )
    SELECT p9.shard9 AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p8.shard8 <> p9.shard9 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_in
    FROM pick9 p9 JOIN pick8 p8 ON p8.doc_id = p9.doc_id
    GROUP BY p9.shard9
    ORDER BY shard
    """,
    tags=("sampling", "layout", "sharding", "window", "agg"),
)
def rendezvous_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding — how a 100 TB
    corpus assigns documents to a resizable shard set with MINIMAL
    movement: doc → argmax over shards of md5(shard|doc). The query
    scores every doc against 8 and against 9 shards and reports, per
    final shard, the doc count and how many docs CHANGED assignment —
    HRW's defining guarantee is that growing 8→9 moves only docs whose
    new argmax IS the new shard (≈1/9 of the corpus, all arriving at
    shard 8; the test pins both properties). The 9× score expansion is
    a narrow generated cross join (no shuffle until the per-doc
    argmax); ties are impossible in practice but carry a total-order
    break anyway. This is the deterministic alternative to
    hash-mod-N sharding, which moves (N−1)/N of everything."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    # shard domain via explode of a literal array — narrow 9× expansion,
    # no join node (the audit-clean form of a constant-domain cross)
    scores = d.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(i).cast("int") for i in range(9)])
        ).alias("shard"),
    ).select(
        "doc_id",
        "shard",
        F.md5(
            F.concat_ws(
                "|",
                F.col("shard").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    w9 = Window.partitionBy("doc_id").orderBy(F.col("h").desc(), "shard")
    pick9 = (
        scores.withColumn("rn", F.row_number().over(w9))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("shard").alias("shard9"))
    )
    pick8 = (
        scores.filter(F.col("shard") < 8)
        .withColumn("rn", F.row_number().over(w9))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("shard").alias("shard8"))
    )
    return (
        pick9.join(pick8, "doc_id")
        .groupBy(F.col("shard9").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("shard8") != F.col("shard9"), 1).otherwise(0)
            ).alias("n_moved_in"),
        )
        .orderBy("shard")
    )


@register(
    "group_kfold_assignment",
    oracle="""
    WITH assigned AS (
      SELECT user_id, event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 5 AS fold
      FROM events
    )
    SELECT fold,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           round(CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS purchase_rate
    FROM assigned
    GROUP BY fold
    ORDER BY fold
    """,
    tags=("sampling", "evaluation", "cv", "agg"),
)
def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-K-fold cross-validation assignment — the leakage-free CV
    split for grouped data: the fold is a pure function of the GROUP
    key (md5(user_id) % 5), so all of a user's events land in exactly
    one fold BY CONSTRUCTION (no user ever straddles train and
    validation — the leak GroupKFold exists to prevent), and the
    assignment is identical on every engine, run, retry, and
    partitioning (the rand() trap again). Output is the fold balance
    sheet: user/event/label counts and rate per fold, which is also
    the stratification sanity check. One partial-aggregable groupBy."""
    e = _t(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 5
    )
    return (
        e.select(fold.alias("fold"), "user_id", "event_type")
        .groupBy("fold")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
        )
        .select(
            "fold",
            "n_users",
            "n_events",
            "n_purchases",
            F.round(
                F.col("n_purchases").cast("double") / F.col("n_events"), 6
            ).alias("purchase_rate"),
        )
        .orderBy("fold")
    )


@register(
    "t_closeness_report",
    oracle="""
    WITH base AS (
      SELECT lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket, source
      FROM documents
    ),
    gsrc AS (
      SELECT source, CAST(count(*) AS BIGINT) AS g FROM base GROUP BY source
    ),
    n_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    cells AS (
      SELECT lang, len_bucket, source, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY lang, len_bucket, source
    ),
    cls AS (
      SELECT lang, len_bucket, CAST(sum(c) AS BIGINT) AS n_cls
      FROM cells GROUP BY lang, len_bucket
    ),
    -- PRESENT cells only; sources absent from a class contribute
    -- |0·N − g·n_cls| = g·n_cls, folded in analytically via the
    -- absent-mass identity Σ_absent g = N − Σ_present g
    per_class AS (
      SELECT cells.lang, cells.len_bucket,
             any_value(cls.n_cls) AS n_cls,
             CAST(sum(abs(c * n.n - g * cls.n_cls)) AS BIGINT)
               AS present_dev,
             CAST(sum(g) AS BIGINT) AS present_g
      FROM cells
      JOIN gsrc ON gsrc.source = cells.source
      JOIN cls ON cls.lang = cells.lang
              AND cls.len_bucket = cells.len_bucket, n_all n
      GROUP BY cells.lang, cells.len_bucket, n.n
    )
    SELECT p.lang, p.len_bucket,
           p.n_cls AS n_docs,
           p.present_dev + (n.n - p.present_g) * p.n_cls AS tvd_num,
           round(CAST(p.present_dev + (n.n - p.present_g) * p.n_cls
                      AS DOUBLE) / (2 * p.n_cls * n.n), 6) AS t_closeness
    FROM per_class p, n_all n
    ORDER BY p.lang, p.len_bucket
    """,
    tags=("privacy", "agg", "quality"),
)
def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the release gate one tier above
    ``k_anonymity_report``: within each quasi-identifier equivalence
    class (lang × 100-char length bucket, the same QI grid), how far
    does the SENSITIVE attribute's distribution (source) drift from
    the corpus-wide distribution? Distance is the categorical EMD
    (total variation): t = ½ Σ_v |p_cls(v) − p_global(v)|, computed as
    the exact integer numerator Σ|c_v·N − g_v·n_cls| over a grid that
    CROSSES classes with the full sensitive domain (absent cells count
    as zero — dropping them understates the distance, the classic
    implementation bug) and divided once per output row. A class with
    t near 1 leaks its members' source even if it is k-anonymous.
    Shuffle profile: three partial-aggregable groupBys over the same
    scan + a broadcast of the sensitive-domain marginals."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        F.expr("n_chars div 100").cast("long").alias("len_bucket"),
        "source",
    ).transform(persist_tracked)
    glob = base.groupBy("source").agg(F.count("*").alias("g"))
    n_all = base.agg(F.count("*").alias("n"))
    cells = base.groupBy("lang", "len_bucket", "source").agg(
        F.count("*").alias("c")
    )
    cls = cells.groupBy("lang", "len_bucket").agg(
        F.sum("c").alias("n_cls")
    )
    # PRESENT cells only — sources absent from a class contribute
    # |0·N − g·n_cls| = g·n_cls, folded in via the absent-mass
    # identity Σ_absent g = N − Σ_present g, so there is NO
    # class × sensitive-domain cross join anywhere in the plan
    joined = (
        cells.join(F.broadcast(glob), "source")
        .join(F.broadcast(cls), ["lang", "len_bucket"])
        .crossJoin(F.broadcast(n_all))
    )
    dev = F.abs(F.col("c") * F.col("n") - F.col("g") * F.col("n_cls"))
    per_class = joined.groupBy("lang", "len_bucket", "n").agg(
        F.any_value("n_cls").alias("n_docs"),
        F.sum(dev).alias("present_dev"),
        F.sum("g").alias("present_g"),
    )
    tvd = F.col("present_dev") + (
        F.col("n") - F.col("present_g")
    ) * F.col("n_docs")
    return per_class.select(
        "lang",
        "len_bucket",
        "n_docs",
        tvd.alias("tvd_num"),
        F.round(
            tvd.cast("double") / (2 * F.col("n_docs") * F.col("n")), 6
        ).alias("t_closeness"),
    ).orderBy("lang", "len_bucket")


_SET_COVER_K = 5


def _set_cover_oracle() -> str:
    """Unrolled K-round greedy set cover in DuckDB (argmax per round is
    not expressible inside a recursive CTE, so the rounds unroll like
    the PageRank/Lloyd training-replay oracles)."""
    from .dedup import _SHINGLES_ORACLE

    parts = [f"WITH sh AS ({_SHINGLES_ORACLE})"]
    picked = []
    for k in range(1, _SET_COVER_K + 1):
        not_picked = (
            f"AND s.doc_id NOT IN (SELECT doc_id FROM picked{k - 1})"
            if picked
            else ""
        )
        anti = (
            f"LEFT JOIN cov{k - 1} c ON c.shingle = s.shingle\n"
            f"       WHERE c.shingle IS NULL {not_picked}"
            if picked
            else "WHERE TRUE"
        )
        parts.append(
            f"""p{k} AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS gain
      FROM sh s
      {anti}
      GROUP BY s.doc_id
      ORDER BY gain DESC, s.doc_id LIMIT 1
    )"""
        )
        prev_picked = (
            f"SELECT doc_id FROM picked{k - 1} UNION ALL " if picked else ""
        )
        parts.append(
            f"picked{k} AS ({prev_picked}SELECT doc_id FROM p{k})"
        )
        prev_cov = f"SELECT shingle FROM cov{k - 1} UNION " if picked else ""
        parts.append(
            f"""cov{k} AS ({prev_cov}
      SELECT DISTINCT shingle FROM sh
      WHERE doc_id IN (SELECT doc_id FROM p{k}))"""
        )
        picked.append(k)
    sel = "\n    UNION ALL ".join(
        f"SELECT {k} AS round, doc_id, gain FROM p{k}"
        for k in range(1, _SET_COVER_K + 1)
    )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT CAST(round AS INT) AS round, doc_id, gain FROM ({sel})"
        + " ORDER BY round"
    )


@register(
    "greedy_set_cover_top5",
    oracle=None,  # assigned below (needs the shingles SQL from dedup)
    tags=("llm", "selection", "iterative"),
)
def greedy_set_cover_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage corpus selection — pick the K=5 documents
    that together cover the most distinct 3-gram shingles (the classic
    diverse-subset / dedup-aware curation step; greedy is the standard
    (1 − 1/e)-approximation). Round k: anti-join the shingle relation
    against the covered set, count fresh shingles per doc
    (partial-aggregable), take the argmax with a total-order tie-break
    (gain DESC, doc_id).

    Driver state is ONE (doc_id, gain) row per round — a bounded
    K-row cursor, the same protocol-state class as the
    connected-components convergence collect (VERDICT r2-sanctioned);
    the covered-shingle set stays distributed (localCheckpoint per
    round keeps plans O(1)). The oracle unrolls all K argmax rounds in
    SQL, so both engines replay the identical greedy trajectory."""
    from .dedup import shingles_df

    sh = shingles_df(spark, sf_dir).transform(persist_tracked)
    covered = None
    picked: list[int] = []
    out_rows = []
    for k in range(1, _SET_COVER_K + 1):
        gains = sh
        if covered is not None:
            gains = gains.join(covered, "shingle", "left_anti")
        if picked:
            gains = gains.filter(~F.col("doc_id").isin(picked))
        best = (
            gains.groupBy("doc_id")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not best:
            break
        doc, gain = best[0]["doc_id"], best[0]["gain"]
        out_rows.append((k, doc, gain))
        picked.append(doc)
        fresh = sh.filter(F.col("doc_id") == doc).select("shingle")
        covered = (
            fresh if covered is None else covered.union(fresh).distinct()
        ).localCheckpoint()
    return spark.createDataFrame(
        out_rows, "round int, doc_id bigint, gain bigint"
    ).orderBy("round")


from ..registry import _REGISTRY as _R  # noqa: E402

_R["greedy_set_cover_top5"].oracle = _set_cover_oracle()
del _R


@register(
    "source_frequency_cap",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rn > 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(CASE WHEN rn <= 10 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM ranked GROUP BY source
    ORDER BY source
    """,
    tags=("llm", "selection", "window"),
)
def source_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency capping — the crawl-curation stage that
    stops any one domain from dominating the corpus: keep at most 10
    docs per source, priority = (n_chars DESC, doc_id) so the cut is a
    total order and both engines keep the identical prefix. One
    source-partitioned window (uniform keys — source cardinality grows
    with the corpus, and a pathological mega-domain is exactly what the
    cap bounds: its partition processes then truncates to 10). Census
    output: kept/dropped doc and char counts per source."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    ranked = d.select(
        "source", "n_chars", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("rn") <= 10, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("rn") > 10, 1).otherwise(0)).alias(
                "n_dropped"
            ),
            F.sum(
                F.when(F.col("rn") <= 10, F.col("n_chars")).otherwise(0)
            ).alias("kept_chars"),
        )
        .orderBy("source")
    )


@register(
    "jackknife_source_influence",
    oracle="""
    WITH g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s
      FROM documents
    ),
    per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(n_chars) AS BIGINT) AS sg
      FROM documents GROUP BY source
    )
    SELECT p.source, p.ng AS n_docs,
           p.sg * g.n - g.s * p.ng AS influence_num,
           g.n * (g.n - p.ng) AS influence_den,
           CAST(CASE WHEN g.n > p.ng THEN
                CASE WHEN p.sg * g.n - g.s * p.ng < 0 THEN -1 ELSE 1 END
                * ((2 * abs(1000000 * (p.sg * g.n - g.s * p.ng))
                    + g.n * (g.n - p.ng))
                   // (2 * g.n * (g.n - p.ng))) END AS BIGINT)
             AS influence_micro
    FROM per p, g
    ORDER BY p.source
    """,
    tags=("llm", "stats", "audit"),
)
def jackknife_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-SOURCE-out influence on the corpus mean doc length —
    the data-debugging question "which source most skews my statistic"
    answered ALGEBRAICALLY: influence_g = mean(all) − mean(without g)
    = (s_g·N − S·n_g) / (N·(N − n_g)), all from ONE global (N, S) pair
    and per-source partials — never a per-group recompute, so cost is
    one aggregation regardless of group count. The exact integer
    numerator/denominator ARE the hash signal; influence_micro is the
    same rational rounded to micro-chars in BIGINT space (half away
    from zero — no float round() tie exposure), NULL when one source
    owns every doc (N = n_g ⇒ the leave-one-out mean is undefined;
    guarded with CASE WHEN N > n_g on both engines so neither raises
    nor silently NULLs non-ANSI-style — ADVICE r5). Overflow headroom
    (ADVICE r5 correction): the binding term is the micro-scaled
    2·10⁶·|num|, so BIGINT-safe while |s_g·N − S·n_g| < 2^61/10⁶
    ≈ 2.3×10^12 — ~10⁶× tighter than the raw num/den columns' own
    s_g·N < 2^63 bound; past that, influence_micro (not num/den)
    moves to DECIMAL(38,0)."""
    d = _t(spark, sf_dir, "documents")
    g = d.agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("s")
    )
    per = d.groupBy("source").agg(
        F.count("*").alias("ng"), F.sum("n_chars").alias("sg")
    )
    num = F.col("sg") * F.col("n") - F.col("s") * F.col("ng")
    den = F.col("n") * (F.col("n") - F.col("ng"))
    micro = F.when(
        F.col("n") > F.col("ng"),
        F.when(num < 0, -1).otherwise(1)
        * F.expr(
            "(2 * abs(1000000 * (sg * n - s * ng)) + n * (n - ng))"
            " div (2 * n * (n - ng))"
        ),
    ).cast("long")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "source",
            F.col("ng").alias("n_docs"),
            num.alias("influence_num"),
            den.alias("influence_den"),
            micro.alias("influence_micro"),
        )
        .orderBy("source")
    )


#: Temperature-mix budget and weight scale. α = 0.5 (weights ∝ √n_g,
#: the multilingual temperature-sampling standard at T = 2): IEEE-754
#: sqrt is correctly rounded on BOTH engines, and floor(√n·10⁶) moves
#: it into BIGINT before anything sums, so the whole allocation is
#: exact integer arithmetic — order-independent under any partial
#: aggregation. B·w ≤ 10⁵·√(10¹²)·10⁶ = 10¹⁷ < 2⁶³ at a trillion docs
#: per source.
MIX_BUDGET = 100_000
MIX_W_SCALE = 1_000_000


@register(
    "temperature_mix_allocation",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * {MIX_W_SCALE})
                  AS BIGINT) AS w
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM per),
    base AS (
      SELECT p.source, p.n_docs, p.w,
             ({MIX_BUDGET} * p.w) // t.tw AS alloc0,
             ({MIX_BUDGET} * p.w) % t.tw AS rem
      FROM per p, tot t
    ),
    lo AS (
      SELECT CAST({MIX_BUDGET} - sum(alloc0) AS BIGINT) AS leftover
      FROM base
    ),
    ranked AS (
      SELECT source, n_docs, w, alloc0,
             row_number() OVER (ORDER BY rem DESC, source) AS rr
      FROM base
    )
    SELECT r.source, r.n_docs, r.w AS weight_fix,
           CAST(r.alloc0 + CASE WHEN r.rr <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc,
           round(CAST(r.alloc0
                      + CASE WHEN r.rr <= l.leftover THEN 1 ELSE 0 END
                      AS DOUBLE) / {MIX_BUDGET}, 6) AS share
    FROM ranked r, lo l
    ORDER BY r.source
    """,
    tags=("llm", "sampling", "mixing", "agg"),
)
def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing: allocate a 100,000-example
    sampling budget across sources ∝ √n_g (T = 2 temperature sampling —
    the standard upweighting of low-resource sources in multilingual /
    multi-domain pretraining mixes), with LARGEST-REMAINDER rounding so
    allocations sum exactly to the budget. All integer after the one
    correctly-rounded IEEE sqrt: base = B·w div ΣW, remainder rank
    gets the leftover units (total order (rem DESC, source)).

    Scale shape: one partial-aggregable count per source, a 1-row
    broadcast total, and a rank window over the SOURCE-VOCABULARY
    aggregate (plan-time-bounded domain — the GLOBAL_WINDOW_OK class
    kl_domain_balance already documents)."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.floor(
            F.sqrt(F.count("*").cast("double")) * MIX_W_SCALE
        ).cast("long").alias("w"),
    )
    tot = per.agg(F.sum("w").alias("tw"))
    base = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w",
        F.expr(f"({MIX_BUDGET} * w) div tw").alias("alloc0"),
        (F.lit(MIX_BUDGET) * F.col("w") % F.col("tw")).alias("rem"),
    )
    lo = base.agg(
        (F.lit(MIX_BUDGET) - F.sum("alloc0")).cast("long").alias("leftover")
    )
    ranked = base.select(
        "source",
        "n_docs",
        "w",
        "alloc0",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "source"))
        .alias("rr"),
    )
    alloc = F.col("alloc0") + F.when(
        F.col("rr") <= F.col("leftover"), 1
    ).otherwise(0)
    return (
        ranked.crossJoin(F.broadcast(lo))
        .select(
            "source",
            "n_docs",
            F.col("w").alias("weight_fix"),
            alloc.cast("long").alias("alloc"),
            F.round(alloc.cast("double") / MIX_BUDGET, 6).alias("share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# public): score every raw document by how target-like its hashed
# n-gram feature distribution is, w(doc) = Σ_features log(p̂_target[b]
# / p̂_raw[b]) over B hashed-bigram buckets with additive smoothing.
# The classic pretraining-corpus curation selector: resample raw data
# toward a target domain without training a model.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 4096
DSIR_ALPHA = 0.5  # additive smoothing per bucket


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('dsir|' || bg), 1, 6))::BIGINT
               % {DSIR_BUCKETS} AS b
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(
                 range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' '
                      || string_split(text, ' ')[i + 1])) AS bg
        FROM documents
      )
    ),
    raw AS (
      SELECT b, CAST(count(*) AS BIGINT) AS cr FROM feats GROUP BY b
    ),
    tgt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS ct FROM feats
      WHERE lang = 'en' GROUP BY b
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nr,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS nt
      FROM feats
    ),
    lr AS (
      SELECT raw.b,
             ln((coalesce(tgt.ct, 0) + {DSIR_ALPHA})
                / (tot.nt + {DSIR_ALPHA} * {DSIR_BUCKETS}))
             - ln((raw.cr + {DSIR_ALPHA})
                  / (tot.nr + {DSIR_ALPHA} * {DSIR_BUCKETS})) AS lr
      FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot
    ),
    w AS (
      SELECT f.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CAST(lr.lr AS DECIMAL(38,6))) AS DOUBLE) AS w
      FROM feats f JOIN lr ON lr.b = f.b
      GROUP BY f.doc_id
    )
    SELECT d.doc_id, d.lang,
           coalesce(w.n_bigrams, 0) AS n_bigrams,
           round(coalesce(w.w, 0.0), 6) AS dsir_logweight
    FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
    ORDER BY dsir_logweight DESC, d.doc_id
    LIMIT 20
    """,
    tags=("llm", "curation", "sampling", "text"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights over hashed bigrams (Xie et al. 2023):
    features are md5-hashed token bigrams in 4096 buckets; the target
    distribution is the English subset (lang='en'), raw is the whole
    corpus; a document's weight is Σ log(p̂_t[b]/p̂_r[b]) over its
    bigram instances with α=0.5 additive smoothing. Top-20 most
    target-like docs by (weight DESC, doc_id).

    Scale shape: one narrow shuffle keyed by the 4096-value bucket id
    builds both bucket tables (map-side combinable counts); the
    log-ratio table is ≤B rows, broadcast back onto the feature stream
    for a second map-side-combinable per-doc sum — no doc×bucket
    blowup, no driver round-trip. Determinism: each instance's
    log-ratio is quantized to DECIMAL(38,6) before the per-doc sum
    (order-free exact accumulation, the bm25 idiom); ln() runs on
    bit-identical double inputs in both engines. Docs with <2 tokens
    contribute no features and surface with weight 0 via the left
    join — never dropped."""
    d = _t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = d.select(
        "doc_id",
        "lang",
        F.explode(bigrams).alias("bg"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dsir|"), F.col("bg"))), 1, 6),
                16,
                10,
            ).cast("bigint")
            % DSIR_BUCKETS
        ).alias("b"),
    )
    feats = feats.transform(persist_tracked)  # feeds raw counts, target counts, and the
    # per-doc weight join — the dedup-diamond persist rule
    raw = feats.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = (
        feats.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    tot = feats.agg(
        F.count("*").alias("nr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
    )
    ab = float(DSIR_ALPHA * DSIR_BUCKETS)
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(DSIR_ALPHA))
                    / (F.col("nt") + F.lit(ab))
                )
                - F.log(
                    (F.col("cr") + F.lit(DSIR_ALPHA)) / (F.col("nr") + F.lit(ab))
                )
            ).alias("lr"),
        )
    )
    w = (
        feats.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.col("lr").cast("decimal(38,6)"))
            .cast("double")
            .alias("w"),
        )
    )
    return (
        d.select("doc_id", "lang")
        .join(w, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(F.coalesce(F.col("w"), F.lit(0.0)), 6).alias(
                "dsir_logweight"
            ),
        )
        .orderBy(F.desc("dsir_logweight"), "doc_id")
        .limit(20)
    )


#: Candidate training context lengths for the padding-waste curve — a
#: plan-time constant grid (the classic "which max_seq_len do we rent
#: GPUs for" planning table).
PACK_CONTEXTS = (64, 128, 256, 512, 1024)


@register(
    "padding_waste_curve",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    grid AS (SELECT unnest([{", ".join(str(c) for c in PACK_CONTEXTS)}])
             AS ctx),
    per AS (
      SELECT g.ctx,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(least(d.n_tokens, g.ctx)) AS BIGINT) AS kept_tokens,
             CAST(sum(greatest(d.n_tokens - g.ctx, 0)) AS BIGINT)
               AS truncated_tokens,
             CAST(sum(g.ctx - least(d.n_tokens, g.ctx)) AS BIGINT)
               AS padded_tokens,
             CAST(sum(CASE WHEN d.n_tokens > g.ctx THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_truncated_docs
      FROM d CROSS JOIN grid g
      GROUP BY g.ctx
    )
    SELECT ctx, n_docs, kept_tokens, truncated_tokens, padded_tokens,
           n_truncated_docs,
           round(CAST(kept_tokens AS DOUBLE)
                 / (CAST(n_docs AS DOUBLE) * ctx), 6) AS utilization,
           round(CAST(truncated_tokens AS DOUBLE)
                 / (kept_tokens + truncated_tokens), 6) AS truncation_loss
    FROM per
    ORDER BY ctx
    """,
    tags=("llm", "curation", "planning", "agg"),
)
def padding_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length planning table: for each candidate context
    length in the constant PACK_CONTEXTS grid, the one-doc-per-sequence
    padding waste (ctx − len for short docs), truncation loss
    (len − ctx for long docs), utilization = kept/(docs·ctx) and the
    truncated-doc count — the curve a training pipeline reads to pick
    max_seq_len (vs the packing path, chunk_packing_greedy, which
    removes the padding at the cost of cross-doc attention masking).

    Scale shape: one narrow projection (doc_id, n_tokens), crossed
    with the 5-row constant grid (broadcast — rows × plan-constant,
    the calendar-grid class), then a single partial-aggregable
    groupBy(ctx) over 5 keys. All counts exact BIGINTs; the two
    ratios divide exact integers and round(6) on both engines."""
    d = _t(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    grid = F.array(*[F.lit(c) for c in PACK_CONTEXTS])
    kept = F.least(F.col("n_tokens"), F.col("ctx"))
    per = (
        d.select("n_tokens", F.explode(grid).alias("ctx"))
        .groupBy("ctx")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).alias("kept_tokens"),
            F.sum(F.greatest(F.col("n_tokens") - F.col("ctx"), F.lit(0)))
            .alias("truncated_tokens"),
            F.sum(F.col("ctx") - kept).alias("padded_tokens"),
            F.sum(
                F.when(F.col("n_tokens") > F.col("ctx"), 1).otherwise(0)
            ).alias("n_truncated_docs"),
        )
    )
    return per.select(
        "ctx",
        "n_docs",
        "kept_tokens",
        "truncated_tokens",
        "padded_tokens",
        "n_truncated_docs",
        F.round(
            F.col("kept_tokens").cast("double")
            / (F.col("n_docs").cast("double") * F.col("ctx")),
            6,
        ).alias("utilization"),
        F.round(
            F.col("truncated_tokens").cast("double")
            / (F.col("kept_tokens") + F.col("truncated_tokens")),
            6,
        ).alias("truncation_loss"),
    ).orderBy("ctx")


#: Memorization-window width (tokens) for the cross-doc novelty metric.
MEM_WINDOW = 8


@register(
    "memorization_window_fraction",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    wins AS (
      SELECT doc_id,
             ('0x' || substr(md5('mem|' || array_to_string(
                w, ' ')), 1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, len(t) - {MEM_WINDOW} + 2),
                 i -> t[i : i + {MEM_WINDOW} - 1])) AS w
        FROM tk WHERE len(t) >= {MEM_WINDOW}
      )
    ),
    shared AS (
      SELECT h FROM wins GROUP BY h
      HAVING count(DISTINCT doc_id) >= 2
    ),
    per AS (
      SELECT w.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(count(*) FILTER (WHERE s.h IS NOT NULL) AS BIGINT)
               AS n_shared
      FROM wins w LEFT JOIN shared s ON s.h = w.h
      GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_windows, 0) AS n_windows,
           coalesce(p.n_shared, 0) AS n_shared,
           round(CAST(coalesce(p.n_shared, 0) AS DOUBLE)
                 / greatest(coalesce(p.n_windows, 0), 1), 6)
             AS shared_frac
    FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
    ORDER BY shared_frac DESC, d.doc_id
    LIMIT 20
    """,
    tags=("llm", "curation", "dedup", "text"),
)
def memorization_window_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document memorization/novelty signal (the Carlini-style
    duplication proxy used to screen training corpora): slide an
    8-token window over every doc, hash each window to 60 bits, call a
    window SHARED when its hash occurs in ≥2 distinct docs, and score
    each doc by its shared-window fraction. Top-20 most-duplicated
    docs by (shared_frac DESC, doc_id).

    Scale shape: windows come from shuffle-free array slicing (the
    shingle idiom), carried as 8-byte hashed LONGs; the shared-set
    screen is ONE content-keyed groupBy (count distinct docs per
    window hash — never pair enumeration), joined back as a semi-style
    LEFT join on the same uniform key; the per-doc fraction is a
    second map-side-combinable groupBy. Docs shorter than the window
    surface with 0/0 via the final left join — never dropped."""
    d = _t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    wins_arr = F.expr(
        f"transform(sequence(1, size(t) - {MEM_WINDOW} + 1),"
        f" i -> slice(t, i, {MEM_WINDOW}))"
    )
    wins = (
        d.select("doc_id", tk.alias("t"))
        .filter(F.size("t") >= MEM_WINDOW)
        .select("doc_id", F.explode(wins_arr).alias("w"))
        .select(
            "doc_id",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mem|"), F.concat_ws(" ", F.col("w"))
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
    )
    wins = wins.transform(persist_tracked)  # feeds the shared screen AND the per-doc
    # fraction — the dedup-diamond persist rule
    shared = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(True).alias("_sh"))
    )
    per = (
        wins.join(shared, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("_sh"), 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        d.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0)).cast("double")
                / F.greatest(
                    F.coalesce(F.col("n_windows"), F.lit(0)), F.lit(1)
                ),
                6,
            ).alias("shared_frac"),
        )
        .orderBy(F.desc("shared_frac"), "doc_id")
        .limit(20)
    )


@register(
    "memorization_max_run_length",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) - {MEM_WINDOW} + 2)) AS i
      FROM tk WHERE len(t) >= {MEM_WINDOW}
    ),
    wins AS (
      SELECT doc_id, i AS start_pos, i + {MEM_WINDOW} - 1 AS end_pos,
             ('0x' || substr(md5('mem|' || array_to_string(
                t[i : i + {MEM_WINDOW} - 1], ' ')), 1, 15))::BIGINT AS h
      FROM pos
    ),
    shared AS (
      SELECT h FROM wins GROUP BY h
      HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT doc_id, start_pos, end_pos
      FROM wins SEMI JOIN shared ON wins.h = shared.h
    ),
    islands AS (
      SELECT doc_id, start_pos, end_pos,
             CASE WHEN start_pos > coalesce(max(end_pos) OVER (
                    PARTITION BY doc_id ORDER BY start_pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                  THEN 1 ELSE 0 END AS is_new
      FROM hits
    ),
    numbered AS (
      SELECT doc_id, start_pos, end_pos,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY start_pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM islands
    ),
    spans AS (
      SELECT doc_id, island_id,
             max(end_pos) - min(start_pos) + 1 AS span_len
      FROM numbered GROUP BY doc_id, island_id
    ),
    runs AS (
      SELECT doc_id,
             count(*) AS n_runs,
             max(span_len) AS max_run_len
      FROM spans GROUP BY doc_id
    ),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents)
    SELECT dl.doc_id,
           CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_runs,
           CAST(coalesce(r.max_run_len, 0) AS BIGINT) AS max_run_len,
           CAST(dl.n_tokens AS BIGINT) AS n_tokens,
           round(CAST(coalesce(r.max_run_len, 0) AS DOUBLE)
                 / greatest(dl.n_tokens, 1), 6) AS max_run_frac
    FROM dl LEFT JOIN runs r ON r.doc_id = dl.doc_id
    ORDER BY max_run_frac DESC, max_run_len DESC, dl.doc_id
    LIMIT 20
    """,
    tags=("llm", "curation", "dedup", "text", "window"),
)
def memorization_max_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MAX shared-run length — the Lee et al. 2022
    dedup-span statistic that complements ``memorization_window_
    fraction``: the fraction says how much of a doc is duplicated
    elsewhere, the max-run says whether that duplication is one long
    memorizable passage (a verbatim license block, a copied article)
    or dust (many short idiom collisions). Same MEM_WINDOW-token
    'mem|'-salted shared-window relation as the fraction query, then
    the island-merge machinery of ``repeated_span_detection``:
    overlapping/adjacent shared windows merge into maximal runs
    per doc; report run count, max run length (tokens), and max-run
    fraction of the doc. Top-20 by (max_run_frac DESC, max_run_len
    DESC, doc_id).

    Scale shape: content-keyed throughout — windows from shuffle-free
    array slicing carried as hashed LONGs; ONE groupBy for the
    ≥2-distinct-docs screen (never pair enumeration); the island merge
    is a per-document window (partitioned by doc_id, no global
    ordering); two more map-side-combinable groupBys. Docs shorter
    than the window (or with no shared windows) surface as 0/0 via the
    final left join."""
    d = _t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    wins_structs = F.expr(
        f"transform(sequence(1, size(t) - {MEM_WINDOW} + 1), i -> struct("
        f" i AS start_pos,"
        f" i + {MEM_WINDOW} - 1 AS end_pos,"
        f" cast(conv(substring(md5(concat('mem|',"
        f" concat_ws(' ', slice(t, i, {MEM_WINDOW})))), 1, 15), 16, 10)"
        f" as bigint) AS h))"
    )
    wins = (
        d.select("doc_id", tk.alias("t"))
        .filter(F.size("t") >= MEM_WINDOW)
        .select("doc_id", F.explode(wins_structs).alias("s"))
        .select("doc_id", "s.start_pos", "s.end_pos", "s.h")
        .transform(persist_tracked)  # feeds the shared screen AND the hit join — diamond
    )
    shared = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = wins.join(shared, "h", "left_semi")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = hits.withColumn(
        "is_new",
        F.when(
            F.col("start_pos")
            > F.coalesce(F.max("end_pos").over(w_prev), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    ).withColumn("island_id", F.sum("is_new").over(w_run))
    spans = islands.groupBy("doc_id", "island_id").agg(
        (F.max("end_pos") - F.min("start_pos") + 1).alias("span_len")
    )
    runs = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_runs"),
        F.max("span_len").alias("max_run_len"),
    )
    dl = d.select("doc_id", F.size(tk).alias("n_tokens"))
    return (
        dl.join(runs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_runs"), F.lit(0))
            .cast("long")
            .alias("n_runs"),
            F.coalesce(F.col("max_run_len"), F.lit(0))
            .cast("long")
            .alias("max_run_len"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(F.col("max_run_len"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("max_run_frac"),
        )
        .orderBy(F.desc("max_run_frac"), F.desc("max_run_len"), "doc_id")
        .limit(20)
    )


@register(
    "l_diversity_report",
    oracle="""
    WITH cells AS (
      SELECT lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket, source,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, len_bucket, source
    )
    SELECT lang, len_bucket,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS distinct_l,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                   / CAST(sum(c) AS DOUBLE), 6) AS entropy,
           CAST(count(*) >= 3 AS BIGINT) AS meets_distinct_3
    FROM cells
    GROUP BY lang, len_bucket
    ORDER BY lang, len_bucket
    """,
    tags=("privacy", "agg", "quality"),
)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the middle tier of the release-gate trio
    (``k_anonymity_report`` → this → ``t_closeness_report``): within
    each quasi-identifier class (lang × 100-char length bucket, the
    shared QI grid), how DIVERSE is the sensitive attribute (source)?
    Reports distinct-l (the count of distinct sensitive values),
    entropy l-diversity's entropy term ln(n) − Σ c·ln(c)/n (a class
    satisfies entropy-l iff entropy ≥ ln(l)), and the distinct-l ≥ 3
    gate. A k-anonymous class with l = 1 still leaks its members'
    source outright — which is why k-anonymity alone is not a release
    gate.

    Arithmetic: counts are exact integers; the entropy is the one
    float, assembled from the same integer ratios on both engines and
    rounded at 6 (ln ulp noise ~1e-15 vs the 5e-7 grid — the accepted
    class in SCALE.md's float-sensitivity audit). Shuffle profile: one
    (QI × sensitive) partial-aggregable groupBy over the scan, then a
    QI-grain re-aggregate — both bounded by the attribute domains, not
    the corpus."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        F.expr("n_chars div 100").alias("len_bucket"),
        "source",
    ).agg(F.count("*").alias("c"))
    n = F.sum("c")
    cd = F.col("c").cast("double")
    return (
        cells.groupBy("lang", "len_bucket")
        .agg(
            n.cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("distinct_l"),
            F.round(
                F.log(n.cast("double"))
                - F.sum(cd * F.log(cd)) / n.cast("double"),
                6,
            ).alias("entropy"),
            (F.count("*") >= 3).cast("long").alias("meets_distinct_3"),
        )
        .orderBy("lang", "len_bucket")
    )


@register(
    "dp_laplace_noisy_counts",
    oracle="""
    WITH cells AS (
      SELECT lang, source, count(*) AS true_n
      FROM documents
      GROUP BY lang, source
    ),
    noised AS (
      SELECT lang, source, true_n,
             (CAST(('0x' || substring(md5(lang || '|' || source), 1, 12))
                   AS BIGINT) + 0.5) / 281474976710656.0 AS u
      FROM cells
    )
    SELECT lang, source, CAST(true_n AS BIGINT) AS true_n,
           round(CASE WHEN u >= 0.5
                      THEN -round(ln(2.0 * (1.0 - u)), 6)
                      ELSE round(ln(2.0 * u), 6) END, 6) AS noise,
           round(true_n + CASE WHEN u >= 0.5
                      THEN -round(ln(2.0 * (1.0 - u)), 6)
                      ELSE round(ln(2.0 * u), 6) END, 6) AS noisy_n
    FROM noised
    ORDER BY lang, source
    """,
    tags=("privacy", "dp", "agg"),
)
def dp_laplace_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private released histogram (Laplace mechanism,
    ε = 1, sensitivity 1 ⇒ scale b = 1) over the lang × source grid —
    the noisy-counts release that completes the privacy gate quartet
    (k-anonymity, l-diversity, t-closeness, DP). Noise is SEEDED, not
    sampled: u = (md5-derived 48-bit integer + 0.5) / 2^48 is a pure
    function of the cell key — exactly representable in a double (the
    division is by a power of two), identical on every engine, run,
    and retry (the rand() trap) — then pushed through the Laplace
    inverse CDF. The only transcendental, ln, is quantized to 6 dp on
    both engines before the final add (the bigram_logprob convention).
    Seeded noise demonstrates the mechanism's plumbing reproducibly;
    a production release would swap u for a true RNG — one line — and
    everything else (grid, sensitivity, CDF, composition across cells)
    is unchanged. One map-side-combinable aggregation to the bounded
    QI grid; noise math is per-cell scalar algebra, no second scan."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("true_n"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("lang"), F.col("source"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / F.lit(281474976710656.0)  # 2^48
    noise = F.when(
        F.col("u") >= 0.5,
        -F.round(F.log(2.0 * (1.0 - F.col("u"))), 6),
    ).otherwise(F.round(F.log(2.0 * F.col("u")), 6))
    return (
        cells.select("lang", "source", "true_n", u.alias("u"))
        .select(
            "lang",
            "source",
            F.col("true_n").cast("long").alias("true_n"),
            F.round(noise, 6).alias("noise"),
            F.round(F.col("true_n") + noise, 6).alias("noisy_n"),
        )
        .orderBy("lang", "source")
    )
