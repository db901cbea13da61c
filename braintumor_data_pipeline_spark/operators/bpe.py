"""Byte-pair-encoding tokenizer training + application (north-star
LLM-pipeline extension; completes the token-counting surface of
``text.py`` with a LEARNED subword vocabulary).

Architecture (the production shape, e.g. Sennrich '16 / HF trainers):

1. **Word-type counting is the distributed pass** — one groupBy over the
   corpus builds (word, freq). By Zipf's law the type table is tiny
   relative to the corpus (500 docs → ~3k types here; a 100 TB corpus
   caps it by top-K types, which loses only hapax mass irrelevant to
   merge ranking).
2. **Merge learning is driver-side over the type table** — the classic
   frequency-weighted pair-merge loop. Deterministic: pair rank =
   (count DESC, left ASC, right ASC); no RNG, no float.
3. **Applying the tokenizer is distributed again** — the learned merge
   list rides in the task closure (model state, a few hundred bytes)
   and ``mapInPandas`` encodes each document.

Steps 1 and 3 scale with the data; step 2 scales with the vocabulary —
the same mini-model pattern as the IVF/PQ codebooks.

Both registered queries are deterministic end to end and (since r4)
hash-checked against RECOMPUTING DuckDB oracles that replay the merge
loop and the encode loop as unrolled/recursive CTEs — BPE has no float
anywhere, so the replay is exact by construction.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table as _t

BPE_MERGES = 30
END_MARK = "</w>"  # word-final marker so merges can't cross words

#: Driver-memory bound on the collected type table (VERDICT r3 item 1).
#: Zipf's law keeps real vocabularies far below this, but 100 TB of
#: noisy web text can push the RAW type table to 10⁸-10⁹ rows (typos,
#: base64 blobs, boilerplate ids) — so the collect is capped to the
#: top ``MAX_WORD_TYPES`` by (freq DESC, word ASC) after a
#: ``MIN_WORD_FREQ`` cutoff. Dropping the sub-cutoff tail loses only
#: hapax mass that cannot influence merge ranking until vocab sizes
#: approach the cap itself (standard tokenizer-training practice; HF
#: trainers expose the same two knobs). On the sf0.01 fixture (~3k
#: types) neither knob binds, so the oracle-checked outputs are
#: unchanged — pinned by test_bpe.
MAX_WORD_TYPES = 262_144
MIN_WORD_FREQ = 1


def _word_freqs(spark: SparkSession, sf_dir: str) -> list[tuple[str, int]]:
    """(word, freq) collected to the driver — the type table (step 1).
    Sorted (freq DESC, word ASC) so iteration order is deterministic.
    The collect is BOUNDED: freq >= MIN_WORD_FREQ, then the top
    MAX_WORD_TYPES under the same (freq DESC, word ASC) total order —
    which Spark plans as TakeOrderedAndProject (distributed per-partition
    top-K, never a global sort), so driver memory is O(MAX_WORD_TYPES)
    regardless of corpus size."""
    d = _t(spark, sf_dir, "documents")
    rows = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= MIN_WORD_FREQ)
        .orderBy(F.col("freq").desc(), F.col("w").asc())
        .limit(MAX_WORD_TYPES)
        .collect()
    )
    return sorted(((r.w, r.freq) for r in rows), key=lambda t: (-t[1], t[0]))


def learn_bpe_merges(
    freqs: list[tuple[str, int]], n_merges: int = BPE_MERGES
) -> list[tuple[str, str, int]]:
    """Frequency-weighted BPE merge learning (step 2): symbols start as
    characters (+ END_MARK on the last), each round merges the most
    frequent adjacent pair. Ties break (left ASC, right ASC) — fully
    deterministic. Returns [(left, right, pair_count_at_merge)]."""
    words: list[tuple[list[str], int]] = [
        (list(w[:-1]) + [w[-1] + END_MARK], f) for w, f in freqs if w
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, c))
        ab = a + b
        for k, (syms, f) in enumerate(words):
            i = 0
            out = []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[k] = (out, f)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest-rank-first (the standard
    BPE encode loop)."""
    syms = list(word[:-1]) + [word[-1] + END_MARK] if word else []
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


@register(
    "bpe_learn_merges",
    oracle=None,  # assigned below by _merges_oracle() — kept adjacent
    tags=("text", "tokenizer", "iterative"),
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: rank, the merged pair, and the
    frequency-weighted pair count at merge time. Hash-checking this
    pins the whole training chain — corpus word counts, pair statistics,
    and the deterministic tie-break ordering.

    r4 upgrade (was a frozen sf0.01 golden): the oracle REPLAYS THE
    TRAINING LOOP — 30 unrolled rounds, each a pair-count aggregate, a
    (count DESC, pair ASC) argmax, and a recursive CTE that rewrites
    every word's symbol sequence with the exact left-to-right
    non-overlapping replacement semantics of the Python loop. There is
    NO float anywhere in BPE training — counts, strings, and integer
    positions only — so the replay is exact by construction at any SF
    (UTF-8 byte order ≡ code-point order keeps the tie-break
    identical)."""
    merges = learn_bpe_merges(_word_freqs(spark, sf_dir))
    return spark.createDataFrame(
        [
            (i, a, b, a + b, int(c))
            for i, (a, b, c) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string, pair_count long",
    )


def _merges_oracle() -> str:
    """DuckDB replay of learn_bpe_merges (see the query docstring).

    Symbol state s{i} is (wid=word, pos, sym); each round appends:
      p{i}    adjacent-pair counts weighted by word freq,
      best{i} the (count DESC, s1 ASC, s2 ASC) winner (≡ Python's
              min((-count, pair))),
      r{i}    a RECURSIVE left-to-right scan — each row is "output
              symbol #outp, next input position nxt"; a pair match
              consumes 2 input symbols, else 1; NULL next-symbol
              comparisons are false, exactly like the i+1 < len guard,
      s{i+1}  the rewritten sequences re-indexed by outp.
    """
    rounds = []
    for i in range(BPE_MERGES):
        rounds.append(
            f"""
    p{i} AS MATERIALIZED (
      SELECT a.sym AS s1, b.sym AS s2, sum(wf.freq) AS c
      FROM s{i} a
      JOIN s{i} b ON b.wid = a.wid AND b.pos = a.pos + 1
      JOIN wf ON wf.w = a.wid
      GROUP BY a.sym, b.sym
    ),
    best{i} AS MATERIALIZED (SELECT s1, s2, c FROM p{i} ORDER BY c DESC, s1, s2 LIMIT 1),
    r{i} AS (
      SELECT s.wid,
             CASE WHEN s.sym = b.s1 AND nx.sym = b.s2 THEN 2 ELSE 1 END
               AS nxt,
             0 AS outp,
             CASE WHEN s.sym = b.s1 AND nx.sym = b.s2 THEN b.s1 || b.s2
                  ELSE s.sym END AS osym
      FROM s{i} s
      CROSS JOIN best{i} b
      LEFT JOIN s{i} nx ON nx.wid = s.wid AND nx.pos = 1
      WHERE s.pos = 0
      UNION ALL
      SELECT r.wid,
             r.nxt + CASE WHEN cur.sym = b.s1 AND nx.sym = b.s2
                          THEN 2 ELSE 1 END,
             r.outp + 1,
             CASE WHEN cur.sym = b.s1 AND nx.sym = b.s2 THEN b.s1 || b.s2
                  ELSE cur.sym END
      FROM r{i} r
      JOIN s{i} cur ON cur.wid = r.wid AND cur.pos = r.nxt
      CROSS JOIN best{i} b
      LEFT JOIN s{i} nx ON nx.wid = r.wid AND nx.pos = r.nxt + 1
    ),
    s{i + 1} AS MATERIALIZED (SELECT wid, outp AS pos, osym AS sym FROM r{i})"""
        )
    finals = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, s1, s2, c FROM best{i}"
        for i in range(BPE_MERGES)
    )
    prefix = f"""
    WITH RECURSIVE
    wf AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w
      HAVING count(*) >= {MIN_WORD_FREQ}
      ORDER BY freq DESC, w LIMIT {MAX_WORD_TYPES}
    ),
    s0 AS MATERIALIZED (
      SELECT w AS wid, i AS pos,
             substring(w, CAST(i + 1 AS INT), 1)
               || CASE WHEN i = length(w) - 1 THEN '{END_MARK}'
                       ELSE '' END AS sym
      FROM (SELECT w, unnest(range(length(w))) AS i FROM wf)
    ),{",".join(rounds)}"""
    return prefix, finals


def _merges_oracle_sql() -> str:
    prefix, finals = _merges_oracle()
    return f"""{prefix}
    SELECT CAST(rank AS INT) AS rank, s1 AS "left", s2 AS "right",
           s1 || s2 AS merged, CAST(c AS BIGINT) AS pair_count
    FROM ({finals})
    """


def _encode_oracle_sql() -> str:
    """DuckDB replay of bpe_encode_stats: the training chain (above)
    feeds a rank LIST constant (pair keys joined by a \\x01 separator,
    ordered by rank), and encoding is a second recursion whose state is
    each distinct token's full symbol LIST — every step merges the
    (lowest-rank, then leftmost) adjacent pair, exactly the
    ``encode_word`` loop. list_position gives rank lookup without a
    join, so the recursive member stays aggregate-free; per-doc stats
    then join tokens (with multiplicity) to encoded lengths. Pure
    strings and integers — no float anywhere."""
    prefix, finals = _merges_oracle()
    sep = "chr(1)"
    # candidate (rank, idx) pairs for the current symbol list; rank via
    # list_position over the 30-key list (0 = absent)
    cands = (
        f"list_transform(range(1, length(syms)), i -> struct_pack("
        f"r := list_position(mk.keys, syms[CAST(i AS INT)] || {sep} "
        f"|| syms[CAST(i + 1 AS INT)]), i := i))"
    )
    # min over candidates with r > 0, lexicographic (r, i) — mirrors
    # "strictly smaller rank wins, first occurrence kept"
    best = (
        f"list_reduce(list_prepend(struct_pack(r := 2147483647, "
        f"i := CAST(0 AS BIGINT)), list_filter({cands}, c -> c.r > 0)), "
        f"(acc, c) -> CASE WHEN c.r < acc.r THEN c ELSE acc END)"
    )
    return f"""{prefix},
    mk AS MATERIALIZED (
      SELECT list(s1 || {sep} || s2 ORDER BY rank) AS keys
      FROM ({finals})
    ),
    toks AS MATERIALIZED (
      SELECT DISTINCT w FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ),
    init AS MATERIALIZED (
      SELECT w, list(
               substring(w, CAST(i + 1 AS INT), 1)
                 || CASE WHEN i = length(w) - 1 THEN '{END_MARK}'
                         ELSE '' END ORDER BY i) AS syms
      FROM (SELECT w, unnest(range(length(w))) AS i FROM toks)
      GROUP BY w
    ),
    enc AS (
      SELECT w, syms, 0 AS step FROM init
      UNION ALL
      SELECT e.w,
             list_slice(e.syms, 1, CAST(b.i - 1 AS INT))
               || [e.syms[CAST(b.i AS INT)] || e.syms[CAST(b.i + 1 AS INT)]]
               || list_slice(e.syms, CAST(b.i + 2 AS INT),
                             CAST(length(e.syms) AS INT)),
             e.step + 1
      FROM (SELECT e.w, e.syms, e.step, {best} AS b
            FROM enc e CROSS JOIN mk
            WHERE length(e.syms) > 1) e(w, syms, step, b)
      WHERE b.r < 2147483647
    ),
    encoded AS MATERIALIZED (
      SELECT w, min_by(len, -step) AS n_sym FROM (
        SELECT w, step, length(syms) AS len FROM enc) GROUP BY w
    ),
    dtok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    )
    SELECT d.doc_id,
           count(*) AS n_ws_tokens,
           CAST(sum(e.n_sym) AS BIGINT) AS n_bpe_symbols,
           CAST((sum(e.n_sym) * 1000000) // count(*) AS BIGINT)
             AS symbols_per_word_micro
    FROM dtok d JOIN encoded e ON e.w = d.w
    WHERE d.w <> ''
    GROUP BY d.doc_id
    """


# attach the generated recomputing oracles (registered with None above /
# replacing the r1-r3 frozen golden below)
from ..registry import _REGISTRY as _REG  # noqa: E402

_REG["bpe_learn_merges"].oracle = _merges_oracle_sql()


@register(
    "bpe_encode_stats",
    oracle=_encode_oracle_sql(),
    tags=("text", "tokenizer", "udf"),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide tokenizer application (step 3): per document, the
    whitespace token count, the BPE symbol count under the learned
    merges, and the resulting compression ratio — the fertility metric
    a tokenizer change must report before a training run. The merge
    table rides in the closure; encoding is one mapInPandas pass.

    r4 upgrade (was a frozen sf0.01 golden): the oracle replays
    training AND encoding — see :func:`_encode_oracle_sql`."""
    import pandas as pd

    merges = learn_bpe_merges(_word_freqs(spark, sf_dir))
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def enc(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split(" ") if w]
                n_bpe = sum(len(encode_word(w, ranks)) for w in words)
                n_ws = len(words)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_ws_tokens": n_ws,
                        "n_bpe_symbols": n_bpe,
                        "symbols_per_word_micro": (
                            (n_bpe * 1_000_000) // n_ws if n_ws else 0
                        ),
                    }
                )
            yield pd.DataFrame(out)

    return d.mapInPandas(
        enc,
        schema="doc_id long, n_ws_tokens long, n_bpe_symbols long,"
        " symbols_per_word_micro long",
    )
