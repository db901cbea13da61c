"""BPE tokenizer training/encoding tests (operators/bpe.py)."""

from __future__ import annotations

from braintumor_data_pipeline_spark.operators.bpe import (
    END_MARK,
    encode_word,
    learn_bpe_merges,
)


def test_learn_merges_hand_example():
    """Sennrich-style toy corpus: 'low'×5, 'lower'×2, 'newest'×6,
    'widest'×3 — the famous example where ('e','s') then ('es','t')
    merge first (newest+widest dominate)."""
    freqs = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = learn_bpe_merges(freqs, n_merges=4)
    assert merges[0][:2] == ("e", "s")  # 6+3 = 9 occurrences
    assert merges[1][:2] == ("es", "t" + END_MARK)  # t is word-final
    assert merges[0][2] == 9
    # subsequent merges keep consuming the dominant word forms
    assert all(c >= 1 for _, _, c in merges)


def test_learn_merges_tie_break_deterministic():
    """Equal-count pairs must merge in (left, right) lexicographic
    order — the determinism contract the pinned golden relies on."""
    # 'ab' and 'cd' each appear once; ('a','b') wins over ('c','d')
    merges = learn_bpe_merges([("ab", 1), ("cd", 1)], n_merges=1)
    assert merges[0][:2] == ("a", "b" + END_MARK)


def test_encode_word_applies_merges_in_rank_order():
    freqs = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = learn_bpe_merges(freqs, n_merges=10)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    syms = encode_word("newest", ranks)
    # round-trip: concatenating symbols reproduces the word + END_MARK
    assert "".join(syms) == "newest" + END_MARK
    # trained vocabulary compresses the training word below char count
    assert len(syms) < len("newest")


def test_encode_unknown_word_falls_back_to_chars():
    ranks = {}
    syms = encode_word("xyz", ranks)
    assert syms == ["x", "y", "z" + END_MARK]
    assert encode_word("", ranks) == []


def test_word_freq_collect_is_capped_and_unbinding_on_fixture(spark):
    """The type-table collect is bounded (top MAX_WORD_TYPES after a
    MIN_WORD_FREQ cutoff) — and on the fixture neither knob binds, so
    the frozen bpe goldens are untouched: capped result == uncapped
    groupBy. Also pin that the cap plans as TakeOrderedAndProject
    (distributed top-K), never a global sort."""
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.operators import bpe
    from braintumor_data_pipeline_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.01"
    capped = bpe._word_freqs(spark, sf)
    d = load_table(spark, sf, "documents")
    raw = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    uncapped = sorted(((r.w, r.freq) for r in raw), key=lambda t: (-t[1], t[0]))
    assert capped == uncapped
    assert len(capped) < bpe.MAX_WORD_TYPES

    plan = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= bpe.MIN_WORD_FREQ)
        .orderBy(F.col("freq").desc(), F.col("w").asc())
        .limit(bpe.MAX_WORD_TYPES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:800]
