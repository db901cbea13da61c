"""Independent pure-Python replays for the r9 driver-window entrants
that had no dedicated test (every other incoming entry already carries
one): text_quality_score, l_diversity_report, q5_local_supplier_volume,
synthetic_session_windows, multimodal_audio_spectral_bands. Each replay
recomputes the full result from the raw fixture (or the generator
recurrence) without Spark or DuckDB — a third engine agreeing with the
cross-engine pair."""

from __future__ import annotations

import math
import os
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from braintumor_data_pipeline_spark.registry import all_queries


def _run(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir).collect()


def _q6(x: float) -> float:
    """Spark round(col, 6): HALF_UP on the double's EXACT binary value
    (BigDecimal path) — Decimal(float) reproduces it bit-for-bit,
    where floor(x*1e6 + 0.5) could misround at representation edges."""
    return float(Decimal(x).quantize(Decimal("1e-6"), ROUND_HALF_UP))


STOPWORDS = ("the", "a", "of", "and", "to")


def test_text_quality_score_replay(spark, sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    expect = {}
    for doc_id, text, n_chars in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("n_chars").to_pylist(),
    ):
        toks = text.split(" ")
        stop_ratio = sum(1 for w in toks if w in STOPWORDS) * 1.0 / len(toks)
        punct_ratio = (
            sum(1 for ch in text if ch in ".!?,;:") * 1.0 / n_chars
        )
        len_score = min(n_chars / 500.0, 1.0)
        stop_score = max(0.0, 1.0 - abs(stop_ratio - 0.1) / 0.2)
        expect[doc_id] = _q6(
            0.4 * len_score + 0.3 * stop_score + 0.3 * (1.0 - punct_ratio)
        )
    got = {
        r["doc_id"]: r["quality"]
        for r in _run(spark, sf_dir, "text_quality_score")
    }
    assert got == expect


def test_l_diversity_replay(spark, sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    cells = defaultdict(int)
    for lang, n_chars, source in zip(
        t.column("lang").to_pylist(),
        t.column("n_chars").to_pylist(),
        t.column("source").to_pylist(),
    ):
        cells[(lang, n_chars // 100, source)] += 1
    classes = defaultdict(list)
    for (lang, lb, _src), c in cells.items():
        classes[(lang, lb)].append(c)
    rows = _run(spark, sf_dir, "l_diversity_report")
    assert len(rows) == len(classes)
    for r in rows:
        cs = classes[(r["lang"], r["len_bucket"])]
        n = sum(cs)
        assert r["n_docs"] == n
        assert r["distinct_l"] == len(cs)
        assert r["meets_distinct_3"] == (1 if len(cs) >= 3 else 0)
        ent = math.log(n) - sum(c * math.log(c) for c in cs) / n
        # entropy is the one float; its n-ary sum order is unpinned
        # across engines, so allow one ulp of the 6-dp grid
        assert math.isclose(r["entropy"], round(ent, 6), abs_tol=1.5e-6)


def test_q5_local_supplier_volume_replay(spark, sf_dir):
    def tbl(name, cols):
        t = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        return list(zip(*[t.column(c).to_pylist() for c in cols]))

    asia = {
        rk
        for rk, rn in tbl("region", ["r_regionkey", "r_name"])
        if rn == "ASIA"
    }
    nation = {
        nk: (nn, rk)
        for nk, nn, rk in tbl(
            "nation", ["n_nationkey", "n_name", "n_regionkey"]
        )
    }
    cust_nat = dict(tbl("customer", ["c_custkey", "c_nationkey"]))
    supp_nat = dict(tbl("supplier", ["s_suppkey", "s_nationkey"]))
    import datetime as dt

    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1997, 1, 1)
    order_cust = {
        ok: ck
        for ok, ck, od in tbl(
            "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
        )
        if lo <= od < hi
    }
    rev = defaultdict(Decimal)
    for ok, sk, ep, disc in tbl(
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ):
        ck = order_cust.get(ok)
        if ck is None:
            continue
        snat = supp_nat[sk]
        if cust_nat[ck] != snat:
            continue
        nn, rk = nation[snat]
        if rk not in asia:
            continue
        # dec_col: the DOUBLE product ep*(1-disc) cast to DECIMAL(38,6)
        # — Decimal(float) is the exact binary value, quantize HALF_UP
        v = Decimal(ep * (1.0 - disc)).quantize(
            Decimal("1e-6"), ROUND_HALF_UP
        )
        rev[nn] += v
    rows = _run(spark, sf_dir, "q5_local_supplier_volume")
    assert len(rows) == len(rev)
    for r in rows:
        assert math.isclose(
            r["revenue"], float(rev[r["n_name"]]), rel_tol=1e-12
        )
    got_order = [r["n_name"] for r in rows]
    assert got_order == sorted(rev, key=lambda k: -rev[k])


def test_synthetic_session_windows_replay(spark, sf_dir):
    from braintumor_data_pipeline_spark.sources.generator import (
        _MIXA,
        _MIXC,
        _MIXM,
        N_ROWS,
    )

    by_user = defaultdict(list)
    for i in range(N_ROWS):
        mix = lambda salt: (i * _MIXA + _MIXC + salt) % _MIXM  # noqa: E731
        by_user[mix(5) % 2000].append(
            (1_704_067_200 + mix(6) % (30 * 86_400), mix(8) % 10_000)
        )
    expect = set()
    for uid, evs in by_user.items():
        evs.sort()
        cur = []
        for ts, cents in evs:
            if cur and ts - cur[-1][0] > 1800:
                expect.add(
                    (uid, cur[0][0] * 1_000_000, len(cur),
                     sum(c for _t, c in cur))
                )
                cur = []
            # Spark's session_window SPLITS at gap == exactly 30 min
            # (event at session end is outside the half-open window)
            # while the gaps-and-islands oracle MERGES it; the engines
            # agree on this dataset only because the boundary never
            # occurs — assert that stays true
            assert not (cur and ts - cur[-1][0] == 1800), (
                "exact 30-minute gap: session_window vs gaps-and-islands "
                "boundary semantics would diverge"
            )
            cur.append((ts, cents))
        expect.add(
            (uid, cur[0][0] * 1_000_000, len(cur), sum(c for _t, c in cur))
        )
    got = {
        (r["user_id"], r["session_start_us"], r["n_events"], r["cents"])
        for r in _run(spark, sf_dir, "synthetic_session_windows")
    }
    assert got == expect


def test_audio_spectral_bands_replay(spark, sf_dir):
    """Replay from the raw TEXT bytes with pure-Python ints — bypassing
    the WAV container, numpy, and both engines — so a match certifies
    encode→decode round trip AND the fixed-point DFT together."""
    from braintumor_data_pipeline_spark.operators.multimodal import (
        SPEC_BINS,
        SPEC_COS,
        SPEC_SIN,
        SPEC_WIN,
    )

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    expect = {}
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        if doc_id >= 100:
            continue
        samples = [b * 257 - 32768 for b in text.encode("utf-8")[:2048]]
        energies = [0] * len(SPEC_BINS)
        n_win = len(samples) // SPEC_WIN
        for w in range(n_win):
            win = samples[w * SPEC_WIN : (w + 1) * SPEC_WIN]
            for bi in range(len(SPEC_BINS)):
                re = sum(s * c for s, c in zip(win, SPEC_COS[bi]))
                im = sum(s * c for s, c in zip(win, SPEC_SIN[bi]))
                energies[bi] += re * re + im * im
        for bi, k in enumerate(SPEC_BINS):
            expect[(doc_id, k)] = energies[bi]
    got = {
        (r["key"], r["bin"]): r["energy"]
        for r in _run(spark, sf_dir, "multimodal_audio_spectral_bands")
    }
    assert got == expect
    assert len(got) > 0
