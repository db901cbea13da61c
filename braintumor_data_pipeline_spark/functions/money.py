"""Hash-stable money aggregation (VERDICT r2 item 1).

``round(sum(<double>), 6)`` is NOT order-independent: Spark's two-phase /
salted accumulation sums doubles in a different order than DuckDB's
single-phase sum, and at money magnitudes (sum(l_extendedprice) ~1e9 at
sf0.01) the ~n·eps low-bit drift (~1e-3 absolute) can straddle a
``round(x, 6)`` half-way boundary — the root cause of the
``salted_heavy_key_agg`` driver hash flake in round 2.

Fix: make the sum exact and order-independent on BOTH engines:

1. keep the per-row expression in DOUBLE (IEEE arithmetic is
   bit-identical across Spark and DuckDB);
2. cast each row value to ``DECIMAL(38,6)`` *before* summing. This cast
   is deterministic and engine-independent: no IEEE double is ever
   exactly halfway between two multiples of 1e-6 (a tie would need the
   non-dyadic 5e-7 to be representable), so nearest-rounding gives the
   same decimal on both engines regardless of tie-break mode;
3. the decimal sum is exact integer arithmetic — any accumulation order
   yields the same value;
4. cast the final sum back to DOUBLE (one deterministic rounding) so the
   driver's schema compare sees the same type both sides.

Spark side: ``dec_sum(col_or_expr)``; DuckDB side: ``oracle_dec_sum(expr)``
produces ``CAST(sum(CAST(expr AS DECIMAL(38,6))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def dec_col(col: Column | str) -> Column:
    """Per-row double → DECIMAL(38,6), the order-independent summand."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_DEC)


def dec_sum(col: Column | str) -> Column:
    """Exact, order-independent money sum, surfaced as DOUBLE.

    Replaces the flaky ``F.round(F.sum(x), 6)`` pattern.
    """
    return F.sum(dec_col(col)).cast("double")


def oracle_dec_sum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dec_sum` for oracle SQL strings."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Split-sum fast path (hot/bench queries).
#
# DECIMAL(38,6) aggregation buffers exceed Spark's 18-digit long-backed
# Decimal fast path, so every partial sum churns BigDecimal objects —
# measured ~3× slower than double sums on the TPC-H Q1 shape. The split
# sum keeps exactness AND the whole-stage-codegen long path:
#
# 1. quantize each row to integer micro-units with one double multiply
#    and a floor: m = floor(x·1e6 + 0.5) — pure codegen, identical IEEE
#    result on Spark and DuckDB (inputs are NONNEGATIVE money/measure
#    columns; floor(+0.5) == round-half-up there);
# 2. sum m's low 20 bits and high bits as two LONG aggregates. Overflow
#    headroom: per-row hi ≤ max_money·1e6/2^20 (~5e5 for TPC-H money), so
#    ~1e13 rows per group before a long overflows — far beyond 100 TB;
# 3. recombine exactly in DECIMAL(38,0) (hi·2^20 + lo), cast to DOUBLE
#    (one IEEE nearest rounding), divide by 1e6 (second identical
#    rounding). DuckDB mirrors with its exact HUGEINT sum(m) followed by
#    the same two roundings — bit-identical doubles, hash-stable.
#
# Quantization truncates the true value to the nearest micro-unit — the
# declared semantics of these money aggregates — so a split-sum query
# and a dec_sum query may differ in the 7th decimal; each query uses ONE
# formulation mirrored on both engines.
# ---------------------------------------------------------------------------

SPLIT_BASE = 1 << 20


def micros_col(col: Column | str) -> Column:
    """floor(x·1e6 + 0.5): exact micro-unit quantization (nonneg input)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(1e6) + F.lit(0.5))


def split_sum_aggs(col: Column | str, name: str) -> list[Column]:
    """Two LONG partial aggregates (low 20 bits / high bits) for an exact
    money sum; pair with :func:`split_sum_value` in a post-agg select."""
    m = micros_col(col)
    return [
        F.sum(m.bitwiseAND(SPLIT_BASE - 1)).alias(f"__{name}_lo"),
        F.sum(F.shiftright(m, 20)).alias(f"__{name}_hi"),
    ]


def split_sum_value(name: str) -> Column:
    """Recombine the split partials into the exact sum, as DOUBLE."""
    total = (
        F.col(f"__{name}_hi").cast("decimal(38,0)") * F.lit(SPLIT_BASE)
        + F.col(f"__{name}_lo")
    )
    return total.cast("double") / F.lit(1e6)


def oracle_split_sum(expr: str) -> str:
    """DuckDB mirror of a split sum: HUGEINT-exact sum of the same
    quantized micros, then the same double cast and division."""
    m = f"CAST(floor(({expr}) * 1e6 + 0.5) AS BIGINT)"
    return f"(CAST(sum({m}) AS DOUBLE) / 1e6)"
