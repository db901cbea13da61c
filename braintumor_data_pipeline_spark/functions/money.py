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
