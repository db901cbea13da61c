"""Spark 4 recursive CTEs (`WITH RECURSIVE`) — the engine-native
iteration surface.

The repo's other iterative operators (region growing, connected
components, PageRank) drive iteration from Python loops with
localCheckpoint barriers because they predate a usable engine
recursion; Spark 4 ships `WITH RECURSIVE` (UNION ALL form), so this
module covers that surface with a computation that provably NEEDS
recursion: a **clamped running balance** — balance_i = max(0,
balance_{i-1} + delta_i). The clamp makes the fold non-associative, so
no window-function rewrite exists (a plain SUM() OVER is wrong the
moment any prefix dips below zero); it is the canonical "recursion or
nothing" SQL example (credit limits, inventory floors, battery
state-of-charge).

Scale shape: the recursion advances ONE row per key per step, joined
against the sequenced relation on (key, seq) — a keyed shuffle join
per iteration, fully parallel across keys; depth is bounded by the
longest per-key chain (≤ 25 orders/customer on every fixture SF, far
under Spark's recursion limit). For 100 TB chains thousands deep, the
checkpointed Pregel loop (`components.py`) remains the path; this is
the engine-native tier for bounded-depth folds.

Determinism: deltas are exact integer cents (floor(x·100 + 0.5)), the
fold order is pinned by (custkey, o_orderkey), and the oracle runs the
IDENTICAL recursive SQL in DuckDB — integer arithmetic end-to-end, no
accumulation-order ambiguity on either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.fixtures import load_table as _t

#: The sequenced-ledger CTE: per customer, orders in key order, each
#: contributing ±cents (even orderkeys deposit, odd ones withdraw).
_ORD_SQL = """
      SELECT o_custkey AS custkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderkey) AS INT) AS seq,
             CASE WHEN o_orderkey % 2 = 0 THEN c ELSE -c END AS delta
      FROM (SELECT o_custkey, o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
            FROM orders)
"""

_RCTE_SQL = f"""
    WITH RECURSIVE ord AS ({_ORD_SQL}),
    bal(custkey, seq, balance) AS (
      SELECT custkey, CAST(0 AS INT), CAST(0 AS BIGINT)
      FROM (SELECT DISTINCT custkey FROM ord)
      UNION ALL
      SELECT b.custkey, b.seq + 1,
             greatest(CAST(0 AS BIGINT), b.balance + o.delta)
      FROM bal b JOIN ord o
        ON o.custkey = b.custkey AND o.seq = b.seq + 1
    )
    SELECT b.custkey, b.seq AS n_orders, b.balance AS final_balance_cents
    FROM bal b
    JOIN (SELECT custkey, max(seq) AS ms FROM bal GROUP BY custkey) m
      ON b.custkey = m.custkey AND b.seq = m.ms
"""


@register(
    "rcte_clamped_balance",
    oracle=_RCTE_SQL,
    tags=("recursive", "iterative", "window"),
)
def rcte_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer clamped running balance via Spark 4's native
    ``WITH RECURSIVE`` — byte-identical SQL on both engines (the oracle
    IS this query's text), the one formulation in the catalog where
    Spark and DuckDB execute the same recursion rather than
    independently-derived plans. Output: each customer's order count
    and final floor-clamped balance in exact integer cents."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RCTE_SQL)
