"""Classic decision-support planner shapes (TPC-H-derived) on the
fixture star schema — SURVEY §2.5 J4 breadth.

The reference delegates its whole relational layer to BigQuery
(`/root/reference/README.md:165-178`); these queries exercise the plan
shapes any warehouse workload hits that the rest of the catalog does
not: outer-join count distributions (Q13), HAVING-subquery semi joins
(Q18), min-per-group correlated scalar subqueries (Q2), conditional-
aggregate ratios (Q8), and EXISTS / NOT EXISTS pairs over the same fact
table (Q21). Fixtures lack partsupp/commitdate, so each shape is recast
onto the columns that exist — the *plan* shape, not the TPC-H text, is
the point.

Scale notes (100 TB): every dim join is broadcast; fact-fact joins
shuffle once on the join key; the Q21 shape reuses one shuffle of
lineitem by l_orderkey for both the EXISTS and NOT-EXISTS sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table as _t


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "agg"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders, including
    k=0 — LEFT OUTER join preserved through a two-level aggregation.
    count(o_orderkey) (not count(*)) so null-extended rows count 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q18_large_order_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(o_totalprice, 6) AS total,
           round(sum(l_quantity), 6) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "subquery", "agg", "topk"),
)
def q18_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders — an
    aggregate-HAVING subquery applied as a semi join before the
    three-way join, so only qualifying orders are joined at all."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 6).alias("total"),
            "sum_qty",
        )
        .orderBy(F.desc("total"), "o_orderkey")
        .limit(100)
    )


@register(
    "q2_min_price_per_part",
    oracle="""
    SELECT p_partkey, p_name, l_suppkey,
           round(l_extendedprice, 6) AS min_price
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE l_extendedprice = (
      SELECT min(l2.l_extendedprice) FROM lineitem l2
      WHERE l2.l_partkey = p_partkey
    )
    """,
    tags=("join", "subquery"),
)
def q2_min_price_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the supplier(s) offering it at the
    minimum observed price — a correlated scalar subquery decorrelated
    into aggregate-then-join-back (ties kept, exactly as the SQL
    formulation keeps them)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    mins = li.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price_raw")
    )
    return (
        li.join(
            mins,
            (li.l_partkey == mins.mk)
            & (li.l_extendedprice == mins.min_price_raw),
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "l_suppkey",
            F.round("l_extendedprice", 6).alias("min_price"),
        )
    )


@register(
    "q8_market_share_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           round(sum(CASE WHEN r_name = 'AMERICA'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS america_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY year(o_orderdate)
    ORDER BY y
    """,
    tags=("join", "agg"),
)
def q8_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one region's share of global revenue per order
    year — conditional aggregation ratio over a 5-way star join (all
    dims broadcast; the only shuffles are lineitem⋈orders and the final
    per-year aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.round(
                F.sum(F.when(F.col("r_name") == "AMERICA", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("america_share")
        )
        .orderBy("y")
    )


@register(
    "q21_sole_returning_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("join", "subquery", "agg"),
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: on finished multi-supplier orders, suppliers who
    were the ONLY one whose items came back ('R') — the classic
    EXISTS + NOT EXISTS pair over the same fact table, planned as a
    semi join then an anti join, both shuffling lineitem on l_orderkey
    (one exchange reused across both sides under AQE)."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    base = l1.join(
        o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi"
    )
    with_other = base.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate < DATE '1996-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("join", "agg"),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts split by a priority IN-list
    after a fact-fact join with a pushed date range."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-06-01'
      AND l_shipdate < DATE '1995-07-01'
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage for one month —
    conditional-agg ratio after a broadcast dim join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-06-01")
        & (F.col("l_shipdate") < "1995-07-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "filter", "agg"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides —
    the planner keeps the join equi (on partkey) and evaluates the
    disjunction post-join; per-side conjuncts that appear in every
    branch would be pushed below (none do here, as in the original)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue")
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust,
           round(sum(c_acctbal), 6) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '1998-01-01'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "subquery", "agg"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers gone quiet
    (no orders since 1998) — scalar subquery (tiny broadcast) +
    NOT EXISTS anti join on a filtered fact, grouped by segment
    (segment stands in for the original's phone-prefix country code;
    every fixture customer has SOME order, so recency is the idleness
    predicate)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-01-01"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
