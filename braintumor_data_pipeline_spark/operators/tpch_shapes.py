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

from ..functions.money import dec_col, dec_sum
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
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
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
        .agg(dec_sum("l_quantity").alias("sum_qty"))
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
           round(CAST(sum(CAST(CASE WHEN r_name = 'AMERICA' THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS america_share
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
                F.sum(dec_col(F.when(F.col("r_name") == "AMERICA", rev).otherwise(0.0))).cast("double")
                / F.sum(dec_col(rev)).cast("double"),
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
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
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
             100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS promo_share
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
                * F.sum(dec_col(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))).cast("double")
                / F.sum(dec_col(rev)).cast("double"),
                6,
            ).alias("promo_share")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
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
        F.sum(dec_col(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast("double").alias("revenue")
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
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
            dec_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1996-03-15'
      AND l_shipdate > DATE '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one market segment —
    date predicates pushed to BOTH fact scans before the join, customer
    reduced to a broadcast semi filter, TakeOrderedAndProject on top.
    Ordering is on the ROUNDED revenue (+ key tiebreak) so both engines
    cut the same prefix despite low-bit summation differences."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec_col(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast("double").alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where the customer and the supplier share
    a nation — the distinguishing feature is the EXTRA equality between
    two dimension keys reached through different fact columns
    (c_nationkey = s_nationkey), evaluated post-join while every dim
    stays broadcast; the only shuffles are orders⋈lineitem and the
    final per-nation aggregate."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .groupBy("n_name")
        .agg(
            F.sum(dec_col(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate query — no join at
    all. Every predicate (date range, discount band, quantity cap) is
    pushdown-eligible; at 100 TB this is the query where parquet
    row-group min/max statistics do all the work and the aggregate is a
    single partial+final reduction with no wide exchange."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec_col(F.col("l_extendedprice") * F.col("l_discount"))).cast("double").alias("revenue")
        )
    )


@register(
    "q7_nation_pair_volume",
    oracle="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    ORDER BY cust_nation, supp_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between a nation PAIR —
    the same dimension table joined twice under different roles
    (customer's nation vs supplier's nation) with a symmetric OR
    predicate across the two aliases. Both nation joins broadcast; the
    disjunction prunes to two nations per side before the wide join."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | (
        (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(dec_col(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast("double").alias("revenue")
        )
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@register(
    "q11_important_supplier_value",
    oracle="""
    WITH supp_value AS (
      SELECT l_suppkey, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS value
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, round(value, 6) AS value
    FROM supp_value
    WHERE value > (SELECT CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 0.012 FROM supp_value)
    ORDER BY value DESC, l_suppkey
    """,
    tags=("agg", "subquery"),
)
def q11_important_supplier_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate exceeds a FRACTION of the
    global total — an aggregate compared against a scalar subquery over
    the same aggregation (HAVING sum > 0.012 * total). The per-group agg
    is computed once, reused for both sides; the global total is a
    1-row broadcast. (Fixture has no partsupp, so supplier shipped
    value stands in for stock value.)"""
    li = _t(spark, sf_dir, "lineitem")
    sv = li.groupBy("l_suppkey").agg(
        F.sum(dec_col(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("v")
    )
    total = sv.agg((F.sum(dec_col("v")).cast("double") * 0.012).alias("threshold"))
    return (
        sv.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("threshold"))
        .select("l_suppkey", F.round("v", 6).alias("value"))
        .orderBy(F.desc("value"), "l_suppkey")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum(l_quantity) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_qty, 6) AS total_qty
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_qty = (SELECT max(total_qty) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("agg", "subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the group(s) achieving the global maximum of an
    aggregate — agg once, take max of the agg as a 1-row broadcast,
    equality-join back (ties kept). The measure is summed QUANTITY
    (integral doubles → exact sums), so the max-equality is stable
    across engines, unlike a float revenue sum."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum("l_quantity").alias("tq")
    )
    mx = rev.agg(F.max("tq").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("tq") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("tq", 6).alias("total_qty"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("join", "subquery", "agg", "distinct"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding a blacklist via NOT IN — planned as an anti join (valid
    here because s_suppkey is non-null; a nullable NOT IN column would
    need the null-aware anti join Spark plans for that case). The
    distinct-agg expands to a two-level aggregation on a cluster."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("join", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below a correlated PER-GROUP average —
    decorrelated into avg-per-partkey then join-back with an inequality
    (the same rewrite Catalyst and every warehouse planner performs).
    The per-part avg only needs the brand's parts, so the brand filter
    is semi-joined into the subquery side before aggregating — at
    100 TB that shrinks the avg input by the brand selectivity."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
    avgs = brand_li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        brand_li.join(F.broadcast(avgs), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(dec_sum("l_extendedprice") / 7.0, 6).alias("avg_yearly")
        )
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_type = 'PROMO' AND p_size <= 5
      )
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100
    )
    ORDER BY s_name
    """,
    tags=("join", "subquery", "agg"),
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers who moved
    serious volume of a part subset in a window. Planned inside-out as
    stacked semi joins: part-filter semi-join into lineitem, aggregate
    with HAVING, then semi-join into supplier. No fact row is ever
    widened; each IN level only ever flows keys."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    pp = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 5)
    ).select("p_partkey")
    movers = (
        li.join(F.broadcast(pp), li.l_partkey == pp.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(movers), s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "filter"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name LIKE family. The fixture lacks partsupp.supplycost, so
    cost is proxied as 0.6·p_retailprice·quantity — the SHAPE is the
    point: a contains-LIKE (not prefix — no pushdown to stats, it
    evaluates in the scan), four joins with every dim broadcast, and a
    two-key aggregate. The LIKE prunes part BEFORE its broadcast, so
    the fact join fans out only matching parts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(dec_col(profit)).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )
