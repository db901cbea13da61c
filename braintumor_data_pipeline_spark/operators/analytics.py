"""Analytics breadth: statistical aggregates, extended window functions,
pivot, string/array scalar libraries, subquery shapes (SURVEY §2.4, §2.8,
X18 extensions — all N* engine-surface operators, pure built-ins)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import dec_col, dec_sum
from ..caching import persist_tracked
from ..registry import register
from ..sources.fixtures import load_table as _t


@register(
    "agg_statistics",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_pop(l_quantity, l_extendedprice), 6) AS qty_price_covar,
           round(var_pop(l_discount), 6) AS disc_var,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           round(min(l_extendedprice), 6) AS min_price,
           round(max(l_extendedprice), 6) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate library: corr, covar_pop, var_pop, exact
    interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`). All partial-aggregable."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_covar"
        ),
        F.round(F.var_pop("l_discount"), 6).alias("disc_var"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.9), 6).alias("p90_price"),
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           round(first_value(o_totalprice) OVER w, 6) AS first_total,
           round(nth_value(o_totalprice, 2) OVER w, 6) AS second_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window spec."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("o_totalprice").over(w), 6).alias("first_total"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 6).alias("second_total"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 6) AS total,
           count(*) OVER (
             ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
           ) AS n_within_1k
    FROM orders
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based): how many orders price within ±1000.

    NOT a global ``Window.orderBy(price).rangeBetween(...)`` — an
    unpartitioned window collapses the whole table into one partition
    (WindowExec warns, and at scale it is a non-starter). The same
    semantics distribute as a band join: bucket by floor(price/width),
    replicate one side to its 3 adjacent buckets, equi-join on bucket,
    keep |price diff| ≤ width, count per row. Shuffles on uniform bucket
    keys; AQE handles any residual skew.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    width = 1000
    probe = o.withColumn("b", F.floor(F.col("o_totalprice") / width))
    build = o.select(F.col("o_totalprice").alias("p2")).withColumn(
        "b",
        F.explode(
            F.array(
                F.floor(F.col("p2") / width) - 1,
                F.floor(F.col("p2") / width),
                F.floor(F.col("p2") / width) + 1,
            )
        ),
    )
    return (
        probe.join(build, "b")
        .filter(
            (F.col("p2") >= F.col("o_totalprice") - width)
            & (F.col("p2") <= F.col("o_totalprice") + width)
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("*").alias("n_within_1k"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 6).alias("total"),
            "n_within_1k",
        )
    )


@register(
    "pivot_event_type_counts",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "pivot"),
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit = one-pass, no distinct
    pre-scan); oracle spells it as conditional aggregation."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    # pivot yields NULL for absent combos; the CASE form yields 0
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("click", "error", "purchase", "signup", "view")
        ],
    )


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000001') AS lev_dist,
           concat(upper(substring(lower(c_name), 1, 1)),
                  substring(lower(c_name), 2)) AS name_title,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           reverse(c_name) AS name_rev,
           substring(c_name, 1, 8) AS name_prefix,
           concat_ws('|', c_name, c_mktsegment) AS joined
    FROM customer
    """,
    tags=("projection", "scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar breadth: edit distance, casing, padding, translate,
    reverse — all JVM built-ins (X18 extension)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000001")).alias("lev_dist"),
        F.initcap(F.lower("c_name")).alias("name_title"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.reverse("c_name").alias("name_rev"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'min'), 6) AS vmin,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS vmax,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')
                 / len(embedding), 6) AS vmean,
           round(list_aggregate(
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'),
             6) AS sq_sum,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_coord
    FROM embeddings
    """,
    tags=("projection", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    multimodal 'typed payload column' pattern, all JVM-side."""
    e = _t(spark, sf_dir, "embeddings")
    vd = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min(vd), 6).alias("vmin"),
        F.round(F.array_max(vd), 6).alias("vmax"),
        F.round(
            F.aggregate(vd, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 6
        ).alias("vmean"),
        F.round(
            F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x), 6
        ).alias("sq_sum"),
        F.round(F.element_at(vd, 1), 6).alias("first_coord"),
    )


@register(
    "like_in_between_filters",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_type LIKE '%AND%'
      AND p_size BETWEEN 5 AND 25
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#13')
    """,
    tags=("filter",),
)
def like_in_between_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / BETWEEN / IN predicate set — pushdown-friendly filters."""
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%AND%")
        & F.col("p_size").between(5, 25)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#13")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "in_subquery_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS total
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    """,
    tags=("join", "subquery", "filter"),
)
def in_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join against a broadcastable dim chain."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    asia_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    return (
        o.join(F.broadcast(asia_cust), o.o_custkey == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 6).alias("total"))
    )


@register(
    "union_all_multi_source",
    oracle="""
    SELECT kind, key_id, round(balance, 6) AS balance FROM (
      SELECT 'customer' AS kind, c_custkey AS key_id, c_acctbal AS balance
      FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_suppkey AS key_id, s_acctbal AS balance
      FROM supplier
    )
    """,
    tags=("setop",),
)
def union_all_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) across heterogeneous sources aligned to
    a common schema — the multi-source ingestion shape."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key_id"),
        F.round("c_acctbal", 6).alias("balance"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("key_id"),
        F.round("s_acctbal", 6).alias("balance"),
    )
    return c.unionAll(s)


@register(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           o_orderstatus,
           count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_total
    FROM orders
    GROUP BY bucket, o_orderstatus
    """,
    tags=("agg", "projection"),
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(dec_col("o_totalprice")).cast("double") / F.count("*"), 6).alias("avg_total"),
        )
    )


@register(
    "exists_high_value_items",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_extendedprice > 80000
    )
    """,
    tags=("join", "subquery"),
)
def exists_high_value_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a pushed-down predicate → filter BEFORE the
    semi join, so only qualifying lineitems shuffle."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 80000)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                          o_orderdate) AS INT) AS days_since_epoch_start,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
    tags=("projection", "datetime"),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar library: extraction, day arithmetic, month
    arithmetic with end-of-month clamping, last_day (X18 extension)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_epoch_start"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus_3_months"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "numeric_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           round(pow(1 + l_discount, 2), 6) AS disc_sq,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(abs(l_discount - 0.05), 6) AS disc_dev,
           CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
           l_linenumber % 3 AS line_mod
    FROM lineitem
    """,
    tags=("projection", "numeric"),
)
def numeric_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar library (X18 extension) — all codegen built-ins."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
    )


@register(
    "grouping_sets_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping"),
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via spark.sql — the
    registry supports SQL-built plans identically to DataFrame ones."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "priority_delayed_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    """,
    tags=("join", "subquery", "agg"),
)
def priority_delayed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late-shipping lineitem,
    counted by priority — correlated EXISTS with a non-equi condition →
    semi join on the key with the date predicate in the join condition."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 90)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "returned_revenue_by_customer",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS lost_revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "filter"),
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items, top-20 customers.
    Return-flag filter pushed to the lineitem scan before the join."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(dec_col(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("lost_revenue")
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "equidepth_histogram_totalprice",
    oracle="""
    WITH bounds AS (
      SELECT [round(quantile_cont(o_totalprice, 0.1), 6),
              round(quantile_cont(o_totalprice, 0.2), 6),
              round(quantile_cont(o_totalprice, 0.3), 6),
              round(quantile_cont(o_totalprice, 0.4), 6),
              round(quantile_cont(o_totalprice, 0.5), 6),
              round(quantile_cont(o_totalprice, 0.6), 6),
              round(quantile_cont(o_totalprice, 0.7), 6),
              round(quantile_cont(o_totalprice, 0.8), 6),
              round(quantile_cont(o_totalprice, 0.9), 6)] AS bs
      FROM orders
    )
    SELECT bucket, count(*) AS n,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM (
      SELECT o_totalprice,
             (SELECT count(*) FROM unnest(bs) AS t(b)
              WHERE o_totalprice >= b) AS bucket
      FROM orders, bounds
    )
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("agg", "histogram", "approx"),
)
def equidepth_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (deciles): pass 1 computes the 9 interior
    decile boundaries (one tiny aggregate row, broadcast); pass 2 bins
    each row by counting boundaries ≤ value — no global sort, no NTILE
    window (which would single-partition the table). This two-pass
    boundary shape is exactly how equi-depth stats are built at scale
    (with approx_percentile swapped in when exactness isn't required;
    the exact percentile keeps the DuckDB oracle bit-comparable).
    Boundaries are rounded to 6dp on BOTH sides so the bin constants
    are engine-identical."""
    o = _t(spark, sf_dir, "orders")
    qs = [i / 10 for i in range(1, 10)]
    bounds = o.agg(
        F.expr(
            "transform(percentile(o_totalprice, array({})),"
            " b -> round(b, 6))".format(",".join(map(str, qs)))
        ).alias("bs")
    )
    binned = o.crossJoin(F.broadcast(bounds)).select(
        "o_totalprice",
        F.size(
            F.filter("bs", lambda b: F.col("o_totalprice") >= b)
        ).alias("bucket"),
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "try_arithmetic_scalars",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (l_quantity - 25.0) = 0 THEN NULL
                ELSE round(l_extendedprice / (l_quantity - 25.0), 6)
           END AS safe_ratio,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
    tags=("projection", "scalar", "null"),
)
def try_arithmetic_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family: try_divide NULLs out division by zero
    (l_quantity=25 rows), try_cast NULLs out invalid casts ('R' → int)
    instead of failing the job — at scale, one malformed row must not
    kill a 1000-executor stage; the NULLs flow to a quarantine filter."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide("l_extendedprice", F.col("l_quantity") - 25.0), 6
        ).alias("safe_ratio"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("string").try_cast("double").alias(
            "qty_roundtrip"
        ),
    )


@register(
    "geomean_grouped_agg_udf",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 2) AS geo_mean_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "udf", "arrow"),
)
def geomean_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF surface (SURVEY §2.12): a GROUPED_AGG pandas UDF —
    geometric mean — running as AggregateInPandas (Arrow batches per
    group, never row-at-a-time). The oracle is the exp(avg(ln)) algebraic
    identity, proving the Arrow path agrees with pure SQL. Every
    REFERENCE aggregation decomposes into built-ins (and built-ins win:
    partial aggregation / map-side combine, which grouped-agg UDFs do
    NOT get — they see whole groups after the shuffle), so this exists
    to pin the escape hatch, not as the recommended path.

    Rounded to 2 decimals, not 6 (ADVICE r2 tie-safety): avg(ln) over
    ~20k rows carries order-dependent accumulation drift ~1e-11
    relative, which exp amplifies to ~1e-6 ABSOLUTE at this magnitude —
    the same scale as a 6-decimal rounding boundary, i.e. a latent
    coin-flip. A transcendental can't be made bit-exact across engines
    (libm vs numpy differ by ulps), so the honest fix is a boundary
    spacing (1e-2) four orders above the drift."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # grouped-agg UDFs can't mix with built-in aggregates in one
        # agg() — the count rides the same Arrow pass instead
        return int(len(v))

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(geo_mean("l_extendedprice"), 2).alias("geo_mean_price"),
            n_rows("l_extendedprice").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "grouped_exact_median",
    oracle="""
    SELECT o_orderpriority, n,
           CAST(sum(c * ((CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
                       + (CASE WHEN rn = (n + 2) // 2 THEN 1 ELSE 0 END)))
                AS DOUBLE) / 2 AS median_cents
    FROM (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             ) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    GROUP BY o_orderpriority, n
    """,
    tags=("agg", "window", "percentile"),
)
def grouped_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median by order statistics — the standard SQL
    median that approx_percentile approximates: rank within the group,
    pick the middle position(s), average them. Integer cents all the
    way to one final halving (a double .5 is exact), so the value is
    bit-identical across engines and accumulation orders. The window
    is per-group partitioned (parallel); at 100 TB with few groups the
    two-pass bucketed order-statistic (count per value-bucket, then
    probe the straddling bucket — the equidepth_histogram technique)
    replaces the in-group sort."""
    o = _t(spark, sf_dir, "orders")
    cents = F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
    w = Window.partitionBy("o_orderpriority").orderBy("c")
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority", cents.alias("c")
    ).select(
        "o_orderpriority",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    lo = (F.col("n") + 1) / 2
    hi = (F.col("n") + 2) / 2
    pick = (F.col("rn") == F.floor(lo)).cast("int") + (
        F.col("rn") == F.floor(hi)
    ).cast("int")
    return (
        ranked.groupBy("o_orderpriority", "n")
        .agg((F.sum(F.col("c") * pick).cast("double") / 2).alias("median_cents"))
    )


@register(
    "full_outer_customer_activity",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS id, count(*) AS n_orders FROM orders GROUP BY 1
    ),
    e AS (
      SELECT user_id AS id, count(*) AS n_events FROM events GROUP BY 1
    )
    SELECT coalesce(o.id, e.id) AS id,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(e.n_events, 0) AS n_events,
           CASE WHEN o.id IS NULL THEN 'events_only'
                WHEN e.id IS NULL THEN 'orders_only'
                ELSE 'both' END AS presence
    FROM o FULL OUTER JOIN e ON o.id = e.id
    """,
    tags=("join", "setop", "reconciliation"),
)
def full_outer_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the join shape every cross-system
    audit needs ("which ids exist only on one side, and what do the
    matched ones disagree on"). Both inputs pre-aggregate to one row
    per key BEFORE the join, so the full-outer shuffle moves two
    key-count relations, not raw fact tables — the at-scale form of a
    reconciliation (joining raw-vs-raw multiplies rows and shuffles the
    world). coalesce() resolves the two key columns and null-marks map
    to explicit presence labels."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("id"))
        .agg(F.count("*").alias("n_events"))
    )
    oj = o.alias("o")
    ej = e.alias("e")
    presence = (
        F.when(F.col("o.id").isNull(), "events_only")
        .when(F.col("e.id").isNull(), "orders_only")
        .otherwise("both")
    )
    return oj.join(ej, F.col("o.id") == F.col("e.id"), "full_outer").select(
        F.coalesce(F.col("o.id"), F.col("e.id")).alias("id"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        presence.alias("presence"),
    )


@register(
    "map_functions_surface",
    oracle="""
    SELECT user_id, event_type, 2 * n AS doubled
    FROM (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    WHERE n >= 3
    """,
    tags=("projection", "map", "agg"),
)
def map_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per user, event-type counts become a
    ``map<string,bigint>`` (map_from_entries over the grouped collect),
    are filtered entry-wise (map_filter), value-transformed
    (transform_values), then exploded back to rows for comparison. The
    oracle computes the same relation relationally — a hash match
    certifies the entry→map→entry cycle loses nothing. Map columns are
    how sparse per-entity feature bags ship at 100 TB (schema stays
    fixed while keys vary per row); everything here is codegen
    built-ins, no UDF."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    transformed = as_map.select(
        "user_id",
        F.transform_values(
            F.map_filter(F.col("m"), lambda k, v: v >= 3),
            lambda k, v: 2 * v,
        ).alias("m"),
    )
    return transformed.select(
        "user_id", F.explode("m").alias("event_type", "doubled")
    )


@register(
    "event_type_affinity",
    oracle="""
    WITH per_user AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n_users AS (SELECT count(DISTINCT user_id) AS nu FROM events),
    singles AS (
      SELECT event_type, count(*) AS n FROM per_user GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM per_user a
      JOIN per_user b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY type_a, type_b
    )
    SELECT p.type_a, p.type_b, p.n_both,
           sa.n AS n_a, sb.n AS n_b,
           round(CAST(p.n_both AS DOUBLE) * nu.nu / (sa.n * sb.n), 6)
             AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN n_users nu
    """,
    tags=("agg", "join", "affinity"),
)
def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over event types: for every type pair,
    how many users do both, and the LIFT (joint probability over the
    independence expectation — >1 means the behaviors co-occur). The
    heavy stage is the per-user distinct projection; the pair self-join
    runs on user_id (uniform key) over a relation bounded by
    users × type-domain, and the singles/lift joins touch a
    domain-sized table. Counts are exact; lift is one float division
    rounded for display."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.select("user_id", "event_type").distinct().transform(persist_tracked)
    nu = per_user.agg(F.countDistinct("user_id").alias("nu"))
    singles = per_user.groupBy("event_type").agg(F.count("*").alias("n"))
    a = per_user.alias("a")
    b = per_user.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double")
                * F.col("nu")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "benford_first_digit_orders",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    tot AS (SELECT count(*) AS n FROM digits)
    SELECT d, count(*) AS observed,
           round(CAST(count(*) AS DOUBLE) / t.n, 6) AS observed_p,
           round(log10(1.0 + 1.0 / d), 6) AS benford_p
    FROM digits, tot t
    GROUP BY d, t.n
    """,
    tags=("agg", "quality", "stats"),
)
def benford_first_digit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals — the classic fabricated-
    data detector: the leading-digit distribution of natural
    multi-scale amounts should follow log10(1+1/d). Output: observed
    counts and shares per digit beside the Benford expectation. The
    digit extraction goes through integer truncation + string head (no
    float log on the data path); only the two display shares are
    rounded doubles computed identically on both engines. (TPC-H
    totals are uniform-ish, so the fixture visibly FAILS Benford —
    which is the point of publishing both columns.)"""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    tot = digits.agg(F.count("*").alias("n"))
    return (
        digits.groupBy("d")
        .agg(F.count("*").alias("observed"))
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            "observed",
            F.round(F.col("observed").cast("double") / F.col("n"), 6).alias(
                "observed_p"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("d")), 6).alias("benford_p"),
        )
    )


@register(
    "mode_event_type_per_user",
    oracle="""
    SELECT user_id,
           min(event_type) FILTER (WHERE c = mx) AS mode_type,
           CAST(mx AS BIGINT) AS mode_count
    FROM (
      SELECT user_id, event_type, count(*) AS c,
             max(count(*)) OVER (PARTITION BY user_id) AS mx
      FROM events GROUP BY user_id, event_type
    )
    GROUP BY user_id, mx
    """,
    tags=("agg", "window", "mode"),
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE with a DETERMINISTIC tie-break (lexicographic min among the
    maxima) — engines' built-in mode() leaves ties unspecified, which
    would make the result unhashable; count + single-aggregate argmax
    over the (count, reversed-type) struct pins it. Two shuffles: the
    (user, type) count and the per-user reduce — both partial-
    aggregable."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    # argmax (c, min type): max of struct(c, negated-type) isn't
    # possible for strings, so sort (c DESC, type ASC) = max of
    # struct(c, reversed lexicographic)… simplest exact form: max
    # struct(c) then min(type) among rows hitting it, one extra tiny
    # aggregate on the counts relation.
    mx = counts.groupBy("user_id").agg(F.max("c").alias("mx"))
    return (
        counts.join(F.broadcast(mx), "user_id")
        .filter(F.col("c") == F.col("mx"))
        .groupBy("user_id", "mx")
        .agg(F.min("event_type").alias("mode_type"))
        .select(
            "user_id", "mode_type", F.col("mx").cast("long").alias("mode_count")
        )
    )


@register(
    "gini_revenue_concentration",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i,
             count(*) OVER () AS n
      FROM per_cust
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum((2 * i - n - 1) * cents) AS BIGINT) AS gini_num_scaled,
           round(CAST(sum((2 * i - n - 1) * cents) AS DOUBLE)
                 / (max(n) * sum(cents)), 6) AS gini
    FROM ranked
    """,
    tags=("agg", "window", "stats"),
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue across customers — "how concentrated
    is spend" — via the sorted-prefix identity
    G = Σ(2i−n−1)·x_(i) / (n·Σx): the global rank over the
    PER-CUSTOMER aggregate is the blocked two-level form
    (indexing.blocked_rank — |customers| GROWS with the corpus, so a
    bare rank window would funnel the user grain through one task; r6
    audit rule), n rides a 1-row broadcast, and the numerator is an
    exact integer in cents, so everything hash-compared is exact; the
    final ratio is one rounded division. Tie-break (cents, custkey)
    makes the rank — and thus the scaled numerator —
    engine-identical even with equal revenues."""
    from .indexing import blocked_rank

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    total = per_cust.agg(F.count("*").alias("n"))
    ranked = (
        blocked_rank(per_cust, "cents", "o_custkey")
        .crossJoin(F.broadcast(total))
        .select("cents", F.col("_rank").alias("i"), "n")
    )
    num = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cents"))
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        num.alias("gini_num_scaled"),
        F.round(
            num.cast("double") / (F.max("n") * F.sum("cents")), 6
        ).alias("gini"),
    )


@register(
    "pareto_frontier_orders",
    oracle="""
    WITH pts AS (
      SELECT o_totalprice AS price, o_orderdate AS odate,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ),
    per_price AS (
      SELECT price, max(odate) AS pd FROM pts GROUP BY price
    ),
    strict AS (
      SELECT price, pd,
             max(pd) OVER (ORDER BY price DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cummax_strict
      FROM per_price
    )
    SELECT p.price, p.odate, p.n_orders
    FROM pts p JOIN strict s ON s.price = p.price
    WHERE p.odate = s.pd
      AND (s.cummax_strict IS NULL OR p.odate > s.cummax_strict)
    ORDER BY p.price DESC
    """,
    tags=("window", "skyline", "topk"),
)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of orders maximizing BOTH total price
    and recency — "no other order is at least as expensive AND at least
    as recent, with one strictly better". The classic multi-criteria
    shortlist operator Spark has no built-in for.

    Distributed formulation = the textbook two-phase skyline: (1) a
    LOCAL dominance filter inside $1000 price bands — all windows
    partitioned by the band key, so phase 1 is fully parallel and
    eliminates all but ≤1 point per distinct price; (2) a GLOBAL pass
    over the survivors (bounded: one row per distinct surviving price)
    using the same two-condition test. Soundness: dominance is
    transitive, so any globally-dominated point is dominated by a
    skyline point, and skyline points are never removed locally — the
    local pass only sheds work. Dominance itself needs no join: with
    points reduced to (price → max date), "dominated" ⟺ the running
    max of date over STRICTLY higher prices reaches your date, or a
    same-price point has a strictly later date — two window
    expressions, zero self-joins (the naive NOT EXISTS skyline is
    O(n²)). The oracle runs the single-phase version of the same
    algebra; both produce the identical frontier."""
    o = _t(spark, sf_dir, "orders")
    pts = (
        o.groupBy(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("odate"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    # phase 1: local skyline within $1000 price bands
    band = F.floor(F.col("price") / 1000).alias("band")
    w_same = Window.partitionBy("band", "price")
    w_strict_local = (
        Window.partitionBy("band")
        .orderBy(F.col("price").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_price_local = (
        pts.select(band, "price", "odate")
        .groupBy("band", "price")
        .agg(F.max("odate").alias("pd"))
        .withColumn("cummax_local", F.max("pd").over(w_strict_local))
    )
    survivors = (
        pts.withColumn("band", F.floor(F.col("price") / 1000))
        .join(per_price_local, ["band", "price"])
        .filter(
            (F.col("odate") == F.col("pd"))
            & (
                F.col("cummax_local").isNull()
                | (F.col("odate") > F.col("cummax_local"))
            )
        )
        .select("price", "odate", "n_orders")
    )
    # phase 2: global skyline over the bounded survivor set (≤1 point
    # per distinct surviving price — at 100 TB this frame is the union
    # of per-band skylines, orders of magnitude below the input). The
    # re-aggregation below is a semantic no-op (survivors are already
    # unique per price) but makes the bounded-input property STRUCTURAL:
    # the single-partition exchange feeding the global window reads a
    # HashAggregate, the shape the plan audit certifies as a
    # prefix-sum-over-aggregated-frame, and partial aggregation caps
    # what the exchange can ever move.
    survivors = (
        survivors.groupBy("price")
        .agg(F.max(F.struct("odate", "n_orders")).alias("s"))
        .select(
            "price",
            F.col("s.odate").alias("odate"),
            F.col("s.n_orders").alias("n_orders"),
        )
    )
    # r6 audit rule: distinct surviving prices still track the price
    # grain, so the strict running max over price DESC is the blocked
    # two-level form (indexing.blocked_cummax on the negated price) —
    # parallel per-block running maxes + a prefix-max over the
    # ≤RANGE_BLOCKS per-block partials; no single-partition exchange
    # over the survivor relation.
    from .indexing import blocked_cummax

    final = blocked_cummax(
        survivors.withColumn("_negp", -F.col("price")),
        "_negp",
        "odate",
        "cummax_strict",
        inclusive=False,
    )
    return (
        final.filter(
            F.col("cummax_strict").isNull()
            | (F.col("odate") > F.col("cummax_strict"))
        )
        .select("price", "odate", "n_orders")
        .orderBy(F.col("price").desc())
    )


@register(
    "interpolated_quartiles_by_group",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    q AS (SELECT unnest([1, 2, 3]) AS quartile),
    idx AS (
      -- percentile_cont position: (n-1)*q/4 = lo + frac, frac dyadic
      SELECT v.grp, v.n, q.quartile,
             (v.n - 1) * q.quartile // 4 + 1 AS lo_rn,
             ((v.n - 1) * q.quartile % 4) AS frac4
      FROM (SELECT DISTINCT grp, n FROM v) v CROSS JOIN q
    )
    SELECT i.grp, i.quartile,
           CAST(i.n AS BIGINT) AS n,
           round((lo.cents
                  + (coalesce(hi.cents, lo.cents) - lo.cents)
                    * CAST(i.frac4 AS DOUBLE) / 4) / 100, 6) AS value
    FROM idx i
    JOIN v lo ON lo.grp = i.grp AND lo.rn = i.lo_rn
    LEFT JOIN v hi ON hi.grp = i.grp AND hi.rn = i.lo_rn + 1
    ORDER BY i.grp, i.quartile
    """,
    tags=("agg", "percentile", "window"),
)
def interpolated_quartiles_by_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT percentile_cont quartiles per order priority — the
    interpolated (SQL-standard) percentile pinned cross-engine, which
    native approx/quantile functions cannot be (engine-internal
    sketches differ): position (n−1)·q/4 splits into an integer rank
    and a DYADIC fraction frac/4 (exact in binary), the two straddling
    order statistics come from rank equi-joins against the
    row_number'd values, and the interpolation
    lo + (hi−lo)·frac/4 is ONE float expression per output row over
    exact cents. Group-partitioned windows only; the rank joins touch
    ≤2 rows per (group, quartile)."""
    o = _t(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_n = Window.partitionBy("o_orderpriority")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    ).transform(persist_tracked)
    groups = v.select("grp", "n").distinct()
    idx = (
        groups.select(
            "grp",
            "n",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias(
                "quartile"
            ),
        )
        .select(
            "grp",
            "n",
            "quartile",
            (F.expr("(n - 1) * quartile div 4") + 1).alias("lo_rn"),
            F.expr("(n - 1) * quartile % 4").alias("frac4"),
        )
    )
    lo = v.select("grp", F.col("rn").alias("lo_rn"), F.col("cents").alias("lo_c"))
    hi = v.select(
        "grp", (F.col("rn") - 1).alias("lo_rn"), F.col("cents").alias("hi_c")
    )
    joined = idx.join(lo, ["grp", "lo_rn"]).join(
        hi, ["grp", "lo_rn"], "left"
    )
    val = (
        F.col("lo_c")
        + (F.coalesce(F.col("hi_c"), F.col("lo_c")) - F.col("lo_c"))
        * F.col("frac4").cast("double")
        / 4
    ) / 100
    return joined.select(
        "grp",
        "quartile",
        F.col("n").cast("long").alias("n"),
        F.round(val, 6).alias("value"),
    ).orderBy("grp", "quartile")


@register(
    "bitmap_activity_index",
    oracle="""
    WITH marks AS (
      SELECT user_id,
             date_trunc('month', ts) AS month,
             CAST(bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)) AS BIGINT)
               AS day_bitmap
      FROM events
      GROUP BY user_id, month
    )
    SELECT user_id,
           CAST(month AS DATE) AS month,
           day_bitmap,
           CAST(bit_count(day_bitmap) AS BIGINT) AS active_days,
           CAST(bit_count(day_bitmap & (day_bitmap << 1)) AS BIGINT)
             AS consecutive_day_pairs,
           CAST(bit_count(day_bitmap & (day_bitmap << 1)
                          & (day_bitmap << 2)) AS BIGINT)
             AS consecutive_day_triples
    FROM marks
    ORDER BY user_id, month
    """,
    tags=("analytics", "bitmap", "agg", "engagement"),
)
def bitmap_activity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roaring-style activity bitmap index: one BIGINT per (user,
    month) with bit d−1 set iff the user was active on day d — the
    compressed engagement representation warehouses build instead of a
    per-(user, day) fact table (31 rows → 8 bytes). Streak analytics
    then become pure bit algebra: bit_count(m) = active days,
    bit_count(m & m<<1) = adjacent-day pairs, one more shift for
    3-day streaks — no self-join, no window, no calendar spine.
    Distributed shape: a single map-side-combinable bit_or groupBy (OR
    is idempotent and associative — retries and partial merges are
    free); everything downstream is per-row integer ops in codegen.
    Exact integers end to end."""
    e = _t(spark, sf_dir, "events")
    marks = e.groupBy(
        "user_id", F.date_trunc("month", "ts").alias("month")
    ).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), day(ts) - 1))").alias(
            "day_bitmap"
        )
    )
    m = F.col("day_bitmap")
    return marks.select(
        "user_id",
        F.col("month").cast("date").alias("month"),
        "day_bitmap",
        F.bit_count(m).cast("long").alias("active_days"),
        F.bit_count(m.bitwiseAND(F.shiftleft(m, 1)))
        .cast("long")
        .alias("consecutive_day_pairs"),
        F.bit_count(
            m.bitwiseAND(F.shiftleft(m, 1)).bitwiseAND(F.shiftleft(m, 2))
        )
        .cast("long")
        .alias("consecutive_day_triples"),
    ).orderBy("user_id", "month")


@register(
    "stickiness_dau_mau",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('month', ts) AS month,
             CAST(ts AS DATE) AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY month, day
    ),
    monthly AS (
      SELECT date_trunc('month', ts) AS month,
             count(DISTINCT user_id) AS mau
      FROM events GROUP BY month
    ),
    d AS (
      SELECT month, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dau) AS BIGINT) AS dau_sum,
             CAST(min(dau) AS BIGINT) AS dau_min,
             CAST(max(dau) AS BIGINT) AS dau_max
      FROM daily GROUP BY month
    )
    SELECT CAST(d.month AS DATE) AS month, d.n_days,
           CAST(m.mau AS BIGINT) AS mau,
           round(CAST(d.dau_sum AS DOUBLE) / d.n_days, 6) AS avg_dau,
           d.dau_min, d.dau_max,
           round(CAST(d.dau_sum AS DOUBLE) / d.n_days / m.mau, 6)
             AS stickiness
    FROM d JOIN monthly m USING (month)
    ORDER BY month
    """,
    tags=("analytics", "engagement", "agg"),
)
def stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the engagement ratio every
    consumer-product dashboard leads with (what fraction of the
    monthly actives show up on an average day). Exactness: DAU and MAU
    are exact distinct counts; the two divisions run once per month
    row over exact integers in a fixed order. Distributed shape: two
    count-distinct aggregations over the same scan (day and month
    grain — Spark plans one shuffle each, both combinable in the
    partial-distinct phase) joined on the bounded month key."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("day"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    monthly = e.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    d = daily.groupBy("month").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("dau").cast("long").alias("dau_sum"),
        F.min("dau").cast("long").alias("dau_min"),
        F.max("dau").cast("long").alias("dau_max"),
    )
    return (
        d.join(monthly, "month")
        .select(
            F.col("month").cast("date").alias("month"),
            "n_days",
            F.col("mau").cast("long").alias("mau"),
            F.round(
                F.col("dau_sum").cast("double") / F.col("n_days"), 6
            ).alias("avg_dau"),
            "dau_min",
            "dau_max",
            F.round(
                F.col("dau_sum").cast("double")
                / F.col("n_days")
                / F.col("mau"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


@register(
    "decision_stump_gini",
    oracle="""
    WITH xy AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    per_x AS (
      SELECT x, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos
      FROM xy GROUP BY x
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_all,
             CAST(sum(pos) AS BIGINT) AS pos_all
      FROM per_x
    ),
    cum AS (
      SELECT x AS t,
             CAST(sum(n) OVER w AS BIGINT) AS n_l,
             CAST(sum(pos) OVER w AS BIGINT) AS pos_l
      FROM per_x
      WINDOW w AS (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    curve AS (
      SELECT c.t, c.n_l, c.pos_l,
             t2.n_all - c.n_l AS n_r,
             t2.pos_all - c.pos_l AS pos_r,
             (c.n_l * (1.0
                - (CAST(c.pos_l AS DOUBLE) / c.n_l)
                  * (CAST(c.pos_l AS DOUBLE) / c.n_l)
                - (1.0 - CAST(c.pos_l AS DOUBLE) / c.n_l)
                  * (1.0 - CAST(c.pos_l AS DOUBLE) / c.n_l))
              + (t2.n_all - c.n_l) * (1.0
                - (CAST(t2.pos_all - c.pos_l AS DOUBLE)
                   / (t2.n_all - c.n_l))
                  * (CAST(t2.pos_all - c.pos_l AS DOUBLE)
                     / (t2.n_all - c.n_l))
                - (1.0 - CAST(t2.pos_all - c.pos_l AS DOUBLE)
                         / (t2.n_all - c.n_l))
                  * (1.0 - CAST(t2.pos_all - c.pos_l AS DOUBLE)
                           / (t2.n_all - c.n_l))))
             / t2.n_all AS gini_w
      FROM cum c CROSS JOIN tot t2
      WHERE c.n_l < t2.n_all
    )
    SELECT t, n_l, pos_l, CAST(n_r AS BIGINT) AS n_r,
           CAST(pos_r AS BIGINT) AS pos_r,
           round(gini_w, 6) AS weighted_gini,
           row_number() OVER (ORDER BY gini_w, t) = 1 AS is_best_split
    FROM curve
    ORDER BY t
    """,
    tags=("analytics", "ml", "window", "agg"),
)
def decision_stump_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision stump by weighted Gini impurity: the full
    split-quality curve for x ≤ t over the quantity domain predicting
    'returned' — the inner loop of every distributed tree learner
    (XGBoost/LightGBM histogram splits), done the scale way: ONE
    combinable groupBy reduces the corpus to the ≤50-row per-value
    class-count histogram, prefix sums over that bounded grid give
    every threshold's left/right counts, and the impurity algebra runs
    per grid row over exact integers with an identical textual formula
    on both engines (bit-identical doubles; argmin tie-broken by t).
    Corpus size never touches the window — the histogram IS the
    sufficient statistic, which is exactly why histogram-based tree
    learners scale."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    xy = li.select(
        F.round("l_quantity").cast("long").alias("x"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    per_x = xy.groupBy("x").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = per_x.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("pos").cast("long").alias("pos_all"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_x.select(
        F.col("x").alias("t"),
        F.sum("n").over(w).cast("long").alias("n_l"),
        F.sum("pos").over(w).cast("long").alias("pos_l"),
    )
    c = cum.crossJoin(F.broadcast(tot)).filter(
        F.col("n_l") < F.col("n_all")
    )
    pl = F.col("pos_l").cast("double") / F.col("n_l")
    n_r = F.col("n_all") - F.col("n_l")
    pr = (F.col("pos_all") - F.col("pos_l")).cast("double") / n_r
    gini_w = (
        F.col("n_l") * (1.0 - pl * pl - (1.0 - pl) * (1.0 - pl))
        + n_r * (1.0 - pr * pr - (1.0 - pr) * (1.0 - pr))
    ) / F.col("n_all")
    curve = c.select(
        "t",
        "n_l",
        "pos_l",
        n_r.cast("long").alias("n_r"),
        (F.col("pos_all") - F.col("pos_l")).cast("long").alias("pos_r"),
        gini_w.alias("gini_w"),
    )
    return curve.select(
        "t",
        "n_l",
        "pos_l",
        "n_r",
        "pos_r",
        F.round("gini_w", 6).alias("weighted_gini"),
        (
            F.row_number().over(Window.orderBy("gini_w", "t")) == 1
        ).alias("is_best_split"),
    ).orderBy("t")
