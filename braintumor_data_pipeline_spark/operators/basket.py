"""Market-basket association mining over customer baskets (N*).

The co-purchase GRAPH family (graph.py / graph_twins.py) treats part
pairs as edges; this module treats them as ASSOCIATION RULES — the
classic Apriori / A-Priori (Agrawal & Srikant, VLDB 1994) shape that a
training-data pipeline uses for catalog curation and co-occurrence
feature tables. Baskets are CUSTOMER-level (every part a customer ever
ordered: ``distinct (o_custkey, l_partkey)`` through lineitem⋈orders),
which is denser than order-level baskets and exercises the support
ladder at fixture scale.

Scale stance (the Apriori point): each level's candidates are pruned
by the previous level's frequent set BEFORE any counting join —
frequent items gate the pair enumeration, frequent pairs generate the
triple candidates (two L2 rows sharing a head item + the closing pair
must itself be in L2). The pair enumeration is quadratic ONLY in
basket size (bounded by catalog behavior; a production run caps basket
width the same way the LSH band cap bounds dup clusters), and the L2 /
C3 relations are support-filtered small tables that broadcast —
counting joins never shuffle the basket relation more than once per
level. Everything is exact integer counts; the only floats are final
single-expression confidence/lift divisions rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from ..sources.fixtures import load_table as _t

#: minimum basket support for L1 items / L2 pairs / C3 generation
BASKET_SUP = 4
#: minimum pair support for the association-rule report
RULE_SUP = 5

_BASKET_SQL = """
    basket AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
"""


def _basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("item"),
        )
        .distinct()
    )


@register(
    "frequent_triples_apriori",
    oracle=f"""
    WITH {_BASKET_SQL},
    l1 AS (
      SELECT item FROM basket GROUP BY item
      HAVING count(*) >= {BASKET_SUP}
    ),
    b1 AS (
      SELECT cust, item FROM basket SEMI JOIN l1 USING (item)
    ),
    l2 AS (
      SELECT a.item AS ia, b.item AS ib, count(*) AS c
      FROM b1 a JOIN b1 b ON a.cust = b.cust AND b.item > a.item
      GROUP BY a.item, b.item HAVING count(*) >= {BASKET_SUP}
    ),
    c3 AS (
      SELECT p.ia AS a, p.ib AS b, q.ib AS c
      FROM l2 p
      JOIN l2 q ON q.ia = p.ia AND q.ib > p.ib
      JOIN l2 r ON r.ia = p.ib AND r.ib = q.ib
    ),
    t3 AS (
      SELECT c3.a, c3.b, c3.c, count(*) AS sup
      FROM c3
      JOIN b1 x ON x.item = c3.a
      JOIN b1 y ON y.cust = x.cust AND y.item = c3.b
      JOIN b1 z ON z.cust = x.cust AND z.item = c3.c
      GROUP BY c3.a, c3.b, c3.c
    )
    SELECT CAST(a AS BIGINT) AS item_a, CAST(b AS BIGINT) AS item_b,
           CAST(c AS BIGINT) AS item_c, CAST(sup AS BIGINT) AS support
    FROM t3 WHERE sup >= 2
    ORDER BY support DESC, item_a, item_b, item_c
    LIMIT 15
    """,
    tags=("basket", "apriori", "join", "topk"),
)
def frequent_triples_apriori(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Apriori frequent TRIPLES over customer baskets: L1 items gate
    the basket, L2 pairs (support >= BASKET_SUP) generate C3 candidates
    — (a,b)+(a,c) sharing a head with the closing pair (b,c) required
    in L2 — and only the surviving candidates are counted against the
    baskets (three chained equi-joins on cust). Top-15 counted triples
    with support >= 2. The triple level thins as the catalog grows
    (support is absolute), so the report can legitimately be EMPTY at
    larger sf — the candidate-generation shape, not the row count, is
    the operator.

    Scale shape: L2 and C3 are support-filtered small relations
    (broadcast); the only basket self-join is the L2 pair count,
    quadratic solely in basket width; the C3 count re-joins the basket
    linearly per level. This is textbook distributed Apriori — each
    level's shuffle carries candidate keys, never raw pair blowup."""
    b = _basket(spark, sf_dir)
    l1 = (
        b.groupBy("item")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= BASKET_SUP)
        .select("item")
    )
    b1 = b.join(l1, "item", "left_semi").transform(persist_tracked)
    a_side = b1.select(
        F.col("cust"), F.col("item").alias("ia")
    )
    b_side = b1.select(
        F.col("cust").alias("bcust"), F.col("item").alias("ib")
    )
    l2 = (
        a_side.join(
            b_side,
            (F.col("bcust") == F.col("cust"))
            & (F.col("ib") > F.col("ia")),
        )
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= BASKET_SUP)
        .select("ia", "ib")
        .transform(persist_tracked)  # feeds candidate gen three ways — diamond
    )
    p = l2.select(F.col("ia").alias("a"), F.col("ib").alias("b"))
    q = l2.select(F.col("ia").alias("qa"), F.col("ib").alias("c"))
    r = l2.select(F.col("ia").alias("ra"), F.col("ib").alias("rb"))
    c3 = (
        p.join(
            F.broadcast(q),
            (F.col("qa") == F.col("a")) & (F.col("c") > F.col("b")),
        )
        .join(
            F.broadcast(r),
            (F.col("ra") == F.col("b")) & (F.col("rb") == F.col("c")),
        )
        .select("a", "b", "c")
    )
    x = b1.select("cust", F.col("item").alias("a"))
    y = b1.select(F.col("cust").alias("ycust"), F.col("item").alias("b"))
    z = b1.select(F.col("cust").alias("zcust"), F.col("item").alias("c"))
    counted = (
        F.broadcast(c3)
        .join(x, "a")
        .join(y, (F.col("ycust") == F.col("cust")) & (y.b == c3.b))
        .join(z, (F.col("zcust") == F.col("cust")) & (z.c == c3.c))
        .groupBy(c3.a, c3.b, c3.c)
        .agg(F.count("*").alias("sup"))
    )
    return (
        counted.filter(F.col("sup") >= 2)
        .select(
            F.col("a").cast("long").alias("item_a"),
            F.col("b").cast("long").alias("item_b"),
            F.col("c").cast("long").alias("item_c"),
            F.col("sup").cast("long").alias("support"),
        )
        .orderBy(F.desc("support"), "item_a", "item_b", "item_c")
        .limit(15)
    )


@register(
    "assoc_rules_lift",
    oracle=f"""
    WITH {_BASKET_SQL},
    nb AS (SELECT count(DISTINCT cust) AS n FROM basket),
    ic AS (SELECT item, count(*) AS ci FROM basket GROUP BY item),
    l2 AS (
      SELECT a.item AS ia, b.item AS ib, count(*) AS cab
      FROM basket a JOIN basket b
        ON a.cust = b.cust AND b.item > a.item
      GROUP BY a.item, b.item HAVING count(*) >= {RULE_SUP}
    ),
    rules AS (
      SELECT ia AS ant, ib AS con, cab FROM l2
      UNION ALL
      SELECT ib AS ant, ia AS con, cab FROM l2
    )
    SELECT CAST(r.ant AS BIGINT) AS antecedent,
           CAST(r.con AS BIGINT) AS consequent,
           CAST(r.cab AS BIGINT) AS support_count,
           round(CAST(r.cab AS DOUBLE) / ca.ci, 6) AS confidence,
           round(CAST(r.cab AS DOUBLE) * nb.n / (ca.ci * cc.ci), 6)
             AS lift
    FROM rules r
    JOIN ic ca ON ca.item = r.ant
    JOIN ic cc ON cc.item = r.con
    CROSS JOIN nb
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 15
    """,
    tags=("basket", "apriori", "join", "topk"),
)
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from frequent customer-basket pairs: both
    directions of every pair with support >= RULE_SUP, scored with
    confidence (P(con|ant)) and lift (support ratio vs independence).
    Top-15 by (lift DESC, antecedent, consequent). All counts exact
    integers; confidence and lift are single fixed-shape divisions of
    those integers rounded to 6dp, so the hash is engine-stable.

    Scale shape: the pair count is the one basket self-join (bounded
    by basket width); item counts and the basket-count scalar are
    map-side-combinable aggs; the rule scoring joins a support-filtered
    small relation against the item-count dimension (broadcast) — no
    quadratic stage survives the support gate."""
    b = _basket(spark, sf_dir).transform(persist_tracked)
    nb = b.select(F.count_distinct("cust").alias("n"))
    ic = b.groupBy("item").agg(F.count("*").alias("ci"))
    a_side = b.select("cust", F.col("item").alias("ia"))
    b_side = b.select(
        F.col("cust").alias("bcust"), F.col("item").alias("ib")
    )
    l2 = (
        a_side.join(
            b_side,
            (F.col("bcust") == F.col("cust"))
            & (F.col("ib") > F.col("ia")),
        )
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("cab"))
        .filter(F.col("cab") >= RULE_SUP)
    )
    rules = l2.select(
        F.col("ia").alias("ant"), F.col("ib").alias("con"), "cab"
    ).unionAll(
        l2.select(
            F.col("ib").alias("ant"), F.col("ia").alias("con"), "cab"
        )
    )
    ca = ic.select(F.col("item").alias("ant"), F.col("ci").alias("ca"))
    cc = ic.select(F.col("item").alias("con"), F.col("ci").alias("cc"))
    return (
        rules.join(F.broadcast(ca), "ant")
        .join(F.broadcast(cc), "con")
        .crossJoin(F.broadcast(nb))  # 1-row scalar broadcast
        .select(
            F.col("ant").cast("long").alias("antecedent"),
            F.col("con").cast("long").alias("consequent"),
            F.col("cab").cast("long").alias("support_count"),
            F.round(
                F.col("cab").cast("double") / F.col("ca"), 6
            ).alias("confidence"),
            F.round(
                F.col("cab").cast("double")
                * F.col("n")
                / (F.col("ca") * F.col("cc")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(15)
    )
