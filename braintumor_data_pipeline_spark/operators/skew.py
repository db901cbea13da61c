"""Skew-handling patterns (SURVEY §4 / north-star scale mandate).

``l_returnflag`` has only 3 values — the canonical heavy-hitter key: a
naive groupBy sends ~⅓ of a 100 TB table to each of 3 reducers. Two
mitigations, both with DuckDB oracles proving the results are identical
to the naive plan:

1. **Salted two-phase aggregation** — append a random-ish salt to the
   key, partial-aggregate over (key, salt) [N× parallelism], then
   combine over key [tiny]. Works for any algebraic aggregate.
2. **Salted broadcast join** (see `salted_join_heavy_key`) — replicate
   the small side per salt so the skewed probe side spreads.

(Spark's AQE skew-join handles sort-merge skew automatically — enabled
in our session factory; these operators cover the aggregate/broadcast
cases AQE doesn't.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec_col, dec_sum
from ..registry import register
from ..sources.fixtures import load_table as _t

N_SALTS = 16


@register(
    "salted_heavy_key_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "skew"),
)
def salted_heavy_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value key. The oracle is the
    NAIVE group-by — proving salting changes the plan, not the answer.

    Salt = deterministic hash of a high-cardinality column % 16 (not
    rand(): keeps the query replayable). Phase 1 shuffles on (key,
    salt) → 48 partial groups; phase 2 combines 48 rows.

    Money sums go through DECIMAL(38,6) so the two-phase accumulation
    order cannot perturb the result vs the oracle's single-phase sum
    (see functions/money.py)."""
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", (F.abs(F.hash("l_orderkey")) % N_SALTS)
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum(dec_col("l_quantity")).alias("p_qty"),
        F.sum(dec_col("l_extendedprice")).alias("p_price"),
        F.count("*").alias("p_n"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("p_qty").cast("double").alias("sum_qty"),
        F.sum("p_price").cast("double").alias("sum_price"),
        F.sum("p_n").alias("n"),
    )


@register(
    "salted_join_heavy_key",
    oracle="""
    SELECT l_returnflag, n_name,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY l_returnflag, n_name
    """,
    tags=("join", "skew", "agg"),
)
def salted_join_heavy_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join: the small side (supplier⋈nation) is broadcast, so
    the skewed fact side never shuffles on the hot key at all — the
    broadcast join IS the salting-free skew fix whenever one side fits.
    The oracle is the plain join proving identity."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("l_returnflag", "n_name")
        .agg(
            F.count("*").alias("n"),
            dec_sum("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "skew_diagnosis_join_keys",
    oracle="""
    SELECT key_col, n_keys, n_rows, max_key_rows, top_key,
           CAST(max_key_rows AS DOUBLE) * n_keys / n_rows AS skew_ratio
    FROM (
      SELECT 'l_orderkey' AS key_col,
             count(*) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             max(c) AS max_key_rows,
             CAST(min(k) FILTER (WHERE c = (SELECT max(c2) FROM (
                 SELECT count(*) AS c2 FROM lineitem GROUP BY l_orderkey)))
               AS BIGINT) AS top_key
      FROM (SELECT l_orderkey AS k, count(*) AS c
            FROM lineitem GROUP BY l_orderkey)
      UNION ALL
      SELECT 'l_suppkey',
             count(*), CAST(sum(c) AS BIGINT), max(c),
             CAST(min(k) FILTER (WHERE c = (SELECT max(c2) FROM (
                 SELECT count(*) AS c2 FROM lineitem GROUP BY l_suppkey)))
               AS BIGINT)
      FROM (SELECT l_suppkey AS k, count(*) AS c
            FROM lineitem GROUP BY l_suppkey)
      UNION ALL
      SELECT 'l_returnflag',
             count(*), CAST(sum(c) AS BIGINT), max(c),
             CAST(min(CASE WHEN k = 'A' THEN 0 WHEN k = 'N' THEN 1
                           ELSE 2 END) FILTER (WHERE c = (
                 SELECT max(c2) FROM (SELECT count(*) AS c2
                                      FROM lineitem GROUP BY l_returnflag)))
               AS BIGINT)
      FROM (SELECT l_returnflag AS k, count(*) AS c
            FROM lineitem GROUP BY l_returnflag)
    )
    """,
    tags=("agg", "skew", "ops"),
)
def skew_diagnosis_join_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-join skew report an operator runs BEFORE shuffling 100 TB
    on a key: per candidate join key — distinct-key count, total rows,
    the hottest key's row count and identity, and the skew ratio
    (hottest key's share × key count; 1.0 = perfectly uniform). Reading
    it: l_orderkey ≈ uniform (safe shuffle key), l_suppkey mildly hot,
    l_returnflag catastrophic (3 keys → salt or broadcast instead; see
    salted_heavy_key_agg). One aggregation pass per key column — the
    diagnosis costs one scan, the un-diagnosed skewed shuffle costs a
    straggler executor. Flag keys are mapped to stable ints so the top
    key is comparable across engines."""
    li = _t(spark, sf_dir, "lineitem")

    def one(col: str, key_expr) -> DataFrame:
        per_key = li.select(key_expr.alias("k")).groupBy("k").agg(
            F.count("*").alias("c")
        )
        return (
            per_key.agg(
                F.count("*").alias("n_keys"),
                F.sum("c").alias("n_rows"),
                F.max("c").alias("max_key_rows"),
                # canonical top key: "min key among argmax-count rows" in
                # ONE aggregate — max of the lexicographic struct
                # (c, −k): max c first, then max(−k) = min k. (max_by's
                # tie-break is unspecified; this is deterministic and
                # avoids a second plan + cross join entirely.)
                F.max(
                    F.struct(
                        F.col("c").alias("c"),
                        (-F.col("k").cast("long")).alias("nk"),
                    )
                ).alias("ts"),
            )
            .withColumn("top_key", -F.col("ts.nk"))
            .select(
                F.lit(col).alias("key_col"),
                "n_keys",
                "n_rows",
                "max_key_rows",
                "top_key",
                (
                    F.col("max_key_rows").cast("double")
                    * F.col("n_keys")
                    / F.col("n_rows")
                ).alias("skew_ratio"),
            )
        )

    flag_int = (
        F.when(F.col("l_returnflag") == "A", 0)
        .when(F.col("l_returnflag") == "N", 1)
        .otherwise(2)
    )
    return (
        one("l_orderkey", F.col("l_orderkey"))
        .unionAll(one("l_suppkey", F.col("l_suppkey")))
        .unionAll(one("l_returnflag", flag_int))
    )
