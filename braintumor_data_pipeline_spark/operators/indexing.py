"""Global dense ID assignment — contiguous 1..N numbering at scale.

Every corpus pipeline eventually needs stable dense integer IDs
(shard-friendly sample indexing, embedding-matrix row numbers, train
example ordinals). The naive ``row_number() OVER (ORDER BY key)`` is a
single-partition window — a non-starter on 100 B documents. The
scalable form used here is the same three-step pattern the segmentation
grid builder uses internally (segmentation.py:_dense_indexed_orders),
promoted to a first-class, driver-checked operator:

1. range-block the sort key space with a key-DERIVED block id (a
   deterministic function of the key, so the plan is retry/speculation
   stable — never ``spark_partition_id``);
2. row_number within each block — parallel windows, one per block;
3. add per-block offsets from a tiny count aggregate whose prefix-sum
   window runs over one row per block and broadcasts back.

Cost: one narrow shuffle of (key → block) plus a broadcast; full
parallelism at any N. The DuckDB oracle is the naive global
row_number — proving the blocked plan computes the identical function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table as _t

#: Sort-key span per block. At 100 B rows pick ~1e6 (→1e5 blocks: the
#: offset table stays driver-broadcastable and each block window fits
#: one task); the value only shifts parallelism, never results.
BLOCK_SPAN = 64


def dense_ids(df: DataFrame, part_col: str, key_col: str) -> DataFrame:
    """Append ``gid``: dense 1..N over ``df`` ordered by
    (part_col, key_col). ``key_col`` must be unique within a partition
    value (total order ⇒ deterministic ids)."""
    blocked = df.withColumn(
        "_blk", (F.col(key_col) / BLOCK_SPAN).cast("long")
    )
    counts = blocked.groupBy(part_col, "_blk").agg(F.count("*").alias("_cnt"))
    # one row per block → this window runs over a tiny pre-aggregated
    # frame (the benign prefix-sum pattern), then broadcasts
    woff = Window.orderBy(part_col, "_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        part_col,
        "_blk",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
    )
    wblk = Window.partitionBy(part_col, "_blk").orderBy(key_col)
    return (
        blocked.join(F.broadcast(offsets), [part_col, "_blk"])
        .withColumn("gid", F.row_number().over(wblk) + F.col("_off"))
        .drop("_blk", "_off")
    )


@register(
    "global_dense_ids_documents",
    oracle="""
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (ORDER BY lang, doc_id) AS gid
    FROM documents
    """,
    tags=("window", "indexing", "layout"),
)
def global_dense_ids_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1..N ids over documents ordered by (lang, doc_id), built
    with the blocked row_number + broadcast-offset plan (no global
    window anywhere). The oracle is the single-partition global
    row_number — identical output, scalable plan."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return dense_ids(docs, "lang", "doc_id").select("doc_id", "lang", "gid")


#: Range-block count for the value-keyed rank/cumsum helpers below. A
#: PLAN-TIME constant: the per-block count aggregate that feeds the
#: prefix-sum window is at most this many rows no matter the data
#: volume, which is what makes that window's single partition benign
#: (and what tools/plan_audit.py's GLOBAL_WINDOW_OK entries cite).
RANGE_BLOCKS = 1024


def _with_range_block(df: DataFrame, key_col: str) -> DataFrame:
    """Append ``_blk`` ∈ [0, RANGE_BLOCKS): a deterministic, MONOTONE
    function of ``key_col`` (equal keys ⇒ equal block; larger key ⇒
    same-or-larger block), derived from the broadcast global min/max so
    the assignment is retry/speculation stable — never
    ``spark_partition_id``. Monotonicity is all correctness needs
    (blocks are contiguous key ranges); IEEE double division only
    shifts block BALANCE, never results, because every downstream sort
    orders by the true key within the block."""
    b = df.agg(
        F.min(key_col).cast("double").alias("_mn"),
        F.max(key_col).cast("double").alias("_mx"),
    )
    span = (F.col("_mx") - F.col("_mn")) / F.lit(float(RANGE_BLOCKS))
    blk = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(key_col).cast("double") - F.col("_mn")) / span),
            F.lit(RANGE_BLOCKS - 1),
        )
    )
    return (
        df.crossJoin(F.broadcast(b))
        .withColumn("_blk", blk.cast("long"))
        .drop("_mn", "_mx")
    )


def blocked_rank(df: DataFrame, key_col: str, tiebreak_col: str) -> DataFrame:
    """Append ``_rank``: the global ``row_number() OVER (ORDER BY
    key_col, tiebreak_col)`` computed WITHOUT a data-grain
    single-partition window — range-block the key space
    (RANGE_BLOCKS blocks), row_number within each block in parallel,
    and add per-block offsets from the prefix-sum over the ≤RANGE_BLOCKS
    per-block counts (the only global window, plan-time-bounded).
    For DESC order pass a negated key column. This is the scale-safe
    replacement for ``ntile/row_number OVER (ORDER BY …)`` on
    data-grain frames (VERDICT r5 task 1)."""
    blocked = _with_range_block(df, key_col)
    counts = blocked.groupBy("_blk").agg(F.count("*").alias("_cnt"))
    woff = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_blk", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
    )
    wblk = Window.partitionBy("_blk").orderBy(key_col, tiebreak_col)
    return (
        blocked.join(F.broadcast(offsets), "_blk")
        .withColumn("_rank", F.row_number().over(wblk) + F.col("_off"))
        .drop("_blk", "_off")
    )


def blocked_cumsum(
    df: DataFrame, key_col: str, val_col: str, out_col: str,
    inclusive: bool = True,
) -> DataFrame:
    """Append ``out_col``: the running ``sum(val_col) OVER (ORDER BY
    key_col)`` for frames whose rows are DISTINCT on ``key_col``
    (e.g. a groupBy(key) aggregate), via the same two-level plan as
    :func:`blocked_rank`: per-block partial sums (≤RANGE_BLOCKS rows)
    prefix-summed globally, plus a parallel within-block running sum.
    ``inclusive=False`` gives the ROWS … AND 1 PRECEDING frame."""
    blocked = _with_range_block(df, key_col)
    bsums = blocked.groupBy("_blk").agg(F.sum(val_col).alias("_bsum"))
    woff = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bsums.select(
        "_blk", F.coalesce(F.sum("_bsum").over(woff), F.lit(0)).alias("_off")
    )
    hi = 0 if inclusive else -1
    wblk = (
        Window.partitionBy("_blk")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = F.coalesce(F.sum(val_col).over(wblk), F.lit(0))
    return (
        blocked.join(F.broadcast(offsets), "_blk")
        .withColumn(out_col, local + F.col("_off"))
        .drop("_blk", "_off")
    )


def blocked_cummax(
    df: DataFrame, key_col: str, val_col: str, out_col: str,
    inclusive: bool = True,
) -> DataFrame:
    """Append ``out_col``: the running ``max(val_col) OVER (ORDER BY
    key_col)`` for frames DISTINCT on ``key_col`` — the running-max
    sibling of :func:`blocked_cumsum` (max is associative and
    prefix-decomposable exactly like sum): per-block partial maxes
    (≤RANGE_BLOCKS rows) prefix-maxed globally over the tiny block
    frame, plus a parallel within-block running max.
    ``inclusive=False`` gives the strict ROWS … AND 1 PRECEDING frame
    (NULL when nothing precedes — matching the SQL window's NULL)."""
    blocked = _with_range_block(df, key_col)
    bmax = blocked.groupBy("_blk").agg(F.max(val_col).alias("_bmx"))
    woff = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bmax.select(
        "_blk", F.max("_bmx").over(woff).alias("_off")
    )
    hi = 0 if inclusive else -1
    wblk = (
        Window.partitionBy("_blk")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = F.max(val_col).over(wblk)
    return (
        blocked.join(F.broadcast(offsets), "_blk")
        .withColumn(out_col, F.greatest(
            F.coalesce(local, F.col("_off")),
            F.coalesce(F.col("_off"), local),
        ))
        .drop("_blk", "_off")
    )


def exact_ntile(rank_expr: str, n_expr: str, k: int) -> "F.Column":
    """SQL-standard ``ntile(k)`` from a precomputed global rank and
    total count (both SQL expression strings over BIGINTs): with
    q = n div k and rem = n mod k, the first ``rem`` buckets get q+1
    rows — DuckDB's and Spark's shared remainder rule, verified by the
    rfm/decile oracles' native ntile. Pure integer arithmetic (div),
    so engine-identical at any n."""
    q = f"(({n_expr}) div {k})"
    rem = f"(({n_expr}) - {q} * {k})"
    cut = f"(({q} + 1) * {rem})"
    return F.expr(
        f"cast(case when ({rank_expr}) <= {cut} "
        f"then (({rank_expr}) - 1) div ({q} + 1) + 1 "
        f"else {rem} + (({rank_expr}) - 1 - {cut}) div {q} + 1 end as int)"
    )
