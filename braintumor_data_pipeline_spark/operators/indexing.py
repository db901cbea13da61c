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
