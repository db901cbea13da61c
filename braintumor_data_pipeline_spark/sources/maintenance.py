"""Table-layout maintenance: small-file compaction and sort-clustering.

The reference appends blind to BigQuery and GCS (`/root/reference/
dataflow_pipeline.py:84-85,135-141`) and leaves layout to the warehouse;
with parquet on object storage the engine owns it. At 100 TB layout IS
the optimizer's raw material: file count bounds task count, and per-file
min/max footer stats are what selective scans prune with.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # align with maxPartitionBytes


def parquet_files(path: str) -> list[str]:
    return [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite a fragmented parquet directory into ~target-sized files
    (OPTIMIZE-style bin compaction). Returns the output file count.

    Sizing uses the CURRENT on-disk bytes — compressed size is the
    honest proxy for both scan cost and task count. One wide
    repartition; rows are bit-identical (no expressions evaluated).
    """
    total = sum(os.path.getsize(f) for f in parquet_files(src))
    n_out = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(dst)
    return n_out


def cluster_by(
    df: DataFrame, dst: str, n_files: int, *cols: str
) -> None:
    """Write ``df`` range-clustered on ``cols``: each output file covers
    a narrow, near-disjoint key range, so footer min/max stats prune
    whole files for selective predicates on those columns (the poor
    man's Z-order for a single sort dimension)."""
    df.repartitionByRange(n_files, *cols).sortWithinPartitions(
        *cols
    ).write.mode("overwrite").parquet(dst)
