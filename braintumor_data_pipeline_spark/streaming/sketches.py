"""Streaming sketch builds — bounded-state aggregation over unbounded
input (SURVEY §2.11 composition with operators/sketch.py).

An HLL register build is the ideal streaming aggregate: state is EXACTLY
m integers regardless of stream length or key cardinality (no watermark
needed — the state cannot grow), updates are max() (idempotent and
order-independent, so retries/replays cannot corrupt it), and the batch
and streaming builds share the same stateless (bucket, rho) projection,
so batch ≡ stream is testable row-for-row. Contrast with the windowed
event aggregations (`events.py`), whose state is bounded by watermark,
not by construction.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import hll_bucket_rho, hll_spine_registers
from ..sources.fixtures import ensure_nanos_readable


def run_streaming_hll_registers(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Build the 64 HLL registers over the events.user_id stream as a
    genuine Structured Streaming job (file source fed one file per
    micro-batch, complete-mode memory sink), then spine-join to the
    full (bucket, register) relation. Tests assert this equals the
    batch build over the same keys."""
    ensure_nanos_readable(spark)
    stage_dir = checkpoint_dir + "_src"
    os.makedirs(stage_dir, exist_ok=True)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stage_dir, "events.parquet"),
    )
    raw_schema = spark.read.parquet(
        os.path.join(stage_dir, "events.parquet")
    ).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
    )
    keys = stream.select(F.col("user_id").alias("key"))
    agg = hll_bucket_rho(keys).groupBy("bucket").agg(
        F.max("rho").alias("rho")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_stream_registers")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return hll_spine_registers(spark.table("hll_stream_registers"))
