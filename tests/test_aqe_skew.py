"""AQE skew-join splitting, demonstrated for real: with a deliberately
skewed join key and test-scaled thresholds, the adaptive plan must mark
the skewed partition as split (``skew=true``) — the runtime insurance
SCALE.md leans on for fact-fact joins at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        # scale the thresholds down so fixture-sized data can be "skewed"
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows on ONE key vs 8k spread over 8k keys → partition 0
        # is ~25× the median
        big = spark.range(0, 200_000).select(
            F.lit(7).alias("k"), F.col("id").alias("payload")
        ).union(
            spark.range(0, 8_000).select(
                (F.col("id") % 8_000).alias("k").cast("long"),
                F.col("id").alias("payload"),
            )
        )
        dim = spark.range(0, 8_001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        # aggregate WITHOUT the join key: a groupBy on k downstream
        # would pin the join's output partitioning and make AQE skip
        # the split (it refuses to add a recovery shuffle by default)
        joined = big.join(dim, "k").agg(F.sum("payload").alias("s"))
        joined.collect()  # materialize so AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1200]
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition:\n" + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
