"""Hive-style partitioned parquet sink + partition pruning (the other
half of the 100 TB layout story next to bucketing): data written
partitioned by a coarse key is physically skipped — not read and
filtered — when a query constrains that key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from braintumor_data_pipeline_spark.sources.fixtures import load_table


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("orders_by_year"))
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    return out


def test_partition_pruning_in_plan(spark, part_dir):
    df = spark.read.parquet(part_dir).filter(F.col("o_year") == 1995)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the year predicate must land in PartitionFilters (directory skip),
    # not PushedFilters (row-group skip) — it's a partition column
    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    assert "1995" in plan[start : start + 200], plan[start : start + 300]


def test_pruned_read_matches_full_filter(spark, part_dir, sf_dir):
    pruned = spark.read.parquet(part_dir).filter(F.col("o_year") == 1995)
    full = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1995
    )
    assert pruned.count() == full.count() > 0


def test_dynamic_overwrite_replaces_one_partition(spark, part_dir):
    """Dynamic partition overwrite: rewriting one year must leave the
    other years' files untouched (idempotent backfill semantics)."""
    before = spark.read.parquet(part_dir)
    n_total = before.count()
    n_1995 = before.filter(F.col("o_year") == 1995).count()
    one_year = before.filter(F.col("o_year") == 1995)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        one_year.write.mode("overwrite").partitionBy("o_year").parquet(part_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = spark.read.parquet(part_dir)
    assert after.count() == n_total
    assert after.filter(F.col("o_year") == 1995).count() == n_1995


def test_dynamic_partition_pruning_from_join(spark, part_dir, sf_dir):
    """DYNAMIC partition pruning — the runtime half of the layout story:
    when the partition key is constrained only TRANSITIVELY through a
    join against a dim filtered on a NON-key column, Spark injects a
    dynamicpruning subquery into the fact scan's PartitionFilters at
    runtime, skipping directories no surviving dim row can match. (A
    literal filter on the join key itself wouldn't need DPP — static
    constraint propagation handles that.) At 100 TB this is what keeps
    a date-dim-filtered star join from scanning every partition."""
    fact = spark.read.parquet(part_dir)
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(
            (F.col("c_custkey") % 3 + 1995).alias("d_year"), "c_mktsegment"
        )
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("d_year")
        .distinct()
    )
    joined = fact.join(dim, fact.o_year == dim.d_year)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # semantics unchanged: join result equals the statically-filtered
    # equivalent over the surviving years
    years = [r.d_year for r in dim.collect()]
    assert joined.count() == fact.filter(F.col("o_year").isin(years)).count() > 0
