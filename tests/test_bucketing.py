"""Bucketed co-located join (SURVEY J4 scale path): pre-bucketing both
fact tables on the join key lets Spark plan the join with NO shuffle
exchange on either side — the 100 TB repeated-join optimization."""

from __future__ import annotations

import pytest

from braintumor_data_pipeline_spark.sources.fixtures import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .saveAsTable(f"bucketed.{name}")
        )
    return wh


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li = spark.table("bucketed.lineitem")
    o = spark.table("bucketed.orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).count()
    # at fixture scale Spark would broadcast; force the sort-merge path
    # to demonstrate the bucketing effect (at 100 TB neither side
    # broadcasts and this IS the plan)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # the join must not introduce a shuffle: the only Exchange
        # allowed is the final aggregation's
        assert n_exchanges <= 1, f"bucketed join still shuffles:\n{plan[:2000]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the result matches the unbucketed join
    li2 = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    o2 = load_table(spark, "/root/testdata/sf0.001", "orders")
    expect = {
        (r.o_orderpriority, r["count"])
        for r in li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    got = {(r.o_orderpriority, r["count"]) for r in joined.collect()}
    assert got == expect


def test_registered_bucketed_star_join_plan_and_values(spark, sf_dir):
    """The REGISTERED query (VERDICT r2 item 8): its executed plan must
    show the bucketed zero-shuffle join (SelectedBucketsCount, SMJ, no
    join-side Exchange) and its values must match the raw-table join."""
    from braintumor_data_pipeline_spark.operators.bucketed import (
        N_BUCKETS,
        bucketed_star_join,
    )

    df = bucketed_star_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert f"SelectedBucketsCount: {N_BUCKETS} out of {N_BUCKETS}" in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, f"bucketed join still shuffles:\n{plan[:2000]}"

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.functions.money import dec_col

    expect = {
        tuple(r)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.sum(dec_col(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .collect()
    }
    assert {tuple(r) for r in df.collect()} == expect


def test_bucketed_group_agg_has_zero_exchanges(spark, sf_dir):
    """groupBy on the bucket key rides the layout: the whole plan has
    NO Exchange (scan's bucket partitioning satisfies the aggregate's
    distribution requirement) — the second bucketing payoff beyond the
    zero-shuffle join."""
    from braintumor_data_pipeline_spark import registry

    df = registry.all_queries()["bucketed_group_agg"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    assert "SelectedBucketsCount" in plan
    assert df.count() > 0
