"""Bin-bucketed interval overlap join and BFS levels."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from braintumor_data_pipeline_spark.operators.intervals import (
    interval_overlap_attribution,
    overlap_join_binned,
)
from braintumor_data_pipeline_spark.operators.graph import (
    bfs_levels_from_min_vertex,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second
    )


class TestOverlapJoinBinned:
    def test_boundary_semantics_half_open(self, spark):
        iv = spark.createDataFrame(
            [Row(incident_id=1, lo=_ts(0), hi=_ts(10))]
        )
        pts = spark.createDataFrame(
            [
                Row(p_ts=_ts(0), tag="at-lo"),          # included (>= lo)
                Row(p_ts=_ts(9, 59), tag="inside"),     # included
                Row(p_ts=_ts(10), tag="at-hi"),         # EXCLUDED (< hi)
                Row(p_ts=_ts(11), tag="after"),         # excluded
            ]
        )
        got = sorted(
            r.tag for r in overlap_join_binned(iv, pts, bin_s=600).collect()
        )
        assert got == ["at-lo", "inside"]

    def test_cross_bin_interval_matches_both_sides(self, spark):
        # interval straddles a bin boundary: points in either bin match
        iv = spark.createDataFrame(
            [Row(incident_id=1, lo=_ts(5), hi=_ts(15))]
        )
        pts = spark.createDataFrame(
            [
                Row(p_ts=_ts(6), tag="bin0"),
                Row(p_ts=_ts(14), tag="bin1"),
                Row(p_ts=_ts(4), tag="before"),
            ]
        )
        got = sorted(
            r.tag for r in overlap_join_binned(iv, pts, bin_s=600).collect()
        )
        assert got == ["bin0", "bin1"]

    def test_no_duplicate_rows_per_point(self, spark):
        # a point belongs to exactly one bin → exactly one output row
        iv = spark.createDataFrame(
            [Row(incident_id=1, lo=_ts(0), hi=_ts(10))]
        )
        pts = spark.createDataFrame([Row(p_ts=_ts(3), tag="p")])
        assert overlap_join_binned(iv, pts, bin_s=600).count() == 1

    def test_plan_has_no_nested_loop(self, spark, sf_dir):
        plan = (
            interval_overlap_attribution(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestBfsLevels:
    def test_source_is_level_zero_and_levels_monotone(self, spark, sf_dir):
        rows = {r.doc_id: r.level for r in
                bfs_levels_from_min_vertex(spark, sf_dir).collect()}
        src = min(rows)  # min vertex id in the pair graph is the source
        assert rows[src] == 0
        assert all(0 <= lvl <= 4 for lvl in rows.values())
        # BFS levels are contiguous: if level k>0 appears, so does k-1
        present = sorted(set(rows.values()))
        assert present == list(range(len(present)))


class TestBinnedEqualsNaive:
    def test_randomized_equivalence_vs_naive_join(self, spark):
        """Seeded random intervals/points: the binned equi-join must
        produce exactly the naive range-join's pair set, including
        intervals shorter than / equal to the bin and points on every
        boundary."""
        import random

        rng = random.Random(20240814)
        base = dt.datetime(2024, 1, 1)
        intervals = []
        for i in range(120):
            lo = base + dt.timedelta(seconds=rng.randrange(0, 7200))
            length = rng.choice([1, 59, 60, 599, 600])
            intervals.append(
                Row(incident_id=i, lo=lo, hi=lo + dt.timedelta(seconds=length))
            )
        points = [
            Row(p_ts=base + dt.timedelta(seconds=rng.randrange(0, 7200)),
                pid=j)
            for j in range(400)
        ]
        iv = spark.createDataFrame(intervals)
        pt = spark.createDataFrame(points)
        got = {
            (r.incident_id, r.pid)
            for r in overlap_join_binned(iv, pt, bin_s=600).collect()
        }
        want = {
            (i.incident_id, p.pid)
            for i in intervals
            for p in points
            if i.lo <= p.p_ts < i.hi
        }
        assert got == want
