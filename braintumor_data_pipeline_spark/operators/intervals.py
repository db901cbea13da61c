"""Interval overlap joins — the range-join trap and its bin-bucketed fix.

A pure range predicate (``p.ts BETWEEN i.lo AND i.hi``) gives Spark no
equi-key, so Catalyst can only plan a broadcast-nested-loop or
cartesian join — O(|intervals|·|points|) comparisons, a non-starter
when both sides are large. The standard scalable rewrite (what
Databricks' range-join hints and every genomics engine do): quantize
time into fixed-width BINS no narrower than the longest interval, so
every interval covers at most 2 bins and every point exactly 1;
equi-join on the bin key, then apply the exact range predicate as a
post-filter. The join becomes a plain shuffled hash/merge join on a
uniform integer key — 100 TB-shaped — and because each point belongs to
ONE bin, no dedup pass is needed.

Demo semantics on the events fixture: every ``error`` event opens a
10-minute incident window; the operator attributes each ``view`` event
to every incident window it falls inside and reports per-incident hit
counts and exact cent totals (zero-hit incidents kept via a left join
of the aggregate back onto the intervals). The DuckDB oracle runs the
NAIVE range join — proving the binned plan computes the identical
relation while never materializing a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table as _t

#: Incident window length and bin width, seconds. Bin width MUST be
#: ≥ the longest interval for the ≤2-bins-per-interval guarantee; at
#: production scale pick the p99 interval length and route the rare
#: longer intervals through a small dedicated side-join.
WINDOW_S = 600


def overlap_join_binned(
    intervals: DataFrame, points: DataFrame, bin_s: int = WINDOW_S
) -> DataFrame:
    """Equi-join ``points`` (col ``p_ts``) into ``intervals`` (cols
    ``lo``/``hi``, half-open [lo, hi)) on the time-bin key, exact range
    filter after. Returns one row per (interval row, matching point
    row) — callers aggregate."""
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp("lo") / bin_s).cast("long"),
                (F.unix_timestamp("hi") / bin_s).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "_bin", (F.unix_timestamp("p_ts") / bin_s).cast("long")
    )
    return (
        iv.join(pt, "_bin")
        .filter((F.col("p_ts") >= F.col("lo")) & (F.col("p_ts") < F.col("hi")))
        .drop("_bin")
    )


@register(
    "interval_overlap_attribution",
    oracle=f"""
    WITH intervals AS (
      SELECT event_id AS incident_id, user_id AS incident_user, ts AS lo,
             ts + INTERVAL {WINDOW_S} SECOND AS hi
      FROM events WHERE event_type = 'error'
    ),
    hits AS (
      SELECT i.incident_id,
             count(*) AS n_views,
             CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM intervals i
      JOIN events e
        ON e.event_type = 'view' AND e.ts >= i.lo AND e.ts < i.hi
      GROUP BY i.incident_id
    )
    SELECT i.incident_id,
           coalesce(h.n_views, 0) AS n_views,
           coalesce(h.sum_cents, 0) AS sum_cents
    FROM intervals i LEFT JOIN hits h USING (incident_id)
    """,
    tags=("join", "range", "intervals"),
)
def interval_overlap_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Attribute view events to the 10-minute incident window of every
    error event via the BIN-BUCKETED overlap join (module docstring);
    per incident: view count + exact cent total, zero-hit incidents
    kept. The oracle is the naive range join — identical relation,
    nested-loop-free plan (pinned by test_intervals)."""
    ev = _t(spark, sf_dir, "events")
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr(f"INTERVAL {WINDOW_S} SECONDS")).alias("hi"),
    )
    points = ev.filter(F.col("event_type") == "view").select(
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    hits = (
        overlap_join_binned(intervals, points)
        .groupBy("incident_id")
        .agg(
            F.count("*").alias("n_views"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    return intervals.join(hits, "incident_id", "left").select(
        "incident_id",
        F.coalesce("n_views", F.lit(0)).alias("n_views"),
        F.coalesce("sum_cents", F.lit(0)).alias("sum_cents"),
    )
