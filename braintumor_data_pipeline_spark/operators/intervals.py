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


@register(
    "interval_union_coverage",
    oracle="""
    WITH win AS (
      SELECT CAST(ts AS DATE) AS d,
             epoch_us(ts) AS s,
             epoch_us(ts) + 600000000 AS e,
             event_id
      FROM events WHERE event_type = 'purchase'
    ),
    flagged AS (
      SELECT d, s, e, event_id,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY d ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                  THEN 1 ELSE 0 END AS is_new
      FROM win
    ),
    numbered AS (
      SELECT d, s, e,
             sum(is_new) OVER (PARTITION BY d ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span_id
      FROM flagged
    ),
    spans AS (
      SELECT d, span_id, max(e) - min(s) AS len_us
      FROM numbered GROUP BY d, span_id
    )
    SELECT d,
           CAST(count(*) AS BIGINT) AS n_merged_spans,
           CAST(sum(len_us) // 1000000 AS BIGINT) AS covered_s
    FROM spans
    GROUP BY d
    ORDER BY d
    """,
    tags=("intervals", "window", "agg"),
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION (coverage) — the measure-of-a-union-of-intervals
    operator that complements the overlap JOIN: each purchase opens a
    10-minute incident window; per day, overlapping windows merge into
    maximal spans (gaps-and-islands over interval endpoints, the same
    machinery as ``repeated_span_detection`` in the time domain) and
    the output is merged-span count + total covered seconds — the
    "how much of the day was at least one incident active" number
    (alert fatigue, SLA coverage, maintenance-window math). Windows
    are day-partitioned; all arithmetic integer microseconds with one
    integer division to seconds. Tie-break (s, event_id) keeps the
    island flags total-ordered."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    win = e.filter(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("d"),
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 600000000).alias("e"),
        "event_id",
    )
    w_prev = (
        W.partitionBy("d")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("d")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    flagged = win.withColumn(
        "is_new",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0),
    )
    numbered = flagged.withColumn("span_id", F.sum("is_new").over(w_run))
    spans = numbered.groupBy("d", "span_id").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return (
        spans.groupBy("d")
        .agg(
            F.count("*").alias("n_merged_spans"),
            F.expr("sum(len_us) div 1000000").cast("long").alias("covered_s"),
        )
        .orderBy("d")
    )
