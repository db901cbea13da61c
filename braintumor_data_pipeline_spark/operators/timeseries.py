"""Time-series / product-analytics operators over ``events`` (N*):
calendar-spine gap filling, funnel analysis, cohort retention.

The reference's only temporal notion is a processed-at ORDER BY
(`/root/reference/README.md:174-178`); these are the event-time shapes
an analytics engine over the same stats/event tables is actually asked
for. All pure DataFrame ops:

- the date spine is sequence+explode from one tiny min/max aggregate —
  never a driver-side date loop;
- funnel stages chain ordered conditional aggregates (stage N's
  timestamp must follow stage N-1's) — two shuffles on user_id total;
- cohorts are two groupBys on (user, week) then (cohort, offset),
  uniform keys throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec_col, dec_sum
from ..registry import register
from ..sources.fixtures import load_table as _t


@register(
    "date_spine_daily_revenue",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
             count(*) AS n_events
      FROM events WHERE event_type = 'purchase'
      GROUP BY day
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.revenue, 0.0) AS revenue,
           coalesce(d.n_events, 0) AS n_events
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    tags=("timeseries", "join", "agg"),
)
def date_spine_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily purchase revenue: a generated calendar spine
    (sequence over one broadcast min/max row) left-joined with the
    daily aggregate, zero-filled — days with no purchases appear."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            dec_sum("value").alias("revenue"),
            F.count("*").alias("n_events"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after_view,
           (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
    tags=("timeseries", "funnel", "agg"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER the first
    view, then purchased AFTER that click — each stage an aggregate
    joined forward on (user, ts > prev stage). Event-order funnels are
    the canonical product-analytics ask; everything shuffles on
    user_id."""
    e = _t(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame | None) -> DataFrame:
        s = e.filter(F.col("event_type") == event_type)
        if prev is not None:
            s = s.join(
                prev.select(F.col("user_id").alias("pu"), F.col("t").alias("pt")),
                (s.user_id == F.col("pu")) & (s.ts > F.col("pt")),
            )
        return s.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT epoch_us(f.cohort_week) AS cohort_week_us,
           CAST(date_diff('week', f.cohort_week, a.active_week) AS BIGINT)
             AS week_offset,
           count(*) AS n_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    tags=("timeseries", "cohort", "agg"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted in
    each later week they were active — the triangle every growth
    dashboard draws. Two uniform-key shuffles (user, then cohort
    cell)."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            (
                F.datediff(F.to_date("active_week"), F.to_date("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "ohlc_hourly_downsample",
    oracle="""
    SELECT epoch_us(ts) // 3600000000 * 3600000000 AS hour_us,
           round(arg_min(value, ts ORDER BY ts, event_id), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(arg_max(value, ts ORDER BY ts DESC, event_id DESC), 6)
             AS close,
           count(*) AS n
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY hour_us
    ORDER BY hour_us
    """,
    tags=("timeseries", "downsample", "agg"),
)
def ohlc_hourly_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the hypertable-rollup staple): per hour, the
    first/max/min/last purchase value. Open/close are max_by/min_by on
    the (ts, event_id) struct — ORDER-FREE aggregates, so the plan is
    one partial+final hash aggregation with no sort and no window; ties
    on ts break on event_id deterministically in both engines."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    us = F.unix_micros("ts")
    tie = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            (us - (us % 3_600_000_000)).alias("hour_us")
        )
        .agg(
            F.round(F.min_by("value", tie), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", tie), 6).alias("close"),
            F.count("*").alias("n"),
        )
        .orderBy("hour_us")
    )


@register(
    "rolling_7d_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS rev
      FROM events WHERE event_type = 'purchase'
      GROUP BY day
    )
    SELECT day,
           rev AS revenue,
           CAST(sum(CAST(rev AS DECIMAL(38,6))) OVER (
             ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d
    FROM daily
    ORDER BY day
    """,
    tags=("timeseries", "window", "agg"),
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue: aggregate to one row per DAY first, then
    a RANGE window over day numbers. The window's input is the per-day
    aggregate (~hundreds of rows however large the raw table), so the
    single-partition window sort is the benign prefix-sum pattern the
    plan audit distinguishes — the heavy lifting happened in the keyed
    aggregation below it."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(dec_col("value")).cast("double").alias("rev")
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        F.col("rev").alias("revenue"),
        F.sum(dec_col("rev")).over(w).cast("double").alias("rolling_7d"),
    ).orderBy("day")


@register(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, count(*) AS len
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(max(len) AS BIGINT) AS longest_streak,
           count(*) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
    tags=("timeseries", "window", "sequence", "agg"),
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands as a standalone operator: per user, consecutive
    active-day runs. Island id = epoch-day − row_number (constant within
    a consecutive run — the classic construction), then two keyed
    aggregates. All integers, exact on any engine. The window partitions
    on user_id (uniform key, bounded rows per user), so the plan is
    shuffle-on-user → per-user sort of a few dozen distinct days —
    unchanged at 100 TB."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        (
            F.datediff("day", F.lit("1970-01-01")).cast("long")
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


# Shared fixed-point robust-stats construction (see the MAD query below).
# Division-free scaled integers throughout: with c = cents,
#   m2 = c_(k1) + c_(k2)         (= 2·median, integral always)
#   dv = |2c − m2|               (= 2·|c − median|)
#   d2 = dv_(k1) + dv_(k2)       (= 4·MAD)
# k1/k2 are the two middle order statistics; when n is odd they
# coincide and the CASE sum double-counts the single middle row —
# the established grouped_exact_median trick.
_MAD_ORACLE = """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
      FROM events
    ),
    ranked AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ),
    med AS (
      SELECT event_type,
             CAST(sum(c * ((CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
                         + (CASE WHEN rn = (n + 2) // 2 THEN 1 ELSE 0 END)))
                  AS BIGINT) AS m2
      FROM ranked GROUP BY event_type
    ),
    dev AS (
      SELECT c.event_type, abs(2 * c.c - med.m2) AS dv
      FROM c JOIN med ON c.event_type = med.event_type
    ),
    dranked AS (
      SELECT event_type, dv,
             row_number() OVER (PARTITION BY event_type ORDER BY dv) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type,
             CAST(sum(dv * ((CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END)
                          + (CASE WHEN rn = (n + 2) // 2 THEN 1 ELSE 0 END)))
                  AS BIGINT) AS d2
      FROM dranked GROUP BY event_type
    )
    SELECT dev.event_type,
           count(*) AS n,
           CAST(max(med.m2) AS DOUBLE) / 200.0 AS median_value,
           CAST(max(mad.d2) AS DOUBLE) / 400.0 AS mad_value,
           CAST(sum(CASE WHEN dev.dv * 20000 > 44478 * mad.d2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev
    JOIN med ON dev.event_type = med.event_type
    JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type
"""


@register(
    "event_value_anomalies_mad",
    oracle=_MAD_ORACLE,
    tags=("timeseries", "stats", "anomaly", "window", "agg"),
)
def event_value_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust z-score anomaly counts per event type: flag values more
    than 3 scaled-MADs (1.4826·MAD ≈ σ for normal data) from the
    per-type median. EXACT fixed-point arithmetic end to end: values
    quantize to cents, medians are carried as the SUM of the two middle
    order statistics (``m2`` = 2·median — integral always, no division),
    deviations as ``dv = |2c − m2|`` (= 2·|c − median|), the MAD as
    ``d2`` = 4·MAD, and the 3·1.4826 threshold compares as the integer
    cross-product ``dv·20000 > 44478·d2`` — no float accumulates
    anywhere, so any engine produces bit-identical counts.

    Scale note: like grouped_exact_median, the two order-statistics
    windows sort within each event_type (5 heavy groups here). At
    100 TB swap the exact medians for approx_percentile and keep the
    integer comparison; the exact form is the correctness reference."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
    )

    def _mid_sum(df: DataFrame, col: str, out: str) -> DataFrame:
        """Sum of the two middle order statistics of ``col`` per type
        (n odd → the single middle row double-counts)."""
        wr = Window.partitionBy("event_type").orderBy(col)
        wn = Window.partitionBy("event_type")
        picked = F.when(
            F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("long"), 1
        ).otherwise(0) + F.when(
            F.col("rn") == F.floor((F.col("n") + 2) / 2).cast("long"), 1
        ).otherwise(0)
        return (
            df.select(
                "event_type",
                col,
                F.row_number().over(wr).alias("rn"),
                F.count("*").over(wn).alias("n"),
            )
            .groupBy("event_type")
            .agg(F.sum(F.col(col) * picked).alias(out))
        )

    med = _mid_sum(c, "c", "m2")
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("c") - F.col("m2")).alias("dv")
    )
    mad = _mid_sum(dev, "dv", "d2")
    return (
        dev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.max("m2").cast("double") / 200.0).alias("median_value"),
            (F.max("d2").cast("double") / 400.0).alias("mad_value"),
            F.sum(
                F.when(
                    F.col("dv") * 20000 > 44478 * F.col("d2"), 1
                ).otherwise(0)
            ).alias("n_anomalies"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    tags=("timeseries", "window", "sequence", "agg"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive events per user —
    the sequence-analytics primitive under journey analysis and
    next-event prediction features. One window (partitioned by user_id
    — uniform keys, bounded partitions) + one small aggregate; ties on
    ts break on event_id so both engines see the same ordering."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "rolling_active_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM daily)
    SELECT d.day,
           (SELECT count(*) FROM daily x WHERE x.day = d.day) AS dau,
           count(DISTINCT a.user_id) AS wau_7d
    FROM days d
    JOIN daily a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    tags=("timeseries", "window", "distinct"),
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + 7-day rolling distinct users — the sliding-DISTINCT
    problem. count(DISTINCT) over a RANGE frame is not partially
    aggregable, so the naive window form degenerates to per-row set
    scans; the scalable rewrite EXPLODES each (day, user) fact into the
    ≤7 target days it contributes to, making the rolling distinct a
    plain groupBy count-distinct on (target_day) — shuffle keyed by
    day, map-side dedup, no window at all. Cost: 7× the deduped daily
    relation (users × days, tiny next to raw events), the standard
    time-fanout trade every DAU/WAU/MAU pipeline makes. Target days
    semi-join the observed-day spine (broadcast, one row per day) so
    fan-out rows landing past the last observed day drop out."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    fanned = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
        "user_id",
    ).select(F.date_add("day", F.col("off")).alias("day"), "user_id")
    wau = (
        fanned.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )
    dau = daily.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return dau.join(wau, "day").select("day", "dau", "wau_7d")


@register(
    "cusum_changepoint_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY day
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
                   count(*) AS n FROM daily),
    walk AS (
      SELECT day, cents,
             CAST(sum(cents) OVER (ORDER BY day) AS BIGINT) AS prefix,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    )
    SELECT w.day, w.cents,
           CAST(t.n * w.prefix - w.i * t.total AS BIGINT) AS cusum_scaled,
           CAST(abs(t.n * w.prefix - w.i * t.total) = (
             SELECT max(abs(t2.n * w2.prefix - w2.i * t2.total))
             FROM walk w2, tot t2
           ) AS BOOLEAN) AS is_changepoint
    FROM walk w, tot t
    """,
    tags=("timeseries", "window", "anomaly"),
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over daily event revenue — "did the
    level shift, and on which day". The classic statistic S_i =
    Σ_{j≤i}(x_j − x̄) peaks (in absolute value) at the most likely
    change-point. Kept EXACT by scaling: n·S_i = n·prefix_i − i·total
    is pure BIGINT arithmetic (no mean division), so both engines agree
    bit-for-bit and retries/partitioning can't move the argmax. Plan
    shape: the prefix window runs over the pre-aggregated per-day frame
    (one row per day — the benign class), and total/n arrive as a
    broadcast scalar; the only full-data work is the daily cents
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("day")
    walk = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).alias("prefix"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    tot = daily.agg(
        F.sum("cents").alias("total"), F.count("*").alias("n")
    )
    scored = walk.crossJoin(F.broadcast(tot)).select(
        "day",
        "cents",
        (F.col("n") * F.col("prefix") - F.col("i") * F.col("total")).alias(
            "cusum_scaled"
        ),
    )
    peak = scored.agg(F.max(F.abs("cusum_scaled")).alias("peak"))
    return scored.crossJoin(F.broadcast(peak)).select(
        "day",
        "cents",
        "cusum_scaled",
        (F.abs("cusum_scaled") == F.col("peak")).alias("is_changepoint"),
    )


@register(
    "recency_weighted_user_value",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    horizon AS (SELECT max(day) AS h FROM d)
    SELECT user_id,
           CAST(sum(cents * CAST(power(2, 30 - least(date_diff('day', day, h),
                                                     30)) AS BIGINT))
                AS BIGINT) AS decay_score_q30,
           count(*) AS n_events
    FROM d, horizon
    GROUP BY user_id
    """,
    tags=("timeseries", "agg", "feature"),
)
def recency_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed engagement score (half-life = 1 day) —
    the recency-weighted feature every ranking/CRM pipeline computes,
    made EXACT: weight 2^(30−age) is an integer for age ≤ 30 (ages
    clamp at the 30-day horizon where the weight is 1), so the score is
    a pure BIGINT sum in Q30 fixed point — order-independent,
    partial-aggregable, and bit-identical on both engines. cents ≈ 2¹¹
    × 2³⁰ weight × ~10² events ≈ 2⁴⁸ — far inside BIGINT. The horizon
    (max day) is a broadcast scalar, not a driver round trip."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    horizon = d.agg(F.max("day").alias("h"))
    age = F.least(F.datediff(F.col("h"), F.col("day")), F.lit(30))
    weight = F.pow(F.lit(2.0), (F.lit(30) - age).cast("double")).cast("long")
    return (
        d.crossJoin(F.broadcast(horizon))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * weight).alias("decay_score_q30"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "theil_sen_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT CAST(date_diff('day', (SELECT min(day) FROM daily), day)
                  AS BIGINT) AS d,
             cents
      FROM daily
    ),
    pairs AS (
      SELECT b.cents - a.cents AS num, b.d - a.d AS den
      FROM idx a JOIN idx b ON a.d < b.d
    ),
    slopes AS (
      SELECT CAST(num AS DOUBLE) / den AS s,
             row_number() OVER (
               ORDER BY CAST(num AS DOUBLE) / den, num, den
             ) AS rn
      FROM pairs
    ),
    np AS (SELECT count(*) AS n FROM pairs),
    slope AS (
      SELECT avg(s) AS slope FROM slopes, np
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    ),
    res AS (
      SELECT i.cents - sl.slope * i.d AS r, i.d
      FROM idx i, slope sl
    ),
    rres AS (
      SELECT r, row_number() OVER (ORDER BY r, d) AS rn FROM res
    ),
    nd AS (SELECT count(*) AS n FROM idx),
    icept AS (
      SELECT avg(r) AS intercept FROM rres, nd
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    )
    SELECT CAST(nd.n AS BIGINT) AS n_days,
           CAST(np.n AS BIGINT) AS n_pairs,
           round(slope.slope, 6) AS slope_cents_per_day,
           round(icept.intercept, 6) AS intercept_cents
    FROM nd, np, slope, icept
    """,
    tags=("timeseries", "stats", "robust"),
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event revenue: slope = median of
    all pairwise day-to-day slopes, intercept = median of residuals at
    that slope — the outlier-resistant regression ops teams prefer over
    OLS for revenue/latency trend lines (compare `ols_price_on_quantity`
    for the moment-sum OLS recipe).

    Exactness recipe: cents are integers, each pairwise slope is the
    double num/den of two integers (IEEE division — bit-identical on
    both engines), and each MEDIAN is an order statistic: rank over the
    multiset, value-at-rank = min value whose cumulative multiplicity
    reaches the target rank — no accumulation-order float drift exists
    anywhere. (The oracle states the same selection with a plain
    row_number; identical multiset, identical picked values.)

    Scale shape: the only full-data work is the daily cents aggregate.
    Pairs are enumerated on the per-day grain (days² — the classic
    Theil-Sen cost, calendar-bounded, documented in CARTESIAN_OK; NOT
    corpus²), then immediately re-aggregated by (num, den), so the
    cumulative-rank windows run over GROUPED frames (the
    prefix-sum-over-aggregate benign class, like
    `cusum_changepoint_daily`) and every median pick reduces to a
    scalar broadcast."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    idx = (
        daily.crossJoin(F.broadcast(d0))
        .select(
            F.datediff("day", "d0").cast("long").alias("d"), "cents"
        )
        .localCheckpoint()
    )
    a = idx.select(F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = idx.select(F.col("d").alias("db"), F.col("cents").alias("cb"))
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        (F.col("cb") - F.col("ca")).alias("num"),
        (F.col("db") - F.col("da")).alias("den"),
    )
    # median of a multiset by weighted order statistics: group identical
    # slopes, cumulate multiplicities in slope order, pick the first
    # group reaching each target rank. The window input is the GROUPED
    # (num, den) frame — the aggregated-input prefix-sum class.
    sg = pairs.groupBy("num", "den").agg(F.count("*").alias("m"))
    sgs = sg.select(
        (F.col("num").cast("double") / F.col("den")).alias("s"),
        "num",
        "den",
        "m",
    )
    wslope = Window.orderBy("s", "num", "den").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cums = sgs.select("s", F.sum("m").over(wslope).alias("cum"))
    np_ = pairs.agg(F.count("*").alias("n_pairs"))
    lo_s = (
        cums.crossJoin(F.broadcast(np_))
        .filter(F.col("cum") >= F.expr("(n_pairs + 1) div 2"))
        .agg(F.min("s").alias("s_lo"))
    )
    hi_s = (
        cums.crossJoin(F.broadcast(np_))
        .filter(F.col("cum") >= F.expr("n_pairs div 2 + 1"))
        .agg(F.min("s").alias("s_hi"))
    )
    slope = lo_s.crossJoin(F.broadcast(hi_s)).select(
        ((F.col("s_lo") + F.col("s_hi")) / 2).alias("slope")
    )
    res = idx.crossJoin(F.broadcast(slope)).select(
        (F.col("cents") - F.col("slope") * F.col("d")).alias("r")
    )
    # residuals likewise: group by value (days with identical residuals
    # merge — interchangeable for a value median), cumulate, pick.
    rg = res.groupBy("r").agg(F.count("*").alias("m"))
    wres = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumr = rg.select("r", F.sum("m").over(wres).alias("cum"))
    nd = idx.agg(F.count("*").alias("n_days"))
    lo_r = (
        cumr.crossJoin(F.broadcast(nd))
        .filter(F.col("cum") >= F.expr("(n_days + 1) div 2"))
        .agg(F.min("r").alias("r_lo"))
    )
    hi_r = (
        cumr.crossJoin(F.broadcast(nd))
        .filter(F.col("cum") >= F.expr("n_days div 2 + 1"))
        .agg(F.min("r").alias("r_hi"))
    )
    icept = lo_r.crossJoin(F.broadcast(hi_r)).select(
        ((F.col("r_lo") + F.col("r_hi")) / 2).alias("intercept")
    )
    return (
        nd.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(slope))
        .crossJoin(F.broadcast(icept))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("slope_cents_per_day"),
            F.round("intercept", 6).alias("intercept_cents"),
        )
    )


@register(
    "twap_daily_value",
    oracle="""
    WITH seq AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY CAST(ts AS DATE)
                                      ORDER BY ts, event_id) AS t_next
      FROM events
    )
    SELECT d,
           CAST(count(*) AS BIGINT) AS n_events,
           (max(t) - min(t)) // 1000000 AS span_s,
           CASE WHEN max(t) > min(t) THEN
             round(CAST(sum(CASE WHEN t_next IS NOT NULL
                                 THEN v_cents * (t_next - t) END) AS DOUBLE)
                   / (max(t) - min(t)) / 100, 6)
           END AS twap_usd
    FROM seq
    GROUP BY d
    ORDER BY d
    """,
    tags=("timeseries", "window", "agg", "twap"),
)
def twap_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per day (TWAP — the step-function
    integral ÷ elapsed time, the finance/metering downsample that a
    plain AVG gets wrong whenever observations are irregularly spaced):
    each event's value holds until the next event of the SAME day; the
    last event carries no weight (integral over the observed span).
    Exactness: weights are integer microsecond gaps from a
    day-partitioned lead() window, v_cents·gap products sum as
    DECIMAL(38,0) (a day of cents·µs reaches ~10¹⁹ — past LONG; DuckDB
    widens its BIGINT sum to HUGEINT on its own), and the single float
    division happens per output day. Single-event days → NULL (zero
    span). Shuffle profile: one day-partitioned window + one groupBy on
    the same key — the second shuffle reuses the first's partitioning."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    d = F.to_date("ts").alias("d")
    w = Window.partitionBy(F.to_date("ts")).orderBy("ts", "event_id")
    seq = e.select(
        d,
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    )
    g = seq.groupBy("d").agg(
        F.count("*").alias("n_events"),
        F.floor((F.max("t") - F.min("t")) / 1000000)
        .cast("long")
        .alias("span_s"),
        F.sum(
            F.when(
                F.col("t_next").isNotNull(),
                (F.col("v_cents") * (F.col("t_next") - F.col("t"))).cast(
                    "decimal(38,0)"
                ),
            )
        ).alias("wsum"),
        (F.max("t") - F.min("t")).alias("span_us"),
    )
    return g.select(
        "d",
        "n_events",
        "span_s",
        F.when(
            F.col("span_us") > 0,
            F.round(
                F.col("wsum").cast("double") / F.col("span_us") / 100, 6
            ),
        ).alias("twap_usd"),
    ).orderBy("d")


@register(
    "kendall_tau_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x,
             CAST(count(DISTINCT user_id) AS BIGINT) AS y
      FROM events GROUP BY day
    ),
    pairs AS (
      SELECT (b.x - a.x) AS dx, (b.y - a.y) AS dy
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    c AS (
      SELECT
        CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied_x,
        CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied_y
      FROM pairs
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
    SELECT nn.n_days, c.n_pairs, c.nc, c.nd, c.tied_x, c.tied_y,
           round((c.nc - c.nd) / sqrt(CAST((c.n_pairs - c.tied_x)
                 * (c.n_pairs - c.tied_y) AS DOUBLE)), 6) AS tau_b
    FROM c CROSS JOIN nn
    """,
    tags=("timeseries", "stats", "rank"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between daily revenue and daily active users — the
    rank-association companion to spearman_rho_qty_price, computed the
    exact way: concordant / discordant / tied pair COUNTS (pure integer
    comparisons), with the τ-b tie correction from the same counts; the
    single sqrt runs once over two exact integers. Scale shape: one
    full-data daily aggregate, then pair enumeration on the per-day
    grain (days² — calendar-bounded like theil_sen_daily_trend's
    CARTESIAN_OK class, NOT corpus²) reduced by one combinable agg."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("x"),
        F.countDistinct("user_id").cast("long").alias("y"),
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        (F.col("xb") - F.col("xa")).alias("dx"),
        (F.col("yb") - F.col("ya")).alias("dy"),
    )
    c = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("dx") * F.col("dy") > 0, 1).otherwise(0))
        .cast("long")
        .alias("nc"),
        F.sum(F.when(F.col("dx") * F.col("dy") < 0, 1).otherwise(0))
        .cast("long")
        .alias("nd"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0))
        .cast("long")
        .alias("tied_x"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0))
        .cast("long")
        .alias("tied_y"),
    )
    nn = daily.agg(F.count("*").cast("long").alias("n_days"))
    return c.crossJoin(F.broadcast(nn)).select(
        "n_days",
        "n_pairs",
        "nc",
        "nd",
        "tied_x",
        "tied_y",
        F.round(
            (F.col("nc") - F.col("nd"))
            / F.sqrt(
                (
                    (F.col("n_pairs") - F.col("tied_x"))
                    * (F.col("n_pairs") - F.col("tied_y"))
                ).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
      FROM events GROUP BY day
    ),
    pairs AS (
      SELECT CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END
               AS sgn
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    s AS (SELECT CAST(sum(sgn) AS BIGINT) AS s_stat FROM pairs),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT count(*) AS t FROM daily GROUP BY y HAVING count(*) > 1)
    )
    SELECT nn.n AS n_days, s.s_stat,
           round((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                 / 18.0, 6) AS var_s,
           round(CASE
             WHEN s.s_stat > 0 THEN (s.s_stat - 1)
               / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                      / 18.0)
             WHEN s.s_stat < 0 THEN (s.s_stat + 1)
               / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                      / 18.0)
             ELSE 0.0 END, 6) AS z_stat,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM s CROSS JOIN nn CROSS JOIN ties
    """,
    tags=("timeseries", "stats", "trend"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily revenue — the
    nonparametric seasonal-ops standard (is the series drifting,
    without assuming linearity or normality). S = Σ_{i<j} sign(y_j −
    y_i) is an exact integer from pairwise sign counts; Var(S) uses
    the exact tie-group correction (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18;
    the continuity-corrected Z spends one sqrt over exact integers.
    Same scale shape as kendall_tau_daily: one full-data daily
    aggregate, then calendar-bounded day² pair enumeration (the
    theil_sen CARTESIAN_OK class) reduced by a combinable agg."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("y")
    )
    a = daily.select(F.col("day").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("y").alias("yb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .select(
            F.when(F.col("yb") > F.col("ya"), 1)
            .when(F.col("yb") < F.col("ya"), -1)
            .otherwise(0)
            .alias("sgn")
        )
        .agg(F.sum("sgn").cast("long").alias("s_stat"))
    )
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var_expr = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18.0
    z = (
        F.when(
            F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_expr)
        )
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_expr))
        .otherwise(F.lit(0.0))
    )
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            F.round(var_expr, 6).alias("var_s"),
            F.round(z, 6).alias("z_stat"),
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("no_trend")
            .alias("trend"),
        )
    )


@register(
    "fano_overdispersion",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, day
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days,
           round(CAST(s1 AS DOUBLE) / n_days, 6) AS mean_daily,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days)
                 / (n_days - 1), 6) AS var_daily,
           round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days)
                  / (n_days - 1))
                 / (CAST(s1 AS DOUBLE) / n_days), 6) AS fano_factor,
           ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days)
            / (n_days - 1))
           / (CAST(s1 AS DOUBLE) / n_days) > 1.5 AS overdispersed
    FROM s
    ORDER BY event_type
    """,
    tags=("timeseries", "stats", "quality"),
)
def fano_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of DAILY event counts per
    type — the overdispersion screen that says whether arrivals are
    Poisson-like (F ≈ 1) or bursty/clumped (F ≫ 1, i.e. a negative-
    binomial world where Poisson-based alert thresholds misfire); the
    count-domain companion to interarrival_poisson_check. Exact
    integer daily-count moments from one combinable two-key groupBy
    reduced to the 5-type grid; the float algebra runs once per type
    row. Flag at F > 1.5 (documented heuristic)."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_days")
    ) / (F.col("n_days") - 1)
    return s.select(
        "event_type",
        "n_days",
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(var / mean, 6).alias("fano_factor"),
        (var / mean > 1.5).alias("overdispersed"),
    ).orderBy("event_type")


#: Page-Hinkley drift parameters: delta is the tolerated per-day mean
#: shift (cents), lambda the alarm threshold on the PH gap. Both are
#: plan literals; the statistic is sequential by definition, so every
#: accumulation below is a running PREFIX window over the ordered day
#: grid — genuinely left-to-right on both engines.
PH_DELTA_CENTS = 500.0
PH_LAMBDA_CENTS = 50000.0


@register(
    "page_hinkley_drift",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ),
    seq AS (
      SELECT day,
             CAST(cents AS DOUBLE) / n AS xbar,
             row_number() OVER (ORDER BY day) AS t,
             sum(CAST(cents AS DOUBLE)) OVER w
               / sum(CAST(n AS DOUBLE)) OVER w AS mu_t
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    ph AS (
      SELECT day, t, xbar, mu_t,
             sum(xbar - mu_t - {PH_DELTA_CENTS}) OVER w2 AS m_t
      FROM seq
      WINDOW w2 AS (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    gap AS (
      SELECT day, t,
             round(xbar / 100, 6) AS day_mean,
             round(mu_t / 100, 6) AS running_mean,
             round(m_t - min(m_t) OVER w3, 6) AS ph_gap_cents
      FROM ph
      WINDOW w3 AS (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(t AS BIGINT) AS t, day_mean, running_mean,
           ph_gap_cents,
           ph_gap_cents > {PH_LAMBDA_CENTS} AS drift_alarm
    FROM gap
    ORDER BY day
    """,
    tags=("timeseries", "drift", "sequential", "window"),
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift detector on the daily mean event
    value — the streaming-ML standard for "has the mean shifted
    upward?" (alarm when the cumulative deviation from the running
    mean, minus its own running minimum, exceeds λ); the
    per-observation companion to cusum_changepoint_daily's
    retrospective split. Every accumulation (running weighted mean,
    PH sum, running minimum) is a running PREFIX window over the
    ordered day grid — sequential left-to-right folds, bit-identical
    on both engines (never a full-frame sum), over exact integer
    daily (cents, count) aggregates. Scale shape: one combinable
    daily groupBy; windows touch only the calendar-bounded grid."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
        F.count("*").cast("long").alias("n"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = daily.select(
        "day",
        (F.col("cents").cast("double") / F.col("n")).alias("xbar"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (
            F.sum(F.col("cents").cast("double")).over(w)
            / F.sum(F.col("n").cast("double")).over(w)
        ).alias("mu_t"),
    )
    ph = seq.select(
        "day",
        "t",
        "xbar",
        "mu_t",
        F.sum(
            F.col("xbar") - F.col("mu_t") - F.lit(PH_DELTA_CENTS)
        )
        .over(w)
        .alias("m_t"),
    )
    gap = ph.select(
        "day",
        "t",
        F.round(F.col("xbar") / 100, 6).alias("day_mean"),
        F.round(F.col("mu_t") / 100, 6).alias("running_mean"),
        F.round(F.col("m_t") - F.min("m_t").over(w), 6).alias(
            "ph_gap_cents"
        ),
    )
    return gap.select(
        "day",
        F.col("t").cast("long").alias("t"),
        "day_mean",
        "running_mean",
        "ph_gap_cents",
        (F.col("ph_gap_cents") > PH_LAMBDA_CENTS).alias("drift_alarm"),
    ).orderBy("day")
