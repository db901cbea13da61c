"""Warehouse change-management patterns (N*): SCD Type-2 history
construction and MERGE (upsert) semantics — the ETL shapes a stats
table like the reference's BigQuery sink (`/root/reference/
dataflow_pipeline.py:135-141`, WRITE_APPEND only) grows into once
updates and corrections exist.

Both are expressed as pure DataFrame ops (no Delta/iceberg dependency):
SCD2 is gaps-and-islands over event time; MERGE is the standard
expansion ``(target ANTI source) UNION ALL transform(source)`` — at
scale both shuffle once on the key, and MERGE's anti join is exactly
what table formats run under the hood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table as _t


@register(
    "scd2_user_type_history",
    oracle="""
    SELECT user_id, event_type,
           epoch_us(min(ts)) AS valid_from_us,
           epoch_us(max(ts)) AS valid_to_us,
           count(*) AS n_events
    FROM (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
      FROM events
    )
    GROUP BY user_id, event_type, grp
    """,
    tags=("cdc", "window", "agg"),
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history from an event log: one row per
    contiguous run of the same event_type per user, with validity
    bounds — the gaps-and-islands double-row_number construction.
    Both windows partition by user (uniform key, parallel)."""
    e = _t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    runs = e.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    return (
        runs.groupBy("user_id", "event_type", "grp")
        .agg(
            F.unix_micros(F.min("ts")).alias("valid_from_us"),
            F.unix_micros(F.max("ts")).alias("valid_to_us"),
            F.count("*").alias("n_events"),
        )
        .drop("grp")
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH source AS (
      SELECT o_orderkey, round(o_totalprice + 1000, 6) AS o_totalprice,
             'U' AS o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, round(o_totalprice, 6), 'N'
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM source
    UNION ALL
    SELECT o_orderkey, round(o_totalprice, 6), o_orderstatus
    FROM orders t
    WHERE NOT EXISTS (
      SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey
    )
    """,
    tags=("cdc", "join", "setop"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO expansion: a change feed (simulated: +1000 price
    updates for keys %3=0, brand-new keys for %5=0) upserted into
    orders — WHEN MATCHED THEN UPDATE ∪ WHEN NOT MATCHED THEN INSERT,
    planned as (target ANTI-JOIN source) UNION ALL source. One shuffle
    on o_orderkey; this is the physical plan Delta/Iceberg MERGE
    executes after file pruning."""
    o = _t(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") + 1000, 6).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    inserts = o.filter(F.col("o_orderkey") % 5 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.round("o_totalprice", 6).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    source = updates.unionByName(inserts)
    untouched = o.join(source, "o_orderkey", "left_anti").select(
        "o_orderkey",
        F.round("o_totalprice", 6).alias("o_totalprice"),
        "o_orderstatus",
    )
    return source.unionByName(untouched)


@register(
    "incremental_agg_merge",
    # The oracle recomputes the aggregate from the FULL table in one
    # pass — equality with the incrementally-merged result is the
    # correctness statement of incremental view maintenance.
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("cdc", "agg", "incremental"),
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: yesterday's aggregate
    STATE (count + exact integer-cent sum per customer — both
    algebraic, so states merge by addition) is combined with the
    aggregate of today's DELTA batch instead of rescanning history.
    Here the split is synthetic (o_orderkey % 97 picks the delta); in
    production the state is a stored table and only the delta is
    scanned — at 100 TB that is the difference between O(|delta|) and
    O(|history|) per refresh. The merge is a unionByName + re-aggregate
    on the same key: one shuffle of (customers + delta-customers) tiny
    state rows. The oracle recomputes from the full table, proving
    merge ≡ recompute exactly (no floats anywhere in the state)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.expr(
        "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
    )

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("revenue_cents"),
        )

    base_state = state(o.filter(F.col("o_orderkey") % 97 != 0))
    delta_state = state(o.filter(F.col("o_orderkey") % 97 == 0))
    return (
        base_state.unionByName(delta_state)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
    )


@register(
    "scd2_point_in_time_enrich",
    oracle="""
    WITH runs AS (
      SELECT user_id, event_type,
             epoch_us(min(ts)) AS valid_from_us,
             epoch_us(max(ts)) AS valid_to_us,
             count(*) AS n_events
      FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS grp
        FROM events
      )
      GROUP BY user_id, event_type, grp
    )
    SELECT e.event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN r.n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_singleton_runs,
           CAST(sum(CASE WHEN epoch_us(e.ts) = r.valid_from_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_run_openers
    FROM events e
    JOIN runs r
      ON r.user_id = e.user_id AND r.event_type = e.event_type
     AND epoch_us(e.ts) BETWEEN r.valid_from_us AND r.valid_to_us
    GROUP BY e.event_type
    """,
    tags=("cdc", "join", "temporal"),
)
def scd2_point_in_time_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against the SCD2 dimension: each fact
    event joins the validity interval that COVERED its timestamp —
    the canonical as-was lookup against a Type-2 history. The join is
    EQUI on (user_id, event_type) with the interval containment as a
    post-join filter, so it shuffles on keys like any hash join
    (non-equi-only interval joins degrade to nested loops — keying by
    the dimension's natural key is what keeps PIT joins scalable).
    Output: per event type, how many events sit in singleton runs and
    how many opened their run — all integers, exact."""
    e = _t(spark, sf_dir, "events")
    runs = scd2_user_type_history(spark, sf_dir)
    ev = e.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    j = ev.join(
        runs.withColumnRenamed("n_events", "run_len"),
        ["user_id", "event_type"],
    ).filter(
        (F.col("ts_us") >= F.col("valid_from_us"))
        & (F.col("ts_us") <= F.col("valid_to_us"))
    )
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("run_len") == 1, 1).otherwise(0)).alias(
            "n_in_singleton_runs"
        ),
        F.sum(
            F.when(F.col("ts_us") == F.col("valid_from_us"), 1).otherwise(0)
        ).alias("n_run_openers"),
    )


@register(
    "log_compaction_tombstones",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < '2'
                  THEN 'delete' ELSE 'upsert' END AS op,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, epoch_us(ts) AS last_op_us, v_cents AS value_cents
    FROM log
    WHERE rn = 1 AND op = 'upsert'
    ORDER BY user_id
    """,
    tags=("cdc", "window", "compaction"),
)
def log_compaction_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-style log compaction with tombstones: the event stream is
    read as a per-key change log (~12.5% of entries are deterministic
    md5 deletes — the tombstone class), and the compacted table is the
    LATEST operation per key, with keys whose latest op is a tombstone
    absent from the output entirely. This is the missing third shape
    next to MERGE (upsert batches) and SCD2 (full history): the state
    a changelog consumer materializes. One key-partitioned row_number
    window — equivalent to the max_by compaction Kafka brokers run,
    and exactly the shape AQE handles under key skew. Total-order
    tie-break (ts, event_id) keeps replays byte-identical."""
    e = _t(spark, sf_dir, "events")
    op = F.when(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "2",
        "delete",
    ).otherwise("upsert")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    log = e.select(
        "user_id",
        F.unix_micros("ts").alias("last_op_us"),
        op.alias("op"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        log.filter((F.col("rn") == 1) & (F.col("op") == "upsert"))
        .select("user_id", "last_op_us", "value_cents")
        .orderBy("user_id")
    )


@register(
    "state_snapshot_diff",
    oracle="""
    WITH snap_a AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM events WHERE ts < TIMESTAMP '2024-01-16'
      GROUP BY user_id, wk
    ),
    snap_b AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM events
      GROUP BY user_id, wk
    ),
    diff AS (
      SELECT CASE
               WHEN a.user_id IS NULL THEN 'added'
               WHEN b.user_id IS NULL THEN 'removed'
               WHEN md5(CAST(a.n_events AS VARCHAR) || '|'
                        || CAST(a.total_cents AS VARCHAR))
                    = md5(CAST(b.n_events AS VARCHAR) || '|'
                          || CAST(b.total_cents AS VARCHAR))
                 THEN 'unchanged'
               ELSE 'changed'
             END AS change_kind
      FROM snap_a a FULL OUTER JOIN snap_b b USING (user_id, wk)
    )
    SELECT change_kind, CAST(count(*) AS BIGINT) AS n_keys
    FROM diff GROUP BY change_kind
    ORDER BY change_kind
    """,
    tags=("cdc", "join", "audit"),
)
def state_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DIFF between two materializations of a keyed state
    table — the data-ops audit run after every incremental pipeline
    deploy ("did the rebuild change rows it shouldn't have?"): full
    outer join on the key, rows compared by a CONTENT HASH of the
    state columns (the generic contract — at 100 TB the hash is
    computed per side in the scan projection and only the 16-byte
    digest crosses the shuffle, never the wide row). Here snapshot A is
    per-(user, week) event state at the day-15 watermark and snapshot B
    the full-corpus rebuild of the same state
    (removed is structurally 0 — event state only grows; the column
    exists because a real tombstoning pipeline produces it). One
    aggregation per snapshot + one key-partitioned join. The state key
    is (user, ISO week): weeks fully before the watermark come out
    unchanged, the week straddling it changed, later weeks added — all
    three classes populated from honest late-arriving-data semantics."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")

    def snap(df):
        return df.groupBy(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("total_cents"),
        )

    cut = F.to_timestamp(F.lit("2024-01-16"))
    a = snap(e.filter(F.col("ts") < cut))
    b = snap(e)
    row_hash = lambda p: F.md5(  # noqa: E731
        F.concat_ws(
            "|",
            F.col(f"{p}.n_events").cast("string"),
            F.col(f"{p}.total_cents").cast("string"),
        )
    )
    diff = (
        a.alias("a")
        .join(b.alias("b"), ["user_id", "wk"], "full_outer")
        .select(
            F.when(F.col("a.n_events").isNull(), "added")
            .when(F.col("b.n_events").isNull(), "removed")
            .when(row_hash("a") == row_hash("b"), "unchanged")
            .otherwise("changed")
            .alias("change_kind")
        )
    )
    return (
        diff.groupBy("change_kind")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("change_kind")
    )
