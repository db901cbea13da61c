"""In-plan synthetic data generation — the zero-I/O source.

``spark.range(N)`` is the only "scan": every column is a pure integer
function of the row id (LCG-style mixing, modular arithmetic — no
rand(), no float), so the generated relation is bit-identical on any
engine, any parallelism, any retry schedule. This is how you smoke-test
a 100 TB pipeline without 100 TB: the generator runs inside executors
at memory bandwidth, scales linearly with parallelism, and needs no
storage at all. DuckDB replays the identical formulas over range(N) —
the oracle certifies the whole generate→aggregate path end to end.

Reference parity: the reference has no generator (its tests hand-write
tiny fixtures); this is the N* engine-surface equivalent of dbgen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

N_ROWS = 100_000

# Knuth's MMIX LCG multiplier/increment, reduced mod 2^31 so every
# intermediate fits comfortably in a 64-bit signed integer on both
# engines (id < 2^17 here, id·A < 2^48).
_A = 1_103_515_245
_C = 12_345
_M = 2_147_483_648  # 2^31


@register(
    "synthetic_lineitem_pricing",
    oracle=f"""
    WITH gen AS (
      SELECT r.range AS id,
             1 + (r.range * {_A} + {_C}) % 50 AS qty,
             100000 + (r.range * 2654435761 + 1013904223) % 9900001
               AS price_cents,
             CASE (r.range % 3) WHEN 0 THEN 'A' WHEN 1 THEN 'N'
                                ELSE 'R' END AS flag
      FROM range({N_ROWS}) r
    )
    SELECT flag,
           count(*) AS n,
           CAST(sum(qty) AS BIGINT) AS sum_qty,
           round(CAST(sum(price_cents) AS DOUBLE) / 100, 6) AS sum_price,
           round(CAST(sum(price_cents) AS DOUBLE) / count(*) / 100, 6)
             AS avg_price,
           CAST(min(price_cents) AS BIGINT) AS min_cents,
           CAST(max(price_cents) AS BIGINT) AS max_cents
    FROM gen
    GROUP BY flag
    ORDER BY flag
    """,
    tags=("source", "generator", "agg"),
)
def synthetic_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary over a 100k-row relation generated IN-PLAN from
    ``spark.range`` — no files, no shuffle until the final 3-group
    rollup. Every column is exact integer LCG mixing of the row id, so
    the result is engine-identical and the generator scales to any N by
    changing one constant (range is split across executors by Spark).
    ``sf_dir`` is unused by construction — the generator is its own
    scale factor."""
    gen = spark.range(N_ROWS).select(
        F.col("id"),
        (1 + (F.col("id") * _A + _C) % 50).alias("qty"),
        (100000 + (F.col("id") * 2654435761 + 1013904223) % 9900001).alias(
            "price_cents"
        ),
        F.when(F.col("id") % 3 == 0, "A")
        .when(F.col("id") % 3 == 1, "N")
        .otherwise("R")
        .alias("flag"),
    )
    return (
        gen.groupBy("flag")
        .agg(
            F.count("*").alias("n"),
            F.sum("qty").alias("sum_qty"),
            F.round(F.sum("price_cents").cast("double") / 100, 6).alias("sum_price"),
            F.round(
                F.sum("price_cents").cast("double") / F.count("*") / 100, 6
            ).alias("avg_price"),
            F.min("price_cents").alias("min_cents"),
            F.max("price_cents").alias("max_cents"),
        )
        .orderBy("flag")
    )


@register(
    "synthetic_skew_stress_agg",
    oracle=f"""
    WITH gen AS (
      -- zipf-ish hot keys: key = floor(sqrt(id)) gives key k exactly
      -- (2k+1) rows — key 0 is 1 row, key 315 is 631 rows; integer
      -- sqrt via exact floor on doubles ≤ 2^17 (exactly representable)
      SELECT CAST(floor(sqrt(CAST(r.range AS DOUBLE))) AS BIGINT) AS key,
             (r.range * {_A} + {_C}) % {_M} AS v
      FROM range({N_ROWS}) r
    )
    SELECT CAST(max(c) AS BIGINT) AS max_key_rows,
           CAST(min(c) AS BIGINT) AS min_key_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(sv) % {_M} AS BIGINT) AS checksum
    FROM (
      SELECT key, count(*) AS c, CAST(sum(v) AS BIGINT) % {_M} AS sv
      FROM gen GROUP BY key
    )
    """,
    tags=("source", "generator", "skew", "agg"),
)
def synthetic_skew_stress_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-stress harness: generated keys where key k owns exactly
    2k+1 rows (a 631:1 hot/cold ratio at 100k rows) — the controlled
    skew distribution for exercising AQE skew handling at any N,
    without storing a skewed dataset. The modular checksum makes the
    whole generate→group→reduce path hash-checkable."""
    gen = spark.range(N_ROWS).select(
        F.floor(F.sqrt(F.col("id").cast("double"))).cast("long").alias("key"),
        ((F.col("id") * _A + _C) % _M).alias("v"),
    )
    per_key = gen.groupBy("key").agg(
        F.count("*").alias("c"), (F.sum("v") % _M).alias("sv")
    )
    return per_key.agg(
        F.max("c").alias("max_key_rows"),
        F.min("c").alias("min_key_rows"),
        F.count("*").alias("n_keys"),
        (F.sum("sv") % _M).alias("checksum"),
    )


_MIXA = 2_654_435_761
_MIXC = 1_013_904_223
_MIXM = 2_147_483_648  # 2^31


def _mix(col, salt: int):
    return (col * _MIXA + _MIXC + salt) % _MIXM


@register(
    "synthetic_star_join_agg",
    oracle=f"""
    WITH fact AS (
      SELECT r.range AS id,
             (r.range * {_MIXA} + {_MIXC} + 1) % {_MIXM} % 25 AS nation_id,
             (r.range * {_MIXA} + {_MIXC} + 2) % {_MIXM} % 1000 AS supp_id,
             100 + (r.range * {_MIXA} + {_MIXC} + 3) % {_MIXM} % 99900
               AS price_cents
      FROM range({N_ROWS}) r
    ),
    nation AS (
      SELECT r.range AS nation_id, r.range % 5 AS region_id
      FROM range(25) r
    ),
    supp AS (
      SELECT r.range AS supp_id,
             (r.range * {_MIXA} + {_MIXC} + 9) % {_MIXM} % 7 AS supp_class
      FROM range(1000) r
    )
    SELECT region_id, supp_class,
           count(*) AS n,
           CAST(sum(price_cents) AS BIGINT) AS cents
    FROM fact
    JOIN nation USING (nation_id)
    JOIN supp USING (supp_id)
    GROUP BY region_id, supp_class
    """,
    tags=("source", "generator", "join", "agg"),
)
def synthetic_star_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scaling probe's star-join shape as a driver-checkable query:
    a zero-I/O LCG fact (100k rows) against two generated broadcast
    dims, one shuffle for the 35-group rollup. Same plan skeleton as
    ``star_join_revenue`` with no files at all — the shape that probed
    flat to 120M rows in tools/scaling_probe.py; all-integer columns
    make the oracle replay exact. ``sf_dir`` unused by construction."""
    fact = spark.range(N_ROWS).select(
        (_mix(F.col("id"), 1) % 25).alias("nation_id"),
        (_mix(F.col("id"), 2) % 1000).alias("supp_id"),
        (100 + _mix(F.col("id"), 3) % 99900).alias("price_cents"),
    )
    nation = spark.range(25).select(
        F.col("id").alias("nation_id"), (F.col("id") % 5).alias("region_id")
    )
    supp = spark.range(1000).select(
        F.col("id").alias("supp_id"),
        (_mix(F.col("id"), 9) % 7).alias("supp_class"),
    )
    return (
        fact.join(F.broadcast(nation), "nation_id")
        .join(F.broadcast(supp), "supp_id")
        .groupBy("region_id", "supp_class")
        .agg(F.count("*").alias("n"), F.sum("price_cents").alias("cents"))
    )


@register(
    "synthetic_session_windows",
    oracle=f"""
    WITH ev AS (
      SELECT (r.range * {_MIXA} + {_MIXC} + 5) % {_MIXM} % 2000 AS user_id,
             CAST(1704067200 AS BIGINT) * 1000000
               + ((r.range * {_MIXA} + {_MIXC} + 6) % {_MIXM}
                  % {30 * 86400}) * 1000000 AS ts_us,
             (r.range * {_MIXA} + {_MIXC} + 8) % {_MIXM} % 10000 AS cents
      FROM range({N_ROWS}) r
    ),
    seq AS (
      SELECT user_id, ts_us, cents,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                                ORDER BY ts_us, cents)
                       > 1800000000
                  OR lag(ts_us) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, cents) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
    ),
    sess AS (
      SELECT user_id, ts_us, cents,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, cents
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT user_id,
           CAST(min(ts_us) AS BIGINT) AS session_start_us,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM sess
    GROUP BY user_id, sid
    """,
    tags=("source", "generator", "window", "session", "agg"),
)
def synthetic_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scaling probe's session-window shape as a driver-checkable
    query: 100k zero-I/O events over 2000 users, 30-minute-gap
    ``session_window`` aggregation; the oracle derives identical
    sessions via the gaps-and-islands idiom (session identity = min
    event time, both engines agree). All-integer — microsecond
    timestamps and cent values — so the hash is exact. Duplicate
    (user, ts) collisions from the LCG are fine: secondary order by
    cents makes the lag/cumsum deterministic, and session membership
    is order-independent anyway."""
    ev = spark.range(N_ROWS).select(
        (_mix(F.col("id"), 5) % 2000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_704_067_200) + _mix(F.col("id"), 6) % (30 * 86_400)
        ).alias("ts"),
        (_mix(F.col("id"), 8) % 10_000).alias("cents"),
    )
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("cents"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "cents",
        )
    )
