"""Loaders for the driver-provided fixture tables (S11 in SURVEY §2.1).

The reference's relational surface is a single externally-declared BigQuery
table (``/root/reference/bq_schema.json:1-19``); our engine's relational
surface is the ten driver parquet tables (TESTDATA.md) registered as temp
views so both the DataFrame API and ``spark.sql`` reach them.

Scale note: these are plain parquet scans — at 100 TB the same code path
benefits from parquet predicate pushdown, column pruning, and partition
splitting via ``spark.sql.files.maxPartitionBytes``; nothing here collects
to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Make legacy TIMESTAMP(NANOS) parquet readable in THIS session.

    Earlier driver datasets wrote ``events.ts`` as TIMESTAMP(NANOS), which
    Spark's reader rejects without ``spark.sql.legacy.parquet.nanosAsLong``.
    Current datasets write plain micros, but the conf is runtime-settable
    and harmless, so it stays as a defensive setting for any raw
    ``spark.read.parquet`` of the events fixture outside :func:`load_table`
    (e.g. the streaming runners that stage the file for a file-source
    stream).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Timestamp semantics engine-wide are "instants, session tz UTC" — the
    # same view DuckDB has of the naive micros values in the parquet.
    # Runtime-settable, so set defensively for foreign sessions too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize a raw events frame's ``ts`` to TIMESTAMP (UTC instants).

    Handles both on-disk encodings the driver has shipped: int64 nanos
    (legacy TIMESTAMP(NANOS) read via ``nanosAsLong``) and naive micros
    (TIMESTAMP_NTZ under Spark 4's inference). Works on batch and
    streaming frames alike.
    """
    from pyspark.sql import functions as F

    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if t == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning for free.

    Timestamp normalization: the driver's parquet stores naive
    microsecond timestamps (no tz), which Spark 4 infers as
    TIMESTAMP_NTZ. The whole query catalog (and ``unix_micros`` in
    particular) is written against regular TIMESTAMP (instant/LTZ)
    semantics with a UTC session, which is also exactly how the DuckDB
    oracle reads the same files. So: pin the session tz to UTC and cast
    every NTZ column to TIMESTAMP — a wall-clock reinterpretation, not a
    shift, hence bit-identical instants to the oracle. Older datasets
    wrote TIMESTAMP(NANOS); that arrives as int64 nanos (via
    ``nanosAsLong``) and is floor-divided to micros — the same
    truncation DuckDB's ``epoch_us`` applies to TIMESTAMP_NS.
    """
    if name not in TABLES:
        raise ValueError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    # Defensive: works in any session, not just ones from session.get_spark().
    ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        dtypes = dict(df.dtypes)
    ntz_cols = [c for c, t in dtypes.items() if t == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the frames."""
    frames = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        frames[name] = df
    return frames
