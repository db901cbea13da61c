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
    """Make ``events.parquet`` (TIMESTAMP(NANOS)) readable in THIS session.

    Runtime-settable; needed for any raw ``spark.read.parquet`` of the
    events fixture outside :func:`load_table` (e.g. the streaming
    runners that stage the file for a file-source stream).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning for free.

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet footer, which
    Spark's reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    it arrives as int64 nanos and is converted here to a microsecond
    timestamp (floor division — the same truncation DuckDB's ``epoch_us``
    applies to TIMESTAMP_NS). The conf is runtime-settable, and sessions
    not built by our factory (e.g. the driver harness's) won't have it,
    so it is set defensively here before every read.
    """
    if name not in TABLES:
        raise ValueError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    # Defensive: works in any session, not just ones from session.get_spark().
    ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the frames."""
    frames = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        frames[name] = df
    return frames
