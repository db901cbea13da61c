"""CSV ingest/egress — the lowest-common-denominator tabular exchange
format.

The reference exchanges rows only with BigQuery (`/root/reference/
dataflow_pipeline.py:135-141`); a standalone engine must also speak CSV
because that is what external producers hand a pipeline and what
downstream spreadsheets/loaders consume. Spark's native CSV source is
splittable per file (like JSONL, gzip shards trade splittability for
size — shard count is the parallelism knob), and quoting/escaping is
the codec under test: commas, quotes and newlines inside fields must
survive a write→read cycle byte-for-byte.

Scale doctrine: CSV is for STRUCTURED tabular exchange (orders-shaped
rows, no embedded newlines → splittable single-line records). Free text
with newlines forces ``multiLine=true``, which makes each file a single
task — use JSONL for text corpora (sources/jsonl.py) and keep CSV
shards single-line. Both paths are tested; the registered query uses
the splittable layout.

Schema is always DECLARED, never inferred — inference costs an extra
full pass at 100 TB and can mistype sparse columns.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .fixtures import load_table as _t

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

#: Lossless to parquet's microsecond precision; fixed-width fraction so
#: the same instant always renders the same text on both engines.
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

#: Bare CSV cannot distinguish NULL from '' (both render as an empty
#: field) — the dialect pins an explicit sentinel for NULL so the empty
#: string survives the round trip. MySQL's \\N is the de-facto standard.
NULL_SENTINEL = "\\N"


#: Layout-format version for this module's derived layouts. The source
#: fingerprint only detects changed INPUT bytes; bump this whenever the
#: encoder (write_*), shard layout, or corruption schedule changes so
#: cached /tmp layouts built by older code are invalidated (ADVICE r10).
_LAYOUT_VERSION = "1"


def write_csv(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """Sharded CSV write with header and full quoting. ``n_shards``
    sizes files exactly like the JSONL writer (total_bytes / ~256 MB at
    egress). ``escape='"'`` selects doubled-quote escaping — the RFC
    4180 dialect every external consumer parses."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    w = (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("nullValue", NULL_SENTINEL)
        .option("emptyValue", '""')  # quoted-empty ⇒ distinguishable from NULL
        .option("timestampFormat", TS_FMT_SPARK)
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multi_line: bool = False,
) -> DataFrame:
    """Schema-declared CSV scan. PERMISSIVE: a malformed line becomes an
    all-null row instead of failing the 100 TB job (count them with a
    key-is-null check downstream). ``multi_line`` only for quoted
    embedded newlines — it serializes each file into one task, so the
    registered pipeline never uses it."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("escape", '"')
        .option("nullValue", NULL_SENTINEL)
        .option("emptyValue", "")
        .option("timestampFormat", TS_FMT_SPARK)
        .option("multiLine", "true" if multi_line else "false")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


@register(
    "csv_roundtrip_stats",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(sum(('0x' || substr(md5(
                  CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus
                  || '|' || strftime(o_orderdate, '{TS_FMT_DUCK}')
                ), 1, 10))::BIGINT) AS BIGINT) AS checksum
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("source", "csv", "agg"),
)
def csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → gzipped CSV shards → schema-declared read-back → per-
    priority count, EXACT cent total, and additive content checksum
    over (key, status, microsecond-rendered timestamp). The oracle
    computes the identical aggregate from the ORIGINAL parquet, so a
    hash match certifies the full encode→decode cycle: doubles render
    round-trip-exact (Java shortest-repr), timestamps survive to the
    microsecond, and strings pass through quoting unchanged."""
    from .maintenance import fixture_fingerprint, publish_derived_layout

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = publish_derived_layout(
        os.path.join(tempfile.gettempdir(), "braintumor_csv", tag),
        fixture_fingerprint(sf_dir, "orders"),
        lambda stage: write_csv(
            _t(spark, sf_dir, "orders").select(*ORDERS_SCHEMA.fieldNames()),
            stage,
            n_shards=4,
        ),
        version=_LAYOUT_VERSION,
    )
    back = read_csv(spark, path, ORDERS_SCHEMA)
    chk = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit("|"),
                    F.col("o_orderstatus"),
                    F.lit("|"),
                    F.date_format("o_orderdate", TS_FMT_SPARK),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents).alias("sum_cents"),
        F.sum(chk).alias("checksum"),
    )
