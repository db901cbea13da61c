"""ORC ingest/egress — the second columnar format a Spark-native engine
speaks for free.

Parquet is this engine's home format (TESTDATA fixtures, all sinks),
but Hive-lineage warehouses hand over ORC; Spark's reader/writer is
built in, with the same predicate-pushdown and column-pruning hooks as
parquet (ORC keeps min/max + bloom stats per stripe). The reference has
no columnar I/O at all (images + BigQuery rows, `/root/reference/
dataflow_pipeline.py:135-141`); this closes the interchange gap from
the Spark side.

The registered query proves the cycle end-to-end exactly like the JSONL
and CSV families: write the documents table as zlib ORC, read it back
through a DECLARED schema, and aggregate an additive content checksum
the DuckDB oracle recomputes from the original parquet — a hash match
means no value moved through the dictionary/RLE encoders.
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
from .jsonl import DOCUMENTS_SCHEMA


#: Layout-format version for this module's derived layouts. The source
#: fingerprint only detects changed INPUT bytes; bump this whenever the
#: encoder (write_*), shard layout, or corruption schedule changes so
#: cached /tmp layouts built by older code are invalidated (ADVICE r10).
_LAYOUT_VERSION = "1"


def write_orc(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str = "zlib",
) -> None:
    """Sharded ORC write. zlib is the warehouse-interchange default;
    snappy trades ratio for speed exactly as with parquet."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-declared ORC scan (by-name column resolution; stripe
    stats give pushdown/pruning like parquet footers)."""
    return spark.read.schema(schema).orc(path)


#: Same 40-bit md5-prefix additive checksum the JSONL round trip uses —
#: far from BIGINT overflow at any fixture scale.
_CHK_COLS = "CAST(doc_id AS VARCHAR) || '|' || text || '|' || lang"


@register(
    "orc_roundtrip_stats",
    oracle=f"""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(('0x' || substr(md5({_CHK_COLS}), 1, 10))::BIGINT)
                AS BIGINT) AS checksum
    FROM documents GROUP BY source
    """,
    tags=("source", "orc", "text", "agg"),
)
def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → zlib ORC shards → schema-declared read-back → per-
    source count + char total + additive content checksum. The oracle
    computes the identical aggregate from the ORIGINAL parquet; a hash
    match certifies the ORC encode→decode cycle lossless for longs and
    non-ASCII text alike."""
    from .maintenance import fixture_fingerprint, publish_derived_layout

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = publish_derived_layout(
        os.path.join(tempfile.gettempdir(), "braintumor_orc", tag),
        fixture_fingerprint(sf_dir, "documents"),
        lambda stage: write_orc(_t(spark, sf_dir, "documents"), stage, n_shards=4),
        version=_LAYOUT_VERSION,
    )
    back = read_orc(spark, path, DOCUMENTS_SCHEMA)
    chk = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("text"),
                    F.lit("|"),
                    F.col("lang"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(chk).alias("checksum"),
    )
