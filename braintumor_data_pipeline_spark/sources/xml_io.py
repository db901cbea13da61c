"""XML ingest/egress — Spark 4's NATIVE XML source (the spark-xml
package folded into core in 4.0), exercised as a lossless tabular
interchange lane next to CSV/JSONL/ORC.

XML is what enterprise feeds and legacy SOAP-era exports still hand a
pipeline; the properties under test are the same as the CSV lane —
entity escaping (&lt; &amp; quotes) must survive a write→read cycle,
timestamps must hold microseconds, and schema is always DECLARED (XML
inference is an extra full pass at 100 TB and mistypes sparse fields).

Scale doctrine: one <row> element per record, shards sized at write
time (`repartition(n)`), rowTag-scoped parsing. Spark's XML reader
splits by FILES (a rowTag stream inside one file parses as one task),
so shard count is the read-parallelism knob — exactly the gzip-JSONL
trade, documented there. PERMISSIVE mode maps malformed elements to
null rows rather than failing the job.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .csv_io import TS_FMT_DUCK, TS_FMT_SPARK
from .fixtures import load_table as _t

#: Layout-format version for this module's derived layouts. The source
#: fingerprint only detects changed INPUT bytes; bump this whenever the
#: encoder (write_*), shard layout, or corruption schedule changes so
#: cached /tmp layouts built by older code are invalidated (ADVICE r10).
_LAYOUT_VERSION = "1"

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_xml(df: DataFrame, path: str, n_shards: int | None = None) -> None:
    """Sharded XML write, one <doc> element per document row."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .option("timestampFormat", TS_FMT_SPARK)
        .save(path)
    )


def read_xml(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-declared XML scan, PERMISSIVE (malformed element → null
    row, counted downstream — never a failed 100 TB job)."""
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", "doc")
        .option("timestampFormat", TS_FMT_SPARK)
        .option("mode", "PERMISSIVE")
        .load(path)
    )


@register(
    "xml_roundtrip_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(('0x' || substr(md5(
                  CAST(doc_id AS VARCHAR) || '|' || source || '|' || text
                ), 1, 10))::BIGINT) AS BIGINT) AS checksum
    FROM documents GROUP BY lang
    """,
    tags=("source", "xml", "text", "agg"),
)
def xml_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → sharded XML (native Spark 4 writer, one <doc>
    element per row) → schema-declared read-back → per-language count,
    char total, and additive md5 content checksum over
    (doc_id, source, text). The oracle computes the identical aggregate
    from the ORIGINAL parquet, so a hash match certifies the full XML
    encode→decode cycle — in particular that markup-significant
    characters in free text (``< > & " '``) survive entity escaping
    byte-for-byte, the exact failure mode XML interchange exists to
    get right."""
    from .maintenance import fixture_fingerprint, publish_derived_layout

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = publish_derived_layout(
        os.path.join(tempfile.gettempdir(), "braintumor_xml", tag),
        fixture_fingerprint(sf_dir, "documents"),
        lambda stage: write_xml(
            _t(spark, sf_dir, "documents").select(*DOCS_SCHEMA.fieldNames()),
            stage,
            n_shards=4,
        ),
        version=_LAYOUT_VERSION,
    )
    back = read_xml(spark, path, DOCS_SCHEMA)
    chk = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("source"),
                    F.lit("|"),
                    F.col("text"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(chk).alias("checksum"),
    )
