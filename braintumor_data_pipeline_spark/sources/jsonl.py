"""JSONL (JSON Lines) corpus ingest/egress — the LLM-pipeline exchange
format.

Training corpora move between systems as sharded, gzipped JSONL; the
engine must write it losslessly and read it back with a declared schema
(never schema inference, which costs an extra full pass at 100 TB and
can mistype sparse fields). Spark's native JSON source IS JSONL — one
object per line, splittable by file; with gzip each shard is one task,
so shard count = write-side parallelism knob.

The reference has no text I/O at all (images + BigQuery rows only);
this is part of the LLM-data-pipeline surface the north star mandates.
The registered query proves the round trip END-TO-END: it writes the
documents table as gzipped JSONL shards, reads them back through the
declared schema, and aggregates a content checksum that the DuckDB
oracle recomputes from the original parquet — a hash match means not
one character moved.
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
from .textdir import ensure_text_dir, read_text_dir

#: Layout-format version for this module's derived layouts. The source
#: fingerprint only detects changed INPUT bytes; bump this whenever the
#: encoder (write_*), shard layout, or corruption schedule changes so
#: cached /tmp layouts built by older code are invalidated (ADVICE r10).
_LAYOUT_VERSION = "1"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """Sharded JSONL write. ``n_shards`` sizes the files (at 100 TB:
    total_bytes / ~256 MB, set once at egress); None keeps the input
    partitioning. Gzip halves storage and is the consumer-side default;
    it costs per-file splittability, which shard sizing compensates."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-declared JSONL scan (PERMISSIVE: malformed lines become
    all-null rows rather than failing the 100 TB job; count them with
    a doc_id-is-null check downstream)."""
    return spark.read.schema(schema).json(path)


#: 40-bit md5-prefix content hash — small enough that a corpus-wide
#: SUM stays far from BIGINT overflow (5·10⁴ docs × 2³⁹ avg ≈ 3·10¹⁶).
_CHK_COLS = "CAST(doc_id AS VARCHAR) || '|' || text || '|' || source"


@register(
    "jsonl_roundtrip_stats",
    oracle=f"""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(('0x' || substr(md5({_CHK_COLS}), 1, 10))::BIGINT)
                AS BIGINT) AS checksum
    FROM documents GROUP BY lang
    """,
    tags=("source", "jsonl", "text", "agg"),
)
def jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → gzipped JSONL shards → schema-declared read-back →
    per-language count + char total + additive content checksum. The
    oracle computes the identical aggregate from the ORIGINAL parquet,
    so a hash match certifies the whole encode→decode cycle lossless
    (newlines, quotes, and non-ASCII included — JSON escaping is the
    codec under test)."""
    from .maintenance import fixture_fingerprint, publish_derived_layout

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = publish_derived_layout(
        os.path.join(tempfile.gettempdir(), "braintumor_jsonl", tag),
        fixture_fingerprint(sf_dir, "documents"),
        lambda stage: write_jsonl(
            _t(spark, sf_dir, "documents"), stage, n_shards=4
        ),
        version=_LAYOUT_VERSION,
    )
    back = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    chk = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("text"),
                    F.lit("|"),
                    F.col("source"),
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
        F.sum("n_chars").alias("sum_chars"),
        F.sum(chk).alias("checksum"),
    )


@register(
    "textdir_corpus_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(('0x' || substr(md5(
                  CAST(doc_id AS VARCHAR) || '|' || text
                ), 1, 10))::BIGINT) AS BIGINT) AS checksum
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("source", "text", "agg"),
)
def textdir_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one-file-per-doc text tree (executor-side writes,
    hive-style lang= buckets) → wholetext read-back → per-lang count,
    char total, and additive md5(doc_id|text) checksum. The oracle
    computes the identical aggregate from the ORIGINAL parquet: a hash
    match certifies every byte of every document survived the
    filesystem round trip and the path metadata reconstructed doc_id
    and lang exactly."""
    path = ensure_text_dir(spark, sf_dir)
    back = read_text_dir(spark, path)
    chk = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("|"), F.col("text")
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(chk).alias("checksum"),
        )
        .orderBy("lang")
    )


@register(
    "jsonl_corrupt_records_audit",
    # Oracle recomputes the corruption schedule from the original table:
    # every doc with doc_id % 50 == 7 becomes a malformed line (lands in
    # the NULL-lang bucket with no parsed columns); the rest parse.
    oracle="""
    SELECT CASE WHEN doc_id % 50 = 7 THEN NULL ELSE lang END AS lang,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN doc_id % 50 = 7 THEN 0 ELSE n_chars END)
                AS BIGINT) AS sum_chars,
           CAST(sum(CASE WHEN doc_id % 50 = 7 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt
    FROM documents
    GROUP BY 1
    """,
    tags=("source", "jsonl", "quality", "agg"),
)
def jsonl_corrupt_records_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input accounting — the ingest gate every 100 TB JSONL
    crawl needs: lines that fail to parse must neither kill the job
    (FAILFAST) nor vanish silently (DROPMALFORMED), but surface as
    countable rows. Documents are re-serialized to JSONL with a
    DETERMINISTIC 2% corruption schedule (doc_id % 50 == 7 → line truncated to
    12 chars, an unclosed JSON object), read back PERMISSIVE with a
    declared ``_corrupt_record`` column, and audited per language:
    corrupt rows parse no columns (NULL lang bucket) and carry the raw
    line for quarantine. The oracle replays the schedule against the
    original parquet — a hash match certifies that exactly the intended
    lines failed and every other field survived the round trip."""
    from .maintenance import fixture_fingerprint, publish_derived_layout

    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])

    def build(stage):
        docs = _t(spark, sf_dir, "documents")
        line = F.to_json(
            F.struct("doc_id", "text", "lang", "source", "n_chars")
        )
        mangled = F.when(
            F.col("doc_id") % 50 == 7,
            F.substring(line, 1, 12),  # unclosed JSON — always fails
        ).otherwise(line)
        docs.select(mangled.alias("value")).coalesce(4).write.mode(
            "overwrite"
        ).text(stage)

    path = publish_derived_layout(
        os.path.join(tempfile.gettempdir(), "braintumor_jsonl_corrupt", tag),
        fixture_fingerprint(sf_dir, "documents"),
        build,
        version=_LAYOUT_VERSION,
    )

    schema = T.StructType(
        list(DOCUMENTS_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("sum_chars"),
        F.sum(
            F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
        ).alias("n_corrupt"),
    )
