"""JSONL source/sink: sharding, compression, lossless round trip
(sources/jsonl.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row

from braintumor_data_pipeline_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    write_jsonl,
)
from braintumor_data_pipeline_spark.sources.fixtures import load_table


def test_roundtrip_exact_rows_with_hostile_text(spark, tmp_path):
    rows = [
        Row(doc_id=1, text='line1\nline2\t"quoted" \\ back', lang="en",
            source="s", n_chars=5),
        Row(doc_id=2, text="naïve – ünïcödé ✓ 中文", lang="de",
            source="t", n_chars=7),
        Row(doc_id=3, text="", lang="en", source="s", n_chars=0),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    path = str(tmp_path / "jl")
    write_jsonl(df, path, n_shards=2)
    back = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    got = sorted(back.collect(), key=lambda r: r.doc_id)
    assert [r.asDict() for r in got] == [r.asDict() for r in rows]


def test_shard_count_and_gzip_suffix(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    write_jsonl(docs, path, n_shards=3)
    files = glob.glob(os.path.join(path, "part-*"))
    assert len(files) == 3
    assert all(f.endswith(".json.gz") for f in files)
    assert read_jsonl(spark, path, DOCUMENTS_SCHEMA).count() == docs.count()


def test_malformed_lines_become_null_rows(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "a.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s",'
        ' "n_chars": 2}\n'
        "this is not json\n"
    )
    back = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA)
    assert back.count() == 2
    assert back.filter("doc_id IS NULL").count() == 1
