"""CSV/ORC interchange and the dense-ID operator."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from braintumor_data_pipeline_spark.sources.csv_io import (
    ORDERS_SCHEMA,
    read_csv,
    write_csv,
)
from braintumor_data_pipeline_spark.sources.jsonl import DOCUMENTS_SCHEMA
from braintumor_data_pipeline_spark.sources.orc_io import read_orc, write_orc
from braintumor_data_pipeline_spark.operators.indexing import dense_ids
from braintumor_data_pipeline_spark.sources.fixtures import load_table


class TestCsvRoundTrip:
    def test_orders_roundtrip_exact(self, spark, sf_dir, tmp_path):
        orders = load_table(spark, sf_dir, "orders").select(
            *ORDERS_SCHEMA.fieldNames()
        )
        path = str(tmp_path / "orders_csv")
        write_csv(orders, path, n_shards=3)
        back = read_csv(spark, path, ORDERS_SCHEMA)
        a = sorted(orders.collect(), key=lambda r: r.o_orderkey)
        b = sorted(back.collect(), key=lambda r: r.o_orderkey)
        assert a == b  # doubles + timestamps + strings all exact

    def test_shard_count_and_gzip(self, spark, sf_dir, tmp_path):
        orders = load_table(spark, sf_dir, "orders").select(
            *ORDERS_SCHEMA.fieldNames()
        )
        path = str(tmp_path / "sharded")
        write_csv(orders, path, n_shards=3)
        shards = glob.glob(os.path.join(path, "*.csv.gz"))
        assert len(shards) == 3

    def test_quoting_torture_multiline(self, spark, tmp_path):
        """Commas, doubled quotes, and embedded newlines survive the
        cycle when read back with multiLine (the non-splittable mode —
        which is WHY text corpora go to JSONL instead)."""
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("s", T.StringType()),
            ]
        )
        rows = [
            Row(k=1, s='plain'),
            Row(k=2, s='comma, inside'),
            Row(k=3, s='quote " inside'),
            Row(k=4, s='newline\ninside'),
            Row(k=5, s='all ",\n" of it'),
            Row(k=6, s=''),
            Row(k=7, s='ünïcødé ✓'),
            Row(k=8, s=None),  # NULL ≠ '' through the \N sentinel
        ]
        df = spark.createDataFrame(rows, schema)
        path = str(tmp_path / "torture")
        write_csv(df, path, n_shards=1, compression=None)
        back = read_csv(spark, path, schema, multi_line=True)
        assert sorted(back.collect()) == sorted(rows)

    def test_null_sentinel_collision_documented(self, spark, tmp_path):
        """The one value the \\N dialect cannot carry: a string equal to
        the sentinel itself reads back as NULL (the writer emits it
        unquoted, identically to a true NULL — same tradeoff as a MySQL
        dump). Pinned so the limitation stays visible."""
        schema = T.StructType([T.StructField("s", T.StringType())])
        df = spark.createDataFrame([Row(s='\\N')], schema)
        path = str(tmp_path / "collision")
        write_csv(df, path, n_shards=1, compression=None)
        back = read_csv(spark, path, schema)
        assert back.collect() == [Row(s=None)]

    def test_malformed_lines_permissive(self, spark, tmp_path):
        """A malformed line becomes an all-null row, not a job failure."""
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("v", T.LongType()),
            ]
        )
        p = tmp_path / "bad.csv"
        p.write_text("k,v\n1,10\nnot_a_number,oops\n3,30\n")
        back = read_csv(spark, str(p), schema)
        rows = back.collect()
        assert len(rows) == 3
        assert sum(1 for r in rows if r.k is None) == 1
        good = sorted((r.k, r.v) for r in rows if r.k is not None)
        assert good == [(1, 10), (3, 30)]


class TestOrcRoundTrip:
    def test_documents_roundtrip_exact(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        path = str(tmp_path / "docs_orc")
        write_orc(docs, path, n_shards=2)
        back = read_orc(spark, path, DOCUMENTS_SCHEMA)
        a = sorted(docs.collect(), key=lambda r: r.doc_id)
        b = sorted(back.collect(), key=lambda r: r.doc_id)
        assert a == b

    def test_orc_files_written(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        path = str(tmp_path / "docs_orc2")
        write_orc(docs, path, n_shards=2)
        assert len(glob.glob(os.path.join(path, "*.orc"))) == 2


class TestDenseIds:
    def test_matches_naive_global_window(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        got = {
            r.doc_id: r.gid
            for r in dense_ids(docs, "lang", "doc_id").collect()
        }
        w = Window.orderBy("lang", "doc_id")
        want = {
            r.doc_id: r.gid
            for r in docs.withColumn("gid", F.row_number().over(w)).collect()
        }
        assert got == want

    def test_ids_are_contiguous(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        gids = sorted(
            r.gid for r in dense_ids(docs, "lang", "doc_id").collect()
        )
        assert gids == list(range(1, len(gids) + 1))

    def test_no_raw_row_single_partition_window(self, spark, sf_dir):
        """The only SinglePartition exchange feeding the plan's windows
        must come from the per-block COUNT aggregate (tiny by
        construction), never from raw rows."""
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        plan = (
            dense_ids(docs, "lang", "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        for m in re.finditer(r"Exchange SinglePartition", plan):
            tail = plan[m.end() : m.end() + 600]
            ops = [
                ln.strip(" :+-")
                for ln in tail.splitlines()[1:]
                if ln.strip(" :+-")
            ]
            real = []
            for op in ops:
                if op.startswith("*("):  # strip the codegen wrapper
                    op = op.split(" ", 1)[-1]
                if op.startswith(("Project", "ColumnarToRow", "AQEShuffleRead")):
                    continue
                real.append(op)
                break
            assert real and real[0].split("(")[0].endswith("Aggregate"), (
                f"SinglePartition exchange over non-aggregated input: {real[:1]}"
            )

    def test_block_span_does_not_change_ids(self, spark, sf_dir, monkeypatch):
        """The block width is a parallelism knob, never a semantic one:
        gids must be identical under extreme spans (1 key per block vs
        one block for everything)."""
        import braintumor_data_pipeline_spark.operators.indexing as ix

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        base = {
            r.doc_id: r.gid
            for r in dense_ids(docs, "lang", "doc_id").collect()
        }
        for span in (1, 10**9):
            monkeypatch.setattr(ix, "BLOCK_SPAN", span)
            got = {
                r.doc_id: r.gid
                for r in ix.dense_ids(docs, "lang", "doc_id").collect()
            }
            assert got == base, f"span={span} changed ids"


def test_textdir_roundtrip_identity(spark, sf_dir):
    """Every doc survives the one-file-per-doc tree byte-for-byte."""
    import os
    import tempfile

    from braintumor_data_pipeline_spark.sources.fixtures import load_table
    from braintumor_data_pipeline_spark.sources.textdir import (
        read_text_dir,
        write_text_dir,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(), "txt")
    write_text_dir(docs, path)
    back = read_text_dir(spark, path)
    orig = {(r.doc_id, r.lang, r.text) for r in docs.select("doc_id", "lang", "text").collect()}
    got = {(r.doc_id, r.lang, r.text) for r in back.collect()}
    assert got == orig


def test_xml_roundtrip_escapes_markup(spark, tmp_path):
    """Markup-significant characters in field text must survive the
    XML write→read cycle byte-for-byte (entity escaping round trip)."""
    from pyspark.sql import types as T

    from braintumor_data_pipeline_spark.sources.xml_io import (
        read_xml,
        write_xml,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    rows = [
        (1, 'a < b & "c" > d', "en", "s<&>", 15),
        (2, "plain", "fr", "s2", 5),
        (3, "apos ' and tag </doc>", "de", "s3", 21),
        (4, None, "es", "s4", 0),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "xmlrt")
    write_xml(df, path, n_shards=2)
    back = sorted(
        [tuple(r) for r in read_xml(spark, path, schema).collect()]
    )
    assert back == sorted(rows)
