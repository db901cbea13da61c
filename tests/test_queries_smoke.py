"""Smoke: every registered query runs at sf0.001 and the driver contract
holds (full value parity vs DuckDB is tools/verify_local.py's job)."""

from __future__ import annotations

import pytest

from braintumor_data_pipeline_spark import registry


@pytest.mark.parametrize("name", sorted(registry.all_queries()))
def test_query_runs(spark, sf_dir, name):
    spec = registry.all_queries()[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_contract_shape():
    import __spark_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 60
    assert "flagship_avg_by_group" in qs


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
