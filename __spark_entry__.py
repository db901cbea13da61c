"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``braintumor_data_pipeline_spark``; queries
self-register in ``braintumor_data_pipeline_spark.registry`` together
with their oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from braintumor_data_pipeline_spark import registry  # noqa: E402
from braintumor_data_pipeline_spark.sources.fixtures import SMOKE_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY A13: group-avg + order desc + limit) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return registry.all_queries()["flagship_avg_by_group"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return registry.oracles_dict()
