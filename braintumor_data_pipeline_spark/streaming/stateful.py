"""Custom stateful streaming operator (SURVEY §2.11 — the
``applyInPandasWithState`` surface).

``running_type_totals`` keeps per-event_type state (count, value sum)
across micro-batches and emits the updated totals each trigger — the
"custom stateful operator" building block that windowed built-ins can't
express (e.g. monotone counters, sessionized ML features, CDC merges).

State is one tiny row per key; at scale the state store shards by the
grouping key across executors, and RocksDB-backed state (config, not
code) handles key cardinality beyond memory.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import ensure_nanos_readable
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s_micros", LongType())]
)


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # State keeps the sum as integer MICRO-units (value quantized to 6
    # decimals), so accumulation is exact and order-independent — the
    # emitted total is bit-identical to the batch DECIMAL(38,6) sum
    # (functions/money.py) no matter how micro-batches split the input.
    (n, s_micros) = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s_micros += int(
            np.rint(pdf["value"].to_numpy() * 1e6).astype(np.int64).sum()
        )
    state.update((n, s_micros))
    yield pd.DataFrame(
        [{"event_type": key[0], "n_events": n, "sum_value": s_micros / 1e6}]
    )


def run_stateful_type_totals(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Run the stateful counter as a real Structured Streaming job over
    the events parquet; returns the last emitted totals per event_type.
    Tests assert they equal the batch group-by."""
    ensure_nanos_readable(spark)
    stage_dir = checkpoint_dir + "_src"
    os.makedirs(stage_dir, exist_ok=True)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stage_dir, "events.parquet"),
    )
    raw_schema = spark.read.parquet(
        os.path.join(stage_dir, "events.parquet")
    ).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
        .select("event_type", "value")
    )
    totals = stream.groupBy("event_type").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends each emission; keep the LAST
    # emission per key (the final state)
    emitted = spark.table("stateful_totals")
    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's arbitrary-state API (the
# successor to applyInPandasWithState): typed state variables on a
# handle, explicit init/close lifecycle, timers. Same exact-integer
# accumulation doctrine as _update_totals above.
#
# Environment gate: the TWS Python state-server protocol speaks
# protobuf; ``google.protobuf`` is not installed in this container, so
# the operator raises a clear error (and its parity test skips) when
# the dependency is missing — the code path is exercised wherever
# protobuf exists. HAS_TWS_DEPS is the probe tests key off.
# ---------------------------------------------------------------------------
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_DEPS = True
except ImportError:
    HAS_TWS_DEPS = False


class TypeTotalsProcessor(StatefulProcessor):
    """Per-event_type running (count, micro-sum) via a ValueState —
    the transformWithState flavor of ``_update_totals``. State is a
    single typed tuple per key; the store shards by key and survives
    checkpoints like any other stateful operator."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", STATE_SCHEMA
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, s_micros = (
            tuple(self._state.get()) if self._state.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            s_micros += int(
                np.rint(pdf["value"].to_numpy() * 1e6).astype(np.int64).sum()
            )
        self._state.update((n, s_micros))
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "n_events": n,
                    "sum_value": s_micros / 1e6,
                }
            ]
        )

    def close(self) -> None:
        pass


def run_tws_type_totals(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """The same per-type running totals through
    ``transformWithStateInPandas`` — asserted in tests to agree with
    both the applyInPandasWithState operator and the batch group-by
    (API-migration parity: same semantics, newer state surface).
    Requires protobuf (see HAS_TWS_DEPS) and the RocksDB state store."""
    if not HAS_TWS_DEPS:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf (absent in "
            "this container); use run_stateful_type_totals instead"
        )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    ensure_nanos_readable(spark)
    stage_dir = checkpoint_dir + "_src"
    os.makedirs(stage_dir, exist_ok=True)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stage_dir, "events.parquet"),
    )
    raw_schema = spark.read.parquet(
        os.path.join(stage_dir, "events.parquet")
    ).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
        .select("event_type", "value")
    )
    totals = stream.groupBy("event_type").transformWithStateInPandas(
        TypeTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_totals")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = spark.table("tws_totals")
    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
