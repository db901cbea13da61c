"""Batch ≡ stream equivalence for the windowed aggregations (SURVEY §2.11)."""

from __future__ import annotations

from braintumor_data_pipeline_spark.streaming.events import (
    events_tumbling_5m,
    run_streaming_tumbling_counts,
)


def test_stateful_totals_equal_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState running totals must converge to the batch
    group-by after all files are processed."""
    from pyspark.sql import functions as F

    from braintumor_data_pipeline_spark.sources.fixtures import load_table
    from braintumor_data_pipeline_spark.streaming.stateful import (
        run_stateful_type_totals,
    )

    final = {
        r.event_type: (r.n_events, r.sum_value)
        for r in run_stateful_type_totals(
            spark, sf_dir, str(tmp_path / "ckpt_state")
        ).collect()
    }
    batch = {
        r.event_type: (r.n, round(r.s, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == batch and len(final) == 5


def test_streaming_equals_batch_tumbling(spark, sf_dir, tmp_path):
    batch = {
        (r.bucket_us, r.event_type): (r.n, r.sum_value)
        for r in events_tumbling_5m(spark, sf_dir).collect()
    }
    stream_df = run_streaming_tumbling_counts(
        spark, sf_dir, str(tmp_path / "ckpt")
    )
    stream = {
        (r.bucket_us, r.event_type): (r.n, r.sum_value)
        for r in stream_df.collect()
    }
    assert batch == stream
    assert len(batch) > 0
