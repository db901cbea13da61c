"""Batch ≡ stream equivalence for the windowed aggregations (SURVEY §2.11)."""

from __future__ import annotations

from braintumor_data_pipeline_spark.streaming.events import (
    events_tumbling_5m,
    run_streaming_tumbling_counts,
)


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
