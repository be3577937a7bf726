"""Structured Streaming equivalence: the streaming plan over the same
parquet input must produce exactly the batch plan's result (AvailableNow
drain to a memory sink)."""

from __future__ import annotations

from big_data_bowl_spark.sources.io import read_table
from big_data_bowl_spark.streaming.stream_ops import (
    hourly_window_agg,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
)

from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hourly_window_stream_equals_batch(spark):
    batch = hourly_window_agg(read_table(spark, SF_SMALL, "events"))
    stream = hourly_window_agg(read_events_stream(spark, SF_SMALL))
    assert stream.isStreaming
    run_stream_to_memory(stream, "hourly_test")
    got = spark.sql("SELECT * FROM hourly_test")
    assert _rows(got) == _rows(batch)


def test_sessionize_stream_equals_batch(spark):
    batch = sessionize(read_table(spark, SF_SMALL, "events"), gap="30 minutes")
    stream = sessionize(read_events_stream(spark, SF_SMALL), gap="30 minutes")
    assert stream.isStreaming
    run_stream_to_memory(stream, "session_test")
    got = spark.sql("SELECT * FROM session_test")
    assert _rows(got) == _rows(batch)
