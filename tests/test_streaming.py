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


def test_stateful_lag_diff_stream_equals_batch(spark, tmp_path):
    """stateful_lag_diff must carry last-value state ACROSS micro-batches:
    the events table is split into 3 time-ordered files (one micro-batch
    each, ordered mtimes), and the streamed result must equal the batch
    window lag-diff over the whole table."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_bowl_spark.streaming.stream_ops import stateful_lag_diff

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "value")

    # batch twin: q_frame_diff semantics
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = ev.select(
        "event_id", "user_id",
        F.coalesce(F.col("value") - F.lag("value").over(w), F.lit(0.0))
         .alias("dvalue"))

    # split into 3 chunks along the global (ts, event_id) order, preserving
    # nulls (no pandas round-trip), one file per chunk with ascending mtime
    ranked = ev.withColumn(
        "__rn", F.row_number().over(Window.orderBy("ts", "event_id")))
    n = ranked.count()
    watch = tmp_path / "watch"
    watch.mkdir()
    bounds = [0, n // 3, 2 * n // 3, n]
    t0 = 1_700_000_000
    for i in range(3):
        chunk_dir = str(tmp_path / f"stage{i}")
        (ranked.filter((F.col("__rn") > bounds[i])
                       & (F.col("__rn") <= bounds[i + 1]))
               .drop("__rn").coalesce(1).write.parquet(chunk_dir))
        part, = glob.glob(f"{chunk_dir}/part-*.parquet")
        dest = str(watch / f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t0 + i * 60, t0 + i * 60))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    out = stateful_lag_diff(stream)
    assert out.isStreaming
    run_stream_to_memory(out, "lag_diff_test", output_mode="append")
    got = spark.sql("SELECT * FROM lag_diff_test")
    assert _rows(got) == _rows(batch)
