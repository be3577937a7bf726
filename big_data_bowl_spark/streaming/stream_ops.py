"""Structured Streaming shapes of the engine's operators.

The reference is pure batch (SURVEY §1.3), but frame-ordered per-play
processing maps naturally onto event-time streams (§7 note).  These
operators are written ONCE against the unified DataFrame API: the same
transformation works on a batch frame or a ``readStream`` frame; only the
source/sink differ.  Tests run them with ``Trigger.AvailableNow`` against
the parquet testdata and assert equality with the batch plan.

Scale notes: watermarks bound state; the windowed agg is a streaming
hash-agg with partial aggregation per micro-batch; sessionization uses
``session_window`` (gap-based), Spark's native stateful operator — no
custom applyInPandasWithState needed for these shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import read_table


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table: parquet file-source stream with the same
    nanos→micros normalization as the batch reader.  One file per
    micro-batch keeps tests deterministic."""
    batch = read_table(spark, sf_dir, "events")
    # FileStreamSource watches a DIRECTORY; pathGlobFilter narrows it to
    # the events table (at scale this is a partitioned landing dir)
    stream = (spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/events.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir))
    # re-apply the nanos normalization if the raw column read as long
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    assert stream.schema["ts"].dataType == batch.schema["ts"].dataType
    return stream


def hourly_window_agg(events: DataFrame,
                      watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window aggregation (count + sum + avg per
    (window, event_type)); watermark bounds late data and state size.
    Works identically on batch and stream inputs."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("value").alias("total_value"),
                    F.avg("value").alias("mean_value"))
               .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                        .alias("window_start"),
                       "event_type", "n", "total_value", "mean_value"))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessionization per user via ``session_window`` — Spark's
    built-in stateful session operator (merges windows closer than
    ``gap``).  Returns one row per (user, session) with bounds and
    aggregates."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum("value").alias("session_value"))
               .select("user_id",
                       F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss")
                        .alias("session_start"),
                       F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss")
                        .alias("session_end"),
                       "n_events", "session_value"))


def run_stream_to_memory(df: DataFrame, name: str,
                         timeout_s: int = 120) -> None:
    """Execute a streaming frame to a memory sink with AvailableNow (drain
    all available input, then stop) — the test/replay harness."""
    q = (df.writeStream.format("memory").queryName(name)
           .outputMode("complete")
           .trigger(availableNow=True)
           .start())
    q.awaitTermination(timeout_s)
