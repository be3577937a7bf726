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


def _stage_chunks(df, tmp_path, n=3, mod_col="event_id"):
    """Split ``df`` into ``n`` single-file parquet chunks under
    tmp_path/watch with ascending mtimes, so a maxFilesPerTrigger=1
    reader delivers them as ``n`` ordered micro-batches.  Returns the
    watch dir.  One place holds the staging convention (chunking column,
    mtime spacing) that every fold-equivalence test depends on."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    watch = tmp_path / "watch"
    watch.mkdir()
    t0 = 1_700_000_000
    for i in range(n):
        chunk_dir = str(tmp_path / f"stage{i}")
        (df.filter(F.col(mod_col) % n == i)
           .coalesce(1).write.parquet(chunk_dir))
        part, = glob.glob(f"{chunk_dir}/part-*.parquet")
        dest = str(watch / f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t0 + i * 60, t0 + i * 60))
    return watch


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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics: with a 30-minute watermark, a row arriving two
    micro-batches later but stamped hours earlier must NOT resurrect its
    (already finalized) window."""
    import glob
    import os
    import shutil

    import datetime as dt

    from pyspark.sql import Row

    from big_data_bowl_spark.streaming.stream_ops import hourly_window_agg

    def write_chunk(rows, i):
        chunk_dir = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows).coalesce(1).write.parquet(chunk_dir)
        part, = glob.glob(f"{chunk_dir}/part-*.parquet")
        dest = str(tmp_path / "watch" / f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60,) * 2)

    (tmp_path / "watch").mkdir()
    t = dt.datetime(2024, 1, 1, 10, 30)
    on_time = [Row(event_id=1, user_id=1, ts=t, value=1.0,
                   event_type="view"),
               Row(event_id=2, user_id=1, ts=t.replace(hour=15), value=1.0,
                   event_type="view")]   # advances the watermark far past 10:xx
    filler = [Row(event_id=3, user_id=1, ts=t.replace(hour=15, minute=35),
                  value=1.0, event_type="view")]
    late = [Row(event_id=4, user_id=1, ts=t.replace(minute=45), value=1.0,
                event_type="view")]      # 10:45 — hours behind the watermark
    # watermark advancement takes effect for FILTERING one batch after it
    # is committed, so the late row goes in the third micro-batch
    write_chunk(on_time, 0)
    write_chunk(filler, 1)
    write_chunk(late, 2)

    stream = (spark.readStream.schema(
        spark.createDataFrame(on_time).schema)
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "watch")))
    agg = hourly_window_agg(stream, watermark="30 minutes")
    q = (agg.writeStream.format("memory").queryName("wm_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress)
    got = {r.window_start: r.n
           for r in spark.sql("SELECT * FROM wm_test").collect()}
    # the 10:00 window closed with ONE row; the late 10:45 row was dropped
    assert got.get("2024-01-01 10:00:00") == 1
    assert dropped == 1


def test_stream_dedup_across_batches(spark, tmp_path):
    """A row re-delivered in a later micro-batch (at-least-once upstream)
    must appear exactly once downstream."""
    import glob
    import os
    import shutil

    import datetime as dt

    from pyspark.sql import Row

    from big_data_bowl_spark.streaming.stream_ops import stream_dedup

    def write_chunk(rows, i):
        chunk_dir = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows).coalesce(1).write.parquet(chunk_dir)
        part, = glob.glob(f"{chunk_dir}/part-*.parquet")
        dest = str(tmp_path / "watch" / f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60,) * 2)

    (tmp_path / "watch").mkdir()
    t = dt.datetime(2024, 1, 1, 12, 0)
    a = Row(event_id=1, user_id=1, ts=t, value=1.0)
    b = Row(event_id=2, user_id=1, ts=t.replace(minute=5), value=2.0)
    c = Row(event_id=3, user_id=2, ts=t.replace(minute=10), value=3.0)
    write_chunk([a, b], 0)
    write_chunk([a, c], 1)          # duplicate delivery of A

    stream = (spark.readStream.schema(spark.createDataFrame([a]).schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path / "watch")))
    out = stream_dedup(stream, ["event_id"])
    q = (out.writeStream.format("memory").queryName("dedup_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r.event_id for r in
                 spark.sql("SELECT * FROM dedup_test").collect())
    assert got == [1, 2, 3]


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream time-bound self-join must produce exactly the batch
    pairs even when an event and its matching error arrive in DIFFERENT
    micro-batches: the table is split into 3 time-ordered files, so pairs
    spanning a chunk boundary (within the ±6 h window) only appear if
    join state survives across batches and watermark eviction is not
    premature."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_bowl_spark.streaming.stream_ops import stream_interval_join

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "event_type", "value")
    batch = stream_interval_join(ev)
    assert not batch.isStreaming

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
    out = stream_interval_join(stream)
    assert out.isStreaming
    run_stream_to_memory(out, "ij_test", output_mode="append")
    got = spark.sql("SELECT * FROM ij_test")
    assert _rows(got) == _rows(batch)
    # sanity: the join is non-trivial at this SF
    assert got.count() > 0


def test_stream_static_enrich_equals_batch(spark):
    from big_data_bowl_spark.streaming.stream_ops import (
        read_events_stream, run_stream_to_memory, stream_static_enrich)
    from big_data_bowl_spark.sources.io import read_table

    dim = read_table(spark, SF_SMALL, "customer")
    stream = stream_static_enrich(read_events_stream(spark, SF_SMALL), dim)
    run_stream_to_memory(stream, "enriched", output_mode="append")
    got = _rows(spark.table("enriched"))
    want = _rows(stream_static_enrich(
        read_table(spark, SF_SMALL, "events"), dim))
    assert got == want


def test_foreach_batch_upsert_is_idempotent(spark, tmp_path):
    """Re-delivering a batch with the same batch_id must overwrite its own
    output, not append duplicates — the exactly-once property."""
    from big_data_bowl_spark.streaming.stream_ops import (
        foreach_batch_upsert, read_events_stream)

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = foreach_batch_upsert(read_events_stream(spark, SF_SMALL), out, ck)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 == spark.read.parquet(f"{SF_SMALL}/events.parquet").count()

    # simulate at-least-once re-delivery: re-run batch 0's writer with the
    # same rows (materialized first — a real retry re-reads the source,
    # not its own output)
    b0 = spark.read.parquet(f"{out}/batch_id=0")
    redelivered = spark.createDataFrame(b0.collect(), b0.schema)
    redelivered.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    assert spark.read.parquet(out).count() == n1


def test_stateful_funnel_stream_equals_batch(spark, tmp_path):
    """The streaming funnel must carry (stage, last-ts) state across
    micro-batches: with the events table split into 3 time-ordered
    micro-batches, each user's LAST emitted stage equals the batch fold
    over the whole table."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_bowl_spark.operators.scd import funnel_stages
    from big_data_bowl_spark.streaming.stream_ops import stateful_funnel

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "event_type")
    batch = {r["user_id"]: (r["stage"], r["n_events"])
             for r in funnel_stages(ev, "user_id", "ts", "event_type",
                                    ["view", "click", "purchase"],
                                    tie_col="event_id").collect()}

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
    out = stateful_funnel(stream)
    assert out.isStreaming
    run_stream_to_memory(out, "funnel_test", output_mode="append")
    emitted = spark.sql(
        "SELECT * FROM funnel_test").collect()
    # keep the LAST emission per user (highest n_events)
    last = {}
    for r in emitted:
        prev = last.get(r["user_id"])
        if prev is None or r["n_events"] > prev[1]:
            last[r["user_id"]] = (r["stage"], r["n_events"])
    assert last == batch



def test_stream_state_rollup_equals_batch(spark, tmp_path):
    """Streaming IVM: folding per-batch mergeable states across 3
    micro-batches must finalize exactly like the one-shot aggregate —
    and every intermediate version directory must exist (the versioned
    read-modify-write that makes replays idempotent)."""
    import glob
    import os

    from big_data_bowl_spark.operators.ivm import agg_state, finalize_state
    from big_data_bowl_spark.streaming.stream_ops import stream_state_rollup

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value")
    watch = _stage_chunks(ev, tmp_path)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_state_rollup(stream, str(tmp_path / "state"),
                            str(tmp_path / "ckpt"),
                            ["event_type"], "value")
    q.awaitTermination(120)

    versions = sorted(glob.glob(str(tmp_path / "state" / "v*")))
    assert len(versions) == 3, versions
    # readers resolve through the LATEST pointer (committed AFTER the
    # parquet write), never a directory listing
    from big_data_bowl_spark.streaming.stream_ops import (
        latest_state_version,
        read_latest_state,
    )
    assert latest_state_version(str(tmp_path / "state")) == 2
    got = finalize_state(
        read_latest_state(spark, str(tmp_path / "state")), ["event_type"])
    want = finalize_state(agg_state(ev, ["event_type"], "value"),
                          ["event_type"])
    assert _rows(got) == _rows(want)

    # retention: keep=0 prunes every version behind the pointer, so
    # state storage is bounded by keep, not by batch count
    stream2 = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1)
               .parquet(str(watch)))
    q2 = stream_state_rollup(stream2, str(tmp_path / "state0"),
                             str(tmp_path / "ckpt0"),
                             ["event_type"], "value", keep=0)
    q2.awaitTermination(120)
    left = sorted(os.path.basename(p) for p in
                  glob.glob(str(tmp_path / "state0" / "v*")))
    assert left == ["v2"], left
    got0 = finalize_state(
        read_latest_state(spark, str(tmp_path / "state0")), ["event_type"])
    assert _rows(got0) == _rows(want)


def test_stream_quantile_sketch_equals_batch(spark, tmp_path):
    """Streaming quantile-state fold: the bottom-k state folded across 3
    micro-batches is ROW-IDENTICAL to the one-shot whole-table state
    (min-k by a fixed hash is associative + idempotent), so the stream's
    sample percentiles equal the batch engine's exactly."""
    from big_data_bowl_spark.operators.sketches import (
        quantile_sketch_estimate, quantile_sketch_state)
    from big_data_bowl_spark.streaming.stream_ops import (
        read_latest_state, stream_quantile_sketch_rollup)

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value")
    watch = _stage_chunks(ev, tmp_path)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_quantile_sketch_rollup(
        stream, str(tmp_path / "qstate"), str(tmp_path / "qckpt"),
        ["event_type"], "value", "event_id", k=64)
    q.awaitTermination(120)

    state = read_latest_state(spark, str(tmp_path / "qstate")) \
        .select("event_type", "event_id", "qs_hash", "value")
    whole = quantile_sketch_state(ev, ["event_type"], "value",
                                  "event_id", k=64) \
        .select("event_type", "event_id", "qs_hash", "value")
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, whole.collect()))
    est = quantile_sketch_estimate(state, ["event_type"], "value",
                                   {"p50": 0.5})
    batch_est = quantile_sketch_estimate(whole, ["event_type"], "value",
                                         {"p50": 0.5})
    assert _rows(est) == _rows(batch_est)


def test_stream_cms_rollup_equals_batch(spark, tmp_path):
    """Streaming CMS fold: counter tables summed across 3 micro-batches
    equal the one-shot whole-history build (counter addition is
    associative), so frequency estimates are batch-count-independent."""
    from big_data_bowl_spark.operators.sketches import cms_build
    from big_data_bowl_spark.streaming.stream_ops import (
        read_latest_state, stream_cms_rollup)

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type")
    watch = _stage_chunks(ev, tmp_path)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_cms_rollup(stream, str(tmp_path / "mstate"),
                          str(tmp_path / "mckpt"), "event_type")
    q.awaitTermination(120)
    got = sorted(map(tuple, read_latest_state(
        spark, str(tmp_path / "mstate"))
        .select("row", "bucket", "cnt").collect()))
    want = sorted(map(tuple, cms_build(ev, "event_type")
                      .select("row", "bucket", "cnt").collect()))
    assert got == want


def test_read_latest_state_ignores_uncommitted_version(spark, tmp_path):
    """The LATEST-pointer contract under a crashed fold: a v(N+1)
    directory that exists on disk but was never published (the writer
    died between the parquet write and the pointer rename) must be
    invisible to readers — read_latest_state serves vN, never a
    directory listing's max."""
    from big_data_bowl_spark.operators.sketches import bloom_neutral_state
    from big_data_bowl_spark.streaming.stream_ops import (
        latest_state_version, read_latest_state, stream_bloom_rollup)

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id")
    watch = _stage_chunks(ev, tmp_path)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_bloom_rollup(stream, str(tmp_path / "cstate"),
                            str(tmp_path / "cckpt"), "user_id")
    q.awaitTermination(120)
    assert latest_state_version(str(tmp_path / "cstate")) == 2

    # simulate a crash mid-fold: v3 exists (even with plausible-looking
    # partial content) but LATEST still says 2
    garbage = ev.limit(1)
    garbage.write.parquet(str(tmp_path / "cstate" / "v3"))
    assert latest_state_version(str(tmp_path / "cstate")) == 2
    got = sorted(map(tuple, read_latest_state(
        spark, str(tmp_path / "cstate")).select("word", "bits")
        .collect()))
    want = sorted(map(tuple, bloom_neutral_state(ev, [], "user_id")
                      .select("word", "bits").collect()))
    assert got == want


def test_stream_bloom_rollup_equals_batch(spark, tmp_path):
    """Streaming Bloom fold: the bit table folded across 3 micro-batches
    is ROW-IDENTICAL to the one-shot whole-history table (bit_or is
    associative + idempotent), so gate verdicts are batch-count-
    independent."""
    from big_data_bowl_spark.operators.sketches import bloom_neutral_state
    from big_data_bowl_spark.streaming.stream_ops import (
        read_latest_state, stream_bloom_rollup)

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id")
    watch = _stage_chunks(ev, tmp_path)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_bloom_rollup(stream, str(tmp_path / "bstate"),
                            str(tmp_path / "bckpt"), "user_id")
    q.awaitTermination(120)

    got = sorted(map(tuple, read_latest_state(
        spark, str(tmp_path / "bstate")).select("word", "bits")
        .collect()))
    want = sorted(map(tuple, bloom_neutral_state(ev, [], "user_id")
                      .select("word", "bits").collect()))
    assert got == want


def test_stream_interval_left_outer_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: unmatched rows must emit with null
    err_event_id — but only once the watermark PROVES no future match
    can arrive.  Two far-future pusher rows advance the watermark past
    every original row's window (emission happens one micro-batch after
    the watermark clears it, hence two); the streamed result must then
    equal the batch left-outer join over the original rows, while the
    pushers' own outer rows legitimately stay in state (the watermark
    never clears THEIR window) — asserted too."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_bowl_spark.streaming.stream_ops import stream_interval_join

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "event_type", "value")
    batch = stream_interval_join(ev, how="leftOuter")
    assert not batch.isStreaming

    ranked = ev.withColumn(
        "__rn", F.row_number().over(Window.orderBy("ts", "event_id")))
    n = ranked.count()
    max_ts = ev.agg(F.max("ts")).first()[0]
    watch = tmp_path / "watch"
    watch.mkdir()
    bounds = [0, n // 3, 2 * n // 3, n]
    t0 = 1_700_000_000
    chunks = []
    for i in range(3):
        chunks.append(
            ranked.filter((F.col("__rn") > bounds[i])
                          & (F.col("__rn") <= bounds[i + 1])).drop("__rn"))
    # pushers are 'error'-typed: the right side's watermark node sits
    # AFTER the error filter, and the query's global watermark is the
    # MIN of both sides — a non-error pusher would advance only the left
    # watermark and the tail's outer rows would never flush
    for j in range(2):
        pusher_ts = max_ts + dt.timedelta(days=10 * (j + 1))
        chunks.append(spark.createDataFrame(
            [(-1 - j, -1 - j, pusher_ts, "error", 0.0)], ev.schema))
    for i, ch in enumerate(chunks):
        chunk_dir = str(tmp_path / f"stage{i}")
        ch.coalesce(1).write.parquet(chunk_dir)
        part, = glob.glob(f"{chunk_dir}/part-*.parquet")
        dest = str(watch / f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t0 + i * 60, t0 + i * 60))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    out = stream_interval_join(stream, how="leftOuter")
    assert out.isStreaming
    run_stream_to_memory(out, "loj_test", output_mode="append")
    got = spark.sql("SELECT * FROM loj_test")
    kept = got.filter(F.col("user_id") >= 0)
    assert _rows(kept) == _rows(batch)
    # outer rows actually exist (the join is not accidentally total)
    assert kept.filter(F.col("err_event_id").isNull()).count() > 0
    # eviction discipline on the pushers themselves: pusher B's
    # watermark (+20d − 2h) clears pusher A's window (+10d + 6h), so
    # A's outer row may flush — but nothing ever clears B's own window,
    # so B's outer row must still be held in state at shutdown
    assert got.filter(F.col("user_id") == -2).count() == 0


def test_transform_with_state_user_stats_equals_batch(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: per-user cumulative stats
    carried across 3 micro-batches — the LAST emission per user must
    equal the one-shot batch aggregate exactly (integer-cents
    accumulation).  Requires the RocksDB state store provider and
    protobuf (the TWS state-server wire protocol) — skipped where
    protobuf is unavailable."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf")
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from big_data_bowl_spark.streaming.stream_ops import stateful_user_stats

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value").filter(F.col("value").isNotNull())
    watch = tmp_path / "watch"
    watch.mkdir()
    t0 = 1_700_000_000
    for i in range(3):
        chunk_dir = str(tmp_path / f"stage{i}")
        (ev.filter(F.col("event_id") % 3 == i)
           .coalesce(1).write.parquet(chunk_dir))
        part, = glob.glob(f"{chunk_dir}/part-*.parquet")
        dest = str(watch / f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t0 + i * 60, t0 + i * 60))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(watch)))
        out = stateful_user_stats(stream)
        q = (out.writeStream.format("memory").queryName("tws_stats")
               .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)

    emitted = spark.table("tws_stats").collect()
    assert emitted, "no emissions from transformWithStateInPandas"
    last: dict[int, tuple] = {}
    for r in emitted:  # memory sink appends update rows in batch order
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            last[r["user_id"]] = (r["n_events"], r["sum_value"])
    want = {r["user_id"]: (r["n"], r["s"])
            for r in (ev.groupBy("user_id")
                        .agg(F.count(F.lit(1)).alias("n"),
                             (F.sum(F.round(F.col("value") * 100)
                                    .cast("long")) / 100.0).alias("s"))
                      ).collect()}
    assert last == want


def test_stream_hll_rollup_equals_batch(spark, tmp_path):
    """Streaming HLL fold: register tables max-merged across 3
    micro-batches are ROW-IDENTICAL to the one-shot whole-history build
    (max is associative + idempotent), so distinct-count estimates are
    batch-count-independent — and replaying a batch cannot inflate
    them."""
    from big_data_bowl_spark.operators.sketches import (
        hll_neutral_registers, hll_neutral_rollup)
    from big_data_bowl_spark.streaming.stream_ops import (
        read_latest_state, stream_hll_rollup)

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_type", "user_id")
    watch = _stage_chunks(ev, tmp_path)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_hll_rollup(stream, str(tmp_path / "hstate"),
                          str(tmp_path / "hckpt"),
                          ["event_type"], "user_id")
    q.awaitTermination(120)
    state = read_latest_state(spark, str(tmp_path / "hstate"))
    got = sorted(map(tuple, state
                     .select("event_type", "register", "rho").collect()))
    want = sorted(map(tuple, hll_neutral_registers(
        ev, ["event_type"], "user_id")
        .select("event_type", "register", "rho").collect()))
    assert got == want
    # the folded state answers the estimate without rescanning history
    from pyspark.sql import functions as F
    est = {r["event_type"]: r["hll_estimate"]
           for r in hll_neutral_rollup(state, ["event_type"]).collect()}
    truth = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
                        .agg(F.count_distinct("user_id").alias("n"))
                        .collect()}
    for k, t in truth.items():
        assert abs(est[k] - t) / t < 0.35, (k, est[k], t)


def test_stream_theta_equals_batch(spark, tmp_path):
    """Streaming theta-state fold: the bottom-k SET state folded across
    micro-batches is ROW-IDENTICAL to the one-shot whole-table state
    (key dedup + min-k is associative + idempotent), so streaming
    audience-intersection estimates equal the batch engine's exactly."""
    from big_data_bowl_spark.operators.sketches import (
        theta_intersect_pairs, theta_sketch_state)
    from big_data_bowl_spark.streaming.stream_ops import (
        read_latest_state, stream_theta_rollup)

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "user_id")
    watch = _stage_chunks(ev, tmp_path)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_theta_rollup(
        stream, str(tmp_path / "tstate"), str(tmp_path / "tckpt"),
        ["event_type"], "user_id", k=8)
    q.awaitTermination(120)

    state = read_latest_state(spark, str(tmp_path / "tstate")) \
        .select("event_type", "user_id", "th_hash", "th_k")
    whole = theta_sketch_state(ev, ["event_type"], "user_id", k=8) \
        .select("event_type", "user_id", "th_hash", "th_k")
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, whole.collect()))
    got = sorted(map(tuple, theta_intersect_pairs(
        state, "event_type", "user_id").collect()))
    want = sorted(map(tuple, theta_intersect_pairs(
        whole, "event_type", "user_id").collect()))
    assert got == want


def test_stream_bootstrap_rollup_equals_batch(spark, tmp_path):
    """Streaming Poisson-bootstrap fold: per-replicate (n_eff, sum)
    state summed across micro-batches equals the one-shot whole-table
    bootstrap exactly — weights are hash-draws on (key, rep), so the
    fold is partition- and batch-boundary-proof."""
    from pyspark.sql import functions as F

    from big_data_bowl_spark.functions.scalar import cents
    from big_data_bowl_spark.pipeline.sampling import poisson_bootstrap
    from big_data_bowl_spark.streaming.stream_ops import (
        read_latest_state, stream_bootstrap_rollup)

    ev = (read_table(spark, SF_SMALL, "events")
          .filter(F.col("value").isNotNull())
          .select("event_id", cents(F.col("value")).alias("units")))
    watch = _stage_chunks(ev, tmp_path)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(watch)))
    q = stream_bootstrap_rollup(
        stream, str(tmp_path / "bstate"), str(tmp_path / "bckpt"),
        "units", "event_id", reps=8)
    q.awaitTermination(120)

    state = {r.rep: (r.n_eff, r.sum_units)
             for r in read_latest_state(
                 spark, str(tmp_path / "bstate")).collect()}
    whole = {r.rep: (r.n_eff, r.sum_units)
             for r in poisson_bootstrap(ev, "units", "event_id",
                                        reps=8).collect()}
    assert state == whole


def _stage_chrono_chunks(df, tmp_path, n=3):
    """Chronological variant of _stage_chunks: chunk i holds the i-th
    time-ordered third of the rows, so the file stream replays history
    the way a landing directory receives it — and the watermark never
    retro-drops rows (a mod-split would interleave the full time range
    into every batch and the 2h watermark would discard 'late' rows,
    testing a different semantics than batch equality)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    chunked = df.withColumn(
        "__chunk",
        F.ntile(n).over(Window.orderBy("ts", "event_id")) - 1)
    watch = _stage_chunks(chunked, tmp_path, n=n, mod_col="__chunk")
    return watch


def _read_watch_stream(spark, watch, schema):
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(watch)))


def test_hourly_window_agg_across_micro_batches(spark, tmp_path):
    """End-to-end micro-batch replay of the headline q_window_agg_hourly
    aggregation (VERDICT r7 item 8): events split into 3 chronological
    files, streamed one file per trigger with the production 2h
    watermark, must reproduce the batch result row-for-row — the
    batch≡stream fold identity exercised through REAL multi-batch state
    merge, not a single-trigger drain."""
    events = read_table(spark, SF_SMALL, "events")
    watch = _stage_chrono_chunks(events, tmp_path, n=3)
    batch = hourly_window_agg(events)
    stream = hourly_window_agg(
        _read_watch_stream(spark, watch, events.schema).drop("__chunk"))
    assert stream.isStreaming
    run_stream_to_memory(stream, "hourly_mb_test")
    got = spark.sql("SELECT * FROM hourly_mb_test")
    assert _rows(got) == _rows(batch.select(*got.columns))


def test_sessionize_across_micro_batches(spark, tmp_path):
    """Same replay for the headline q_sessionize session_window plan:
    sessions that STRADDLE a micro-batch boundary must merge across
    triggers (the session-state hard case a single-trigger drain never
    exercises)."""
    events = read_table(spark, SF_SMALL, "events")
    watch = _stage_chrono_chunks(events, tmp_path, n=3)
    batch = sessionize(events, gap="30 minutes")
    stream = sessionize(
        _read_watch_stream(spark, watch, events.schema).drop("__chunk"),
        gap="30 minutes")
    assert stream.isStreaming
    run_stream_to_memory(stream, "session_mb_test")
    got = spark.sql("SELECT * FROM session_mb_test")
    assert _rows(got) == _rows(batch.select(*got.columns))
