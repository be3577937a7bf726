"""Structured Streaming shapes of the engine's operators.

The reference is pure batch (SURVEY §1.3), but frame-ordered per-play
processing maps naturally onto event-time streams (§7 note).  These
operators are written ONCE against the unified DataFrame API: the same
transformation works on a batch frame or a ``readStream`` frame; only the
source/sink differ.  Tests run them with ``Trigger.AvailableNow`` against
the parquet testdata and assert equality with the batch plan.

Scale notes: watermarks bound state; the windowed agg is a streaming
hash-agg with partial aggregation per micro-batch; sessionization uses
``session_window`` (gap-based), Spark's native stateful operator.  The one
shape that DOES need a custom stateful operator is the per-key ordered
diff (W1 kinematics): ``lag`` is unsupported on streams, so
:func:`stateful_lag_diff` carries the last value per key across
micro-batches with ``applyInPandasWithState`` — state is one float per
key, O(keys) not O(rows).
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


def hourly_window_agg(events: DataFrame, watermark: str = "2 hours",
                      exact_cents: bool = False) -> DataFrame:
    """Event-time tumbling-window aggregation (count + sum + avg per
    (window, event_type)); watermark bounds late data and state size.
    Works identically on batch and stream inputs.

    ``exact_cents=True`` reduces the 2-decimal value column as integer
    cents so the mean is bit-identical across engines and partition
    orders (functions.scalar.cents rationale) — used by the oracle-
    checked batch twin; streaming semantics are unaffected either way."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    if exact_cents:
        from ..functions.scalar import cents
        vc = cents(F.col("value"))
        aggs = [F.count(F.lit(1)).alias("n"),
                (F.sum(vc) / 100.0).alias("total_value"),
                (F.sum(vc) / F.count("value") / 100.0).alias("mean_value")]
    else:
        aggs = [F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total_value"),
                F.avg("value").alias("mean_value")]
    return (src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
               .agg(*aggs)
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
                         timeout_s: int = 120,
                         output_mode: str = "complete") -> None:
    """Execute a streaming frame to a memory sink with AvailableNow (drain
    all available input, then stop) — the test/replay harness.  Stateful
    append operators (``applyInPandasWithState``) pass
    ``output_mode='append'``."""
    q = (df.writeStream.format("memory").queryName(name)
           .outputMode(output_mode)
           .trigger(availableNow=True)
           .start())
    q.awaitTermination(timeout_s)


LAG_DIFF_OUT_SCHEMA = "event_id long, user_id long, dvalue double"
LAG_DIFF_STATE_SCHEMA = "last_value double, has_null boolean"


def stateful_lag_diff(events: DataFrame) -> DataFrame:
    """Streaming form of W1 (kinematics lag-diff): per-user
    ``value - lag(value)`` ordered by (ts, event_id), first/null diffs
    coalesced to 0.0 — exactly the batch ``q_frame_diff`` semantics.

    ``lag`` is not allowed on streaming frames, so this is the engine's
    one genuinely custom stateful operator: ``applyInPandasWithState``
    keeps the last observed value per user (one float + one null flag)
    and seeds each micro-batch's first diff from it.  Requires
    time-ordered micro-batches per key (file source with ordered file
    mtimes, or a log source with per-key ordering) — the same invariant
    the batch window's ``orderBy`` enforces globally.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        prev = rows["value"].shift(1)
        if state.exists:
            last_value, has_null = state.get
            prev.iloc[0] = float("nan") if has_null else last_value
        last = rows["value"].iloc[-1]
        state.update((None if pd.isna(last) else float(last),
                      bool(pd.isna(last))))
        yield pd.DataFrame({
            "event_id": rows["event_id"],
            "user_id": key[0],
            "dvalue": (rows["value"] - prev).fillna(0.0),
        })

    return events.groupBy("user_id").applyInPandasWithState(
        fn, LAG_DIFF_OUT_SCHEMA, LAG_DIFF_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)


def stream_interval_join(events: DataFrame, window: str = "6 hours",
                         watermark: str = "2 hours",
                         how: str = "inner") -> DataFrame:
    """Stream-stream time-bound self-join — the streaming twin of
    ``operators/ranges.interval_join``'s q_interval_join shape: every
    event of a user within ±``window`` of one of that user's error
    events, emitted as pairs.

    Both inputs carry watermarks and the join condition bounds event-time
    distance, so Spark can evict join state deterministically: a left row
    leaves state once the watermark passes ``l_ts + window``, a right row
    once it passes ``r_ts + window`` — state is O(rows in one window +
    watermark span), not O(stream history).  On a batch frame the same
    code is a plain non-equi join (unified API, one implementation).

    ``how="leftOuter"`` adds the unmatched-left rows with null
    ``err_event_id`` — in streaming mode Spark can only emit an outer
    null once the watermark proves no future match can arrive (past
    ``l_ts + window``), so outer rows surface one micro-batch AFTER the
    watermark clears their window; rows near the head of the stream
    stay in state until later data advances the watermark.  The test
    pins exactly this emission discipline.
    """
    iv = F.expr(f"INTERVAL {window}")
    left = events.select("event_id", "user_id",
                         F.col("ts").alias("l_ts"), "event_type", "value")
    right = (events.filter(F.col("event_type") == "error")
                   .select(F.col("event_id").alias("err_event_id"),
                           F.col("user_id").alias("r_user_id"),
                           F.col("ts").alias("r_ts")))
    if events.isStreaming:
        left = left.withWatermark("l_ts", watermark)
        right = right.withWatermark("r_ts", watermark)
    cond = ((F.col("user_id") == F.col("r_user_id"))
            & (F.col("l_ts") >= F.col("r_ts") - iv)
            & (F.col("l_ts") <= F.col("r_ts") + iv)
            & (F.col("event_id") != F.col("err_event_id")))
    return (left.join(right, cond, how)
                .select("event_id", "err_event_id", "user_id",
                        "event_type", "value"))


def stream_dedup(events: DataFrame, keys: list[str],
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once dedup: drop rows whose ``keys`` were already
    seen, with state bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — state for a key is evicted once
    the watermark passes its event time, so re-ingesting a file days later
    cannot grow state unboundedly).  The batch twin is ``dropDuplicates``.
    The first op a 100 TB ingestion stream runs: upstream at-least-once
    delivery becomes exactly-once before anything else sees the rows."""
    if events.isStreaming:
        return (events.withWatermark("ts", watermark)
                      .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)


def stream_static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the most common streaming shape:
    each micro-batch of the fact stream joins a static (or slowly
    refreshed) dimension.  The dimension is broadcast, so the stream side
    never shuffles and needs NO watermark (static side is not stateful:
    Spark re-plans the broadcast per micro-batch, which is also how dim
    refreshes propagate).  Works identically on a batch frame — one
    implementation, both modes."""
    d = F.broadcast(dim.select(F.col("c_custkey").alias("user_id"),
                               "c_name", "c_mktsegment"))
    return (events.join(d, "user_id", "left")
                  .select("event_id", "user_id", "event_type", "value",
                          "c_name", "c_mktsegment"))


def foreach_batch_upsert(df: DataFrame, out_dir: str,
                         checkpoint_dir: str):
    """Idempotent micro-batch sink: ``foreachBatch`` writes each batch to
    ``out_dir/batch_id=N`` with overwrite.  Replayed batches (failure →
    restart re-delivers the LAST batch with the SAME batch_id) overwrite
    their own partition instead of appending duplicates — that overwrite-
    by-deterministic-key is what turns at-least-once delivery into
    effectively-exactly-once output, the standard pattern for sinks
    without transactional commit.  Returns the started query."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
                 .parquet(f"{out_dir}/batch_id={batch_id}"))

    return (df.writeStream.foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint_dir)
              .trigger(availableNow=True)
              .start())


def latest_state_version(state_dir: str) -> int:
    """Resolve the latest COMMITTED state version from the ``LATEST``
    pointer file — never by listing ``vN`` directories, which can
    observe a version whose parquet write is still in flight."""
    import os
    with open(os.path.join(state_dir, "LATEST")) as f:
        return int(f.read().strip())


def read_latest_state(spark, state_dir: str) -> DataFrame:
    """Read the latest committed state table (see
    :func:`latest_state_version` for why readers must go through the
    pointer, not a directory listing)."""
    v = latest_state_version(state_dir)
    return spark.read.parquet(f"{state_dir}/v{v}")


def stream_state_rollup(df: DataFrame, state_dir: str, checkpoint_dir: str,
                        keys: list[str], value_col: str, keep: int = 2):
    """Streaming incremental view maintenance: each micro-batch
    aggregates ALONE into a mergeable per-group state
    (operators/ivm.agg_state) and folds into the persisted state table —
    per-batch cost is O(delta + groups), never O(history), which is the
    entire point of maintaining a 100 TB rollup incrementally.

    The state table is versioned by batch id (``state_dir/vN`` computed
    from ``vN-1`` + batch N).  Versioning makes the read-modify-write
    idempotent: a replayed batch (failure → restart re-delivers the same
    batch_id) recomputes ITS version from the same predecessor instead
    of double-counting — the same overwrite-by-deterministic-key
    discipline as :func:`foreach_batch_upsert`.  It is NOT atomic by
    itself — ``mode('overwrite').parquet`` is delete-then-write, so a
    reader that LISTS ``state_dir`` and picks the highest ``vN``
    mid-write can observe a partial fold.  Publication is therefore
    gated by a ``LATEST`` pointer file, updated with write-temp +
    ``os.replace`` (atomic rename on POSIX; on an object store, swap in
    the store's conditional-put) only AFTER the version's parquet commit
    finishes; readers resolve through :func:`read_latest_state`.
    Versions older than ``keep`` behind the pointer are pruned so state
    storage stays O(keep × groups), not O(batches × groups).  The latest
    state finalizes via ``operators/ivm.finalize_state``.  Returns the
    started query."""
    from ..operators.ivm import agg_state, merge_states

    return _stream_fold(
        df, state_dir, checkpoint_dir,
        build_fn=lambda b: agg_state(b, keys, value_col),
        merge_fn=lambda prev, st: merge_states([prev, st], keys),
        keep=keep)


def _stream_fold(df: DataFrame, state_dir: str, checkpoint_dir: str,
                 build_fn, merge_fn, keep: int):
    """The shared versioned-fold protocol behind every streaming state
    rollup (IVM aggregates, quantile sketch, Bloom filter): per batch,
    ``build_fn(batch_df)`` makes the batch's own state, ``merge_fn(prev,
    state)`` folds it with version N−1, the result writes as version N,
    and :func:`_publish_state_version` commits the LATEST pointer and
    prunes.  One place to fix the protocol — the fold shape, replay
    idempotency, and publication ordering are identical across state
    types by design."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        st = build_fn(batch_df)
        if batch_id > 0:
            prev = batch_df.sparkSession.read.parquet(
                f"{state_dir}/v{batch_id - 1}")
            st = merge_fn(prev, st)
        st.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")
        _publish_state_version(state_dir, batch_id, keep)

    return (df.writeStream.foreachBatch(merge_batch)
              .option("checkpointLocation", checkpoint_dir)
              .trigger(availableNow=True)
              .start())


def _publish_state_version(state_dir: str, batch_id: int,
                           keep: int) -> None:
    """Commit version ``batch_id`` as LATEST (write-temp + os.replace —
    atomic rename on POSIX) only AFTER its parquet finished, and prune
    versions more than ``keep`` behind the pointer."""
    import os
    import shutil

    tmp = os.path.join(state_dir, "LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(state_dir, "LATEST"))
    for v in range(batch_id - keep):
        shutil.rmtree(os.path.join(state_dir, f"v{v}"),
                      ignore_errors=True)


def stream_quantile_sketch_rollup(df: DataFrame, state_dir: str,
                                  checkpoint_dir: str, group: list[str],
                                  value_col: str, key_col: str,
                                  k: int = 128, keep: int = 2):
    """Streaming fold of the bottom-k quantile sketch
    (operators/sketches.quantile_sketch_state): each micro-batch builds
    its own ≤ k-rows-per-group state, min-k-merges it with the persisted
    state, and publishes a new version through the same LATEST-pointer
    discipline as :func:`stream_state_rollup`.  Because min-k by a fixed
    hash is associative and idempotent, the folded state after any batch
    split equals the one-shot whole-history state (pinned by
    test_stream_quantile_sketch_equals_batch) — so a 100 TB stream keeps
    ONLY O(groups · k) rows of state while any later reader gets exact
    sample percentiles via quantile_sketch_estimate.  Returns the
    started query."""
    from ..operators.sketches import (quantile_sketch_merge,
                                      quantile_sketch_state)

    return _stream_fold(
        df, state_dir, checkpoint_dir,
        build_fn=lambda b: quantile_sketch_state(
            b, group, value_col, key_col, k),
        merge_fn=lambda prev, st: quantile_sketch_merge(
            prev.unionByName(st), group, value_col, key_col, k),
        keep=keep)


def stream_bloom_rollup(df: DataFrame, state_dir: str,
                        checkpoint_dir: str, key_col: str,
                        m_words: int = 256, k: int = 4, keep: int = 2):
    """Streaming fold of the neutral Bloom ingest filter
    (operators/sketches.bloom_neutral_state): each micro-batch's bit
    table OR-merges into the persisted filter under the LATEST-pointer
    discipline.  bit_or associativity makes the folded filter
    row-identical to the one-shot whole-history table, so a consumer
    gating a new batch (with_bloom_maybe_seen) gets the same verdicts
    whether history arrived as one load or a thousand micro-batches —
    the streaming form of the ingest-dedup gate, with ≤ m_words rows of
    state regardless of stream length.  Returns the started query."""
    from ..operators.sketches import (bloom_neutral_merge,
                                      bloom_neutral_state)

    return _stream_fold(
        df, state_dir, checkpoint_dir,
        build_fn=lambda b: bloom_neutral_state(
            b, [], key_col, m_words=m_words, k=k),
        merge_fn=lambda prev, st: bloom_neutral_merge(
            prev.unionByName(st), []),
        keep=keep)


def stream_cms_rollup(df: DataFrame, state_dir: str,
                      checkpoint_dir: str, col: str,
                      w: int = 2048, d: int = 4, keep: int = 2):
    """Streaming fold of the count-min counter table
    (operators/sketches.cms_build): counter ADDITION is associative, so
    per-batch d×w tables sum-merge into the persisted sketch under the
    LATEST-pointer protocol — frequency estimates over an unbounded
    stream with O(d·w) rows of state, and the folded table row-identical
    to the one-shot whole-history build.  Completes the streaming state
    matrix: group aggregates (sum/count monoids), quantile sample
    (min-k), Bloom bits (bit_or), CMS counters (+).  Returns the
    started query."""
    from ..operators.sketches import _cms_check_params, cms_build

    def merge(prev: DataFrame, st: DataFrame) -> DataFrame:
        u = prev.unionByName(st)
        # a restart with different (w, d) must fail loud, not blend
        # bucket spaces (silent under-estimates would break the
        # heavy-hitter prefilter's exactness)
        _cms_check_params(u, "stream_cms_rollup", w, d)
        return (u.groupBy("row", "bucket", "cms_w", "cms_d")
                 .agg(F.sum("cnt").alias("cnt")))

    return _stream_fold(
        df, state_dir, checkpoint_dir,
        build_fn=lambda b: cms_build(b, col, w=w, d=d),
        merge_fn=merge,
        keep=keep)


def stream_hll_rollup(df: DataFrame, state_dir: str,
                      checkpoint_dir: str, group: list[str],
                      key_col: str, keep: int = 2):
    """Streaming fold of the neutral-HLL register table
    (operators/sketches.hll_neutral_registers): per-batch registers
    max-merge into the persisted state under the LATEST-pointer
    discipline.  max is associative AND idempotent, so the fold is
    row-identical to the one-shot whole-history build — and replayed /
    duplicate batches cannot inflate the estimate (the idempotence the
    count monoid lacks).  Distinct-count estimates over an unbounded
    stream with O(groups · 256) rows of state; any reader answers
    via hll_neutral_rollup without rescanning history.  Closes the
    streaming state-fold matrix: sum/count monoids, min-k, bit_or,
    counter +, and register max.  Returns the started query."""
    from ..operators.sketches import hll_neutral_registers

    return _stream_fold(
        df, state_dir, checkpoint_dir,
        build_fn=lambda b: hll_neutral_registers(b, group, key_col),
        merge_fn=lambda prev, st: (
            prev.unionByName(st)
                .groupBy(*group, "register")
                .agg(F.max("rho").alias("rho"))),
        keep=keep)


FUNNEL_OUT_SCHEMA = "user_id long, stage int, n_events long"
FUNNEL_STATE_SCHEMA = "stage int, last_ep double, n_events long"


def stateful_funnel(events: DataFrame,
                    steps: tuple[str, ...] = ("view", "click", "purchase")
                    ) -> DataFrame:
    """Streaming form of the ordered funnel (operators/scd.funnel_stages):
    per-user stage progress carried ACROSS micro-batches with
    ``applyInPandasWithState`` — state is (stage, last event-time,
    count), O(users) not O(events).  Each micro-batch emits the user's
    cumulative (stage, n_events) so far; the LAST emission per user
    equals the batch fold over the whole stream (the test's contract).
    Same strict-order semantics: step k+1 counts only strictly after
    step k's first hit."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    step_list = list(steps)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            stage, last_ep, n_events = state.get
        else:
            stage, last_ep, n_events = 0, float("-inf"), 0
        for ts in rows.itertuples(index=False):
            ep = ts.ts.timestamp()
            if (stage < len(step_list) and ts.event_type == step_list[stage]
                    and (stage == 0 or ep > last_ep)):
                stage += 1
                last_ep = ep
        n_events += len(rows)
        state.update((stage, last_ep, n_events))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage],
                            "n_events": [n_events]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn, FUNNEL_OUT_SCHEMA, FUNNEL_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)


# NOTE: Spark 4.1 also ships transformWithStateInPandas (typed state
# handles, timers) as the successor to applyInPandasWithState.  This
# container cannot execute it — the TWS state-server protocol needs
# google.protobuf, which is absent — so the engine standardizes on the
# applyInPandasWithState forms above (stateful_lag_diff, stateful_funnel),
# which cover the same semantics with executable tests.  Porting is
# mechanical once the dependency exists.



def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Per-user cumulative (event count, integer-cents value sum) carried
    across micro-batches with ``transformWithStateInPandas`` — the Spark
    4 arbitrary-stateful-processing API (typed ValueState handles,
    timer support, RocksDB-backed), shown alongside the older
    ``applyInPandasWithState`` form (:func:`stateful_lag_diff`,
    :func:`stateful_funnel`) because new pipelines should target it.

    State is ONE (long, long) pair per user — O(keys); cents keep the
    cross-batch accumulation exact, so the LAST emission per user equals
    the one-shot batch aggregate bit-for-bit (the stream ≡ batch test
    contract).  Requires the RocksDB state store provider AND the
    protobuf package (the TWS state-server protocol is protobuf-framed;
    this container lacks it, so the equivalence test skips with an
    explicit reason — the operator itself is plain public API and runs
    wherever `google.protobuf` is installed)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n BIGINT, cents BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, cents = (self._agg.get() if self._agg.exists()
                        else (0, 0))
            for pdf in rows:
                n += int(len(pdf))
                cents += int(pdf["value"].mul(100).round()
                             .astype("int64").sum())
            self._agg.update((n, cents))
            yield pd.DataFrame({"user_id": [key[0]],
                                "n_events": [n],
                                "sum_value": [cents / 100.0]})

        def close(self) -> None:
            pass

    return (events.select("user_id", "value")
                  .groupBy("user_id")
                  .transformWithStateInPandas(
                      Proc(),
                      outputStructType=("user_id BIGINT, n_events BIGINT, "
                                        "sum_value DOUBLE"),
                      outputMode="Update",
                      timeMode="None"))


def stream_theta_rollup(df: DataFrame, state_dir: str,
                        checkpoint_dir: str, group: list[str],
                        key_col: str, k: int = 32, keep: int = 2):
    """Streaming fold of the theta/KMV SET sketch
    (operators/sketches.theta_sketch_state): per-batch bottom-k states
    key-dedup + min-k-merge into the persisted state under the
    LATEST-pointer discipline.  min-k over the DEDUPED key set is
    associative and idempotent (theta_sketch_merge's contract), so the
    fold equals the one-shot whole-history state and replayed batches
    cannot bias the sample.  Any reader answers audience-intersection
    queries from O(groups · k) state rows via theta_intersect_pairs
    without rescanning the stream.  Returns the started query."""
    from ..operators.sketches import theta_sketch_merge, theta_sketch_state

    return _stream_fold(
        df, state_dir, checkpoint_dir,
        build_fn=lambda b: theta_sketch_state(b, group, key_col, k),
        merge_fn=lambda prev, st: theta_sketch_merge(
            prev.unionByName(st), group, key_col, k),
        keep=keep)


def stream_bootstrap_rollup(df: DataFrame, state_dir: str,
                            checkpoint_dir: str, units_col: str,
                            key_col: str, reps: int = 32, keep: int = 2):
    """Streaming fold of Poisson-bootstrap replicate state
    (pipeline/sampling.poisson_bootstrap): per batch, each row's
    hash-deterministic Poisson(1) weights collapse into the per-replicate
    (n_eff, sum_units) sums, which merge into the persisted state by
    plain addition — the state is a perfect monoid (R rows total), so
    the fold equals the one-shot whole-history bootstrap exactly and a
    reader computes live confidence intervals from R state rows without
    rescanning the stream.  Weights are hash-draws on (key, rep), so a
    key replayed in a retried batch yields identical weights and the
    versioned fold stays idempotent.  Returns the started query."""
    from ..pipeline.sampling import poisson_bootstrap

    def build(b: DataFrame) -> DataFrame:
        return (poisson_bootstrap(b, units_col, key_col, reps)
                .select("rep", "n_eff", "sum_units"))

    def merge(prev: DataFrame, st: DataFrame) -> DataFrame:
        return (prev.unionByName(st)
                    .groupBy("rep")
                    .agg(F.sum("n_eff").alias("n_eff"),
                         F.sum("sum_units").alias("sum_units")))

    return _stream_fold(df, state_dir, checkpoint_dir,
                        build_fn=build, merge_fn=merge, keep=keep)
