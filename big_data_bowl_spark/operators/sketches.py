"""Count-min sketch: bounded-memory frequency estimation + exact heavy
hitters with a sketch prefilter.

The sketch is a d×w counter table built RELATIONALLY (explode each
occurrence to its d (row, bucket) cells, one map-side-combinable count
aggregate) — no driver state, no UDF; at any corpus size the table is at
most d·w rows, so it broadcasts.

The CMS guarantee (est ≥ true count, always) makes it a sound PREFILTER:
`cms_heavy_hitters` drops every occurrence whose estimate is below the
threshold BEFORE the exact count shuffle, so the long tail — the
overwhelming majority of a 100 TB token stream — never moves, and the
surviving candidates are counted exactly.  The final result is therefore
EXACT (overestimates only add candidates, which the exact count then
rejects), and carries a plain GROUP BY/HAVING oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import require_columns


def cms_build(df: DataFrame, col: str, w: int = 2048,
              d: int = 4) -> DataFrame:
    """Build the (row, bucket, cnt) counter table: each occurrence of
    ``col`` increments d counters at ``pmod(xxhash64(value, i), w)``.
    One explode (×d, constant) + one count aggregate — partial combine
    collapses each partition to ≤ d·w cells before the shuffle."""
    require_columns(df, [col], "cms_build")
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(w))
                  .alias("bucket"))
        for i in range(d)])
    # the state carries its (w, d) geometry, like the Bloom and quantile
    # states: bucket indices are only meaningful against the space they
    # were hashed into, so merge/estimate validate instead of silently
    # blending mismatched tables (which would break est ≥ true — the
    # property the heavy-hitter prefilter's EXACTNESS rests on)
    return (df.select(F.explode(cells).alias("c"))
              .select("c.row", "c.bucket")
              .groupBy("row", "bucket")
              .agg(F.count(F.lit(1)).alias("cnt"))
              .withColumn("cms_w", F.lit(w))
              .withColumn("cms_d", F.lit(d)))


def _cms_check_params(state: DataFrame, where: str,
                      w: int | None = None,
                      d: int | None = None) -> None:
    """Fail loud on heterogeneous or mismatched CMS geometry (one tiny
    job over the ≤ d·w-row table)."""
    combos = state.select("cms_w", "cms_d").distinct().collect()
    pairs = sorted((r["cms_w"], r["cms_d"]) for r in combos)
    if len(pairs) > 1:
        raise ValueError(
            f"{where}: mixed CMS geometries {pairs} cannot be merged — "
            "bucket spaces are incompatible")
    # Per-parameter check so a partially-specified geometry (w given,
    # d None or vice versa) validates the given half instead of always
    # raising a spurious full-tuple mismatch.
    if pairs and ((w is not None and pairs[0][0] != w)
                  or (d is not None and pairs[0][1] != d)):
        raise ValueError(
            f"{where}: sketch was built with (w, d)={pairs[0]}, caller "
            f"asked for {(w, d)} — probing the wrong bucket space would "
            "silently break the est ≥ true guarantee")


def with_cms_estimate(df: DataFrame, cms: DataFrame, col: str,
                      w: int = 2048, d: int = 4,
                      out: str = "cms_est") -> DataFrame:
    """Append the CMS frequency estimate of ``col`` to every row: d
    broadcast joins against the counter table (constant build side, zero
    shuffle of ``df``), estimate = least of the d counters.  A cell
    missing from the table means zero occurrences → estimate 0.  Fails
    loud if ``cms`` was built with a different (w, d) geometry."""
    require_columns(df, [col], "with_cms_estimate")
    require_columns(cms, ["row", "bucket", "cnt", "cms_w", "cms_d"],
                    "with_cms_estimate")
    # pin the ≤ d·w-row sketch ONCE: the geometry check plus the d
    # broadcast builds below are d+1 independent consumers that would
    # otherwise each re-execute the sketch build's full scan of the
    # fact table (same pin as with_bloom_maybe_seen)
    cms = cms.localCheckpoint(eager=True)
    _cms_check_params(cms, "with_cms_estimate", w, d)
    est = df
    cols = []
    for i in range(d):
        b = cms.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"__k{i}"), F.col("cnt").alias(f"__c{i}"))
        key = F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(w))
        est = (est.join(F.broadcast(b), key == F.col(f"__k{i}"), "left")
                  .drop(f"__k{i}"))
        cols.append(F.coalesce(F.col(f"__c{i}"), F.lit(0)))
    return est.withColumn(out, F.least(*cols)).drop(
        *[f"__c{i}" for i in range(d)])


def cms_heavy_hitters(df: DataFrame, col: str, min_count: int,
                      w: int = 2048, d: int = 4) -> DataFrame:
    """EXACT heavy hitters (values with true count ≥ ``min_count``) with
    a CMS prefilter: occurrences whose estimate is already below the
    threshold are dropped map-side (est ≥ true ⇒ no true heavy hitter is
    lost); only candidates reach the exact count shuffle, which then
    rejects the sketch's false positives.  Returns (value, n)."""
    cms = cms_build(df, col, w=w, d=d)
    candidates = (with_cms_estimate(df, cms, col, w=w, d=d)
                  .filter(F.col("cms_est") >= min_count))
    return (candidates.groupBy(F.col(col))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count))


def hll_sketches(df: DataFrame, group: list[str], col: str,
                 lgk: int = 12) -> DataFrame:
    """Per-group HLL sketch bytes (Apache DataSketches, built into Spark
    4) — the MERGEABLE distinct-count state an incremental pipeline
    persists: compute one sketch table per ingest batch/partition, store
    ~2^lgk bytes per group, and answer any later distinct-count rollup by
    unioning sketches instead of rescanning history.  Returns
    (*group, sketch binary)."""
    require_columns(df, [*group, col], "hll_sketches")
    return df.groupBy(*group).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"))


def hll_rollup_estimate(sketches: DataFrame, group: list[str],
                        out: str = "approx_distinct") -> DataFrame:
    """Merge persisted sketches up to a coarser grain and estimate:
    register-max union is order-insensitive and lossless across any
    partitioning of the inputs — union(per-day sketches) ≡ sketch(whole),
    the property `test_hll_union_equals_whole` pins.  Cost is
    O(groups · 2^lgk) bytes through the shuffle, independent of fact
    rows."""
    require_columns(sketches, [*group, "sketch"], "hll_rollup_estimate")
    return sketches.groupBy(*group).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch", F.lit(False))).alias(out))


HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
# Flajolet et al.'s bias constant for m = 256, precomputed ONCE in Python
# so both engines consume the identical double literal (SQL decimal
# arithmetic would produce a different constant)
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# est_raw = ALPHA * m^2 * 2^32 / S collapses to ONE division by the exact
# integer register sum S (registers are summed as 2^(32 - M[j]), exact in
# int64: <= 256 * 2^32 = 2^40)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * 4294967296.0


def hll_neutral(df: DataFrame, group: list[str],
                key_col: str) -> DataFrame:
    """Engine-neutral HyperLogLog (classic Flajolet estimator, explicit
    registers) — completes the sketch-tier verification trio
    (MinHash/SimHash/HLL): every step is explicit integer arithmetic, so
    a SQL oracle reproduces registers AND estimate bit-for-bit, unlike
    the DataSketches binary form (:func:`hll_sketches`), which stays the
    production path.

    Hash = the engine's int64-safe multiplicative family; register
    index = low 8 bits, rho = 1 + trailing zeros of the remaining 24-bit
    word (w & -w isolates the lowest set bit — an exact power of two, so
    log2 is exact IEEE); register contributions sum as EXACT integers
    2^(32−M[j]); the raw estimate is ONE double division; the linear-
    counting small-range branch conditions on that same value.  max() is
    idempotent, so the register table from a multiset equals the
    distinct-set sketch — no dedup shuffle needed, and the per-(group,
    register) max combines map-side.

    Returns (*group, n_exact, hll_estimate) — exact distinct included
    for error inspection.
    """
    require_columns(df, [*group, key_col], "hll_neutral")
    regs = hll_neutral_registers(df, group, key_col)
    est = hll_neutral_rollup(regs, group)
    exact = df.groupBy(*group).agg(
        F.countDistinct(key_col).alias("n_exact"))
    return (est.join(exact, group)
               .select(*group, "n_exact", "hll_estimate"))


def hll_neutral_registers(df: DataFrame, group: list[str],
                          key_col: str) -> DataFrame:
    """The engine-neutral HLL's persistable MERGEABLE STATE: one
    (register, rho) row per group per occupied register — what an
    incremental pipeline stores per ingest batch instead of raw keys.
    max() is associative and idempotent, so register tables from any
    partitioning of history merge losslessly (union ≡ whole).  Returns
    (*group, register, rho)."""
    require_columns(df, [*group, key_col], "hll_neutral_registers")
    # The multiplicative hash alone is NOT rho-safe (low bits leak the
    # key; measured 93% estimator error) — wang_mixed_hash adds the two
    # Wang finalizer rounds that fix it.
    from ..pipeline.sampling import wang_mixed_hash
    h = wang_mixed_hash(F.col(key_col))
    idx = (h % HLL_M).alias("register")
    w = F.floor(h / F.lit(HLL_M)).cast("long")
    rho = (F.when(w == 0, F.lit(HLL_P * 3 + 1))
            .otherwise(F.round(F.log2(w.bitwiseAND(-w))).cast("int") + 1)
           ).alias("rho")
    return (df.select(*group, idx, rho)
              .groupBy(*group, "register")
              .agg(F.max("rho").alias("rho")))


BLOOM_SEED_STEP = 1000003  # probe i hashes key + i·STEP through the wang chain


def bloom_neutral_state(df: DataFrame, group: list[str], key_col: str,
                        m_words: int = 256, k: int = 4) -> DataFrame:
    """Engine-neutral Bloom filter state — the third leg of the
    incremental ingest-gate trio (MinHash index / HLL registers / Bloom
    bits): a (word, bits) table per group, each key setting ``k`` bits
    at wang_mixed_hash(key + i·SEED_STEP) mod m_words·64.  bit_or is
    associative and idempotent, so per-batch states OR-merge losslessly
    (union ≡ whole — no dedup shuffle needed for multiset inputs, same
    argument as the HLL registers), and every step is explicit integer
    arithmetic, so a SQL engine reproduces the bit table exactly.  The
    xxhash64 form (operators/joins.bloom_build) stays the fastest batch
    path; this one is the PERSISTABLE state an incremental pipeline
    stores per ingest batch.  ≤ ``m_words`` rows per group.

    The state carries its (m_words, k) as columns: probe positions are
    only meaningful against the geometry they were computed with, so
    merge and gate VALIDATE the parameters instead of silently probing
    the wrong bit positions (which would break the no-false-negative
    guarantee with no error)."""
    require_columns(df, [*group, key_col], "bloom_neutral_state")
    from ..pipeline.sampling import wang_mixed_hash
    total_bits = m_words * 64
    probes = F.array(*[
        F.pmod(wang_mixed_hash(F.col(key_col)
                               + F.lit(i * BLOOM_SEED_STEP)),
               F.lit(total_bits))
        for i in range(k)])
    exploded = df.select(*group, F.explode(probes).alias("bit"))
    return (exploded
            .select(*group,
                    (F.col("bit") / 64).cast("long").alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pmod(bit, 64) AS INT))").alias("mask"))
            .groupBy(*group, "word")
            .agg(F.bit_or("mask").alias("bits"))
            .withColumn("bloom_m_words", F.lit(m_words))
            .withColumn("bloom_k", F.lit(k)))


def _bloom_check_params(state: DataFrame, where: str,
                        m_words: int | None = None,
                        k: int | None = None) -> None:
    """Fail loud on heterogeneous or mismatched Bloom geometry.  One
    tiny job over the ≤ m_words-row state — cheap next to the gate/merge
    it protects."""
    combos = state.select("bloom_m_words", "bloom_k").distinct().collect()
    pairs = sorted((r["bloom_m_words"], r["bloom_k"]) for r in combos)
    if len(pairs) > 1:
        raise ValueError(
            f"{where}: mixed Bloom geometries {pairs} cannot be "
            "combined — probe positions are incompatible")
    if pairs and ((m_words is not None and pairs[0][0] != m_words)
                  or (k is not None and pairs[0][1] != k)):
        raise ValueError(
            f"{where}: state was built with (m_words, k)={pairs[0]}, "
            f"caller asked for {(m_words, k)} — probing the wrong "
            "geometry would silently drop the no-false-negative "
            "guarantee")


def bloom_neutral_merge(states: DataFrame,
                        group: list[str]) -> DataFrame:
    """OR-merge persisted Bloom states up to ``group`` grain — map-side
    combinable, O(groups · m_words) rows regardless of history size.
    Fails loud if the inputs mix geometries."""
    require_columns(states, [*group, "word", "bits",
                             "bloom_m_words", "bloom_k"],
                    "bloom_neutral_merge")
    _bloom_check_params(states, "bloom_neutral_merge")
    return (states.groupBy(*group, "word",
                           "bloom_m_words", "bloom_k")
                  .agg(F.bit_or("bits").alias("bits")))


def with_bloom_maybe_seen(df: DataFrame, state: DataFrame, key_col: str,
                          m_words: int = 256, k: int = 4,
                          out: str = "maybe_seen") -> DataFrame:
    """Append the ingest-gate verdict: ``out`` is true iff ALL k probe
    bits of ``key_col`` are set in the (global-grain) ``state`` table.
    The ≤ m_words-row state collapses to ONE word→bits map row crossed
    in as a broadcast, so all k probes are in-row ``element_at``
    lookups — zero shuffle of ``df`` and a single broadcast build
    (r14: the previous form ran k SEPARATE broadcast LEFT joins, each
    embedding its own copy of the word-grain aggregation — 4
    BroadcastHashJoins and 4 duplicated agg subtrees in the plan for
    the same verdicts; a missing map key yields NULL exactly where the
    left join yielded a NULL build row, so the verdict expression is
    unchanged).  Bloom guarantee: a key the state has absorbed is
    NEVER flagged new (no false negatives); a "seen" verdict may be a
    false positive at the documented (1−e^{−kn/m})^k rate — the
    conservative direction for a dedup gate.  Fails loud if ``state``
    was built with a different (m_words, k) geometry."""
    require_columns(df, [key_col], "with_bloom_maybe_seen")
    require_columns(state, ["word", "bits", "bloom_m_words", "bloom_k"],
                    "with_bloom_maybe_seen")
    # pin the (≤ m_words-row) state ONCE: the map build below plus the
    # geometry check are 2 independent consumers, each of which would
    # otherwise re-execute whatever pipeline produced the state (at
    # 100 TB: repeated scans of the history aggregation)
    state = state.localCheckpoint(eager=True)
    _bloom_check_params(state, "with_bloom_maybe_seen", m_words, k)
    from ..pipeline.sampling import wang_mixed_hash
    total_bits = m_words * 64
    # collapse to word grain whatever grain the caller hands us (a
    # day-grain state passed directly would otherwise probe one of the
    # day rows instead of their union, silently weakening the gate);
    # bit_or over the finer grain IS the OR-merge, so this is the
    # defensive form of "gate against the union of the given states" —
    # then nest the whole table into one map row (≤ m_words entries,
    # ~2 KB at the defaults: the bounded-small-side broadcast pattern)
    word_map = (state.groupBy("word").agg(F.bit_or("bits").alias("bits"))
                     .groupBy()
                     .agg(F.map_from_entries(
                         F.collect_list(F.struct("word", "bits")))
                          .alias("__bloom_map")))
    got = df.crossJoin(F.broadcast(word_map))
    flags = []
    for i in range(k):
        h = F.pmod(wang_mixed_hash(F.col(key_col)
                                   + F.lit(i * BLOOM_SEED_STEP)),
                   F.lit(total_bits))
        word = (h / 64).cast("long")
        b = F.element_at(F.col("__bloom_map"), word)
        flags.append(
            F.when(b.isNull(), F.lit(False))
             .otherwise(F.bit_get(b, F.pmod(h, F.lit(64))) == 1))
    seen = flags[0]
    for fl in flags[1:]:
        seen = seen & fl
    return got.withColumn(out, seen).drop("__bloom_map")


def quantile_sketch_state(df: DataFrame, group: list[str], value_col: str,
                          key_col: str, k: int = 256) -> DataFrame:
    """Bottom-k-by-hash quantile sketch state (KMV-style uniform sample):
    per group, the ``k`` rows whose engine-neutral hash of ``key_col`` is
    smallest.  Because the hash is a fixed function of the row key, the
    sample is (a) DETERMINISTIC — independent of partitioning, engine, or
    run, so a SQL oracle reproduces it bit-for-bit, unlike
    ``percentile_approx``'s engine-specific sketch — and (b) MERGEABLE —
    bottom-k of a union equals bottom-k over the unioned bottom-k states,
    so per-batch states persist and roll up without rescanning history
    (same contract as the HLL register tables above).

    Exact quantiles of the sample estimate the group's with standard
    sampling error O(1/sqrt(k)) in rank.  The row_number-≤-k filter
    triggers Spark's WindowGroupLimit rewrite: each map task keeps only
    its local bottom-k BEFORE the exchange, so the shuffle carries
    O(partitions · k) rows per group, never the fact table
    (plan-pinned).  Returns (*group, key_col, qs_hash, value_col, qs_k)
    — the build k rides the state so a later merge can refuse to
    inflate it (see :func:`quantile_sketch_merge`).
    """
    require_columns(df, [*group, value_col, key_col],
                    "quantile_sketch_state")
    from ..pipeline.sampling import wang_mixed_hash
    # NULL keys: hash is NULL and Spark's asc sort is NULLS FIRST, so a
    # null-key row would hold a permanent rank-1 slot (the theta-state
    # lesson); a row without a sampling key cannot be sampled-by-key
    staged = (df.filter(F.col(key_col).isNotNull())
                .select(*group, key_col,
                        wang_mixed_hash(F.col(key_col)).alias("qs_hash"),
                        value_col))
    w = Window.partitionBy(*group).orderBy("qs_hash", key_col)
    return (staged.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= k).drop("__rn")
                  .withColumn("qs_k", F.lit(k)))


def quantile_sketch_merge(states: DataFrame, group: list[str],
                          value_col: str, key_col: str,
                          k: int = 256) -> DataFrame:
    """Merge persisted sketch states to a coarser grain: union the state
    rows (the caller unions / reads them) and re-take the bottom-k per
    output group.  min-k by a fixed hash is associative, and made
    idempotent here by an explicit key dedup first: OVERLAPPING state
    tables (a replayed batch, a state file unioned twice) would
    otherwise carry duplicate (key, hash) rows into the bottom-k,
    displacing distinct keys and silently shrinking the effective
    sample toward k/2 — min-k over a BAG is not idempotent the way the
    HLL max and Bloom bit_or genuinely are.  With the dedup,
    merge(any partitioning or replay of history) ≡ state(whole) —
    pinned by test_quantile_sketch_merge_equals_whole.  Input rows are
    already ≤ k per input group, so the merge shuffles
    O(input groups · k).

    ``k`` must not EXCEED the build k carried in the state: merging
    k=128 states with k=256 would claim a 256-row uniform sample whose
    tail only ever comes from small input groups — a silently biased
    sample.  Merging to a SMALLER k is always valid (bottom-k of
    bottom-k')."""
    require_columns(states, [*group, "qs_hash", key_col, value_col,
                             "qs_k"],
                    "quantile_sketch_merge")
    return _bottomk_merge(states, group, key_col, "qs_hash", "qs_k", k,
                          "quantile_sketch_merge")


def _bottomk_merge(states: DataFrame, group: list[str], key_col: str,
                   hash_col: str, k_col: str, k: int,
                   name: str) -> DataFrame:
    """The shared bottom-k-state merge contract (quantile and theta
    sketches): pin the tiny state, refuse to inflate past the carried
    build k, dedup keys for replay idempotence, re-take the bottom-k.
    One place for the contract — a fix to the guard or the dedup key
    set reaches every bottom-k state type."""
    states = states.localCheckpoint(eager=True)  # ≤ groups·k rows; the
    # guard collect below and the window pass would otherwise each
    # re-execute whatever pipeline produced the states
    build_ks = [r[k_col] for r in states.select(k_col)
                .distinct().collect()]
    if build_ks and k > min(build_ks):
        raise ValueError(
            f"{name}: k={k} exceeds the build "
            f"k={min(build_ks)} carried in the state — the merged "
            "sample would be biased toward small input groups")
    deduped = states.dropDuplicates([*group, key_col])
    w = Window.partitionBy(*group).orderBy(hash_col, key_col)
    return (deduped.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") <= k).drop("__rn")
                   .withColumn(k_col, F.lit(k)))


def quantile_sketch_estimate(state: DataFrame, group: list[str],
                             value_col: str,
                             quantiles: dict[str, float]) -> DataFrame:
    """Exact linear-interpolation percentiles OVER THE SAMPLE (named
    output column → q fraction), plus ``n_sample``.  Groups smaller than
    k are sampled whole, so their estimates are exact."""
    require_columns(state, [*group, value_col], "quantile_sketch_estimate")
    aggs = [F.round(F.percentile(value_col, F.lit(q)), 6).alias(name)
            for name, q in quantiles.items()]
    return state.groupBy(*group).agg(
        *aggs, F.count(F.lit(1)).alias("n_sample"))


def hll_neutral_rollup(regs: DataFrame, group: list[str]) -> DataFrame:
    """Merge persisted neutral-HLL register tables up to ``group`` grain
    (element-wise max — map-side combinable) and estimate.  The cost is
    O(groups · 256) rows regardless of history size — the 'never rescan'
    contract, with every arithmetic step engine-neutral.  Returns
    (*group, hll_estimate)."""
    require_columns(regs, [*group, "register", "rho"], "hll_neutral_rollup")
    merged = (regs.groupBy(*group, "register")
                  .agg(F.max("rho").alias("__m")))
    per = (merged.groupBy(*group)
                 .agg(F.sum(F.round(F.pow(F.lit(2.0), 32 - F.col("__m")))
                             .cast("long")).alias("__s_present"),
                      F.count(F.lit(1)).alias("__n_present")))
    zeros = F.lit(HLL_M) - F.col("__n_present")
    s_total = (F.col("__s_present")
               + zeros * F.lit(4294967296).cast("long"))
    est_raw = F.lit(HLL_NUM) / s_total.cast("double")
    est = F.when((est_raw <= 2.5 * HLL_M) & (zeros > 0),
                 F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M))
                                             / zeros.cast("double"))) \
           .otherwise(est_raw)
    return per.select(*group, F.round(est, 6).alias("hll_estimate"))


def theta_sketch_state(df: DataFrame, group: list[str], key_col: str,
                       k: int = 32) -> DataFrame:
    """Theta/KMV SET sketch state: per group, the ``k`` DISTINCT keys
    with the smallest engine-neutral hash — the sketch family whose set
    algebra supports DIRECT intersection estimates (the neutral HLL
    registers above only union; intersections via inclusion–exclusion
    compound error across terms).

    Same determinism/mergeability contract as
    :func:`quantile_sketch_state` (fixed hash of the key → partition-,
    engine-, and run-independent; bottom-k of unioned states = bottom-k
    of the union after key dedup), but over the DISTINCT key set, so the
    state is a uniform sample of the SET, not the bag.  The
    WindowGroupLimit rewrite keeps the pre-shuffle rows at
    O(partitions · k) per group.  Returns (*group, key, th_hash, th_k)."""
    require_columns(df, [*group, key_col], "theta_sketch_state")
    from ..pipeline.sampling import wang_mixed_hash
    # NULL keys must not enter the sample: wang_mixed_hash(NULL) is
    # NULL, Spark's ascending sort is NULLS FIRST (DuckDB's is NULLS
    # LAST), so a null key would take rank 1, displace a real member,
    # and shift the threshold — and it can never match an intersection
    # join anyway.  A null is "no member", not a member called null.
    distinct = (df.filter(F.col(key_col).isNotNull())
                  .select(*group, key_col).distinct())
    staged = distinct.withColumn("th_hash",
                                 wang_mixed_hash(F.col(key_col)))
    w = Window.partitionBy(*group).orderBy("th_hash", key_col)
    return (staged.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= k).drop("__rn")
                  .withColumn("th_k", F.lit(k)))


_THETA_RANGE = 1 << 32  # wang_mixed_hash range: [0, 2^32)


def _theta_summaries(state: DataFrame, group_col: str) -> DataFrame:
    """Per-group (n, cut, est): cut = the k-th smallest hash when the
    sketch is full (the theta threshold — every retained hash ≤ cut),
    else the full hash range (sampling probability 1); est = exact n in
    exact mode, else the KMV estimator (k−1)/(cut/2^32)."""
    summ = state.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("th_hash").alias("__mx"),
        F.max("th_k").alias("__k"))
    full = F.col("n") >= F.col("__k")
    cut = F.when(full, F.col("__mx")) \
           .otherwise(F.lit(_THETA_RANGE)).cast("long")
    est = F.when(full,
                 F.round((F.col("__k") - 1).cast("double")
                         * float(_THETA_RANGE)
                         / F.col("__mx").cast("double"), 6)) \
           .otherwise(F.col("n").cast("double"))
    return summ.select(group_col, "n", cut.alias("cut"),
                       est.alias("est"))


def theta_intersect_pairs(state: DataFrame, group_col: str,
                          key_col: str) -> DataFrame:
    """Pairwise set-overlap estimates from persisted theta states — the
    audience-intersection report, from sketches alone (the raw member
    sets never move; cost is O(groups²·k) on state rows):

    For groups A, B with thresholds cut_A, cut_B, every key both states
    retain with hash ≤ cut = min(cut_A, cut_B) is a uniform sample of
    A∩B at inclusion probability cut/2^32, so
    est_inter = m · 2^32 / cut — the standard theta-join estimator
    (exact when both sketches are under-full, since cut is then the
    full range and m the true intersection count).  Jaccard composes
    from the ROUNDED estimates, so both engines divide identical
    doubles.  Returns (item_a, item_b, m_sample, est_a, est_b,
    est_inter, est_jaccard)."""
    require_columns(state, [group_col, key_col, "th_hash", "th_k"],
                    "theta_intersect_pairs")
    state = state.localCheckpoint(eager=True)  # tiny (groups·k); feeds
    # the summaries AND both sides of the key self-join
    summ = _theta_summaries(state, group_col)
    pairs = (summ.select(F.col(group_col).alias("item_a"),
                         F.col("cut").alias("__ca"),
                         F.col("est").alias("est_a"))
                 .join(summ.select(F.col(group_col).alias("item_b"),
                                   F.col("cut").alias("__cb"),
                                   F.col("est").alias("est_b")))
                 .filter(F.col("item_a") < F.col("item_b"))
                 .withColumn("__cut", F.least("__ca", "__cb")))
    sa = state.select(F.col(group_col).alias("item_a"),
                      F.col(key_col).alias("__key"), "th_hash")
    sb = state.select(F.col(group_col).alias("item_b"),
                      F.col(key_col).alias("__key"))
    # one row per common KEY per pair (state keys are distinct in-group)
    common = (sa.join(sb, "__key")
                .filter(F.col("item_a") < F.col("item_b"))
                .select("item_a", "item_b", "th_hash"))
    m = (common.join(pairs.select("item_a", "item_b", "__cut"),
                     ["item_a", "item_b"])
               .filter(F.col("th_hash") <= F.col("__cut"))
               .groupBy("item_a", "item_b")
               .agg(F.count(F.lit(1)).alias("m_sample")))
    out = (pairs.join(m, ["item_a", "item_b"], "left")
                .withColumn("m_sample",
                            F.coalesce("m_sample", F.lit(0))))
    est_inter = F.round(F.col("m_sample").cast("double")
                        * float(_THETA_RANGE)
                        / F.col("__cut").cast("double"), 6)
    out = out.withColumn("est_inter", est_inter)
    denom = F.col("est_a") + F.col("est_b") - F.col("est_inter")
    return out.select(
        "item_a", "item_b", "m_sample", "est_a", "est_b", "est_inter",
        F.when(denom > 0, F.round(F.col("est_inter") / denom, 6))
         .otherwise(F.lit(0.0)).alias("est_jaccard"))


def theta_sketch_merge(states: DataFrame, group: list[str],
                       key_col: str, k: int = 32) -> DataFrame:
    """Merge persisted theta states to a coarser grain — the same
    contract as :func:`quantile_sketch_merge` (explicit key dedup for
    idempotence under replayed batches, bottom-k re-take, and the
    carried-k guard against inflating the claimed sample size), over
    the SET-sketch state.  merge(day states) ≡ state(whole period),
    pinned by the property test."""
    require_columns(states, [*group, key_col, "th_hash", "th_k"],
                    "theta_sketch_merge")
    return _bottomk_merge(states, group, key_col, "th_hash", "th_k", k,
                          "theta_sketch_merge")


def agms_sketch_build(df: DataFrame, col: str, w: int = 2048,
                      d: int = 3) -> DataFrame:
    """Engine-neutral AGMS (signed AMS) sketch over an INTEGER key
    column: d independent rows of w SIGNED counters,

        counter[i][b] = Σ_{rows with bucket(key)=b} sign(key)

    with bucket = wang_mixed_hash(key + i·1000003) mod w (the
    probe-offset family the neutral Bloom filter uses) and sign = ±1
    from the hash bit just above the bucket bits — every counter an
    exact integer any SQL engine reproduces.  Unlike count-min's
    nonnegative counters (a sound UPPER bound but loose once
    collisions dominate: the min-of-rows inner product measured 15×
    over the true join size at w=1024 on the sf0.01 order keys), the
    random signs make the inner product of two sketches an UNBIASED
    join-size estimator with variance ~F2(A)·F2(B)/w — tight at a
    fraction of the width.  ``w`` must be a power of two (the sign
    bit is bits[log2 w]).  Same one-explode/one-aggregate build shape
    and carried-geometry contract as :func:`cms_build`."""
    require_columns(df, [col], "agms_sketch_build")
    if w & (w - 1):
        raise ValueError(f"agms_sketch_build: w={w} must be a power "
                         "of two (the sign is the next hash bit)")
    from ..pipeline.sampling import wang_mixed_hash
    shift = w.bit_length() - 1
    # STAGE the d hash chains as named columns before the explode:
    # bucket and sign both read hv, and Spark's subexpression
    # elimination does not reach through the struct-array Generate —
    # inlining evaluated every chain twice and measured 6.4× slower at
    # sf0.1 (the minhash staged-column lesson, again)
    staged = df.select(*[
        wang_mixed_hash(F.col(col) + i * 1000003).alias(f"__h{i}")
        for i in range(d)])
    cells = [F.struct(
        F.lit(i).alias("row"),
        F.pmod(F.col(f"__h{i}"), F.lit(w)).alias("bucket"),
        (1 - 2 * F.shiftright(F.col(f"__h{i}"), shift)
              .bitwiseAND(F.lit(1))).alias("sign"))
        for i in range(d)]
    return (staged.select(F.explode(F.array(*cells)).alias("c"))
              .select("c.row", "c.bucket", "c.sign")
              .groupBy("row", "bucket")
              .agg(F.sum("sign").alias("cnt"))
              .withColumn("ams_w", F.lit(w))
              .withColumn("ams_d", F.lit(d)))


def agms_join_size_estimate(sk_a: DataFrame,
                            sk_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two AGMS sketches — the
    cost-based-planner primitive, without touching either fact table
    again: each hash row's signed inner product Σ_b A[i][b]·B[i][b] is
    an unbiased estimate of |A ⋈ B| (cross-key terms carry independent
    random signs and cancel in expectation); the MEDIAN over the d
    rows tames the variance.  d is pinned to 3 so the median is the
    exact integer identity sum − min − max (no float percentile of
    >2^53 integers).  Every term is an exact integer (DECIMAL(38,0)
    products); cost is a (row, bucket) equi-join of two ≤ d·w-row
    broadcastable tables.  Geometries must match and ride the state.
    Returns one row (est_join_size, ≥ 0)."""
    for side, name in ((sk_a, "sk_a"), (sk_b, "sk_b")):
        require_columns(side, ["row", "bucket", "cnt", "ams_w", "ams_d"],
                        f"agms_join_size_estimate[{name}]")
    sk_a = sk_a.localCheckpoint(eager=True)
    sk_b = sk_b.localCheckpoint(eager=True)
    geos = set()
    for side in (sk_a, sk_b):
        for r in side.select("ams_w", "ams_d").distinct().collect():
            geos.add((r["ams_w"], r["ams_d"]))
    if len(geos) > 1:
        raise ValueError(
            f"agms_join_size_estimate: geometry mismatch {sorted(geos)}"
            " — inner products across different bucket spaces are "
            "meaningless")
    if geos and next(iter(geos))[1] != 3:
        raise ValueError(
            "agms_join_size_estimate: d must be 3 (median = "
            "sum − min − max stays exact integer arithmetic)")
    dec = "decimal(38,0)"
    per_row = (sk_a.select("row", "bucket",
                           F.col("cnt").alias("__ca"))
                   .join(sk_b.select("row", "bucket",
                                     F.col("cnt").alias("__cb")),
                         ["row", "bucket"])
                   .groupBy("row")
                   .agg(F.sum(F.col("__ca").cast(dec)
                              * F.col("__cb").cast(dec)).alias("__s")))
    med = F.sum("__s") - F.min("__s") - F.max("__s")
    return per_row.agg(
        F.greatest(med, F.lit(0).cast(dec))
         .cast("long").alias("est_join_size"))
