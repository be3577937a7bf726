"""Join operators (SURVEY §2.3, J1–J10).

Design rules for 100 TB:
- play/user-level dimensions are small → ``broadcast()`` them explicitly so
  the fact side never shuffles (the reference's supp table is 18K rows; our
  per-group aggregates are similar).
- the within-group cross join (J6/J7) is the only quadratic operator: it is
  an equi-join on the group keys whose per-key fan-out is bounded (≤22×22
  players per frame in the reference), so it scales linearly in groups.  A
  cardinality guard documents the bound instead of a custom strategy
  (SURVEY §4.3 item 3).
- J8's row-at-a-time Python nested loop ("This may take a minute...",
  BDB_2026.ipynb#cell69) is *banned*: per-frame nearest-neighbor is the same
  J6 equi-join keyed one level deeper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns


def semi_join_on(df: DataFrame, keys_df: DataFrame, keys: list[str]) -> DataFrame:
    """J3: left-semi join — the idiomatic form of the reference's
    dedup-key-table-then-inner-merge emulation
    (preprocess.py:302-327 filter_to_completed_catches).  No payload columns
    cross the wire and the probe side never duplicates rows."""
    return df.join(F.broadcast(keys_df.select(keys).distinct()), keys, "left_semi")


def enrich_left(df: DataFrame, dim: DataFrame, keys: list[str],
                fill: dict[str, float] | None = None,
                broadcast_dim: bool = True) -> DataFrame:
    """J4: left enrichment join + fill (merge_route_embeddings,
    preprocess.py:206-255: left merge then fillna(0) on embedding cols).
    Dimension side broadcast by default — play/player-level tables are tiny
    relative to frame-level facts."""
    d = F.broadcast(dim) if broadcast_dim else dim
    out = df.join(d, keys, "left")
    return out.na.fill(fill) if fill else out


def nearest_in_group(left: DataFrame, right: DataFrame, group: list[str],
                     left_id: str, distance: Column,
                     out: str = "min_dist", default: float | None = None,
                     right_cols: list[str] | None = None,
                     max_group: int | None = None) -> DataFrame:
    """J6/J7/J8-as-join: within-group cross product → distance → min per
    left entity (compute_catch_separation, preprocess.py:441-513).

    ``left × right`` on the group keys gives every pair per group; the
    aggregate keeps the nearest.  ``default`` fills groups with no right
    rows (the notebook's 20.0-when-no-defenders, #cell69) via the left join
    on the original left rows — the set-based replacement for J8.

    The map-side combine of the min() aggregation means the shuffle carries
    one row per (group, left_id) per input partition, not the full pair
    fan-out.

    ``max_group`` arms the SURVEY §4.3 item-3 cardinality guard IN-PLAN:
    the pair count per (group, left_id) equals the right-side group size,
    so an ``assert_true`` on the same aggregate fails the job loudly the
    moment any group exceeds the documented bound — zero extra passes
    (unlike the eager ``checks.check_group_cardinality``, which costs its
    own scan and suits pipeline entry points).
    """
    require_columns(left, group + [left_id], "nearest_in_group")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in group]
    pairs = (left.alias("l")
             .join(right.select(*group, *rcols).alias("r"), group, "inner")
             .withColumn("__dist", distance))
    mins = (pairs.groupBy(*[F.col(c) for c in group], F.col(f"l.{left_id}"))
                 .agg(F.min("__dist").alias(out),
                      F.count(F.lit(1)).alias("__n_pairs")))
    if max_group is not None:
        # assert_true yields NULL when the predicate holds and raises at
        # execution when it doesn't; expressing the guard as a filter keeps
        # it in the plan (a dropped column would be pruned away).
        mins = mins.filter(F.assert_true(
            F.col("__n_pairs") <= max_group,
            F.concat(F.lit(f"nearest_in_group: group exceeds max_group="
                           f"{max_group} (got "),
                     F.col("__n_pairs"), F.lit(" right rows))"))).isNull())
    mins = mins.drop("__n_pairs")
    base = left.select(*group, left_id).distinct()
    res = base.join(mins, group + [left_id], "left")
    if default is not None:
        res = res.withColumn(out, F.coalesce(F.col(out), F.lit(default)))
    return res


def attach_labels(df: DataFrame, labels: DataFrame, keys: list[str],
                  how: str = "inner", expect_rows: bool = True) -> DataFrame:
    """J1/J2: exact-key label attachment (attach_output_labels,
    preprocess.py:516-563).  Keeps the reference's 0-row fail-loud check
    (preprocess.py:547-549) as a data-quality guard — an empty inner join
    almost always means a key-type mismatch."""
    out = df.join(labels, keys, how)
    if expect_rows and how == "inner" and out.isEmpty():
        raise ValueError(f"attach_labels: 0-row inner join on {keys} — "
                         "check join keys/dtypes")
    return out


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prune (beyond ref — the 100 TB shuffle-avoidance
# pattern for key sets too big to broadcast whole)
# ---------------------------------------------------------------------------

def bloom_build(keys_df: DataFrame, key_col: str,
                m_words: int = 1024, k: int = 4) -> DataFrame:
    """Relational Bloom filter over a key set: an (word, bits) table of at
    most ``m_words`` rows covering ``m_words·64`` bits, built with one
    map-side-combinable ``bit_or`` aggregate — no driver collect, no UDF.

    Each key sets ``k`` bits derived from ``xxhash64(key, i)``; the word
    index and in-word mask are pure integer exprs.  The result is tiny
    (8 KiB of bits at the default) regardless of key-set size — that is
    the point: a 10⁹-row key set that could never broadcast as a hash
    relation still broadcasts as a Bloom table.
    """
    require_columns(keys_df, [key_col], "bloom_build")
    total_bits = m_words * 64
    probes = F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(total_bits))
        for i in range(k)])
    exploded = keys_df.select(F.explode(probes).alias("bit"))
    # shiftleft's bit-count arg must be a literal in the DataFrame API —
    # the variable shift goes through the SQL expression instead
    return (exploded
            .select((F.col("bit") / 64).cast("long").alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pmod(bit, 64) AS INT))").alias("mask"))
            .groupBy("word")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_semi_join(fact: DataFrame, keys_df: DataFrame, key_col: str,
                    m_words: int = 1024, k: int = 4) -> DataFrame:
    """Exact semi-join with a Bloom prefilter: the fact side is pruned by
    ``k`` BROADCAST joins against the (word, bits) table — constant-size
    build side, zero fact shuffle, no row fan-out — and only survivors
    (true matches + the ~(1−e^{−kn/m})^k false positives) reach the real
    semi-join.  Result is EXACT: false positives are removed by the final
    join, false negatives are impossible.

    At 100 TB this turns "shuffle every fact row to discover most match
    nothing" into "shuffle only plausible rows"; Spark's own runtime
    filters apply the same idea, but only when statistics trigger them —
    this operator is the explicit, always-on form.
    """
    require_columns(fact, [key_col], "bloom_semi_join")
    bloom = bloom_build(keys_df, key_col, m_words=m_words, k=k)
    total_bits = m_words * 64
    pruned = fact
    for i in range(k):
        h = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(total_bits))
        word = (h / 64).cast("long")
        b = bloom.select(F.col("word").alias(f"__w{i}"),
                         F.col("bits").alias(f"__b{i}"))
        # a fact word with no bloom row has no bits set → the inner join
        # itself is the reject; set bits are probed with bit_get (variable
        # positions are fine there, unlike shiftleft)
        pruned = (pruned.join(F.broadcast(b),
                              word == F.col(f"__w{i}"), "inner")
                        .filter(F.bit_get(F.col(f"__b{i}"),
                                          F.pmod(h, F.lit(64))) == 1)
                        .drop(f"__w{i}", f"__b{i}"))
    return pruned.join(keys_df.select(key_col).distinct(), key_col,
                       "left_semi")
