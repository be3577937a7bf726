"""Distributed BPE (byte-pair-encoding) merge learning.

The tokenizer-training loop every pretraining stack runs, expressed as
iterative DataFrame aggregation — no driver-side corpus pass, ever:

1. The corpus collapses to a WORD-FREQUENCY table (explode → count): BPE
   statistics only depend on (distinct word, count), which is orders of
   magnitude smaller than the corpus and is the classic training input
   (Sennrich et al. 2016's learn_bpe operates on exactly this table).
2. Each round counts adjacent symbol pairs weighted by word count (one
   map-side-combinable aggregation), picks the argmax pair (count desc,
   pair asc — deterministic tie-break; ONE row to the driver, it is the
   merge decision, not data), and applies the merge to the symbol arrays
   with a greedy left-to-right array fold.
3. ``localCheckpoint`` per round caps lineage depth at O(1), the same
   discipline as the connected-components and Lloyd loops.

Scale shape: the per-round shuffle is on the pair key of the WORD table
(|vocab| rows), not the corpus; rounds are sequential by nature (each
merge depends on the last) — exactly how the reference algorithm is
defined, so the loop count (n_merges) is the only serial dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from ..schemas import require_columns


def _chars(col):
    """Split a word into single-character symbols.  '(?!^)' splits at
    every boundary except the start; Spark's split keeps TRAILING empties
    (java limit=-1 semantics) because the lookahead also matches at the
    end-of-string boundary — filter them out."""
    return F.filter(F.split(col, r"(?!^)"), lambda s: s != "")


def _adjacent_pairs(sym_col):
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol
    words)."""
    return F.when(
        F.size(sym_col) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(sym_col) - 2),
                    lambda i: F.struct(
                        F.element_at(sym_col, i + 1).alias("l"),
                        F.element_at(sym_col, i + 2).alias("r")))) \
        .otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _apply_merge(sym_col, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — the exact BPE application rule ("a a a" with merge (a,a)
    becomes ["aa","a"], not ["a","aa"]): an array fold whose accumulator
    is the partially-merged prefix."""
    merged = left + right
    return F.aggregate(
        sym_col, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left) & (s == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))))
         .otherwise(F.concat(acc, F.array(s))))


def word_frequencies(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — one explode + one combinable agg."""
    require_columns(df, [id_col, text_col], "word_frequencies")
    return (df.select(F.explode(F.filter(F.split(F.col(text_col), " "),
                                         lambda t: t != "")).alias("word"))
              .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def bpe_learn_merges(df: DataFrame, n_merges: int = 10,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns a small
    DataFrame (rank, left, right, merged, pair_count) in merge order —
    deterministic for a fixed corpus (tie-break: count desc, then pair
    lexicographic)."""
    spark = df.sparkSession
    words = (word_frequencies(df, id_col, text_col)
             .select(_chars(F.col("word")).alias("syms"), "cnt")
             .localCheckpoint())
    merges: list[Row] = []
    for rank in range(n_merges):
        top = (words.select(F.explode(_adjacent_pairs(F.col("syms")))
                            .alias("p"), "cnt")
                    .groupBy("p").agg(F.sum("cnt").alias("pair_count"))
                    .orderBy(F.desc("pair_count"), F.asc("p.l"), F.asc("p.r"))
                    .limit(1).collect())
        if not top or top[0].pair_count == 0:
            break
        left, right = top[0].p.l, top[0].p.r
        merges.append(Row(rank=rank, left=left, right=right,
                          merged=left + right,
                          pair_count=int(top[0].pair_count)))
        words = (words.select(_apply_merge(F.col("syms"), left, right)
                              .alias("syms"), "cnt")
                      .localCheckpoint())
    if not merges:
        return spark.createDataFrame(
            [], "rank long, left string, right string, merged string, "
                "pair_count long")
    return spark.createDataFrame(merges)


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Apply learned merges (in order) to every document and count the
    resulting BPE pieces — the distributed ENCODE side.  Each merge is one
    more fold over the staged per-word symbol arrays; whole-document work
    stays JVM-side.  Returns (doc_id, n_pieces)."""
    require_columns(df, [id_col, text_col], "bpe_segment")
    out = df.select(
        F.col(id_col),
        F.transform(F.filter(F.split(F.col(text_col), " "),
                             lambda t: t != ""),
                    lambda w: _chars(w)).alias("__wsyms"))
    for left, right in merges:
        # stage each round as its own projection so the (interpreted)
        # folds never nest — the HOF-CSE rule from SCALE.md
        out = out.select(
            F.col(id_col),
            F.transform("__wsyms",
                        lambda syms: _apply_merge(syms, left, right))
             .alias("__wsyms"))
    return out.select(
        F.col(id_col),
        F.aggregate("__wsyms", F.lit(0).cast("long"),
                    lambda acc, syms: acc + F.size(syms)).alias("n_pieces"))
