"""Benchmark decontamination for training corpora.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM-style
n-gram rule): a training document is CONTAMINATED when it shares at least
``min_overlap`` distinct word n-grams with any document of an evaluation
benchmark.  Contaminated docs are flagged (and typically dropped) so eval
scores measure generalization, not memorized test data.

Scale shape (100 TB corpus, small benchmark):
- the benchmark side reduces to a DISTINCT n-gram-hash set — eval suites
  are tiny (10⁴–10⁶ grams), so this set BROADCASTS; the corpus is never
  shuffled for the membership probe.
- corpus n-grams are generated JVM-side (split → slice → array_join under
  ``transform``) from a STAGED token array (HOF lambdas are interpreted
  and not CSE'd — see SCALE.md), hashed to a long, and probed via a
  broadcast left join with a match marker.
- ONE shuffle total: the final per-doc count aggregate (map-side
  combinable).

No reference twin — the reference corpus tooling has no decontamination
step; semantics follow the published n-gram rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import roundn
from ..schemas import require_columns


def _ngram_hashes(df: DataFrame, id_col: str, text_col: str,
                  n: int) -> DataFrame:
    """Per-doc-distinct (id, ngram-hash) pairs: whitespace tokens →
    sliding word n-grams → xxhash64.  The token array is staged as a
    named column so the slice lambda reuses one split/filter pass; the
    explicit empty-array guard matters because ``sequence(1, 0)`` DESCENDS
    in Spark (it would yield starts [1, 0], not an empty list) whenever a
    doc has fewer than ``n`` tokens.

    Per-doc dedup happens IN-ROW via ``array_distinct`` before the
    explode — a ``.distinct()`` after exploding would shuffle the whole
    exploded corpus on (id, gram); this way the corpus side needs zero
    shuffles until the final count aggregate."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    staged = df.select(F.col(id_col), toks.alias("_tk"))
    starts = F.when(
        F.size("_tk") >= n,
        F.sequence(F.lit(1), F.size("_tk") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.array_distinct(F.transform(
        starts, lambda i: F.xxhash64(F.array_join(F.slice("_tk", i, n), " "))))
    return staged.select(F.col(id_col), F.explode(grams).alias("gh"))


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 3, min_overlap: int = 5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document contamination report against a benchmark set.

    Returns one row per corpus doc that shares ≥ ``min_overlap`` distinct
    word ``n``-grams with the union of benchmark docs:
    ``(doc_id, n_overlap, n_grams, overlap_frac)`` where ``overlap_frac``
    is the share of the doc's own distinct n-grams found in the benchmark
    (1.0 → the doc is effectively a benchmark excerpt).

    The benchmark's distinct n-gram set broadcasts; the corpus side sees
    one broadcast probe + one count shuffle — no corpus self-join, no
    shuffle keyed on n-grams.
    """
    require_columns(corpus, [id_col, text_col], "ngram_contamination")
    require_columns(benchmark, [text_col], "ngram_contamination")
    bench_grams = (_ngram_hashes(benchmark, id_col, text_col, n)
                   .select("gh").distinct()
                   .withColumn("__hit", F.lit(1)))
    doc_grams = _ngram_hashes(corpus, id_col, text_col, n)
    probed = doc_grams.join(F.broadcast(bench_grams), "gh", "left")
    return (probed.groupBy(id_col)
            .agg(F.count("__hit").alias("n_overlap"),
                 F.count(F.lit(1)).alias("n_grams"))
            .filter(F.col("n_overlap") >= min_overlap)
            .select(F.col(id_col), F.col("n_overlap"), F.col("n_grams"),
                    roundn(F.col("n_overlap") / F.col("n_grams"))
                    .alias("overlap_frac")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  n: int = 3, min_overlap: int = 5,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Drop contaminated docs from the corpus (anti-join against the
    contamination report — broadcast-sized in practice: contaminated ids
    are a tiny fraction of the corpus)."""
    flagged = ngram_contamination(corpus, benchmark, n, min_overlap,
                                  id_col, text_col).select(id_col)
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
