"""Near-duplicate diff analysis — WHAT changed between candidate pairs.

The dedup tier answers "which documents are near-dups"; curation then
wants the edit structure (boilerplate swap? one inserted paragraph?
template with changed entities?).  Token-level opcodes from Python's
``difflib.SequenceMatcher`` are the right tool and are NOT expressible
in relational SQL (the matching-block algorithm is stateful and
greedy), so this is the engine's Python UDTF seam — the Spark 4 API
generation alongside the custom DataSource (sources/synthetic.py) and
applyInPandasWithState (streaming/stream_ops.py).  Arrow-batched,
one UDTF row per opcode, driven through a LATERAL join.

Scale shape: the UDTF runs per CANDIDATE PAIR, and candidates come from
the dedup tier's bounded generators (probe buckets, LSH bands,
prefixes) — Python cost is proportional to the pair count, never the
corpus.  Deterministic (SequenceMatcher has no randomness), so results
are rows-only at the driver but pinned exactly by unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..schemas import require_columns

DIFF_SCHEMA = ("op string, a_start int, a_span int, b_start int, "
               "b_span int")


@udtf(returnType=DIFF_SCHEMA)
class DiffOpcodesUDTF:
    """Token-level difflib opcodes between two texts: one output row per
    opcode (equal / replace / delete / insert) with token start/span on
    each side.  ``autojunk=False`` keeps behavior deterministic on
    repetitive corpora (the popularity heuristic would otherwise drop
    frequent tokens from matching)."""

    def eval(self, a: str, b: str):  # noqa: D102 — UDTF contract
        import difflib

        at = (a or "").split()
        bt = (b or "").split()
        sm = difflib.SequenceMatcher(a=at, b=bt, autojunk=False)
        for tag, i1, i2, j1, j2 in sm.get_opcodes():
            yield (tag, i1, i2 - i1, j1, j2 - j1)


def diff_opcodes(pairs: DataFrame, left_text: str = "text_a",
                 right_text: str = "text_b") -> DataFrame:
    """Explode each pair row into its token-level diff opcodes (LATERAL
    UDTF join); all pair columns are carried through."""
    require_columns(pairs, [left_text, right_text], "diff_opcodes")
    spark = pairs.sparkSession
    spark.udtf.register("__diff_opcodes_udtf", DiffOpcodesUDTF)
    pairs.createOrReplaceTempView("__diff_pairs_in")
    return spark.sql(
        f"SELECT p.*, d.* FROM __diff_pairs_in p, "
        f"LATERAL __diff_opcodes_udtf(p.{left_text}, p.{right_text}) d")


def diff_summary(pairs: DataFrame, id_a: str = "doc_a",
                 id_b: str = "doc_b", left_text: str = "text_a",
                 right_text: str = "text_b") -> DataFrame:
    """Per-pair edit-structure summary from the opcode rows: matched /
    inserted / deleted / replaced token counts and the difflib ratio
    ``2·matched / (|a|+|b|)`` — the curation-facing rollup ("these dups
    differ by one inserted boilerplate block")."""
    require_columns(pairs, [id_a, id_b, left_text, right_text],
                    "diff_summary")
    ops = diff_opcodes(pairs, left_text, right_text)
    eq = F.sum(F.when(F.col("op") == "equal", F.col("a_span"))
                .otherwise(0)).cast("long")
    return (ops.groupBy(id_a, id_b)
            .agg(F.count(F.lit(1)).cast("long").alias("n_ops"),
                 eq.alias("tokens_equal"),
                 F.sum(F.when(F.col("op") == "insert", F.col("b_span"))
                        .otherwise(0)).cast("long")
                  .alias("tokens_inserted"),
                 F.sum(F.when(F.col("op") == "delete", F.col("a_span"))
                        .otherwise(0)).cast("long")
                  .alias("tokens_deleted"),
                 F.sum(F.when(F.col("op") == "replace", F.col("a_span"))
                        .otherwise(0)).cast("long")
                  .alias("tokens_replaced_a"),
                 F.sum("a_span").cast("long").alias("len_a"),
                 F.sum("b_span").cast("long").alias("len_b"))
            .withColumn("similarity",
                        F.round(2.0 * F.col("tokens_equal")
                                / (F.col("len_a") + F.col("len_b")), 6)))
