"""Measured-quality gates for the probabilistic/approximate operators
(r9, VERDICT item 6): "approximate" must carry a NUMBER.  Each test runs
at sf0.1 (the bench SF — sf0.001 buckets are too empty to measure
anything) against the exact brute-force twin and asserts the measured
recall/error with honest floors below the recorded values (SCALE.md
"Measured approximate-operator quality" records the exact measurements).

The four targets are exactly the rows-only queries the r8 verdict
called out: q_lsh_topk, q_ivf_topk, q_approx_quantiles, q_near_dup_diff.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl_spark.sources.io import read_table

SF_BENCH = "/root/testdata/sf0.1"


def test_lsh_topk_recall_sf01(spark):
    """Multi-table hyperplane LSH recall@3 vs exact cosine top-3 at
    sf0.1, measured over 50 query ids (150 neighbor pairs — the r9
    5-query sample moved 0.067 per flipped neighbor; 50 queries bring
    that to 0.007): 6-plane x 16-table default measures 0.620.  Floor
    0.52 (within 0.1 of the measurement) leaves room for testdata
    regeneration noise; the construction is deterministic, so today's
    value is exact.  The tables/planes trade at this SF (SCALE.md r10):
    equal-candidate-cost 7x24 measures 0.593 — reshaping does NOT lift
    recall on weakly-structured data; >0.7 costs real candidates
    (6x24 = 0.740 at 1.5x, 6x32 = 0.793 at 2x), and spending those
    candidates on MORE TABLES beats WIDER BUCKETS (5x16, also 2x cost,
    only 0.707)."""
    from big_data_bowl_spark.pipeline.similarity import (
        cosine_topk,
        lsh_bucketed_topk,
    )

    em = read_table(spark, SF_BENCH, "embeddings")
    qids = list(range(50))
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(em, qids, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in lsh_bucketed_topk(em, qids, k=3).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.52, f"LSH recall@3 fell to {recall:.3f}"


def test_ivf_topk_recall_sf01(spark):
    """IVF DEFAULT (16 cells, nprobe=6) recall@3 vs exact cosine top-3
    at sf0.1 over 50 query ids: measured 0.800 probing 37.5% of the
    cells (r11 frontier sweep, scripts/measure_ivf_recall.py — at equal
    candidate fraction the finer quantizer beats the old 8-cell default:
    16/4 = 0.680 vs 8/2 = 0.620 at 25%, 16/6 = 0.800 vs 8/3 = 0.740 at
    37.5%; full table in ivf_topk's docstring and SCALE.md).  Floor
    0.70 (within 0.1 of the measurement — the construction is
    deterministic, so today's value is exact); full probe ≡ brute force
    is pinned separately by test_ivf_full_probe_equals_brute_force."""
    from big_data_bowl_spark.pipeline.similarity import cosine_topk, ivf_topk

    em = read_table(spark, SF_BENCH, "embeddings")
    qids = list(range(50))
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(em, qids, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_topk(em, qids, k=3).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.70, f"IVF recall@3 fell to {recall:.3f}"


def test_approx_quantiles_rank_error_sf01(spark):
    """percentile_approx(acc=1000) vs the exact per-group quantile at
    sf0.1: every approximate percentile must sit within the documented
    rank-error bound (rank distance <= n/acc + 1) inside its group's
    sorted values — the contract that makes the sketch usable as the
    100 TB scale path for A14."""
    e = read_table(spark, SF_BENCH, "events").filter(
        F.col("value").isNotNull())
    acc = 1000
    approx = {r["event_type"]: (r["p50"], r["p90"], r["p99"])
              for r in (e.groupBy("event_type")
                         .agg(F.percentile_approx("value", 0.5, acc)
                               .alias("p50"),
                              F.percentile_approx("value", 0.9, acc)
                               .alias("p90"),
                              F.percentile_approx("value", 0.99, acc)
                               .alias("p99"))).collect()}
    by_type = {r["event_type"]: sorted(r["vals"])
               for r in (e.groupBy("event_type")
                          .agg(F.collect_list("value").alias("vals"))
                        ).collect()}
    import bisect
    for et, vals in by_type.items():
        n = len(vals)
        tol = n / acc + 1
        for q, got in zip((0.5, 0.9, 0.99), approx[et]):
            # rank window of the returned value within the sorted group
            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = q * n
            err = min(abs(lo - target), abs(hi - target))
            assert err <= tol, (et, q, got, err, tol)


def test_jaccard_pairs_exact_recall_sf01(spark):
    """The candidate generator under q_near_dup_diff
    (ngram_jaccard_pairs: probes doc_id%50==0, same-source bucket,
    token Jaccard >= 0.5) is EXACT for its stated semantics — an
    independent Python brute force over the same probe/bucket scope at
    sf0.1 must reproduce the pair set bit-for-bit (recall AND precision
    1.0).  This is the missing number for q_near_dup_diff: the difflib
    roll-up is rows-only at the driver, but its input pair set is fully
    verified."""
    from big_data_bowl_spark.pipeline.dedup import ngram_jaccard_pairs

    d = read_table(spark, SF_BENCH, "documents")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(d, threshold=0.5).collect()}

    rows = d.select("doc_id", "source", "text").collect()
    toks = {r["doc_id"]: set(t for t in r["text"].split(" ") if t)
            for r in rows}
    src = {r["doc_id"]: r["source"] for r in rows}
    want = {}
    for a in toks:
        if a % 50 != 0:
            continue
        for b in toks:
            if b == a or src[b] != src[a]:
                continue
            inter = len(toks[a] & toks[b])
            if not inter:
                continue
            j = round(inter / (len(toks[a]) + len(toks[b]) - inter), 6)
            if j >= 0.5:
                want[(a, b)] = j
    assert got == want, (len(got), len(want))


def test_near_dup_diff_summary_exact_sf01(spark):
    """r12 (VERDICT item 5): q_near_dup_diff's VALUES, not just its
    candidate set, measured exact at the bench SF.  The candidate
    generator is pinned bit-for-bit above; this recomputes the difflib
    roll-up for EVERY pair the query emits at sf0.1 (16,756 pairs)
    with an independent driver-side SequenceMatcher pass and asserts
    all seven summary fields match exactly — the UDTF seam (Arrow
    batching, LATERAL join, per-pair grouping) is what's actually
    under test, since the oracle harness can't express difflib in
    SQL.  SequenceMatcher is deterministic, so exactness (not a
    floor) is the right assertion."""
    import difflib
    from decimal import ROUND_HALF_UP, Decimal

    from big_data_bowl_spark.queries import QUERIES

    got = {(r["doc_a"], r["doc_b"]): r
           for r in QUERIES["q_near_dup_diff"](
               spark, SF_BENCH).collect()}
    assert len(got) > 10_000  # the sf0.1 candidate volume

    texts = {r["doc_id"]: r["text"]
             for r in read_table(spark, SF_BENCH, "documents")
             .select("doc_id", "text").collect()}
    for (a, b), row in got.items():
        at, bt = texts[a].split(), texts[b].split()
        sm = difflib.SequenceMatcher(a=at, b=bt, autojunk=False)
        ops = sm.get_opcodes()
        eq = sum(i2 - i1 for t, i1, i2, _, _ in ops if t == "equal")
        ins = sum(j2 - j1 for t, _, _, j1, j2 in ops if t == "insert")
        dele = sum(i2 - i1 for t, i1, i2, _, _ in ops if t == "delete")
        rep = sum(i2 - i1 for t, i1, i2, _, _ in ops if t == "replace")
        sim = float(Decimal(repr(2.0 * eq / (len(at) + len(bt))))
                    .quantize(Decimal("0.000001"),
                              rounding=ROUND_HALF_UP))
        expect = (len(ops), eq, ins, dele, rep, len(at), len(bt), sim)
        actual = (row["n_ops"], row["tokens_equal"],
                  row["tokens_inserted"], row["tokens_deleted"],
                  row["tokens_replaced_a"], row["len_a"], row["len_b"],
                  row["similarity"])
        assert actual == expect, (a, b, actual, expect)
