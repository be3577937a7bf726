"""Regenerate PLANS.md: the formatted physical plans of the flagship /
heaviest queries at sf0.01, with a short audit note per plan.  Run after
plan-affecting changes; the output is committed so plan regressions show
up in diffs (the `.explain("formatted")` discipline, SURVEY §4).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"

# query -> what to look for in the plan (the audit contract)
AUDITED: dict[str, str] = {
    "q_flagship_truespeed": (
        "One window exchange (user key) feeds lag-diff; dimension joins "
        "broadcast; rank runs on the post-aggregation board."),
    "q_tpch_q21": (
        "EXISTS/NOT-EXISTS lowered to one per-(order,supplier) pre-agg + "
        "per-order rollup; no Expand, no correlated re-scans."),
    "q_phase3_pipeline": (
        "Four notebook stages as ONE plan: all enrichment joins broadcast, "
        "threshold is a 1-row broadcast crossJoin, single rank window."),
    "q_pq_topk": (
        "ADC search: corpus side scans CODES only (no embedding column), "
        "scoring is map-only via 1-row broadcasts; first exchange is the "
        "top-k shard window."),
    "q_merge_upsert": (
        "MERGE as a single full-outer key join (shuffle/sort-merge, never "
        "nested-loop); bucketed bases would arrive exchange-free."),
    "q_bm25_rank": (
        "Query-term filter sits below the first aggregate; df table and "
        "corpus stats come back as broadcasts; one TakeOrdered top-k."),
    "q_training_prep": (
        "Quality + language + truth columns fused into one projection "
        "over the deduped docs — one shuffle (dedup window), zero joins."),
    "q_funnel_stages": (
        "One hash-agg shuffle collects per-entity arrays; the stage fold "
        "is in-row (no per-step join chain)."),
    "q_rank_distributed": (
        "Range exchange on the score, per-partition rank, broadcast "
        "offset join — no empty-partition window anywhere."),
    "q_pit_join": (
        "SCD2 lookup as the linear union+carry-forward window — no "
        "interval theta-join / nested loop."),
    "q_corpus_release": (
        "Normalize → dedup → gates → temperature mix → report as ONE "
        "plan: dedup window + per-source counts + report aggregate are "
        "the only exchanges; rates arrive as a broadcast."),
    "q_initial_separation": (
        "Argmax-frame window filter feeds the within-play offense×defense "
        "equi-join; min+count map-side combine, then the left join-back — "
        "no cartesian, fan-out bounded by players-per-play."),
    "q_defender_sep_frame": (
        "Per-frame variant: the SAME equi-join keyed one level deeper "
        "(play, frame) — the reference's Python nested loop as one "
        "shuffle; 20.0 default via left-join coalesce."),
    "q_unigram_scores": (
        "Vocabulary log-prob table shuffle-joins onto the tokens (never "
        "broadcast — vocab is corpus-scale); the only broadcast is the "
        "1-row corpus total; integer micro-unit sums."),
    "q_pagerank": (
        "One iteration = ONE shuffle join edges⋈ranks on src + one "
        "aggregate on dst; outdeg is folded into the ranks relation (no "
        "second join per round); the only broadcast is the 1-row "
        "dangling-mass scalar — never a node-grain table; localCheckpoint "
        "per round keeps plan depth O(1)."),
    "q_fuzzy_join": (
        "Deletion variants explode map-side and join on their xxhash64 "
        "(8-byte shuffle keys); candidates dedup once, then two id-joins "
        "attach names for in-row levenshtein verification — no gram "
        "statistics, no cross join, no broadcast of corpus-grain tables."),
    "q_ivm_refresh": (
        "Three batch scans aggregate into group-grain states (partial, "
        "map-side combinable), one union + merge aggregate, finalize is "
        "a projection — refresh reads deltas, never re-reads the base."),
    "q_cdc_chunks": (
        "In-row after ONE round-robin fan-out of the narrow (id, text) "
        "projection (r14): staged token + token-hash arrays, window-fold "
        "cut positions, one posexplode — no KEY exchange anywhere; "
        "boundaries are local so the op is embarrassingly parallel at "
        "any scale."),
    "q_grid_nearest": (
        "TWO-LEVEL since r8 (sf1.0 stress fix): fine pass at radius/8 "
        "resolves points whose best candidate sits within the fine "
        "width (exact by the L∞ block bound — candidate volume ÷29 in "
        "dense data); only the sparse residue escalates to the coarse "
        "radius-width level.  Both levels: probes replicate 9× on cell "
        "offsets and equi-join the cell key — never a cross join; the "
        "only windows are the per-probe argmins."),
    "q_pca_embed": (
        "ZERO exchanges in the projection plan: the d-grain moment row "
        "aggregates in its own map-combinable job, the power loop runs "
        "driver-side on 36 scalars, and the scoring pass is a map-only "
        "projection with literal loadings."),
    "q_lloyd_kmeans": (
        "Per round: the codebook nests into ONE broadcast row and "
        "assignment is a map-only in-row argmin (zero exchanges — r5); "
        "the only shuffle is the (label, dim) exploded aggregation with "
        "map-side combine; localCheckpoint keeps plan depth O(1) in "
        "rounds."),
    "q_simhash": (
        "Band-bucket equi-join only (AQE may broadcast one side at "
        "small SF — a statistics decision, not a hint); pair dedup "
        "carries (2 ids + 2 fingerprints) per row, and the Hamming "
        "filter is one codegen bit_count(xor)."),
    "q_hll_incremental": (
        "Day-grain register state persists once and feeds BOTH the "
        "max-merge rollup and the batch count — the fact table scans "
        "exactly once; register merge partial-aggregates map-side."),
    "q_quantile_sketch": (
        "Partial WindowGroupLimit below each exchange: every map task "
        "keeps its local bottom-k, so the shuffle carries "
        "O(partitions*k) rows per group; the estimate is one hash-agg "
        "over <=k rows per group."),
    "q_quota_sample": (
        "One exchange (the per-source window); the hash, the running "
        "sum, and the budget cut all ride that single shuffle as "
        "codegen projections."),
    "q_bloom_ingest_gate": (
        "History builds day-grain bit tables (one partial-combined "
        "bit_or agg); the gate is k BROADCAST probes against the "
        "merged <=m_words-row state — the batch side never shuffles."),
    "q_triangle_count": (
        "Degree-oriented wedge closing: degree agg, wedge self-join on "
        "the apex, closing equi-join — fan-out bounded by the oriented "
        "out-degree, no hub blow-up.  r7: the canonicalized edge "
        "relation is pinned (localCheckpoint) — the caller's bipartite "
        "projection appears ZERO times in this plan (it ran once, "
        "eagerly), so degrees/wedges/closing all read the one "
        "materialized edge table."),
    "q_ks_drift": (
        "r7 scale path: the cumulative pass is cumsum_distributed — "
        "the bucket id is an IN-ROW pure function (driver-collected "
        "quantile boundary literals), so every consumer subtree "
        "computes the same __pid with zero materialization; "
        "__pid-partitioned local window, partitions-row offsets pass; "
        "both gap maxes (int64 + DECIMAL) ride one aggregate; no "
        "single-reducer full-data window."),
    "q_auc_exact": (
        "Exact Mann-Whitney AUC: distinct-score pre-agg, pinned "
        "range-partitioned cumsum, doubled midrank terms as one "
        "DECIMAL(38,0) aggregate, a single final double division."),
    "q_distribution_windows": (
        "r7 scale path: distributed row_number via cumsum_distributed "
        "over a constant-1 column; ntile/percent_rank/cume_dist are "
        "in-row formulas on (rn, n) — the only unpartitioned window "
        "is the partitions-row offsets pass."),
    "q_span_dedup": (
        "Single-scan span dedup: in-row gram build (Generate), one "
        "(gram, doc) rollup, per-gram window flag on the SAME "
        "relation, doc rollup — 1 scan / 3 exchanges, no seen-set "
        "join-back."),
    "q_semdedup": (
        "SemDeDup: map-only broadcast centroid assignment (one nested "
        "codebook row), then the pair join keyed ONLY by the cell id — "
        "candidates bounded by cell occupancy, never all-pairs."),
    "q_sequence_packing": (
        "Fact-grain distributed cumsum (in-row deterministic bucket id "
        "+ __pid-local window + partitions-row offset pass — zero "
        "materialization); bin math is in-row integer `div` "
        "arithmetic — exact past 2^53."),
    "q_submission_spine": (
        "The full submission relational spine as ONE plan: broadcast "
        "semi-join + label joins, player-key window for converge rate, "
        "one sequence aggregate, a single ArrowEvalPython stage (the "
        "broadcast-model seam), posexplode un-pivot, and the quantized "
        "MAE rollup — frame-grain shuffles only on the player key."),
    "q_media_ahash": (
        "One ArrowEvalPython/mapInPandas stage over the media scan "
        "(the decode seam), then codegen band extraction — zero "
        "exchanges: the fingerprint is per-row."),
    "q_bpe_encode": (
        "Interpreted merge folds sit on the VOCAB branch (post-"
        "distinct, word grain), never the corpus branch; the word→"
        "pieces map joins back (AQE's broadcast call) and the per-doc "
        "sum is one combinable aggregate."),
    "q_hll_overlap": (
        "The register table builds once (persisted) and feeds the "
        "singles and every pair union; pair fan-out is the tiny "
        "broadcast type-pair table, and the estimates compose as "
        "projections — raw history is scanned exactly once."),
    "q_minhash_audience": (
        "Signatures are 32 plain min aggregates in ONE groupBy "
        "(map-side combinable); similarity is a group-grain pair join "
        "over wide signature rows — the member sets never move."),
    "q_dsir_weights": (
        "One token explode collapses to the pinned (doc, bucket) "
        "grain; raw+target stats from a SINGLE conditional aggregate "
        "(never two passes); the 64-row log-ratio table broadcasts "
        "back; per-doc reduction is a LONG sum of micro-nats."),
    "q_pmi_collocations": (
        "Pinned vocabulary-grain count tables (corpus tokenized "
        "exactly twice: token grain + bigram grain); min-count prunes "
        "before the unigram joins; PMI is per-row scalar math — no "
        "float sums anywhere."),
    "q_item_similarity": (
        "One distinct (basket, item) relation feeds pairs AND item "
        "counts; the pair join is the bounded within-basket self-join; "
        "catalog-grain count tables broadcast onto the pruned pairs."),
    "q_skyline": (
        "Distinct-d1 collapse, then the three-phase deterministic-"
        "bucket RUNNING MAX: in-row bucket ids, local window, "
        "partitions-row offset fold — the only unpartitioned window "
        "is the offsets pass; final filter joins the grain back."),
    "q_kaplan_meier": (
        "Two cumsum_distributed passes on the pinned distinct-duration "
        "grain (removals, then rounded ln factors); three bounded fact "
        "scans (view-min, purchase-min, study end); no single-reducer "
        "fact window."),
    "q_join_size_est": (
        "Two staged-hash AGMS builds (one linear pass each, hash "
        "chains as named columns — CSE does not reach through the "
        "Generate), pinned d×w sketches, a tiny (row, bucket) join; "
        "the exact join rides alongside only to report quality."),
    "q_rfm_segments": (
        "One fact collapse to the pinned user grain; quintile "
        "thresholds are a 1-row broadcast; scoring is map-side; the "
        "final rollup is segment-grain."),
    "q_forecast_backtest": (
        "Cell-grain train means broadcast onto the test half; "
        "floor-quantized micro-unit error sums — one combinable "
        "aggregate, no window anywhere."),
    "q_kcore": (
        "Three peel rounds, each reading the previous round's pinned "
        "checkpoint: degree agg + two co-partitioned semi joins; plan "
        "depth stays O(1) — no round re-executes its predecessors."),
    "q_cusum_drift": (
        "Group stats broadcast back; the DECIMAL prefix walk is a "
        "group-partitioned window (parallel across groups — no global "
        "window); one closing aggregate."),
    "q_window_funnel": (
        "Single shuffle to the entity grain: sorted-array collect + "
        "in-row fold; the hot-key guard rides the live count column "
        "(no extra pass)."),
    "q_theta_overlap": (
        "State built once and pinned; summaries, both self-join sides, "
        "and the estimate all run on groups·k state rows — the member "
        "sets never move."),
    "q_wasserstein_drift": (
        "Pinned distinct-value grain feeds ONE bucket staging (cumsum "
        "keep_pid) reused by the prefix sums AND the neighbor-gap "
        "pass; DECIMAL interval terms; one final division."),
    "q_label_propagation": (
        "Three LPA rounds, each reading the previous round's pinned "
        "node-grain labels: one adjacency join + one count aggregate "
        "whose argmax is max(struct) — no window, plan depth O(1)."),
    "q_frequent_triples": (
        "Pinned distinct relation and pinned a-b pair stream; L1 semi "
        "join before any self-join; pair prune is three broadcast semi "
        "joins ahead of the triple count — no re-executed subtree."),
    "q_poisson_bootstrap": (
        "x32 explode collapses in the same stage's partial aggregate "
        "(shuffle carries reps-per-partition partials); the when-chain "
        "inverse CDF stays in whole-stage codegen; 32-row replicate "
        "table pinned before the CI agg rides back as a broadcast."),
    "q_theil_sen": (
        "Pair set at the calendar-bounded day grain; exact median via "
        "histogram SELECTION (median_distributed): two linear scans + "
        "a sort of only the ~n/1024-row target buckets — no global "
        "sort, no single-reducer percentile buffer."),
    "q_acf": (
        "Pinned dense hour grid; ONE whole-series window computes all "
        "12 lag columns (span-bounded — hours, not events), one "
        "groupBy(lag) with DECIMAL moment aggregates (r14; formerly 12 "
        "shifted self-joins) — cost is span x 12 rows, independent of "
        "event count."),
    "q_personalized_pagerank": (
        "Teleport carried as a ranks column: each of the 5 rounds is "
        "one edges-ranks shuffle + one aggregate + a 1-row dangling "
        "broadcast — the q_pagerank shape, no node-grain broadcast."),
    "q_silhouette": (
        "Lloyd loop shared with q_lloyd_kmeans (lloyd_centroids); the "
        "silhouette pass is map-only against the broadcast K-row "
        "codebook — the quadratic pairwise form never materializes."),
}


def main() -> None:
    from big_data_bowl_spark.queries import QUERIES
    from big_data_bowl_spark.session import build_session

    spark = build_session(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# Physical-plan audit (generated by scripts/dump_plans.py)",
           "",
           f"Plans below are `.explain('formatted')` at {SF_DIR} on the",
           "session defaults (AQE on).  Each query states the plan shape",
           "it promises; `tests/test_plans.py` asserts the load-bearing",
           "properties, this file makes the full plans reviewable.",
           ""]
    for name, contract in AUDITED.items():
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"**Contract:** {contract}", "",
                "```", buf.getvalue().rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
