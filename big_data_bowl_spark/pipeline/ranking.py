"""Corpus-statistics scoring operators: BM25 keyword retrieval and unigram
language-model quality scoring.

Both are two-pass corpus shapes a training-data pipeline runs constantly:
a global-statistics pass (document frequencies / token frequencies — small,
broadcastable results) followed by a per-document scoring pass that joins
those statistics back.  Everything is native Spark SQL expressions with
exact DuckDB oracle twins; zero Python in the hot path.

Scale notes (100 TB):
- The exploded token stream is never materialized twice: statistics
  aggregate with map-side combine (term cardinality is bounded by
  vocabulary, not corpus size), and the scoring pass re-derives tokens in
  the same stage that consumes them.
- BM25 filters the exploded stream to the QUERY terms before any shuffle —
  the per-(doc, term) aggregate carries only matching tokens, so cost
  scales with hit count, not corpus token count.
- The unigram vocabulary (≤ a few M rows for natural text) broadcasts; if
  a tokenizer explodes vocabulary beyond broadcast range, the join falls
  back to a shuffle join on the term — still linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import roundn
from ..schemas import require_columns
from .text import _tokens


def bm25_rank(docs: DataFrame, query_terms: list[str], k1: float = 1.2,
              b: float = 0.75, topk: int = 10, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """BM25 top-k retrieval for one keyword query (Robertson/Sparck Jones;
    the Okapi formula with the +1 idf floor used by Lucene):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))

    Shape: tokens explode once, filter to the query terms IMMEDIATELY
    (so the shuffle carries hits only), aggregate (doc, term) tf, then
    broadcast the tiny df table and the 1-row corpus stats back over it.
    Scores round before ranking; doc_id breaks ties deterministically.

    Returns the topk (doc_id, n_terms, score) rows, highest score first.
    """
    require_columns(docs, [id_col, text_col], "bm25_rank")
    toks = _tokens(text_col)
    dl = F.size(toks).cast("long")
    tok = (docs.select(F.col(id_col), dl.alias("dl"),
                       F.explode(toks).alias("term"))
               .filter(F.col("term").isin(*query_terms)))
    tf = (tok.groupBy(id_col, "dl", "term")
             .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (tf.groupBy("term")
               .agg(F.count(F.lit(1)).alias("df")))  # one row per (doc,term)
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(dl).alias("sum_dl"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tscore = (idf * F.col("tf") * (k1 + 1)
              / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)))
    return (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_terms"),
                   roundn(F.sum(tscore)).alias("score"))
              .orderBy(F.desc("score"), F.asc(id_col))
              .limit(topk))


def unigram_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Unigram language-model quality score — the cheap KenLM stand-in
    every corpus-quality filter starts from: learn token log-probabilities
    from the corpus itself (count/total), then score each document by its
    mean token log-probability (higher = more typical text; gibberish and
    boilerplate outliers fall out at both ends).

    Per-token logp quantizes to INTEGER MICRO-UNITS (round(logp·1e6) as
    long) before the per-document mean: long sums are exact under any
    association, and long/long division yields bit-identical doubles on
    both engines — the same discipline as the integer-cents money
    averages (plain rounding of a double mean flips on exact .5e-6
    boundaries; this failed the sf0.1 sweep before the fix).

    Returns (doc_id, n_tokens, avg_logp).
    """
    require_columns(docs, [id_col, text_col], "unigram_scores")
    tok = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    lp = (counts.crossJoin(F.broadcast(total))
                .select("term",
                        F.round(F.log(F.col("cnt").cast("double")
                                      / F.col("total").cast("double"))
                                * 1_000_000).cast("long").alias("lp_u")))
    # lp is VOCABULARY-grain (one row per distinct corpus term) — far too
    # big to broadcast at corpus scale; the token⋈vocab attach is a plain
    # shuffle join on term (AQE may still broadcast at small SF from
    # statistics, which is a runtime decision, not a promise).
    return (tok.join(lp, "term")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    roundn(F.sum("lp_u") / F.count(F.lit(1))
                           / 1_000_000.0).alias("avg_logp")))


def bigram_scores(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  lam: float = 0.75) -> DataFrame:
    """Interpolated bigram language-model score — the next step up from
    :func:`unigram_scores` toward KenLM-style perplexity filtering:

        P(t | p) = λ·P_bigram(t | p) + (1−λ)·P_unigram(t)

    with P_bigram = count(p,t)/count(p,·) over the corpus's observed
    bigrams and P_unigram the corpus token frequency (the interpolation
    keeps unseen-bigram probabilities finite without smoothing tables).
    Per-document score = mean log-probability over its bigrams.

    Shape: tokens posexplode once; bigrams come from a per-document lag
    window on the position (one shuffle on the doc key — the same
    partitioning the sequence operators use); the bigram and unigram
    probability tables are VOCABULARY-grain aggregates that join back on
    (prev, term) / term — shuffle joins, never broadcast hints, since a
    bigram table is vocab²-bounded (AQE may still broadcast from small-SF
    statistics).  Per-bigram logp quantizes to integer micro-units before
    the per-document mean (the unigram_scores discipline: long sums are
    order-free; long/long division is bit-identical across engines).

    Returns (doc_id, n_bigrams, avg_logp) for documents with ≥2 tokens.
    """
    require_columns(docs, [id_col, text_col], "bigram_scores")
    tok = docs.select(F.col(id_col),
                      F.posexplode(_tokens(text_col))
                       .alias("pos", "term"))
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (tok.withColumn("prev", F.lag("term").over(w))
                .filter(F.col("prev").isNotNull())
                .select(id_col, "prev", "term"))
    uni = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ucnt"))
    total = uni.agg(F.sum("ucnt").alias("total"))
    big = pairs.groupBy("prev", "term").agg(
        F.count(F.lit(1)).alias("bcnt"))
    ptot = big.groupBy("prev").agg(F.sum("bcnt").alias("ptot"))
    lp = (big.join(ptot, "prev")
             .join(uni, "term")
             .crossJoin(F.broadcast(total))
             .select("prev", "term",
                     F.round(F.log(
                         lam * (F.col("bcnt").cast("double")
                                / F.col("ptot").cast("double"))
                         + (1.0 - lam) * (F.col("ucnt").cast("double")
                                          / F.col("total").cast("double")))
                         * 1_000_000).cast("long").alias("lp_u")))
    return (pairs.join(lp, ["prev", "term"])
                 .groupBy(id_col)
                 .agg(F.count(F.lit(1)).alias("n_bigrams"),
                      roundn(F.sum("lp_u") / F.count(F.lit(1))
                             / 1_000_000.0).alias("avg_logp")))


def rrf_fuse(rankings: list[tuple[str, DataFrame]], id_col: str,
             k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) — the standard hybrid-
    retrieval combiner: given named rank lists (each (id, rank) with
    rank 1 = best), score(id) = Σ_lists 1/(k + rank), ids absent from a
    list contribute 0 from it.  Scores are sums of exact reciprocals in
    a FIXED expression order (coalesce chain), so they are bit-identical
    across engines without rounding — ranking needs no float tolerance.

    Shape: a full-outer join chain on the id (each list is already
    top-N, driver-bounded); returns (id, rank_<name>..., rrf) sorted
    rrf-descending with the id as tie-break.  At 100 TB the inputs are
    top-N lists (thousands of rows), so the fuse is dimension-scale
    regardless of corpus size."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    names = [name for name, _ in rankings]
    if len(set(names)) != len(names):
        raise ValueError(f"rrf_fuse: duplicate ranking names {names} — "
                         "each list needs a distinct rank_<name> column")
    fused = None
    for name, r in rankings:
        require_columns(r, [id_col, "rank"], f"rrf_fuse[{name}]")
        r = r.select(F.col(id_col),
                     F.col("rank").cast("long").alias(f"rank_{name}"))
        # in-plan uniqueness guard (the nearest_in_group assert_true
        # pattern): a list carrying one id twice — e.g. cosine_topk
        # output with multiple query_ids passed un-aggregated — would
        # fan out the outer-join chain and silently inflate scores;
        # the lists are top-N (driver-bounded), so the window is cheap
        cnt = F.count(F.lit(1)).over(Window.partitionBy(id_col))
        r = (r.withColumn("__cnt", cnt)
              .filter(F.assert_true(
                  F.col("__cnt") == 1,
                  F.concat(F.lit(f"rrf_fuse[{name}]: duplicate id in "
                                 "ranking list ("),
                           F.col(id_col).cast("string"),
                           F.lit(") — pass one rank row per id")))
                  .isNull())
              .drop("__cnt"))
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    score = None
    for name, _ in rankings:
        term = F.when(F.col(f"rank_{name}").isNotNull(),
                      1.0 / (F.lit(k) + F.col(f"rank_{name}"))) \
                .otherwise(F.lit(0.0))
        score = term if score is None else score + term
    return (fused.withColumn("rrf", score)
                 .orderBy(F.desc("rrf"), F.asc(id_col)))


def pmi_collocations(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     min_count: int = 5) -> DataFrame:
    """Pointwise mutual information over adjacent token bigrams — the
    classic collocation-extraction statistic (Church & Hanks 1990):

        PMI(a, b) = ln( P(a,b) / (P(a)·P(b)) )

    with P(a,b) = bigram count / total bigrams and P(·) = unigram count /
    total tokens.  High-PMI pairs are multi-word expressions ("new york",
    "machine learning") a tokenizer or phrase-miner should fuse; a
    training-data pipeline runs this to build phrase vocabularies and to
    audit template boilerplate (low-PMI high-count pairs).

    Shape mirrors :func:`bigram_scores`: tokens posexplode once; bigrams
    from a per-document lag window (one shuffle on the doc key); unigram
    and bigram count tables are VOCABULARY-grain aggregates with map-side
    combine, joined shuffle-wise on the term keys (vocab² can exceed
    broadcast range; AQE may still broadcast from small-SF stats).  Both
    count tables are pinned (``localCheckpoint``): ``uni`` has three
    consumers (both join sides + the token total) and ``big`` two (the
    bigram total + the pruned join input), and without the pins each
    subtree re-explodes the corpus text — so the corpus is tokenized
    exactly twice (token grain, bigram grain) regardless of plan fan-out.
    The two corpus totals are 1-row aggregates crossJoin-broadcast onto
    the pair table.  ``min_count`` prunes the long tail BEFORE the
    unigram joins — at 100 TB the surviving pair table is the
    interesting-phrase set, not the corpus.

    PMI itself is per-row scalar math on exact integer counts — the
    double division/log sequence is written identically in the DuckDB
    oracle, so the 6-digit round is engine-stable (no float sums
    anywhere).  Returns (prev, term, n_pair, n_prev, n_term, pmi).
    """
    require_columns(docs, [id_col, text_col], "pmi_collocations")
    tok = docs.select(F.col(id_col),
                      F.posexplode(_tokens(text_col))
                       .alias("pos", "term"))
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (tok.withColumn("prev", F.lag("term").over(w))
                .filter(F.col("prev").isNotNull())
                .select(id_col, "prev", "term"))
    uni = (tok.groupBy("term").agg(F.count(F.lit(1)).alias("ucnt"))
              .localCheckpoint(eager=True))
    n_tok = uni.agg(F.sum("ucnt").alias("n_tok"))
    big = (pairs.groupBy("prev", "term")
                .agg(F.count(F.lit(1)).alias("n_pair"))
                .localCheckpoint(eager=True))
    n_big = big.agg(F.sum("n_pair").alias("n_big"))
    pruned = big.filter(F.col("n_pair") >= min_count)
    ua = uni.select(F.col("term").alias("prev"),
                    F.col("ucnt").alias("n_prev"))
    ub = uni.select("term", F.col("ucnt").alias("n_term"))
    joined = (pruned.join(ua, "prev").join(ub, "term")
                    .crossJoin(F.broadcast(n_big))
                    .crossJoin(F.broadcast(n_tok)))
    p_ab = F.col("n_pair").cast("double") / F.col("n_big").cast("double")
    p_a = F.col("n_prev").cast("double") / F.col("n_tok").cast("double")
    p_b = F.col("n_term").cast("double") / F.col("n_tok").cast("double")
    return joined.select(
        "prev", "term", "n_pair", "n_prev", "n_term",
        roundn(F.log(p_ab / (p_a * p_b))).alias("pmi"))


def tfidf_topk(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """TF-IDF keyword extraction: the top-``k`` most characteristic terms
    per document under the sklearn-style smoothed idf

        score(d, t) = tf(d, t) · (ln((1 + N) / (1 + df(t))) + 1)

    — the zero-training baseline for tagging, faceting, and dedup-key
    selection over a corpus.

    Shape: tokens explode ONCE into the (doc, term) tf aggregate; df
    derives from that same table (one term-grain aggregate — vocabulary
    size, not corpus size); N is a 1-row broadcast.  The df attach is a
    plain shuffle join on the term (vocabulary-grain, same contract as
    unigram_scores — AQE may broadcast it at small SF).  The top-k is a
    row_number window PARTITIONED BY DOCUMENT — group-grain, never a
    single reducer.  The rank ORDERS ON THE ROUND-9 SCORE: ln is only
    1-ulp-accurate (not correctly rounded) in both engines' libm, so a
    raw-product ordering of near-tied terms is not a cross-engine
    guarantee — quantizing to 9 decimals before the election is (the
    q_benford_audit float-log discipline); rounded ties break on the
    term string.

    Returns (doc_id, rnk, term, tf, score) with score rounded at 6.
    """
    require_columns(docs, [id_col, text_col], "tfidf_topk")
    tok = docs.select(F.col(id_col),
                      F.explode(_tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (F.log((1.0 + F.col("n_docs").cast("double"))
                 / (1.0 + F.col("df").cast("double"))) + 1.0)
    scored = (tf.join(dfreq, "term")
                .crossJoin(F.broadcast(n))
                .select(F.col(id_col), "term", "tf",
                        F.round(F.col("tf").cast("double") * idf, 9)
                         .alias("__s")))
    w = Window.partitionBy(id_col).orderBy(F.desc("__s"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k)
                  .select(F.col(id_col), F.col("rnk").cast("long").alias("rnk"),
                          "term", "tf", roundn(F.col("__s")).alias("score")))


def bm25_batch(docs: DataFrame, queries: DataFrame, k1: float = 1.2,
               b: float = 0.75, topk: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Batch BM25: N keyword queries answered in ONE corpus pass —
    the retrieval-serving shape (an offline eval set, a query log
    replay) where running :func:`bm25_rank` per query would rescan the
    corpus N times.  ``queries`` is a (query_id, term) table; the
    exploded token stream joins it ONCE (broadcast — a query set is
    tiny by definition), so the shuffle carries only (query, doc, term)
    hits and corpus cost is independent of N.

    Scoring matches bm25_rank exactly (Okapi with the +1 idf floor);
    df is per (query, term) — identical to the single-query df since a
    term's document frequency does not depend on the query.  The top-k
    window partitions BY QUERY (group-grain).  Scores round at 6 before
    ranking; doc ties break on id.  Returns (query_id, rnk, doc_id,
    n_terms, score)."""
    require_columns(docs, [id_col, text_col], "bm25_batch")
    require_columns(queries, ["query_id", "term"], "bm25_batch")
    toks = _tokens(text_col)
    dl = F.size(toks).cast("long")
    tok = (docs.select(F.col(id_col), dl.alias("dl"),
                       F.explode(toks).alias("term"))
               .join(F.broadcast(queries.distinct()), "term"))
    tf = (tok.groupBy("query_id", id_col, "dl", "term")
             .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (tf.select(id_col, "term").distinct()
               .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(dl).alias("sum_dl"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tscore = (idf * F.col("tf") * (k1 + 1)
              / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)))
    scored = (tf.join(F.broadcast(dfreq), "term")
                .crossJoin(F.broadcast(stats))
                .groupBy("query_id", id_col)
                .agg(F.count(F.lit(1)).alias("n_terms"),
                     roundn(F.sum(tscore)).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w)
                              .cast("long"))
                  .filter(F.col("rnk") <= topk)
                  .select("query_id", "rnk", id_col, "n_terms", "score"))


def perplexity_buckets(docs: DataFrame, n_buckets: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       lang_col: str = "lang",
                       lam: float = 0.75) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    interpolated bigram LM (:func:`bigram_scores`), then split each
    language into ``n_buckets`` equal-count tiers by score — head
    (bucket 1, highest mean log-prob = lowest perplexity), middle,
    tail.  The head/middle/tail split is the standard web-corpus
    quality stratification (keep head, sample middle, drop tail).

    One ntile window per language partition over the already-computed
    scores — the LM scoring dominates; the bucketing adds a single
    lang-key shuffle of doc-grain rows.  Ordering is (avg_logp desc,
    doc_id) — avg_logp is a long/long division, bit-identical across
    engines, so the tier boundaries are deterministic and
    oracle-exact.  Covers documents with ≥2 tokens (the LM's domain).
    Returns (doc_id, lang, n_bigrams, avg_logp, bucket)."""
    require_columns(docs, [id_col, text_col, lang_col],
                    "perplexity_buckets")
    scores = bigram_scores(docs, id_col=id_col, text_col=text_col,
                           lam=lam)
    withlang = scores.join(docs.select(id_col, lang_col), id_col)
    w = (Window.partitionBy(lang_col)
               .orderBy(F.desc("avg_logp"), F.asc(id_col)))
    return withlang.select(
        id_col, lang_col, "n_bigrams", "avg_logp",
        F.ntile(n_buckets).over(w).cast("long").alias("bucket"))
