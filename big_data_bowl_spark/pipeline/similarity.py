"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the candidate corpus, dot products computed with zip_with/aggregate
entirely JVM-side.  At 100 TB the corpus side stays partitioned and is
scanned once; only the query set moves.

Scale paths:
- LSH-bucketed variant — random-hyperplane signs bucket the vectors;
  queries only meet candidates in their own bucket, turning the
  brute-force O(Q×N) into O(Q×N/2^bits) per probe.
- IVF (inverted-file) variant — a KMeans coarse quantizer assigns every
  vector to a cell; queries probe only their ``nprobe`` nearest cells and
  re-rank exactly within them.  With ``nprobe == n_cells`` the search is
  exhaustive and provably equals the brute-force result (the equivalence
  test); with small ``nprobe`` the corpus side touches ~nprobe/n_cells of
  the data.  At 100 TB the cell id becomes the physical partition key so a
  probe is a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import roundn
from ..schemas import require_columns
from .sampling import HASH_KEY_MOD, HASH_MOD, HASH_MULT


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition a vector table to full parallelism BEFORE the
    CPU-bound per-vector stages (r13).  The sf0.1 embeddings parquet is
    a single row group — ONE scan partition no matter what
    maxPartitionBytes says — so every dot-product / signature / encode
    map stage downstream of a bare scan ran on one core (measured:
    q_minhash_neutral's text twin 6.8s → 4.1s from the same fix; the
    ANN family numbers are in SCALE.md r13).  One narrow shuffle of
    (id, vector) rows; at cluster scale scans arrive pre-parallel and
    this is a cheap no-op-sized exchange."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query_ids: list[int], k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact cosine top-k: for each query vector, the k nearest
    other vectors.  Query side is broadcast; ranking is a per-query window
    with a deterministic id tie-break.

    Returns (query_id, neighbor_id, cosine) — floats cast to double BEFORE
    any arithmetic so the element-order summation matches the oracle bit-
    for-bit (then rounded).
    """
    require_columns(df, [id_col, vec_col], "cosine_topk")
    vecs = _fan_out(df.select(F.col(id_col),
                              _as_double(F.col(vec_col)).alias("v")))
    q = (vecs.filter(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv")))
    pairs = (F.broadcast(q)
             .crossJoin(vecs.select(F.col(id_col).alias("neighbor_id"),
                                    F.col("v").alias("nv")))
             .filter(F.col("query_id") != F.col("neighbor_id")))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = pairs.withColumn("cosine", roundn(cos))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= k)
                  .select("query_id", "neighbor_id", "cosine"))


N_PLANES = 8


def _lsh_plane_weights(spark, seed: int, n_tables: int, n_planes: int,
                       dim: int):
    """The n_tables·n_planes·dim hyperplane components as a Python list,
    computed by SPARK's own xxhash64 (one tiny 6k-row job) so the values
    are bit-identical to the in-expression form they replace.  These are
    SEED-DERIVED CONSTANTS — no input data flows in, so collecting them
    is the same bounded-parameter pattern as the sketch-param collects,
    recomputed fresh on every call."""
    n = n_tables * n_planes * dim
    t = (F.col("id") / (n_planes * dim)).cast("int")
    p = ((F.col("id") % (n_planes * dim)) / dim).cast("int")
    i = (F.col("id") % dim).cast("int")
    h = F.xxhash64(F.lit(seed), t, p, i)
    rows = (spark.range(n)
                 .select(((h % 1000).cast("double") / 500.0 - 1.0)
                         .alias("w"))
                 .collect())
    return [r["w"] for r in rows]


def lsh_bucketed_topk(df: DataFrame, query_ids: list[int], k: int = 3,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 6, n_tables: int = 16,
                      dim: int = 64, seed: int = 42) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH — the
    standard OR-of-ANDs construction (Indyk-Motwani; E2LSH practice):
    ``n_tables`` independent tables of ``n_planes`` sign bits each, a
    candidate is anything sharing a bucket with the query in ANY table,
    then exact cosine re-rank.  Per-table collision probability for
    angle θ is (1-θ/π)^n_planes, so recall@k ≈ 1-(1-p)^n_tables —
    n_planes controls bucket size (candidate cost), n_tables buys
    recall exponentially.  A single table (r1-r8 shape) measured
    recall@3 = 0.0 at sf0.1: on weakly-structured 64-dim data the true
    neighbors sit at θ≈64°, p ≈ 0.64^8 ≈ 3% — a one-table lottery.
    The 6-plane × 16-table default measures recall@3 = 0.620 at sf0.1
    over 50 query ids (recorded in SCALE.md and asserted by
    tests/test_recall_sf01.py); the theoretical 1-(1-p)^16 estimate is
    higher because real bucket occupancy is skewed — trust the measured
    number.  Measured trade curve (SCALE.md r10): equal-cost 7×24 =
    0.593 (reshaping doesn't pay), 6×24 = 0.740, 6×32 = 0.793 — recall
    above 0.7 costs ~1.5× candidates, and extra candidate budget is
    better spent on MORE TABLES than wider buckets (5×16 = 0.707 at
    the same 2× cost as 6×32).

    Hyperplanes are deterministic pseudo-random vectors derived from
    xxhash64(seed, table, plane, component) — reproducible across runs
    with no driver-side RNG state.  Scale shape: the corpus explodes
    ×n_tables into the (table, bucket) index — the classic LSH space/
    recall trade — and the candidate join is equi on (table, bucket),
    never cross; duplicate candidates from multiple tables collapse in
    a (query, neighbor)-grain distinct before the re-rank window.
    Approximate → no SQL oracle; containment + measured-recall tested.
    """
    require_columns(df, [id_col, vec_col], "lsh_bucketed_topk")
    from ..schemas import arrow_fanout
    # r15: the fan-out feeds a mapInPandas stage, so its partition count
    # is bounded by input size (see arrow_fanout: Python-worker spin-up
    # floor dominates on tiny inputs; full parallelism at scale).
    vecs = arrow_fanout(df.select(F.col(id_col),
                                  _as_double(F.col(vec_col)).alias("v")))
    id_type = dict(vecs.dtypes)[id_col]

    # The 96 sign-bit projections are a (n_tables·n_planes)×dim constant
    # matrix against every vector.  As JVM expressions this was a
    # 6,144-node interpreted-HOF tree whose cost was FIXED overhead, not
    # data: measured 3.2s at sf0.1 (2,000 vectors) and 4.2s at sf0.01
    # (200 vectors) for the stage alone.  r14 moves the stage to a
    # vectorized Arrow batch (optimization-guide §4.2): weights come
    # from Spark's own xxhash64 via _lsh_plane_weights (bit-identical),
    # and the accumulation loops over dim IN ASCENDING i ORDER — acc +=
    # v[i]·w[i], the exact fold order of the expression form, so every
    # projection is the same IEEE double and every bucket bit matches
    # (exceptAll-verified 0/0 at sf0.1).  Stage: 3.2s → 0.47s (~7×).
    # A constant-literal weight array in the JVM fold was re-measured as
    # a NO-GO in a second form this round: 96 copies of a 6,144-double
    # literal OOM'd the executor heap (r13's 84s plan-explosion no-go).
    weights = _lsh_plane_weights(df.sparkSession, seed, n_tables,
                                 n_planes, dim)

    def _bucketize(batches):
        import numpy as np
        import pandas as pd
        wnp = np.array(weights, dtype=np.float64).reshape(
            n_tables * n_planes, dim)
        tables = np.arange(n_tables, dtype=np.int32)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.float64)
            acc = np.zeros((n, n_tables * n_planes), dtype=np.float64)
            for i in range(dim):     # ascending i == the fold order
                acc += v[:, i:i + 1] * wnp[None, :, i]
            bits = acc > 0
            bucket = np.zeros((n, n_tables), dtype=np.int32)
            for t in range(n_tables):
                bt = np.zeros(n, dtype=np.int32)
                for p in range(n_planes):
                    bt = (bt << 1) + bits[:, t * n_planes + p]
                bucket[:, t] = bt
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].values, n_tables),
                "v": [x for x in pdf["v"].values for _ in range(n_tables)],
                "table": np.tile(tables, n),
                "bucket": bucket.reshape(-1),
            })

    # pinned: the bucketed index feeds BOTH sides of the candidate join
    # (query probe + corpus); without the pin each side re-hashes the
    # whole corpus (measured 7.2s → ~3s at sf0.1)
    bucketed = vecs.mapInPandas(
        _bucketize,
        f"{id_col} {id_type}, v array<double>, table int, bucket int"
    ).localCheckpoint(eager=True)
    q = (bucketed.filter(F.col(id_col).isin(query_ids))
                 .select(F.col(id_col).alias("query_id"),
                         F.col("v").alias("qv"), "table", "bucket"))
    pairs = (F.broadcast(q)
             .join(bucketed.select(F.col(id_col).alias("neighbor_id"),
                                   F.col("v").alias("nv"),
                                   "table", "bucket"),
                   ["table", "bucket"])
             .filter(F.col("query_id") != F.col("neighbor_id")))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (pairs.select("query_id", "neighbor_id",
                         roundn(cos).alias("cosine"))
                 .distinct()
                 .withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") <= k)
                 .select("query_id", "neighbor_id", "cosine"))


def ivf_topk(df: DataFrame, query_ids: list[int], k: int = 3,
             n_cells: int = 16, nprobe: int = 6,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    Index build: Spark ML KMeans(``n_cells``) assigns each vector a cell in
    one JVM pass (``model.transform`` — no shuffle).  Search: the query set
    scores all ``n_cells`` centroids (a tiny q×cells broadcast product),
    keeps its ``nprobe`` nearest cells, and meets the corpus with an
    equi-join on the cell id — candidates are the probed cells only, then
    exact cosine re-rank with the same tie-break as :func:`cosine_topk`.

    ``nprobe == n_cells`` probes everything → exactly the brute-force
    result (tested); smaller ``nprobe`` trades recall for a
    ~nprobe/n_cells candidate fraction.  MEASURED recall@3 at sf0.1
    (50 queries vs exact cosine, structure-free embeddings — the hard
    case; scripts/measure_ivf_recall.py, r11):

    ===========  ======  ======  ======  ======  ======  ======
    nprobe           1       2       3       4       6       8
    -----------  ------  ------  ------  ------  ------  ------
    8 cells      0.487   0.620   0.740   0.807   0.927   1.0
    16 cells     0.293   0.460   0.613   0.680   0.800   0.900
    ===========  ======  ======  ======  ======  ======  ======

    At EQUAL candidate fraction the finer quantizer wins (16/4 = 0.680
    vs 8/2 = 0.620 at 25%; 16/6 = 0.800 vs 8/3 = 0.740 at 37.5%) —
    smaller cells waste fewer candidates on far corners of a probed
    cell.  The default 16/6 ships 0.800 recall; the floor is asserted
    at 0.70 by tests/test_recall_sf01.py.  At corpus scale, grow
    n_cells ∝ √n (FAISS practice) and hold nprobe/n_cells to keep the
    candidate fraction — recall improves with structure, and this
    random-data table is its lower bound.

    Returns (query_id, neighbor_id, cosine).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    require_columns(df, [id_col, vec_col], "ivf_topk")
    vecs = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))

    # --- index build: coarse quantizer + cell assignment (one pass) -----
    assembled = vecs.withColumn("__f", array_to_vector("v"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="__f",
                   predictionCol="cell").fit(assembled)
    corpus = model.transform(assembled).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"), "cell")

    # --- cell probe list: q × n_cells scored driver-free ----------------
    centroids = vecs.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in c])
         for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>")
    q = (vecs.filter(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv")))
    l2 = F.aggregate(F.zip_with("qv", "centroid", lambda x, c: (x - c) * (x - c)),
                     F.lit(0.0), lambda acc, x: acc + x)
    w_cell = Window.partitionBy("query_id").orderBy(F.asc("__d"), F.asc("cell"))
    probes = (q.crossJoin(F.broadcast(centroids))
                .withColumn("__d", l2)
                .withColumn("__rn", F.row_number().over(w_cell))
                .filter(F.col("__rn") <= nprobe)
                .select("query_id", "qv", "cell"))

    # --- candidate join on cell id + exact re-rank ----------------------
    pairs = (F.broadcast(probes)
             .join(corpus, "cell")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (pairs.withColumn("cosine", roundn(cos))
                 .withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") <= k)
                 .select("query_id", "neighbor_id", "cosine"))


def pq_codebooks(df: DataFrame, m: int = 8, k: int = 16, iters: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 64, train_frac: float = 1.0,
                 neutral: bool = False) -> DataFrame:
    """Product-quantization codebooks: split each vector into ``m``
    subvectors and k-means each subspace into ``k`` codes — the index that
    stores a 100 TB embedding corpus as ``m`` small ints per vector
    instead of ``dim`` floats (64:1 at the defaults with float64).

    ALL ``m`` subspaces train in ONE Lloyd loop: vectors explode to
    (subspace, subvector) rows and the subspace id rides the grouping
    keys, so adding subspaces widens the aggregate instead of multiplying
    driver-side iterations.  Init is deterministic (code = xxhash64(id) %
    k — no RNG, engine-reproducible); the m×k-row codebook
    ``localCheckpoint``s each round so plan depth is O(1) in ``iters``.

    ``train_frac`` < 1 trains on a deterministic hash sample of the corpus
    (``xxhash64(id) % 1000 < 1000·frac``) — the 100 TB shape: codebooks
    need only O(k·m) well-spread examples to converge (FAISS trains on
    ~max(256·k, 100k) samples), so the Lloyd loop touches a fixed-size
    training set while encode/search still cover every vector.

    Returns (subspace, code, centroid array<double>) — m·k rows.
    """
    require_columns(df, [id_col, vec_col], "pq_codebooks")
    if dim % m != 0:
        raise ValueError(f"dim ({dim}) must be divisible by m ({m})")
    d_sub = dim // m
    # neutral=True swaps BOTH id hashes (train sample + code init) for
    # the explicit wang_mixed_hash family — the only engine-specific
    # atoms in the whole PQ pipeline, so with it the entire
    # codebooks→encode→ADC chain is SQL-reproducible (q_pq_topk's
    # oracle); xxhash64 stays the default.
    if neutral:
        from .sampling import wang_mixed_hash
        id_hash = wang_mixed_hash(F.col(id_col))
    else:
        id_hash = F.xxhash64(F.col(id_col))
    train = df
    if train_frac < 1.0:
        train = df.filter(
            F.pmod(id_hash, F.lit(1000)) < F.lit(int(1000 * train_frac)))
    sub = (train.select(
               F.col(id_col),
               F.posexplode(F.array(*[
                   F.slice(_as_double(F.col(vec_col)), s * d_sub + 1, d_sub)
                   for s in range(m)])).alias("subspace", "sv")))
    # the training set is re-scanned every Lloyd round (assign + recompute):
    # materialize the explode once instead of re-reading/re-exploding
    sub = sub.persist()
    # deterministic init: spread ids across codes within every subspace
    assigned = sub.withColumn(
        "code", F.pmod(id_hash, F.lit(k)).cast("int"))
    books = None
    try:
        for it in range(iters):
            comp = (assigned.select("subspace", "code",
                                    F.posexplode("sv").alias("d", "x"))
                            .groupBy("subspace", "code", "d")
                            .agg(F.avg("x").alias("c")))
            books = (comp.groupBy("subspace", "code")
                         .agg(F.transform(
                                 F.sort_array(
                                     F.collect_list(F.struct("d", "c"))),
                                 lambda s: s["c"]).alias("centroid")))
            # materialize periodically (bounds lineage on long runs) and
            # ALWAYS on the final round: the returned codebook feeds 3+
            # consumers (assign, encode, ADC) and must not recompute its
            # training; intermediate rounds have ONE consumer, so a short
            # lazy chain beats an eager materialization per round
            if it == iters - 1 or (it + 1) % 4 == 0:
                books = books.localCheckpoint(eager=True)
            assigned = _pq_assign(sub, books)
    finally:
        sub.unpersist()
    return books


def _argmin_code(sv, cents):
    """Per-row nearest-code argmin: ``cents`` is the subspace's codebook as
    array<array<double>> ordered by code; distances materialize as an
    in-row array and ``array_position(min)`` picks the LOWEST code on ties
    (same tie-break as min(struct(dist, code))).  Pure expression — runs
    inside whole-stage codegen, no join fan-out, no aggregate."""
    dists = F.transform(
        cents,
        lambda c: F.aggregate(F.zip_with(sv, c, lambda x, cc:
                                         (x - cc) * (x - cc)),
                              F.lit(0.0), lambda acc, x: acc + x))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _books_per_subspace(books: DataFrame) -> DataFrame:
    """(subspace, code, centroid) → (subspace, cents array<array<double>>)
    with cents ordered by code — m rows, broadcastable."""
    return (books.groupBy("subspace")
                 .agg(F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("code", "centroid"))),
                         lambda s: s["centroid"]).alias("cents")))


def _pq_assign(sub: DataFrame, books: DataFrame) -> DataFrame:
    """Nearest-code assignment per (row, subspace): broadcast the codebook
    nested per subspace (m rows) and compute the argmin IN-ROW — the big
    side is never fanned out ×k and never shuffled (the old
    join-then-groupBy shape shuffled n·m subvector arrays per round)."""
    return (sub.join(F.broadcast(_books_per_subspace(books)), "subspace")
               .withColumn("code", _argmin_code(F.col("sv"), F.col("cents")))
               .drop("cents"))


def pq_encode(df: DataFrame, books: DataFrame, m: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int = 64) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes array<int>) with
    ``codes[s]`` the nearest codebook entry of subspace ``s``.

    MAP-ONLY: encoding a 100 TB corpus is a single scan with zero
    exchanges (the old explode → join → groupBy shape shuffled n·m
    subvector rows twice).  r14 moved the m·k argmin folds from in-row
    JVM expressions to one vectorized Arrow batch stage (optimization-
    guide §4.2): the unrolled m×k fold tree (~128 aggregate nodes) was
    FIXED overhead like q_lsh_topk's plane folds — measured ~3.2s at
    sf0.1 for 2,000 vectors.  The codebook is collected driver-side
    (m·k rows, a few KB — the bounded-parameter collect pattern; it is
    already localCheckpoint-materialized by pq_codebooks) and the numpy
    distance loop runs over subvector positions IN ASCENDING ORDER, so
    every partial distance is the same IEEE double as the JVM fold and
    np.argmin's first-minimum tie-break equals array_position(min)
    (lowest code) — oracle-hash-checked (q_pq_topk / q_ivfpq_topk)."""
    require_columns(df, [id_col, vec_col], "pq_encode")
    d_sub = dim // m
    rows = _books_per_subspace(books).collect()   # m rows, k×d_sub each
    cents = [None] * m
    for r in rows:
        cents[r["subspace"]] = [list(c) for c in r["cents"]]
    id_type = dict(df.select(F.col(id_col)).dtypes)[id_col]
    # r15 measured NO-GO: a size-bounded fan-out (arrow_fanout) before
    # this stage LOSES at both SFs — isolated interleaved min-of-4,
    # encode→noop: sf0.1 0.369→0.481s, sf1.0 (20k vecs) 0.536→0.760s.
    # The numpy encode is trivial per byte (m·k distance folds), so the
    # scan's own partitioning already saturates it; the probe job +
    # exchange are pure overhead.  At real corpus scale scans arrive
    # pre-parallel (many row groups), so no fan-out is needed there
    # either.
    vecs = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))

    def _encode(batches):
        import numpy as np
        import pandas as pd
        books_np = [np.array(c, dtype=np.float64) for c in cents]  # (k, d_sub)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.float64)
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                sv = v[:, s * d_sub:(s + 1) * d_sub]        # (n, d_sub)
                c = books_np[s]                             # (k, d_sub)
                acc = np.zeros((n, c.shape[0]), dtype=np.float64)
                for i in range(d_sub):                      # fold order
                    diff = sv[:, i:i + 1] - c[None, :, i]
                    acc += diff * diff
                codes[:, s] = np.argmin(acc, axis=1)        # first min
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "codes": list(codes)})

    return vecs.mapInPandas(_encode, f"{id_col} {id_type}, "
                                     "codes array<int>")


def pq_topk_adc(codes: DataFrame, books: DataFrame, queries: DataFrame,
                k: int = 3, m: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int = 64, shards: int = 16) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: the
    query's per-(subspace, code) distance table (q·m·k doubles — tiny)
    nests into ONE broadcast row; each corpus row looks its m partial
    distances up IN-ROW (``pdm[s][codes[s]]``) and sums them with a
    zip_with/aggregate expression.  The original vectors are never read —
    the scan is m ints per corpus row, the whole point of PQ at 100 TB —
    and scoring is map-only: the first exchange in the plan is the
    top-k shard window over n·q scored rows.

    Top-k uses the two-phase shard trick (per-(query, id%shards) top-k,
    then top-k of ≤ shards·k survivors) so the final ranking never funnels
    a query's full candidate list through one task.

    Returns (query_id, neighbor_id, approx_d2) — smaller is nearer.
    """
    d_sub = dim // m
    qsub = (queries.select(
                F.col(id_col).alias("query_id"),
                F.posexplode(F.array(*[
                    F.slice(_as_double(F.col(vec_col)), s * d_sub + 1, d_sub)
                    for s in range(m)])).alias("subspace", "qv")))
    d2 = F.aggregate(F.zip_with("qv", "centroid",
                                lambda x, c: (x - c) * (x - c)),
                     F.lit(0.0), lambda acc, x: acc + x)
    adc = (qsub.join(F.broadcast(books), "subspace")
               .select("query_id", "subspace", "code", d2.alias("pd")))
    # nest the distance tables: (query_id, pdm[m][k]) rows → one row
    qrow = (adc.groupBy("query_id", "subspace")
               .agg(F.transform(
                       F.array_sort(F.collect_list(F.struct("code", "pd"))),
                       lambda s: s["pd"]).alias("pds"))
               .groupBy("query_id")
               .agg(F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("subspace", "pds"))),
                       lambda s: s["pds"]).alias("pdm"))
               .groupBy()
               .agg(F.collect_list(F.struct("query_id", "pdm")).alias("qs")))
    approx = F.aggregate(
        F.zip_with(F.col("codes"), F.col("q.pdm"),
                   lambda c, pds: F.element_at(pds, c + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (codes.select(F.col(id_col).alias("neighbor_id"), "codes")
                   .crossJoin(F.broadcast(qrow))
                   .select("neighbor_id", "codes",
                           F.explode("qs").alias("q"))
                   .select(F.col("q.query_id").alias("query_id"),
                           "neighbor_id", roundn(approx).alias("approx_d2"))
                   .filter(F.col("query_id") != F.col("neighbor_id")))
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col("neighbor_id"), F.lit(shards))).orderBy(
        F.asc("approx_d2"), F.asc("neighbor_id"))
    survivors = (scored.withColumn("__rn", F.row_number().over(w1))
                       .filter(F.col("__rn") <= k).drop("__rn"))
    w2 = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"),
                                                F.asc("neighbor_id"))
    return (survivors.withColumn("__rn", F.row_number().over(w2))
                     .filter(F.col("__rn") <= k)
                     .select("query_id", "neighbor_id", "approx_d2"))


def label_centroids(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label mean embedding via posexplode → (label, dim) average →
    re-assemble with sort_array(collect_list).  The exploded shuffle
    carries (labels × dims) partial sums after map-side combine —
    constant-size output regardless of fact scale.  Returns
    (label, centroid array<double>)."""
    require_columns(df, [id_col, vec_col, label_col], "label_centroids")
    comp = (df.select(F.col(label_col),
                      F.posexplode(_as_double(F.col(vec_col)))
                       .alias("dim", "v"))
              .groupBy(label_col, "dim")
              .agg(F.avg("v").alias("c")))
    return (comp.groupBy(label_col)
                .agg(F.transform(
                        F.sort_array(F.collect_list(F.struct("dim", "c"))),
                        lambda s: s["c"]).alias("centroid")))


def nearest_centroid(df: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     label_col: str = "label") -> DataFrame:
    """Assign every vector to its nearest per-label mean centroid by dot
    product (vectors are unit-norm, so dot = cosine).  The centroid table
    is K rows — broadcast cross join, K dot products per row, argmax via
    one row_number window keyed by the vector id.  This is the assignment
    step of an IVF coarse quantizer / one Lloyd iteration, expressed
    relationally."""
    cents = label_centroids(df, id_col, vec_col, label_col)
    c = cents.select(F.col(label_col).alias("cand_label"), "centroid")
    return assign_to_centroids(df, c, id_col, vec_col)


def assign_to_centroids(df: DataFrame, cents: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        metric: str = "dot") -> DataFrame:
    """Score every vector against a (cand_label, centroid) table (K rows)
    and keep the best assignment — argmax dot (``metric='dot'``, cosine
    for unit vectors) or argmin squared Euclidean distance
    (``metric='l2'``, the true k-means objective — the two differ once
    centroid norms diverge, e.g. after a mean update).  Deterministic
    tie-break on the smaller label.  Returns (id, assigned_label, score)
    where score is the winning dot / squared distance.

    MAP-ONLY (r5, the _pq_assign discipline): the whole codebook nests
    into ONE broadcast row (labels + centroids sorted by label) and the
    argmin/argmax runs as an in-row array expression —
    ``array_position`` of the extremum picks the FIRST hit, i.e. the
    smallest label, the same tie-break the previous row_number window
    enforced.  The old shape shuffled the corpus ×K through a per-id
    window EVERY call — inside lloyd_kmeans that was one corpus shuffle
    per round; now assignment never exchanges at all."""
    if metric not in ("dot", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    nested = cents.groupBy().agg(
        F.transform(F.array_sort(F.collect_list(
            F.struct("cand_label", "centroid"))),
            lambda s: s["centroid"]).alias("__cts"),
        F.sort_array(F.collect_list("cand_label")).alias("__lbls"))
    vecs = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    if metric == "dot":
        score_fn = lambda c: _dot(F.col("v"), c)  # noqa: E731
        best = F.array_max
    else:
        score_fn = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        best = F.array_min
    # stage the distance array ONCE as a named column (HOF-CSE rule —
    # see minhash_slots), then the index once; references stay references
    return (vecs.crossJoin(F.broadcast(nested))
                .withColumn("__d", F.transform(F.col("__cts"), score_fn))
                .withColumn("__i", F.array_position(
                    F.col("__d"), best(F.col("__d"))).cast("int"))
                .select(F.col(id_col),
                        F.element_at("__lbls", F.col("__i"))
                         .alias("assigned_label"),
                        roundn(F.element_at("__d", F.col("__i")))
                         .alias("score")))


def lloyd_kmeans(df: DataFrame, iters: int = 3, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 label_col: str = "label",
                 checkpoint_every: int = 2) -> DataFrame:
    """Full Lloyd k-means loop as pure DataFrame ops — the iterative-
    algorithm pattern (cf. ``duplicate_components``): each round is
    assignment (map-only in-row argmin against the broadcast-nested
    codebook — zero exchanges since r5) + update (posexplode
    → (cluster, dim) mean → re-assembled arrays), so the only per-round
    shuffle is the map-side-combinable centroid aggregation.  ``localCheckpoint`` on
    the K-row centroid table cuts lineage every ``checkpoint_every``
    rounds, bounding plan depth — the same latency/recovery cadence as
    ``pagerank``: letting 2 rounds pipeline into one job measured
    ~15-20% faster at sf0.1, and the pin is LAZY since r14
    (``eager=False`` — truncates the plan at definition, materializes
    inside the next consuming job instead of a dedicated count job;
    q_lloyd_kmeans 2.78→2.11s, q_silhouette 3.07→2.70s interleaved
    min-of-3, outputs exceptAll-identical).  Initial centroids are the
    per-``label_col`` means
    (deterministic — no random init, so results are engine-reproducible).

    Returns (id, cluster, score) plus per-cluster sizes would be one more
    agg; kept minimal to compose."""
    if checkpoint_every < 1:
        raise ValueError(
            f"lloyd_kmeans: checkpoint_every must be >= 1, got "
            f"{checkpoint_every}")
    vecs = _fan_out(df.select(F.col(id_col),
                              _as_double(F.col(vec_col)).alias("v")))
    cents = (label_centroids(df, id_col, vec_col, label_col)
             .select(F.col(label_col).cast("long").alias("cand_label"),
                     "centroid"))
    cents = lloyd_centroids(vecs, cents, iters, id_col=id_col,
                            checkpoint_every=checkpoint_every)
    return (assign_to_centroids(vecs, cents, id_col, "v", metric="l2")
            .select(F.col(id_col),
                    F.col("assigned_label").alias("cluster"), "score"))


def lloyd_centroids(vecs: DataFrame, cents: DataFrame, iters: int,
                    id_col: str = "vec_id",
                    checkpoint_every: int = 2) -> DataFrame:
    """The Lloyd update loop alone: ``iters`` rounds of map-only
    assignment + posexplode-mean update over an initial (cand_label,
    centroid) table, returning the FINAL centroids — extracted from
    :func:`lloyd_kmeans` so evaluation queries (silhouette) can reuse
    the identical iteration instead of re-implementing it."""
    if checkpoint_every < 1:
        raise ValueError(
            f"lloyd_centroids: checkpoint_every must be >= 1, got "
            f"{checkpoint_every}")
    for it in range(iters):
        assign = assign_to_centroids(vecs, cents, id_col, "v", metric="l2")
        comp = (vecs.join(assign.select(id_col, "assigned_label"), id_col)
                    .select(F.col("assigned_label").alias("cand_label"),
                            F.posexplode("v").alias("dim", "val"))
                    .groupBy("cand_label", "dim")
                    .agg(F.avg("val").alias("c")))
        cents = (comp.groupBy("cand_label")
                     .agg(F.transform(
                             F.sort_array(F.collect_list(
                                 F.struct("dim", "c"))),
                             lambda s: s["c"]).alias("centroid")))
        if (it + 1) % checkpoint_every == 0 or it == iters - 1:
            cents = cents.localCheckpoint(eager=False)
    return cents


def ivfpq_topk(df: DataFrame, query_ids: list[int], k: int = 3,
               n_cells: int = 4, nprobe: int = 2, m: int = 8,
               pq_k: int = 16, dim: int = 64,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 42, train_frac: float = 1.0,
               iters: int = 2, neutral: bool = False) -> DataFrame:
    """IVF-PQ — the production ANN architecture (FAISS IVFPQ) from the
    engine's two tiers composed: the coarse quantizer routes each query
    to ``nprobe`` cells, and ADC scans ONLY those cells' PQ codes.  At
    100 TB the corpus is stored once as (cell, m small ints) rows
    partitioned by cell; a query touches nprobe/n_cells of the index and
    never reads a raw vector.

    Scoring is map-only like :func:`pq_topk_adc` (distance tables nest
    into a per-query broadcast row); the candidate restriction is one
    broadcast equi-join on the cell id.  Returns
    (query_id, neighbor_id, approx_d2), smaller = nearer."""
    require_columns(df, [id_col, vec_col], "ivfpq_topk")
    vecs = _fan_out(df.select(F.col(id_col),
                              _as_double(F.col(vec_col)).alias("v")))

    if neutral:
        # Engine-neutral coarse quantizer: deterministic per-label mean
        # centroids (the ivf_neutral_topk construction) — with the
        # neutral PQ hash family below, the ENTIRE composite becomes
        # SQL-reproducible (q_ivfpq_topk's oracle).  n_cells/seed are
        # ignored: cells are the label partition.
        cents = (label_centroids(df, id_col, vec_col, "label")
                 .select(F.col("label").cast("int").alias("cell"),
                         "centroid"))
        cells = (assign_to_centroids(
                     df, cents.select(F.col("cell").alias("cand_label"),
                                      "centroid"),
                     id_col, vec_col, metric="l2")
                 .select(F.col(id_col),
                         F.col("assigned_label").cast("int").alias("cell")))
        centroids = cents
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        assembled = vecs.withColumn("__f", array_to_vector("v"))
        model = KMeans(k=n_cells, seed=seed, featuresCol="__f",
                       predictionCol="cell").fit(assembled)
        cells = model.transform(assembled).select(
            F.col(id_col), "cell")

    books = pq_codebooks(df, m=m, k=pq_k, iters=iters, dim=dim,
                         id_col=id_col, vec_col=vec_col,
                         train_frac=train_frac, neutral=neutral)
    codes = (pq_encode(df, books, m=m, dim=dim, id_col=id_col,
                       vec_col=vec_col)
             .join(cells, id_col)
             .select(F.col(id_col).alias("neighbor_id"), "codes", "cell"))

    if not neutral:
        centroids = vecs.sparkSession.createDataFrame(
            [(int(i), [float(x) for x in c])
             for i, c in enumerate(model.clusterCenters())],
            "cell int, centroid array<double>")
    q = (vecs.filter(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv")))
    l2 = F.aggregate(F.zip_with("qv", "centroid",
                                lambda x, c: (x - c) * (x - c)),
                     F.lit(0.0), lambda acc, x: acc + x)
    w_cell = Window.partitionBy("query_id").orderBy(F.asc("__d"),
                                                    F.asc("cell"))
    probes = (q.crossJoin(F.broadcast(centroids))
                .withColumn("__d", l2)
                .withColumn("__rn", F.row_number().over(w_cell))
                .filter(F.col("__rn") <= nprobe)
                .select("query_id", "cell"))

    d_sub = dim // m
    qsub = (df.filter(F.col(id_col).isin(query_ids))
              .select(F.col(id_col).alias("query_id"),
                      F.posexplode(F.array(*[
                          F.slice(_as_double(F.col(vec_col)),
                                  s * d_sub + 1, d_sub)
                          for s in range(m)])).alias("subspace", "qv")))
    pd_ = F.aggregate(F.zip_with("qv", "centroid",
                                 lambda x, c: (x - c) * (x - c)),
                      F.lit(0.0), lambda acc, x: acc + x)
    qpdm = (qsub.join(F.broadcast(books), "subspace")
                .select("query_id", "subspace", "code", pd_.alias("pd"))
                .groupBy("query_id", "subspace")
                .agg(F.transform(
                        F.array_sort(F.collect_list(F.struct("code", "pd"))),
                        lambda s: s["pd"]).alias("pds"))
                .groupBy("query_id")
                .agg(F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("subspace", "pds"))),
                        lambda s: s["pds"]).alias("pdm")))
    approx = F.aggregate(
        F.zip_with(F.col("codes"), F.col("pdm"),
                   lambda c, pds: F.element_at(pds, c + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    cand = (codes.join(F.broadcast(probes), "cell")
                 .join(F.broadcast(qpdm), "query_id")
                 .filter(F.col("query_id") != F.col("neighbor_id")))
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"),
                                               F.asc("neighbor_id"))
    return (cand.withColumn("approx_d2", roundn(approx))
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= k)
                .select("query_id", "neighbor_id", "approx_d2"))


# Neutral-LSH plane weights: a multiplicative integer hash of (plane, dim)
# any engine reproduces — (p·1000003 + i + 1)·2654435761 mod (10^9+7)
# mod 1000 − 500 ∈ [−500, 499].  Products stay < 2^55, well inside long.
_LSH_NEUTRAL_MULT = 2_654_435_761
_LSH_NEUTRAL_P = 1_000_000_007


def _lsh_neutral_w(p: int, i: Column) -> Column:
    h = (F.lit(p * 1_000_003 + 1).cast("long") + i) \
        * F.lit(_LSH_NEUTRAL_MULT)
    return h % _LSH_NEUTRAL_P % 1000 - 500


def lsh_neutral_topk(df: DataFrame, query_ids: list[int], k: int = 3,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_planes: int = N_PLANES, dim: int = 64) -> DataFrame:
    """Engine-neutral random-hyperplane LSH — the :func:`lsh_bucketed_topk`
    pipeline with the two engine-specific seams replaced so a SQL oracle
    reproduces the result bit-for-bit (the ANN-tier analogue of
    dedup.minhash_neutral_pairs):

    - plane components come from the explicit multiplicative hash
      ``_lsh_neutral_w`` instead of xxhash64 (JVM-only), and
    - the sign decision quantizes each component to integer micro-units
      (``floor(x·10^6)`` — floor, not round: round-half ties break
      differently across engines) so the projection is an EXACT integer
      sum — no float summation order anywhere near the bucket boundary.

    Candidates still meet on the bucket equi-join; the exact cosine
    re-rank is the proven :func:`cosine_topk` arithmetic (round-6 +
    neighbor-id tie-break).  The xxhash64 form remains the hot path.
    Returns (query_id, neighbor_id, cosine).
    """
    require_columns(df, [id_col, vec_col], "lsh_neutral_topk")
    vecs = _fan_out(df.select(F.col(id_col),
                              _as_double(F.col(vec_col)).alias("v")))

    dims = F.sequence(F.lit(0), F.lit(dim - 1)).cast("array<long>")

    def bucket_bits(qcol: Column) -> Column:
        out = F.lit(0).cast("long")
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(qcol, dims,
                           lambda x, i: x * _lsh_neutral_w(p, i)),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            out = F.shiftleft(out, 1) + F.when(proj > 0, 1).otherwise(0)
        return out

    # stage the quantized array ONCE (HOF-CSE rule — the 8 per-plane
    # projections would otherwise each re-run the floor transform)
    bucketed = (vecs.withColumn(
                    "__xq", F.transform(
                        F.col("v"),
                        lambda x: F.floor(x * 1e6).cast("long")))
                    .withColumn("bucket", bucket_bits(F.col("__xq")))
                    .drop("__xq"))
    q = (bucketed.filter(F.col(id_col).isin(query_ids))
                 .select(F.col(id_col).alias("query_id"),
                         F.col("v").alias("qv"), "bucket"))
    pairs = (F.broadcast(q)
             .join(bucketed.select(F.col(id_col).alias("neighbor_id"),
                                   F.col("v").alias("nv"), "bucket"),
                   "bucket")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    cos = _dot(F.col("qv"), F.col("nv")) \
        / (_norm(F.col("qv")) * _norm(F.col("nv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (pairs.withColumn("cosine", roundn(cos))
                 .withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") <= k)
                 .select("query_id", "neighbor_id", "cosine"))


def ivf_neutral_topk(df: DataFrame, query_ids: list[int], k: int = 3,
                     nprobe: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     label_col: str = "label") -> DataFrame:
    """Engine-neutral IVF — :func:`ivf_topk` with the coarse quantizer
    swapped from Spark ML KMeans (init-dependent cell NUMBERS, never
    value-comparable across engines) to the deterministic per-label mean
    centroids (:func:`label_centroids`, the same init that made
    :func:`lloyd_kmeans` oracle-able).  Search is identical: the query
    scores all cells (broadcast), keeps its ``nprobe`` nearest, meets
    the corpus on the cell-id equi-join, exact cosine re-rank.  At 100 TB
    the cell table is the partition key of the stored index either way —
    the quantizer choice changes recall slightly, not the plan shape.
    Returns (query_id, neighbor_id, cosine).
    """
    require_columns(df, [id_col, vec_col, label_col], "ivf_neutral_topk")
    vecs = _fan_out(df.select(F.col(id_col),
                              _as_double(F.col(vec_col)).alias("v")))
    cents = (label_centroids(df, id_col, vec_col, label_col)
             .select(F.col(label_col).cast("long").alias("cell"),
                     "centroid"))
    corpus = (assign_to_centroids(df, cents.withColumnRenamed(
                  "cell", "cand_label"), id_col, vec_col, metric="l2")
              .select(F.col(id_col).alias("neighbor_id"),
                      F.col("assigned_label").alias("cell"))
              .join(vecs.select(F.col(id_col).alias("neighbor_id"),
                                F.col("v").alias("nv")), "neighbor_id"))
    q = (vecs.filter(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("query_id"),
                     F.col("v").alias("qv")))
    l2 = F.aggregate(F.zip_with("qv", "centroid",
                                lambda x, c: (x - c) * (x - c)),
                     F.lit(0.0), lambda acc, x: acc + x)
    w_cell = Window.partitionBy("query_id").orderBy(F.asc("__d"),
                                                    F.asc("cell"))
    probes = (q.crossJoin(F.broadcast(cents))
                .withColumn("__d", l2)
                .withColumn("__rn", F.row_number().over(w_cell))
                .filter(F.col("__rn") <= nprobe)
                .select("query_id", "qv", "cell"))
    pairs = (F.broadcast(probes)
             .join(corpus, "cell")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    cos = _dot(F.col("qv"), F.col("nv")) \
        / (_norm(F.col("qv")) * _norm(F.col("nv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (pairs.withColumn("cosine", roundn(cos))
                 .withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") <= k)
                 .select("query_id", "neighbor_id", "cosine"))


def semantic_dedup_pairs(df: DataFrame, threshold: float = 0.9,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         label_col: str = "label",
                         target_occupancy: float | None = 64.0
                         ) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — semantic near-duplicate pruning by
    cluster-then-compare: assign every embedding to its nearest coarse
    centroid (here the deterministic per-label means, the oracle-able
    quantizer the IVF tier uses), then compare pairs ONLY within a cell
    and keep those with cosine ≥ threshold; within each pair the lower
    id is the kept representative (SemDeDup's deterministic choice —
    callers drop ``drop_id``).

    The cell id is the ONLY join key — candidate generation never goes
    all-pairs (the banding discipline applied to embeddings).

    DENSITY-ADAPTIVE cell count (r11, the grid ladder's w₀ discipline
    applied to the quantizer): SemDeDup practice sizes cluster count ∝
    corpus (Abbas et al. run 50k clusters on LAION), because a FIXED
    quantizer makes the pair join quadratic in density (pairs ∝
    Σ_cell pop²) — measured 44× at the 10× stress SF.  With
    ``target_occupancy`` = T, any cell whose population exceeds T
    subdivides into s = ⌈pop/T⌉ SUBCELLS by nearest-of-s deterministic
    seeds (the s smallest ids in the cell; l2, ties to the smallest
    seed id) — so pair volume per cell is ~pop·T BY CONSTRUCTION and
    the number of (sub)cells grows ∝ n with no caller-remembered knob.
    The seed assignment join is Σ pop·s = Σ pop²/T distance evals —
    the one residual density-quadratic term, ÷T and map-cheap (no
    64-dim cosine, no output).  Subdivision is the standard SemDeDup
    approximation (cluster-boundary pairs are unseen, exactly as with
    a bigger k); T=None restores the single-level label quantizer, and
    cells at or under T are untouched either way.  Everything stays
    deterministic and SQL-reproducible — the oracle re-derives seeds,
    assignment, and pairs from scratch.

    Cosines round at 6 BEFORE the threshold so the boundary decision is
    identical across engines.  Returns (keep_id, drop_id, cell,
    cosine), keep_id < drop_id; ``cell`` is the coarse (label) cell.
    """
    require_columns(df, [id_col, vec_col, label_col],
                    "semantic_dedup_pairs")
    if target_occupancy is not None and not (target_occupancy > 0.0):
        raise ValueError(
            f"target_occupancy must be > 0 (got {target_occupancy!r}); "
            "pass None for the single-level label quantizer")
    cents = (label_centroids(df, id_col, vec_col, label_col)
             .select(F.col(label_col).alias("cand_label"), "centroid"))
    cells = (assign_to_centroids(df, cents, id_col, vec_col, metric="l2")
             .select(F.col(id_col),
                     F.col("assigned_label").alias("cell")))
    # norms precompute ONCE per vector (m rows) before the pair join —
    # inside the pair expression they would re-reduce the 64-element
    # array 2× per candidate (m² per cell instead of m)
    vecs = (df.select(F.col(id_col),
                      _as_double(F.col(vec_col)).alias("v"))
              .withColumn("__n", _norm(F.col("v")))
              .join(cells, id_col))
    if target_occupancy is None:
        vecs = vecs.withColumn("__sub", F.lit(0).cast("long"))
    else:
        pops = (cells.groupBy("cell")
                     .agg(F.count(F.lit(1)).alias("__pop"))
                     .withColumn("__s", F.ceil(
                         F.col("__pop") / F.lit(float(target_occupancy))
                     ).cast("long")))
        wseed = Window.partitionBy("cell").orderBy(F.asc(id_col))
        seeds = (cells.join(F.broadcast(pops), "cell")
                      .withColumn("__rn", F.row_number().over(wseed))
                      .filter(F.col("__rn") <= F.col("__s"))
                      .select("cell", F.col(id_col).alias("__seed")))
        seedv = (seeds.join(vecs.select(F.col(id_col).alias("__seed"),
                                        F.col("v").alias("__sv")),
                            "__seed")
                      .select("cell", "__seed", "__sv"))
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("__sv"),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        # argmin collapses in the aggregate (min over (d2, seed) struct)
        # — ties at equal distance pick the smallest seed id
        sub = (vecs.select(id_col, "v", "cell")
                   .join(seedv, "cell")
                   .withColumn("__d2", d2)
                   .groupBy(id_col)
                   .agg(F.min(F.struct(F.col("__d2"),
                                       F.col("__seed"))).alias("__m"))
                   .select(id_col, F.col("__m.__seed").alias("__sub")))
        vecs = vecs.join(sub, id_col)
    a = vecs.select(F.col(id_col).alias("keep_id"),
                    F.col("v").alias("__va"),
                    F.col("__n").alias("__na"), "cell", "__sub")
    b = vecs.select(F.col(id_col).alias("drop_id"),
                    F.col("v").alias("__vb"),
                    F.col("__n").alias("__nb"), "cell", "__sub")
    cos = roundn(_dot(F.col("__va"), F.col("__vb"))
                 / (F.col("__na") * F.col("__nb")))
    return (a.join(b, ["cell", "__sub"])
             .filter(F.col("keep_id") < F.col("drop_id"))
             .withColumn("cosine", cos)
             .filter(F.col("cosine") >= threshold)
             .select("keep_id", "drop_id", "cell", "cosine"))


def assign_with_runnerup(vecs: DataFrame, cents: DataFrame,
                         id_col: str = "vec_id") -> DataFrame:
    """:func:`assign_to_centroids` (l2) extended with the second-nearest
    squared distance — the extra output cluster-evaluation needs
    (silhouette's b term) that the argmin-only form cannot provide.
    Same staging discipline: the nested codebook broadcasts as ONE row,
    the distance array materializes once as a named column (HOF-CSE
    rule), and the runner-up is an array_min over the non-argmin
    positions — all map-side.  ``vecs`` carries (id, v double-array).
    Returns (id, assigned_label, d2_best, d2_runnerup); ties pick the
    smallest label first, matching assign_to_centroids."""
    nested = cents.groupBy().agg(
        F.transform(F.array_sort(F.collect_list(
            F.struct("cand_label", "centroid"))),
            lambda s: s["centroid"]).alias("__cts"),
        F.sort_array(F.collect_list("cand_label")).alias("__lbls"))
    l2 = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (vecs.crossJoin(F.broadcast(nested))
                .withColumn("__d", F.transform(F.col("__cts"), l2))
                .withColumn("__a2", F.array_min("__d"))
                .withColumn("__i", F.array_position(
                    F.col("__d"), F.col("__a2")).cast("int"))
                .select(F.col(id_col),
                        F.element_at("__lbls", F.col("__i"))
                         .alias("assigned_label"),
                        F.col("__a2").alias("d2_best"),
                        F.array_min(F.filter(
                            "__d", lambda x, i: i != F.col("__i") - 1))
                         .alias("d2_runnerup")))


def kcenter_coreset(df: DataFrame, k: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Greedy k-center selection (Gonzalez 1985, the classic 2-approx):
    pick ``k`` maximally-spread exemplars from an embedding column —
    the coreset / diversity-sampling primitive of training-data
    curation (cover the embedding space with few points; the dual of
    SemDeDup's remove-the-redundant).

    Deterministic and engine-stable by construction: the seed is the
    LOWEST id; each round selects the point whose min-squared-distance
    to the chosen set is largest, with distances quantized to integer
    micro-units via FLOOR before the argmax (the float-tie-free house
    rule) and ties broken by lowest id — so a fixed-k unrolled SQL
    oracle reproduces the selection exactly.  The distance fold is the
    same left-to-right ``(a-b)·(a-b)`` accumulation both engines run
    bit-identically (q_cosine_topk's proven arithmetic).

    Scale shape: NO fact shuffle anywhere.  The per-round state
    (id, vector, qmind) updates map-only — one chosen center broadcasts
    as a 1-row crossJoin, the fold runs in-row, and the argmax is a
    1-row partial-aggregable reduce; the driver holds only the k chosen
    ids (driver-scale state, like the Markov matrix).  localCheckpoint
    per round bounds lineage and stands in for the parquet staging a
    100 TB run would use between rounds (the IVF/PQ staged-index
    discipline); cost is k map-only passes over the vectors.

    Returns (sel_order 1..k, id, radius = quantized min-distance² at
    selection time; NULL for the seed) — radius is the coverage
    guarantee curve callers cut off at."""
    require_columns(df, [id_col, vec_col], "kcenter_coreset")
    spark = df.sparkSession
    pts = (df.select(F.col(id_col).cast("long").alias("__id"),
                     _as_double(F.col(vec_col)).alias("__v"))
             .localCheckpoint(eager=True))
    seed_id = pts.agg(F.min("__id")).first()[0]
    if seed_id is None:
        raise ValueError("kcenter_coreset: empty input")
    chosen: list[tuple[int, int, int | None]] = [(1, int(seed_id), None)]
    state = pts.withColumn("__qmind", F.lit(None).cast("long"))
    cur_id = int(seed_id)
    for r in range(2, k + 1):
        state = _kcenter_update(state, cur_id).localCheckpoint(eager=True)
        top = (state.filter(~F.col("__id")
                             .isin([c[1] for c in chosen]))
                    .agg(F.max(F.struct(
                        F.col("__qmind").alias("q"),
                        (-F.col("__id")).alias("nid"))).alias("m"))
                    .select(F.col("m.q").alias("q"),
                            (-F.col("m.nid")).alias("id"))
                    .first())
        if top is None or top["id"] is None:
            break  # fewer than k points
        chosen.append((r, int(top["id"]), int(top["q"])))
        cur_id = int(top["id"])
    out = spark.createDataFrame(
        chosen, "sel_order long, id long, q long")
    return out.select("sel_order", F.col("id").alias(id_col),
                      (F.col("q") / F.lit(1e6)).alias("radius"))


def _kcenter_update(state: DataFrame, cur_id: int) -> DataFrame:
    """One k-center round's min-distance state update — MAP-ONLY on the
    fact side by contract (plan-pinned): the newest center broadcasts as
    one row, the squared-distance fold runs in-row, and least() folds it
    into the running quantized minimum.  Split out of the loop so the
    plan test can assert the no-fact-shuffle shape directly."""
    cen = F.broadcast(state.filter(F.col("__id") == cur_id)
                           .select(F.col("__v").alias("__c")))
    d2 = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__c"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    qd = F.floor(d2 * F.lit(1e6)).cast("long")
    return (state.crossJoin(cen)
                 .select("__id", "__v",
                         F.least(F.col("__qmind"), qd).alias("__qmind")))


def jl_project(df: DataFrame, d_out: int = 16, id_col: str = "vec_id",
               vec_col: str = "embedding", seed: int = 1) -> DataFrame:
    """Sparse-sign Johnson-Lindenstrauss random projection (Achlioptas
    2003's ±1 variant): map each vector to ``d_out`` dims as
    out_j = (1/√d_out)·Σᵢ vᵢ·s(i,j) with s(i,j) ∈ {−1,+1} derived from a
    deterministic multiplicative hash of the (1-based) coordinate pair —
    the shrink-before-index step a 100 TB embedding pipeline runs ahead
    of LSH/IVF (JL: pairwise distances survive within ε at
    d_out = O(log n / ε²)).

    Engine-stable end to end: the sign is integer hash arithmetic (the
    sampling family's multiplicative reduction; bit 16 of the product —
    parity-grade mixing, verified by the distance-preservation property
    test), the fold is the house left-to-right accumulation, and the
    1/√d_out scale is applied AFTER the fold (exact dyadic for
    power-of-4 d_out).  Map-only: no shuffle, no UDF — d_out in-row
    folds inside whole-stage codegen.

    Returns (id, dim 0..d_out-1, value) exploded long-form — scalar
    doubles, so the driver's float normalization applies directly."""
    require_columns(df, [id_col, vec_col], "jl_project")
    # fan out before the d_out in-row folds (r14): map-only work from a
    # single-row-group scan otherwise runs on one core (measured
    # 1.65s -> 1.22s at sf0.1, min-of-3 interleaved; exceptAll-equal).
    # The iterative siblings (kcenter_coreset, mmr_rerank) measured as
    # NO-GOs for the same treatment — their per-round fixed job latency
    # dominates, the r13 "not inside iteration loops" boundary.
    df = _fan_out(df.select(F.col(id_col), F.col(vec_col)))
    v = _as_double(F.col(vec_col))
    scale = F.lit(d_out ** -0.5)
    def make_signed(_j):
        # transform() infers lambda arity from the SIGNATURE — bind j
        # via closure, never a default param (the documented HOF-arity
        # landmine); (i + 1) matches DuckDB's 1-based lambda index
        def signed(x, i):
            key = F.pmod((i + 1) * F.lit(10007) + F.lit(_j * 31 + seed),
                         F.lit(HASH_KEY_MOD))
            h = F.pmod(key.cast("long") * F.lit(HASH_MULT),
                       F.lit(HASH_MOD))
            bit = F.shiftright(h, 16).bitwiseAND(F.lit(1))
            return x * (F.lit(1) - F.lit(2) * bit).cast("double")
        return signed

    outs = []
    for j in range(d_out):
        outs.append(F.aggregate(F.transform(v, make_signed(j)), F.lit(0.0),
                                lambda acc, x: acc + x) * scale)
    return (df.select(F.col(id_col),
                      F.posexplode(F.array(*outs)).alias("dim", "value"))
              .select(id_col, F.col("dim").cast("long").alias("dim"),
                      "value"))


def mmr_rerank(df: DataFrame, query_vec: list[float], k: int = 8,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998, λ = 1/2): greedily pick ``k`` items maximizing
    relevance − redundancy, where relevance is the dot product with the
    query and redundancy is the max dot product with anything already
    selected — the diversity-aware final stage of a retrieval stack
    (after BM25/RRF/ANN candidate generation).

    Engine-stable like :func:`kcenter_coreset`: relevance quantizes ONCE
    to integer micro-units (FLOOR), the running max-similarity state is
    a long, and each round's pick is argmax(qrel − qmaxsim) with
    lowest-id tie-break — at λ = 1/2 the blend λ·rel − (1−λ)·maxsim is
    monotone in (rel − maxsim), so the integer difference IS the MMR
    objective and no float comparison ever decides a pick.  Per round:
    one 1-row selected-vector broadcast, an in-row dot-product fold, a
    map-only greatest() state update, and a 1-row argmax — no fact
    shuffle; localCheckpoint stands in for the parquet staging a
    100 TB run would use.  Returns (sel_order, id, score = the
    quantized objective at selection; relevance alone for the first
    pick)."""
    require_columns(df, [id_col, vec_col], "mmr_rerank")
    spark = df.sparkSession
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    rel = F.aggregate(F.zip_with(_as_double(F.col(vec_col)), q,
                                 lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    pts = (df.select(F.col(id_col).cast("long").alias("__id"),
                     _as_double(F.col(vec_col)).alias("__v"),
                     F.floor(rel * F.lit(1e6)).cast("long").alias("__qrel"))
             .withColumn("__qmaxsim", F.lit(None).cast("long"))
             .localCheckpoint(eager=True))
    chosen: list[tuple[int, int, int]] = []
    state, cur_id = pts, None
    for r in range(1, k + 1):
        if cur_id is not None:
            cen = F.broadcast(state.filter(F.col("__id") == cur_id)
                                   .select(F.col("__v").alias("__c")))
            sim = F.aggregate(F.zip_with(F.col("__v"), F.col("__c"),
                                         lambda a, b: a * b),
                              F.lit(0.0), lambda acc, x: acc + x)
            qsim = F.floor(sim * F.lit(1e6)).cast("long")
            state = (state.crossJoin(cen)
                          .select("__id", "__v", "__qrel",
                                  F.greatest(F.col("__qmaxsim"), qsim)
                                   .alias("__qmaxsim"))
                          .localCheckpoint(eager=True))
        obj = F.col("__qrel") - F.coalesce(F.col("__qmaxsim"), F.lit(0))
        top = (state.filter(~F.col("__id")
                             .isin([c[1] for c in chosen]))
                    .agg(F.max(F.struct(obj.alias("s"),
                                        (-F.col("__id")).alias("nid")))
                         .alias("m"))
                    .select(F.col("m.s").alias("s"),
                            (-F.col("m.nid")).alias("id"))
                    .first())
        if top is None or top["id"] is None:
            break
        chosen.append((r, int(top["id"]), int(top["s"])))
        cur_id = int(top["id"])
    out = spark.createDataFrame(
        chosen, "sel_order long, id long, s long")
    return out.select("sel_order", F.col("id").alias(id_col),
                      (F.col("s") / F.lit(1e6)).alias("score"))


def hard_negatives(df: DataFrame, radius: float = 0.5,
                   id_col: str = "vec_id", label_col: str = "label",
                   x_col: str = "x", y_col: str = "y",
                   refine: int = 8) -> DataFrame:
    """Hard-negative mining for contrastive/triplet training: per point,
    the NEAREST point with a DIFFERENT label within ``radius`` — the
    near-the-boundary negatives that carry the training signal (far
    negatives are easy; same-label neighbors are positives).

    Pure composition: :func:`operators.separation.grid_nearest` with the
    label threaded through both probe sides (``carry``) and the
    mismatch as the candidate ``predicate``.  The density-adaptive
    refinement ladder stays EXACT under any row predicate — the
    candidate subset is identical at every rung, so the L∞ block bound
    holds unchanged (r10: the fixed-width two-level form measured
    51.6× at the 10× stress SF — the density-blind fine width, not the
    predicate, was the quadratic term; the adaptive ladder measures
    ~3×, see SCALE.md r10).
    Returns (id, neighbor_id = the hard negative, dist)."""
    from ..operators.separation import grid_nearest
    require_columns(df, [id_col, label_col, x_col, y_col],
                    "hard_negatives")
    return grid_nearest(
        df, radius, id_col=id_col, x_col=x_col, y_col=y_col,
        refine=refine, carry=(label_col,),
        predicate=lambda: F.col(f"__q_{label_col}")
                          != F.col(f"__n_{label_col}"))


def hard_negatives_k(df: DataFrame, radius: float = 0.5, k: int = 3,
                     id_col: str = "vec_id", label_col: str = "label",
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Multi-negative mining: per point, the ``k`` NEAREST
    different-label points within ``radius``, ranked — what an InfoNCE /
    multiple-negatives contrastive batch actually consumes (k hard
    negatives per anchor, hardest first), vs :func:`hard_negatives`'
    single triplet negative.  Same composition over
    :func:`operators.separation.grid_knn`; the full-k rung-resolution
    rule is exact under the label predicate because the candidate
    subset is identical at every rung.  Returns (id, neighbor_id,
    rank 1..≤k, dist)."""
    from ..operators.separation import grid_knn
    require_columns(df, [id_col, label_col, x_col, y_col],
                    "hard_negatives_k")
    return grid_knn(
        df, radius, k=k, id_col=id_col, x_col=x_col, y_col=y_col,
        carry=(label_col,),
        predicate=lambda: F.col(f"__q_{label_col}")
                          != F.col(f"__n_{label_col}"))


def triplet_mining(df: DataFrame, radius: float = 0.5,
                   id_col: str = "vec_id", label_col: str = "label",
                   x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Triplet mining for metric learning: per anchor, the nearest
    SAME-label point (the hardest positive is actually the FARTHEST,
    but the nearest is the standard easy-positive baseline and the one
    with radius-bounded semantics) and the nearest DIFFERENT-label
    point (the hard negative), both within ``radius`` — anchors missing
    either side drop (an inner join on the anchor id), which is the
    batch-construction contract: a triplet needs all three legs.

    Two :func:`operators.separation.grid_nearest` passes over the same
    points — one with a label-match predicate, one with the mismatch —
    joined on the anchor: each side is point-grain, so the final join
    shuffles n rows.  Returns (id, pos_id, pos_dist, neg_id,
    neg_dist)."""
    from ..operators.separation import grid_nearest
    require_columns(df, [id_col, label_col, x_col, y_col],
                    "triplet_mining")
    pos = grid_nearest(
        df, radius, id_col=id_col, x_col=x_col, y_col=y_col,
        carry=(label_col,),
        predicate=lambda: F.col(f"__q_{label_col}")
                          == F.col(f"__n_{label_col}"))
    neg = grid_nearest(
        df, radius, id_col=id_col, x_col=x_col, y_col=y_col,
        carry=(label_col,),
        predicate=lambda: F.col(f"__q_{label_col}")
                          != F.col(f"__n_{label_col}"))
    return (pos.select(id_col, F.col("neighbor_id").alias("pos_id"),
                       F.col("dist").alias("pos_dist"))
               .join(neg.select(id_col,
                                F.col("neighbor_id").alias("neg_id"),
                                F.col("dist").alias("neg_dist")),
                     id_col))


def mutual_knn_edges(df: DataFrame, radius: float, k: int = 3,
                     id_col: str = "vec_id", x_col: str = "x",
                     y_col: str = "y") -> DataFrame:
    """Mutual-kNN graph: edge (a, b) iff b is among a's k nearest
    (within ``radius``) AND a is among b's — the symmetrized kNN graph
    density-based clustering and manifold methods build on (mutual
    edges are the high-precision subset; one-way edges are hub noise).
    Composition: the :func:`operators.separation.grid_knn` table pinned
    once, then ONE self-join on the reciprocity condition with
    id_a < id_b canonicalization — the kNN table is (point × ≤k)-grain,
    so the mutuality join shuffles n·k rows, never candidate pairs.
    Returns (id_a, id_b, dist)."""
    from ..operators.separation import grid_knn
    require_columns(df, [id_col, x_col, y_col], "mutual_knn_edges")
    nn = (grid_knn(df, radius, k=k, id_col=id_col,
                   x_col=x_col, y_col=y_col)
          .localCheckpoint(eager=True))  # both self-join sides
    a = nn.select(F.col(id_col).alias("id_a"),
                  F.col("neighbor_id").alias("nb_a"), "dist")
    b = nn.select(F.col(id_col).alias("id_b"),
                  F.col("neighbor_id").alias("nb_b"))
    return (a.join(b, (F.col("nb_a") == F.col("id_b"))
                      & (F.col("nb_b") == F.col("id_a")))
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "dist"))
