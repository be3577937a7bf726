"""ML operators (SURVEY §2.9, M1–M5): the reference's sklearn clustering
path re-expressed as a Spark ML pipeline, plus the centroid-distance score
as a pure relational plan.

Reference: cluster_routes_kmeans (bdb2026/routes.py:173-233) = median
imputation → StandardScaler → KMeans(k=12, seed=42); RouteExecution score
(bdb2026/metrics.py:139-187) = L2 distance to own centroid → mean per play
→ negate → min-max 0-100.

Cluster LABELS are not comparable across implementations (SURVEY §7.5
risk 3) — tests verify label-invariant properties (inertia, sizes,
centroid-set distance), and the score path accepts ANY assignment column so
it can run on fixed assignments (e.g. the embeddings table's ``label``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import minmax_100, roundn
from ..schemas import require_columns


def fit_route_clusters(df: DataFrame, feature_cols: list[str], k: int = 12,
                       seed: int = 42):
    """M1–M3: Imputer(median) → StandardScaler → KMeans as one Spark ML
    pipeline.  Returns (model, predictions DataFrame with a ``cluster``
    column).  The fitted PipelineModel persists with ``model.save(path)``
    (S6)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Imputer, StandardScaler, VectorAssembler

    require_columns(df, feature_cols, "fit_route_clusters")
    imputed = [f"{c}__imp" for c in feature_cols]
    pipe = Pipeline(stages=[
        Imputer(strategy="median", inputCols=feature_cols, outputCols=imputed),
        VectorAssembler(inputCols=imputed, outputCol="__features_raw"),
        StandardScaler(inputCol="__features_raw", outputCol="__features",
                       withMean=True, withStd=True),
        KMeans(k=k, seed=seed, featuresCol="__features",
               predictionCol="cluster"),
    ])
    model = pipe.fit(df)
    preds = model.transform(df).drop("__features_raw", "__features", *imputed)
    return model, preds


def pca_2d(df: DataFrame, feature_cols: list[str]):
    """M4: 2-component PCA for viz (BDB_2026.ipynb#cell39)."""
    from pyspark.ml.feature import PCA, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembled = VectorAssembler(inputCols=feature_cols, outputCol="__f") \
        .transform(df)
    model = PCA(k=2, inputCol="__f", outputCol="__pc").fit(assembled)
    out = model.transform(assembled)
    return out.withColumn("pc", vector_to_array("__pc")) \
              .withColumn("pc1", F.col("pc")[0]) \
              .withColumn("pc2", F.col("pc")[1]) \
              .drop("__f", "__pc", "pc")


def cluster_centroids(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """A17 on array columns: element-wise mean vector per cluster.

    posexplode → groupBy(label, dim) avg — fully distributed; the result is
    a tiny (k × dim) table that broadcasts into the scoring join.
    Returns (label, dim, centroid).
    """
    require_columns(df, [label_col, vec_col], "cluster_centroids")
    return (df.select(label_col,
                      F.posexplode(vec_col).alias("dim", "__x"))
              .groupBy(label_col, "dim")
              .agg(F.avg(F.col("__x").cast("double")).alias("centroid")))


def centroid_distance_score(df: DataFrame, id_col: str, label_col: str,
                            vec_col: str) -> DataFrame:
    """M5+F10: L2 distance of each vector to its own cluster centroid,
    negated and min-max scaled to 0–100 (metrics.py:139-187).

    The centroid table (k × dim rows) broadcasts; the distance is a
    sum-of-squares aggregation over the exploded dims — no Python, no
    driver loop.  Returns (id, label, dist, score_100).
    """
    cents = cluster_centroids(df, label_col, vec_col)
    dims = (df.select(id_col, label_col,
                      F.posexplode(vec_col).alias("dim", "__x"))
              .withColumn("__x", F.col("__x").cast("double")))
    dist = (dims.join(F.broadcast(cents), [label_col, "dim"])
                .groupBy(id_col, label_col)
                .agg(F.sqrt(F.sum(F.pow(F.col("__x") - F.col("centroid"), 2)))
                      .alias("dist")))
    # Global extrema via aggregate + 1-row broadcast crossJoin: dist is
    # CORPUS-grain (one row per vector), so a whole-partition window here
    # would funnel the entire corpus through a single task — the same
    # scale-killer class as the eval_predictions finding.  The aggregate
    # partial-combines map-side; the 1-row result broadcasts.
    neg = -F.col("dist")
    ext = dist.agg(F.min(neg).alias("__lo"), F.max(neg).alias("__hi"))
    score = minmax_100(neg, F.col("__lo"), F.col("__hi"))
    return (dist.crossJoin(F.broadcast(ext))
                .withColumn("score_100", score)
                .drop("__lo", "__hi"))


def one_hot_labels(df: DataFrame, label_col: str, k: int,
                   prefix: str = "emb") -> DataFrame:
    """F17: K one-hot float columns from an integer label
    (make_route_embedding_table, routes.py:279-295)."""
    out = df
    for i in range(k):
        out = out.withColumn(
            f"{prefix}_{i}",
            F.when(F.col(label_col) == i, 1.0).otherwise(0.0))
    return out

def route_clusters_relational(df: DataFrame, n_dims: int = 8,
                              iters: int = 2, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              label_col: str = "label") -> DataFrame:
    """M1–M3 as a fully relational, engine-neutral pipeline: median
    impute → z-scale (mean/stddev_samp) per dim → Lloyd k-means with
    deterministic per-label init → cluster sizes.  Same semantics as
    :func:`fit_route_clusters` (cluster_routes_kmeans,
    bdb2026/routes.py:173-233) but every step is explicit DataFrame
    arithmetic, so a SQL oracle reproduces assignments bit-for-bit —
    which is what turns the k-means tier from a rows-only check into a
    hash-verified one (Spark ML's KMeans picks label NUMBERS by its own
    init, so its output can never be value-compared across engines).

    Stats are per-dim aggregates over the LONG (id, dim, x) form — two
    tiny (n_dims-row) broadcast joins, no window over the corpus; the
    scaled dims re-assemble into arrays with the sort_array(collect_list)
    idiom and feed :func:`..pipeline.similarity.lloyd_kmeans`.  The
    impute is a no-op on the dense synthetic embeddings but keeps M1 in
    the verified plan (COALESCE against the per-dim exact median)."""
    from ..pipeline.similarity import lloyd_kmeans

    require_columns(df, [id_col, vec_col, label_col],
                    "route_clusters_relational")
    long = df.select(
        F.col(id_col),
        F.col(label_col).cast("long").alias("__lbl"),
        F.posexplode(F.slice(F.transform(vec_col,
                                         lambda x: x.cast("double")),
                             1, n_dims)).alias("dim", "x"))
    med = long.groupBy("dim").agg(F.median("x").alias("__med"))
    imp = (long.join(F.broadcast(med), "dim")
               .select(id_col, "__lbl", "dim",
                       F.coalesce("x", "__med").alias("x")))
    st = imp.groupBy("dim").agg(F.avg("x").alias("__mu"),
                                F.stddev_samp("x").alias("__sd"))
    z = (imp.join(F.broadcast(st), "dim")
            .select(id_col, "__lbl", "dim",
                    ((F.col("x") - F.col("__mu")) / F.col("__sd"))
                    .alias("x")))
    arr = (z.groupBy(id_col, "__lbl")
            .agg(F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "x"))),
                    lambda s: s["x"]).alias("__v")))
    assign = lloyd_kmeans(arr, iters=iters, id_col=id_col,
                          vec_col="__v", label_col="__lbl")
    return (assign.groupBy("cluster")
                  .agg(F.count(F.lit(1)).alias("n"))
                  .orderBy("cluster"))

def pca_power_2d(df: DataFrame, n_dims: int = 6, iters: int = 50,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """M4 as a deterministic, engine-reproducible construction: 2-component
    PCA by explicit power iteration with deflation and a sign canon —
    what turns the PCA tier from rows-only (eigendecomposition sign/
    rotation is library-specific) into a hash-verified oracle row.

    Shape: ONE map-side-combinable aggregation collects the d-grain
    moment row (n, Σx_j, Σx_i·x_j for i ≤ j — constant size at any
    corpus scale, the same driver-grain discipline as BPE's vocab
    table); the d×d covariance assembles driver-side via the one-pass
    formula, the power loop (``iters`` rounds per component, fixed — the
    iteration count is part of the query's semantics like q_pagerank's 5
    rounds) runs in pure Python floats whose +,·,/,√ are all IEEE
    exactly-rounded, and the projection is a MAP-ONLY in-row expression
    with the loadings as literals — no second shuffle, no Python at
    execution time.  Sign canon: the component's largest-|loading|
    coordinate (smallest index on ties) is made positive.

    On a near-degenerate spectrum (random embeddings) the deflated
    second component is "a" unit vector of the orthogonal complement
    rather than "the" second eigenvector — exactly as ill-defined as it
    is for any PCA library; determinism + orthogonality are the
    contract, pinned by tests.  Returns (id, pc1, pc2) UNROUNDED."""
    require_columns(df, [id_col, vec_col], "pca_power_2d")
    arr = F.slice(F.transform(vec_col, lambda x: x.cast("double")),
                  1, n_dims)
    em = df.select(F.col(id_col), arr.alias("__a"))
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.sum(F.col("__a")[j]).alias(f"s{j}") for j in range(n_dims)]
    aggs += [F.sum(F.col("__a")[i] * F.col("__a")[j]).alias(f"p{i}_{j}")
             for i in range(n_dims) for j in range(i, n_dims)]
    m = em.agg(*aggs).collect()[0]

    n = m["n"]
    mu = [m[f"s{j}"] / n for j in range(n_dims)]
    cov = [[0.0] * n_dims for _ in range(n_dims)]
    for i in range(n_dims):
        for j in range(i, n_dims):
            c = (m[f"p{i}_{j}"] - m[f"s{i}"] * m[f"s{j}"] / n) / (n - 1.0)
            cov[i][j] = cov[j][i] = c

    import math

    def _power(mat: list[list[float]]) -> list[float]:
        v = [1.0] * n_dims
        for _ in range(iters):
            w = []
            for i in range(n_dims):
                acc = 0.0
                for j in range(n_dims):
                    acc += mat[i][j] * v[j]
                w.append(acc)
            acc = 0.0
            for x in w:
                acc += x * x
            nrm = math.sqrt(acc)
            v = [x / nrm for x in w]
        return v

    def _canon(v: list[float]) -> list[float]:
        mx = max(abs(x) for x in v)
        for x in v:
            if abs(x) == mx:
                return v if x > 0 else [-y for y in v]
        return v

    v1 = _power(cov)
    cv = []
    for i in range(n_dims):
        acc = 0.0
        for j in range(n_dims):
            acc += cov[i][j] * v1[j]
        cv.append(acc)
    lam = 0.0
    for i in range(n_dims):
        lam += v1[i] * cv[i]
    cov2 = [[cov[i][j] - lam * v1[i] * v1[j] for j in range(n_dims)]
            for i in range(n_dims)]
    v2 = _power(cov2)
    v1, v2 = _canon(v1), _canon(v2)

    def _proj(v: list[float]):
        out = None
        for j in range(n_dims):
            term = (F.col("__a")[j] - F.lit(mu[j])) * F.lit(v[j])
            out = term if out is None else out + term
        return out

    return em.select(F.col(id_col), _proj(v1).alias("pc1"),
                     _proj(v2).alias("pc2"))
