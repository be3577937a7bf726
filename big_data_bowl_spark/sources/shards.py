"""Deterministic training-data shard writer.

The last stage of a 100 TB pipeline is emitting the corpus as N
fixed-membership shards that trainers stream independently.  Two
properties matter at that scale and both are guaranteed here:

- **Deterministic membership**: shard = neutral_hash(key) mod N — a pure
  function of the row key, never of ``rand()``, partition layout, or
  execution order.  Re-running the pipeline (or re-sharding after a
  failure) reproduces byte-identical shard membership, which makes the
  write idempotent and the train/eval separation auditable.  The same
  engine-neutral hash family as the sampling/sketch tier, so a SQL
  engine can verify membership bit-for-bit (oracle: q_shard_stats).
- **Balanced, collision-free output**: one clustering shuffle
  (repartition on the shard id) then ``partitionBy("shard")`` — each
  shard directory is written by exactly one task, so files are few and
  shard-sized, not #tasks × #shards fragments.

A row-count MANIFEST (shard, rows, n_keys) is computed in the same job
shape (map-side-combinable agg) and written beside the data; readers
use it to verify completeness before training (a missing shard is a
hard error, not a silently smaller epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import require_columns


def shard_assignment(df: DataFrame, key_col: str, n_shards: int,
                     out: str = "shard") -> DataFrame:
    """Append the deterministic shard id: wang_mixed_hash(key) mod
    n_shards.  Map-side only — composes with scan pushdown and adds no
    shuffle."""
    require_columns(df, [key_col], "shard_assignment")
    from ..pipeline.sampling import wang_mixed_hash
    return df.withColumn(
        out, (wang_mixed_hash(F.col(key_col)) % n_shards).cast("int"))


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int) -> DataFrame:
    """Write ``df`` as ``n_shards`` hash-sharded parquet directories
    (``path/data/shard=i/``) plus a manifest (``path/_manifest/``).

    One shuffle: rows cluster on the shard id so each shard directory
    is produced by one task.  The manifest aggregates over the FILES
    JUST WRITTEN — not a second scan of the (possibly nondeterministic)
    input — so it describes exactly the corpus on disk, and is written
    only after the data commit succeeds (manifest-last ordering: a crash
    between the two writes leaves no manifest, which the reader treats
    as fatal, never a stale one).  Returns the manifest DataFrame
    (shard, rows, n_keys).
    """
    sharded = shard_assignment(df, key_col, n_shards)
    (sharded.repartition(n_shards, "shard")
            .write.mode("overwrite").partitionBy("shard")
            .parquet(f"{path}/data"))
    written = df.sparkSession.read.parquet(f"{path}/data")
    # left-join onto the full shard spine so an EMPTY shard is a
    # (shard, 0, 0) manifest row, not an absent one — partitionBy never
    # writes a directory for a shard the hash assigned no rows, and
    # without the spine the reader could not tell "legitimately empty"
    # from "lost"
    spine = df.sparkSession.range(n_shards) \
        .select(F.col("id").cast("int").alias("shard"))
    stats = (written.groupBy("shard")
             .agg(F.count(F.lit(1)).alias("rows"),
                  F.countDistinct(key_col).alias("n_keys")))
    manifest = (spine.join(stats, "shard", "left")
                .select("shard",
                        F.coalesce("rows", F.lit(0)).alias("rows"),
                        F.coalesce("n_keys", F.lit(0)).alias("n_keys")))
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_manifest")
    return manifest


def read_training_shards(spark: SparkSession, path: str,
                         expect_shards: int | None = None) -> DataFrame:
    """Read the sharded corpus back, verifying completeness against the
    manifest first: every non-empty manifest shard must exist in the
    data WITH its recorded row count (shard-id presence alone would pass
    a partially written shard — a task retry can leave a directory with
    some of its files); manifest rows=0 shards legitimately have no
    directory.  When ``expect_shards`` is given, the manifest must
    enumerate exactly that many shards.  Fails loud — a trainer must
    never silently iterate a partial epoch."""
    manifest = {r["shard"]: r["rows"] for r in
                spark.read.parquet(f"{path}/_manifest").collect()}
    got = sorted(manifest)
    if expect_shards is not None and got != list(range(expect_shards)):
        raise ValueError(
            f"read_training_shards: manifest has shards {got}, "
            f"expected 0..{expect_shards - 1}")
    data = spark.read.parquet(f"{path}/data")
    present = {r["shard"]: r["n"] for r in
               data.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
                   .collect()}
    want = {s: n for s, n in manifest.items() if n > 0}
    if present != want:
        raise ValueError(
            f"read_training_shards: per-shard data rows {present} != "
            f"manifest {want}")
    return data
