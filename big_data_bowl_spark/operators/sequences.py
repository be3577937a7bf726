"""Sequence/tensor bridge (SURVEY §2.10, T1/T2).

The reference crosses the pandas→numpy boundary with a Python loop over
groups (bdb2026/sequences.py:21-88: per play, sort, tail(25), pad to
(N,25,F) float32).  Here the tensor never leaves the cluster: it is an
``array<array<float>>`` column built with collect_list + sort_array + slice
+ array_repeat — pure Spark SQL, one shuffle, distributable to a
pandas-UDF inference stage without a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns


def build_sequences(df: DataFrame, group: list[str], order: str,
                    features: list[str], max_len: int = 25,
                    keep: str = "last", pad_value: float = 0.0) -> DataFrame:
    """T1: per-group ordered, truncated, padded sequence tensor.

    keep='last' is the package dialect (sequences.py:82 grp.tail(max_len));
    keep='first' is the notebook dialect (BDB_2026.ipynb#cell86:1350-1353) —
    both preserved as flags (SURVEY §7.5 risk 1).  Padding rows are all
    ``pad_value`` (0.0 doubles as the mask value — risk 6: preserved
    exactly; the model layer treats all-zero feature rows as padding).

    Output columns: group keys, ``seq`` (max_len × len(features) floats,
    padded at the END), ``real_len``.
    """
    require_columns(df, group + [order, *features], "build_sequences")
    step = F.struct(F.col(order).alias("__o"),
                    F.array(*[F.col(f).cast("float") for f in features]).alias("__f"))
    sorted_steps = F.array_sort(F.collect_list(step))
    agg = df.groupBy(*group).agg(sorted_steps.alias("__steps"))
    if keep == "last":
        kept = F.slice(F.col("__steps"),
                       -F.least(F.size("__steps"), F.lit(max_len)),
                       max_len)
    elif keep == "first":
        kept = F.slice(F.col("__steps"), 1, max_len)
    else:
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    feats = F.transform(kept, lambda s: s["__f"])
    pad_row = F.array_repeat(F.lit(float(pad_value)).cast("float"), len(features))
    padded = F.concat(
        feats,
        F.array_repeat(pad_row, F.lit(max_len) - F.size(feats)))
    return (agg.withColumn("real_len", F.least(F.size("__steps"), F.lit(max_len)).cast("long"))
               .withColumn("seq", padded)
               .drop("__steps"))


def unpivot_sequences(df: DataFrame, group: list[str], actual: str,
                      pred: str, real_len: str = "real_len") -> DataFrame:
    """T2: prediction un-pivot — (N, T) arrays → long table
    (game, play, t, actual, pred, residual), dropping padded steps
    (Submission.ipynb#cell7 repeat/tile+merge; BDB_2026.ipynb#cell107).

    ``posexplode(arrays_zip(...))`` replaces the reference's
    ``np.repeat``/``np.tile`` + index-join idiom (J11) entirely.
    """
    zipped = F.arrays_zip(F.col(actual).alias("a"), F.col(pred).alias("p"))
    return (df.select(*group, F.col(real_len),
                      F.posexplode(zipped).alias("t", "__z"))
              .filter(F.col("t") < F.col(real_len))
              .select(*group,
                      F.col("t").cast("long").alias("t"),
                      F.col("__z.a").alias("actual"),
                      F.col("__z.p").alias("pred"),
                      # Subtract in DOUBLE, not float32: widening the two
                      # float32 values first makes the difference exact
                      # (the house rule q_submission_spine hash-proves);
                      # float32-arithmetic subtraction re-rounds and can
                      # land one 1e-6 floor-quantum away from any SQL
                      # engine's double math.
                      (F.col("__z.a").cast("double")
                       - F.col("__z.p").cast("double")).alias("residual")))
