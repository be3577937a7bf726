"""Ordered-window kinematics operators (SURVEY §2.5, W1–W5).

The reference's pervasive pattern is *global sort, then groupby().diff()/
shift()/cumcount()* (bdb2026/preprocess.py:123-127, routes.py:73-92,
BDB_2026.ipynb#cell64).  In Spark the sort lives inside the WindowSpec —
one shuffle on the partition keys serves every window over the same keys,
and compatible WindowSpecs reuse the child ordering (SURVEY §4.1
"sort-once reuse").  No global sort is ever issued.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import require_columns


def _w(partition: list[str], order: list[str]) -> Window:
    return Window.partitionBy(*partition).orderBy(*order)


def lag_diff(df: DataFrame, col: str, partition: list[str], order: list[str],
             out: str, scale: float = 1.0, fill: float | None = None) -> DataFrame:
    """W1/W2: backward difference ``(x[t] − x[t−1]) * scale`` within each
    partition, ordered.  Mirrors ``groupby(keys)[col].diff()/dt``
    (bdb2026/preprocess.py:125-126; dt=0.1 → scale=10).  ``fill`` replaces
    the first-row null (preprocess.py:127 ``fillna(0)``)."""
    require_columns(df, [col, *partition, *order], "lag_diff")
    d = (F.col(col) - F.lag(col, 1).over(_w(partition, order))) * scale
    if fill is not None:
        d = F.coalesce(d, F.lit(fill))
    return df.withColumn(out, d)


def lead_diff(df: DataFrame, col: str, partition: list[str], order: list[str],
              out: str, fill: float | None = 0.0) -> DataFrame:
    """W3: forward difference ``x[t] − x[t+1]`` — the notebook dialect of
    converge_rate (BDB_2026.ipynb#cell80), last frame → ``fill``."""
    require_columns(df, [col, *partition, *order], "lead_diff")
    d = F.col(col) - F.lead(col, 1).over(_w(partition, order))
    if fill is not None:
        d = F.coalesce(d, F.lit(fill))
    return df.withColumn(out, d)


def cum_index(df: DataFrame, partition: list[str], order: list[str],
              out: str) -> DataFrame:
    """W4: 0-based row index within ordered group — ``groupby().cumcount()``
    (BDB_2026.ipynb#cell64:959-960)."""
    return df.withColumn(
        out, (F.row_number().over(_w(partition, order)) - 1).cast("long"))


def group_min_offset(df: DataFrame, col: str, partition: list[str],
                     out: str) -> DataFrame:
    """W5: ``x − min(x) per group`` broadcast-transform
    (preprocess.py:196-199 time_since_throw).  Unbounded partition window —
    no join-back needed (replaces the reference's J10 self-merge idiom)."""
    w = Window.partitionBy(*partition)
    return df.withColumn(out, F.col(col) - F.min(col).over(w))
