"""Separation operators — the reference's distinctive within-group
cross-join family (SURVEY §2.3 J6/J7/J8), generalized.

Reference sites:
- compute_catch_separation (preprocess.py:441-513): offense × defense at the
  catch frame, min Euclidean distance per offensive player.
- compute_initial_separation_at_throw (preprocess.py:330-402): same at the
  throw frame (max input frame).
- calculate_defender_separation (BDB_2026.ipynb#cell69): per-frame variant,
  written as a Python nested loop flagged "This may take a minute..." — here
  it is the SAME equi-join keyed one level deeper (frame included), which is
  both correct and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import euclidean
from .joins import nearest_in_group
from .windows import argmax_rows


def separation_at_frame(tracking: DataFrame, group: list[str],
                        entity: str, side_col: str,
                        left_side: str, right_side: str,
                        x: str = "x", y: str = "y",
                        per_frame: bool = False, frame: str = "frame_id",
                        default: float | None = None) -> DataFrame:
    """Min distance from each ``left_side`` entity to any ``right_side``
    entity, per group (optionally per frame).  J6/J7/J8 unified."""
    keys = group + ([frame] if per_frame else [])
    left = (tracking.filter(F.lower(F.col(side_col)) == left_side.lower())
                    .select(*keys, entity, x, y))
    right = (tracking.filter(F.lower(F.col(side_col)) == right_side.lower())
                     .select(*keys,
                             F.col(x).alias("__rx"), F.col(y).alias("__ry")))
    dist = euclidean(F.col(f"l.{x}"), F.col(f"l.{y}"),
                     F.col("r.__rx"), F.col("r.__ry"))
    return nearest_in_group(left, right, keys, entity, dist,
                            out="separation", default=default,
                            right_cols=["__rx", "__ry"])


def separation_at_max_frame(tracking: DataFrame, group: list[str],
                            entity: str, side_col: str,
                            left_side: str, right_side: str,
                            frame: str = "frame_id",
                            **kw) -> DataFrame:
    """J7: restrict to the argmax frame per group (throw/catch frame, W8),
    then compute separation there."""
    at_frame = argmax_rows(tracking, frame, group)
    return separation_at_frame(at_frame, group, entity, side_col,
                               left_side, right_side, **kw)
