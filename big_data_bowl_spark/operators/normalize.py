"""Direction normalization + geometry for tracking-shaped tables
(SURVEY §2.8 F1–F5, §1.4; bdb2026/preprocess.py:39-203).

Both reference dialects are preserved behind a flag (SURVEY §7.5 risk 1):
- package: flip x only (preprocess.py:60-85)
- notebook: flip x AND y, rotate dir/o by 180° (BDB_2026.ipynb#cell19)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import bearing, euclidean
from ..schemas import require_columns

FIELD_LENGTH = 120.0
FIELD_WIDTH = 53.3


def normalize_coordinates(df: DataFrame, dialect: str = "package",
                          direction_col: str = "play_direction") -> DataFrame:
    """F4: left-moving plays mirrored so all motion reads left→right."""
    require_columns(df, [direction_col, "x"], "normalize_coordinates")
    left = F.lower(F.col(direction_col)) == "left"
    out = df.withColumn(
        "x_norm", F.when(left, FIELD_LENGTH - F.col("x")).otherwise(F.col("x")))
    for c, oc in (("ball_land_x", "ball_land_x_norm"),):
        if c in df.columns:
            out = out.withColumn(
                oc, F.when(left, FIELD_LENGTH - F.col(c)).otherwise(F.col(c)))
    if dialect == "package":
        for c, oc in (("y", "y_norm"), ("ball_land_y", "ball_land_y_norm")):
            if c in df.columns:
                out = out.withColumn(oc, F.col(c))
        return out
    if dialect != "notebook":
        raise ValueError(f"unknown dialect {dialect!r}")
    for c, oc in (("y", "y_norm"), ("ball_land_y", "ball_land_y_norm")):
        if c in df.columns:
            out = out.withColumn(
                oc, F.when(left, FIELD_WIDTH - F.col(c)).otherwise(F.col(c)))
    for c in ("dir", "o"):
        if c in df.columns:
            out = out.withColumn(
                c + "_norm",
                F.when(left, (F.col(c) + 180.0) % 360.0).otherwise(F.col(c)))
    return out


def add_postthrow_geometry(df: DataFrame, x: str = "x_norm", y: str = "y_norm",
                           land_x: str = "ball_land_x_norm",
                           land_y: str = "ball_land_y_norm") -> DataFrame:
    """F1–F3 block (add_postthrow_features, preprocess.py:137-192):
    distance + bearing to the landing point, movement heading from ``dir``,
    and the cosine alignment of heading vs bearing — all native expressions
    inside one codegen stage."""
    require_columns(df, [x, y, land_x, land_y], "add_postthrow_geometry")
    out = (df.withColumn("dist_to_land",
                         euclidean(F.col(x), F.col(y), F.col(land_x), F.col(land_y)))
             .withColumn("bearing_to_land",
                         bearing(F.col(x), F.col(y), F.col(land_x), F.col(land_y))))
    if "dir" in df.columns:
        heading = F.radians(90.0 - F.col("dir"))
        out = (out.withColumn("heading", heading)
                  .withColumn("heading_align_cos",
                              F.cos(heading - F.col("bearing_to_land"))))
    return out
