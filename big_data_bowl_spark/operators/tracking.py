"""Tracking-domain pipeline operators — the reference's public API surface
(bdb2026/__init__.py exports) re-expressed as DataFrame→DataFrame
transformers, so the three entry-point pipelines (SURVEY §3) compose
identically on Spark.

Every function is a thin composition of the generic operators in this
package (kinematics/windows/joins/aggregates/separation) — the domain layer
adds column names and reference dialects, not new execution machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import euclidean
from ..schemas import require_columns
from .kinematics import lag_diff, lead_diff
from .normalize import add_postthrow_geometry, normalize_coordinates  # noqa: F401 (re-export)
from .separation import separation_at_frame, separation_at_max_frame
from .windows import argmax_rows, dedup_keep_last

PLAY_KEYS = ["game_id", "play_id"]
PLAYER_KEYS = ["game_id", "play_id", "nfl_id"]
FRAME_KEYS = ["game_id", "play_id", "nfl_id", "frame_id"]


def add_frame_kinematics(df: DataFrame, x: str = "x_norm", y: str = "y",
                         dt: float = 0.1) -> DataFrame:
    """W1+F1 (add_basic_kinematics, preprocess.py:102-129): per-player
    frame diffs dx/dy and speed = hypot(dx,dy)/dt, first frame filled 0."""
    out = lag_diff(df, x, PLAYER_KEYS, ["frame_id"], out="dx", fill=0.0)
    out = lag_diff(out, y, PLAYER_KEYS, ["frame_id"], out="dy", fill=0.0)
    return out.withColumn(
        "speed", F.sqrt(F.pow("dx", 2) + F.pow("dy", 2)) / dt)


def add_time_since_throw(df: DataFrame) -> DataFrame:
    """W5 (preprocess.py:194-201): frame offset from the per-player minimum,
    scaled by the 10 Hz frame interval."""
    w = Window.partitionBy(*PLAYER_KEYS)
    return df.withColumn(
        "time_since_throw",
        (F.col("frame_id") - F.min("frame_id").over(w)) * 0.1)


def add_converge_rate(df: DataFrame, dist_col: str = "dist_to_land",
                      dialect: str = "package") -> DataFrame:
    """Converge rate toward the landing point, both reference dialects
    (SURVEY §3.2): 'package' = backward diff of distance, negated (closing
    ground is positive; preprocess.py:405-439); 'notebook' = forward diff
    dist[t]−dist[t+1], last frame 0 (BDB_2026.ipynb#cell80)."""
    if dialect == "package":
        out = lag_diff(df, dist_col, PLAYER_KEYS, ["frame_id"],
                       out="converge_rate", fill=0.0)
        return out.withColumn("converge_rate", -F.col("converge_rate"))
    if dialect == "notebook":
        return lead_diff(df, dist_col, PLAYER_KEYS, ["frame_id"],
                         out="converge_rate", fill=0.0)
    raise ValueError(f"unknown dialect {dialect!r}")


def select_target_receiver_rows(df: DataFrame) -> DataFrame:
    """P5 (preprocess.py:274-299): player_to_predict ∧ offense ∧ WR, with
    the reference's case-normalized comparisons."""
    require_columns(df, ["player_to_predict", "player_side",
                        "player_position"], "select_target_receiver_rows")
    return df.filter(
        F.col("player_to_predict")
        & (F.lower("player_side") == "offense")
        & (F.upper("player_position") == "WR"))


def filter_to_completed_catches(df: DataFrame, supp: DataFrame) -> DataFrame:
    """J3 (preprocess.py:302-327): keep plays with pass_result='C' — a real
    left-semi join instead of the reference's dedup-then-inner-merge."""
    completed = supp.filter(F.col("pass_result") == "C").select(*PLAY_KEYS)
    return df.join(F.broadcast(completed.distinct()), PLAY_KEYS, "left_semi")


def attach_output_labels(df: DataFrame, out_df: DataFrame,
                         expect_rows: bool = True) -> DataFrame:
    """J1 (preprocess.py:516-563): ground-truth positions on the 4-key
    frame grain; fails loud on the 0-row join (key/dtype mismatch).
    ``expect_rows=False`` skips the eager emptiness action (an extra pass
    over the chain) for pre-validated inputs."""
    labels = out_df.select(*FRAME_KEYS,
                           F.col("x").alias("y_true_x"),
                           F.col("y").alias("y_true_y"))
    joined = df.join(labels, FRAME_KEYS, "inner")
    if expect_rows and joined.isEmpty():
        raise ValueError("attach_output_labels: 0-row inner join — "
                         "check join keys/dtypes")
    return joined


def compute_initial_separation(tracking: DataFrame) -> DataFrame:
    """J7 (preprocess.py:330-402): at the throw frame (max input frame per
    play), min distance from each offensive player to any defender."""
    return separation_at_max_frame(
        tracking, PLAY_KEYS, "nfl_id", "player_side", "offense", "defense")


def compute_catch_separation(tracking: DataFrame,
                             default: float = 10.0) -> DataFrame:
    """J6 (preprocess.py:441-513): separation at the catch frame, with the
    reference's fill for plays without defenders (preprocess.py:511)."""
    at_catch = argmax_rows(tracking, "frame_id", PLAY_KEYS)
    return separation_at_frame(
        at_catch, PLAY_KEYS, "nfl_id", "player_side", "offense", "defense",
        default=default)


def compute_defender_separation_per_frame(tracking: DataFrame,
                                          default: float = 20.0) -> DataFrame:
    """J8-as-J6 (BDB_2026.ipynb#cell69): the notebook's 'may take a
    minute' Python nested loop as a per-frame equi-join — same result,
    embarrassingly parallel."""
    return separation_at_frame(
        tracking, PLAY_KEYS, "nfl_id", "player_side", "offense", "defense",
        per_frame=True, default=default)


def one_name_row_per_play(df: DataFrame) -> DataFrame:
    """W9 (metrics.py:260-265): one targeted-receiver name per play, keep
    last frame, deterministic nfl_id tie-break (SURVEY §7.5 risk 4)."""
    return dedup_keep_last(df, PLAY_KEYS, ["frame_id"], tiebreak=["nfl_id"])


def route_features(tracking: DataFrame) -> DataFrame:
    """A3–A8 (engineer_route_features, routes.py:34-172): the per-route
    feature block in one groupBy pass over the pre-throw window."""
    from .aggregates import trajectory_features
    feats = trajectory_features(
        tracking, PLAYER_KEYS, "frame_id", x="x_norm", y="y",
        speed="s" if "s" in tracking.columns else None,
        direction="dir" if "dir" in tracking.columns else None)
    return (feats.withColumn("route_depth", F.col("end_x") - F.col("start_x"))
                 .withColumn("route_width",
                             F.abs(F.col("end_y") - F.col("start_y"))))


def compute_truespeed(residuals: DataFrame, agg: str = "mean",
                      residual_col: str = "residual",
                      id_cols: list[str] | None = None) -> DataFrame:
    """A1/A2 (compute_truespeed, metrics.py:13-57): per-play residual
    reduction with the reference's agg dispatch.

    ``id_cols`` mirrors the reference signature and defaults to the
    per-play grain (metrics.py id_cols=(game_id, play_id), the grain every
    reference call site uses); pass PLAYER_KEYS when nfl_id is needed
    downstream (as the Submission pipeline does)."""
    c = F.col(residual_col)
    # "mae_q6" is the hash-verifiable twin of "mae": residuals quantize
    # to integer micro-units with FLOOR before the sum, so the reduction
    # is a long-sum — associative, partition-order-free, and engine-
    # stable (the house rule proven by q_submission_spine; floor is
    # applied BEFORE abs to match it bit-for-bit).  Plain "mae" stays the
    # reference-faithful float mean (metrics.py:13-57).
    q6 = F.abs(F.floor(c.cast("double") * 1e6).cast("long"))
    dispatch = {
        "mean": F.avg(c), "median": F.median(c), "sum": F.sum(c),
        "mae": F.avg(F.abs(c)), "rmse": F.sqrt(F.avg(F.pow(c, 2))),
        "mae_q6": F.sum(q6) / F.count(F.lit(1)) / F.lit(1e6),
    }
    if agg not in dispatch:
        raise ValueError(f"agg must be one of {sorted(dispatch)}, got {agg!r}")
    return (residuals.groupBy(*(id_cols or PLAY_KEYS))
                     .agg(dispatch[agg].alias("truespeed")))
