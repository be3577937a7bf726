from .kinematics import cum_index, group_min_offset, lag_diff, lead_diff
from .windows import (
    argmax_rows,
    closest_to_median,
    dedup_keep_last,
    rank_desc,
    topk_per_group,
    zscore_in_group,
)
from .joins import attach_labels, enrich_left, nearest_in_group, semi_join_on
from .aggregates import (
    group_stats,
    ols_slope,
    scalar_threshold,
    trajectory_features,
    value_counts,
)
from .ranges import interval_join
from .sequences import build_sequences, unpivot_sequences
from .normalize import add_postthrow_geometry, normalize_coordinates
from .separation import separation_at_frame, separation_at_max_frame
from .tracking import (
    add_converge_rate,
    add_frame_kinematics,
    add_time_since_throw,
    attach_output_labels,
    compute_catch_separation,
    compute_defender_separation_per_frame,
    compute_initial_separation,
    compute_truespeed,
    filter_to_completed_catches,
    one_name_row_per_play,
    route_features,
    select_target_receiver_rows,
)

__all__ = [
    "cum_index", "group_min_offset", "lag_diff", "lead_diff",
    "argmax_rows", "closest_to_median", "dedup_keep_last", "rank_desc",
    "topk_per_group", "zscore_in_group",
    "attach_labels", "enrich_left", "nearest_in_group", "semi_join_on",
    "group_stats", "ols_slope", "scalar_threshold", "trajectory_features",
    "value_counts",
    "build_sequences", "interval_join", "unpivot_sequences",
    "add_postthrow_geometry", "normalize_coordinates",
    "separation_at_frame", "separation_at_max_frame",
    "add_converge_rate", "add_frame_kinematics", "add_time_since_throw",
    "attach_output_labels", "compute_catch_separation",
    "compute_defender_separation_per_frame", "compute_initial_separation",
    "compute_truespeed", "filter_to_completed_catches",
    "one_name_row_per_play", "route_features", "select_target_receiver_rows",
]
