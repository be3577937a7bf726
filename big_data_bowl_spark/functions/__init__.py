from .scalar import (
    angular_diff,
    bearing,
    clip,
    euclidean,
    flag,
    minmax_100,
    nan_to_null,
    piecewise_multiplier,
    roundn,
    safe_div,
    zscore_expr,
)

__all__ = [
    "angular_diff", "bearing", "clip", "euclidean", "flag", "minmax_100",
    "nan_to_null", "piecewise_multiplier", "roundn", "safe_div", "zscore_expr",
]
