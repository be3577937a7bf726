"""As-of join — the classic time-series operator Spark lacks natively.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row at-or-before its timestamp within the same key group (backward
direction; the quotes-to-trades pattern).

Implementation is the union + carry-forward-window plan, NOT a range cross
join: both sides are tagged and unioned, one window per key ordered by
(ts, side) carries the last right-side payload forward, and left rows are
filtered back out.  Cost is one shuffle on the keys + one sort — linear,
skew-tolerant, and streaming-compatible — versus the quadratic per-key
fan-out of the naive ``left.ts >= right.ts`` theta join.

Right-side ties on the same timestamp are broken by largest ``tie_col``
(deterministic); a right row at exactly left.ts matches (inclusive), which
is DuckDB ASOF JOIN semantics — the oracle for this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import require_columns


def asof_join(left: DataFrame, right: DataFrame, by: list[str], ts: str,
              payload: list[str], tie_col: str | None = None,
              suffix: str = "_asof",
              tolerance_seconds: float | None = None) -> DataFrame:
    """Backward as-of join: left rows keep all columns; each gains
    ``<payload><suffix>`` columns from the latest right row with
    ``right.ts <= left.ts`` in the same ``by`` group (null when none).

    ``tolerance_seconds`` bounds the lookback (pandas ``merge_asof``
    tolerance): a match older than the bound yields null payloads.  The
    bound rides on the same carry-forward window — the matched right
    timestamp is carried alongside the payloads and the age test is a
    map-side expression, so tolerance costs nothing extra at scale.
    """
    require_columns(left, by + [ts], "asof_join(left)")
    require_columns(right, by + [ts, *payload], "asof_join(right)")

    # side marker orders right rows BEFORE left rows at equal timestamps,
    # so an exact-ts right row is visible to the left row (inclusive match)
    l_tag = left.withColumn("__side", F.lit(1))
    r_proj = right.select(
        *by, F.col(ts),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
        *([F.col(tie_col).alias("__tie")] if tie_col else []))
    r_tag = r_proj.withColumn("__side", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    order = [F.asc(ts), F.asc("__side")] + \
            ([F.asc("__tie")] if tie_col else [])
    w = (Window.partitionBy(*by).orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = unioned
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__rts", F.when(F.col("__side") == 0, F.col(ts)))
        out = out.withColumn(
            "__rts_match", F.last("__rts", ignorenulls=True).over(w))
        # cast("double") = fractional epoch seconds (unix_timestamp would
        # truncate sub-second gaps); DuckDB's epoch() matches
        in_tol = (F.col(ts).cast("double")
                  - F.col("__rts_match").cast("double")
                  <= F.lit(float(tolerance_seconds)))
    for p in payload:
        carried = F.last(f"__p_{p}", ignorenulls=True).over(w)
        if tolerance_seconds is not None:
            carried = F.when(in_tol, carried)
        out = out.withColumn(f"{p}{suffix}", carried)
    keep = [c for c in left.columns] + [f"{p}{suffix}" for p in payload]
    return out.filter(F.col("__side") == 1).select(*keep)


def resample_ffill(df: DataFrame, keys: list[str], ts: str,
                   payload: list[str], step_seconds: int,
                   tie_col: str | None = None) -> DataFrame:
    """Resample each key's irregular series onto a regular ``step_seconds``
    grid, carrying the last observation forward (pandas
    ``resample().ffill()``) — the alignment step before any cross-series
    join or windowed model feature.

    The grid generates ON THE EXECUTORS: per-key min/max epochs aggregate
    first (one combinable pass), then ``sequence`` + ``explode`` fan the
    grid points out map-side — the driver never materializes a time axis.
    Values attach via the linear union+window as-of join (one shuffle on
    the keys), so total cost is two key-shuffles regardless of grid
    density.  Grid cardinality per key is span/step — bound the step to
    the series span at call sites.

    Returns (*keys, grid_ep, <payload>_asof ...): ``grid_ep`` is the
    grid's epoch seconds (floored to a step multiple)."""
    require_columns(df, [*keys, ts, *payload], "resample_ffill")
    step = F.lit(int(step_seconds))
    ep = F.unix_timestamp(F.col(ts))
    bounds = (df.groupBy(*keys)
                .agg(F.min(ep).alias("__lo"), F.max(ep).alias("__hi")))
    grid = (bounds.select(
        *keys,
        F.explode(F.sequence((F.col("__lo") / step).cast("long") * step,
                             F.col("__hi"), step)).alias("grid_ep")))
    left = grid.withColumn("__gts", F.timestamp_seconds(F.col("grid_ep")))
    right = df.select(*keys, F.col(ts).alias("__gts"), *payload,
                      *([F.col(tie_col)] if tie_col else []))
    out = asof_join(left, right, by=keys, ts="__gts", payload=payload,
                    tie_col=tie_col)
    return out.select(*keys, "grid_ep",
                      *[F.col(f"{p}_asof") for p in payload])
