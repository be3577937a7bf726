"""Scalar expression helpers (SURVEY §2.8, F1–F17).

Everything here is a pure Column→Column expression — JVM-side, inside
whole-stage codegen, zero Python UDFs.  The reference implements the same
math as row-wise numpy (bdb2026/preprocess.py:127-187, metrics.py:97-137) or
``.apply(lambda)`` (T3 — SURVEY notes all of them lower to native
expressions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nan_to_null(c: Column) -> Column:
    """±inf / NaN sentinel cleanup → SQL NULL (bdb2026/routes.py:199,
    metrics.py:170-175).  Also papers over pandas-NaN vs Spark-null drift
    (SURVEY §7.5 risk 2)."""
    return F.when(F.isnan(c) | (c == float("inf")) | (c == float("-inf")),
                  F.lit(None)).otherwise(c)


def roundn(c: Column, n: int = 6) -> Column:
    """Round for oracle hash-stability (SURVEY §7.5 risk 5): float aggregates
    associate differently across partitions; both the Spark query and its
    DuckDB oracle round to the same precision."""
    return F.round(c, n)


def cents(c: Column) -> Column:
    """Exact integer cents from a 2-decimal money column.

    Rounding alone cannot make float AVERAGES engine-stable: when the
    exact decimal mean lands on a rounding boundary (e.g. 47.4728125 at
    6 dp — common, since means of 2-decimal data over n = 2^a·5^b rows
    terminate within a few digits), a 1-ulp association difference
    between engines flips the rounded digit.  Summing exact integer
    cents instead makes the pre-round value BIT-IDENTICAL on any engine
    and any partition order: long sums are exact, and long/long division
    on identical operands yields identical doubles.  DuckDB twin:
    ``CAST(round(x * 100) AS BIGINT)``."""
    return F.round(c * 100, 0).cast("long")


def safe_div(num: Column, den: Column) -> Column:
    """F12: NULL on zero denominator (metrics.py:321-322 ``replace(0,nan)``).
    Explicit guard rather than relying on ANSI-off division semantics —
    Spark 4 ships with ANSI mode on, where x/0 raises."""
    return F.when(den == 0, F.lit(None)).otherwise(num / den)


def clip(c: Column, lo: float, hi: float) -> Column:
    """F7: clamp to [lo, hi] (z-clip ±3, metrics.py:117; sep clamp
    Phase3#cell18)."""
    return F.greatest(F.least(c, F.lit(hi)), F.lit(lo))


def euclidean(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """F1: 2-D Euclidean distance (preprocess.py:127,496-499)."""
    return F.sqrt(F.pow(x2 - x1, 2) + F.pow(y2 - y1, 2))


def bearing(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """F2: atan2 bearing from (x1,y1) toward (x2,y2) in radians
    (preprocess.py:132-134)."""
    return F.atan2(y2 - y1, x2 - x1)


def angular_diff(a: Column, b: Column) -> Column:
    """F5: wraparound angular difference in degrees — min(d, 360−d) on the
    absolute diff (routes.py:119-124)."""
    d = F.abs(a - b) % 360
    return F.least(d, F.lit(360.0) - d)


def flag(cond: Column) -> Column:
    """F11: boolean→int flag (is_catch / is_explosive, metrics.py:306-308)."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0))


def minmax_100(c: Column, cmin: Column, cmax: Column) -> Column:
    """F10: min-max 0–100 normalize with the reference's degenerate-range
    fallback of 50.0 (metrics.py:129-137, preprocess.py:30-36)."""
    return F.when(cmax == cmin, F.lit(50.0)).otherwise(
        100.0 * (c - cmin) / (cmax - cmin))


def zscore_expr(c: Column, mean: Column, std: Column,
                clip3: bool = False) -> Column:
    """W6 core: (c−mean)/std with divide-by-zero → 0.0 (metrics.py:113-114)
    and optional ±3 clip (metrics.py:117).  Pass stddev_pop aggregates for
    the reference's ddof=0 semantics (metrics.py:112)."""
    z = F.when((std == 0) | std.isNull(), F.lit(0.0)).otherwise((c - mean) / std)
    return clip(z, -3.0, 3.0) if clip3 else z


def piecewise_multiplier(sep: Column) -> Column:
    """F15: AirPlayIQ difficulty multiplier
    ``1 + 0.5*(1 − (clamp(sep, .5, 2) − .5)/1.5)``
    (Phase3_Metrics.ipynb#cell18:246-247) as a native expression."""
    clamped = clip(sep, 0.5, 2.0)
    return 1.0 + 0.5 * (1.0 - (clamped - 0.5) / 1.5)
