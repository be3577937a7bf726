"""Deterministic sampling operators for training-data pipelines.

Membership depends only on the row key (engine-neutral multiplicative
hash), never on ``rand()`` or partition layout — the property that makes
splits reproducible across engines, runs, and repartitions.  All
map-side: no shuffle beyond what the caller already has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns

HASH_MULT = 2654435761  # Knuth multiplicative constant (2^32 · φ)
HASH_MOD = 1 << 32


def hash_bucket(key_col) -> F.Column:
    """Uniform [0, 1) bucket from an integer key — explicit arithmetic so
    DuckDB / any engine computes the identical value.

    The key is reduced mod 2^32 BEFORE the multiply: (2^32−1)·HASH_MULT
    < 2^63, so the product never overflows int64.  Without the reduction,
    keys ≳ 3.5e9 overflow — Spark (ANSI off) wraps silently while DuckDB
    promotes to HUGEINT, silently breaking cross-engine reproducibility."""
    return (F.pmod(F.pmod(F.col(key_col), F.lit(HASH_MOD)) * F.lit(HASH_MULT),
                   F.lit(HASH_MOD))
            / F.lit(float(HASH_MOD)))


def stratified_hash_sample(df: DataFrame, key_col: str, group_col: str,
                           rates: dict[str, float],
                           default_rate: float = 0.0) -> DataFrame:
    """Per-group deterministic sampling: each group keeps its own fraction
    (e.g. downsample the dominant language, keep the tail whole).  The
    per-group rate is a broadcast when-chain on the group column — a pure
    map-side filter, so it composes with scan pushdown and never
    shuffles."""
    require_columns(df, [key_col, group_col], "stratified_hash_sample")
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_bucket(key_col) < rate)
