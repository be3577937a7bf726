"""M8: leakage-safe group split (BDB_2026.ipynb#cell91 — 80/20 by game).

The reference shuffles unique game_ids on the driver; at scale that is a
collect.  Here the split is a deterministic hash of the group key — every
executor computes membership locally, no driver round-trip, and the split
is stable across runs and cluster sizes (crc32 is identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_split(df: DataFrame, group_col: str, val_fraction: float = 0.2,
                out: str = "split", salt: str = "bdb") -> DataFrame:
    """Tag each row train/val by hashing its group key: all rows of a group
    land on the same side (leakage-safe).  crc32(concat(salt, key)) % 1000
    gives a uniform bucket; buckets below val_fraction*1000 are val."""
    bucket = F.crc32(F.concat(F.lit(salt), F.col(group_col).cast("string"))) % 1000
    return df.withColumn(
        out, F.when(bucket < int(val_fraction * 1000), "val").otherwise("train"))
