"""MERGE INTO / CDC upsert — the lakehouse write path Spark itself leaves
to table formats (Delta/Iceberg), expressed as a pure DataFrame plan.

A changes feed carries full rows plus an ``op`` column ('U' = upsert,
'D' = delete).  Applying it to a base snapshot is one full-outer join on
the key:

    base ⟗ changes  →  changed row if present and not a delete,
                        else the base row; delete rows vanish.

Scale notes (100 TB):
- The join shuffles both sides on the key — unavoidable for a general
  merge — but a base staged with ``stage_bucketed`` (sources/io.py) on the
  merge key arrives pre-distributed, so only the (much smaller) changes
  feed exchanges; that is exactly how Delta's partitioned merge behaves.
- Copy-on-write semantics: the result is a NEW snapshot; pair with
  ``stage_parquet`` to materialize it.  At real scale you'd partition the
  base and anti-join the changes' partition keys first so untouched
  partitions rewrite nothing; that pruning composes with this operator.
- AQE's skew-join splitting covers hot keys in either input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns


def merge_upsert(base: DataFrame, changes: DataFrame, keys: list[str],
                 op_col: str = "op", delete_op: str = "D") -> DataFrame:
    """Apply a CDC changes feed to a base snapshot (MERGE INTO semantics:
    WHEN MATCHED AND op='D' DELETE / WHEN MATCHED UPDATE / WHEN NOT
    MATCHED AND op<>'D' INSERT).  ``changes`` must carry every base column
    plus ``op_col``; the last version per key must already be resolved
    (use windows.dedup_keep_last upstream for multi-version feeds)."""
    require_columns(base, keys, "merge_upsert.base")
    require_columns(changes, [*keys, op_col], "merge_upsert.changes")
    data_cols = [c for c in base.columns if c not in keys]
    joined = base.alias("b").join(changes.alias("c"), on=keys,
                                  how="full_outer")
    present = F.col(f"c.{op_col}").isNotNull()
    kept = joined.filter(~present | (F.col(f"c.{op_col}") != delete_op))
    return kept.select(
        *[F.col(k) for k in keys],
        *[F.when(present, F.col(f"c.{x}")).otherwise(F.col(f"b.{x}"))
           .alias(x) for x in data_cols])
