"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the dominant cost is the scan, and the scan is only cheap when
file/row-group min-max statistics prune it.  Range-partitioning by ONE
column prunes filters on that column alone; interleaving the bits of TWO
(or more) normalized columns into a Z-value and range-partitioning by it
gives every interleaved dimension partial locality — a filter on either
column skips most files (the Delta/Iceberg OPTIMIZE ZORDER idea, built
here from plain Spark expressions: no UDF, no RDD).

The Z-value itself is deterministic integer arithmetic (min-max
normalize to ``bits`` bits via an aggregate + 1-row broadcast, then bit
interleave) — engine-reproducible, so it carries a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns


def _interleave2(x: Column, y: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-bit non-negative ints: bit b of x
    lands at 2b, bit b of y at 2b+1.  Unrolled to 2·bits constant shift/
    mask terms — pure integer exprs, whole-stage-codegen friendly."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.shiftleft(F.shiftrightunsigned(x, b).bitwiseAND(F.lit(1)),
                                2 * b)
        out = out + F.shiftleft(F.shiftrightunsigned(y, b).bitwiseAND(F.lit(1)),
                                2 * b + 1)
    return out


def with_zorder(df: DataFrame, col_x: str, col_y: str,
                bits: int = 16, out: str = "zval") -> DataFrame:
    """Append a Z-order value over two numeric columns.

    Normalization is min-max to ``[0, 2^bits)`` in exact BIGINT
    arithmetic (``(v − min) · (2^bits − 1) div (max − min)``) — bounds
    come from an aggregate + 1-row broadcast crossJoin (map-side
    combinable; no whole-partition window).  Constant columns normalize
    to 0.  Nulls propagate to a null Z-value (sorts first, harmless for
    layout)."""
    require_columns(df, [col_x, col_y], "with_zorder")
    top = F.lit((1 << bits) - 1).cast("long")
    ext = df.agg(F.min(col_x).cast("long").alias("__xlo"),
                 F.max(col_x).cast("long").alias("__xhi"),
                 F.min(col_y).cast("long").alias("__ylo"),
                 F.max(col_y).cast("long").alias("__yhi"))

    def norm(v: Column, lo: Column, hi: Column) -> Column:
        # exact BIGINT product, then floor-division — (v−lo)·top ≤
        # span·2^16 stays well inside double's 2^53 exact range, and
        # floor(a/b) on non-negatives matches DuckDB's // bit-for-bit
        span = hi - lo
        return F.when(span == 0, F.lit(0).cast("long")).otherwise(
            F.floor(((v.cast("long") - lo) * top) / span)).cast("long")

    zx = norm(F.col(col_x), F.col("__xlo"), F.col("__xhi"))
    zy = norm(F.col(col_y), F.col("__ylo"), F.col("__yhi"))
    return (df.crossJoin(F.broadcast(ext))
              .withColumn(out, _interleave2(zx, zy, bits))
              .drop("__xlo", "__xhi", "__ylo", "__yhi"))


def write_zordered(df: DataFrame, path: str, col_x: str, col_y: str,
                   n_files: int = 8, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Write parquet clustered on the Z-value of (col_x, col_y):
    ``repartitionByRange`` splits the Z-space into ``n_files`` contiguous
    ranges (one shuffle — a range exchange with a sampled boundary pass)
    and ``sortWithinPartitions`` keeps row groups tight, so parquet
    min-max stats on BOTH source columns become selective and a filter on
    either column prunes most files.  The helper column is dropped from
    the stored schema."""
    zdf = with_zorder(df, col_x, col_y, bits=bits, out="__z")
    (zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode).parquet(path))
