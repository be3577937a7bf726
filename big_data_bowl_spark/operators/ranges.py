"""Interval (range) joins: pair left rows with right-side time intervals
that contain them.

The reference never needs one (its frame alignment is exact equality,
SURVEY §2.3), but any event-time pipeline does — attribution windows,
error-blast-radius, validity intervals.  Two physical strategies behind
one contract:

- **naive**: equi keys + the containment predicate ride one join.  Fine
  when equi keys keep per-key groups small; with NO equi keys Spark can
  only plan a broadcast-nested-loop — quadratic, dead at scale.
- **bucketed** (the 100 TB path): quantize time into width-W buckets,
  assign each left row its single bucket, explode each right interval
  into the buckets it overlaps, equi-join on (keys…, bucket), then apply
  the exact containment filter.  Join fan-in is bounded by rows-per-
  bucket instead of rows-per-key (or rows-squared); the explode factor
  is ceil(interval/W)+1, so pick W near the typical interval length.
  This is the binning strategy native range joins (DuckDB, Photon) use
  internally, expressed as a plain Catalyst-optimizable equi-join.

Bucket assignment uses second-truncated epochs on BOTH sides, so
``t <= e  ⇒  bucket(t) <= end_bucket(e)`` — coverage is exact, and the
containment filter (on the raw timestamps) decides correctness alone.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BKT = "_ij_bkt"


def _all(conds: list[Column]) -> Column:
    return reduce(lambda a, b: a & b, conds)


def interval_join(left: DataFrame, right: DataFrame, *,
                  left_ts: str, right_start: str, right_end: str,
                  on: list[tuple[str, str]], payload: list[str],
                  bucket_seconds: int | None = 21600) -> DataFrame:
    """Rows of ``left`` paired with rows of ``right`` whose
    ``[right_start, right_end]`` interval contains ``left[left_ts]``
    (inclusive both ends), matching on the ``on`` equi-key pairs.

    Output: all ``left`` columns + the named right ``payload`` columns
    (caller renames collisions first).  ``bucket_seconds=None`` selects
    the naive plan; an int selects the bucketed plan with that width.
    """
    if bucket_seconds is not None:
        width = F.lit(int(bucket_seconds))
        left = left.withColumn(
            _BKT, F.floor(F.unix_timestamp(left_ts) / width))
        right = (right.withColumn(_BKT, F.explode(F.sequence(
                     F.floor(F.unix_timestamp(right_start) / width),
                     F.floor(F.unix_timestamp(right_end) / width)))))
    l, r = left.alias("l"), right.alias("r")
    conds = [F.col(f"l.{a}") == F.col(f"r.{b}") for a, b in on]
    if bucket_seconds is not None:
        conds.append(F.col(f"l.{_BKT}") == F.col(f"r.{_BKT}"))
    conds += [F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}"),
              F.col(f"l.{left_ts}") <= F.col(f"r.{right_end}")]
    out = l.join(r, _all(conds))
    keep = [F.col(f"l.{c}") for c in left.columns if c != _BKT]
    keep += [F.col(f"r.{c}") for c in payload]
    return out.select(*keep)
