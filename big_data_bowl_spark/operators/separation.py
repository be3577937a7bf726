"""Separation operators — the reference's distinctive within-group
cross-join family (SURVEY §2.3 J6/J7/J8), generalized.

Reference sites:
- compute_catch_separation (preprocess.py:441-513): offense × defense at the
  catch frame, min Euclidean distance per offensive player.
- compute_initial_separation_at_throw (preprocess.py:330-402): same at the
  throw frame (max input frame).
- calculate_defender_separation (BDB_2026.ipynb#cell69): per-frame variant,
  written as a Python nested loop flagged "This may take a minute..." — here
  it is the SAME equi-join keyed one level deeper (frame included), which is
  both correct and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import euclidean
from .joins import nearest_in_group
from .windows import argmax_rows


def separation_at_frame(tracking: DataFrame, group: list[str],
                        entity: str, side_col: str,
                        left_side: str, right_side: str,
                        x: str = "x", y: str = "y",
                        per_frame: bool = False, frame: str = "frame_id",
                        default: float | None = None) -> DataFrame:
    """Min distance from each ``left_side`` entity to any ``right_side``
    entity, per group (optionally per frame).  J6/J7/J8 unified."""
    keys = group + ([frame] if per_frame else [])
    left = (tracking.filter(F.lower(F.col(side_col)) == left_side.lower())
                    .select(*keys, entity, x, y))
    right = (tracking.filter(F.lower(F.col(side_col)) == right_side.lower())
                     .select(*keys,
                             F.col(x).alias("__rx"), F.col(y).alias("__ry")))
    dist = euclidean(F.col(f"l.{x}"), F.col(f"l.{y}"),
                     F.col("r.__rx"), F.col("r.__ry"))
    return nearest_in_group(left, right, keys, entity, dist,
                            out="separation", default=default,
                            right_cols=["__rx", "__ry"])


def separation_at_max_frame(tracking: DataFrame, group: list[str],
                            entity: str, side_col: str,
                            left_side: str, right_side: str,
                            frame: str = "frame_id",
                            **kw) -> DataFrame:
    """J7: restrict to the argmax frame per group (throw/catch frame, W8),
    then compute separation there."""
    at_frame = argmax_rows(tracking, frame, group)
    return separation_at_frame(at_frame, group, entity, side_col,
                               left_side, right_side, **kw)


def _grid_best(p: DataFrame, width: float,
               max_d2: float | None = None,
               carry: tuple[str, ...] = (),
               predicate=None) -> DataFrame:
    """Best (min-d², min-id tie-break) candidate per point among the 3×3
    ``width``-cell neighborhood — the shared kernel of both refinement
    levels.  Probes replicate 9×, join the cell key exactly (plain
    equi-join, never a cross join); ``max_d2`` optionally filters pairs
    (the radius bound of the coarse level).  ``carry`` threads extra
    columns through both sides (as __q_<c> / __n_<c>) and ``predicate``
    (a 0-arg callable returning a Column over those) restricts the
    candidate SUBSET — e.g. hard-negative mining's label mismatch.  The
    two-level refinement stays exact for any such row predicate: the
    subset is identical at both levels, so the L∞ block bound applies
    unchanged.  Input ``p`` carries (__id, __x, __y, *carry).
    Returns (__qid, __nid, __d2)."""
    c = (p.withColumn("__cx", F.floor(F.col("__x") / width))
          .withColumn("__cy", F.floor(F.col("__y") / width)))
    offsets = F.array(*[F.struct(F.lit(dx).alias("ox"),
                                 F.lit(dy).alias("oy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    probes = (c.withColumn("__o", F.explode(offsets))
                .select(F.col("__id").alias("__qid"),
                        F.col("__x").alias("__qx"),
                        F.col("__y").alias("__qy"),
                        (F.col("__cx") + F.col("__o.ox")).alias("__jx"),
                        (F.col("__cy") + F.col("__o.oy")).alias("__jy"),
                        *[F.col(cc).alias(f"__q_{cc}") for cc in carry]))
    src = c.select(F.col("__id").alias("__nid"), "__x", "__y",
                   F.col("__cx").alias("__jx"), F.col("__cy").alias("__jy"),
                   *[F.col(cc).alias(f"__n_{cc}") for cc in carry])
    dist2 = ((F.col("__qx") - F.col("__x"))
             * (F.col("__qx") - F.col("__x"))
             + (F.col("__qy") - F.col("__y"))
             * (F.col("__qy") - F.col("__y")))
    pairs = (probes.join(src, ["__jx", "__jy"])
                   .filter(F.col("__qid") != F.col("__nid"))
                   .withColumn("__d2", dist2))
    if predicate is not None:
        pairs = pairs.filter(predicate())
    if max_d2 is not None:
        pairs = pairs.filter(F.col("__d2") <= F.lit(max_d2))
    from pyspark.sql import Window
    w = Window.partitionBy("__qid").orderBy(F.asc("__d2"), F.asc("__nid"))
    return (pairs.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1)
                 .select("__qid", "__nid", "__d2"))


def grid_nearest(points: DataFrame, radius: float,
                 id_col: str = "id", x_col: str = "x",
                 y_col: str = "y", refine: int = 8,
                 carry: tuple[str, ...] = (),
                 predicate=None) -> DataFrame:
    """Nearest neighbor within ``radius``, grid-bucketed — the
    UNBOUNDED-scale form of the within-group separation join: where
    J6/J8 bound the quadratic blow-up by the play key (≤22 players), this
    bounds it by a spatial cell key.  Each point lands in cell
    (⌊x/w⌋, ⌊y/w⌋); any neighbor within w is necessarily in the 3×3 cell
    neighborhood, so probes replicate 9× and join the cell key exactly —
    a plain equi-join, never a cross join.  EXACT for the radius-bounded
    semantics (a true nearest neighbor farther than r is reported as no
    row).

    TWO-LEVEL density refinement (``refine`` > 1, r8 — added after the
    sf1.0 stress sweep measured the single-level form going quadratic in
    DENSITY: candidate pairs ∝ Σ_cell pop², so 10× points in the same
    box cost 100×).  Level 1 probes FINE cells of width w = radius/refine
    and RESOLVES every point whose best fine candidate is within w: any
    point outside the 3×3 fine block is at L∞ > w ≥ d, so that candidate
    is the global nearest — exactly.  Only the unresolved residue (best
    fine candidate farther than w, or none — the sparse tail) escalates
    to the coarse radius-width level against the full table.  In dense
    data nearly everything resolves fine (measured: 19 998/20 000 at the
    10× stress SF, candidate volume ÷29 at refine=8; 96% even at sf0.1),
    and level-1 cost is ∝ Σ pop_fine² ≈ Σ pop²/refine² — density
    quadratic damped by refine², with the ladder exactness-preserving.
    ``refine=1`` is the plain single-level form.

    Distances compare in double (coordinates cast on extraction) with
    the neighbor id as tie-break, so the selection is deterministic and
    engine-reproducible — ties at equal d² sit inside the same fine
    block, so both levels pick the same winner and the refined result
    EQUALS the single-level result row-for-row (property-tested).
    Returns (``id_col``, neighbor_id, dist).
    """
    require = [id_col, x_col, y_col, *carry]
    from ..schemas import require_columns
    require_columns(points, require, "grid_nearest")
    p = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        *carry)
    r2 = float(radius) * float(radius)

    def fmt(best):
        return best.select(F.col("__qid").alias(id_col),
                           F.col("__nid").alias("neighbor_id"),
                           F.round(F.sqrt("__d2"), 6).alias("dist"))

    if refine <= 1:
        return fmt(_grid_best(p, float(radius), max_d2=r2,
                              carry=carry, predicate=predicate))
    w = float(radius) / refine
    fine = _grid_best(p, w, carry=carry,
                      predicate=predicate).localCheckpoint(eager=True)
    resolved = fine.filter(F.col("__d2") <= F.lit(w * w))
    residue = p.join(resolved.select(F.col("__qid").alias("__id")),
                     "__id", "left_anti")
    coarse = _grid_best_against(residue, p, float(radius), max_d2=r2,
                                carry=carry, predicate=predicate)
    return fmt(resolved).unionByName(fmt(coarse))


def _grid_best_against(queries: DataFrame, corpus: DataFrame,
                       width: float, max_d2: float,
                       carry: tuple[str, ...] = (),
                       predicate=None) -> DataFrame:
    """Coarse escalation level: best corpus candidate per QUERY point
    (queries ⊆ corpus, both carrying __id/__x/__y/*carry) among the 3×3
    ``width``-cell neighborhood — same kernel as :func:`_grid_best` but
    with an asymmetric probe side, so the escalated residue never
    re-scans its own cross-pairs against itself twice."""
    cx, cy = F.floor(F.col("__x") / width), F.floor(F.col("__y") / width)
    offsets = F.array(*[F.struct(F.lit(dx).alias("ox"),
                                 F.lit(dy).alias("oy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    probes = (queries.withColumn("__cx", cx).withColumn("__cy", cy)
              .withColumn("__o", F.explode(offsets))
              .select(F.col("__id").alias("__qid"),
                      F.col("__x").alias("__qx"),
                      F.col("__y").alias("__qy"),
                      (F.col("__cx") + F.col("__o.ox")).alias("__jx"),
                      (F.col("__cy") + F.col("__o.oy")).alias("__jy"),
                      *[F.col(cc).alias(f"__q_{cc}") for cc in carry]))
    src = (corpus.withColumn("__cx", cx).withColumn("__cy", cy)
           .select(F.col("__id").alias("__nid"), "__x", "__y",
                   F.col("__cx").alias("__jx"),
                   F.col("__cy").alias("__jy"),
                   *[F.col(cc).alias(f"__n_{cc}") for cc in carry]))
    dist2 = ((F.col("__qx") - F.col("__x"))
             * (F.col("__qx") - F.col("__x"))
             + (F.col("__qy") - F.col("__y"))
             * (F.col("__qy") - F.col("__y")))
    pairs = (probes.join(src, ["__jx", "__jy"])
                   .filter(F.col("__qid") != F.col("__nid"))
                   .withColumn("__d2", dist2))
    if predicate is not None:
        pairs = pairs.filter(predicate())
    pairs = pairs.filter(F.col("__d2") <= F.lit(max_d2))
    from pyspark.sql import Window
    w = Window.partitionBy("__qid").orderBy(F.asc("__d2"), F.asc("__nid"))
    return (pairs.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1)
                 .select("__qid", "__nid", "__d2"))
