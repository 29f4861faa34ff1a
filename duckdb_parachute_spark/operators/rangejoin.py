"""Binned range join — the scale path for inequality/interval joins.

Reference: single-inequality joins plan PhysicalPiecewiseMergeJoin
(physical_piecewise_merge_join.cpp), two-inequality (interval containment)
joins plan PhysicalIEJoin (physical_iejoin.cpp). Catalyst has neither: a
non-equi join falls back to BroadcastNestedLoopJoin, which is O(|L|·|R|)
and only viable when one side is tiny.

The distributed strategy here turns "point ∈ [lo, hi]" into an EQUI join:
quantize the axis into fixed-width bins, emit each interval once per bin it
overlaps (bounded fan-out = interval_width / bin_width + 1), hash-join on
(bin [, extra equi keys]) and re-check the exact predicate. Work and shuffle
volume are linear in input size + overlap count — the same co-location idea
as the reference's merge-join partitioning, expressed as Spark shuffles.

Pick ``bin_width`` ≈ the typical interval width: smaller bins → more
interval duplicates; larger bins → more false candidate pairs filtered
after the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def bin_of(col: Column, bin_width: float) -> Column:
    return F.floor(col.cast("double") / F.lit(float(bin_width))).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bin_width: float,
    by: list[str] | None = None,
    lo_open: bool = False,
    hi_open: bool = False,
) -> DataFrame:
    """Join point rows to interval rows with point ∈ [lo, hi] (bounds
    configurable open/closed), plus optional extra equi keys ``by``.

    All three axis columns must be numeric (cast timestamps to epoch units
    first). Returns the joined frame with both sides' columns; the join is a
    plain shuffled hash join on (by…, bin) at any scale — no nested loop.
    """
    by = list(by or [])
    p = points.withColumn(_BIN, bin_of(F.col(point), bin_width))
    iv = intervals.withColumn(
        _BIN, F.explode(F.sequence(bin_of(F.col(lo), bin_width), bin_of(F.col(hi), bin_width)))
    )
    lo_ok = F.col(point) > F.col(lo) if lo_open else F.col(point) >= F.col(lo)
    hi_ok = F.col(point) < F.col(hi) if hi_open else F.col(point) <= F.col(hi)
    joined = p.join(iv, on=by + [_BIN], how="inner").where(lo_ok & hi_ok)
    return joined.drop(_BIN)
