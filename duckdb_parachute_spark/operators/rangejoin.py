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


def inequality_join(
    left: DataFrame,
    right: DataFrame,
    left_axis: Column,
    right_axis: Column,
    bin_width: float,
    strict: bool = True,
    extra: Column | None = None,
) -> DataFrame:
    """Distributed theta-join on ``left_axis < right_axis`` (the IEJoin /
    piecewise-merge case — reference physical_iejoin.cpp:1057,
    physical_piecewise_merge_join.cpp) via bucket replication.

    Catalyst's only native plan for a pure-inequality join is
    BroadcastNestedLoopJoin — O(|L|·|R|) and broadcast-bound. The scale plan
    quantizes the comparison axis into fixed-width bins and turns the
    inequality into an EQUI join: a left row in bin i matches right rows in
    bins [i, max_bin], so the left side is replicated once per candidate bin
    (fan-out ≤ axis_range / bin_width), hash-joined on the bin id, and the
    exact predicate re-checked. Work and shuffle volume are linear in
    |L|·fan_out + |R| — pick ``bin_width`` ≈ axis_range / 16..64 to trade
    replication against false candidate pairs. Same co-location idea as the
    reference's merge-join range partitioning, expressed as one hash shuffle.

    ``right_axis``'s max is fetched with a scalar aggregate (one tiny driver
    round-trip, like the IVF probe's centroid ids — never data-sized).
    ``extra`` is any additional join predicate, applied after the equi join
    (the second inequality of an IEJoin goes here).
    """
    l_bin = bin_of(left_axis, bin_width)
    r_bin = bin_of(right_axis, bin_width)
    bounds = right.select(F.min(r_bin).alias("lo"), F.max(r_bin).alias("hi")).head()
    if bounds is None or bounds.hi is None:
        return left.join(right, F.lit(False))  # empty right side
    # A left outlier far below the right range must not expand into one bin
    # per unit of the gap (a single giant F.sequence array = per-task OOM):
    # bins below the right MIN match every right row ≥ min anyway, so clamp
    # the sequence start to the right side's min bin.
    n_bins = int(bounds.hi) - int(bounds.lo) + 1
    if n_bins > 1_000_000:
        raise ValueError(
            f"inequality_join: right axis spans {n_bins} bins at "
            f"bin_width={bin_width}; increase bin_width (≈ axis_range/64) to "
            "bound the per-row replication fan-out"
        )
    top = F.lit(int(bounds.hi))
    start = F.greatest(l_bin, F.lit(int(bounds.lo)))
    # sequence(start, stop) runs DESCENDING when start > stop — rows beyond
    # the right side's max bin must emit no candidates instead.
    bins = F.when(l_bin <= top, F.sequence(start, top)).otherwise(F.array().cast("array<long>"))
    lf = left.withColumn(_BIN, F.explode(bins))
    rf = right.withColumn(_BIN, r_bin)
    exact = left_axis < right_axis if strict else left_axis <= right_axis
    if extra is not None:
        exact = exact & extra
    return lf.join(rf, on=[_BIN], how="inner").where(exact).drop(_BIN)
