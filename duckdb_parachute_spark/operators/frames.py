"""Window-frame modes Spark lacks: GROUPS frames and EXCLUDE clauses.

Reference: WindowBoundary GROUPS variants and WindowExcludeMode
(src/include/duckdb/parser/expression/window_expression.hpp:16-33, executors
src/function/window/). Spark's Window API supports only ROWS and RANGE frames
with no EXCLUDE — both are rewritten here into compositions of native window
aggregates, staying fully JVM-side:

- GROUPS frame: aggregate the peer groups first (one row per distinct ORDER
  value), index them with row_number, run the frame as a ROWS frame over the
  grouped table, and join back to the base rows on the order value. Cost: one
  extra aggregation + a (usually broadcastable) join — no data explosion.
- EXCLUDE over a full-partition frame: arithmetic on three native sums —
  partition total, peer-group sum, current value:
    EXCLUDE CURRENT ROW = total - value
    EXCLUDE GROUP       = total - peer_sum
    EXCLUDE TIES        = total - peer_sum + value
- EXCLUDE over a BOUNDED ROWS frame (round 6): peers (rows tied on the
  ORDER value) are CONTIGUOUS in the sort, so the peer members inside the
  global frame [i-p, i+f] are exactly a p-PRECEDING/f-FOLLOWING ROWS frame
  inside the peer partition. Two native window sums — one over the global
  frame, one over the peer-partitioned frame — give all three modes by
  arithmetic, no joins, no data movement beyond the one partition sort.
- Arbitrary aggregates over GROUPS frames (round 6): partial-combinable
  aggregates (sum/count/avg/min/max) combine per-peer-group partials under
  the ROWS frame; holistic aggregates get the frame's values as a flattened
  array (groups_frame_collect) and evaluate as an array expression — the
  same raw-value re-aggregation the reference's segment tree performs
  (src/function/window/window_segment_tree.cpp), expressed as Catalyst
  higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_key(order: str) -> Column:
    """ORDER key with DuckDB's default NULL placement (ASC ⇒ NULLS LAST;
    Spark's default is NULLS FIRST) so the NULL peer group lands at the same
    frame position as the oracle's."""
    return F.col(order).asc_nulls_last()


def _join_back(df: DataFrame, framed: DataFrame, keys: list[str]) -> DataFrame:
    """Join frame results back to the base rows NULL-SAFELY: rows whose
    partition/ORDER key is NULL form a real peer group in SQL GROUPS frames,
    so the join-back must use IS NOT DISTINCT FROM, not plain equality
    (which silently drops NULL-keyed rows)."""
    renamed = framed
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__rk_{k}")
    cond = None
    for k in keys:
        c = df[k].eqNullSafe(renamed[f"__rk_{k}"])
        cond = c if cond is None else cond & c
    return df.join(renamed, cond).drop(*[f"__rk_{k}" for k in keys])


def groups_frame_sum(
    df: DataFrame,
    part: list[str],
    order: str,
    value: Column,
    preceding: int,
    following: int,
    out: str = "groups_sum",
) -> DataFrame:
    """sum(value) OVER (PARTITION BY part ORDER BY order
    GROUPS BETWEEN preceding PRECEDING AND following FOLLOWING).

    A GROUPS frame counts whole peer groups (distinct ORDER values), which no
    Spark frame mode expresses. Rewrite: per-group partial sums + ROWS frame
    over the group table + join back."""
    grouped = df.groupBy(*part, order).agg(F.sum(value).alias("__gs"))
    w_idx = Window.partitionBy(*part).orderBy(_order_key(order))
    w_frame = (
        Window.partitionBy(*part)
        .orderBy("__gi")
        .rowsBetween(-preceding, following)
    )
    framed = (
        grouped.withColumn("__gi", F.row_number().over(w_idx))
        .withColumn(out, F.sum("__gs").over(w_frame))
        .drop("__gs", "__gi")
    )
    return _join_back(df, framed, [*part, order])


def groups_frame_agg(
    df: DataFrame,
    part: list[str],
    order: str,
    value: Column,
    preceding: int,
    following: int,
    prefix: str = "groups_",
) -> DataFrame:
    """sum/count/avg/min/max of ``value`` over a GROUPS frame, as columns
    ``{prefix}sum`` / ``{prefix}count`` / ``{prefix}avg`` / ``{prefix}min``
    / ``{prefix}max``.

    Generalizes groups_frame_sum to every partial-combinable aggregate: the
    peer groups are pre-aggregated to (sum, count, min, max) partials, the
    ROWS frame over the group table combines partials, and the result joins
    back on the order value. avg is the exact sum/count quotient at the
    final grain (never an average of averages)."""
    grouped = df.groupBy(*part, order).agg(
        F.sum(value).alias("__s"),
        F.count(value).alias("__c"),
        F.min(value).alias("__mn"),
        F.max(value).alias("__mx"),
    )
    w_idx = Window.partitionBy(*part).orderBy(_order_key(order))
    w_frame = Window.partitionBy(*part).orderBy("__gi").rowsBetween(-preceding, following)
    framed = (
        grouped.withColumn("__gi", F.row_number().over(w_idx))
        .withColumn(f"{prefix}sum", F.sum("__s").over(w_frame))
        .withColumn(f"{prefix}count", F.sum("__c").over(w_frame))
        .withColumn(f"{prefix}min", F.min("__mn").over(w_frame))
        .withColumn(f"{prefix}max", F.max("__mx").over(w_frame))
        # all-NULL frames have count 0: avg must be NULL, and the division
        # must not fire under ANSI mode.
        .withColumn(
            f"{prefix}avg",
            F.when(
                F.col(f"{prefix}count") > 0,
                F.col(f"{prefix}sum").cast("double") / F.col(f"{prefix}count"),
            ),
        )
        .drop("__s", "__c", "__mn", "__mx", "__gi")
    )
    return _join_back(df, framed, [*part, order])


def groups_frame_collect(
    df: DataFrame,
    part: list[str],
    order: str,
    value: Column,
    preceding: int,
    following: int,
    out: str = "groups_vals",
) -> DataFrame:
    """The raw values of a GROUPS frame as an array column ``out`` — the
    holistic-aggregate path (median/quantile/mode run as array expressions
    over it). Peer groups collect their values once; the ROWS frame over
    the group table concatenates the per-group arrays.

    Memory ceiling: each output row materializes its ENTIRE frame as one
    array, so per-row cost is O(frame width) — the same raw-value
    re-aggregation the reference's segment tree performs per frame, but held
    in a single array value. A frame spanning k peer groups of ~m rows each
    costs k*m elements per row; keep preceding+following bounded (hundreds
    of groups, not 10^6) or switch the aggregate to the partial-combinable
    path (groups_frame_agg) which carries O(1) state per group. Width
    behavior is pinned by test_groups_frame_collect_wide_frame."""
    grouped = df.groupBy(*part, order).agg(F.collect_list(value).alias("__vals"))
    w_idx = Window.partitionBy(*part).orderBy(_order_key(order))
    w_frame = Window.partitionBy(*part).orderBy("__gi").rowsBetween(-preceding, following)
    framed = (
        grouped.withColumn("__gi", F.row_number().over(w_idx))
        .withColumn(out, F.flatten(F.collect_list("__vals").over(w_frame)))
        .drop("__vals", "__gi")
    )
    return _join_back(df, framed, [*part, order])


def array_median(arr: Column) -> Column:
    """Exact median of a numeric array (lower/upper-middle average on even
    counts — the reference's quantile_cont at 0.5), as a pure expression."""
    sorted_arr = F.array_sort(arr)
    n = F.size(sorted_arr)
    lo = F.element_at(sorted_arr, ((n + 1) / 2).cast("int")).cast("double")
    hi = F.element_at(sorted_arr, ((n + 2) / 2).cast("int")).cast("double")
    return (lo + hi) / 2


def exclude_rows_sums(
    df: DataFrame,
    part: list[str],
    order: str,
    value: Column,
    preceding: int,
    following: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """All three EXCLUDE modes of sum(value) over a BOUNDED
    ROWS BETWEEN preceding PRECEDING AND following FOLLOWING frame, as
    columns excl_current / excl_group / excl_ties.

    Identity: rows tied on the ORDER value sort contiguously, so the frame's
    intersection with the current row's peer group is itself a
    p-PRECEDING/f-FOLLOWING ROWS frame within the peer partition. Hence
        frame_sum  = sum OVER (part          ORDER BY idx ROWS p..f)
        peer_part  = sum OVER (part ∪ {order} ORDER BY idx ROWS p..f)
        EXCLUDE CURRENT ROW = frame_sum - value
        EXCLUDE GROUP       = frame_sum - peer_part
        EXCLUDE TIES        = frame_sum - peer_part + value
    — two native window sums, zero joins.

    ROWS-frame results are only well-defined up to tie order; pass
    ``tiebreak`` columns to pin a total order (both sums share the one idx,
    so the output is always self-consistent regardless).

    NULL discipline (round 7): sum() ignores NULL inputs, so a NULL current
    value contributes nothing — the subtraction identities coalesce NULL
    operands to 0 rather than propagate — while an aggregate over an EMPTY
    post-exclusion frame (no non-NULL values left) is NULL, gated by the
    non-NULL counts."""
    tb = tiebreak or []
    w_idx = Window.partitionBy(*part).orderBy(_order_key(order), *tb)
    d = df.withColumn("__idx", F.row_number().over(w_idx)).withColumn("__v", value)
    w_global = Window.partitionBy(*part).orderBy("__idx").rowsBetween(-preceding, following)
    w_peer = (
        Window.partitionBy(*part, order).orderBy("__idx").rowsBetween(-preceding, following)
    )
    v = F.col("__v")
    v0 = F.coalesce(v, F.lit(0))
    v_nn = F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    frame_sum = F.coalesce(F.sum("__v").over(w_global), F.lit(0))
    peer_part = F.coalesce(F.sum("__v").over(w_peer), F.lit(0))
    frame_cnt = F.count("__v").over(w_global)  # non-NULL values in the frame
    peer_cnt = F.count("__v").over(w_peer)
    return (
        d.withColumn(
            "excl_current",
            F.when(frame_cnt - v_nn > 0, frame_sum - v0),
        )
        .withColumn("excl_group", F.when(frame_cnt > peer_cnt, frame_sum - peer_part))
        .withColumn(
            "excl_ties",
            F.when(frame_cnt - peer_cnt + v_nn > 0, frame_sum - peer_part + v0),
        )
        .drop("__idx", "__v")
    )


def exclude_sums(
    df: DataFrame,
    part: list[str],
    order: str,
    value: Column,
) -> DataFrame:
    """All three EXCLUDE modes of sum(value) over the full-partition frame,
    as columns excl_current / excl_group / excl_ties. Same NULL discipline
    as exclude_rows_sums: NULL values contribute 0 to the sums (coalesced,
    not propagated), and a post-exclusion frame with no non-NULL values
    yields NULL (count-gated).

    Scale formulation (round 9): the full-partition frame needs only the
    PARTITION total and the PEER-GROUP total per row, so both are computed
    as ordinary groupBy aggregates (map-side partial combine) and joined
    back null-safely — ONE fact-side shuffle, parallelism = shuffle
    partitions. The previous Window.partitionBy(part) spelling forced every
    partition into a single task: with a low-cardinality partition key
    (the common case for EXCLUDE analytics) that caps parallelism at
    #groups regardless of cluster size. Totals are a second-level rollup of
    the (small) peer table, never a second fact pass."""
    keys = [*part, order]
    d = df.withColumn("__v", value)
    kcols = [f"__k{i}" for i in range(len(keys))]
    peers = (
        d.select(*[F.col(k).alias(a) for k, a in zip(keys, kcols)], "__v")
        .groupBy(*kcols)
        .agg(F.sum("__v").alias("__ps"), F.count("__v").alias("__pc"))
    )
    totals = peers.groupBy(*kcols[:-1]).agg(
        F.sum("__ps").alias("__ts"), F.sum("__pc").alias("__tc")
    )
    # peer-grain table with partition totals attached (small ⋈ small; the
    # part-grain side is a rollup of the peer side, so AQE broadcasts it)
    peer_tot = peers.join(
        totals.select(*[F.col(a).alias(f"__t{i}") for i, a in enumerate(kcols[:-1])], "__ts", "__tc"),
        [F.col(a).eqNullSafe(F.col(f"__t{i}")) for i, a in enumerate(kcols[:-1])]
        or [F.lit(True)],
    ).drop(*[f"__t{i}" for i in range(len(kcols) - 1)])
    cond = [F.col(k).eqNullSafe(F.col(a)) for k, a in zip(keys, kcols)]
    d = d.join(peer_tot, cond, "left").drop(*kcols)
    v = F.col("__v")
    v0 = F.coalesce(v, F.lit(0))
    v_nn = F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    total = F.coalesce(F.col("__ts"), F.lit(0))
    peers_s = F.coalesce(F.col("__ps"), F.lit(0))
    total_cnt = F.col("__tc")
    peer_cnt = F.col("__pc")
    return (
        d.withColumn("excl_current", F.when(total_cnt - v_nn > 0, total - v0))
        .withColumn("excl_group", F.when(total_cnt > peer_cnt, total - peers_s))
        .withColumn(
            "excl_ties",
            F.when(total_cnt - peer_cnt + v_nn > 0, total - peers_s + v0),
        )
        .drop("__v", "__ps", "__pc", "__ts", "__tc")
    )
