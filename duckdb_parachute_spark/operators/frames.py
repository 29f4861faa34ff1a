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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    w_idx = Window.partitionBy(*part).orderBy(order)
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
    return df.join(framed, [*part, order])


def exclude_sums(
    df: DataFrame,
    part: list[str],
    order: str,
    value: Column,
) -> DataFrame:
    """All three EXCLUDE modes of sum(value) over the full-partition frame,
    as columns excl_current / excl_group / excl_ties."""
    w_part = Window.partitionBy(*part)
    w_peers = Window.partitionBy(*part, order)
    total = F.sum(value).over(w_part)
    peers = F.sum(value).over(w_peers)
    return (
        df.withColumn("__v", value)
        .withColumn("excl_current", total - F.col("__v"))
        .withColumn("excl_group", total - peers)
        .withColumn("excl_ties", total - peers + F.col("__v"))
        .drop("__v")
    )
