"""AS-OF join: nearest-predecessor (or successor) match on an ordering key.

Reference semantics: PhysicalAsOfJoin
(src/execution/operator/join/physical_asof_join.cpp, planned at
src/execution/physical_plan/plan_asof_join.cpp:13-40; behavior spec
test/sql/join/asof/test_asof_join.test): for each left row, join the single
right row with the greatest right.ts <= left.ts (backward; 'forward' takes the
least right.ts >= left.ts), optionally within equality partitions and a
tolerance.

Spark-first strategy (the flagship custom operator, SURVEY §2.3): UNION the
tagged right rows into the left stream, shuffle ONCE on the partition keys,
sort within partitions by (ts, side), and propagate the most recent right-side
payload with last(..., ignorenulls=True) over an unbounded-preceding window.
Cost at 100 TB: exactly one shuffle of (|L| + |R|) rows — same asymptotics as
a shuffled join, no range explosion, skew handled by AQE. A broadcast variant
is unnecessary: when R is small the union stream is dominated by L either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_on: str | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
    how: str = "left",
) -> DataFrame:
    """AS-OF join `left` to `right`.

    on/right_on: ordering columns (right_on defaults to `on`).
    by: equality partition keys (same names on both sides).
    direction: 'backward' (greatest right ts <= left ts) or 'forward'.
    tolerance: max |left.ts - right.ts| as a Column-compatible literal
        (same type as the ordering key difference), e.g. F.expr("INTERVAL 1 HOUR")
        for timestamps or a number for numeric keys.
    how: 'left' keeps unmatched left rows (right payload NULL), 'inner' drops.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by = by or []
    right_on = right_on or on

    lcols = left.columns
    rcols = [c for c in right.columns if c not in by]
    payload = [c for c in rcols if c != right_on]
    out_names = {c: (c + suffix if c in lcols else c) for c in rcols}

    # Tag and align the two sides into one schema:
    #   __ts: ordering key, __side: 0=right, 1=left (right sorts first on ties,
    #   so a right row at ts T is visible to a left row at the same T — the
    #   reference's >= semantics).
    lt = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in by],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_on].dataType).alias("__r_ts"),
    )
    rt = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by],
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(right_on).alias("__r_ts"),
    )
    if direction == "forward":
        # Mirror the ordering: forward-asof is backward-asof on the reversed
        # axis. Sort descending; right rows at equal ts must still win -> side
        # ordering unchanged.
        unioned = lt.unionByName(rt)
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        unioned = lt.unionByName(rt)
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    filled = unioned.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in payload],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__f_ts"),
    )
    out = filled.where(F.col("__side") == 1)

    matched = F.col("__f_ts").isNotNull()
    if tolerance is not None:
        if direction == "backward":
            matched = matched & (F.col("__ts") - F.col("__f_ts") <= tolerance)
        else:
            matched = matched & (F.col("__f_ts") - F.col("__ts") <= tolerance)

    proj = [F.col(c) for c in by] + [F.col("__ts").alias(on)] + [
        F.col(c) for c in lcols if c not in by and c != on
    ]
    proj += [
        F.when(matched, F.col(f"__f_{c}")).alias(out_names[c]) for c in payload
    ]
    proj += [F.when(matched, F.col("__f_ts")).alias(out_names[right_on])]
    out = out.select(*proj)
    if how == "inner":
        out = out.where(F.col(out_names[right_on]).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be left|inner, got {how}")
    return out
