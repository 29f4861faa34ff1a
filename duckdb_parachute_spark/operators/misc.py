"""Small composite operators: DISTINCT ON, QUALIFY, positional join, top-N,
LIMIT PERCENT, deterministic sampling (SURVEY §2.3/§2.6 rewrites)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_on(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """DISTINCT ON (keys) ... ORDER BY — keep the first row per key group.

    Reference: DISTINCT ON planned as hash aggregate
    (src/execution/physical_plan/plan_distinct.cpp:88). Spark rewrite:
    row_number over (partition by keys order by order_by) = 1 — one shuffle on
    the keys, no materialized aggregate state for wide payloads."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def qualify(df: DataFrame, predicate: Column) -> DataFrame:
    """QUALIFY clause (reference bind_select_node.cpp:525): filter on a window
    expression — Spark lacks the clause; evaluating the window then filtering
    is the exact rewrite the reference binder performs."""
    return df.withColumn("__q", predicate).where(F.col("__q")).drop("__q")


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[Column] | None = None,
    right_order: list[Column] | None = None,
) -> DataFrame:
    """POSITIONAL JOIN (reference physical_positional_join.cpp): align two
    relations row-by-row.

    Spark has no inherent row order, so callers supply explicit orderings
    (matching the reference's insertion-order semantics requires the inputs to
    BE ordered); rows pair by 1-based position, outer-padding the shorter side
    with NULLs like the reference does. Round 7: positions come from the
    two-phase global_row_number (range shuffle + per-partition offsets), so
    numbering both sides never funnels through a single-partition
    WindowExec; the position join itself hash-partitions on __pos.

    Contract change with that rewrite: order lists are VALUE expressions
    (ascending; no .desc()/.asc() sort-order wrappers — those fail at
    analysis). Descending alignment is not expressible here — pre-negate
    or derive an ascending key instead."""
    from duckdb_parachute_spark.functions.scalar import global_row_number

    lt = global_row_number(left, left_order or [F.monotonically_increasing_id()], out="__pos")
    rt = global_row_number(right, right_order or [F.monotonically_increasing_id()], out="__pos")
    return lt.join(rt, "__pos", "full_outer").drop("__pos")


def top_n(df: DataFrame, order_by: list[Column], n: int) -> DataFrame:
    """ORDER BY + LIMIT n → Catalyst plans TakeOrderedAndProject (the same
    rewrite the reference's topn_optimizer.cpp:17 performs)."""
    return df.orderBy(*order_by).limit(n)


def limit_percent(df: DataFrame, pct: float, order_by: list[Column] | None = None) -> DataFrame:
    """LIMIT n% (reference physical_limit_percent.cpp) — two-phase:
    count then limit(ceil(count*pct))."""
    n = df.count()
    k = int(-(-n * pct // 100))  # ceil
    if order_by:
        df = df.orderBy(*order_by)
    return df.limit(k)


def reservoir_sample(df: DataFrame, k: int, key: Column | str, seed: int = 42) -> DataFrame:
    """Fixed-size deterministic sample: exactly min(k, n) rows, uniform over
    the input, independent of partitioning and arrival order.

    The reference's reservoir operator (physical_reservoir_sample.cpp) keeps
    a k-slot reservoir with a seeded RNG — inherently order-dependent, so a
    distributed engine can't reproduce it row-for-row. The equivalent with
    the same guarantees: rank every row by a seeded hash of a unique key and
    keep the k smallest. Spark plans this as TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver side of the
    exchange, never a global sort. md5 (not xxhash64) so an external SQL
    engine can reproduce the exact sample.

    The key itself tiebreaks the ordering: with a non-unique key, two rows
    can share a hash, and a hash-only sort would make the limit(k) boundary
    depend on partitioning. Sorting by (hash, key) pins the boundary for any
    given key multiset; callers wanting row-exact determinism should still
    pass a unique key."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string")))
    return (
        df.withColumn("__rs", h)
        .withColumn("__rk", c.cast("string"))
        .orderBy("__rs", "__rk")
        .limit(k)
        .drop("__rs", "__rk")
    )


def stratified_sample(
    df: DataFrame,
    strata: str,
    k: int,
    key: Column | str,
    seed: int = 42,
    oversample: int = 4,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows PER STRATUM, deterministic across
    engines and restarts: the k smallest md5(seed|key) hashes within each
    stratum (ties broken by the key), like :func:`reservoir_sample` but
    per group — the quality-bucket sampler of a training-data pipeline.

    Scale design (100 TB): a naive ``row_number() OVER (PARTITION BY
    stratum ORDER BY hash)`` shuffles the FULL input into per-stratum tasks
    (a hot stratum = one giant task). Instead:

    1. broadcast the per-stratum counts (|distinct strata| rows — a grouping
       key, bounded by assumption);
    2. gate on ``hash_fraction < (oversample*k + 32) / n`` — a narrow filter
       that keeps ~oversample*k rows per stratum. The gate is MONOTONE in
       the ranking hash, so if at least min(k, n) rows survive, the true
       k smallest are all among them — no approximation;
    3. strata where the gate kept fewer than min(k, n) rows (possible, just
       exponentially unlikely at oversample=4) fall back to their FULL row
       set, restoring exactness;
    4. the ranking window then runs over the small survivor pool only.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string")))
    hfrac = F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)
    # every stratum join below is NULL-SAFE (eqNullSafe): a NULL stratum is a
    # real partition — the single-window oracle semantics keep up to k rows
    # for it, so an equi-join (NULL never matches) would silently drop the
    # whole group
    tot = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__n")).withColumnRenamed(
        strata, "__sk"
    )
    d = (
        df.withColumn("__h", h)
        .withColumn("__hk", c.cast("string"))
        .withColumn("__hf", hfrac)
        .join(F.broadcast(tot), F.col(strata).eqNullSafe(F.col("__sk")))
    )
    thresh = F.least(F.lit(1.0), (F.lit(float(oversample * k + 32))) / F.col("__n"))
    gated = d.where(F.col("__hf") < thresh)
    short = (
        gated.groupBy(strata)
        .agg(F.count(F.lit(1)).alias("__g"))
        .withColumnRenamed(strata, "__gk")
        .join(tot, F.col("__gk").eqNullSafe(F.col("__sk")), "right")
        .where(F.coalesce(F.col("__g"), F.lit(0)) < F.least(F.lit(k), F.col("__n")))
        .select(F.col("__sk").alias("__fbk"))
        .withColumn("__fb", F.lit(True))
    )
    pool = d.join(
        F.broadcast(short), F.col(strata).eqNullSafe(F.col("__fbk")), "left"
    ).where((F.col("__hf") < thresh) | F.col("__fb").isNotNull())
    w = Window.partitionBy(strata).orderBy("__h", "__hk")
    return (
        pool.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__h", "__hk", "__hf", "__n", "__sk", "__fbk", "__fb", "__rn")
    )


def pivot_dynamic(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    agg: Column,
    max_values: int = 1000,
) -> DataFrame:
    """PIVOT with automatic IN-value discovery (reference binder expands an
    unlisted PIVOT's values from a distinct scan — physical_pivot.cpp plus
    the binder's pivot expansion). Two deterministic phases: a distinct scan
    of the pivot column (sorted) collected to the driver, then the regular
    Spark pivot with the explicit list, which keeps the aggregate
    single-pass. Column order = sorted values, so the output schema is
    stable across runs and engines. A pivot wider than ``max_values``
    RAISES rather than silently truncating — a thousand-column pivot is a
    schema bug, and dropping values would silently change results."""
    vals = [
        r[0]
        for r in df.select(pivot_col)
        .where(F.col(pivot_col).isNotNull())
        .distinct()
        .orderBy(pivot_col)
        .limit(max_values + 1)
        .collect()
    ]
    if len(vals) > max_values:
        raise ValueError(
            f"pivot_dynamic: column {pivot_col!r} has more than {max_values} "
            "distinct values; pass an explicit value list or raise max_values"
        )
    return df.groupBy(*group_cols).pivot(pivot_col, vals).agg(agg)


def sample_deterministic(df: DataFrame, key: Column, fraction_denominator: int) -> DataFrame:
    """Deterministic 1/denominator 'sample' by hashing a key — the
    reproducible analogue of SAMPLE/TABLESAMPLE (reference
    physical_reservoir_sample.cpp uses seeded RNG; cross-engine hash-matching
    requires a key-derived filter instead). For statistical sampling use
    df.sample(fraction, seed) — Spark-native Bernoulli."""
    return df.where(F.pmod(F.xxhash64(key), F.lit(fraction_denominator)) == 0)
