"""TPC-DS-derived query shapes adapted to the driver's TPC-H-ish schema.

Reference queries: /root/reference/extension/tpcds/dsdgen/queries/*.sql
(99 queries, answers in extension/tpcds/dsdgen/answers/ — SURVEY §5.4 names
this suite a correctness anchor). The driver testdata has no TPC-DS tables
(store_sales/item/date_dim/...), so each port keeps the reference query's
*operator shape* — the thing that stresses the engine — and rebinds it to
the TPC-H tables: fact = lineitem/orders/events, dims = part/customer/
supplier/nation/region, date columns o_orderdate/l_shipdate/ts.

Shapes covered (reference query in parens):
- correlated above-1.2×-group-average CTE (q01)
- revenue ratio-to-window-sum (q12/q98)
- ROLLUP + GROUPING() hierarchy + rank-within-parent (q36)
- monthly sums vs yearly average with lag/lead neighbours (q47/q57)
- cumulative sums over FULL OUTER channel join (q51)
- ROLLUP + per-level top-k rank (q67)
- window-ranked semi-join prefilter on a rollup (q70)
- before/after-pivot conditional aggregation (q21)
- day-of-week pivot with year-over-year self-join (q59)
- frequent-items ∩ best-customers semi-join funnel (q23)
- best/worst rank pairing (q44)
- EXISTS-filtered customer profile stats (q35)
(second tranche in workload/tpcds2.py: q3/q5/q8/q13/q16/q25/q28/q31/q32/q38/
q39/q46/q48/q53/q61/q62/q63/q65/q66/q75/q76/q77/q79/q87/q89/q90/q94/q97)

Determinism: money stays in exact DECIMAL (functions/money.py integer-unit
sums) until the hash-safe double boundary; every windowed average is
exact-sum / exact-count evaluated in double on final values (never a
float accumulation, whose summation order differs across engines); every
rank() ORDER BY carries unique tiebreakers with explicit NULLS placement
(Spark defaults NULLS FIRST on ASC, DuckDB NULLS LAST — never rely on the
default). Ratios and averages of exact values are deliberately NOT
round()ed: both engines compute the identical IEEE quotient, while round()
itself diverges on exact half-way values (Spark rounds the shortest decimal
repr HALF_UP, DuckDB rounds the binary value) — a sum/count landing on
x.xxxx5 flips them.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table, maybe_broadcast
from duckdb_parachute_spark.functions import money
from duckdb_parachute_spark.workload import query

# Shared oracle fragment: exact-decimal discounted revenue (same spelling the
# TPC-H ports use, so both engines aggregate bit-identical decimals).
_DISC = (
    "sum(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
)


@query(
    "tpcds_q01_returns_above_avg",
    cast_double=["total_return"],
    oracle=f"""
    WITH ctr AS (
        SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
               CAST({_DISC} AS DECIMAL(22,4)) AS ctr_total
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey, c_nationkey
    )
    SELECT ctr_cust AS c_custkey, n_name, ctr_total AS total_return
    FROM (
        SELECT *,
               CAST(sum(ctr_total) OVER (PARTITION BY ctr_nation) AS DOUBLE)
                 / count(*) OVER (PARTITION BY ctr_nation) AS nation_avg
        FROM ctr
    ) t
    JOIN nation ON ctr_nation = n_nationkey
    WHERE CAST(ctr_total AS DOUBLE) > 1.2 * nation_avg
    ORDER BY c_custkey
    LIMIT 100
    """,
)
def tpcds_q01(spark, sf_dir):
    """TPC-DS Q1 shape (reference extension/tpcds/dsdgen/queries/01.sql):
    per-customer return totals vs 1.2× their group average. The correlated
    scalar subquery is planned as a window average over the group key — the
    same single-shuffle decorrelation DuckDB's FlattenDependentJoins does
    (src/planner/subquery/flatten_dependent_join.cpp). The average is
    exact-decimal sum / count, evaluated in double on final values, so both
    engines compare against bit-identical thresholds."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ctr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_custkey").alias("ctr_cust"), F.col("c_nationkey").alias("ctr_nation"))
        .agg(money.sum_disc_price().alias("ctr_total"))
    )
    w = Window.partitionBy("ctr_nation")
    t = ctr.withColumn(
        "nation_avg",
        F.sum("ctr_total").over(w).cast("double") / F.count(F.lit(1)).over(w),
    )
    return (
        t.where(F.col("ctr_total").cast("double") > 1.2 * F.col("nation_avg"))
        .join(F.broadcast(n), t.ctr_nation == n.n_nationkey)
        .select(F.col("ctr_cust").alias("c_custkey"), "n_name", F.col("ctr_total").alias("total_return"))
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "tpcds_q12_revenue_ratio",
    cast_double=["itemrevenue"],
    oracle=f"""
    SELECT p_brand, p_type,
           CAST(itemrevenue AS DECIMAL(22,4)) AS itemrevenue,
           CAST(itemrevenue AS DOUBLE) * 100.0
                 / CAST(sum(itemrevenue) OVER (PARTITION BY p_brand) AS DOUBLE) AS revenueratio
    FROM (
        SELECT p_brand, p_type, CAST({_DISC} AS DECIMAL(22,4)) AS itemrevenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY p_brand, p_type
    )
    ORDER BY p_brand, p_type
    """,
)
def tpcds_q12(spark, sf_dir):
    """TPC-DS Q12/Q98 shape (queries/12.sql, 98.sql): per-item revenue with
    ratio-to-class-total via sum() OVER (PARTITION BY class). Group-by then a
    second windowed pass over the (tiny) aggregate output — the fact table
    shuffles once; the window runs on the grouped rows. Ratio is computed in
    double from the two exact decimal sums, so rounding is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    g = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(money.sum_disc_price().alias("itemrevenue"))
    )
    w = Window.partitionBy("p_brand")
    return (
        g.select(
            "p_brand",
            "p_type",
            "itemrevenue",
            (
                F.col("itemrevenue").cast("double") * 100.0
                / F.sum("itemrevenue").over(w).cast("double")
            ).alias("revenueratio"),
        )
        .orderBy("p_brand", "p_type")
    )


@query(
    "tpcds_q36_margin_rollup_rank",
    oracle=f"""
    SELECT gross_margin, r_name, n_name, lochierarchy,
           CAST(rank() OVER (
               PARTITION BY lochierarchy,
                            CASE WHEN g_nation = 0 THEN r_name END
               ORDER BY gross_margin ASC,
                        r_name ASC NULLS FIRST,
                        n_name ASC NULLS FIRST) AS BIGINT) AS rank_within_parent
    FROM (
        SELECT CAST({_DISC} AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross_margin,
               r_name, n_name,
               CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lochierarchy,
               CAST(GROUPING(n_name) AS BIGINT) AS g_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    )
    ORDER BY lochierarchy DESC, r_name ASC NULLS FIRST, rank_within_parent
    """,
)
def tpcds_q36(spark, sf_dir):
    """TPC-DS Q36 shape (queries/36.sql): gross margin over ROLLUP(region,
    nation) with GROUPING()-derived hierarchy level and rank-within-parent.
    GROUPING() flags are computed inside the aggregate (Spark restriction,
    same as the reference binding them during GROUP BY binding), then the
    rank window partitions on the materialized flags. Margin = exact decimal
    sums divided in double, deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # finest-grain pre-aggregation: the rollup's 3-way Expand then runs over
    # ~|nation| rows instead of the joined fact stream (sums decompose; the
    # margin quotient is computed from the re-aggregated exact units).
    fine = base.groupBy("r_name", "n_name").agg(
        F.sum(money.disc_price_units()).alias("__du"),
        F.sum(money.cents("l_extendedprice")).alias("__pu"),
    )
    agg = fine.rollup("r_name", "n_name").agg(
        (
            money.units_to_decimal(F.sum("__du"), 4, "decimal(22,4)").cast("double")
            / money.units_to_decimal(F.sum("__pu"), 2, "decimal(18,2)").cast("double")
        ).alias("gross_margin"),
        (F.grouping("r_name") + F.grouping("n_name")).cast("bigint").alias("lochierarchy"),
        F.grouping("n_name").cast("bigint").alias("g_nation"),
    )
    w = Window.partitionBy(
        "lochierarchy", F.when(F.col("g_nation") == 0, F.col("r_name"))
    ).orderBy(
        F.col("gross_margin").asc(),
        F.col("r_name").asc_nulls_first(),
        F.col("n_name").asc_nulls_first(),
    )
    return (
        agg.select(
            "gross_margin",
            "r_name",
            "n_name",
            "lochierarchy",
            F.rank().over(w).cast("bigint").alias("rank_within_parent"),
        )
        .orderBy(F.col("lochierarchy").desc(), F.col("r_name").asc_nulls_first(), "rank_within_parent")
    )


@query(
    "tpcds_q47_monthly_deviation",
    cast_double=["sum_sales", "psum", "nsum"],
    oracle=f"""
    WITH v1 AS (
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS moy,
               CAST({_DISC} AS DECIMAL(22,4)) AS sum_sales
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate), month(o_orderdate)
    ), v2 AS (
        SELECT n_name, yr, moy, sum_sales,
               CAST(sum(sum_sales) OVER (PARTITION BY n_name, yr) AS DOUBLE)
                 / count(*) OVER (PARTITION BY n_name, yr) AS avg_monthly,
               lag(sum_sales)  OVER (PARTITION BY n_name ORDER BY yr, moy) AS psum,
               lead(sum_sales) OVER (PARTITION BY n_name ORDER BY yr, moy) AS nsum
        FROM v1
    )
    SELECT n_name, yr, moy, sum_sales,
           avg_monthly, psum, nsum
    FROM v2
    WHERE yr = 1998 AND avg_monthly > 0
      AND abs(CAST(sum_sales AS DOUBLE) - avg_monthly) / avg_monthly > 0.05
    ORDER BY n_name, yr, moy
    """,
)
def tpcds_q47(spark, sf_dir):
    """TPC-DS Q47/Q57 shape (queries/47.sql, 57.sql): monthly sales vs the
    year's average with previous/next-month neighbours. The reference spells
    lag/lead as rn-offset self-joins that DuckDB's optimizer reuses the CTE
    for; the direct window form is the idiomatic single-pass plan on both
    engines (one shuffle on the group keys, one sort per partition).
    avg_monthly is exact-sum/exact-count in double; the 0.05 deviation filter
    compares bit-identical doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    v1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("moy"),
        )
        .agg(money.sum_disc_price().alias("sum_sales"))
    )
    wy = Window.partitionBy("n_name", "yr")
    ws = Window.partitionBy("n_name").orderBy("yr", "moy")
    v2 = v1.select(
        "n_name",
        "yr",
        "moy",
        "sum_sales",
        (F.sum("sum_sales").over(wy).cast("double") / F.count(F.lit(1)).over(wy)).alias(
            "avg_monthly"
        ),
        F.lag("sum_sales").over(ws).alias("psum"),
        F.lead("sum_sales").over(ws).alias("nsum"),
    )
    return (
        v2.where(
            (F.col("yr") == 1998)
            & (F.col("avg_monthly") > 0)
            & (
                F.abs(F.col("sum_sales").cast("double") - F.col("avg_monthly"))
                / F.col("avg_monthly")
                > 0.05
            )
        )
        .select(
            "n_name",
            "yr",
            "moy",
            "sum_sales",
            "avg_monthly",
            "psum",
            "nsum",
        )
        .orderBy("n_name", "yr", "moy")
    )


@query(
    "tpcds_q51_cumulative_channels",
    oracle="""
    WITH click_v AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, CAST(ts AS DATE)
    ), view_v AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, CAST(ts AS DATE)
    ), joined AS (
        SELECT COALESCE(c.user_id, v.user_id) AS user_id,
               COALESCE(c.day, v.day) AS day,
               c.n AS click_n, v.n AS view_n
        FROM click_v c FULL OUTER JOIN view_v v
          ON c.user_id = v.user_id AND c.day = v.day
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day, click_cum, view_cum
    FROM (
        SELECT user_id, day,
               CAST(sum(COALESCE(click_n, 0)) OVER (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS click_cum,
               CAST(sum(COALESCE(view_n, 0)) OVER (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS view_cum
        FROM joined
    )
    WHERE click_cum > view_cum
    ORDER BY user_id, day
    LIMIT 200
    """,
)
def tpcds_q51(spark, sf_dir):
    """TPC-DS Q51 shape (queries/51.sql): two per-channel cumulative series
    FULL OUTER joined on (entity, day), then running totals compared. Counts
    are integers so the cumulative sums are exact on both engines. Both
    channel CTEs shuffle on (user_id, day); the full-outer join and the
    windows reuse the user_id clustering."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    click = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("click_n"))
    )
    view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("view_n"))
    )
    joined = click.join(view, ["user_id", "day"], "full_outer")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(
        "user_id",
        "day",
        F.sum(F.coalesce("click_n", F.lit(0))).over(w).cast("bigint").alias("click_cum"),
        F.sum(F.coalesce("view_n", F.lit(0))).over(w).cast("bigint").alias("view_cum"),
    )
    return (
        cum.where(F.col("click_cum") > F.col("view_cum"))
        .orderBy("user_id", "day")
        .limit(200)
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
    )


@query(
    "tpcds_q67_rollup_topk",
    cast_double=["sum_qty"],
    oracle="""
    SELECT category, p_brand, yr, sum_qty, rk
    FROM (
        SELECT category, p_brand, yr, sum_qty,
               CAST(rank() OVER (
                   PARTITION BY category
                   ORDER BY sum_qty DESC,
                            p_brand ASC NULLS FIRST,
                            yr ASC NULLS FIRST) AS BIGINT) AS rk
        FROM (
            SELECT split_part(p_type, ' ', 1) AS category, p_brand,
                   CAST(year(l_shipdate) AS BIGINT) AS yr,
                   CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY ROLLUP (split_part(p_type, ' ', 1), p_brand, year(l_shipdate))
        )
    )
    WHERE rk <= 3
    ORDER BY category ASC NULLS FIRST, rk, p_brand ASC NULLS FIRST, yr ASC NULLS FIRST
    """,
)
def tpcds_q67(spark, sf_dir):
    """TPC-DS Q67 shape (queries/67.sql): sales summed over a ROLLUP
    hierarchy (category, brand, year), then top-k rank within each category
    slice including the NULL super-aggregate rows. The rank ORDER BY carries
    unique tiebreakers with explicit NULLS FIRST — Spark and DuckDB default
    opposite NULL orders."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    base = li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey).select(
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("category"),
        "p_brand",
        F.year("l_shipdate").cast("bigint").alias("yr"),
        "l_quantity",
    )
    # Rollup's Expand multiplies its input 4x (one copy per grouping set);
    # fed the raw fact rows that is 4x|lineitem| through the aggregate. Sum
    # is decomposable, so pre-aggregate to the finest grain FIRST (one fact
    # shuffle) and run the rollup's Expand over the tiny grouped relation,
    # re-aggregating the integer-unit partials — bit-identical result, and
    # the 100 TB shape: Expand cost goes from O(fact) to O(groups).
    fine = base.groupBy("category", "p_brand", "yr").agg(
        F.sum(money.cents("l_quantity")).alias("__units")
    )
    agg = fine.rollup("category", "p_brand", "yr").agg(
        money.units_to_decimal(F.sum("__units"), 2, "decimal(18,2)").alias("sum_qty")
    )
    w = Window.partitionBy("category").orderBy(
        F.col("sum_qty").desc(),
        F.col("p_brand").asc_nulls_first(),
        F.col("yr").asc_nulls_first(),
    )
    return (
        agg.select("category", "p_brand", "yr", "sum_qty", F.rank().over(w).cast("bigint").alias("rk"))
        .where(F.col("rk") <= 3)
        .orderBy(
            F.col("category").asc_nulls_first(),
            "rk",
            F.col("p_brand").asc_nulls_first(),
            F.col("yr").asc_nulls_first(),
        )
    )


@query(
    "tpcds_q70_ranked_nation_rollup",
    oracle=f"""
    WITH nat_rev AS (
        SELECT n_nationkey, n_name, r_name,
               CAST({_DISC} AS DECIMAL(22,4)) AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_nationkey, n_name, r_name
    ), top_nations AS (
        SELECT n_nationkey FROM (
            SELECT n_nationkey,
                   rank() OVER (PARTITION BY r_name
                                ORDER BY rev DESC, n_nationkey) AS rnk
            FROM nat_rev
        ) WHERE rnk <= 3
    )
    SELECT r_name, n_name,
           CAST(sum(rev) AS DOUBLE) AS total_rev,
           CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lochierarchy
    FROM nat_rev
    WHERE n_nationkey IN (SELECT n_nationkey FROM top_nations)
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY lochierarchy DESC, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
    """,
)
def tpcds_q70(spark, sf_dir):
    """TPC-DS Q70 shape (queries/70.sql): revenue rollup restricted to the
    window-ranked top states — a rank()-in-semi-join prefilter feeding a
    ROLLUP + GROUPING() hierarchy. The per-nation aggregate is computed once
    and reused for both the ranking subquery and the rollup (the reference's
    CTE reuse); Spark caches nothing but the aggregate is dimension-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat_rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_nationkey", "n_name", "r_name")
        .agg(money.sum_disc_price().alias("rev"))
        # dimension-sized (one row per nation) but consumed by BOTH the
        # ranking subquery and the rollup — persist so the fact-table
        # aggregation underneath runs once (the reference shares the CTE)
        .persist()
    )
    wr = Window.partitionBy("r_name").orderBy(F.col("rev").desc(), "n_nationkey")
    top = (
        nat_rev.select("n_nationkey", F.rank().over(wr).alias("rnk"))
        .where(F.col("rnk") <= 3)
        .select("n_nationkey")
    )
    return (
        nat_rev.join(top, "n_nationkey", "leftsemi")
        .rollup("r_name", "n_name")
        .agg(
            F.sum("rev").cast("double").alias("total_rev"),
            (F.grouping("r_name") + F.grouping("n_name")).cast("bigint").alias("lochierarchy"),
        )
        .select("r_name", "n_name", "total_rev", "lochierarchy")
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


@query(
    "tpcds_q21_before_after_pivot",
    cast_double=["qty_before", "qty_after"],
    oracle="""
    SELECT n_name, s_name, qty_before, qty_after
    FROM (
        SELECT n_name, s_name,
               CAST(sum(CASE WHEN l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                             THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) AS qty_before,
               CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                             THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) AS qty_after
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-08-01 00:00:00'
        GROUP BY n_name, s_name
    )
    WHERE CAST(qty_before AS DOUBLE) > 0
      AND CAST(qty_after AS DOUBLE) / CAST(qty_before AS DOUBLE) BETWEEN 0.5 AND 2.0
    ORDER BY n_name, s_name
    LIMIT 100
    """,
)
def tpcds_q21(spark, sf_dir):
    """TPC-DS Q21 shape (queries/21.sql): conditional before/after-pivot-date
    sums per (warehouse→supplier, item→nation) with a ratio band filter. The
    CASE pivot makes one pass over the fact table (single shuffle on the
    group keys); the band filter runs on exact decimal sums cast to double."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-08-01 00:00:00").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pivot_ts = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    qty_cents = money.cents("l_quantity")
    agg = (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "s_name")
        .agg(
            money.units_to_decimal(
                F.sum(F.when(F.col("l_shipdate") < pivot_ts, qty_cents).otherwise(F.lit(0))),
                2,
                "decimal(18,2)",
            ).alias("qty_before"),
            money.units_to_decimal(
                F.sum(F.when(F.col("l_shipdate") >= pivot_ts, qty_cents).otherwise(F.lit(0))),
                2,
                "decimal(18,2)",
            ).alias("qty_after"),
        )
    )
    before_d = F.col("qty_before").cast("double")
    after_d = F.col("qty_after").cast("double")
    return (
        agg.where((before_d > 0) & (after_d / before_d >= 0.5) & (after_d / before_d <= 2.0))
        .orderBy("n_name", "s_name")
        .limit(100)
    )


@query(
    "tpcds_q59_week_over_week",
    cast_double=["mon_ratio", "fri_ratio"],
    oracle="""
    WITH wk AS (
        SELECT CAST(floor(date_diff('day', DATE '1995-01-02', CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS week_seq,
               CAST(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 1
                             THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) AS mon_sales,
               CAST(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 5
                             THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) AS fri_sales
        FROM orders
        GROUP BY 1
    )
    SELECT y.week_seq AS week_seq,
           CAST(y.mon_sales AS DOUBLE) / nullif(CAST(x.mon_sales AS DOUBLE), 0) AS mon_ratio,
           CAST(y.fri_sales AS DOUBLE) / nullif(CAST(x.fri_sales AS DOUBLE), 0) AS fri_ratio
    FROM wk x JOIN wk y ON y.week_seq = x.week_seq + 52
    WHERE y.week_seq BETWEEN 52 AND 103
    ORDER BY y.week_seq
    """,
)
def tpcds_q59(spark, sf_dir):
    """TPC-DS Q59 shape (queries/59.sql): weekly sales pivoted by day-of-week,
    self-joined year-over-year on week_seq + 52 for per-weekday ratios. The
    week sequence is days-since-a-fixed-Monday / 7 (engine-neutral — DuckDB's
    week() and Spark's weekofyear() disagree on ISO boundaries). dayofweek:
    DuckDB Sunday=0 vs Spark Sunday=1, so the Spark side subtracts 1."""
    o = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    dow = F.dayofweek(od) - 1  # align to DuckDB's Sunday=0
    week_seq = F.floor(F.datediff(od, F.lit("1995-01-02").cast("date")) / 7).cast("bigint")
    price_cents = money.cents("o_totalprice")
    wk = (
        o.groupBy(week_seq.alias("week_seq"))
        .agg(
            money.units_to_decimal(
                F.sum(F.when(dow == 1, price_cents).otherwise(F.lit(0))), 2, "decimal(18,2)"
            ).alias("mon_sales"),
            money.units_to_decimal(
                F.sum(F.when(dow == 5, price_cents).otherwise(F.lit(0))), 2, "decimal(18,2)"
            ).alias("fri_sales"),
        )
    )
    x = wk.select(
        F.col("week_seq").alias("x_week"),
        F.col("mon_sales").alias("x_mon"),
        F.col("fri_sales").alias("x_fri"),
    )
    y = wk.select("week_seq", "mon_sales", "fri_sales")
    return (
        y.join(F.broadcast(x), y.week_seq == x.x_week + 52)
        .where(F.col("week_seq").between(52, 103))
        .select(
            "week_seq",
            (
                F.col("mon_sales").cast("double") / F.nullif(F.col("x_mon").cast("double"), F.lit(0.0))
            ).alias("mon_ratio"),
            (
                F.col("fri_sales").cast("double") / F.nullif(F.col("x_fri").cast("double"), F.lit(0.0))
            ).alias("fri_ratio"),
        )
        .orderBy("week_seq")
    )


@query(
    "tpcds_q23_frequent_best",
    cast_double=["total"],
    oracle=f"""
    WITH frequent_parts AS (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING count(*) > 30
    ), best_customers AS (
        SELECT o_custkey FROM orders
        GROUP BY o_custkey
        HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) >
            (SELECT 0.8 * max(CAST(tot AS DOUBLE)) FROM (
                SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS tot
                FROM orders GROUP BY o_custkey))
    )
    SELECT CAST({_DISC} AS DECIMAL(22,4)) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
    """,
)
def tpcds_q23(spark, sf_dir):
    """TPC-DS Q23 shape (queries/23.sql): revenue from frequently-bought
    items ∩ best customers — two aggregate-defined semi-join filters over the
    fact table feeding an ungrouped total. Both filter sets are
    dimension-sized aggregates; Spark broadcasts them as semi-join builds.
    The best-customer threshold (80% of the max customer total) is an exact
    decimal max evaluated in double."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).where(
        F.col("cnt") > 30
    ).select("l_partkey")
    cust_tot = o.groupBy("o_custkey").agg(
        money.sum_money("o_totalprice").alias("tot")
    )
    thresh = cust_tot.agg(
        (0.8 * F.max(F.col("tot").cast("double"))).alias("thresh")
    )
    best = (
        cust_tot.crossJoin(F.broadcast(thresh))
        .where(F.col("tot").cast("double") > F.col("thresh"))
        .select("o_custkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(freq, sf_dir, "part"), "l_partkey", "leftsemi")
        .join(maybe_broadcast(best, sf_dir, "customer"), "o_custkey", "leftsemi")
        .agg(money.sum_disc_price().alias("total"))
    )


@query(
    "tpcds_q44_best_worst_rank",
    oracle="""
    WITH part_perf AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                     / count(*) AS avg_rev
        FROM lineitem
        GROUP BY l_partkey
    ), asc_rank AS (
        SELECT l_partkey, rank() OVER (ORDER BY avg_rev ASC, l_partkey) AS rnk
        FROM part_perf
    ), desc_rank AS (
        SELECT l_partkey, rank() OVER (ORDER BY avg_rev DESC, l_partkey) AS rnk
        FROM part_perf
    )
    SELECT CAST(a.rnk AS BIGINT) AS rnk,
           p1.p_name AS best_performing,
           p2.p_name AS worst_performing
    FROM asc_rank a
    JOIN desc_rank d ON a.rnk = d.rnk
    JOIN part p1 ON d.l_partkey = p1.p_partkey
    JOIN part p2 ON a.l_partkey = p2.p_partkey
    WHERE a.rnk <= 10
    ORDER BY rnk
    """,
)
def tpcds_q44(spark, sf_dir):
    """TPC-DS Q44 shape (queries/44.sql): rank items by average performance
    ascending and descending, pair rank i's best with rank i's worst. The
    global (unpartitioned) rank is a single-partition sort of a
    dimension-sized aggregate — fine at any scale because the per-item
    aggregate has already reduced the fact table. avg_rev is exact-decimal
    sum / count rounded in double; partkey breaks rank ties."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    perf = li.groupBy("l_partkey").agg(
        (money.sum_disc_price().cast("double") / F.count(F.lit(1))).alias("avg_rev")
    )
    # Round 7: two-phase global ranks (range shuffle + per-partition
    # offsets, functions/scalar.py:global_row_number) — no single-partition
    # WindowExec even though the rank is global; the l_partkey tiebreaker
    # makes the order total, so rank() == row_number.
    from duckdb_parachute_spark.functions.scalar import global_row_number

    # perf is consumed by BOTH rank passes; materialize the dimension-sized
    # aggregate once so the fact shuffle runs a single time.
    perf = perf.localCheckpoint(eager=True)
    asc_r = global_row_number(perf, ["avg_rev", "l_partkey"], out="rnk").select(
        "l_partkey", "rnk"
    )
    desc_r = global_row_number(
        perf, ["avg_rev", "l_partkey"], descending=[True, False], out="rnk"
    ).select(F.col("l_partkey").alias("d_partkey"), "rnk")
    p1 = p.select(F.col("p_partkey").alias("p1_key"), F.col("p_name").alias("best_performing"))
    p2 = p.select(F.col("p_partkey").alias("p2_key"), F.col("p_name").alias("worst_performing"))
    return (
        asc_r.join(desc_r, "rnk")
        .where(F.col("rnk") <= 10)
        .join(maybe_broadcast(p1, sf_dir, "part"), F.col("d_partkey") == F.col("p1_key"))
        .join(maybe_broadcast(p2, sf_dir, "part"), F.col("l_partkey") == F.col("p2_key"))
        .select(F.col("rnk").cast("bigint").alias("rnk"), "best_performing", "worst_performing")
        .orderBy("rnk")
    )


@query(
    "tpcds_q35_customer_profile",
    oracle="""
    SELECT n_name, c_mktsegment,
           count(*) AS cnt,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal,
           CAST(max(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal,
           CAST(min(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY n_name, c_mktsegment
    ORDER BY n_name, c_mktsegment
    """,
)
def tpcds_q35(spark, sf_dir):
    """TPC-DS Q35 shape (queries/35.sql): demographic profile stats over
    customers that transacted in a date window — an EXISTS semi join feeding
    grouped count/avg/max/min. acctbal is 2-decimal money: the average is an
    exact cent-sum divided by count (deterministic), max/min are exact."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    active = c.join(o, c.c_custkey == o.o_custkey, "leftsemi")
    bal_dec = F.col("c_acctbal").cast("decimal(12,2)")
    return (
        active.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # exact decimal sum -> double -> ONE division, the same IEEE op
            # on bit-identical inputs in both engines — deliberately NOT
            # rounded: round() differs across engines on exact half-way
            # values (Spark rounds the shortest decimal repr HALF_UP, DuckDB
            # rounds the binary value), and a tie like sum/count = x.xxxx5
            # flips them; the raw quotient is already deterministic.
            (
                money.units_to_decimal(
                    F.sum(money.cents("c_acctbal")), 2, "decimal(18,2)"
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal"),
            F.max(bal_dec).cast("double").alias("max_bal"),
            F.min(bal_dec).cast("double").alias("min_bal"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


@query(
    "tpcds_q88_time_bands",
    oracle="""
    SELECT * FROM
      (SELECT CAST(count(*) AS BIGINT) AS h8 FROM events
        WHERE hour(ts) = 8 AND event_type IN ('click','view')) s1,
      (SELECT CAST(count(*) AS BIGINT) AS h9_early FROM events
        WHERE hour(ts) = 9 AND minute(ts) < 30 AND event_type IN ('click','view')) s2,
      (SELECT CAST(count(*) AS BIGINT) AS h9_late FROM events
        WHERE hour(ts) = 9 AND minute(ts) >= 30 AND event_type IN ('click','view')) s3,
      (SELECT CAST(count(*) AS BIGINT) AS h10 FROM events
        WHERE hour(ts) = 10 AND event_type IN ('click','view')) s4,
      (SELECT CAST(count(*) AS BIGINT) AS h11 FROM events
        WHERE hour(ts) = 11 AND event_type IN ('click','view')) s5,
      (SELECT CAST(count(*) AS BIGINT) AS h12 FROM events
        WHERE hour(ts) = 12 AND event_type IN ('click','view')) s6
    """,
)
def tpcds_q88(spark, sf_dir):
    """TPC-DS Q88 shape (queries/88.sql): six independently-filtered scalar
    counts cross-joined into one row — the time-band census. Spark computes
    all six bands in ONE scan via conditional aggregation (equivalent by
    disjointness of the bands; the reference optimizer shares the scan the
    same way), avoiding six scans and five cross joins."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    h, m = F.hour("ts"), F.minute("ts")

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return ev.agg(
        band(h == 8, "h8"),
        band((h == 9) & (m < 30), "h9_early"),
        band((h == 9) & (m >= 30), "h9_late"),
        band(h == 10, "h10"),
        band(h == 11, "h11"),
        band(h == 12, "h12"),
    )


@query(
    "tpcds_q34_count_distribution",
    oracle="""
    SELECT c_name, dn.l_orderkey, cnt
    FROM (
        SELECT l_orderkey, o_custkey, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE day(o_orderdate) BETWEEN 1 AND 3 OR day(o_orderdate) BETWEEN 25 AND 28
        GROUP BY l_orderkey, o_custkey
    ) dn
    JOIN customer ON o_custkey = c_custkey
    WHERE cnt BETWEEN 5 AND 7
    ORDER BY c_name, dn.l_orderkey
    LIMIT 100
    """,
)
def tpcds_q34(spark, sf_dir):
    """TPC-DS Q34/Q73 shape (queries/34.sql, 73.sql): per-ticket line counts
    under disjunctive calendar filters, banded (cnt BETWEEN ...), joined back
    to the customer dim for names. The count distribution is computed on the
    fact join before the dimension join — the group-filter reduces the rows
    that reach customer."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.dayofmonth("o_orderdate").between(1, 3)) | (F.dayofmonth("o_orderdate").between(25, 28))
    )
    c = load_table(spark, sf_dir, "customer")
    dn = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt").between(5, 7))
    )
    return (
        dn.join(c, dn.o_custkey == c.c_custkey)
        .select("c_name", "l_orderkey", "cnt")
        .orderBy("c_name", "l_orderkey")
        .limit(100)
    )


@query(
    "tpcds_q49_return_rank_union",
    oracle="""
    WITH perf AS (
        SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'even' ELSE 'odd' END AS channel,
               l_partkey AS item,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                     / CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS return_ratio
        FROM lineitem
        GROUP BY 1, 2
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 0
    ), ranked AS (
        SELECT channel, item, return_ratio,
               CAST(rank() OVER (PARTITION BY channel ORDER BY return_ratio DESC, item) AS BIGINT) AS return_rank
        FROM perf
    )
    SELECT channel, item, return_ratio, return_rank
    FROM ranked
    WHERE return_rank <= 10
    ORDER BY channel, return_rank
    """,
)
def tpcds_q49(spark, sf_dir):
    """TPC-DS Q49 shape (queries/49.sql): per-channel worst-return-ratio
    rankings unioned across channels. The reference unions three per-channel
    subqueries; here the channel is a derived column so one grouped pass +
    one channel-partitioned rank window covers all channels — the plan the
    reference optimizer reaches via CTE sharing. Ratios divide exact decimal
    sums in double."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = money.cents("l_quantity")
    perf = (
        li.groupBy(
            F.when(F.col("l_linenumber") % 2 == 0, "even").otherwise("odd").alias("channel"),
            F.col("l_partkey").alias("item"),
        )
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", qty).otherwise(F.lit(0))).alias("__ret"),
            F.sum(qty).alias("__tot"),
        )
        .where(F.col("__tot") > 0)
        .select(
            "channel",
            "item",
            (F.col("__ret").cast("double") / F.col("__tot").cast("double")).alias("return_ratio"),
        )
    )
    w = Window.partitionBy("channel").orderBy(F.col("return_ratio").desc(), "item")
    return (
        perf.select("channel", "item", "return_ratio", F.rank().over(w).cast("bigint").alias("return_rank"))
        .where(F.col("return_rank") <= 10)
        .orderBy("channel", "return_rank")
    )


@query(
    "tpcds_q15_disjunctive_dims",
    cast_double=["total"],
    oracle="""
    SELECT n_name, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE n_name IN ('FRANCE', 'GERMANY', 'EGYPT')
       OR CAST(c_acctbal AS DECIMAL(12,2)) > CAST(9000 AS DECIMAL(12,2))
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q15(spark, sf_dir):
    """TPC-DS Q15 shape (queries/15.sql: zip-prefix IN-list OR state IN-list
    OR amount threshold): disjunctive dimension predicates that defeat simple
    pushdown — the filter runs after the dim join, revenue grouped by
    geography."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    cond = F.col("n_name").isin("FRANCE", "GERMANY", "EGYPT") | (
        F.col("c_acctbal").cast("decimal(12,2)") > F.lit(9000).cast("decimal(12,2)")
    )
    return (
        joined.where(cond)
        .groupBy("n_name")
        .agg(money.sum_money("o_totalprice").alias("total"))
        .orderBy("n_name")
    )


@query(
    "tpcds_q93_net_after_returns",
    cast_double=["net_revenue"],
    oracle="""
    SELECT o_custkey,
           CAST(sum(CASE WHEN l_returnflag = 'R'
                         THEN CAST(0 AS DECIMAL(12,2))
                         ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) AS net_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    ORDER BY net_revenue DESC, o_custkey
    LIMIT 20
    """,
)
def tpcds_q93(spark, sf_dir):
    """TPC-DS Q93 shape (queries/93.sql: sales net of returned quantity per
    customer, top by total): the returns side folds into a conditional sum
    (our returnflag plays store_returns), one fact shuffle on the customer
    key, top-k heap on the exact decimal total."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    price = money.cents("l_extendedprice")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            money.units_to_decimal(
                F.sum(F.when(F.col("l_returnflag") == "R", F.lit(0)).otherwise(price)),
                2,
                "decimal(18,2)",
            ).alias("net_revenue")
        )
        .orderBy(F.desc("net_revenue"), "o_custkey")
        .limit(20)
    )


@query(
    "tpcds_q41_distinct_dim_subquery",
    oracle="""
    SELECT DISTINCT p_name
    FROM part
    WHERE p_name IN (
        SELECT p_name FROM part
        GROUP BY p_name
        HAVING count(DISTINCT p_brand) >= 2
    )
    ORDER BY p_name
    LIMIT 50
    """,
)
def tpcds_q41(spark, sf_dir):
    """TPC-DS Q41 shape (queries/41.sql: DISTINCT i_product_name filtered by
    a dimension-only subquery with a HAVING count): a pure-dimension query —
    the IN-subquery becomes a broadcast semi join against the grouped dim."""
    p = load_table(spark, sf_dir, "part")
    multi = (
        p.groupBy("p_name")
        .agg(F.countDistinct("p_brand").alias("nb"))
        .where(F.col("nb") >= 2)
        .select("p_name")
    )
    return (
        p.join(maybe_broadcast(multi, sf_dir, "part"), "p_name", "leftsemi")
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(50)
    )


@query(
    "tpcds_q95_double_semi",
    cast_double=["total"],
    oracle="""
    SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING count(DISTINCT l_suppkey) >= 2
    )
    AND o_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
)
def tpcds_q95(spark, sf_dir):
    """TPC-DS Q95 shape (queries/95.sql: ws_order_number IN two different
    subqueries — multi-warehouse orders that also appear in returns): two
    aggregate-defined semi joins stacked on the same key. The oracle's
    sum runs over DISTINCT orders; Spark joins the deduplicated keys so each
    order counts once."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    return (
        o.join(multi_supp, o.o_orderkey == multi_supp.l_orderkey, "leftsemi")
        .join(returned, o.o_orderkey == returned.l_orderkey, "leftsemi")
        .agg(
            F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
            money.sum_money("o_totalprice").alias("total"),
        )
    )


@query(
    "tpcds_q54_revenue_segments",
    oracle="""
    SELECT segment, CAST(count(*) AS BIGINT) AS num_customers,
           CAST(segment * 5000 AS BIGINT) AS segment_base
    FROM (
        SELECT o_custkey,
               CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / 5000) AS BIGINT) AS segment
        FROM orders
        GROUP BY o_custkey
    )
    GROUP BY segment
    HAVING count(*) > 2
    ORDER BY segment
    LIMIT 40
    """,
)
def tpcds_q54(spark, sf_dir):
    """TPC-DS Q54 shape (queries/54.sql: CAST(revenue/50 AS INT) AS segment →
    segment histogram): per-customer exact revenue bucketed into fixed-width
    segments, then the segment census. Two shuffles total (customer agg,
    segment agg) — both keyed aggregations."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.floor(money.sum_money("o_totalprice").cast("double") / 5000).cast("bigint").alias("segment")
    )
    return (
        per_cust.groupBy("segment")
        .agg(F.count(F.lit(1)).alias("num_customers"))
        .where(F.col("num_customers") > 2)
        .select("segment", "num_customers", (F.col("segment") * 5000).cast("bigint").alias("segment_base"))
        .orderBy("segment")
        .limit(40)
    )
