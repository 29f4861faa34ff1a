"""TPC-DS shapes, second tranche (round-5 breadth): multi-channel UNION
rollups, INTERSECT/EXCEPT funnels, wide CASE pivots, ship-chain EXISTS
pairs, bucketed scalar batteries.

Reference queries: /root/reference/extension/tpcds/dsdgen/queries/*.sql
(same adaptation contract as workload/tpcds.py: the driver's TPC-H-ish
schema stands in for the TPC-DS tables, the operator SHAPE — what stresses
the engine — is preserved; channels map to disjoint slices of
lineitem/orders, date_dim arithmetic maps to o_orderdate/l_shipdate
functions).

Determinism contract is inherited from tpcds.py's module docstring: exact
DECIMAL money math until the hash-safe double boundary, ratios as raw IEEE
quotients of exact inputs (never round()ed — half-way doubles round
differently across engines), unique ORDER BY tiebreakers with explicit
NULLS placement.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table, maybe_broadcast
from duckdb_parachute_spark.functions import money
from duckdb_parachute_spark.workload import query

_DISC = (
    "sum(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
)

_TS96 = "TIMESTAMP '1996-01-01 00:00:00'"
_TS97 = "TIMESTAMP '1997-01-01 00:00:00'"


def _ntz(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


@query(
    "tpcds_q5_channel_rollup",
    cast_double=["sales", "returns_", "profit"],
    oracle=f"""
    WITH sr AS (
        SELECT n_name AS id,
               CAST(sum(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS sales,
               CAST(sum(CASE WHEN l_returnflag  = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS returns_,
               CAST({_DISC} AS DECIMAL(22,4)) AS profit
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE l_shipdate >= {_TS96} AND l_shipdate < {_TS97}
        GROUP BY n_name
    ), cr AS (
        SELECT c_mktsegment AS id,
               CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS sales,
               CAST(sum(CASE WHEN o_orderstatus  = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS returns_,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,4)) AS profit
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= {_TS96} AND o_orderdate < {_TS97}
        GROUP BY c_mktsegment
    )
    SELECT channel, id,
           CAST(sum(sales) AS DECIMAL(25,2)) AS sales,
           CAST(sum(returns_) AS DECIMAL(25,2)) AS returns_,
           CAST(sum(profit) AS DECIMAL(25,4)) AS profit
    FROM (
        SELECT 'supplier channel' AS channel, 'sup_' || id AS id, sales, returns_, profit FROM sr
        UNION ALL
        SELECT 'customer channel' AS channel, 'cust_' || id AS id, sales, returns_, profit FROM cr
    ) x
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    LIMIT 100
    """,
)
def tpcds_q5(spark, sf_dir):
    """TPC-DS Q5 shape (queries/05.sql): per-channel sales/returns CTEs built
    from UNION-ALL'd sales and returns branches, combined under
    ROLLUP(channel, id) with NULLS FIRST ordering. Channels = supplier-side
    lineitem flow vs customer-side orders flow; 'returns' = the R/F slices.
    Each channel aggregates before the union, so the rollup runs on
    dimension-sized input — the reference's plan shape exactly."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ntz("1997-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")

    not_r = F.col("l_returnflag") != "R"
    sr = (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            money.units_to_decimal(
                F.sum(F.when(not_r, money.cents("l_extendedprice")).otherwise(F.lit(0))),
                2, "decimal(22,2)",
            ).alias("sales"),
            money.units_to_decimal(
                F.sum(F.when(~not_r, money.cents("l_extendedprice")).otherwise(F.lit(0))),
                2, "decimal(22,2)",
            ).alias("returns_"),
            money.sum_disc_price(out="decimal(22,4)").alias("profit"),
        )
        .select(
            F.lit("supplier channel").alias("channel"),
            F.concat(F.lit("sup_"), F.col("n_name")).alias("id"),
            "sales", "returns_", "profit",
        )
    )
    not_f = F.col("o_orderstatus") != "F"
    cr = (
        o.join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            money.units_to_decimal(
                F.sum(F.when(not_f, money.cents("o_totalprice")).otherwise(F.lit(0))),
                2, "decimal(22,2)",
            ).alias("sales"),
            money.units_to_decimal(
                F.sum(F.when(~not_f, money.cents("o_totalprice")).otherwise(F.lit(0))),
                2, "decimal(22,2)",
            ).alias("returns_"),
            money.sum_money("o_totalprice", out="decimal(22,4)").alias("profit"),
        )
        .select(
            F.lit("customer channel").alias("channel"),
            F.concat(F.lit("cust_"), F.col("c_mktsegment")).alias("id"),
            "sales", "returns_", "profit",
        )
    )
    return (
        sr.unionAll(cr)
        .rollup("channel", "id")
        .agg(
            F.sum("sales").cast("decimal(25,2)").alias("sales"),
            F.sum("returns_").cast("decimal(25,2)").alias("returns_"),
            F.sum("profit").cast("decimal(25,4)").alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
        .limit(100)
    )


@query(
    "tpcds_q77_channel_profit_join",
    cast_double=["sales", "returns_"],
    oracle=f"""
    WITH ss AS (
        SELECT s_nationkey AS k, CAST({_DISC} AS DECIMAL(22,4)) AS sales
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_returnflag <> 'R' GROUP BY s_nationkey
    ), sr AS (
        SELECT s_nationkey AS k, CAST({_DISC} AS DECIMAL(22,4)) AS returns_
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_returnflag = 'R' GROUP BY s_nationkey
    ), cs AS (
        SELECT c_nationkey AS k, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,4)) AS sales
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus <> 'F' GROUP BY c_nationkey
    ), cr AS (
        SELECT c_nationkey AS k, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,4)) AS returns_
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F' GROUP BY c_nationkey
    )
    SELECT channel, k,
           CAST(sum(sales) AS DECIMAL(25,4)) AS sales,
           CAST(sum(returns_) AS DECIMAL(25,4)) AS returns_
    FROM (
        SELECT 'supplier' AS channel, ss.k AS k, sales, coalesce(returns_, CAST(0 AS DECIMAL(22,4))) AS returns_
        FROM ss LEFT JOIN sr ON ss.k = sr.k
        UNION ALL
        SELECT 'customer' AS channel, cs.k AS k, sales, coalesce(returns_, CAST(0 AS DECIMAL(22,4))) AS returns_
        FROM cs LEFT JOIN cr ON cs.k = cr.k
    ) x
    GROUP BY ROLLUP (channel, k)
    ORDER BY channel NULLS FIRST, k NULLS FIRST
    """,
)
def tpcds_q77(spark, sf_dir):
    """TPC-DS Q77 shape (queries/77.sql): per-channel sales and returns
    aggregated separately, LEFT-joined per key within each channel, then
    UNION ALL + ROLLUP over (channel, key). Sales/returns = non-R/R lineitem
    slices (supplier channel) and O/P vs F orders (customer channel)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    zero = F.lit(0).cast("decimal(22,4)")

    base_s = li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
    ss = (
        base_s.where(F.col("l_returnflag") != "R")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("sales"))
    )
    sr = (
        base_s.where(F.col("l_returnflag") == "R")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("returns_"))
    )
    base_c = o.join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
    cs = (
        base_c.where(F.col("o_orderstatus") != "F")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(money.sum_money("o_totalprice", out="decimal(22,4)").alias("sales"))
    )
    cr = (
        base_c.where(F.col("o_orderstatus") == "F")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(money.sum_money("o_totalprice", out="decimal(22,4)").alias("returns_"))
    )
    sup = ss.join(sr, "k", "left").select(
        F.lit("supplier").alias("channel"), "k", "sales",
        F.coalesce("returns_", zero).alias("returns_"),
    )
    cust = cs.join(cr, "k", "left").select(
        F.lit("customer").alias("channel"), "k", "sales",
        F.coalesce("returns_", zero).alias("returns_"),
    )
    return (
        sup.unionAll(cust)
        .rollup("channel", "k")
        .agg(
            F.sum("sales").cast("decimal(25,4)").alias("sales"),
            F.sum("returns_").cast("decimal(25,4)").alias("returns_"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("k").asc_nulls_first())
    )


@query(
    "tpcds_q38_intersect_funnel",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS hot_cust
    FROM (
        SELECT DISTINCT c_name, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT DISTINCT c_name, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '2-HIGH'
        INTERSECT
        SELECT DISTINCT c_name, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
    ) hot_cust
    """,
)
def tpcds_q38(spark, sf_dir):
    """TPC-DS Q38 shape (queries/38.sql): 3-way INTERSECT of distinct
    customer tuples, one per channel, then count — customers active in ALL
    channels. Channels = urgent orders / high orders / finished orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))

    def chan(cond):
        return base.where(cond).select("c_name", "c_nationkey").distinct()

    funnel = (
        chan(F.col("o_orderpriority") == "1-URGENT")
        .intersect(chan(F.col("o_orderpriority") == "2-HIGH"))
        .intersect(chan(F.col("o_orderstatus") == "F"))
    )
    return funnel.agg(F.count(F.lit(1)).alias("hot_cust"))


@query(
    "tpcds_q87_except_funnel",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS cool_cust
    FROM (
        SELECT DISTINCT c_name, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT DISTINCT c_name, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '2-HIGH'
        EXCEPT
        SELECT DISTINCT c_name, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F' AND o_totalprice > 50000
    ) cool_cust
    """,
)
def tpcds_q87(spark, sf_dir):
    """TPC-DS Q87 shape (queries/87.sql): chained EXCEPT over distinct
    per-channel customer tuples — customers in the first channel only."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))

    def chan(cond):
        return base.where(cond).select("c_name", "c_nationkey").distinct()

    funnel = (
        chan(F.col("o_orderpriority") == "1-URGENT")
        .exceptAll(chan(F.col("o_orderpriority") == "2-HIGH"))
        .distinct()
        .exceptAll(
            chan((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000))
        )
        .distinct()
    )
    return funnel.agg(F.count(F.lit(1)).alias("cool_cust"))


@query(
    "tpcds_q8_zip_intersect_filter",
    cast_double=["net_profit"],
    oracle=f"""
    SELECT n_name, CAST({_DISC} AS DECIMAL(22,4)) AS net_profit
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE s_nationkey IN (
        SELECT * FROM (
            SELECT UNNEST([0,1,2,3,4,5,6,7,8,9,10,11,12]) AS nk
            INTERSECT
            SELECT c_nationkey AS nk FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_nationkey HAVING count(*) > 40
        )
    )
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q8(spark, sf_dir):
    """TPC-DS Q8 shape (queries/08.sql): fact aggregate filtered by the
    INTERSECTION of a literal key list and a HAVING-qualified subquery
    (stores in preferred zips ∩ zips of 10+-order customers → here supplier
    nations in a literal list ∩ nations of >40-order customer bases)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spark_lits = spark.range(13).select(F.col("id").cast("bigint").alias("nk"))
    busy = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 40)
        .select(F.col("c_nationkey").cast("bigint").alias("nk"))
    )
    keys = spark_lits.intersect(busy)
    return (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(keys), F.col("s_nationkey").cast("bigint") == F.col("nk"), "left_semi")
        .groupBy("n_name")
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("net_profit"))
        .orderBy("n_name")
    )


@query(
    "tpcds_q94_ship_chain",
    cast_double=["total_price"],
    oracle=f"""
    SELECT CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
           CAST(sum(CAST(l1.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS total_price
    FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderdate >= {_TS96} AND o_orderdate < {_TS97}
      AND o_orderpriority = '1-URGENT'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R')
    """,
)
def tpcds_q94(spark, sf_dir):
    """TPC-DS Q94 shape (queries/94.sql): order-count + money totals over
    lines whose order shipped from MULTIPLE warehouses (EXISTS, other
    supplier) and was never returned (NOT EXISTS against returns) — the
    web-sales ship-chain archetype. Left-semi + left-anti joins on
    orderkey, both sides pre-projected to the key columns."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ntz("1997-01-01 00:00:00"))
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.where(F.col("l_returnflag") == "R").select(F.col("l_orderkey").alias("k3"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(l3, F.col("l_orderkey") == F.col("k3"), "left_anti")
        .agg(
            F.count_distinct("l_orderkey").alias("order_count"),
            money.sum_money("l_extendedprice", out="decimal(25,2)").alias("total_price"),
        )
    )


@query(
    "tpcds_q16_catalog_chain",
    cast_double=["total_price"],
    oracle="""
    SELECT CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
           CAST(sum(CAST(l1.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS total_price
    FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
                     JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE o_orderstatus = 'F'
      AND s_nationkey NOT IN (20, 21, 22, 23, 24)
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_partkey <> l1.l_partkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_linestatus = 'O'
                        AND l3.l_returnflag = 'R')
    """,
)
def tpcds_q16(spark, sf_dir):
    """TPC-DS Q16 shape (queries/16.sql): the catalog-channel twin of Q94 —
    multi-item orders (EXISTS, different part) from non-excluded supplier
    nations, with no open returned line (NOT EXISTS with two predicates)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier").where(
        ~F.col("s_nationkey").isin(20, 21, 22, 23, 24)
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("p2"))
    l3 = li.where((F.col("l_linestatus") == "O") & (F.col("l_returnflag") == "R")).select(
        F.col("l_orderkey").alias("k3")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_partkey") != F.col("p2")),
            "left_semi",
        )
        .join(l3, F.col("l_orderkey") == F.col("k3"), "left_anti")
        .agg(
            F.count_distinct("l_orderkey").alias("order_count"),
            money.sum_money("l_extendedprice", out="decimal(25,2)").alias("total_price"),
        )
    )


@query(
    "tpcds_q53_quarterly_deviation",
    cast_double=["sum_sales", "avg_quarterly_sales"],
    oracle=f"""
    SELECT * FROM (
        SELECT p_brand,
               CAST(year(l_shipdate) AS INT) AS yr,
               CAST(quarter(l_shipdate) AS INT) AS qoy,
               CAST({_DISC} AS DECIMAL(22,4)) AS sum_sales,
               CAST(sum({_DISC}) OVER (PARTITION BY p_brand) AS DOUBLE)
                   / count(*) OVER (PARTITION BY p_brand) AS avg_quarterly_sales
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_type IN ('STANDARD', 'LARGE') AND p_size < 25)
           OR (p_type IN ('ECONOMY', 'PROMO') AND p_size >= 40)
        GROUP BY p_brand, year(l_shipdate), quarter(l_shipdate)
    ) tmp1
    WHERE CASE WHEN avg_quarterly_sales > 0
               THEN abs(CAST(sum_sales AS DOUBLE) - avg_quarterly_sales) / avg_quarterly_sales
               ELSE NULL END > 0.1
    ORDER BY avg_quarterly_sales, sum_sales, p_brand, yr, qoy
    LIMIT 100
    """,
)
def tpcds_q53(spark, sf_dir):
    """TPC-DS Q53 shape (queries/53.sql): per-brand quarterly sales vs the
    brand's all-quarter average (avg-of-group-sums window), keeping quarters
    deviating >10%. The disjunctive dim predicate (category+class+brand OR
    category+class+brand) maps to two p_type/p_size bands. The window
    average is computed as exact-decimal window sum / window count evaluated
    in double — identical IEEE quotient on both engines (never a float
    accumulation)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type").isin("STANDARD", "LARGE") & (F.col("p_size") < 25))
        | (F.col("p_type").isin("ECONOMY", "PROMO") & (F.col("p_size") >= 40))
    )
    g = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.year("l_shipdate").cast("int").alias("yr"),
            F.quarter("l_shipdate").cast("int").alias("qoy"),
        )
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("sum_sales"))
    )
    w = Window.partitionBy("p_brand")
    t = g.withColumn(
        "avg_quarterly_sales",
        F.sum("sum_sales").over(w).cast("double") / F.count(F.lit(1)).over(w),
    )
    dev = F.when(
        F.col("avg_quarterly_sales") > 0,
        F.abs(F.col("sum_sales").cast("double") - F.col("avg_quarterly_sales"))
        / F.col("avg_quarterly_sales"),
    )
    return (
        t.where(dev > 0.1)
        .orderBy("avg_quarterly_sales", "sum_sales", "p_brand", "yr", "qoy")
        .limit(100)
    )


@query(
    "tpcds_q89_monthly_deviation_wide",
    cast_double=["sum_sales", "avg_monthly_sales"],
    oracle=f"""
    SELECT * FROM (
        SELECT p_type, p_brand, n_name,
               CAST(month(l_shipdate) AS INT) AS moy,
               CAST({_DISC} AS DECIMAL(22,4)) AS sum_sales,
               CAST(sum({_DISC}) OVER (PARTITION BY p_type, p_brand, n_name) AS DOUBLE)
                   / count(*) OVER (PARTITION BY p_type, p_brand, n_name) AS avg_monthly_sales
        FROM lineitem JOIN part ON l_partkey = p_partkey
                      JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE year(l_shipdate) = 1997
          AND ((p_type IN ('STANDARD', 'SMALL') AND p_size < 30)
            OR (p_type IN ('MEDIUM', 'PROMO') AND p_size >= 30))
        GROUP BY p_type, p_brand, n_name, month(l_shipdate)
    ) tmp1
    WHERE CASE WHEN avg_monthly_sales <> 0
               THEN abs(CAST(sum_sales AS DOUBLE) - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY CAST(sum_sales AS DOUBLE) - avg_monthly_sales, p_type, p_brand, n_name, moy
    LIMIT 100
    """,
)
def tpcds_q89(spark, sf_dir):
    """TPC-DS Q89 shape (queries/89.sql): monthly sales per
    (category, brand, store) vs the group's monthly average across the year,
    ordered by the deviation itself — the wide-partition variant of Q53
    (store dim → supplier nation). Same exact-sum/count window-average
    discipline; the ORDER BY deviation is an IEEE difference of exact
    inputs, deterministic across engines, with full tiebreakers."""
    li = load_table(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1997)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type").isin("STANDARD", "SMALL") & (F.col("p_size") < 30))
        | (F.col("p_type").isin("MEDIUM", "PROMO") & (F.col("p_size") >= 30))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    g = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_type", "p_brand", "n_name", F.month("l_shipdate").cast("int").alias("moy"))
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("sum_sales"))
    )
    w = Window.partitionBy("p_type", "p_brand", "n_name")
    t = g.withColumn(
        "avg_monthly_sales",
        F.sum("sum_sales").over(w).cast("double") / F.count(F.lit(1)).over(w),
    )
    dev = F.when(
        F.col("avg_monthly_sales") != 0,
        F.abs(F.col("sum_sales").cast("double") - F.col("avg_monthly_sales"))
        / F.col("avg_monthly_sales"),
    )
    return (
        t.where(dev > 0.1)
        .orderBy(
            F.col("sum_sales").cast("double") - F.col("avg_monthly_sales"),
            "p_type", "p_brand", "n_name", "moy",
        )
        .limit(100)
    )


@query(
    "tpcds_q63_manager_deviation",
    cast_double=["sum_sales", "avg_monthly_sales"],
    oracle=f"""
    SELECT * FROM (
        SELECT s_suppkey,
               CAST(month(l_shipdate) AS INT) AS moy,
               CAST({_DISC} AS DECIMAL(22,4)) AS sum_sales,
               CAST(sum({_DISC}) OVER (PARTITION BY s_suppkey) AS DOUBLE)
                   / count(*) OVER (PARTITION BY s_suppkey) AS avg_monthly_sales
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN part ON l_partkey = p_partkey
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND s_suppkey < 40
        GROUP BY s_suppkey, month(l_shipdate)
    ) tmp1
    WHERE CASE WHEN avg_monthly_sales > 0
               THEN abs(CAST(sum_sales AS DOUBLE) - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY s_suppkey, CAST(sum_sales AS DOUBLE) - avg_monthly_sales, moy
    LIMIT 100
    """,
)
def tpcds_q63(spark, sf_dir):
    """TPC-DS Q63 shape (queries/63.sql): per-manager monthly sales vs the
    manager's average month (manager → supplier), >10% deviations ordered
    within manager by the deviation — the third of the q53/q63/q89 CASE-
    deviation family, partitioned by a numeric key rather than brand."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_suppkey") < 40)
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    g = (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("s_suppkey", F.month("l_shipdate").cast("int").alias("moy"))
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("sum_sales"))
    )
    w = Window.partitionBy("s_suppkey")
    t = g.withColumn(
        "avg_monthly_sales",
        F.sum("sum_sales").over(w).cast("double") / F.count(F.lit(1)).over(w),
    )
    dev = F.when(
        F.col("avg_monthly_sales") > 0,
        F.abs(F.col("sum_sales").cast("double") - F.col("avg_monthly_sales"))
        / F.col("avg_monthly_sales"),
    )
    return (
        t.where(dev > 0.1)
        .orderBy(
            "s_suppkey",
            F.col("sum_sales").cast("double") - F.col("avg_monthly_sales"),
            "moy",
        )
        .limit(100)
    )


@query(
    "tpcds_q28_band_battery",
    cast_double=["b1_avg", "b2_avg", "b3_avg", "b4_avg"],
    oracle="""
    SELECT b1.avg_p AS b1_avg, b1.cnt AS b1_cnt, b1.cntd AS b1_cntd,
           b2.avg_p AS b2_avg, b2.cnt AS b2_cnt, b2.cntd AS b2_cntd,
           b3.avg_p AS b3_avg, b3.cnt AS b3_cnt, b3.cntd AS b3_cntd,
           b4.avg_p AS b4_avg, b4.cnt AS b4_cnt, b4.cntd AS b4_cntd
    FROM
      (SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS avg_p,
              CAST(count(*) AS BIGINT) AS cnt, CAST(count(DISTINCT l_partkey) AS BIGINT) AS cntd
       FROM lineitem WHERE l_quantity BETWEEN 0 AND 5) b1,
      (SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS avg_p,
              CAST(count(*) AS BIGINT) AS cnt, CAST(count(DISTINCT l_partkey) AS BIGINT) AS cntd
       FROM lineitem WHERE l_quantity BETWEEN 6 AND 10) b2,
      (SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS avg_p,
              CAST(count(*) AS BIGINT) AS cnt, CAST(count(DISTINCT l_partkey) AS BIGINT) AS cntd
       FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) b3,
      (SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS avg_p,
              CAST(count(*) AS BIGINT) AS cnt, CAST(count(DISTINCT l_partkey) AS BIGINT) AS cntd
       FROM lineitem WHERE l_quantity BETWEEN 21 AND 50) b4
    """,
)
def tpcds_q28(spark, sf_dir):
    """TPC-DS Q28 shape (queries/28.sql): six (here four) disjoint quantity
    bands, each producing (avg price, row count, distinct-item count),
    cross-joined into ONE wide row. Each band is an independent scan
    aggregate — Catalyst runs them as parallel subtrees under a single
    1-row nested-loop combine, the reference's plan. avg = exact decimal
    sum / count rendered at a fixed 6-decimal scale."""
    li = load_table(spark, sf_dir, "lineitem")

    def band(lo, hi, tag):
        return (
            li.where(F.col("l_quantity").between(lo, hi))
            .agg(
                (F.sum(money.cents("l_extendedprice")).cast("double") / F.lit(100.0) / F.count(F.lit(1)))
                .cast("decimal(18,6)")
                .alias(f"{tag}_avg"),
                F.count(F.lit(1)).alias(f"{tag}_cnt"),
                F.count_distinct("l_partkey").alias(f"{tag}_cntd"),
            )
        )

    out = band(0, 5, "b1")
    for args in [(6, 10, "b2"), (11, 20, "b3"), (21, 50, "b4")]:
        out = out.crossJoin(band(*args))
    return out


@query(
    "tpcds_q32_excess_discount",
    cast_double=["excess_discount"],
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS excess_discount
    FROM lineitem l
         JOIN part ON l.l_partkey = p_partkey
         JOIN (SELECT l_partkey AS ak,
                      CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc
               FROM lineitem GROUP BY l_partkey) a
           ON l.l_partkey = a.ak
    WHERE p_brand = 'Brand#2'
      AND CAST(l.l_discount AS DOUBLE) > 1.3 * a.avg_disc
    """,
)
def tpcds_q32(spark, sf_dir):
    """TPC-DS Q32 shape (queries/32.sql): 'excess discount' — sum of prices
    on lines whose discount exceeds 1.3x the item's average discount
    (correlated avg subquery decorrelated into a grouped join). The
    threshold is exact-decimal sum / count in double: both engines compute
    the identical quotient, so the > comparison cannot diverge."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#2")
    avg_d = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.sum(money.cents("l_discount")).cast("double") / F.lit(100.0) / F.count(F.lit(1))).alias("avg_disc")
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(avg_d, F.col("l_partkey") == F.col("ak"))
        .where(F.col("l_discount").cast("double") > 1.3 * F.col("avg_disc"))
        .agg(money.sum_money("l_extendedprice", out="decimal(25,2)").alias("excess_discount"))
    )


@query(
    "tpcds_q62_ship_latency_buckets",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 30
                          AND datediff('day', o_orderdate, l_shipdate) <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
                          AND datediff('day', o_orderdate, l_shipdate) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
                          AND datediff('day', o_orderdate, l_shipdate) <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_over
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpcds_q62(spark, sf_dir):
    """TPC-DS Q62 shape (queries/62.sql): ship-latency histogram — days
    between order and ship bucketed 30/60/90/120+ as one wide conditional-
    count row per group (ship mode -> order priority). One fact shuffle,
    all bucketing in the projection."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))

    def bucket(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            bucket(lat <= 30, "d30"),
            bucket((lat > 30) & (lat <= 60), "d60"),
            bucket((lat > 60) & (lat <= 90), "d90"),
            bucket((lat > 90) & (lat <= 120), "d120"),
            bucket(lat > 120, "d_over"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "tpcds_q65_below_avg_items",
    cast_double=["revenue", "avg_revenue"],
    oracle=f"""
    WITH sa AS (
        SELECT s_nationkey AS nk, l_partkey,
               CAST({_DISC} AS DECIMAL(22,4)) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_partkey
    ), sb AS (
        SELECT nk AS bnk, CAST(sum(revenue) AS DOUBLE) / count(*) AS avg_revenue
        FROM sa GROUP BY nk
    )
    SELECT sa.nk, l_partkey, revenue, avg_revenue
    FROM sa JOIN sb ON sa.nk = sb.bnk
    WHERE CAST(revenue AS DOUBLE) <= 0.1 * avg_revenue
    ORDER BY sa.nk, l_partkey
    LIMIT 100
    """,
)
def tpcds_q65(spark, sf_dir):
    """TPC-DS Q65 shape (queries/65.sql): items selling at <= 10% of their
    store's average item revenue — a two-level aggregate (store-item, then
    store) self-joined back. Store -> supplier nation. The per-store
    average is exact-sum / count in double."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    sa = (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nk"), "l_partkey")
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("revenue"))
    )
    sb = sa.groupBy(F.col("nk").alias("bnk")).agg(
        (F.sum("revenue").cast("double") / F.count(F.lit(1))).alias("avg_revenue")
    )
    return (
        sa.join(sb, sa.nk == sb.bnk)
        .where(F.col("revenue").cast("double") <= 0.1 * F.col("avg_revenue"))
        .select("nk", "l_partkey", "revenue", "avg_revenue")
        .orderBy("nk", "l_partkey")
        .limit(100)
    )


@query(
    "tpcds_q66_month_pivot_wide",
    cast_double=[f"m{i}" for i in range(1, 13)],
    oracle=f"""
    SELECT n_name,
           {", ".join(f"CAST(sum(CASE WHEN month(l_shipdate) = {m} THEN "
                      "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
                      f" ELSE CAST(0 AS DECIMAL(22,4)) END) AS DECIMAL(25,4)) AS m{m}" for m in range(1, 13))}
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE year(l_shipdate) = 1997
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q66(spark, sf_dir):
    """TPC-DS Q66 shape (queries/66.sql): the wide 12-month CASE pivot —
    one revenue column per month per warehouse (-> supplier nation), all
    twelve conditional sums in a single aggregate pass over one shuffle."""
    li = load_table(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1997)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    aggs = [
        money.units_to_decimal(
            F.sum(
                F.when(F.month("l_shipdate") == m, money.disc_price_units()).otherwise(F.lit(0))
            ),
            4,
            "decimal(25,4)",
        ).alias(f"m{m}")
        for m in range(1, 13)
    ]
    return (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(*aggs)
        .orderBy("n_name")
    )


@query(
    "tpcds_q75_yearly_decline",
    cast_double=["curr_rev", "prev_rev", "ratio"],
    oracle=f"""
    WITH yearly AS (
        SELECT p_brand, CAST(year(l_shipdate) AS INT) AS yr,
               CAST({_DISC} AS DECIMAL(22,4)) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, year(l_shipdate)
    )
    SELECT c.p_brand, c.yr,
           c.rev AS curr_rev, p.rev AS prev_rev,
           CAST(c.rev AS DOUBLE) / CAST(p.rev AS DOUBLE) AS ratio
    FROM yearly c JOIN yearly p ON c.p_brand = p.p_brand AND c.yr = p.yr + 1
    WHERE CAST(c.rev AS DOUBLE) / CAST(p.rev AS DOUBLE) < 0.9
    ORDER BY ratio, c.p_brand, c.yr
    LIMIT 100
    """,
)
def tpcds_q75(spark, sf_dir):
    """TPC-DS Q75 shape (queries/75.sql): year-over-year revenue per brand
    via a self-join of the yearly aggregate on (brand, yr = yr+1), keeping
    brands that declined below 90% — the ratio is a raw IEEE quotient of two
    exact decimal sums (identical on both engines, never rounded)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    yearly = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(money.sum_disc_price(out="decimal(22,4)").alias("rev"))
    )
    cur = yearly.select("p_brand", "yr", F.col("rev").alias("curr_rev"))
    prv = yearly.select(
        F.col("p_brand").alias("pb"), F.col("yr").alias("pyr"), F.col("rev").alias("prev_rev")
    )
    ratio = F.col("curr_rev").cast("double") / F.col("prev_rev").cast("double")
    return (
        cur.join(prv, (cur.p_brand == prv.pb) & (cur.yr == prv.pyr + 1))
        .withColumn("ratio", ratio)
        .where(F.col("ratio") < 0.9)
        .select("p_brand", "yr", "curr_rev", "prev_rev", "ratio")
        .orderBy("ratio", "p_brand", "yr")
        .limit(100)
    )


@query(
    "tpcds_q90_am_pm_ratio",
    cast_double=["am_pm_ratio"],
    oracle="""
    SELECT CAST(am.cnt AS DOUBLE) / pm.cnt AS am_pm_ratio
    FROM (SELECT count(*) AS cnt FROM events WHERE hour(ts) BETWEEN 6 AND 11) am,
         (SELECT count(*) AS cnt FROM events WHERE hour(ts) BETWEEN 12 AND 17) pm
    """,
)
def tpcds_q90(spark, sf_dir):
    """TPC-DS Q90 shape (queries/90.sql): the AM/PM ratio — two disjoint
    hour-band counts over the event stream cross-joined into one quotient
    row (web_sales time_dim bands -> events ts hours)."""
    e = load_table(spark, sf_dir, "events")
    am = e.where(F.hour("ts").between(6, 11)).agg(F.count(F.lit(1)).alias("am_cnt"))
    pm = e.where(F.hour("ts").between(12, 17)).agg(F.count(F.lit(1)).alias("pm_cnt"))
    return am.crossJoin(pm).select(
        (F.col("am_cnt").cast("double") / F.col("pm_cnt")).alias("am_pm_ratio")
    )


@query(
    "tpcds_q97_channel_overlap",
    oracle="""
    WITH ssci AS (
        SELECT DISTINCT o_custkey AS cust, l_partkey AS item
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag <> 'R'
    ), csci AS (
        SELECT DISTINCT o_custkey AS cust, l_partkey AS item
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
    )
    SELECT CAST(sum(CASE WHEN ssci.cust IS NOT NULL AND csci.cust IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
           CAST(sum(CASE WHEN ssci.cust IS NULL AND csci.cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
           CAST(sum(CASE WHEN ssci.cust IS NOT NULL AND csci.cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
    FROM ssci FULL OUTER JOIN csci
      ON ssci.cust = csci.cust AND ssci.item = csci.item
    """,
)
def tpcds_q97(spark, sf_dir):
    """TPC-DS Q97 shape (queries/97.sql): channel-overlap counts — distinct
    (customer, item) sets per channel FULL OUTER joined, one row of
    store-only / catalog-only / both counts (channels = kept vs returned
    lines)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    base = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    ssci = (
        base.where(F.col("l_returnflag") != "R")
        .select(F.col("o_custkey").alias("s_cust"), F.col("l_partkey").alias("s_item"))
        .distinct()
    )
    csci = (
        base.where(F.col("l_returnflag") == "R")
        .select(F.col("o_custkey").alias("c_cust"), F.col("l_partkey").alias("c_item"))
        .distinct()
    )
    j = ssci.join(
        csci,
        (F.col("s_cust") == F.col("c_cust")) & (F.col("s_item") == F.col("c_item")),
        "full_outer",
    )
    return j.agg(
        F.sum(
            F.when(F.col("s_cust").isNotNull() & F.col("c_cust").isNull(), 1).otherwise(0)
        ).alias("store_only"),
        F.sum(
            F.when(F.col("s_cust").isNull() & F.col("c_cust").isNotNull(), 1).otherwise(0)
        ).alias("catalog_only"),
        F.sum(
            F.when(F.col("s_cust").isNotNull() & F.col("c_cust").isNotNull(), 1).otherwise(0)
        ).alias("both_channels"),
    )


@query(
    "tpcds_q39_variance_filter",
    cast_double=["mean_qty", "cov"],
    oracle="""
    SELECT * FROM (
        SELECT l_suppkey, l_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS mean_qty,
               CASE WHEN count(*) = 1 OR sum(CAST(l_quantity AS DECIMAL(12,2))) = 0 THEN NULL
                    ELSE sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                               - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
                              / (count(*) - 1))
                         / (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)) END AS cov
        FROM lineitem
        GROUP BY l_suppkey, l_partkey
    ) foo
    WHERE cov IS NOT NULL AND cov > 1.0
    ORDER BY l_suppkey, l_partkey
    LIMIT 100
    """,
)
def tpcds_q39(spark, sf_dir):
    """TPC-DS Q39 shape (queries/39.sql): inventory coefficient-of-variation
    filter — per (warehouse, item) keep groups with stdev/mean > 1. stdev is
    computed FROM EXACT integer sums (sum, sum of squares, count) via the
    textbook formula, NOT the engines' float stddev aggregates whose
    accumulation order differs; both engines then evaluate the identical
    IEEE expression."""
    li = load_table(spark, sf_dir, "lineitem")
    q_units = money.cents("l_quantity")  # exact 1e-2 units as LONG
    g = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(q_units).alias("s1"),
        F.sum(q_units * q_units).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    # decimal-exact sums: s1 in 1e-2 units, s2 in 1e-4 units
    s1d = F.col("s1").cast("double") / F.lit(100.0)
    s2d = F.col("s2").cast("double") / F.lit(10000.0)
    mean = s1d / F.col("n")
    cov = F.when(
        (F.col("n") == 1) | (F.col("s1") == 0), F.lit(None).cast("double")
    ).otherwise(
        F.sqrt((s2d - s1d * s1d / F.col("n")) / (F.col("n") - 1)) / mean
    )
    return (
        g.select("l_suppkey", "l_partkey", mean.alias("mean_qty"), cov.alias("cov"))
        .where(F.col("cov").isNotNull() & (F.col("cov") > 1.0))
        .orderBy("l_suppkey", "l_partkey")
        .limit(100)
    )


@query(
    "tpcds_q61_promo_ratio",
    cast_double=["promo_rev", "total_rev", "promo_pct"],
    oracle=f"""
    SELECT CAST(promo.rev AS DECIMAL(25,4)) AS promo_rev,
           CAST(total.rev AS DECIMAL(25,4)) AS total_rev,
           CAST(promo.rev AS DOUBLE) / CAST(total.rev AS DOUBLE) * 100 AS promo_pct
    FROM (SELECT {_DISC} AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'PROMO') promo,
         (SELECT {_DISC} AS rev
          FROM lineitem) total
    """,
)
def tpcds_q61(spark, sf_dir):
    """TPC-DS Q61 shape (queries/61.sql): promotional revenue share — two
    scalar aggregates (promo-channel revenue, total revenue) cross-joined
    into a percentage. The pct is the raw IEEE quotient x100 of two exact
    decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    promo = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .agg(money.sum_disc_price(out="decimal(25,4)").alias("promo_rev"))
    )
    total = li.agg(money.sum_disc_price(out="decimal(25,4)").alias("total_rev"))
    return promo.crossJoin(total).select(
        "promo_rev",
        "total_rev",
        (F.col("promo_rev").cast("double") / F.col("total_rev").cast("double") * 100).alias("promo_pct"),
    )


@query(
    "tpcds_q3_brand_year_star",
    cast_double=["sum_agg"],
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS d_year, p_brand,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS sum_agg
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size = 10
    GROUP BY year(l_shipdate), p_brand
    ORDER BY d_year, sum_agg DESC, p_brand
    LIMIT 100
    """,
)
def tpcds_q3(spark, sf_dir):
    """TPC-DS Q3 shape (queries/03.sql): the canonical star — fact joined to
    a filtered item dim and date dim, grouped by (year, brand), ordered by
    year then revenue desc with brand tiebreaker."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == 10)
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("d_year"), "p_brand")
        .agg(money.sum_money("l_extendedprice", out="decimal(25,2)").alias("sum_agg"))
        .orderBy("d_year", F.desc("sum_agg"), "p_brand")
        .limit(100)
    )


@query(
    "tpcds_q31_growth_compare",
    cast_double=["g1", "g2"],
    oracle=f"""
    WITH q AS (
        SELECT s_nationkey AS nk, CAST(quarter(l_shipdate) AS INT) AS qoy,
               CAST(sum(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS kept,
               CAST(sum(CASE WHEN l_returnflag  = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS ret
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE year(l_shipdate) = 1997
        GROUP BY s_nationkey, quarter(l_shipdate)
    )
    SELECT a.nk,
           CAST(b.kept AS DOUBLE) / CAST(a.kept AS DOUBLE) AS g1,
           CAST(b.ret  AS DOUBLE) / CAST(a.ret  AS DOUBLE) AS g2
    FROM q a JOIN q b ON a.nk = b.nk AND a.qoy = 1 AND b.qoy = 2
    WHERE a.kept > 0 AND a.ret > 0
      AND CAST(b.kept AS DOUBLE) / CAST(a.kept AS DOUBLE)
        > CAST(b.ret  AS DOUBLE) / CAST(a.ret  AS DOUBLE)
    ORDER BY a.nk
    """,
)
def tpcds_q31(spark, sf_dir):
    """TPC-DS Q31 shape (queries/31.sql): quarter-over-quarter growth rates
    of TWO channels per geography, keeping geographies where channel 1 grew
    faster — a self-join of the per-(geo, quarter) aggregate with two
    cross-channel ratio comparisons, each a raw IEEE quotient of exact
    decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1997)
    s = load_table(spark, sf_dir, "supplier")
    kept_c = F.when(F.col("l_returnflag") != "R", money.cents("l_extendedprice")).otherwise(F.lit(0))
    ret_c = F.when(F.col("l_returnflag") == "R", money.cents("l_extendedprice")).otherwise(F.lit(0))
    q = (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nk"), F.quarter("l_shipdate").cast("int").alias("qoy"))
        .agg(
            money.units_to_decimal(F.sum(kept_c), 2, "decimal(22,2)").alias("kept"),
            money.units_to_decimal(F.sum(ret_c), 2, "decimal(22,2)").alias("ret"),
        )
    )
    a = q.where(F.col("qoy") == 1).select("nk", F.col("kept").alias("k1"), F.col("ret").alias("r1"))
    b = q.where(F.col("qoy") == 2).select(
        F.col("nk").alias("nk2"), F.col("kept").alias("k2"), F.col("ret").alias("r2")
    )
    g1 = F.col("k2").cast("double") / F.col("k1").cast("double")
    g2 = F.col("r2").cast("double") / F.col("r1").cast("double")
    return (
        a.join(b, F.col("nk") == F.col("nk2"))
        .where((F.col("k1") > 0) & (F.col("r1") > 0))
        .withColumn("g1", g1)
        .withColumn("g2", g2)
        .where(F.col("g1") > F.col("g2"))
        .select("nk", "g1", "g2")
        .orderBy("nk")
    )


@query(
    "tpcds_q76_null_channel_counts",
    cast_double=["total_price"],
    oracle="""
    SELECT channel, col_name, CAST(count(*) AS BIGINT) AS sales_cnt,
           CAST(sum(CAST(price AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS total_price
    FROM (
        SELECT 'supplier' AS channel, 'dim_miss' AS col_name, l_extendedprice AS price
        FROM lineitem LEFT JOIN part
          ON l_partkey = p_partkey AND p_size > 10
        WHERE p_partkey IS NULL
        UNION ALL
        SELECT 'customer' AS channel, 'dim_miss' AS col_name, o_totalprice AS price
        FROM orders LEFT JOIN customer
          ON o_custkey = c_custkey AND c_acctbal > 0
        WHERE c_custkey IS NULL
    ) u
    GROUP BY channel, col_name
    ORDER BY channel, col_name
    """,
)
def tpcds_q76(spark, sf_dir):
    """TPC-DS Q76 shape (queries/76.sql: counts of fact rows whose dim key
    is NULL, per channel, UNION ALL'd then grouped): the NULL-key audit.
    Driver data has full integrity, so the 'missing dimension' rows are
    produced the way real pipelines hit them — a LEFT join whose dim side
    carries an extra predicate, probed with IS NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") > 10)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    sup = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"), "left")
        .where(F.col("p_partkey").isNull())
        .select(
            F.lit("supplier").alias("channel"),
            F.lit("dim_miss").alias("col_name"),
            F.col("l_extendedprice").alias("price"),
        )
    )
    cust = (
        o.join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"), "left")
        .where(F.col("c_custkey").isNull())
        .select(
            F.lit("customer").alias("channel"),
            F.lit("dim_miss").alias("col_name"),
            F.col("o_totalprice").alias("price"),
        )
    )
    return (
        sup.unionAll(cust)
        .groupBy("channel", "col_name")
        .agg(
            F.count(F.lit(1)).alias("sales_cnt"),
            money.sum_money("price", out="decimal(25,2)").alias("total_price"),
        )
        .orderBy("channel", "col_name")
    )


@query(
    "tpcds_q25_threeway_chain",
    cast_double=["sold_total", "returned_total"],
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(ls.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS sold_total,
           CAST(sum(CAST(lr.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS returned_total,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem ls
    JOIN lineitem lr ON ls.l_orderkey = lr.l_orderkey AND lr.l_returnflag = 'R'
                    AND ls.l_linenumber <> lr.l_linenumber
    JOIN orders   ON ls.l_orderkey = o_orderkey
    JOIN supplier ON ls.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE ls.l_returnflag = 'N' AND o_orderstatus = 'F'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q25(spark, sf_dir):
    """TPC-DS Q25 shape (queries/25.sql: store_sales ⋈ store_returns ⋈
    catalog_sales chained through item+customer, stats per store): a
    fact-fact-fact chain — kept lines paired with returned lines of the
    same finished order, rolled up per supplier nation. Both fact scans
    co-shuffle on l_orderkey; dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    ls = li.where(F.col("l_returnflag") == "N")
    lr = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("rk"),
        F.col("l_linenumber").alias("rln"),
        F.col("l_extendedprice").alias("r_price"),
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        ls.join(
            lr,
            (F.col("l_orderkey") == F.col("rk")) & (F.col("l_linenumber") != F.col("rln")),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            money.sum_money("l_extendedprice", out="decimal(25,2)").alias("sold_total"),
            money.sum_money("r_price", out="decimal(25,2)").alias("returned_total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_name")
    )


@query(
    "tpcds_q13_bracket_avgs",
    cast_double=["avg_qty", "avg_price", "sum_price"],
    oracle="""
    SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS DOUBLE) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING' AND l_extendedprice BETWEEN 1000 AND 3000 AND l_quantity BETWEEN 1 AND 20)
       OR (c_mktsegment = 'MACHINERY' AND l_extendedprice BETWEEN 2000 AND 5000 AND l_quantity BETWEEN 10 AND 40)
       OR (c_mktsegment = 'HOUSEHOLD' AND l_extendedprice BETWEEN 500 AND 2000 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def tpcds_q13(spark, sf_dir):
    """TPC-DS Q13 shape (queries/13.sql): ungrouped averages under THREE
    OR'd demographic brackets, each tying a dim attribute to a fact price
    AND quantity band — the canonical disjunctive-bracket scan where no
    single band is pushable but the union of fact ranges is. Averages are
    exact-sum / count quotients."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def bracket(seg, plo, phi, qlo, qhi):
        return (
            (F.col("c_mktsegment") == seg)
            & F.col("l_extendedprice").between(plo, phi)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = (
        bracket("BUILDING", 1000, 3000, 1, 20)
        | bracket("MACHINERY", 2000, 5000, 10, 40)
        | bracket("HOUSEHOLD", 500, 2000, 20, 50)
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .where(cond)
        .agg(
            (F.sum(money.cents("l_quantity")).cast("double") / F.lit(100.0) / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money.cents("l_extendedprice")).cast("double") / F.lit(100.0) / F.count(F.lit(1))).alias("avg_price"),
            money.sum_money("l_extendedprice", out="decimal(25,2)").cast("double").alias("sum_price"),
        )
    )


@query(
    "tpcds_q48_bracket_sum",
    oracle="""
    SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(25,2)) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND ((n_name IN ('FRANCE', 'GERMANY', 'RUSSIA') AND l_extendedprice BETWEEN 0 AND 2000)
        OR (n_name IN ('CHINA', 'JAPAN', 'INDIA') AND l_extendedprice BETWEEN 1500 AND 4000)
        OR (n_name IN ('BRAZIL', 'CANADA', 'PERU') AND l_extendedprice BETWEEN 3000 AND 25000))
    """,
    cast_double=["total_qty"],
)
def tpcds_q48(spark, sf_dir):
    """TPC-DS Q48 shape (queries/48.sql): one big conditional sum under
    geography×price-band OR brackets (state/price -> nation/price) — the
    sum-only sibling of Q13."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cond = (
        (F.col("n_name").isin("FRANCE", "GERMANY", "RUSSIA") & F.col("l_extendedprice").between(0, 2000))
        | (F.col("n_name").isin("CHINA", "JAPAN", "INDIA") & F.col("l_extendedprice").between(1500, 4000))
        | (F.col("n_name").isin("BRAZIL", "CANADA", "PERU") & F.col("l_extendedprice").between(3000, 25000))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(cond)
        .agg(money.sum_money("l_quantity", out="decimal(25,2)").alias("total_qty"))
    )


@query(
    "tpcds_q46_geo_mismatch",
    cast_double=["amt"],
    oracle="""
    SELECT c_name, o_orderkey, CAST(dn.amt AS DECIMAL(25,4)) AS amt
    FROM (
        SELECT o_orderkey, o_custkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(25,4)) AS amt,
               min(s_nationkey) AS ship_nation
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN supplier ON l_suppkey = s_suppkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderkey, o_custkey
        HAVING count(DISTINCT s_nationkey) = 1
    ) dn JOIN customer ON o_custkey = c_custkey
    WHERE dn.ship_nation <> c_nationkey
    ORDER BY c_name, o_orderkey
    LIMIT 100
    """,
)
def tpcds_q46(spark, sf_dir):
    """TPC-DS Q46 shape (queries/46.sql: per-ticket totals where the
    customer's current city differs from the sale-time address): per-order
    totals restricted to single-nation shipments (HAVING on a distinct
    count), then joined to the customer and kept when the ship nation
    differs from the customer's — the mismatch-HAVING archetype."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    dn = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            money.sum_disc_price(out="decimal(25,4)").alias("amt"),
            F.min("s_nationkey").alias("ship_nation"),
            F.count_distinct("s_nationkey").alias("n_nations"),
        )
        .where(F.col("n_nations") == 1)
    )
    return (
        dn.join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("ship_nation") != F.col("c_nationkey"))
        .select("c_name", "o_orderkey", "amt")
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


@query(
    "tpcds_q79_best_store_visit",
    cast_double=["profit"],
    oracle=f"""
    SELECT c_name, n_name, profit
    FROM (
        SELECT o_custkey AS cust, s_nationkey AS nk,
               CAST({_DISC} AS DECIMAL(25,4)) AS profit,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST({_DISC} AS DECIMAL(25,4)) DESC, s_nationkey
               ) AS rn
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY o_custkey, s_nationkey
    ) best
    JOIN customer ON cust = c_custkey
    JOIN nation ON nk = n_nationkey
    WHERE rn = 1 AND cust < 300
    ORDER BY c_name
    """,
)
def tpcds_q79(spark, sf_dir):
    """TPC-DS Q79 shape (queries/79.sql: each customer's most profitable
    store visit): argmax-per-group — profit per (customer, store-nation),
    rank 1 within customer by profit with a key tiebreaker, re-joined to
    the dims for display."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    n = load_table(spark, sf_dir, "nation")
    g = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("o_custkey").alias("cust"), F.col("s_nationkey").alias("nk"))
        .agg(money.sum_disc_price(out="decimal(25,4)").alias("profit"))
    )
    w = W.partitionBy("cust").orderBy(F.desc("profit"), "nk")
    best = g.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        best.join(maybe_broadcast(c, sf_dir, "customer"), F.col("cust") == F.col("c_custkey"), "inner")
        .join(F.broadcast(n), F.col("nk") == F.col("n_nationkey"))
        .select("c_name", "n_name", "profit")
        .orderBy("c_name")
    )
