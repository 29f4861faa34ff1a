"""TPC-H-derived queries adapted to the driver's pruned schema (FIXTURES.md §1).

Reference queries: /root/reference/extension/tpch/dbgen/queries/q01..q22.sql,
answers extension/tpch/dbgen/answers/. The driver testdata lacks partsupp and
several columns (l_shipmode, l_commitdate, o_shippriority, …), so queries that
need them are adapted — same operator shapes (scan→filter→join→agg→sort→limit),
driver columns only.

Money math runs in exact DECIMAL with identical casts on both engines:
driver doubles hold 2-decimal values ≤ ~1e7, so DECIMAL(12,2) is lossless.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table, maybe_broadcast
from duckdb_parachute_spark.functions import money
from duckdb_parachute_spark.workload import query

# Exact-decimal money sums shared with the oracle SQL: the oracle spells
# sum(CAST(x AS DECIMAL(12,2)) * ...); the Spark side computes the identical
# value on integer units (functions/money.py — DuckDB's own hugeint-backed
# decimal-sum representation) and rescales to DECIMAL once per group.
def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


@query(
    "tpch_q1_pricing_summary",
    cast_double=["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"],
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(25,6)) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 (reference queries/q01.sql): scan→filter→group-agg.

    Catalyst plans this as parquet scan with pushed l_shipdate filter +
    partial/final hash aggregate — the same shape DuckDB builds with
    PhysicalHashAggregate (reference physical_hash_aggregate.cpp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money.sum_money("l_quantity").alias("sum_qty"),
            money.sum_money("l_extendedprice").alias("sum_base_price"),
            money.sum_disc_price().alias("sum_disc_price"),
            money.sum_charge().alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    cast_double=["revenue"],
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 (queries/q03.sql, o_shippriority→o_orderpriority): 3-way join,
    agg, top-N. The customer side is dimension-sized → Spark broadcasts it."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money.sum_disc_price().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 (queries/q04.sql, commitdate/receiptdate → shipdate>orderdate):
    EXISTS over lineitem (DuckDB plans a SEMI hash join building on the small
    filtered-orders side, reference plan_comparison_join.cpp:66). Spark's
    LeftSemi hash join can only build on the RIGHT, so the direct `orders
    SEMI JOIN lineitem` form hashes the whole fact table; instead probe
    lineitem through the dimension-sized orders build (inner join) and
    de-duplicate matches with count(DISTINCT o_orderkey) — same cardinality
    as EXISTS, build side stays the 3-month order slice at any scale."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = li.join(
        o,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "inner",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count_distinct("o_orderkey").alias("order_count")
    )


@query(
    "tpch_q5_local_supplier_volume",
    cast_double=["revenue"],
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 (queries/q05.sql): 6-table join. Dimension chain
    region→nation→supplier broadcasts; fact-fact orders⋈lineitem shuffles on
    orderkey once (DuckDB's DP join-order pass picks the same shape,
    reference src/optimizer/join_order/plan_enumerator.cpp:318)."""
    t = {n: load_table(spark, sf_dir, n) for n in ["customer", "orders", "lineitem", "supplier", "nation", "region"]}
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    dim = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), t["supplier"].s_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              t["nation"].n_regionkey == t["region"].r_regionkey)
    )
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(t["customer"], sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            maybe_broadcast(dim, sf_dir, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(money.sum_disc_price().alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    cast_double=["revenue"],
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(22,4)) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6 (queries/q06.sql): pure scan+filter+ungrouped agg; every
    predicate reaches the parquet reader as a pushed filter."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money.units_to_decimal(
            F.sum(money.cents("l_extendedprice") * money.cents("l_discount")), 4, "decimal(22,4)"
        ).alias("revenue")
    )


@query(
    "tpch_q10_returned_items",
    cast_double=["revenue"],
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 (queries/q10.sql): returned-item revenue by customer, top 20."""
    t = {n: load_table(spark, sf_dir, n) for n in ["customer", "orders", "lineitem", "nation"]}
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(t["customer"], sf_dir, "customer"), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money.sum_disc_price().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 (queries/q12.sql, l_shipmode→l_linestatus): join + conditional
    counts (the FILTER-clause pattern, SURVEY §2.4)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 (queries/q14.sql): broadcast join + conditional ratio.

    Ratio is computed in double then rounded: numerator/denominator are
    engine-order-dependent sums, but the quotient's relative error is ~1e-12,
    far below the 1e-4 rounding step."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    cast_double=["sum_qty"],
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 (queries/q18.sql): agg-subquery IN. The classic plan
    semi-joins lineitem against the HAVING result and re-aggregates; but the
    HAVING aggregation already holds each qualifying order's total quantity,
    so the semi join + second lineitem pass collapse into reusing that
    aggregate — one lineitem shuffle total (DuckDB's common-aggregate pass,
    reference common_aggregate_optimizer.cpp, makes the same observation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(money.sum_money("l_quantity", out="decimal(18,2)").alias("q"))
        .where(F.col("q") > 150)
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("q")).cast("decimal(18,2)").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"), "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive_predicates",
    cast_double=["revenue"],
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 (queries/q19.sql, shipmode/container pruned): disjunctive
    join+filter predicates — exercises OR-predicate pushdown through a join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(money.sum_disc_price().alias("revenue"))


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), shipped AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), cand AS (
        SELECT p_partkey, p_name, s_name, s_acctbal, n_name
        FROM shipped JOIN part ON l_partkey = p_partkey
                     JOIN eu ON l_suppkey = s_suppkey
        WHERE p_size <= 15 AND p_type = 'LARGE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand c
    WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark, sf_dir):
    """TPC-H Q2 (queries/q02.sql) adapted: no partsupp in driver data, so the
    part↔supplier relation is distinct (l_partkey, l_suppkey) from lineitem and
    min ps_supplycost becomes min s_acctbal. Shape preserved: dimension-chain
    broadcast join + correlated-min decorrelated into a grouped self-join
    (reference flatten_dependent_join.cpp)."""
    t = {n: load_table(spark, sf_dir, n) for n in ["supplier", "nation", "region", "part", "lineitem"]}
    eu = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t["part"].where((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
    shipped = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    cand = (
        shipped.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(eu, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    minb = cand.groupBy(F.col("p_partkey").alias("mk")).agg(F.min("s_acctbal").alias("mb"))
    return (
        cand.join(maybe_broadcast(minb, sf_dir, "part"), (F.col("p_partkey") == F.col("mk")) & (F.col("s_acctbal") == F.col("mb")))
        .select(F.round("s_acctbal", 2).alias("s_acctbal"), "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q7_volume_shipping",
    cast_double=["revenue"],
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year, l_extendedprice, l_discount
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                      JOIN orders   ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 (queries/q07.sql, FRANCE/GERMANY → NATION_1/NATION_2): two-
    nation volume by year. Both nation joins broadcast; the disjunctive nation
    pair predicate lands after them."""
    t = {n: load_table(spark, sf_dir, n) for n in ["supplier", "lineitem", "orders", "customer", "nation"]}
    n1 = t["nation"].select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(t["customer"], sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(t["supplier"], sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money.sum_disc_price().alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region   ON n1.n_regionkey = r_regionkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 (queries/q08.sql, BRAZIL→NATION_3, STEEL type→ECONOMY):
    national market share — conditional-sum ratio per year over a 7-table
    star join (all dimensions broadcast, lineitem never leaves its shuffle)."""
    t = {n: load_table(spark, sf_dir, n)
         for n in ["part", "lineitem", "supplier", "orders", "customer", "nation", "region"]}
    n1 = t["nation"].select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    volume = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(maybe_broadcast(t["part"].where(F.col("p_type") == "ECONOMY"), sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(t["customer"], sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "AMERICA")), F.col("rk1") == F.col("r_regionkey"))
        .join(maybe_broadcast(t["supplier"], sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))) / F.sum(volume), 6
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_type_profit",
    cast_double=["sum_profit"],
    oracle="""
    SELECT nation, o_year, CAST(sum(amount) AS DECIMAL(25,4)) AS sum_profit
    FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
               - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,2)) AS amount
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 (queries/q09.sql): profit by supplier nation and year. Driver
    data has no partsupp, so ps_supplycost*l_quantity becomes
    p_retailprice*l_quantity — identical exact-decimal shape on both engines."""
    t = {n: load_table(spark, sf_dir, n) for n in ["part", "lineitem", "supplier", "orders", "nation"]}
    # both terms in 1e-4 integer units: price·(1-disc) and retailprice·qty
    amount = money.disc_price_units() - money.cents("p_retailprice") * money.cents("l_quantity")
    return (
        t["lineitem"]
        .join(maybe_broadcast(t["part"].where(F.col("p_name").like("%red%")), sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(t["supplier"], sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(money.units_to_decimal(F.sum(amount), 4, "decimal(25,4)").alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    cast_double=["value"],
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey, value FROM pv
    WHERE CAST(value AS DOUBLE) > (SELECT CAST(sum(value) AS DOUBLE) * 0.001 FROM pv)
    ORDER BY value DESC, l_partkey
    """,
)
def tpch_q11(spark, sf_dir):
    """TPC-H Q11 (queries/q11.sql, GERMANY→NATION_7): per-part value with a
    HAVING against a global-total scalar subquery. partsupp absent → value is
    summed discounted lineitem revenue. The global total is a 1-row broadcast
    cross join (DuckDB plans the same via a delim join)."""
    t = {n: load_table(spark, sf_dir, n) for n in ["lineitem", "supplier", "nation"]}
    base = (
        t["lineitem"]
        .join(maybe_broadcast(t["supplier"], sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].where(F.col("n_name") == "NATION_7")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    pv = base.groupBy("l_partkey").agg(money.sum_disc_price().alias("value"))
    total = pv.agg((F.sum("value").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value").cast("double") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 (queries/q13.sql, comment LIKE filter → o_orderpriority
    filter): left outer join with join-side predicate, double aggregation —
    customers with zero orders must survive as c_count = 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15_top_supplier",
    cast_double=["total_revenue"],
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(22,4)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 (queries/q15.sql): the revenue view + max-revenue scalar
    subquery. Exact-decimal revenue makes the equality comparison safe; the
    max is a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money.sum_disc_price().alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_parts_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16 (queries/q16.sql): supplier count per part attribute. partsupp
    → distinct lineitem pairs; the complaints-comment NOT IN becomes a
    negative-acctbal NOT IN — an anti join on a broadcast-small exclusion."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
    )
    excl = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(excl, ps.l_suppkey == excl.s_suppkey, "left_anti")
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 (queries/q17.sql, container filter dropped): correlated
    per-part average decorrelated into a grouped broadcast join (DuckDB's
    flatten_dependent_join does the same). Quantities are whole-number doubles
    ≤ 50 so the 0.2·avg threshold is bit-deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    th = li.groupBy(F.col("l_partkey").alias("tk")).agg((F.lit(0.2) * F.avg("l_quantity")).alias("th"))
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(th, F.col("l_partkey") == F.col("tk"))
        .where(F.col("l_quantity") < F.col("th"))
        .agg(
            F.round(money.sum_money("l_extendedprice", out="decimal(22,2)").cast("double") / F.lit(7.0), 2).alias("avg_yearly")
        )
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'blue%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 50
      )
    ORDER BY s_name
    """,
)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 (queries/q20.sql, CANADA→NATION_4, forest→blue): nested
    semi-join chain — suppliers who shipped > 50 units of some blue part in
    1996. The availqty>½·shipped predicate becomes the HAVING threshold
    (partsupp absent); the grouped inner result is broadcast-small."""
    t = {n: load_table(spark, sf_dir, n) for n in ["supplier", "nation", "lineitem", "part"]}
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    blue = t["part"].where(F.col("p_name").like("blue%"))
    qualified = (
        li.join(maybe_broadcast(blue, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"].where(F.col("n_name") == "NATION_4")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_9'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 (queries/q21.sql): suppliers who alone shipped late on
    multi-supplier finished orders. receiptdate>commitdate (columns absent) →
    'late' = shipped >30 days after order date. EXISTS → left-semi with a
    non-equi conjunct, NOT EXISTS → left-anti (DuckDB plans SEMI/ANTI hash
    joins, reference plan_comparison_join.cpp:66)."""
    t = {n: load_table(spark, sf_dir, n) for n in ["supplier", "lineitem", "orders", "nation"]}
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    o = t["orders"].where(F.col("o_orderstatus") == "F")
    l1 = (
        t["lineitem"].join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(late)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = t["lineitem"].select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        t["lineitem"].join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(late)
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    waiting = (
        l1.join(l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")), "left_anti")
    )
    return (
        waiting.join(
            maybe_broadcast(
                t["supplier"].join(
                    F.broadcast(t["nation"].where(F.col("n_name") == "NATION_9")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ),
                sf_dir,
                "supplier",
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    cast_double=["totacctbal"],
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        WHERE c_nationkey IN (1, 2, 3, 4, 5, 6)
    )
    SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS totacctbal
    FROM pool p
    WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
            FROM pool WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = p.c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 (queries/q22.sql, phone cntrycode → c_nationkey): customers
    above the positive-balance average with no urgent orders (driver data has
    no order-less customers). The average is computed as exact-decimal sum /
    count so the threshold is bit-identical on both engines; NOT EXISTS →
    left-anti join."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6))
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        money.avg_money("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money.sum_money("c_acctbal", out="decimal(22,2)").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
