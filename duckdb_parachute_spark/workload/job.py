"""Join-order-benchmark (JOB/IMDB) query shapes (BASELINE.md suite row;
reference benchmark/imdb/, third_party/imdb — 113 queries whose whole point
is join-order pressure: many dimension tables, highly selective predicates
on some, MIN() outputs).

The IMDB tables aren't in the driver testdata, so the shapes rebind to the
TPC-H star: fact = lineitem, dims = part/supplier/orders/customer/nation/
region with mixed-selectivity filters. What the suite stresses — picking the
selective dimensions first and keeping the fact table late — is exactly what
Spark's CBO + AQE must get right; the docstrings note the intended shape and
tests/test_plans.py pins the broadcast posture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table, maybe_broadcast
from duckdb_parachute_spark.workload import query


@query(
    "job_star_selective_min",
    oracle="""
    SELECT min(p_name) AS first_part, min(s_name) AS first_supplier,
           min(o_orderdate) AS first_date, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%green%'
      AND n_name = 'FRANCE'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def job_star_selective_min(spark, sf_dir):
    """JOB shape (reference benchmark/imdb/ — e.g. 1a.sql's
    MIN(mc.note)/MIN(t.title) over a 5-way star with LIKE + equality dim
    filters): the selective dims (name LIKE, one nation) must prune before
    the fact join. Spark: filtered dims broadcast, lineitem never shuffles —
    the join order the JOB suite exists to test."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%green%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "FRANCE")
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.min("p_name").alias("first_part"),
            F.min("s_name").alias("first_supplier"),
            F.min("o_orderdate").alias("first_date"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_chain_two_regions",
    oracle="""
    SELECT r1.r_name AS cust_region, r2.r_name AS supp_region,
           CAST(count(*) AS BIGINT) AS n,
           min(p_name) AS first_part
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r1.r_name <> r2.r_name AND p_size > 40
    GROUP BY r1.r_name, r2.r_name
    ORDER BY cust_region, supp_region
    """,
)
def job_chain_two_regions(spark, sf_dir):
    """JOB shape (multi-role dimensions — IMDB queries join name/title
    several times under different roles): nation and region each join TWICE
    (customer side, supplier side) with a cross-side inequality. Nine-table
    plan; every dimension broadcasts, the fact scans once."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") > 40)
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_regionkey").alias("s_rk")
    )
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("r1_key"), F.col("r_name").alias("cust_region")
    )
    r2 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("r2_key"), F.col("r_name").alias("supp_region")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r1), F.col("c_rk") == F.col("r1_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(r2), F.col("s_rk") == F.col("r2_key"))
        .join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .where(F.col("cust_region") != F.col("supp_region"))
        .groupBy("cust_region", "supp_region")
        .agg(F.count(F.lit(1)).alias("n"), F.min("p_name").alias("first_part"))
        .orderBy("cust_region", "supp_region")
    )
