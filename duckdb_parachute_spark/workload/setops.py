"""Set operations, subquery shapes, and recursive CTE (SURVEY §2.7/§2.8,
reference src/execution/physical_plan/plan_set_operation.cpp,
physical_union.cpp, physical_recursive_cte.cpp, subquery flattening
src/planner/subquery/flatten_dependent_join.cpp)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.workload import query


@query(
    "setop_union_intersect_except",
    oracle="""
    SELECT 'cust_only' AS tag, k FROM (
        SELECT DISTINCT c_nationkey AS k FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'both' AS tag, k FROM (
        SELECT DISTINCT c_nationkey AS k FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'all' AS tag, k FROM (
        SELECT c_nationkey AS k FROM customer
        UNION
        SELECT s_nationkey FROM supplier)
    """,
)
def setop_union_intersect_except(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT in one result (reference plans INTERSECT and
    EXCEPT as SEMI/ANTI hash joins, plan_set_operation.cpp:85)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    cust_only = c.exceptAll(s).withColumn("tag", F.lit("cust_only"))
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    all_ = c.union(s).distinct().withColumn("tag", F.lit("all"))
    return cust_only.unionByName(both).unionByName(all_).select("tag", "k")


@query(
    "setop_all_variants",
    oracle="""
    SELECT 'ia' AS tag, flag FROM (
        SELECT l_returnflag AS flag FROM lineitem WHERE l_linenumber <= 2
        INTERSECT ALL
        SELECT l_returnflag FROM lineitem WHERE l_quantity > 25)
    UNION ALL
    SELECT 'ea' AS tag, flag FROM (
        SELECT l_returnflag AS flag FROM lineitem WHERE l_linenumber <= 2
        EXCEPT ALL
        SELECT l_returnflag FROM lineitem WHERE l_quantity > 25)
    """,
)
def setop_all_variants(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL bag semantics (reference grouped-dedup path
    plan_set_operation.cpp:113; Spark intersectAll/exceptAll)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_linenumber") <= 2).select(F.col("l_returnflag").alias("flag"))
    b = li.where(F.col("l_quantity") > 25).select(F.col("l_returnflag").alias("flag"))
    ia = a.intersectAll(b).withColumn("tag", F.lit("ia"))
    ea = a.exceptAll(b).withColumn("tag", F.lit("ea"))
    return ia.unionByName(ea).select("tag", "flag")


@query(
    "setop_union_by_name",
    oracle="""
    SELECT k, src FROM (
        SELECT r_regionkey AS k, 'region' AS src FROM region
        UNION ALL
        SELECT n_nationkey AS k, 'nation' AS src FROM nation)
    """,
)
def setop_union_by_name(spark, sf_dir):
    """UNION (ALL) BY NAME (reference binder supports by-name setops,
    test/sql/setops/; Spark unionByName)."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.lit("region").alias("src")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.lit("nation").alias("src"), F.col("n_nationkey").alias("k")
    )
    return r.unionByName(n)  # column order differs on purpose


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subquery_correlated_scalar(spark, sf_dir):
    """Correlated scalar subquery (reference flatten_dependent_join.cpp
    decorrelates to a delim join; Catalyst's RewriteCorrelatedScalarSubquery
    does the equivalent — exercised through the SQL surface)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM sq_orders o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM sq_orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "subquery_mark_join",
    oracle="""
    SELECT c_custkey,
           c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000) AS is_big_spender
    FROM customer
    """,
)
def subquery_mark_join(spark, sf_dir):
    """MARK join (reference: IN-subquery as boolean column,
    join type MARK in physical_hash_join.cpp) → Spark rewrite per SURVEY §2.3:
    left join against the distinct subquery + null-to-false flag."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("__m", F.lit(True))
    )
    return (
        c.join(F.broadcast(o), c.c_custkey == o.k, "left")
        .select("c_custkey", F.coalesce("__m", F.lit(False)).alias("is_big_spender"))
    )


@query(
    "subquery_in_uncorrelated",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'F'
    """,
)
def subquery_in_uncorrelated(spark, sf_dir):
    """Uncorrelated IN subquery → semi join (reference in_clause_rewriter.cpp
    converts large IN lists to the same join)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "recursive_cte_series",
    oracle="""
    WITH RECURSIVE t(n, s) AS (
        SELECT 1, 1
        UNION ALL
        SELECT n + 1, s + n + 1 FROM t WHERE n < 50
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s FROM t
    """,
)
def recursive_cte_series(spark, sf_dir):
    """WITH RECURSIVE fixpoint loop (reference physical_recursive_cte.cpp) —
    running-sum series via the driver-loop operator."""
    from duckdb_parachute_spark.operators import recursive_cte

    base = spark.range(1, 2).select(
        F.col("id").cast("bigint").alias("n"), F.lit(1).cast("bigint").alias("s")
    )

    def step(prev):
        return (
            prev.where(F.col("n") < 50)
            .select((F.col("n") + 1).alias("n"), (F.col("s") + F.col("n") + 1).alias("s"))
        )

    # Round 16: this step is a pure 1-row projection — no broadcast or scan
    # in the delta — which is exactly the documented case where deeper
    # unrolls AND batch-granular delta checkpointing are safe
    # (operators/recursive.py). Measured sweep over (max_unroll ×
    # delta_checkpoint) at sf0.1, best-of-3 each: (2,every)=4.64s,
    # (4,batch)=3.57s, (8,batch)=3.93s, (16,every)=3.84s — deeper unrolls
    # lose to in-batch plan chaining (probe analysis grows O(k²)), so the
    # measured optimum is depth 4 with one checkpoint per batch.
    return recursive_cte(
        base,
        step,
        union_all=True,
        max_iterations=60,
        max_unroll=4,
        delta_checkpoint="batch",
    )


@query(
    "recursive_cte_graph_reach",
    oracle="""
    WITH RECURSIVE reach(node) AS (
        SELECT 0
        UNION
        SELECT n_nationkey FROM nation, reach
        WHERE n_regionkey = reach.node % 5 AND n_nationkey <> reach.node
    )
    SELECT CAST(node AS BIGINT) AS node FROM reach
    """,
)
def recursive_cte_graph_reach(spark, sf_dir):
    """Recursive transitive reachability with UNION (dedup) semantics over a
    nation→region derived edge set (FIXTURES.md §5 recursive_cte shape)."""
    from duckdb_parachute_spark.operators import recursive_cte

    n = load_table(spark, sf_dir, "nation")
    base = spark.range(0, 1).select(F.col("id").cast("int").alias("node"))

    def step(prev):
        return (
            n.join(F.broadcast(prev), (n.n_regionkey == F.pmod(prev.node, F.lit(5))) & (n.n_nationkey != prev.node))
            .select(F.col("n_nationkey").alias("node"))
        )

    return recursive_cte(base, step, union_all=False, max_iterations=30).select(
        F.col("node").cast("bigint").alias("node")
    )
