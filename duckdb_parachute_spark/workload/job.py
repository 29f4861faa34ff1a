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


@query(
    "job_clique_cross_predicates",
    oracle="""
    SELECT min(p_name) AS first_part, min(s_name) AS first_supplier,
           min(c_name) AS first_customer, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE p_size BETWEEN 10 AND 20
      AND s_acctbal > 3000
      AND c_acctbal > 3000
      AND c_nationkey = s_nationkey
    """,
)
def job_clique_cross_predicates(spark, sf_dir):
    """JOB clique shape (e.g. reference 11*.benchmark: dims constrained
    against EACH OTHER, not only the fact): part+supplier+customer filters
    plus a customer-supplier nation equality that only binds after both
    sides join — the join-order trap where a greedy planner picks the
    cross-dim predicate too late. Dims are size-gated broadcasts; the
    nation equality lands as a post-join filter on the single fact pass."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size").between(10, 20))
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 3000)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 3000)
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .agg(
            F.min("p_name").alias("first_part"),
            F.min("s_name").alias("first_supplier"),
            F.min("c_name").alias("first_customer"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_chain_selective_middle",
    oracle="""
    SELECT min(o_orderdate) AS first_date, min(c_name) AS first_customer,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderstatus = 'F'
      AND r_name = 'ASIA'
      AND l_quantity > 45
    """,
)
def job_chain_selective_middle(spark, sf_dir):
    """JOB chain shape (reference 3*/8* chains: fact->mid->dim where the
    MIDDLE table carries the selective predicate): orders filters to the
    urgent-finished slice, so the right plan probes lineitem through the
    small filtered middle instead of joining the chain outward-in."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .agg(
            F.min("o_orderdate").alias("first_date"),
            F.min("c_name").alias("first_customer"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_disjunctive_dims",
    oracle="""
    SELECT min(p_name) AS first_part, min(n_name) AS first_nation,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE (p_type = 'PROMO' OR p_size < 5)
      AND (n_name IN ('FRANCE', 'GERMANY') OR s_acctbal < 500)
    """,
)
def job_disjunctive_dims(spark, sf_dir):
    """JOB disjunctive shape (reference 14*/19*-style OR'd dim predicates):
    disjunctions straddle two dimensions, so neither filter alone prunes the
    fact — the planner must keep both dims early and evaluate the OR after
    each join. The p-side OR is pushable into the part scan; the
    nation-or-acctbal OR can only run post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "PROMO") | (F.col("p_size") < 5)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .where(F.col("n_name").isin("FRANCE", "GERMANY") | (F.col("s_acctbal") < 500))
        .agg(
            F.min("p_name").alias("first_part"),
            F.min("n_name").alias("first_nation"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_two_fact_bridge",
    oracle="""
    SELECT n_name, CAST(count(DISTINCT o_custkey) AS BIGINT) AS customers,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
    JOIN orders   ON l1.l_orderkey = o_orderkey
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE l1.l_returnflag = 'R' AND l2.l_returnflag = 'N'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def job_two_fact_bridge(spark, sf_dir):
    """JOB self-join shape (reference 32*/33* link two movie_link sides):
    the fact table joins ITSELF on the bridge key with a role inequality
    (returned line paired with a kept line of the same order) — both fact
    scans co-shuffle on l_orderkey, one exchange each, never broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    l2 = li.where(F.col("l_returnflag") == "N").select(
        F.col("l_orderkey").alias("k2"), F.col("l_linenumber").alias("ln2")
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        l1.join(l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_linenumber") < F.col("ln2")))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count_distinct("o_custkey").alias("customers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_name")
    )


@query(
    "job_snowflake_depth",
    oracle="""
    SELECT r_name, CAST(count(*) AS BIGINT) AS n,
           min(s_name) AS first_supplier, min(p_name) AS first_part
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_name LIKE '%blue%' AND l_discount >= 0.05
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def job_snowflake_depth(spark, sf_dir):
    """JOB snowflake shape (reference 4*-style depth-3 dimension chains):
    fact -> supplier -> nation -> region, with the selective LIKE on the
    OTHER branch (part) — the chain must stay broadcast end-to-end while
    the part filter does the pruning."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_discount") >= 0.05)
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%blue%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("s_name").alias("first_supplier"),
            F.min("p_name").alias("first_part"),
        )
        .orderBy("r_name")
    )


@query(
    "job_cycle_closure",
    oracle="""
    SELECT min(s_name) AS first_supplier, min(c_name) AS first_customer,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE s_nationkey = c_nationkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def job_cycle_closure(spark, sf_dir):
    """JOB cycle shape (reference 5*/17*-style cyclic join graphs: the join
    graph closes a loop — here fact->supplier and fact->orders->customer
    both reach nationkey, and the cycle-closing predicate
    s_nationkey = c_nationkey is NOT an edge the optimizer can use as a
    driving join; it must be applied as a residual filter after the chain.
    JOB exists to punish planners that pick the cycle edge first."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
        .agg(
            F.min("s_name").alias("first_supplier"),
            F.min("c_name").alias("first_customer"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_dim_only_chain",
    oracle="""
    SELECT min(s_name) AS first_supplier, min(n_name) AS first_nation,
           CAST(count(*) AS BIGINT) AS n
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('EUROPE', 'ASIA') AND s_acctbal > 0
    """,
)
def job_dim_only_chain(spark, sf_dir):
    """JOB dim-only chain (reference 6*-style queries touching only
    dimension tables — keyword->movie_keyword->title without the big cast
    fact): supplier->nation->region with no fact table at all. The entire
    plan should be broadcast joins with zero exchanges of anything
    fact-sized."""
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0)
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name").isin("EUROPE", "ASIA"))
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .agg(
            F.min("s_name").alias("first_supplier"),
            F.min("n_name").alias("first_nation"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_multi_like_disjunction",
    oracle="""
    SELECT min(p_name) AS first_part, min(p_brand) AS first_brand,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_name LIKE 'red%' OR p_name LIKE 'blue%' OR p_name LIKE '%gear%'
           OR p_name LIKE '%anvil%')
      AND l_quantity >= 25
    """,
)
def job_multi_like_disjunction(spark, sf_dir):
    """JOB multi-LIKE shape (reference 14*/19*-style info_type/keyword
    batteries: a dim filtered by a union of LIKE patterns): four OR'd LIKEs
    on the part dim. The disjunction still prunes the dim BEFORE the fact
    join — the filtered part side stays broadcastable and lineitem never
    shuffles."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 25)
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
        | F.col("p_name").like("blue%")
        | F.col("p_name").like("%gear%")
        | F.col("p_name").like("%anvil%")
    )
    return li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.min("p_name").alias("first_part"),
        F.min("p_brand").alias("first_brand"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "job_star_wide_five",
    oracle="""
    SELECT min(p_name) AS first_part, min(s_name) AS first_supplier,
           min(c_name) AS first_customer, min(n_name) AS first_nation,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE p_size BETWEEN 10 AND 20
      AND n_name IN ('NATION_2', 'NATION_12', 'NATION_22')
      AND o_orderstatus = 'F'
    """,
)
def job_star_wide_five(spark, sf_dir):
    """JOB wide-star shape (reference 13*/23*-style 6+-table stars): five
    joined tables with selectivity split across three of them. The planner
    must order part/nation/status filters ahead of the two fact-sized
    joins; lineitem and orders co-shuffle on orderkey once."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size").between(10, 20))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_2", "NATION_12", "NATION_22")
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .agg(
            F.min("p_name").alias("first_part"),
            F.min("s_name").alias("first_supplier"),
            F.min("c_name").alias("first_customer"),
            F.min("n_name").alias("first_nation"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_repeated_dim_roles",
    oracle="""
    SELECT min(n1.n_name) AS supp_nation, min(n2.n_name) AS cust_nation,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name = 'NATION_4' AND n2.n_regionkey <> n1.n_regionkey
    """,
)
def job_repeated_dim_roles(spark, sf_dir):
    """JOB repeated-dim shape (reference queries joining name AS n1 and
    name AS n2 under different roles): the SAME dimension appears twice —
    supplier's nation pinned to one value, customer's nation constrained
    relative to it (different region). Each role gets its own broadcast;
    the cross-role predicate is residual."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    n1 = nt.where(F.col("n_name") == "NATION_4").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation_name"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nt.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation_name"),
        F.col("n_regionkey").alias("n2_region"),
    )
    return (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("n2_region") != F.col("n1_region"))
        .agg(
            F.min("supp_nation_name").alias("supp_nation"),
            F.min("cust_nation_name").alias("cust_nation"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_two_fact_selective_ends",
    oracle="""
    SELECT min(o_orderdate) AS first_date, min(p_brand) AS first_brand,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN customer ON o_custkey = c_custkey
    WHERE p_brand = 'Brand#7'
      AND c_mktsegment = 'MACHINERY'
      AND o_orderpriority = '1-URGENT'
    """,
)
def job_two_fact_selective_ends(spark, sf_dir):
    """JOB bridged-facts shape (reference 22*-style: cast_info and
    movie_info both constrained through their own dims): two fact-sized
    tables (orders, lineitem) joined in the middle while BOTH ends carry
    the selective predicates (brand point filter on the part end, segment +
    priority on the customer end). The planner must push both ends down
    before the central fact-fact join."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#7")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            maybe_broadcast(c, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .agg(
            F.min("o_orderdate").alias("first_date"),
            F.min("p_brand").alias("first_brand"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "job_like_chain_topmin",
    oracle="""
    SELECT min(p_name) AS first_part, min(o_orderdate) AS first_date,
           CAST(count(*) AS BIGINT) AS n
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
      AND p_type = 'PROMO'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def job_like_chain_topmin(spark, sf_dir):
    """JOB LIKE-driven chain (reference 8*-style: a LIKE-filtered dim at
    the head of a chain, MIN outputs): the doubly-filtered part dim (LIKE +
    type equality) drives lineitem then orders. The dim filter lands in the
    scan; the chain keeps ONE fact shuffle (lineitem-orders on orderkey)."""
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%") & (F.col("p_type") == "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.min("p_name").alias("first_part"),
            F.min("o_orderdate").alias("first_date"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 breadth: 14 template instantiations over the archetypes above.
# JOB's value is breadth — 113 near-identical star/chain queries whose only
# differences are WHICH dimension is selective, the LIKE patterns, and the
# chain depth (reference benchmark/imdb/*.sql, families 1a-33c). One spec-
# driven builder generates the Spark plan and the oracle SQL from the SAME
# spec, so the two sides cannot drift; every instantiation is an ungrouped
# MIN battery (the JOB output convention) — dims broadcast, no cartesian,
# and the fact contributes only a partial-aggregate pass (zero fact
# shuffles).
# ---------------------------------------------------------------------------


def _job_instance(name, *, part_like=None, part_size=None, part_type=None,
                  s_nations=None, c_nations=None, region=None, seg=None,
                  prio=None, flag=None, date_lo=None, date_hi=None,
                  qty_hi=None, part_brand=None, part_price=None,
                  s_bal_min=None, c_bal_min=None, status=None,
                  total_hi=None, lstat=None, disc=None,
                  ship_lo=None, ship_hi=None, c_region=None,
                  cross_or=None):
    """Register one JOB-style instantiation built from a filter spec.

    ``cross_or``: list of OR-groups, each a list of (column, op, value)
    primitives that may straddle DIFFERENT dimensions (JOB's 14*/19*-style
    disjunctions) — a group like [(p_type,=,PROMO), (s_acctbal,<,500)]
    cannot prune either dim alone, so it is applied POST-join on both the
    Spark and oracle sides; single-dim groups still benefit from Catalyst
    pushing the OR into that dim's scan."""

    def _prim_sql(c, op, v):
        vv = "'" + v.replace("'", "''") + "'" if isinstance(v, str) else str(v)
        return f"{c} {op} {vv}"

    def _prim_col(c, op, v):
        col = F.col(c)
        if op == "LIKE":
            if not isinstance(v, str):
                raise ValueError(f"LIKE needs a string pattern, got {v!r} for {c}")
            return col.like(v)
        try:
            return {
                "=": col == v,
                "<": col < v,
                ">": col > v,
                "<=": col <= v,
                ">=": col >= v,
            }[op]
        except KeyError:
            raise ValueError(f"unsupported primitive op {op!r} for {c}") from None

    conds = []
    for group in cross_or or []:
        conds.append("(" + " OR ".join(_prim_sql(*p) for p in group) + ")")
    if part_like:
        conds.append(f"p_name LIKE '{part_like}'")
    if part_size:
        conds.append(f"p_size BETWEEN {part_size[0]} AND {part_size[1]}")
    if part_type:
        conds.append(f"p_type = '{part_type}'")
    if part_brand:
        conds.append(f"p_brand = '{part_brand}'")
    if part_price:
        conds.append(f"p_retailprice BETWEEN {part_price[0]} AND {part_price[1]}")
    if s_nations:
        conds.append(f"s_nationkey IN ({', '.join(map(str, s_nations))})")
    if s_bal_min is not None:
        conds.append(f"s_acctbal >= {s_bal_min}")
    if c_nations:
        conds.append(f"c_nationkey IN ({', '.join(map(str, c_nations))})")
    if c_bal_min is not None:
        conds.append(f"c_acctbal >= {c_bal_min}")
    if region is not None:
        conds.append(f"sn.n_regionkey = {region}")
    if c_region is not None:
        conds.append(f"cn.n_regionkey = {c_region}")
    if seg:
        conds.append(f"c_mktsegment = '{seg}'")
    if prio:
        conds.append(f"o_orderpriority = '{prio}'")
    if status:
        conds.append(f"o_orderstatus = '{status}'")
    if total_hi is not None:
        conds.append(f"o_totalprice <= {total_hi}")
    if flag:
        conds.append(f"l_returnflag = '{flag}'")
    if lstat:
        conds.append(f"l_linestatus = '{lstat}'")
    if disc:
        conds.append(f"l_discount BETWEEN {disc[0]} AND {disc[1]}")
    if date_lo:
        conds.append(f"o_orderdate >= TIMESTAMP '{date_lo}'")
    if date_hi:
        conds.append(f"o_orderdate < TIMESTAMP '{date_hi}'")
    if ship_lo:
        conds.append(f"l_shipdate >= TIMESTAMP '{ship_lo}'")
    if ship_hi:
        conds.append(f"l_shipdate < TIMESTAMP '{ship_hi}'")
    if qty_hi is not None:
        conds.append(f"l_quantity <= {qty_hi}")
    or_cols = [p[0] for g in (cross_or or []) for p in g]
    need_cust = bool(
        c_nations
        or seg
        or c_bal_min is not None
        or c_region is not None
        or any(c.startswith("c_") for c in or_cols)
    )
    need_nation = region is not None
    joins = [
        "JOIN part ON l_partkey = p_partkey",
        "JOIN supplier ON l_suppkey = s_suppkey",
        "JOIN orders ON l_orderkey = o_orderkey",
    ]
    if need_cust:
        joins.append("JOIN customer ON o_custkey = c_custkey")
    if need_nation:
        joins.append("JOIN nation sn ON s_nationkey = sn.n_nationkey")
    if c_region is not None:
        joins.append("JOIN nation cn ON c_nationkey = cn.n_nationkey")
    oracle = f"""
    SELECT min(p_name) AS first_part, min(s_name) AS first_supplier,
           min(o_orderdate) AS first_date, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    {chr(10).join(joins)}
    WHERE {' AND '.join(conds)}
    """

    @query(name, oracle=oracle)
    def fn(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        if flag:
            li = li.where(F.col("l_returnflag") == flag)
        if lstat:
            li = li.where(F.col("l_linestatus") == lstat)
        if disc:
            li = li.where(F.col("l_discount").between(*disc))
        if ship_lo:
            li = li.where(F.col("l_shipdate") >= F.lit(ship_lo).cast("timestamp_ntz"))
        if ship_hi:
            li = li.where(F.col("l_shipdate") < F.lit(ship_hi).cast("timestamp_ntz"))
        if qty_hi is not None:
            li = li.where(F.col("l_quantity") <= qty_hi)
        p = load_table(spark, sf_dir, "part")
        if part_like:
            p = p.where(F.col("p_name").like(part_like))
        if part_size:
            p = p.where(F.col("p_size").between(*part_size))
        if part_type:
            p = p.where(F.col("p_type") == part_type)
        if part_brand:
            p = p.where(F.col("p_brand") == part_brand)
        if part_price:
            p = p.where(F.col("p_retailprice").between(*part_price))
        s = load_table(spark, sf_dir, "supplier")
        if s_nations:
            s = s.where(F.col("s_nationkey").isin(*s_nations))
        if s_bal_min is not None:
            s = s.where(F.col("s_acctbal") >= s_bal_min)
        o = load_table(spark, sf_dir, "orders")
        if prio:
            o = o.where(F.col("o_orderpriority") == prio)
        if status:
            o = o.where(F.col("o_orderstatus") == status)
        if total_hi is not None:
            o = o.where(F.col("o_totalprice") <= total_hi)
        if date_lo:
            o = o.where(F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp_ntz"))
        if date_hi:
            o = o.where(F.col("o_orderdate") < F.lit(date_hi).cast("timestamp_ntz"))
        out = (
            li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
            .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        )
        if need_cust:
            c = load_table(spark, sf_dir, "customer")
            if c_nations:
                c = c.where(F.col("c_nationkey").isin(*c_nations))
            if seg:
                c = c.where(F.col("c_mktsegment") == seg)
            if c_bal_min is not None:
                c = c.where(F.col("c_acctbal") >= c_bal_min)
            out = out.join(
                maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey")
            )
        if need_nation:
            n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == region)
            out = out.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        if c_region is not None:
            # second nation ROLE (JOB's repeated-dim-role shape): key-only
            # projection avoids column collision with the supplier-side copy
            cn = (
                load_table(spark, sf_dir, "nation")
                .where(F.col("n_regionkey") == c_region)
                .select(F.col("n_nationkey").alias("__cn_key"))
            )
            out = out.join(F.broadcast(cn), F.col("c_nationkey") == F.col("__cn_key"))
        for group in cross_or or []:
            disj = _prim_col(*group[0])
            for p in group[1:]:
                disj = disj | _prim_col(*p)
            out = out.where(disj)
        return out.agg(
            F.min("p_name").alias("first_part"),
            F.min("s_name").alias("first_supplier"),
            F.min("o_orderdate").alias("first_date"),
            F.count(F.lit(1)).alias("n"),
        )

    fn.__doc__ = (
        "JOB template instantiation (reference benchmark/imdb/ families "
        "1a-33c — same star, different selective end): filters "
        f"{'; '.join(conds)}. Selective dims broadcast ahead of the fact; "
        "ungrouped MIN battery, zero fact shuffles."
    )
    return fn


# Vary (a) WHICH end is selective, (b) LIKE pattern shape, (c) chain depth.
_job_instance("job_i01_like_prefix_urgent", part_like="small%", prio="1-URGENT")
_job_instance("job_i02_like_suffix_flagged", part_like="%bolt", flag="R")
_job_instance("job_i03_like_infix_window", part_like="%wid%",
              date_lo="1997-01-01 00:00:00", date_hi="1997-07-01 00:00:00")
_job_instance("job_i04_sizeband_nationset", part_size=(5, 15), s_nations=(0, 1, 2))
_job_instance("job_i05_type_region_chain", part_type="PROMO", region=3)
_job_instance("job_i06_cust_segment_star", seg="BUILDING", part_size=(1, 25))
_job_instance("job_i07_double_like", part_like="%large%", seg="MACHINERY")
_job_instance("job_i08_selective_orders_end", prio="5-LOW",
              date_lo="1996-01-01 00:00:00", date_hi="1996-04-01 00:00:00")
_job_instance("job_i09_deep_chain_six", part_like="%bolt%", s_nations=(3, 8, 13),
              seg="FURNITURE", prio="2-HIGH")
_job_instance("job_i10_quantity_cap_star", qty_hi=5, part_type="ECONOMY")
_job_instance("job_i11_cnation_region_mix", c_nations=(4, 9, 14), region=0)
_job_instance("job_i12_flag_window_type", flag="A", part_type="LARGE",
              date_lo="1998-01-01 00:00:00", date_hi="1999-01-01 00:00:00")
_job_instance("job_i13_allends_mild", part_size=(10, 40), prio="3-MEDIUM",
              s_nations=(5, 6, 7, 8, 9))
_job_instance("job_i14_narrow_everything", part_like="cold%", flag="N",
              seg="HOUSEHOLD", qty_hi=25)

# Round-8 breadth (+18 → 46 instantiations): new selective ends (brand,
# retail-price band, account-balance floors, order status/total, linestatus,
# discount band, ship-date windows) and the repeated-nation-role chain
# (customer-side region via a second nation join — JOB's repeated-dim-role
# pressure, reference benchmark/imdb families 7/15/22 style).
_job_instance("job_i15_brand_window", part_brand="Brand#13",
              date_lo="1996-01-01 00:00:00", date_hi="1997-01-01 00:00:00")
_job_instance("job_i16_priceband_lowdisc", part_price=(905.0, 912.0), disc=(0.0, 0.02))
_job_instance("job_i17_supp_balance_floor", s_bal_min=5000, part_type="STANDARD")
_job_instance("job_i18_cust_balance_floor", c_bal_min=7500, flag="R")
_job_instance("job_i19_status_open_small", status="O", part_size=(1, 10))
_job_instance("job_i20_cheap_orders_cap", total_hi=50000, prio="4-NOT SPECIFIED")
_job_instance("job_i21_linestatus_ship_window", lstat="F",
              ship_lo="1995-01-01 00:00:00", ship_hi="1995-07-01 00:00:00")
_job_instance("job_i22_cust_region_role", c_region=2, part_like="%rod%")
_job_instance("job_i23_two_region_roles", region=1, c_region=4)
_job_instance("job_i24_discband_brand", disc=(0.05, 0.08), part_brand="Brand#22")
_job_instance("job_i25_deep_all_roles", region=0, c_region=0, seg="AUTOMOBILE",
              prio="1-URGENT")
_job_instance("job_i26_ship_vs_order_windows",
              ship_lo="1997-03-01 00:00:00", ship_hi="1997-09-01 00:00:00",
              date_lo="1997-01-01 00:00:00", date_hi="1997-06-01 00:00:00")
_job_instance("job_i27_balance_both_sides", s_bal_min=2500, c_bal_min=2500)
_job_instance("job_i28_brand_status_qty", part_brand="Brand#11", status="F",
              qty_hi=10)
_job_instance("job_i29_priceband_nationset", part_price=(915.0, 919.0),
              s_nations=(10, 11, 12, 13))
_job_instance("job_i30_like_infix_balance", part_like="%anvil%", s_bal_min=3000)
_job_instance("job_i31_lowtotal_region_chain", total_hi=120000, region=4)
_job_instance("job_i32_everything_mild", part_size=(5, 45), disc=(0.01, 0.09),
              status="O", seg="MACHINERY", c_region=3)

# Round-8 second tranche (+20 → 66 instantiations): cross-products of the
# spec dimensions the first tranches didn't pair — LIKE × balance, window ×
# region role, brand × discount × priority, dual windows × status — plus
# lower/upper extremes of each band to vary selectivity order-of-magnitude.
_job_instance("job_i33_like_rod_urgent_window", part_like="%rod%", prio="1-URGENT",
              date_lo="1995-01-01 00:00:00", date_hi="1996-01-01 00:00:00")
_job_instance("job_i34_widget_cheap_parts", part_like="%widget%", part_price=(900.0, 905.0))
_job_instance("job_i35_gizmo_flagged_lowqty", part_like="%gizmo%", flag="A", qty_hi=15)
_job_instance("job_i36_anvil_region_two", part_like="%anvil%", region=2)
_job_instance("job_i37_plate_cust_region", part_like="%plate%", c_region=1)
_job_instance("job_i38_brand20_bal_floor", part_brand="Brand#20", s_bal_min=4000)
_job_instance("job_i39_brand7_seg_building", part_brand="Brand#7", seg="BUILDING")
_job_instance("job_i40_brand18_disc_free", part_brand="Brand#18", disc=(0.0, 0.0))
_job_instance("job_i41_status_p_rare", status="P", part_size=(1, 50))
_job_instance("job_i42_hightotal_floor_cap", total_hi=300000, c_bal_min=5000)
_job_instance("job_i43_ship97_h2_status_f", lstat="F",
              ship_lo="1997-07-01 00:00:00", ship_hi="1998-01-01 00:00:00", status="F")
_job_instance("job_i44_deep_both_regions_seg", region=3, c_region=3, seg="HOUSEHOLD")
_job_instance("job_i45_ring_nationset_narrow", part_like="%ring%", s_nations=(17, 18, 19))
_job_instance("job_i46_cnations_disc_band", c_nations=(20, 21, 22, 23, 24), disc=(0.03, 0.06))
_job_instance("job_i47_bolt_prio_low_window", part_like="%bolt%", prio="5-LOW",
              date_lo="1998-01-01 00:00:00")
_job_instance("job_i48_rod_bal_both_mild", part_like="%rod%", s_bal_min=1000, c_bal_min=1000)
_job_instance("job_i49_type_economy_ship_window", part_type="ECONOMY",
              ship_lo="1996-01-01 00:00:00", ship_hi="1996-04-01 00:00:00")
_job_instance("job_i50_brand9_two_windows", part_brand="Brand#9",
              date_lo="1996-06-01 00:00:00", date_hi="1997-06-01 00:00:00",
              ship_lo="1996-06-01 00:00:00", ship_hi="1997-09-01 00:00:00")
_job_instance("job_i51_everything_narrow", part_like="%widget%", flag="R",
              prio="2-HIGH", s_nations=(0, 5, 10, 15, 20), qty_hi=30)
_job_instance("job_i52_sixway_regions_bal", region=4, c_region=2,
              s_bal_min=2000, c_bal_min=0, status="F")

# Round-8 third tranche: cross-dim OR disjunctions (+10 → 76 instantiations)
# — JOB families 14*/19*/25* pressure: an OR straddling two dimensions can't
# prune either side alone, forcing post-join evaluation; single-dim ORs
# should still push into that dim's scan.
_job_instance("job_i53_or_type_size", cross_or=[[("p_type", "=", "PROMO"), ("p_size", "<", 5)]])
_job_instance("job_i54_or_part_supp", cross_or=[[("p_type", "=", "LARGE"), ("s_acctbal", "<", 1000)]])
_job_instance("job_i55_or_brand_prio", cross_or=[[("p_brand", "=", "Brand#13"), ("o_orderpriority", "=", "1-URGENT")]])
_job_instance("job_i56_or_two_groups",
              cross_or=[[("p_size", ">", 45), ("s_acctbal", ">", 5500)],
                        [("o_orderstatus", "=", "P"), ("l_returnflag", "=", "R")]])
_job_instance("job_i57_or_cust_part", seg="BUILDING",
              cross_or=[[("c_acctbal", "<", 0), ("p_retailprice", ">", 918.0)]])
_job_instance("job_i58_or_like_pair",
              cross_or=[[("p_name", "LIKE", "%anvil%"), ("p_name", "LIKE", "%gizmo%")]])
_job_instance("job_i59_or_three_way",
              cross_or=[[("p_size", "<", 3), ("s_acctbal", "<", 700), ("o_totalprice", "<", 5000)]])
_job_instance("job_i60_or_with_window", date_lo="1996-01-01 00:00:00", date_hi="1997-01-01 00:00:00",
              cross_or=[[("p_type", "=", "ECONOMY"), ("l_quantity", "<=", 3)]])
_job_instance("job_i61_or_flag_status",
              cross_or=[[("l_returnflag", "=", "A"), ("o_orderstatus", "=", "F")]],
              part_like="%widget%")
_job_instance("job_i62_or_everything",
              s_nations=(0, 1, 2, 3, 4, 5, 6, 7),
              cross_or=[[("p_brand", "=", "Brand#9"), ("c_mktsegment", "=", "FURNITURE")],
                        [("l_discount", ">=", 0.08), ("o_totalprice", "<", 20000)]])

# Round-8 fourth tranche (+14 → 90 instantiations): remaining un-paired spec
# combinations — OR groups × selective AND ends, windows × regions, brand ×
# balance, and deeper 6/7-way chains mixing every dimension class.
_job_instance("job_i63_or_inside_window", date_lo="1997-01-01 00:00:00",
              date_hi="1998-01-01 00:00:00",
              cross_or=[[("p_size", "<", 10), ("p_size", ">", 40)]])
_job_instance("job_i64_or_with_region", region=1,
              cross_or=[[("p_type", "=", "PROMO"), ("o_totalprice", ">", 400000)]])
_job_instance("job_i65_or_with_cregion", c_region=0,
              cross_or=[[("l_quantity", "<=", 2), ("l_discount", ">=", 0.09)]])
_job_instance("job_i66_brand_balance_window", part_brand="Brand#21", s_bal_min=1500,
              date_lo="1995-06-01 00:00:00", date_hi="1996-06-01 00:00:00")
_job_instance("job_i67_widget_status_region", part_like="%widget%", status="F", region=2)
_job_instance("job_i68_sevenway_kitchen_sink", part_size=(2, 48), s_nations=tuple(range(0, 25, 2)),
              seg="FURNITURE", prio="3-MEDIUM", region=4, qty_hi=45)
_job_instance("job_i69_gizmo_priceband", part_like="%gizmo%", part_price=(902.0, 917.0))
_job_instance("job_i70_ring_cheap_orders", part_like="%ring%", total_hi=80000)
_job_instance("job_i71_disc_zero_region", disc=(0.0, 0.0), region=0)
_job_instance("job_i72_flag_n_bal_floor", flag="N", s_bal_min=5500, c_bal_min=8000)
_job_instance("job_i73_bolt_ship_window_seg", part_like="%bolt%", seg="BUILDING",
              ship_lo="1999-01-01 00:00:00", ship_hi="2000-01-01 00:00:00")
_job_instance("job_i74_type_standard_cnations", part_type="STANDARD",
              c_nations=(1, 6, 11, 16, 21))
_job_instance("job_i75_or_three_groups",
              cross_or=[[("p_size", "<", 8), ("p_retailprice", ">", 916.0)],
                        [("s_acctbal", "<", 2000), ("o_orderpriority", "=", "5-LOW")],
                        [("l_returnflag", "=", "A"), ("l_linestatus", "=", "O")]])
_job_instance("job_i76_anvil_everything", part_like="%anvil%", status="O",
              c_region=4, disc=(0.02, 0.07), qty_hi=40)

# Round-8 fifth tranche (+23 → 113 shapes): full shape-COUNT parity with the
# reference suite (113 queries, benchmark/imdb/). Coverage here is breadth of
# selective-end placement: every spec dimension appears both as the lone
# selective end and paired against each other class at least once.
_job_instance("job_i77_lone_brand", part_brand="Brand#6")
_job_instance("job_i78_lone_widest_like", part_like="%e%")
_job_instance("job_i79_lone_priceband", part_price=(910.0, 911.0))
_job_instance("job_i80_lone_discband", disc=(0.04, 0.05))
_job_instance("job_i81_lone_status_f", status="F")
_job_instance("job_i82_lone_ship_quarter",
              ship_lo="1998-04-01 00:00:00", ship_hi="1998-07-01 00:00:00")
_job_instance("job_i83_lone_cregion", c_region=1)
_job_instance("job_i84_lone_qty_floor", qty_hi=1)
_job_instance("job_i85_brand_type_pair", part_brand="Brand#11", part_type="PROMO")
_job_instance("job_i86_window_qty_pair", qty_hi=8,
              date_lo="1997-06-01 00:00:00", date_hi="1997-09-01 00:00:00")
_job_instance("job_i87_seg_ship_pair", seg="AUTOMOBILE",
              ship_lo="2000-01-01 00:00:00", ship_hi="2001-01-01 00:00:00")
_job_instance("job_i88_prio_priceband_pair", prio="2-HIGH", part_price=(900.0, 908.0))
_job_instance("job_i89_nationset_discband", s_nations=(2, 7, 12, 17, 22), disc=(0.06, 0.1))
_job_instance("job_i90_region_qty_bal", region=3, qty_hi=20, s_bal_min=2000)
_job_instance("job_i91_cnations_brand", c_nations=(0, 5, 10), part_brand="Brand#22")
_job_instance("job_i92_status_p_window", status="P",
              date_lo="2001-01-01 00:00:00")
_job_instance("job_i93_or_like_vs_window",
              cross_or=[[("p_name", "LIKE", "%plate%"), ("o_orderdate", ">=", "1998-01-01 00:00:00")]])
_job_instance("job_i94_or_numeric_bands",
              cross_or=[[("p_retailprice", "<", 903.0), ("o_totalprice", "<", 10000)]])
_job_instance("job_i95_deep_or_and_mix", region=2, seg="HOUSEHOLD",
              cross_or=[[("l_discount", "<=", 0.01), ("l_quantity", ">=", 45)]])
_job_instance("job_i96_triple_like_chain", part_like="%o%", flag="R", lstat="F")
_job_instance("job_i97_everything_or_caps", total_hi=200000, qty_hi=35,
              cross_or=[[("p_size", ">=", 48), ("s_acctbal", ">=", 5800)]])
_job_instance("job_i98_both_bal_cregion", s_bal_min=4000, c_bal_min=4000, c_region=0)
_job_instance("job_i99_final_kitchen_sink", part_like="%d%", part_size=(1, 49),
              prio="4-NOT SPECIFIED", disc=(0.0, 0.09), c_region=2, status="O")
