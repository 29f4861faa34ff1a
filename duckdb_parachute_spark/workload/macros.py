"""SQL macro workload queries (SURVEY §2.11 — CREATE MACRO parity).

Reference: src/function/scalar_macro_function.cpp,
src/function/table_macro_function.cpp. The oracles run DuckDB's *actual*
``CREATE OR REPLACE TEMP MACRO`` DDL before the probe SELECT (DuckDB executes
multi-statement batches and returns the last result), so the parity claim is
against the real reference feature, not a hand-expanded rewrite. The Spark
side registers the equivalent SQL UDFs — both engines expand the macro into
the plan at bind/analysis time, so the compared results come from the same
logical query.
"""

from __future__ import annotations

from duckdb_parachute_spark.catalog import Catalog
from duckdb_parachute_spark.functions import macros
from duckdb_parachute_spark.workload import query


@query(
    "macro_scalar_suite",
    cast_double=["revenue"],
    oracle="""
    CREATE OR REPLACE TEMP MACRO m_disc_price(p, d) AS
        CAST(CAST(p AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2))) AS DECIMAL(18,4));
    CREATE OR REPLACE TEMP MACRO m_price_band(x) AS
        CASE WHEN x < 1000 THEN 'low' WHEN x < 5000 THEN 'mid' ELSE 'high' END;
    SELECT l_returnflag,
           m_price_band(l_extendedprice) AS band,
           CAST(sum(m_disc_price(l_extendedprice, l_discount)) AS DECIMAL(22,4)) AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, m_price_band(l_extendedprice)
    ORDER BY l_returnflag, band
    """,
)
def macro_scalar_suite(spark, sf_dir):
    """Scalar macros: a decimal-exact expression macro and a CASE banding
    macro, both used inside grouping and aggregation. The macro body is the
    same SQL text on both engines; Spark's SQL UDF is inlined during analysis
    (scalar_macro_function.cpp does the identical bind-time expansion), so
    codegen and pushdown see the raw expressions."""
    macros.create_scalar_macro(
        spark,
        "m_disc_price",
        "p DOUBLE, d DOUBLE",
        "DECIMAL(18,4)",
        "CAST(CAST(p AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2))) AS DECIMAL(18,4))",
    )
    macros.create_scalar_macro(
        spark,
        "m_price_band",
        "x DOUBLE",
        "STRING",
        "CASE WHEN x < 1000 THEN 'low' WHEN x < 5000 THEN 'mid' ELSE 'high' END",
    )
    cat = Catalog(spark, sf_dir)
    cat.register_temp_views()
    return cat.sql(
        """
        SELECT l_returnflag,
               m_price_band(l_extendedprice) AS band,
               CAST(sum(m_disc_price(l_extendedprice, l_discount)) AS DECIMAL(22,4)) AS revenue,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag, m_price_band(l_extendedprice)
        ORDER BY l_returnflag, band
        """
    )


@query(
    "macro_table_suite",
    cast_double=["total"],
    oracle="""
    CREATE OR REPLACE TEMP MACRO m_orders_in(yr) AS TABLE
        SELECT o_custkey, o_orderpriority, o_totalprice
        FROM orders WHERE year(o_orderdate) = yr;
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
    FROM m_orders_in(1997)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def macro_table_suite(spark, sf_dir):
    """Table macro: a parameterized year-slice of orders invoked in FROM
    position, aggregated by priority (table_macro_function.cpp; Spark SQL
    table UDF with declared RETURNS TABLE schema). The year predicate inside
    the expanded body still reaches the parquet scan as a pushed filter —
    macro expansion keeps the plan transparent to the optimizer."""
    cat = Catalog(spark, sf_dir)
    cat.register_temp_views()
    macros.create_table_macro(
        spark,
        "m_orders_in",
        "yr INT",
        "o_custkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE",
        "SELECT o_custkey, o_orderpriority, o_totalprice FROM orders WHERE year(o_orderdate) = yr",
    )
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
        FROM m_orders_in(1997)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
