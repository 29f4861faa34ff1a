"""SQL-dialect queries (SURVEY M2): each entry's DuckDB-flavored SQL string is
BOTH the transpiler input (run on Spark via sqlx.transpile → spark.sql) and
the oracle (run verbatim by DuckDB) — the strongest possible check that the
rewrite layer preserves semantics, mirroring the reference's verifier pattern
(src/verification/prepared_statement_verifier.cpp re-runs transformed
statements and compares)."""

from __future__ import annotations

from duckdb_parachute_spark import sqlx
from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.workload import query


def _views(spark, sf_dir, *names):
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 2
"""


@query("dialect_qualify", oracle=_QUALIFY_SQL)
def dialect_qualify(spark, sf_dir):
    """QUALIFY clause (reference bind_select_node.cpp:525): Spark has no
    QUALIFY — sqlx wraps the query and filters on the window alias."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _QUALIFY_SQL)


_DISTINCT_ON_SQL = """
SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_name
FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey
"""


@query("dialect_distinct_on", oracle=_DISTINCT_ON_SQL)
def dialect_distinct_on(spark, sf_dir):
    """DISTINCT ON (reference plan_distinct.cpp:88 — first row per key by
    sort order): sqlx rewrites to row_number() = 1."""
    _views(spark, sf_dir, "customer")
    return sqlx.sql(spark, _DISTINCT_ON_SQL)


_ARROWS_SQL = """
SELECT event_id,
       props -> 'k' AS k_json,
       CAST(props ->> 'k' AS INT) AS k_val
FROM events
WHERE event_id < 100
"""


@query("dialect_json_arrows", oracle=_ARROWS_SQL)
def dialect_json_arrows(spark, sf_dir):
    """JSON -> / ->> operators (reference extension/json): sqlx maps both to
    get_json_object. On unquoted JSON scalars (the fixture's numeric k) the
    -> JSON form and ->> text form agree across engines; string-valued
    fields would need ->> (DuckDB's -> keeps the quotes)."""
    _views(spark, sf_dir, "events")
    return sqlx.sql(spark, _ARROWS_SQL)


@query(
    "dialect_intdiv_groupall",
    oracle="""
    SELECT l_orderkey // 100 AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY ALL
    """,
)
def dialect_intdiv_groupall(spark, sf_dir):
    """// integer division (sqlx → DIV) + GROUP BY ALL (native in both)."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(
        spark,
        """
        SELECT l_orderkey // 100 AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        GROUP BY ALL
        """,
    )


_FILTER_CLAUSE_SQL = """
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS big_qty,
       CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS big_disc
FROM lineitem
GROUP BY l_returnflag
"""


@query("dialect_filter_clause", oracle=_FILTER_CLAUSE_SQL)
def dialect_filter_clause(spark, sf_dir):
    """FILTER (WHERE ...) on aggregates — native in both dialects; included
    to pin the pass-through path of the dialect layer."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _FILTER_CLAUSE_SQL)
