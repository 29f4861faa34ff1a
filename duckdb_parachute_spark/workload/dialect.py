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


_EXCLUDE_BRACKETS_SQL = """
SELECT * EXCLUDE (n_name),
       [n_nationkey, n_regionkey][2] AS rk_again,
       [10, 20, 30, 40][2:3] AS mid,
       ([5, 6, 7][1:2])[1] AS five
FROM nation
"""


@query("dialect_exclude_brackets", join_arrays=["mid"], oracle=_EXCLUDE_BRACKETS_SQL)
def dialect_exclude_brackets(spark, sf_dir):
    """* EXCLUDE star modifier (reference star_expression.cpp exclude_list →
    Spark * EXCEPT), DuckDB [..] list literals (→ array), 1-based subscripts
    (→ element_at, since Spark's native x[i] is 0-based), and inclusive [a:b]
    slices (→ slice(x, a, b-a+1)) — all via sqlx.rewrite_exclude /
    rewrite_brackets."""
    _views(spark, sf_dir, "nation")
    return sqlx.sql(spark, _EXCLUDE_BRACKETS_SQL)


_GROUPING_SETS_SQL = """
SELECT n_regionkey, n_nationkey % 2 AS parity,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(n_regionkey) AS INT) AS g_region
FROM nation
GROUP BY GROUPING SETS ((n_regionkey, n_nationkey % 2), (n_regionkey), ())
"""


@query("dialect_grouping_sets", oracle=_GROUPING_SETS_SQL)
def dialect_grouping_sets(spark, sf_dir):
    """GROUP BY GROUPING SETS + GROUPING() marker (reference
    src/parser/transform/helpers/transform_groupby.cpp) — native in both
    dialects; pins the passthrough path. NULL group placeholders and the
    grouping() flag must agree across engines."""
    _views(spark, sf_dir, "nation")
    return sqlx.sql(spark, _GROUPING_SETS_SQL)


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(l_returnflag) AS INT) + CAST(grouping(l_linestatus) AS INT) AS lvl
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("dialect_cube_rollup", oracle=_CUBE_SQL)
def dialect_cube_rollup(spark, sf_dir):
    """GROUP BY CUBE — all 2^k grouping combinations (reference
    transform_groupby.cpp CUBE expansion); native in both engines."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _CUBE_SQL)


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


_STAR_REPLACE_SQL = """
SELECT * REPLACE (round(o_totalprice * 2, 2) AS o_totalprice,
                  lower(o_orderpriority) AS o_orderpriority)
FROM (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey < 400) t
"""


@query("dialect_star_replace", oracle=_STAR_REPLACE_SQL)
def dialect_star_replace(spark, sf_dir):
    """* REPLACE (expr AS col, ...) star modifier (reference
    star_expression.cpp replace_list): sqlx rewrites to
    * EXCEPT (cols...) + appended aliased expressions — identical names,
    types, and values; replaced columns move to the end of the list (the
    documented position caveat; the driver's compare is name-addressed)."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _STAR_REPLACE_SQL)


_COLUMNS_STAR_SQL = """
SELECT max(COLUMNS('^l_.*key$'))
FROM (SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
      FROM lineitem WHERE l_orderkey < 500) t
"""


@query("dialect_columns_regex", oracle=_COLUMNS_STAR_SQL)
def dialect_columns_regex(spark, sf_dir):
    """COLUMNS('regex') star expression (reference
    transform_columns_expression / star_expression.cpp columns=true):
    sqlx.expand_columns probes the FROM source schema with a LIMIT-0 plan,
    replicates the aggregate per matching column, and aliases each with the
    bare column name — DuckDB's observed naming convention."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _COLUMNS_STAR_SQL)


_STRUCT_LITERAL_SQL = """
SELECT o_orderkey,
       {'k': o_orderkey, 'price': o_totalprice}.price AS price2,
       {'o': {'i': o_orderkey + 1}}.o.i AS nested,
       cardinality(MAP {'a': o_orderkey, 'b': o_custkey}) AS map_n
FROM orders WHERE o_orderkey < 300
"""


@query("dialect_struct_literal", oracle=_STRUCT_LITERAL_SQL)
def dialect_struct_literal(spark, sf_dir):
    """Struct literals {'k': v} and MAP {'k': v} (reference
    transform_constant.cpp struct binding, transform_map.cpp): sqlx
    rewrites braces to named_struct(...) / map(...) on literal-masked text
    (keys are masked, so braces inside strings never fire); nested structs
    compose recursively and field access passes through (both dialects
    spell it .field). Map SUBSCRIPT stays out: DuckDB map['k'] returns a
    LIST while Spark element_at returns the scalar — cardinality() is the
    cross-engine map check."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _STRUCT_LITERAL_SQL)


_LIST_COMP_SQL = """
SELECT o_orderkey,
       [x * 2 FOR x IN [o_orderkey % 5, o_orderkey % 7, 11] IF x > 2] AS comp,
       list_transform([1, o_orderkey % 3], x -> x + 10) AS lt,
       list_filter([o_orderkey % 4, 2, 9], x -> x % 2 = 1) AS lf
FROM orders WHERE o_orderkey < 200
"""


@query(
    "dialect_list_comprehension",
    join_arrays=["comp", "lt", "lf"],
    oracle=_LIST_COMP_SQL,
)
def dialect_list_comprehension(spark, sf_dir):
    """List comprehensions [e FOR x IN l IF p] (DuckDB desugars to
    list_transform/list_filter; sqlx._comprehension emits the same
    transform(filter(...)) composition) plus the list_transform/list_filter
    name mapping — Spark's lambda syntax `x -> e` is identical, so only
    names rewrite (sqlx.rewrite_list_fns). list_sort/list_reduce are
    deliberately NOT mapped: their null-ordering/seed semantics differ."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _LIST_COMP_SQL)


_PIVOT_STMT_SQL = """
PIVOT orders ON o_orderpriority USING count(o_orderkey) GROUP BY o_orderstatus
"""


@query("dialect_pivot_stmt", oracle=_PIVOT_STMT_SQL)
def dialect_pivot_stmt(spark, sf_dir):
    """Top-level PIVOT statement (reference
    src/parser/transform/statement/transform_pivot_stmt.cpp): DuckDB's
    dynamic two-phase pivot — sqlx discovers the distinct pivot values with
    one DISTINCT scan and rewrites to Spark's PIVOT clause with the values
    aliased to DuckDB's column naming. Same text runs verbatim on DuckDB."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _PIVOT_STMT_SQL)


_UNPIVOT_STMT_SQL = """
UNPIVOT (
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders GROUP BY o_orderstatus
) ON urgent, low INTO NAME prio VALUE n
"""


@query("dialect_unpivot_stmt", oracle=_UNPIVOT_STMT_SQL)
def dialect_unpivot_stmt(spark, sf_dir):
    """Top-level UNPIVOT statement (same reference transform): columns fold
    into NAME/VALUE rows via Spark's UNPIVOT clause; NULL cells drop on both
    engines."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _UNPIVOT_STMT_SQL)


_FROM_FIRST_SQL = """
FROM nation SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
WHERE n_nationkey < 20 GROUP BY n_regionkey, ORDER BY n_regionkey
"""


@query("dialect_from_first", oracle=_FROM_FIRST_SQL)
def dialect_from_first(spark, sf_dir):
    """FROM-first statement + trailing commas (reference
    transform_select_node.cpp: select list defaults to *; parser trailing-
    comma ergonomics): sqlx moves the SELECT list back in front and drops
    list-final commas. Same text runs natively on DuckDB."""
    _views(spark, sf_dir, "nation")
    return sqlx.sql(spark, _FROM_FIRST_SQL)


_FROM_BARE_SQL = """
FROM region ORDER BY r_regionkey LIMIT 3
"""


@query("dialect_from_bare", oracle=_FROM_BARE_SQL)
def dialect_from_bare(spark, sf_dir):
    """Bare FROM (SELECT * implied) — DuckDB's shortest query form."""
    _views(spark, sf_dir, "region")
    return sqlx.sql(spark, _FROM_BARE_SQL)


@query(
    "dialect_prepare_execute",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def dialect_prepare_execute(spark, sf_dir):
    """SQL-level PREPARE / EXECUTE (reference transform_prepare.cpp +
    client_context.cpp:408 CreatePreparedStatement): the statement is stored
    by name, EXECUTE binds $1/$2 positional parameters as SQL text and runs
    through the dialect pipeline. The oracle is the constant-folded query."""
    _views(spark, sf_dir, "orders")
    sqlx.sql(
        spark,
        """
        PREPARE prio_counts AS
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_totalprice > $1 AND o_orderstatus = $2
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    )
    return sqlx.sql(spark, "EXECUTE prio_counts(150000, 'O')")


@query(
    "dialect_copy_stmt_roundtrip",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_totalprice > 200000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def dialect_copy_stmt_roundtrip(spark, sf_dir):
    """COPY (query) TO 'path' (reference transform_copy.cpp +
    physical_copy_to_file.cpp): the statement runs the inner dialect query
    and writes via sources.copy_to; reading the file back must reproduce the
    selection exactly (oracle aggregates the same predicate directly)."""
    import tempfile

    _views(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="parachute_copy_stmt_") + "/expensive.parquet"
    sqlx.sql(
        spark,
        f"COPY (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000) TO '{out}'",
    )
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


@query(
    "dialect_sql_script",
    oracle="""
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n
    FROM nation WHERE n_nationkey >= 5
    GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def dialect_sql_script(spark, sf_dir):
    """Multi-statement script execution (sqlx.run_script — the interactive
    shell surface, reference shell/duckdb_shell): PREPARE + SET + a
    FROM-first EXECUTE-style query chained by top-level semicolons with
    comments; result = last statement. Oracle is the constant-folded end
    query."""
    _views(spark, sf_dir, "nation")
    return sqlx.run_script(
        spark,
        """
        -- pipeline-style script; ';' inside literals must not split
        SET memory_limit = '4GB';
        PREPARE region_counts AS
            FROM nation SELECT n_regionkey, count(*) AS n,
            WHERE n_nationkey >= $1 GROUP BY n_regionkey ORDER BY n_regionkey;
        EXECUTE region_counts(5);
        """,
    )


@query(
    "dialect_create_macro",
    oracle="""
    SELECT o_orderpriority,
           round(sum(o_totalprice * (1 - 0.04)), 2) AS net,
           CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    cast_double=("net",),
)
def dialect_create_macro(spark, sf_dir):
    """CREATE MACRO with untyped parameters (reference
    scalar_macro_function.cpp — bind-time textual expansion): the macro body
    expands at every call site with parameters substituted, including nested
    macro calls. Oracle = the hand-expanded query."""
    _views(spark, sf_dir, "orders")
    sqlx.sql(spark, "CREATE MACRO discounted(p, d) AS p * (1 - d)")
    sqlx.sql(spark, "CREATE OR REPLACE MACRO net4(p) AS discounted(p, 0.04)")
    try:
        return sqlx.sql(
            spark,
            """
            SELECT o_orderpriority, round(sum(net4(o_totalprice)), 2) AS net, count(*) AS n
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
            """,
        )
    finally:
        # expansion is text-level at sql() time, so dropping here is safe for
        # the (lazy) returned plan — and keeps the process-global registry
        # from rewriting later queries' tokens
        sqlx.sql(spark, "DROP MACRO IF EXISTS discounted")
        sqlx.sql(spark, "DROP MACRO IF EXISTS net4")


@query(
    "dialect_temp_table",
    oracle="""
    CREATE OR REPLACE TEMP TABLE big_orders_tt AS
        SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000;
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM big_orders_tt
    GROUP BY o_custkey HAVING count(*) >= 2 ORDER BY o_custkey
    """,
)
def dialect_temp_table(spark, sf_dir):
    """CREATE TEMP TABLE … AS (reference transform_create_table.cpp,
    CreateTableInfo::temporary) — MATERIALIZED-once semantics, not a view:
    the handler snapshots through a lazy localCheckpoint so every reader
    (and any nondeterministic defining expression) sees one evaluation,
    matching DuckDB's temp-table behavior. Script chains creation and the
    consuming aggregate through run_script."""
    _views(spark, sf_dir, "orders")
    try:
        return sqlx.run_script(
            spark,
            """
            CREATE OR REPLACE TEMP TABLE big_orders_tt AS
                SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000;
            SELECT o_custkey, count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM big_orders_tt
            GROUP BY o_custkey HAVING count(*) >= 2 ORDER BY o_custkey;
            """,
        )
    finally:
        # the returned plan is already resolved against the snapshot, so
        # dropping the NAME here is safe — and keeps the shared session's
        # namespace clean (same hygiene as dialect_create_macro's DROPs)
        sqlx.sql(spark, "DROP TABLE IF EXISTS big_orders_tt")


@query(
    "dialect_describe",
    oracle="""
    SELECT column_name, column_type, "null" AS nullable
    FROM (DESCRIBE nation) ORDER BY column_name
    """,
)
def dialect_describe(spark, sf_dir):
    """DESCRIBE statement (reference transform_show.cpp → duckdb_columns):
    column_name/column_type/null in DuckDB's spelling, built from the
    LIMIT-0 probed schema — planning only, no job. Types go through the
    same duckdb_type_name normalization as the system catalog TVFs."""
    _views(spark, sf_dir, "nation")
    return (
        sqlx.sql(spark, "DESCRIBE nation")
        .selectExpr("column_name", "column_type", "`null` AS nullable")
        .orderBy("column_name")
    )


_REGEX_OPS_SQL = """
SELECT o_orderkey,
       o_orderpriority SIMILAR TO '[0-9]-(URGENT|HIGH)' AS is_hot,
       o_orderpriority ~ '.*MEDIUM.*' AS is_med,
       o_orderstatus !~ '[FP]+' AS not_fp,
       o_orderpriority ~~ '%LOW%' AS is_low
FROM orders WHERE o_orderkey < 400
"""


@query("dialect_regex_ops", oracle=_REGEX_OPS_SQL)
def dialect_regex_ops(spark, sf_dir):
    """SIMILAR TO / ~ / !~ / ~~ operators (reference
    transform_operator.cpp: regexp_full_match and (NOT) LIKE aliases).
    Spark's RLIKE is partial-match, so sqlx re-anchors the pattern literal
    as ^(?:pat)$ — the same DuckDB SQL is the oracle, the strongest
    transpile check."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _REGEX_OPS_SQL)


_UBN_SQL = """
SELECT n_regionkey AS region, CAST(count(*) AS BIGINT) AS nations
FROM nation GROUP BY n_regionkey
UNION ALL BY NAME
SELECT CAST(count(*) AS BIGINT) AS nations, r_regionkey AS region, r_name AS rname
FROM region JOIN nation ON r_regionkey = n_regionkey GROUP BY r_regionkey, r_name
ORDER BY region, nations, rname
"""


@query("dialect_union_by_name", oracle=_UBN_SQL)
def dialect_union_by_name(spark, sf_dir):
    """UNION ALL BY NAME (reference transform_setop.cpp by_name): columns
    align by NAME across differently-shaped sides, missing columns fill
    NULL; Spark has no SQL spelling, so sqlx folds the segments through
    unionByName(allowMissingColumns=True) and applies the trailing ORDER BY
    to the union."""
    _views(spark, sf_dir, "nation", "region")
    return sqlx.sql(spark, _UBN_SQL)


_POWER_SQL = """
SELECT l_linenumber,
       round(avg(l_quantity ^ 2), 4) AS avg_qty_sq,
       round(avg((1 - l_discount) ** 2 * l_extendedprice) / 1e6, 6) AS disc_sq_m
FROM lineitem WHERE l_orderkey < 2000
GROUP BY l_linenumber ORDER BY l_linenumber
"""


@query("dialect_power_operator", oracle=_POWER_SQL)
def dialect_power_operator(spark, sf_dir):
    """^ and ** power operators (reference transform_operator.cpp binds ^
    to pow; duckdb 1.0: 2^3=8). Spark's ^ is bitwise XOR — the classic
    silent-wrong-answer migration trap — so sqlx parses operands (left-
    associative, unary-minus-tightest) and emits power(l, r). Same SQL is
    the oracle."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _POWER_SQL)


_ORDER_ALL_SQL = """
SELECT n_regionkey, n_nationkey % 3 AS trip, CAST(count(*) AS BIGINT) AS n
FROM nation GROUP BY n_regionkey, n_nationkey % 3
ORDER BY ALL
"""


@query("dialect_order_by_all", oracle=_ORDER_ALL_SQL)
def dialect_order_by_all(spark, sf_dir):
    """ORDER BY ALL (reference transform_orderby.cpp): sort by every output
    column left-to-right. Spark supports POSITIONAL sort keys, so sqlx
    expands ALL to 1, 2, …, n via a LIMIT-0 schema probe (planning only)."""
    _views(spark, sf_dir, "nation")
    return sqlx.sql(spark, _ORDER_ALL_SQL)


_STRSPLIT_SQL = """
SELECT o_orderkey,
       string_split(o_orderpriority, '-')[1] AS prio_code,
       string_split(o_orderpriority, '-')[2] AS prio_word
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
"""


@query("dialect_string_split", oracle=_STRSPLIT_SQL)
def dialect_string_split(spark, sf_dir):
    """string_split with a LITERAL separator (reference
    string_split.cpp): Spark's split() interprets the separator as a
    REGEX, so sqlx \\Q…\\E-quotes literal separators ('-' here; '.' or
    '||' would silently split wrong otherwise). 1-based subscripts ride
    the existing bracket rewrite."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _STRSPLIT_SQL)


@query(
    "dialect_asof_join_sql",
    oracle="""
    WITH e AS (SELECT user_id % 200 AS uid, event_id AS eid FROM events WHERE event_id < 2000),
         o AS (SELECT o_custkey % 200 AS uid, o_orderkey AS okey, o_totalprice FROM orders)
    SELECT e.uid, e.eid, o.okey, round(o.o_totalprice, 2) AS price
    FROM e ASOF LEFT JOIN o ON e.uid = o.uid AND e.eid >= o.okey
    ORDER BY e.uid, e.eid
    """,
)
def dialect_asof_join_sql(spark, sf_dir):
    """ASOF LEFT JOIN as SQL (reference transform_join.cpp JOIN_ASOF /
    PhysicalAsOfJoin): the restricted-grammar statement handler parses the
    equality keys and the single >=/<= match condition and routes through
    operators.asof.asof_join (union + running-last window — never a range
    self-join). DuckDB runs its NATIVE ASOF JOIN as the oracle."""
    from pyspark.sql import functions as F

    load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000).select(
        (F.col("user_id") % 200).alias("uid"), F.col("event_id").alias("eid")
    ).createOrReplaceTempView("asof_e")
    load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 200).alias("uid"),
        F.col("o_orderkey").alias("okey"),
        "o_totalprice",
    ).createOrReplaceTempView("asof_o")
    return sqlx.sql(
        spark,
        """
        SELECT e.uid, e.eid, o.okey, round(o.o_totalprice, 2) AS price
        FROM asof_e e ASOF LEFT JOIN asof_o o
        ON e.uid = o.uid AND e.eid >= o.okey
        ORDER BY uid, eid
        """,
    )


_STRFTIME_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m') AS ym,
       strftime(o_orderdate, '%a %d %b %Y') AS pretty,
       strftime(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'), '%d/%m/%Y') AS roundtrip
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
"""


@query("dialect_strftime", oracle=_STRFTIME_SQL)
def dialect_strftime(spark, sf_dir):
    """strftime/strptime with C-style %-specifiers (reference
    strftime_format.cpp): translated specifier-by-specifier to Java
    DateTimeFormatter patterns for date_format/to_timestamp; bare letters
    become quoted literals, unmapped specifiers raise. Same SQL is the
    oracle, including locale-dependent %a/%b names (both engines English
    here)."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _STRFTIME_SQL)


_INTCAST_SQL = """
SELECT l_orderkey,
       (l_extendedprice * l_discount)::INT AS disc_money_int,
       CAST(l_extendedprice / 7 AS BIGINT) AS sliced_big,
       (l_quantity + 0.5)::BIGINT AS qty_half_up,
       ((l_extendedprice / 3)::DOUBLE)::INT AS via_double,
       TRY_CAST(concat(CAST(l_linenumber AS VARCHAR), '.5') AS INT) AS str_half
FROM lineitem WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
"""


@query("dialect_int_cast_round", oracle=_INTCAST_SQL)
def dialect_int_cast_round(spark, sf_dir):
    """Integer-target casts ROUND in DuckDB (reference
    src/common/operator/cast_operators.hpp NumericTryCast / decimal casts):
    DECIMAL and VARCHAR round half AWAY from zero (2.5::int = 3,
    '-2.5'::int = -3), DOUBLE/FLOAT round half to EVEN ((2.5::double)::int
    = 2) — all pinned against duckdb 1.0. Spark's CAST truncates toward
    zero, a silent wrong answer on every fractional operand, so
    sqlx.rewrite_int_casts emits a typeof()-dispatched rounding CASE whose
    ELSE branch keeps already-integer operands on the exact passthrough
    path (no double round-trip above 2^53). Same SQL is the oracle."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _INTCAST_SQL)


_FN_ALIAS_SQL = """
SELECT o_orderstatus,
       arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS cheapest_key,
       arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS priciest_key,
       CAST(max(strpos(o_orderpriority, 'U')) AS BIGINT) AS max_pos,
       CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[123]|T$') THEN 1 ELSE 0 END) AS BIGINT) AS re_hits,
       CAST(max(list_extract(string_split_regex(o_orderpriority, '[^A-Z]+'), 2)) AS VARCHAR) AS second_word,
       CAST(sum(list_position(['1-URGENT', '2-HIGH', '3-MEDIUM'], o_orderpriority)) AS BIGINT) AS prio_rank_sum
FROM orders WHERE o_orderkey < 2000
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("dialect_fn_aliases", oracle=_FN_ALIAS_SQL)
def dialect_fn_aliases(spark, sf_dir):
    """DuckDB function-name aliases (reference src/core_functions/*/
    functions.json alias lists), pinned semantics: arg_min/arg_max ≡
    min_by/max_by (the price*1e5+key tiebreak keeps both engines
    deterministic), strpos ≡ instr (1-based, 0 when absent),
    regexp_matches ≡ regexp_like (both PARTIAL match), string_split_regex ≡
    split (both regex separators), list_extract ≡ try_element_at with the
    zero-safe index rule (DuckDB l[0] is NULL; ANSI element_at throws),
    list_position ≡ array_position (both 0 when absent). The totalprice
    tiebreak keeps arg_min/arg_max deterministic in both engines. Same SQL
    is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _FN_ALIAS_SQL)


_DATE_DIFF_SQL = """
SELECT o_orderpriority,
       CAST(sum(date_diff('month', o_orderdate, TIMESTAMP '1996-06-15 12:00:00')) AS BIGINT) AS months,
       CAST(sum(date_diff('week', o_orderdate, TIMESTAMP '1996-06-15 12:00:00')) AS BIGINT) AS weeks,
       CAST(sum(date_diff('day', o_orderdate, TIMESTAMP '1996-06-15 12:00:00')) AS BIGINT) AS days,
       CAST(max(date_diff('quarter', o_orderdate, TIMESTAMP '1996-06-15 12:00:00')) AS BIGINT) AS max_q,
       CAST(min(datediff('year', o_orderdate, TIMESTAMP '1996-06-15 12:00:00')) AS BIGINT) AS min_y
FROM orders WHERE o_orderkey < 2000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("dialect_date_diff", oracle=_DATE_DIFF_SQL)
def dialect_date_diff(spark, sf_dir):
    """date_diff/datediff('part', a, b) counts PART BOUNDARIES CROSSED
    (reference src/common/types/date.cpp date part logic; duckdb 1.0:
    date_diff('month', Jan 31, Feb 1) = 1) — Spark's timestampdiff counts
    COMPLETE units and would be off by one on every fractional interval, so
    sqlx emits explicit boundary formulas per part (year/quarter/month from
    calendar fields, week via Monday truncation, day via date diff,
    hour/minute/second via unit truncation + epoch arithmetic). Same SQL is
    the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _DATE_DIFF_SQL)


_STRAGG_SORT_SQL = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS names_csv,
       string_agg(substr(n_name, 1, 1) ORDER BY n_name DESC) AS initials_desc,
       list_sort(list(n_nationkey)) AS keys_asc,
       list_sort(list(n_nationkey), 'DESC') AS keys_desc,
       list_reverse_sort(list(n_nationkey % 5)) AS mods_desc
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


@query(
    "dialect_string_agg_sort",
    oracle=_STRAGG_SORT_SQL,
    join_arrays=("keys_asc", "keys_desc", "mods_desc"),
)
def dialect_string_agg_sort(spark, sf_dir):
    """string_agg(expr[, sep] ORDER BY ...) → listagg WITHIN GROUP (default
    separator ','), and list_sort/list_reverse_sort with DuckDB's measured
    defaults — ASC NULLS LAST ≡ Spark array_sort; each (direction, nulls)
    pair maps to array_sort / sort_array / reverse(array_sort) / an explicit
    comparator (reference string_agg.cpp, list_sort.cpp). list() ≡
    collect_list is order-nondeterministic, so every aggregate carries an
    explicit order. Same SQL is the oracle."""
    _views(spark, sf_dir, "nation")
    return sqlx.sql(spark, _STRAGG_SORT_SQL)


_QUANTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS p50,
       round((quantile_cont(CAST(l_extendedprice AS DOUBLE), [0.25, 0.75]))[2], 4) AS p75,
       CAST(quantile_disc(l_quantity, 0.9) AS DOUBLE) AS q90_disc,
       CAST(quantile(l_linenumber, 0.5) AS BIGINT) AS line_med
FROM lineitem WHERE l_orderkey < 2000
GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("dialect_quantiles", oracle=_QUANTILE_SQL)
def dialect_quantiles(spark, sf_dir):
    """quantile_cont ≡ percentile (interpolated; the array-of-quantiles form
    maps too) and quantile_disc/quantile ≡ percentile_disc rewritten to the
    ordered-set WITHIN GROUP spelling (reference src/core_functions/
    aggregate/holistic/quantile.cpp). Operands are cast to DOUBLE in-query
    on BOTH sides: DuckDB's DECIMAL-input quantile keeps the source scale
    (2.5 → '1.7' at scale 1) while Spark interpolates in double — the one
    pinned divergence, documented at the rewrite. Same SQL is the oracle."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _QUANTILE_SQL)


@query(
    "dialect_copy_from_by_name",
    oracle="""
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           CAST(count(n_name) AS BIGINT) AS named
    FROM (
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        UNION ALL
        SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 0
        UNION ALL
        SELECT n_nationkey + 100, NULL, n_regionkey FROM nation WHERE n_nationkey < 3
    )
    GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def dialect_copy_from_by_name(spark, sf_dir):
    """COPY <tbl> FROM 'file.csv' — the INGEST half of the reference's
    bidirectional COPY (copy_statement.cpp) — plus INSERT INTO ... BY NAME
    (transform_insert.cpp BY_NAME column order): the query round-trips a
    region-0 slice of nation through a CSV file back into a temp table, then
    BY-NAME-inserts reordered rows with a NULL-filled missing column. The
    oracle states the equivalent unions over the base table."""
    import os
    import tempfile

    _views(spark, sf_dir, "nation")
    base = "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    sqlx.sql(spark, f"CREATE OR REPLACE TEMP TABLE cfbn AS {base}")
    csv_path = os.path.join(tempfile.mkdtemp(prefix="parachute_copyfrom_"), "r0.csv")
    sqlx.sql(spark, f"COPY ({base} WHERE n_regionkey = 0) TO '{csv_path}' (FORMAT csv, HEADER)")
    sqlx.sql(spark, f"COPY cfbn FROM '{csv_path}' (HEADER)")
    sqlx.sql(
        spark,
        "INSERT INTO cfbn BY NAME "
        "SELECT n_regionkey, n_nationkey + 100 AS n_nationkey FROM nation WHERE n_nationkey < 3",
    )
    return sqlx.sql(
        spark,
        """
        SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
               CAST(count(n_name) AS BIGINT) AS named
        FROM cfbn GROUP BY n_regionkey ORDER BY n_regionkey
        """,
    )


_DATE_PART_SQL = """
SELECT o_orderkey,
       CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow,
       CAST(extract(isodow FROM o_orderdate) AS BIGINT) AS isodow,
       CAST(date_part('isoyear', o_orderdate) AS BIGINT) AS isoyr,
       CAST(date_part('yearweek', o_orderdate) AS BIGINT) AS yw,
       CAST(date_part('decade', o_orderdate) AS BIGINT) AS dec,
       CAST(extract(century FROM o_orderdate) AS BIGINT) AS cen,
       CAST(date_part('era', o_orderdate) AS BIGINT) AS era,
       CAST(date_part('epoch', o_orderdate) AS DOUBLE) AS ep,
       CAST(date_part('doy', o_orderdate) AS BIGINT) AS doy
FROM orders WHERE o_orderkey % 101 = 0
ORDER BY o_orderkey
"""


@query("dialect_date_part", oracle=_DATE_PART_SQL)
def dialect_date_part(spark, sf_dir):
    """date_part/datepart/extract divergence map (round 11; reference
    src/common/types/date.cpp date-part logic, pinned on duckdb 1.0):
    dow numbers Sunday=0 (Spark's dayofweek says 1), isodow Monday=1..7
    (Spark lacks the field), isoyear → YEAROFWEEK, epoch returns DOUBLE
    seconds with the naive value taken as UTC (emitted via TIMESTAMP_NTZ
    timestampdiff so the result is session-timezone-independent),
    decade/century/millennium/era/yearweek computed from calendar fields.
    Identical-semantics parts (doy here) pass through untouched. Same SQL
    is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _DATE_PART_SQL)


_FN_GAPS_SQL = """
SELECT n_nationkey,
       regexp_replace(n_name, '[AEIOU]', '_') AS first_vowel_masked,
       regexp_replace(n_name, '[AEIOU]', '_', 'g') AS all_vowels_masked,
       CAST(dayofweek(DATE '1996-01-02' + n_nationkey) AS BIGINT) AS dow0,
       round(log(CAST(n_nationkey + 10 AS DOUBLE)), 8) AS log10_val,
       ltrim(n_name, 'A') AS ltrimmed,
       list_sum([n_nationkey, n_regionkey, 5]) AS lsum,
       round(list_cosine_similarity(
           [CAST(n_nationkey AS DOUBLE), 1.0, 2.0],
           [1.0, CAST(n_regionkey AS DOUBLE), 3.0]), 8) AS cos_sim,
       strftime(time_bucket(INTERVAL 2 DAY,
                TIMESTAMP '2021-07-01 08:00:00' + INTERVAL 13 HOUR * n_nationkey),
                '%Y-%m-%d %H:%M:%S') AS bucket2d,
       fmod(CAST(n_nationkey AS DOUBLE) - 12.5, 3.0) AS floored_mod,
       even(CAST(n_nationkey AS DOUBLE) / 3) AS next_even,
       round_even(CAST(n_nationkey AS DOUBLE) + 0.5, 0) AS bankers
FROM nation ORDER BY n_nationkey
"""


@query("dialect_fn_gaps", oracle=_FN_GAPS_SQL)
def dialect_fn_gaps(spark, sf_dir):
    """Round-11 function-gap batch, driver-graded end-to-end: DuckDB's
    FIRST-match-only regexp_replace vs the 'g' flag (Spark replaces all —
    silently wrong before rewrite_fn_gaps), 0-based dayofweek(), 1-arg
    log() = log10 (Spark's is ln), trim-family arg order, NULL-skipping
    list_sum, the vectorized list_cosine_similarity expansion, PostgreSQL-
    origin time_bucket on a multi-day width (origin 2000-01-03 — a unix
    anchor shifts every odd bucket), floored fmod (divisor's sign), even(),
    and banker's round_even -> bround. Same SQL is the oracle."""
    _views(spark, sf_dir, "nation")
    return sqlx.sql(spark, _FN_GAPS_SQL)


@query(
    "dialect_stmt_surface",
    oracle="""
    SELECT CAST(cid AS BIGINT) AS cid, name, "type" AS col_type,
           "notnull" AS not_null, pk
    FROM pragma_table_info('nation') ORDER BY cid
    """,
)
def dialect_stmt_surface(spark, sf_dir):
    """Round-11 statement surface (reference transform_show.cpp /
    transform_pragma.cpp / transform_set.cpp): the script exercises
    SET k TO v, SHOW <t> (≡ DESCRIBE), CHECKPOINT and ANALYZE no-ops, and
    TRUNCATE on a temp table; the graded result is PRAGMA table_info in
    DuckDB's exact six-column shape (cid/name/type/notnull/dflt_value/pk)
    with the repo's DuckDB type-name mapping, compared against the REAL
    pragma_table_info table function."""
    _views(spark, sf_dir, "nation")
    sqlx.run_script(
        spark,
        """
        SET threads TO 32;
        CREATE OR REPLACE TEMP TABLE stmt_probe AS SELECT * FROM nation;
        SHOW stmt_probe;
        CHECKPOINT;
        ANALYZE;
        TRUNCATE stmt_probe
        """,
    )
    assert sqlx.sql(spark, "SELECT count(*) AS n FROM stmt_probe").head()["n"] == 0
    return sqlx.sql(spark, "PRAGMA table_info('nation')").selectExpr(
        "CAST(cid AS BIGINT) AS cid", "name", "type AS col_type",
        "notnull AS not_null", "pk"
    ).orderBy("cid")


_AGG_GAPS_SQL = """
SELECT o_orderstatus,
       round(skewness(o_totalprice), 6) AS skew_samp,
       round(kurtosis(o_totalprice), 6) AS kurt_samp,
       round(kurtosis_pop(o_totalprice), 6) AS kurt_pop,
       round(sem(o_totalprice), 6) AS std_err,
       round(geomean(o_totalprice), 4) AS geo_mean,
       round(product(CASE WHEN o_orderkey % 997 = 0 THEN 1.5 ELSE 1.0 END), 4) AS prod_sparse,
       first(o_orderkey ORDER BY o_totalprice) AS cheapest,
       last(o_orderkey ORDER BY o_totalprice) AS priciest,
       first(o_orderkey ORDER BY o_totalprice DESC) AS priciest2,
       round(favg(o_totalprice), 4) AS f_avg,
       round(fsum(o_totalprice), 4) AS f_sum
FROM orders WHERE o_orderkey % 13 = 0
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("dialect_agg_gaps", oracle=_AGG_GAPS_SQL)
def dialect_agg_gaps(spark, sf_dir):
    """Round-11 aggregate gaps, driver-graded (reference
    core_functions/aggregate/distributive + holistic): DuckDB's skewness
    and kurtosis are SAMPLE-corrected where Spark's are population —
    rewritten through the exact correction formulas (verified bit-for-bit:
    kurtosis_pop ≡ Spark kurtosis); sem = stddev_pop/sqrt(n); geomean;
    product as a true multiplication fold; ordered-aggregate first/last
    (e ORDER BY k [DESC]) → min_by/max_by with DuckDB's NULLS-LAST key
    placement; compensated favg/fsum as DOUBLE. Same SQL is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _AGG_GAPS_SQL)


_JSON_FNS_SQL = """
SELECT event_id,
       json_valid(props) AS ok,
       json_extract(props, '$.k') AS k_json,
       json_extract_string(props, '$.k') AS k_text,
       json_type(props) AS t_root,
       json_type(props, '$.k') AS t_k,
       json_keys(props)[1] AS first_key,
       json(props) AS minified,
       json_array(event_id, user_id) AS pair,
       json_object('id', event_id) AS obj
FROM events WHERE event_id % 97 = 0
ORDER BY event_id
"""


@query("dialect_json_fns", oracle=_JSON_FNS_SQL)
def dialect_json_fns(spark, sf_dir):
    """Round-11 JSON function family (reference extension/json), built on
    Spark VARIANT: json_extract returns JSON-typed text with quoting intact
    (to_json ∘ variant_get — get_json_object would unquote), json_type maps
    schema_of_variant to DuckDB's names (OBJECT/ARRAY/VARCHAR/UBIGINT/...),
    json_keys → json_object_keys, json() parses + minifies, json_object /
    json_array construct. Same SQL is the oracle."""
    _views(spark, sf_dir, "events")
    return sqlx.sql(spark, _JSON_FNS_SQL)


_JSON_TAIL_SQL = """
WITH docs(i, j) AS (
    SELECT * FROM (VALUES
        (1, '{"a":1,"b":[1,2],"c":{"d":"x"},"e":1.5,"f":true,"g":null}'),
        (2, '[{"a":1},{"a":2.5}]'),
        (3, '[1,"x"]'),
        (4, '{"a":[{"b":1},{"c":2}]}'),
        (5, '{"a":-1}'),
        (6, '[[1],[2]]'),
        (7, '"hi"'),
        (8, '{}'),
        (9, '[]'),
        (10, '{"a":{"x":1,"y":2},"c":2}')
    ) AS t(i, j)
)
SELECT i,
       json_structure(j) AS struct_s,
       json_contains(j, '{"a":1}') AS has_obj,
       json_contains(j, '1') AS has_one,
       json_contains(j, '[1]') AS has_arr,
       to_json(json_transform(j, '{"a":"DOUBLE"}')) AS transformed
FROM docs ORDER BY i
"""


@query("dialect_json_tail", oracle=_JSON_TAIL_SQL)
def dialect_json_tail(spark, sf_dir):
    """Round-12 JSON tail (VERDICT r11 missing #2; reference
    extension/json/json_functions/{json_structure,json_contains,
    json_transform}.cpp): json_structure runs DuckDB's inference lattice
    (UBIGINT<BIGINT<DOUBLE, NULL unifies, conflicts collapse to "JSON",
    standalone {} is "JSON") and json_contains the recursive type-strict
    containment — both Arrow-batched pandas UDFs (pure row-local recursion,
    no Spark-expressible spelling); json_transform -> from_json with the
    structure literal converted to a Spark DDL schema, null-on-failed-cast
    (PERMISSIVE ≡ DuckDB non-strict), wrapped in null-keeping to_json.
    Same SQL is the oracle. json_pretty is unit-pinned instead (the
    container's DuckDB 1.0.0 oracle predates it); json_serialize_sql is
    documented out of scope (SURVEY M13)."""
    from duckdb_parachute_spark.functions import register_udfs

    register_udfs(spark)
    return sqlx.sql(spark, _JSON_TAIL_SQL)


_FN_GAPS2_SQL = """
SELECT p_partkey,
       round(jaccard(p_name, p_type), 6) AS jac,
       format_bytes(CAST(p_retailprice * 1000 AS BIGINT)) AS fb,
       formatReadableDecimalSize(CAST(p_retailprice * 1000 AS BIGINT)) AS frd,
       parse_path(replace(p_type, ' ', '/'))[1] AS path_head,
       parse_dirname(replace(p_name, ' ', '/')) AS dir1,
       parse_dirpath(replace(p_name, ' ', '/')) AS dpath,
       parse_filename(replace(p_name, ' ', '/'), true) AS fname,
       to_base64(encode(p_name)) AS b64,
       editdist3(p_brand, p_type) AS ed,
       string_split_regex(p_name, '[aeiou]+')[1] AS tok1,
       element_at(MAP {p_brand: p_partkey}, p_brand)[1] AS me
FROM part WHERE p_partkey % 17 = 0
ORDER BY p_partkey
"""


@query("dialect_fn_gaps2", oracle=_FN_GAPS2_SQL)
def dialect_fn_gaps2(spark, sf_dir):
    """Round-12 function-gap batch over real part rows (probed on DuckDB
    1.0, each pinned in the metamorphic suite): BYTE-set jaccard ('héllo'
    vs 'hello' = 0.5 — bytes, not codepoints), format_bytes /
    formatReadableDecimalSize with DuckDB's TRUNCATION to 1 decimal
    (1048575 -> '1023.9 KiB', not 1024.0), the parse_path family (root
    element kept, dirname = FIRST component, trim-one-extension filename),
    map-only element_at (returns a LIST like map_extract — Spark's scalar
    element_at would silently unwrap), BLOB typed literals, and the
    to_base64/editdist3/string_split_regex renames. Same SQL is the
    oracle."""
    _views(spark, sf_dir, "part")
    return sqlx.sql(spark, _FN_GAPS2_SQL)


_JSON_MERGE_SQL = """
WITH docs(i, t, p) AS (
    SELECT * FROM (VALUES
        (1, '{"a":1,"b":2}', '{"b":null,"c":3}'),
        (2, '{"a":{"x":1,"y":2}}', '{"a":{"y":null,"z":9}}'),
        (3, '[1,2]', '{"a":1}'),
        (4, '{"a":1}', 'null'),
        (5, '{"a":1}', '7'),
        (6, '{}', '{"k":{"n":[1,2]}}')
    ) AS v(i, t, p)
)
SELECT i, json_merge_patch(t, p) AS merged FROM docs ORDER BY i
"""


@query("dialect_json_merge", oracle=_JSON_MERGE_SQL)
def dialect_json_merge(spark, sf_dir):
    """json_merge_patch (round 12; reference extension/json — RFC 7386):
    null patch values DELETE keys, nested objects merge recursively, a
    non-object patch replaces the target wholesale. Arrow-batched pandas
    UDF beside json_structure (row-local recursion, no Spark spelling).
    Same SQL is the oracle."""
    from duckdb_parachute_spark.functions import register_udfs

    register_udfs(spark)
    return sqlx.sql(spark, _JSON_MERGE_SQL)


_DATE_TAIL_SQL = """
SELECT o_orderkey,
       date_sub('month', o_orderdate, DATE '1998-08-02') AS full_months,
       date_sub('day', o_orderdate, DATE '1998-08-02') AS full_days,
       date_diff('month', o_orderdate, DATE '1998-08-02') AS month_bounds,
       CAST(date_add(o_orderdate, INTERVAL 90 MINUTE) AS TIMESTAMP) AS plus90m,
       CAST(CAST(o_orderdate + to_decades(1) AS DATE) AS VARCHAR) AS plus_decade,
       generate_series(CAST(o_orderdate AS TIMESTAMP),
                       CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 DAY,
                       INTERVAL 9 HOUR)[2] AS second_step
FROM orders WHERE o_orderkey % 101 = 0
ORDER BY o_orderkey
"""


@query("dialect_date_tail", oracle=_DATE_TAIL_SQL)
def dialect_date_tail(spark, sf_dir):
    """Round-12 date tail over real orders rows: 3-arg date_sub counts
    COMPLETE elapsed units (timestampdiff — measured 1 where date_diff's
    boundary-crossing count says 2, a silent-wrong-answer trap),
    date_add(date, INTERVAL) anchors at midnight and returns TIMESTAMP,
    decade interval constructor, and timestamp generate_series through the
    sequence mapping. Same SQL is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _DATE_TAIL_SQL)


_LAMBDA_SERIES_SQL = """
SELECT o_orderkey,
       list_transform(range(1, CAST(o_orderkey % 7 AS INT) + 2),
                      (x, i) -> x * 10 + i) AS idx_scaled,
       list_filter(generate_series(1, CAST(o_orderkey % 9 AS INT) + 1),
                   (x, i) -> i % 2 = 1) AS odd_positions,
       range(CAST(o_orderkey % 5 AS INT) + 5, 0, -2) AS countdown,
       list_grade_up(list_transform(range(1, CAST(o_orderkey % 6 AS INT) + 2),
                                    x -> (x * 37) % 11)) AS grade
FROM orders WHERE o_orderkey % 97 = 0
ORDER BY o_orderkey
"""


@query(
    "dialect_lambda_series",
    oracle=_LAMBDA_SERIES_SQL,
    join_arrays=["idx_scaled", "odd_positions", "countdown", "grade"],
)
def dialect_lambda_series(spark, sf_dir):
    """Round-12 lambda/series batch over real orders rows: DuckDB 2-param
    lambdas receive a 1-BASED index where Spark's transform/filter pass
    0-based (a silent off-by-one — rewritten via zip_with over an explicit
    1-based sequence, user lambda text intact), 3-arg range() is
    end-EXCLUSIVE with signed step, and list_grade_up is the stable
    nulls-last argsort. Same SQL is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _LAMBDA_SERIES_SQL)


_SWEEP_SQL = """
SELECT p_partkey,
       sha256(p_name) AS sha,
       chr(CAST(945 + p_partkey % 24 AS INT)) AS greek_chr,
       regexp_extract_all(p_name, '([a-z]+) ') AS full_matches,
       regexp_extract_all(p_name, '([a-z]+) ', 1) AS group_matches,
       regexp_full_match(p_brand, 'Brand#[0-9]+') AS brand_ok,
       trunc(p_retailprice / 100) AS price_trunc,
       CAST(make_timestamp(CAST(p_partkey AS BIGINT) * 1000000000) AS TIMESTAMP) AS ts_us,
       add(p_partkey, 7) AS plus7,
       multiply(p_partkey % 13, 3) AS times3,
       greatest(p_partkey) AS ident
FROM part WHERE p_partkey % 23 = 0
ORDER BY p_partkey
"""


@query(
    "dialect_fn_sweep",
    oracle=_SWEEP_SQL,
    join_arrays=["full_matches", "group_matches"],
    cast_double=["price_trunc"],
)
def dialect_fn_sweep(spark, sf_dir):
    """Round-12 systematic sweep (every evaluable DuckDB scalar probed
    against Spark) — the silent-wrong-answer catches on real rows: chr is
    a UNICODE codepoint (Spark's is ascii%256 — chr(769) returned \\x01),
    regexp_extract_all defaults to group 0 (Spark: group 1 — wrong result
    whenever the pattern has a capture group), sha256 -> sha2(x, 256),
    1-arg numeric trunc toward zero, 1-arg make_timestamp takes epoch
    MICROSECONDS, anchored regexp_full_match, arithmetic function
    spellings, and 1-arg greatest/least identity. Same SQL is the
    oracle."""
    _views(spark, sf_dir, "part")
    return sqlx.sql(spark, _SWEEP_SQL)


_TIMEZONE_SQL = """
SELECT event_id,
       ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo' AS tokyo_wall,
       timezone('America/New_York', timezone('UTC', ts)) AS ny_wall,
       (TIMESTAMPTZ '2021-06-01 05:00:00-07' AT TIME ZONE 'Europe/Berlin') AS berlin_lit,
       (TIMESTAMP '2021-01-15 08:00:00' AT TIME ZONE 'Australia/Sydney') AT TIME ZONE 'UTC' AS syd_utc,
       CAST(timezone(ts) AS BIGINT) AS naive_part,
       CAST(timezone(ts AT TIME ZONE 'UTC') AS BIGINT) AS instant_part
FROM events
WHERE event_id % 97 = 0
ORDER BY event_id
"""


@query("dialect_timezone", oracle=_TIMEZONE_SQL)
def dialect_timezone(spark, sf_dir):
    """timezone() / AT TIME ZONE (round 13; reference extension/icu/
    icu_extension.cpp:213,383): the Postgres-model conversion pair —
    naive wall AT tz -> instant, instant AT tz -> naive wall — mapped to
    session-tz-independent convert_timezone spellings (the ntz/ltz
    divergence VERDICT r12 named as the most-hit documented absence).
    Exercises: chained AT TIME ZONE over an NTZ column, nested 2-arg
    timezone() calls (kind tracked through the recursion), a TIMESTAMPTZ
    literal rendered to a wall, a naive literal roundtripped through a
    zone with DST, and the 1-arg 'timezone' date part (0 for naive,
    session offset for instants). Outputs are all naive walls/BIGINTs so
    the value hash is session-independent. Same SQL is the oracle."""
    _views(spark, sf_dir, "events")
    return sqlx.sql(spark, _TIMEZONE_SQL)


_BITSTRING_SQL = """
SELECT o_orderpriority,
       bitstring_agg(o_orderkey % 29, 0, 28)::VARCHAR AS order_bits,
       CAST(bit_count(bitstring_agg(o_orderkey % 29, 0, 28)) AS BIGINT) AS n_slots,
       CAST(min(get_bit(BIT '0110010', CAST(o_orderkey % 7 AS INT))) AS INT) AS min_bit,
       max(set_bit(BIT '0110010', CAST(o_orderkey % 7 AS INT), 1)::VARCHAR) AS max_set,
       CAST(bit_position(BIT '010', bitstring_agg(o_orderkey % 11, 0, 10)) AS INT) AS probe_pos,
       max(bitstring((CAST(o_orderkey % 97 AS INT))::BIT::VARCHAR, 40)::VARCHAR) AS widened
FROM orders
WHERE o_orderkey < 2000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("dialect_bitstring", oracle=_BITSTRING_SQL)
def dialect_bitstring(spark, sf_dir):
    """BIT type + bitstring family (round 13, VERDICT r12 missing #4;
    reference src/common/types/bit.cpp + extension/core_functions/scalar/
    bit/functions.json): BIT is represented as its '0'/'1' digit string —
    DuckDB's BIT::VARCHAR spelling — so both engines hash identical
    values. Exercises BIT literals, get_bit/set_bit (0-based), 1-based
    bit_position, bitstring widening, bitstring_agg over an explicit
    (min, max) range (set-bit positions = x - min, inclusive), bit_count
    on bitstrings AND on typed integers (type-width masked: DuckDB counts
    within the type), and int::BIT two's-complement rendering — all
    grouped/aggregated so the rewrites compose with aggregation. Same SQL
    is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _BITSTRING_SQL)


_AGE_SQL = """
SELECT l_linestatus,
       CAST(max(extract(YEAR FROM age(l_shipdate::TIMESTAMP, o_orderdate::TIMESTAMP))) AS BIGINT) AS max_y,
       CAST(max(extract(MONTH FROM age(l_shipdate::TIMESTAMP, o_orderdate::TIMESTAMP))) AS BIGINT) AS max_m,
       CAST(max(extract(DAY FROM age(l_shipdate::TIMESTAMP, o_orderdate::TIMESTAMP))) AS BIGINT) AS max_d,
       CAST(min(extract(MONTH FROM age(o_orderdate::TIMESTAMP, l_shipdate::TIMESTAMP))) AS BIGINT) AS min_neg_m,
       CAST(min(extract(DAY FROM age(o_orderdate::TIMESTAMP, l_shipdate::TIMESTAMP))) AS BIGINT) AS min_neg_d,
       CAST(count(*) FILTER (WHERE extract(DAY FROM age(l_shipdate::TIMESTAMP, o_orderdate::TIMESTAMP)) >= 15) AS BIGINT) AS n_late_halfmonth
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey < 4000
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("dialect_age", oracle=_AGE_SQL)
def dialect_age(spark, sf_dir):
    """age() calendar intervals (round 13, VERDICT r12 missing #4;
    reference extension/core_functions/scalar/date/age.cpp — the Postgres
    fieldwise diff with borrows, measured: a negative day borrows the
    EARLIER timestamp's month length, components carry the sign). The
    VARCHAR repr was the documented blocker — Spark's CalendarInterval
    renders differently — so the graded surface is the FIELDS via
    extract(), which match exactly, over both orderings (negative
    components exercised by the order/ship swap). Same SQL is the
    oracle."""
    _views(spark, sf_dir, "lineitem", "orders")
    return sqlx.sql(spark, _AGE_SQL)


_FN_GAPS3_SQL = """
SELECT p_partkey,
       signbit(p_retailprice - 1200.0) AS sb,
       length_grapheme(translate(p_name, 'aeo', 'ạ̇éô')) AS lg,
       substring_grapheme(translate(p_name, 'aeo', 'ạ̇éô'), 3, 6) AS sg,
       substring_grapheme(p_name, 8) AS sg_tail,
       CAST(md5_number_lower(p_name) AS VARCHAR) AS ml,
       CAST(md5_number_upper(p_name) AS VARCHAR) AS mu
FROM part
WHERE p_partkey % 37 = 0
ORDER BY p_partkey
"""


@query("dialect_fn_gaps3", oracle=_FN_GAPS3_SQL)
def dialect_fn_gaps3(spark, sf_dir):
    """Round-13 gap batch closing three more documented absences:
    signbit (measured exactly x < 0 against this oracle — every -0.0
    spelling is false in DuckDB 1.0), the grapheme family (Java regex \\X
    matches extended grapheme clusters — flags and ZWJ emoji measured
    identical to utf8proc's segmentation, so length_grapheme /
    substring_grapheme are array ops over regexp_extract_all), and
    md5_number_lower/upper (little-endian uint64 of digest bytes 8..15 /
    0..7 via byte-pair-reversed conv, DECIMAL(20,0) holds the unsigned
    range; 128-bit md5_number itself raises — it exceeds DECIMAL(38,0)).
    Same SQL is the oracle."""
    _views(spark, sf_dir, "part")
    return sqlx.sql(spark, _FN_GAPS3_SQL)


_FN_GAPS4_SQL = """
SELECT p_partkey,
       CAST(divide(p_partkey, 7) AS DOUBLE) AS int_div,
       CAST(divide(p_retailprice, 7) AS DOUBLE) AS dec_div,
       bin(p_brand) AS brand_bits,
       to_binary(p_partkey % 19) AS small_bits,
       to_base(p_partkey % 500, 7, 7) AS base7,
       strip_accents(translate(p_name, 'aeo', 'àéô')) AS stripped,
       CAST(damerau_levenshtein(p_brand, p_type) AS BIGINT) AS dl,
       round(gamma(1.0 + (p_partkey % 5)), 6) AS g,
       round(lgamma(2.5 + (p_partkey % 3)), 6) AS lg,
       CAST((nextafter(CAST(p_partkey AS DOUBLE), 1e18) - CAST(p_partkey AS DOUBLE)) * 1e12 AS DOUBLE) AS na_ulp,
       right_grapheme(p_name, 4) AS rg,
       left_grapheme(p_name, 4) AS lgr,
       grade_up([p_retailprice, 1.0, p_retailprice - 500]) AS gu,
       array_select([p_partkey, p_partkey + 1], [2, 1, 0]) AS sel,
       array_where([p_partkey, p_partkey + 1, p_partkey + 2],
                   [true, p_partkey % 2 = 0, false]) AS aw,
       constant_or_null(42, nullif(p_partkey % 3, 0)) AS con,
       typeof(p_retailprice) AS ty,
       CAST(@(500 - p_partkey) AS BIGINT) AS ab,
       CAST(add(p_partkey) AS BIGINT) AS a1,
       CAST(subtract(p_partkey) AS BIGINT) AS s1,
       CAST(len([p_partkey, p_partkey]) AS BIGINT) AS list_len
FROM part WHERE p_partkey % 41 = 0
ORDER BY p_partkey
"""


@query(
    "dialect_fn_gaps4",
    oracle=_FN_GAPS4_SQL,
    cast_double=["int_div", "dec_div", "g", "lg", "na_ulp"],
    join_arrays=["gu", "sel", "aw"],
)
def dialect_fn_gaps4(spark, sf_dir):
    """Round-13 extended-sweep batch 1 (richer arg shapes probed over the
    whole duckdb_functions() registry): divide() is `//` — integer
    division for integral args, PLAIN division for fractional (typeof
    dispatch, both measured); bin/to_binary are per-BYTE bit strings for
    VARCHAR and 64-bit two's complement for every int width (Spark's
    to_binary is hex-decode — silent wrong answer); 3-arg to_base pads but
    never truncates; strip_accents (NFD mark removal, æß survive);
    unrestricted Damerau-Levenshtein; gamma/lgamma/nextafter (libm UDFs);
    the right_grapheme/left_grapheme pair; grade_up alias; array_select
    with out-of-range/0 indexes -> NULL; array_where zip semantics;
    constant_or_null; typeof with DuckDB type spellings; the @ abs prefix
    operator; 1-arg add/subtract; polymorphic len over a syntactic list.
    Same SQL is the oracle."""
    _views(spark, sf_dir, "part")
    return sqlx.sql(spark, _FN_GAPS4_SQL)


_STRPTIME_TZ_SQL = """
SELECT o_orderkey,
       strftime('%Y/%m', o_orderdate) AS rev_fmt,
       CAST(strptime(strftime(o_orderdate, '%m-%d'), '%m-%d') AS TIMESTAMP) AS noyear,
       CAST(try_strptime(strftime(o_orderdate, '%Y|%m'), ['%Y-%m', '%Y|%m']) AS TIMESTAMP) AS multi_fmt,
       CAST(try_strptime('nope', ['%Y-%m']) AS TIMESTAMP) AS nomatch,
       CAST(timezone_hour(o_orderdate::TIMESTAMP) AS BIGINT) AS tzh,
       CAST(timezone_minute(o_orderdate::TIMESTAMP) AS BIGINT) AS tzm,
       CAST(epoch(INTERVAL '1 month 2 days 3 hours') AS DOUBLE) AS ivl_epoch,
       CAST(year(INTERVAL '26 months') AS BIGINT) AS ivl_y,
       CAST(month(INTERVAL '26 months') AS BIGINT) AS ivl_m,
       CAST(day(INTERVAL '400 days') AS BIGINT) AS ivl_d,
       CAST(epoch_ms(INTERVAL '90 minutes') AS BIGINT) AS ivl_ms,
       list_transform(range(o_orderdate::TIMESTAMP, o_orderdate::TIMESTAMP + INTERVAL '3 days', INTERVAL '1 day'),
                      t -> CAST(epoch(t) AS BIGINT)) AS ts_range,
       list_transform(generate_series(o_orderdate::TIMESTAMP, o_orderdate::TIMESTAMP + INTERVAL '2 days', INTERVAL '1 day'),
                      t -> CAST(epoch(t) AS BIGINT)) AS ts_series
FROM orders WHERE o_orderkey % 193 = 0
ORDER BY o_orderkey
"""


@query(
    "dialect_strptime_tz",
    oracle=_STRPTIME_TZ_SQL,
    join_arrays=["ts_range", "ts_series"],
)
def dialect_strptime_tz(spark, sf_dir):
    """Round-13 extended-sweep batch 2 — temporal tail: strftime accepts
    BOTH argument orders (format-first measured identical); strptime with
    no year directive defaults to 1900 (C-library default) where Spark's
    to_timestamp uses 1970 — the missing-year case shifts back 70 years;
    try_strptime with a LIST of formats tries each in order (DuckDB types
    that overload TIMESTAMPTZ — the wall value is what's graded);
    timezone_hour/timezone_minute offset fields; date-part extraction and
    epoch over INTERVAL literals (30-day months) folded to constants at
    transpile time; timestamp-stepped scalar range (end-exclusive) /
    generate_series (end-inclusive) via Spark's native temporal sequence.
    Same SQL is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _STRPTIME_TZ_SQL)


_JSON_PATHS_SQL = """
SELECT p_partkey,
       json_extract(json_object('k 1', p_partkey, 'n', p_name), 'k 1') AS key_space,
       json_extract_string(json_object('k 1', p_partkey), 'k 1') AS key_space_str,
       json_extract(json_array(p_name, p_brand, p_type), 1) AS int_path,
       json_extract(json_object('a', p_partkey, 'b', p_name), ['a', '$.b']) AS multi,
       json_extract(json_array(p_brand, p_type), '/1') AS pointer,
       CAST(json_array_length(json_object('a', p_partkey)) AS BIGINT) AS len_obj,
       CAST(json_array_length(json_array(p_name, p_brand)) AS BIGINT) AS len_arr,
       json_object() AS empty_obj
FROM part WHERE p_partkey % 43 = 0
ORDER BY p_partkey
"""


@query(
    "dialect_json_paths",
    oracle=_JSON_PATHS_SQL,
    join_arrays=["multi"],
)
def dialect_json_paths(spark, sf_dir):
    """Round-13 extended-sweep batch 3 — JSON path forms (reference
    extension/json json_common.cpp): bare keys are valid paths even with
    spaces (bracket-quoted per target: $[\"k\"] for variant_get, $['k']
    for get_json_object, which rejects double quotes — both measured);
    INTEGER paths are 0-based array indexes; a LIST of paths returns a
    LIST of extracts; '/'-rooted JSON Pointers convert segment-wise;
    json_array_length is 0 for any non-array JSON value; zero-arg
    json_object() is '{}'. Same SQL is the oracle."""
    _views(spark, sf_dir, "part")
    return sqlx.sql(spark, _JSON_PATHS_SQL)


_BITOPS_SQL = """
SELECT o_orderpriority,
       max(((o_orderkey % 13)::INTEGER::BIT & (o_orderkey % 7)::INTEGER::BIT)::VARCHAR) AS anded,
       max(((o_orderkey % 13)::INTEGER::BIT | (o_orderkey % 5)::INTEGER::BIT)::VARCHAR) AS ored,
       max(xor((o_orderkey % 13)::INTEGER::BIT, (o_orderkey % 11)::INTEGER::BIT)::VARCHAR) AS xored,
       max((~((o_orderkey % 13)::INTEGER::BIT))::VARCHAR) AS notted,
       CAST(max(bit_length((o_orderkey % 13)::INTEGER::BIT)) AS BIGINT) AS bl,
       CAST(max(octet_length((o_orderkey % 9)::INTEGER::BIT)) AS BIGINT) AS ol
FROM orders WHERE o_orderkey < 3000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("dialect_bitops", oracle=_BITOPS_SQL)
def dialect_bitops(spark, sf_dir):
    """Round-13 bitwise operators over BIT (reference src/common/types/
    bit.cpp Bit::BitwiseAnd/Or/Xor/Not): per-digit ops over the
    digit-string representation, mismatched lengths raise ('Cannot XOR
    bit strings of different sizes'), ~ flips digits; bit_length counts
    DIGITS and octet_length is ceil(digits/8) for BIT operands (their
    VARCHAR/BLOB meanings stay Spark-native — gated syntactically on
    BIT-shaped operands: literals, ::BIT cast chains, set_bit/bitstring
    calls). Composes with the r13 int::BIT two's-complement rendering
    under aggregation. Same SQL is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _BITOPS_SQL)


_HOLISTIC2_SQL = """
SELECT l_linestatus,
       round(entropy(l_returnflag), 8) AS ent_flag,
       round(entropy(l_quantity), 8) AS ent_qty,
       CAST(mad(CAST(l_extendedprice AS DOUBLE)) AS DOUBLE) AS mad_price,
       CAST(median(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS med_dec,
       CAST(quantile_cont(CAST(l_extendedprice AS DECIMAL(12,2)), 0.25) AS DOUBLE) AS p25_dec,
       quantile_disc(l_returnflag, 0.5) AS med_mode,
       quantile_disc(l_shipdate, 0.4) AS d40,
       CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.6) FILTER (WHERE l_quantity > 10) AS BIGINT) AS q60_f,
       round(coalesce(corr(CAST(l_quantity AS DOUBLE), CAST(l_linenumber AS DOUBLE)), -99), 8) AS corr_ql,
       corr(CAST(l_quantity AS DOUBLE), CAST(l_quantity AS DOUBLE) * 0 + 1.0) AS corr_const,
       round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 4) AS slope,
       round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 4) AS icept,
       round(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 8) AS r2,
       array_to_string(map_keys(histogram(l_returnflag)), ',') AS hist_keys,
       array_to_string(list_transform(map_values(histogram(l_returnflag)), c -> CAST(c AS VARCHAR)), ',') AS hist_counts,
       array_to_string(list_transform(list(nullif(l_linenumber, 3) ORDER BY l_orderkey, l_linenumber),
                                      e -> coalesce(CAST(e AS VARCHAR), 'N')), ',') AS lines_with_nulls
FROM lineitem
WHERE l_orderkey < 1200
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("dialect_holistic_agg", oracle=_HOLISTIC2_SQL)
def dialect_holistic_agg(spark, sf_dir):
    """Round-13 aggregate-registry sweep batch (reference aggregate/
    holistic + nested + algebraic families, all semantics measured):
    entropy (log2 over value counts), mad (interpolating median of
    absolute deviations), DECIMAL median = DISCRETE lower-middle (every
    width) vs interpolating DOUBLE, DECIMAL quantile_cont truncated to
    source scale, type-preserving quantile_disc (VARCHAR and DATE groups
    — the old percentile_disc spelling was numeric-only) with ceil(q*n)
    ranks and FILTER folding, zero-variance corr/regr_* returning NULL
    instead of Spark's ANSI division error (pair-filtered regr_s*
    co-moments), histogram as a sorted-key MAP, and NULL-KEEPING ordered
    list() (collect_list drops nulls; struct-wrap preserves them). Same
    SQL is the oracle."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _HOLISTIC2_SQL)


_TIME_FAMILY_SQL = """
SELECT o_orderkey,
       make_time(CAST(o_orderkey % 24 AS INT), CAST(o_orderkey % 60 AS INT),
                 CAST(o_orderkey % 60 AS INT) + 0.25)::VARCHAR AS t_render,
       (make_time(CAST(o_orderkey % 24 AS INT), 30, 0) + INTERVAL '45 minutes')::VARCHAR AS t_plus,
       (make_time(CAST(o_orderkey % 24 AS INT), 10, 0) - INTERVAL '3 hours')::VARCHAR AS t_wrap,
       CAST(hour(make_time(CAST(o_orderkey % 24 AS INT), 0, 0)) AS BIGINT) AS t_hour,
       CAST(epoch_ms(make_time(0, CAST(o_orderkey % 60 AS INT), 30.5)) AS BIGINT) AS t_ms,
       CAST(epoch((o_orderdate::TIMESTAMP + INTERVAL '5 hours')::TIME) AS DOUBLE) AS tod_epoch,
       CAST(o_orderdate::DATE + make_time(6, 30, 0) AS VARCHAR) AS dt_combined,
       make_time(CAST(o_orderkey % 24 AS INT), 0, 0) < TIME '12:00:00' AS is_am
FROM orders WHERE o_orderkey % 211 = 0
ORDER BY o_orderkey
"""


@query("dialect_time_family", oracle=_TIME_FAMILY_SQL)
def dialect_time_family(spark, sf_dir):
    """Round-13 TIME type family (SURVEY §1.2 mapping: BIGINT
    micros-since-midnight, the reference's own storage — src/common/types/
    time.cpp; Spark 4.1 rejects its parsed TimeType, so the dialect layer
    carries the semantics): TIME literals and make_time (DECIMAL
    seconds), ± INTERVAL with the measured modulo-24h wrap, HH:MM:SS[.f]
    rendering with trailing fraction zeros trimmed, time-of-day
    extraction from timestamps via ::TIME, date-part/epoch functions over
    times, DATE + TIME -> TIMESTAMP, and BIGINT-riding comparisons. Same
    SQL is the oracle."""
    _views(spark, sf_dir, "orders")
    return sqlx.sql(spark, _TIME_FAMILY_SQL)


_SLICES_SQL = """
SELECT p_partkey,
       (concat(p_name, ''))[3:8] AS mid,
       (concat(p_name, ''))[-5:] AS tail5,
       (concat(p_name, ''))[:4] AS head4,
       (concat(p_name, ''))[2:-2] AS trimmed,
       (string_split(p_name, ' '))[2:] AS words_tail,
       (string_split(p_name, ' '))[:2] AS words_head,
       CAST(array_length(list_zip(string_split(p_name, ' '), string_split(p_type, ' '))) AS BIGINT) AS zipped_n
FROM part WHERE p_partkey % 47 = 0
ORDER BY p_partkey
"""


@query(
    "dialect_slices",
    oracle=_SLICES_SQL,
    join_arrays=["words_tail", "words_head"],
)
def dialect_slices(spark, sf_dir):
    """Round-13 slicing surface (reference src/function/scalar/list/
    array_slice.cpp — 1-based, both ends INCLUSIVE, negative indexes from
    the back, optional ends; VARCHAR takes the same syntax): string
    slices ride substring (Spark's slice() is array-only — the operand's
    string-ness is decided syntactically), list slices ride a let-bound
    size probe so negative/open ends resolve per row, and list_zip pads
    to the longer side like arrays_zip. Same SQL is the oracle."""
    _views(spark, sf_dir, "part")
    return sqlx.sql(spark, _SLICES_SQL)


_PQ_META_SQL = """
SELECT s.file_name, s.name, s.type, s.type_length, s.repetition_type,
       s.num_children, s.converted_type, s.scale, s.precision, s.logical_type,
       m.path_in_schema, m.type AS col_type, m.stats_min_value, m.stats_max_value,
       CAST(m.stats_null_count AS BIGINT) AS nulls, m.compression, m.encodings,
       CAST(m.num_values AS BIGINT) AS nvals,
       CAST(m.total_compressed_size AS BIGINT) AS csize,
       f.created_by, CAST(f.num_rows AS BIGINT) AS nrows,
       CAST(f.num_row_groups AS BIGINT) AS ngroups,
       CAST(f.format_version AS BIGINT) AS fver
FROM parquet_schema('/root/testdata/sf0.01/orders.parquet') s
JOIN parquet_metadata('/root/testdata/sf0.01/orders.parquet') m ON s.name = m.path_in_schema
JOIN parquet_file_metadata('/root/testdata/sf0.01/orders.parquet') f ON s.file_name = f.file_name
ORDER BY s.name
"""


@query("src_parquet_metadata", oracle=_PQ_META_SQL)
def src_parquet_metadata(spark, sf_dir):
    """Parquet footer-inspection TVFs (round 13; reference
    extension/parquet parquet_metadata.cpp): parquet_schema (full thrift
    TREE incl. reconstructed LIST group rows), parquet_metadata
    (row-group/column stats, FLOAT stats at float32 precision, ', '
    path join), parquet_file_metadata (thrift MAJOR format version) —
    all footer-only pyarrow reads, bounded by file count, joined in one
    statement to prove the FROM-position file-TVF binding composes. The
    grading path is pinned like glob_file_listing's (the driver's sf0.01
    tree); tests/test_sources pins the other fixtures and the nested-LIST
    schema walk. Same SQL is the oracle."""
    return sqlx.sql(spark, _PQ_META_SQL)


_HOLISTIC_APPROX_ORACLE_SQL = """
SELECT l_returnflag,
       abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
           <= 0.02 * quantile_cont(l_extendedprice, 0.5) AS med_ok,
       abs(approx_quantile(l_extendedprice, 0.25) - quantile_cont(l_extendedprice, 0.25))
           <= 0.02 * quantile_cont(l_extendedprice, 0.25) AS q25_ok,
       abs(approx_quantile(l_quantity, 0.9) - quantile_cont(l_quantity, 0.9)) <= 2.0 AS q90_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

_HOLISTIC_APPROX_SPARK_SQL = """
SELECT l_returnflag,
       abs(median(l_extendedprice) - percentile(l_extendedprice, 0.5))
           <= 0.02 * percentile(l_extendedprice, 0.5) AS med_ok,
       abs(quantile_cont(l_extendedprice, 0.25) - percentile(l_extendedprice, 0.25))
           <= 0.02 * percentile(l_extendedprice, 0.25) AS q25_ok,
       abs(quantile_disc(l_quantity, 0.9) - percentile(l_quantity, 0.9)) <= 2.0 AS q90_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("dialect_holistic_approx", oracle=_HOLISTIC_APPROX_ORACLE_SQL)
def dialect_holistic_approx(spark, sf_dir):
    """The percentile-family scale path (round 14, VERDICT r13 missing #1):
    SET holistic_exact = false routes median/quantile_cont/quantile_disc
    onto approx_percentile — a fixed-size sketch that partial-aggregates
    map-side instead of collecting every group (the analogue of DuckDB's
    t-digest approx_quantile, reference extension/core_functions/
    aggregate/holistic/functions.json). Sketch values are engine-specific,
    so — like agg_approx_sketches — EACH engine bands its own sketch
    against its own exact percentile and the boolean verdicts compare:
    a broken routing (or a broken sketch) flips a boolean on one side.
    The Spark text exercises the ROUTED spellings (median/quantile_cont/
    quantile_disc under the session knob); the oracle spells DuckDB's own
    approx_quantile against exact quantile_cont."""
    _views(spark, sf_dir, "lineitem")
    sqlx.sql(spark, "SET holistic_exact = false")
    try:
        # transpile happens eagerly inside sqlx.sql, so the routing
        # decision is baked into the returned (lazy) DataFrame
        return sqlx.sql(spark, _HOLISTIC_APPROX_SPARK_SQL)
    finally:
        sqlx.sql(spark, "SET holistic_exact = true")


# Exact-path CTE hoist (round 15, VERDICT r14 next #2): the shared-
# holistic hoist now applies PER SELECT BLOCK, so this corpus-stats shape
# — three quantile_disc items sharing one sorted-collect span INSIDE a
# CTE body, consumed by an outer SELECT — sorts each group once. The
# hoist is semantics-preserving, so this row grades EXACT (full value
# hash) against DuckDB, unlike the banded approx rows.
_HOLISTIC_CTE_SQL = """
WITH price_stats AS (
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS q25,
           quantile_disc(l_extendedprice, 0.5) AS q50,
           quantile_disc(l_extendedprice, 0.75) AS q75
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, q50 AS med_price, q75 - q25 AS iqr_price
FROM price_stats
ORDER BY l_returnflag
"""


@query("dialect_holistic_cte_hoist", oracle=_HOLISTIC_CTE_SQL)
def dialect_holistic_cte_hoist(spark, sf_dir):
    """Shared-holistic hoist under a CTE (round 15; reference
    src/function/aggregate/sorted_aggregate_function.cpp — DuckDB shares
    one sort per group natively). rewrite_shared_holistics recurses into
    every SELECT block, so the CTE body's three quantile_disc items over
    one column reuse a single hoisted array_sort per group; values are
    bit-identical to the unhoisted spelling (tests/test_sqlx pins that
    the transpile carries __hs helpers and matches DuckDB exactly)."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _HOLISTIC_CTE_SQL)


# mad sketch routing (round 15, VERDICT r14 next #3): banded-boolean
# grading like dialect_holistic_approx — each engine bands its own
# sketch against its own exact value, and the booleans compare.
_MAD_APPROX_ORACLE_SQL = """
SELECT l_returnflag,
       abs(approx_quantile(dev, 0.5) - mad_exact) <= 0.05 * mad_exact AS mad_ok,
       CAST(n AS BIGINT) AS n
FROM (
    SELECT l.l_returnflag, abs(l.l_extendedprice - m.med) AS dev, m.mad_exact, m.n
    FROM lineitem l
    JOIN (SELECT l_returnflag, median(l_extendedprice) AS med,
                 mad(l_extendedprice) AS mad_exact, count(*) AS n
          FROM lineitem GROUP BY l_returnflag) m
    USING (l_returnflag)
)
GROUP BY l_returnflag, mad_exact, n ORDER BY l_returnflag
"""

_MAD_APPROX_SPARK_SQL = """
SELECT l_returnflag, mad(l_extendedprice) AS mad_sketch, count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


@query("dialect_holistic_mad_approx", oracle=_MAD_APPROX_ORACLE_SQL)
def dialect_holistic_mad_approx(spark, sf_dir):
    """mad under SET holistic_exact = false (round 15, VERDICT r14
    missing #2): rewrite_mad_approx respells mad as two sketch passes —
    per-group approx-median joined back, then approx-median of absolute
    deviations — with NO per-group collect anywhere in the plan. Sketch
    values are engine-specific, so each engine bands its own sketch
    against its own exact mad (DuckDB: approx_quantile over the exact-
    median deviations vs exact mad); the boolean verdicts and the exact
    row counts compare. A broken routing (or a collect sneaking back in)
    flips a boolean or the count."""
    _views(spark, sf_dir, "lineitem")
    sqlx.sql(spark, "SET holistic_exact = false")
    try:
        df = sqlx.sql(spark, _MAD_APPROX_SPARK_SQL)
    finally:
        sqlx.sql(spark, "SET holistic_exact = true")
    # band Spark's sketch against Spark's own exact percentile pair
    df.createOrReplaceTempView("__mad_sketch")
    return spark.sql(
        """
        SELECT s.l_returnflag,
               abs(s.mad_sketch - e.mad_exact) <= 0.05 * e.mad_exact AS mad_ok,
               s.n
        FROM __mad_sketch s
        JOIN (
            SELECT l.l_returnflag,
                   percentile(abs(l.l_extendedprice - m.med), 0.5) AS mad_exact
            FROM lineitem l
            JOIN (SELECT l_returnflag, percentile(l_extendedprice, 0.5) AS med
                  FROM lineitem GROUP BY l_returnflag) m
            ON l.l_returnflag = m.l_returnflag
            GROUP BY l.l_returnflag
        ) e ON s.l_returnflag = e.l_returnflag
        ORDER BY s.l_returnflag
        """
    )


_TIMETZ_SQL = """
WITH ordering AS (
    SELECT tag, CAST(row_number() OVER (ORDER BY v, tag) AS BIGINT) AS rk
    FROM (VALUES ('wall2_minus8', TIMETZ '02:00:00-08'),
                 ('wall10_plus5', TIMETZ '10:00:00+05'),
                 ('wall10_plus2', TIMETZ '10:00:00+02'),
                 ('wall2frac_minus8', TIMETZ '02:00:00.25-08')) t(tag, v)
)
SELECT tag, rk,
       CAST(TIMETZ '11:30:00+05:30' AS VARCHAR) AS render_a,
       '10:00:00+05:00'::TIMETZ::VARCHAR AS render_canon,
       CAST(TIMETZ '10:00:00+05:30:30' AS VARCHAR) AS render_secoff,
       CAST(TIMETZ '23:00:00-02' AS TIME)::VARCHAR AS wall_extract,
       TIMETZ '10:00:00+05' = TIMETZ '10:00:00+05:00' AS eq_canon,
       TIMETZ '11:30:00+05:30' = TIMETZ '06:00:00+00' AS eq_not_instant,
       typeof(TIMETZ '10:00:00+05') AS ty
FROM ordering ORDER BY rk
"""


@query("dialect_timetz_minimal", oracle=_TIMETZ_SQL)
def dialect_timetz_minimal(spark, sf_dir):
    """TIMETZ (round 15, VERDICT r14 next #6 — closing the last open
    SURVEY §1.2 row with a minimal REAL mapping; reference src/common/
    types/time.cpp dtime_tz_t). DuckDB packs (wall micros, offset
    seconds) into one sortable word — order is wall ASC then offset
    DESC, equality needs both fields (NOT instant equality; both
    measured). The same packing rides a BIGINT carrier here:
    wall_us * 2^17 + (57599 - offset_s). This query pins the measured
    ordering (the -08 wall-2:00 row sorts FIRST despite being the
    latest instant; +05 before +02 on equal walls), canonical renders
    ('+05:00' -> '+05', second-level offsets kept, fraction trimmed),
    ::TIME wall extraction, the non-instant equality semantics, and
    typeof. TIMETZ never reaches parquet storage, so literals and casts
    are the entire input surface (documented subset: non-literal
    string -> TIMETZ casts raise)."""
    return sqlx.sql(spark, _TIMETZ_SQL)


_MACRO_REGISTRY_SQL = """
SELECT l_orderkey, l_linenumber,
       list_median([l_quantity, l_quantity + 5, l_quantity * 2]) AS med,
       round(list_mad([l_quantity, l_quantity + 5, l_quantity * 2]), 6) AS mad_v,
       list_mode([CAST(l_linenumber % 3 AS BIGINT), 1, 1]) AS mode_v,
       round(list_entropy([CAST(l_linenumber % 2 AS BIGINT), 1, 0]), 9) AS ent,
       CAST(list_count([l_quantity, NULL, 3]) AS BIGINT) AS cnt,
       list_first([NULL, l_quantity, 1]) AS fst,
       list_last([l_quantity, NULL]) AS lst,
       list_product([l_quantity, 2.0]) AS prod,
       CAST(list_bit_and([CAST(l_linenumber + 4 AS BIGINT), 6]) AS BIGINT) AS band,
       CAST(list_bit_xor([CAST(l_linenumber AS BIGINT), 5]) AS BIGINT) AS bxor,
       list_bool_and([l_quantity > 0, l_linenumber < 100]) AS ball,
       list_bool_or([l_quantity < 0, NULL]) AS bany,
       list_string_agg([l_linenumber, 7]) AS sagg,
       CAST(list_approx_count_distinct([l_linenumber, l_linenumber, 9]) AS BIGINT) AS acd,
       round(list_stddev_samp([l_quantity, l_quantity + 2, l_quantity + 7]), 9) AS sds,
       round(list_var_pop([l_quantity, l_quantity + 2, l_quantity + 7]), 9) AS vp,
       round(list_sem([l_quantity, l_quantity + 2, l_quantity + 7]), 9) AS semv,
       round(list_skewness([l_quantity, l_quantity + 2, l_quantity + 9]), 9) AS skw,
       round(list_kurtosis([l_quantity, l_quantity + 2, l_quantity + 9, l_quantity * 2]), 9) AS kurt,
       [CAST(l_linenumber AS BIGINT), 2] && [2, 9] AS hasany,
       [1, 2, 3] @> [3, CAST(l_linenumber % 3 AS BIGINT)] AS hasall,
       [CAST(l_linenumber % 2 AS BIGINT)] <@ [0, 1, 2] AS containedby,
       pg_typeof(l_orderkey) AS pt,
       format_pg_type('BIGINT', 'x') AS fpt,
       pg_size_pretty(CAST(l_orderkey * 7919 AS BIGINT)) AS psp,
       map_to_pg_oid('bigint') AS poid,
       has_table_privilege('t', 'select') AS htp,
       pg_table_is_visible(1) AS ptv,
       current_role() AS cr,
       json([l_linenumber, 2]) AS jl
FROM lineitem WHERE l_orderkey % 211 = 0
ORDER BY l_orderkey, l_linenumber
"""


@query("dialect_macro_registry", oracle=_MACRO_REGISTRY_SQL)
def dialect_macro_registry(spark, sf_dir):
    """Round-14 macro-registry sweep (VERDICT r13 next #7; reference: the
    PUBLIC macro bodies in duckdb_functions().macro_definition — 118
    macros, scripts/registry_sweep.py compares every one): the
    list_<agg> family (sorted-array medians/mad/mode/entropy, two-pass
    central-moment statistics, bit/bool folds, null-positional
    first/last), the list containment OPERATORS && / @> / <@ (macro
    bodies list_has_any/list_has_all with their exact NULL rules), the
    pg_catalog compat stubs (privilege/visibility constants, pg_typeof
    over DuckDB type spellings, format_pg_type/map_to_pg_oid CASE
    tables, format_bytes' truncated binary units), and json() over list
    operands. Same SQL is the oracle."""
    _views(spark, sf_dir, "lineitem")
    return sqlx.sql(spark, _MACRO_REGISTRY_SQL)
