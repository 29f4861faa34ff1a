"""SQL macros: CREATE-MACRO-style scalar and table functions (SURVEY §2.11).

Reference: DuckDB's macro surface — scalar macros
(src/function/scalar_macro_function.cpp) textually expand an expression with
parameter substitution at bind time; table macros
(src/function/table_macro_function.cpp) do the same for a full SELECT and are
invoked in FROM position.

Spark has the same two surfaces natively since 3.4/3.5 as *SQL UDFs*:
``CREATE [OR REPLACE] TEMPORARY FUNCTION f(x T) RETURNS T RETURN <expr>`` and
``... RETURNS TABLE (cols) RETURN <query>``. Like DuckDB macros they are
expanded into the calling plan during analysis (no black-box function call at
runtime — Catalyst sees through the body, so pushdown/codegen still apply),
which is exactly the macro contract: convenience naming with zero execution
cost.

This module wraps the DDL with DuckDB-macro-flavoured helpers so a reference
user can port ``CREATE MACRO`` scripts mechanically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_scalar_macro(
    spark: SparkSession, name: str, params: str, returns: str, body: str
) -> None:
    """Register a scalar SQL macro.

    ``params`` is the typed parameter list (``"p DOUBLE, d DOUBLE"``) —
    DuckDB macros are untyped, Spark SQL UDFs require declared types;
    ``body`` is the defining SQL expression with parameters referenced by
    name, exactly as in ``CREATE MACRO name(params) AS body``.
    """
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
        f"RETURNS {returns} RETURN {body}"
    )


def create_table_macro(
    spark: SparkSession, name: str, params: str, returns_table: str, body: str
) -> None:
    """Register a table SQL macro (DuckDB ``CREATE MACRO name(...) AS TABLE
    <query>``; invoked in FROM position as ``FROM name(args)``).

    ``returns_table`` declares the output schema (``"k BIGINT, v STRING"``) —
    required by Spark, inferred by DuckDB."""
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
        f"RETURNS TABLE ({returns_table}) RETURN {body}"
    )


def drop_macro(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")


def call_table_macro(spark: SparkSession, name: str, *args) -> DataFrame:
    """FROM-position invocation with literal arguments."""
    rendered = ", ".join(_sql_literal(a) for a in args)
    return spark.sql(f"SELECT * FROM {name}({rendered})")


def _sql_literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    raise TypeError(f"unsupported macro argument type: {type(v).__name__}")
