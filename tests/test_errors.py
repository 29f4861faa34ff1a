"""Error-class parity (SURVEY 'hard parts': assert on error *class* only,
never message text): ANSI mode must make Spark error where the reference
errors — overflow-checked arithmetic, bad casts, division by zero semantics.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.errors import ArithmeticException, NumberFormatException


def _duck_fails(sql: str) -> bool:
    con = duckdb.connect()
    try:
        con.sql(sql).fetchall()
        return False
    except Exception:
        return True


def test_int_overflow_errors_both(spark):
    # reference: overflow-checked add (src/common/operator/add.cpp) errors;
    # Spark ANSI mode matches.
    assert _duck_fails("SELECT CAST(127 AS TINYINT) + CAST(1 AS TINYINT)")
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT CAST(127 AS TINYINT) + CAST(1 AS TINYINT)").collect()


def test_bad_numeric_cast_errors_both(spark):
    assert _duck_fails("SELECT CAST('abc' AS INTEGER)")
    with pytest.raises(NumberFormatException):
        spark.sql("SELECT CAST('abc' AS INTEGER)").collect()


def test_narrowing_cast_overflow_errors_both(spark):
    assert _duck_fails("SELECT CAST(100000 AS SMALLINT)")
    with pytest.raises(Exception) as ei:
        spark.sql("SELECT CAST(100000 AS SMALLINT)").collect()
    assert "CAST_OVERFLOW" in str(ei.value) or "overflow" in str(ei.value).lower()


def test_division_by_zero_divergence_pinned(spark):
    # Genuine dialect divergence: DuckDB yields NULL for x/0 (its docs call
    # this out as non-standard-friendly), Spark ANSI raises DIVIDE_BY_ZERO.
    # The parity path for DuckDB-compatible pipelines is try_divide.
    con = duckdb.connect()
    assert con.sql("SELECT 1 / 0").fetchone()[0] is None
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT 1 / 0").collect()
    assert spark.sql("SELECT try_divide(1, 0)").head()[0] is None


def test_try_variants_return_null_both(spark):
    con = duckdb.connect()
    assert con.sql("SELECT TRY_CAST('abc' AS INTEGER)").fetchone()[0] is None
    assert spark.sql("SELECT TRY_CAST('abc' AS INTEGER)").head()[0] is None
    assert spark.sql("SELECT try_divide(1, 0)").head()[0] is None
