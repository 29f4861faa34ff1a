"""Property-based cross-engine checks (SURVEY §5d: type edges — overflow,
nulls, decimal scale) using hypothesis. Each example renders a VALUES row set
and compares Spark against DuckDB on the same SQL text.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DEC = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@pytest.fixture(scope="module")
def oracle():
    return duckdb.connect()


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(DEC, min_size=1, max_size=8))
def test_decimal_sum_exact(spark, oracle, values):
    """Exact DECIMAL(9,2) sums agree bit-for-bit in any order."""
    rows = ", ".join(f"(CAST({v} AS DECIMAL(9,2)))" for v in values)
    sql = f"SELECT CAST(sum(x) AS DECIMAL(19,2)) AS s FROM (VALUES {rows}) t(x)"
    assert spark.sql(sql).head()[0] == oracle.sql(sql).fetchone()[0]


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1) | st.none(), min_size=1, max_size=8))
def test_bigint_agg_with_nulls(spark, oracle, values):
    """sum/count/min/max over BIGINT with NULLs agree (NULL-skipping rules)."""
    rows = ", ".join(f"(CAST({'NULL' if v is None else v} AS BIGINT))" for v in values)
    sql = (
        f"SELECT CAST(sum(x) AS BIGINT) AS s, count(x) AS c, min(x) AS mn, max(x) AS mx "
        f"FROM (VALUES {rows}) t(x)"
    )
    assert tuple(spark.sql(sql).head()) == oracle.sql(sql).fetchone()


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.decimals(min_value=Decimal("0.01"), max_value=Decimal("9999.99"), places=2, allow_nan=False))
def test_decimal_mult_precision_rules(spark, oracle, v):
    """DECIMAL(12,2)*(4,2) precision math matches across engines after the
    shared cast discipline (the same rule the money queries rely on)."""
    sql = (
        f"SELECT CAST(CAST({v} AS DECIMAL(12,2)) * CAST(0.07 AS DECIMAL(4,2)) "
        f"AS DECIMAL(18,4)) AS r"
    )
    assert spark.sql(sql).head()[0] == oracle.sql(sql).fetchone()[0]
