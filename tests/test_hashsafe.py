"""Hash-safe output boundary for the correctness gate.

The verification driver compares Spark vs DuckDB results by sorting raw
pandas cells and hashing their string representations. Types whose pandas
representation differs between the engines therefore fail the hash even when
values are identical:

- DECIMAL: Spark → decimal.Decimal('253942.00'); DuckDB .df() → float64
  253942.0 (str differs on trailing zeros / scale).
- ARRAY / MAP / STRUCT: numpy.ndarray cells crash pandas' sort outright.
- DATE: Spark → datetime.date; DuckDB → datetime64 midnight Timestamp.

Every registered query must end in a projection of representation-stable
types only; the registry's cast_double= / join_arrays= hooks (see
workload/__init__.py:_hashsafe_oracle) apply the same boundary cast to both
engines. This sweep pins that invariant for all current and future queries.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from duckdb_parachute_spark.workload import load_all

# timestamp is safe: both engines land in pandas as datetime64[us]
SAFE_TYPES = (
    T.StringType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
    T.TimestampType,
    T.TimestampNTZType,
)


@pytest.mark.parametrize("name", sorted(load_all()))
def test_output_schema_is_hash_safe(spark, sf_dir, name):
    qd = load_all()[name]
    df = qd.fn(spark, sf_dir)
    risky = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, SAFE_TYPES)
    ]
    assert not risky, (
        f"{name} outputs hash-unsafe column types {risky}; cast decimals to "
        "double / join arrays to strings at the output boundary "
        "(cast_double=/join_arrays= on the @query registration)"
    )


def test_hashsafe_oracle_wrapper_shape():
    from duckdb_parachute_spark.workload import _hashsafe_oracle

    out = _hashsafe_oracle("SELECT a, b FROM t", ("a",), ("b",))
    assert out.startswith("SELECT * REPLACE (CAST(a AS DOUBLE) AS a, array_to_string(b, ',') AS b)")
    assert "SELECT a, b FROM t" in out
