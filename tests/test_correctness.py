"""Every registered workload query must match the DuckDB oracle at sf0.001.

This is a local mirror of the verification driver's CORRECTNESS gate
(row count + column set + order-insensitive values)."""

from __future__ import annotations

import pytest

from duckdb_parachute_spark.testkit.compare import compare_frames
from duckdb_parachute_spark.workload import load_all

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    qd = QUERIES[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver behaves the same)
        return
    oracle_pdf = oracle.sql(qd.oracle)
    res = compare_frames(name, spark_pdf, oracle_pdf)
    assert res.ok, str(res)
