"""Every registered workload query must match the DuckDB oracle at sf0.001.

This is a local mirror of the verification driver's CORRECTNESS gate
(row count + column set + order-insensitive values).

Sharding (round 9, suite-hygiene): each query is marked with its FAMILY
(first name segment: ``family_tpch``, ``family_job``, ...) and with one of
four stable hash shards (``shard0``..``shard3``), so the sweep can split
across processes::

    pytest tests/test_correctness.py -m shard0   # ~¼ of the queries
    pytest tests/test_correctness.py -m family_tpcds

Shard assignment hashes the query NAME (md5, stable across runs and
machines — not Python's salted hash), so adding queries never reshuffles
existing ones between CI partitions except at the margin.
"""

from __future__ import annotations

import hashlib

import pytest

from duckdb_parachute_spark.testkit.compare import compare_frames
from duckdb_parachute_spark.workload import load_all

QUERIES = load_all()

N_SHARDS = 4


def _family(name: str) -> str:
    return name.split("_", 1)[0]


def _shard(name: str) -> int:
    return int(hashlib.md5(name.encode()).hexdigest(), 16) % N_SHARDS


_PARAMS = [
    pytest.param(
        n,
        marks=[
            getattr(pytest.mark, f"family_{_family(n)}"),
            getattr(pytest.mark, f"shard{_shard(n)}"),
        ],
    )
    for n in sorted(QUERIES)
]


@pytest.mark.parametrize("name", _PARAMS)
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    qd = QUERIES[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver behaves the same)
        return
    oracle_pdf = oracle.sql(qd.oracle)
    res = compare_frames(name, spark_pdf, oracle_pdf)
    assert res.ok, str(res)
