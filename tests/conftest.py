from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("PARACHUTE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from duckdb_parachute_spark import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_session(
        app_name="parachute-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 8,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    from duckdb_parachute_spark.testkit import OracleSession

    return OracleSession(sf_dir)
