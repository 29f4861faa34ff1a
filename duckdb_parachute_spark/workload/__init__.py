"""Workload registry: every implemented operator/query from SURVEY.md §2.

Each entry pairs a Spark DataFrame builder ``fn(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string that DuckDB can execute over the
same parquet files (or ``None`` for ops that aren't SQL-expressible — the
verification driver then records a weaker rows-only check).

Determinism & hash-matching rules (FIXTURES.md §1 type-bridging note):
- money aggregates go through exact DECIMAL arithmetic with the *same* casts
  on both sides, so results are bit-identical;
- double aggregates (avg/stddev/corr/…) are rounded to a fixed scale chosen
  so the two engines' floating-point noise (≤ ~1e-8 relative) cannot flip the
  rounded digit;
- every computed column is aliased identically in Spark and SQL;
- ORDER-BY+LIMIT queries always carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for the DuckDB oracle, or None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a workload query. Decorated fn: (spark, sf_dir) -> DataFrame."""

    def deco(fn):
        QUERIES[name] = QueryDef(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every workload module (side effect: registry population)."""
    from duckdb_parachute_spark.workload import (  # noqa: F401
        aggregates,
        dedup,
        dialect,
        joins,
        jsonops,
        pipelines,
        scalarfns,
        setops,
        similarity,
        surface,
        textops,
        tpch,
        windows,
    )

    return QUERIES
