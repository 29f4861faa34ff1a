"""Composite operators: reference capabilities Spark lacks natively (SURVEY §4
"Custom Spark work needed"), each built from declarative DataFrame primitives
so Catalyst still optimizes them.
"""

from duckdb_parachute_spark.operators.asof import asof_join
from duckdb_parachute_spark.operators.cte import materialized_cte
from duckdb_parachute_spark.operators.misc import (
    distinct_on,
    limit_percent,
    positional_join,
    qualify,
    sample_deterministic,
    top_n,
)
from duckdb_parachute_spark.operators.recursive import recursive_cte

__all__ = [
    "asof_join",
    "materialized_cte",
    "distinct_on",
    "qualify",
    "positional_join",
    "recursive_cte",
    "top_n",
    "limit_percent",
    "sample_deterministic",
]
