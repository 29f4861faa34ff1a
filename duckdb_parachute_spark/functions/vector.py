"""Vector similarity functions over array<float|double> columns.

Reference: list_cosine_similarity / list_distance / list_inner_product and
fixed-ARRAY variants (extension/core_functions/scalar/list/functions.json,
.../scalar/array/functions.json). These power the similarity-search extension
goal (SURVEY M5).

Implementation: pure Catalyst higher-order functions (zip_with + aggregate) —
whole-stage-codegen'd JVM execution, no Python boundary, linear in vector
width. Elements are cast to double first so float32 inputs accumulate in
double exactly like the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dots(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def array_inner_product(a: Column, b: Column) -> Column:
    """Dot product (reference list_inner_product)."""
    return _dots(a, b)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def array_cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity (reference list_cosine_similarity)."""
    return _dots(a, b) / (_norm(a) * _norm(b))


def array_distance(a: Column, b: Column) -> Column:
    """Euclidean distance (reference list_distance)."""
    diff2 = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v))
