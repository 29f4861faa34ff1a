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


#: Widest fixed-dim unroll: beyond this the generated projection stops being
#: a codegen win (expression-tree build and janino compile costs grow
#: linearly while the per-row win is already captured at realistic embedding
#: widths).
MAX_UNROLL_DIM = 4096


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product; with a ``dim`` hint, rows of exactly that width take a
    CODEGEN'D unrolled sum instead of the interpreted higher-order fold.

    Round 17 (VERDICT r16 next #2): Catalyst higher-order functions
    (zip_with/aggregate) are CodegenFallback — every pair pays an
    interpreted O(dim) lambda walk plus a product-array allocation, which
    was the largest remaining warm cost in the suite (the per-PAIR dot of
    the semantic-dedup join). The unrolled spelling
    ``lit(0.0) + a[0]*b[0] + a[1]*b[1] + ...`` evaluates in generated Java.

    BIT-IDENTICAL by construction: same element products (x.cast(double) *
    y.cast(double)) added in the same left-to-right order with the same 0.0
    seed as the fold — float association is untouched, so oracle hashes
    cannot move. Rows whose width differs from ``dim`` (or null arrays: the
    size() guard is null, so CaseWhen falls through) keep the fold's exact
    null/padding semantics via the interpreted fallback."""
    if dim is None or dim <= 0 or dim > MAX_UNROLL_DIM:
        return _dots(a, b)
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return F.when((F.size(a) == dim) & (F.size(b) == dim), acc).otherwise(_dots(a, b))


def array_inner_product(a: Column, b: Column) -> Column:
    """Dot product (reference list_inner_product)."""
    return _dots(a, b)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def row_norm(a: Column, dim: int | None = None) -> Column:
    """L2 norm; with a ``dim`` hint the sum of squares unrolls to codegen
    exactly like :func:`dot_product` (same products, same fold order —
    bit-identical)."""
    if dim is None or dim <= 0 or dim > MAX_UNROLL_DIM:
        return _norm(a)
    acc = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i).cast("double")
        acc = acc + x * x
    return F.sqrt(F.when(F.size(a) == dim, acc).otherwise(
        F.aggregate(a, F.lit(0.0), lambda s, v: s + v.cast("double") * v.cast("double"))
    ))


def cosine_from_norms(
    v1: Column, v2: Column, n1: Column, n2: Column, dim: int | None = None
) -> Column:
    """Cosine of a pair whose per-row norms were hoisted below the join
    (round 16's norm hoist, now a single public helper — ADVICE r16: the
    dots/(n1*n2) spelling that the bit-identical-to-oracle claim depends on
    must live in ONE place, not be re-spelled per call site)."""
    return dot_product(v1, v2, dim) / (n1 * n2)


def evaluate_once(c: Column) -> Column:
    """Identity wrapper that marks ``c`` non-deterministic so the optimizer
    cannot substitute it into filters/join conditions (the JVM-side analogue
    of guide §4.4's ``udf.asNondeterministic()``).

    Why it exists (round 17, measured): a threshold filter over an
    expensive projected column — here the unrolled per-pair cosine — gets
    alias-substituted by PushDownPredicates INTO the join condition, where
    it is (a) evaluated through GeneratePredicate with no expression
    splitting (the 64-term chain stops being JIT-able) and (b) re-evaluated
    in the output projection. Wrapping the column in
    ``element_at(shuffle(array(c)), 1)`` — exactly ``c`` for a 1-element
    array, nulls included — keeps the filter ABOVE the projection, so the
    expensive expression evaluates ONCE per row in a split-friendly
    projection. Measured on the semantic-pair stage: 10.9 s (fold, pushed)
    → 3.3 s (unrolled behind this barrier) per 1.3M pairs single-task.

    Use ONLY on expensive expressions whose filter should not be pushed —
    non-determinism also blocks legitimate pushdown of other predicates
    (guide §4.4 trade-off)."""
    return F.element_at(F.shuffle(F.array(c)), F.lit(1))


def array_cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity (reference list_cosine_similarity)."""
    return _dots(a, b) / (_norm(a) * _norm(b))


def array_distance(a: Column, b: Column) -> Column:
    """Euclidean distance (reference list_distance)."""
    diff2 = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v))
