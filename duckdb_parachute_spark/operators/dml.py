"""DML as rewrite over immutable tables (SURVEY §2.1 v1 posture).

Reference: physical_insert.cpp / physical_delete.cpp / physical_update.cpp
mutate base tables in place; upsert semantics in test/sql/upsert/. Spark's
storage model (immutable files; ACID via table formats) maps DML to
read→transform→rewrite: DELETE = anti-filter, UPDATE = conditional
projection, INSERT = union, upsert/MERGE = key anti-join + union. On a real
deployment these become Delta/Iceberg MERGE INTO; the logical rewrites below
are the engine-level semantics, exercised against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_where(df: DataFrame, cond: Column) -> DataFrame:
    """DELETE WHERE cond → keep the complement (NULL-safe: rows where cond
    is NULL are kept, matching SQL DELETE semantics)."""
    return df.where(~F.coalesce(cond, F.lit(False)))


def update_set(df: DataFrame, cond: Column, assignments: dict[str, Column]) -> DataFrame:
    """UPDATE SET col=expr WHERE cond → conditional projection.

    All RHS expressions are evaluated against the pre-update row in one
    projection (SQL UPDATE is all-at-once: SET a=b, b=a swaps), matching the
    reference's physical_update.cpp which binds every expression before any
    column is written.
    """
    hit = F.coalesce(cond, F.lit(False))
    return df.select(
        *[
            (F.when(hit, assignments[c]).otherwise(F.col(c)) if c in assignments else F.col(c)).alias(c)
            for c in df.columns
        ]
    )


def insert_into(df: DataFrame, rows: DataFrame) -> DataFrame:
    """INSERT → union by name (schema-aligned)."""
    return df.unionByName(rows)


def upsert_on_key(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """INSERT ... ON CONFLICT (key) DO UPDATE (reference test/sql/upsert/):
    source rows win on key conflicts, non-conflicting target rows survive.
    One anti-join shuffle + union — the MERGE INTO shape."""
    keep = target.join(source.select(key), key, "left_anti")
    return keep.unionByName(source)


def check_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """PRIMARY KEY / UNIQUE constraint as an assertion job (SURVEY §1: the
    reference enforces these through its ART index on insert,
    src/execution/index/art/art.cpp — a distributed engine instead validates
    by aggregation over the declared key). Returns the VIOLATING key tuples
    with their multiplicities (empty = constraint holds); one hash shuffle
    on the key, map-side partial counts."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .where(F.col("n_dup") > 1)
    )


def check_foreign_key(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """FOREIGN KEY constraint as an assertion job: child keys with no parent
    (left-anti join; the parent key set broadcasts when dimension-sized).
    Returns violating child keys with occurrence counts (empty = holds).
    NULL child keys are not violations (SQL FK semantics: NULL matches)."""
    keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return (
        child.where(F.col(child_key).isNotNull())
        .join(keys, F.col(child_key) == F.col("__pk"), "left_anti")
        .groupBy(F.col(child_key))
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
