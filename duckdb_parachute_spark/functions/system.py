"""System catalog table functions (SURVEY §2.1 — introspection surface).

Reference: src/function/table/system/ — ``duckdb_tables()``,
``duckdb_columns()``, ``duckdb_functions()`` etc. expose catalog metadata as
relations so users can query their schema with SQL.

Here the metadata comes from the bound driver tables' Spark schemas (and any
temp views the session holds). Catalog metadata is driver-sized by
definition — a few rows per table — so building these as local DataFrames is
the correct distribution story; the 100 TB concern never applies to the
catalog itself.

Type names are normalized to DuckDB's spelling (BIGINT/VARCHAR/FLOAT[]/…) so
introspection output is engine-portable — the same mapping used at the
oracle-comparison boundary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from duckdb_parachute_spark.catalog import TABLES, load_table

#: Spark simpleString -> DuckDB type-name mapping (scalar leaves).
_SCALAR = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "binary": "BLOB",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def duckdb_type_name(spark_type: str) -> str:
    """Map a Spark ``simpleString`` type to DuckDB's name for it.

    ``array<T>`` → ``T[]``; ``decimal(p,s)`` → ``DECIMAL(p,s)``;
    ``map``/``struct`` keep DuckDB's MAP/STRUCT spelling recursively for the
    common shapes the driver tables use."""
    t = spark_type.strip().lower()
    if t in _SCALAR:
        return _SCALAR[t]
    m = re.fullmatch(r"array<(.+)>", t)
    if m:
        return duckdb_type_name(m.group(1)) + "[]"
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"map<(.+?),(.+)>", t)
    if m:
        return f"MAP({duckdb_type_name(m.group(1))}, {duckdb_type_name(m.group(2))})"
    return t.upper()


def duckdb_columns(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> DataFrame:
    """duckdb_columns() analogue: one row per column of every bound table.

    Columns: database_name, schema_name, table_name, column_name,
    column_index (1-based, reference convention), data_type."""
    rows = []
    for t in tables or TABLES:
        for i, field in enumerate(load_table(spark, sf_dir, t).schema.fields, start=1):
            rows.append(
                ("memory", "main", t, field.name, i, duckdb_type_name(field.dataType.simpleString()))
            )
    return spark.createDataFrame(
        rows,
        "database_name string, schema_name string, table_name string, "
        "column_name string, column_index long, data_type string",
    )


def duckdb_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> DataFrame:
    """duckdb_tables() analogue: one row per bound table with column count."""
    rows = [
        ("memory", "main", t, False, len(load_table(spark, sf_dir, t).schema.fields))
        for t in (tables or TABLES)
    ]
    return spark.createDataFrame(
        rows,
        "database_name string, schema_name string, table_name string, "
        "temporary boolean, column_count long",
    )


def summarize_table(df: DataFrame) -> DataFrame:
    """SUMMARIZE <table> (reference src/function/table/summary.cpp /
    duckdb SUMMARIZE statement): one row per column with
    count / null_percentage / approx_unique / avg / std / min / max.
    Numeric-only stats are NULL for non-numeric columns, like the
    reference. One pass: all per-column aggregates go into a single
    projection (one job, no per-column scans)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType

    total = F.count(F.lit(1))
    aggs = []
    for f in df.schema.fields:
        c = f.name
        isnum = isinstance(f.dataType, NumericType)
        aggs += [
            F.count(c).alias(f"__cnt_{c}"),
            F.round(F.lit(100.0) * (total - F.count(c)) / total, 2).alias(f"__nul_{c}"),
            F.approx_count_distinct(c).alias(f"__apu_{c}"),
            (F.round(F.avg(c), 4) if isnum else F.lit(None).cast("double")).alias(f"__avg_{c}"),
            (F.round(F.stddev_samp(c), 4) if isnum else F.lit(None).cast("double")).alias(f"__std_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(f.name).alias("column_name"),
            F.lit(f.dataType.simpleString()).alias("column_type"),
            F.col(f"__cnt_{f.name}").alias("count"),
            F.col(f"__nul_{f.name}").alias("null_percentage"),
            F.col(f"__apu_{f.name}").alias("approx_unique"),
            F.col(f"__avg_{f.name}").alias("avg"),
            F.col(f"__std_{f.name}").alias("std"),
            F.col(f"__min_{f.name}").alias("min"),
            F.col(f"__max_{f.name}").alias("max"),
        )
        for f in df.schema.fields
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
