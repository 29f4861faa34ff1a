"""Catalog: bind the driver's parquet testdata (and user files) as DataFrames.

Reference analogue: DuckDB's catalog + replacement scans
(src/catalog/, src/include/duckdb/main/config.hpp:306) — tables resolve by
name to columnar storage. Here a table name resolves to a parquet file (or
directory) under a scale-factor dir; Spark's parquet source provides pushed
filters, column pruning and row-group stats skipping out of the box
(the reference implements the same ideas in
src/execution/operator/scan/physical_table_scan.cpp and
src/storage/table/column_data.cpp:386 zonemaps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_parachute_spark.session import apply_runtime_conf

#: Tables shipped by the verification driver (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Tables whose cardinality is FIXED regardless of scale factor (TPC-H spec:
#: nation = 25 rows, region = 5 rows). Always safe to broadcast.
FIXED_CARDINALITY = {"nation", "region"}

#: Default on-disk parquet footprint above which a join side loses its
#: broadcast hint. Compressed parquet expands roughly 3-5x as an in-memory
#: hash relation, so 64 MiB on disk ~ a few hundred MB per executor — beyond
#: that the hint would OOM a 100 TB-scale cluster and AQE's runtime broadcast
#: conversion (which sees *actual* post-filter sizes) is the right mechanism.
BROADCAST_CAP_BYTES = 64 << 20


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of a driver table (single file or directory of parts)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _dirs, files in os.walk(path)
            for f in files
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 1 << 60  # unknown source: assume huge, never hint


def maybe_broadcast(df: DataFrame, sf_dir: str, *tables: str) -> DataFrame:
    """Size-gated broadcast hint for join sides built from driver tables.

    The reference (DuckDB) always builds a hash table on the dimension side
    because it is single-node; on Spark an unconditional ``F.broadcast`` of a
    table that GROWS with scale factor (customer/part/supplier all scale
    linearly with sf) ships the whole table to every executor and OOMs at the
    100 TB target. Policy:

    - fixed-cardinality tables (nation/region) always keep the hint;
    - any other side keeps the hint only while the combined on-disk footprint
      of its contributing base ``tables`` is under the cap
      (``SPARK_GRAFT_BROADCAST_CAP`` env override, default 64 MiB);
    - over the cap the plain plan is returned: the join runs as a shuffle
      join, and AQE converts it back to broadcast at runtime iff the
      *post-filter* side is actually small — the scale-correct decision.
    """
    growing = [t for t in tables if t not in FIXED_CARDINALITY]
    if not growing:
        return F.broadcast(df)
    try:
        cap = int(os.environ.get("SPARK_GRAFT_BROADCAST_CAP", BROADCAST_CAP_BYTES))
    except (TypeError, ValueError):
        # Malformed / human-formatted override ("64m"): degrade to the
        # default rather than failing every query build.
        cap = BROADCAST_CAP_BYTES
    if sum(table_bytes(sf_dir, t) for t in growing) <= cap:
        return F.broadcast(df)
    return df


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) columns make vanilla readers throw
        # PARQUET_TYPE_ILLEGAL; retry with the nanos-as-long escape hatch
        # (normally pre-set by session.py, but the session may be external).
        apply_runtime_conf(spark)
        return spark.read.parquet(path)


def _ns_long_to_ntz(col):
    # Integer nanoseconds since epoch -> TIMESTAMP_NTZ, timezone-free by
    # construction (no session-zone dependency): epoch + micros.
    return F.expr(
        f"timestampadd(MICROSECOND, {col} div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes nanosecond timestamps to NTZ.

    Memoized per session: the DataFrame (an immutable logical plan) is cached
    on the session object, so repeated queries skip the parquet footer read
    and schema analysis that otherwise dominate driver-side build time."""
    cache = getattr(spark, "_parachute_table_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._parachute_table_cache = cache
        except Exception:  # noqa: BLE001 - exotic session proxy; just skip caching
            pass
    key = (os.path.abspath(sf_dir), name)
    if key in cache:
        return cache[key]
    apply_runtime_conf(spark)
    df = _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    for field, dtype in df.dtypes:
        if name == "events" and field == "ts" and dtype == "bigint":
            df = df.withColumn("ts", _ns_long_to_ntz("ts"))
    cache[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


class Catalog:
    """Name -> DataFrame resolver over a scale-factor directory.

    Mirrors the reference's schema-qualified catalog lookups plus its
    replacement-scan convenience (auto-binding client dataframes by name,
    reference: tools/pythonpkg/src/python_replacement_scan.cpp): `register`
    makes any DataFrame or pandas object addressable by name for SQL.
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def register(self, name: str, obj) -> DataFrame:
        if not isinstance(obj, DataFrame):
            obj = self.spark.createDataFrame(obj)
        self._cache[name] = obj
        return obj

    def register_temp_views(self, prefix: str = "") -> None:
        """Expose all tables as temp views for spark.sql() entry points."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(prefix + name)

    def sql(self, text: str) -> DataFrame:
        """SQL entry point over the registered tables (SURVEY §3.1)."""
        self.register_temp_views()
        return self.spark.sql(text)
