"""Materialized multi-consumer CTEs.

The reference materializes a CTE once and lets every consumer read the
materialized collection (reference: src/execution/operator/set/physical_cte.cpp:112
— the working table is built by the first pipeline, then scanned by each
consumer). Spark has no automatic analogue: Catalyst's ReuseExchange only
fires when two subplans are *identical after optimization*, and per-consumer
column pruning routinely makes them differ (consumer A prunes columns
consumer B needs), silently forking one CTE into N full input scans.
At 100 TB an N-consumer fact-shuffle CTE then costs N fact scans + N
shuffles — the exact failure mode this module pins shut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialized_cte(df: DataFrame) -> DataFrame:
    """Persist a multi-consumer CTE so it is computed ONCE.

    `persist(MEMORY_AND_DISK_DESER)` is the Spark-native equivalent of the
    reference's materialized working table: the first consumer's job builds
    the blocks (spilling to disk if they exceed executor memory), every
    later consumer plans an InMemoryTableScan against them — one input scan
    and one shuffle regardless of consumer count, verified by plan test
    (tests/test_plans.py: single fact scan in tpcds_q24 / tpcds_q14).

    Scale posture: call this only on *aggregated / dimension-sized* CTEs
    (the reference does the same — its CTE working table lives in the
    buffer pool). Persisting a raw fact is an anti-pattern; nothing here
    stops you, but every registry use is post-aggregation. Cache entries
    are deduplicated by Spark's CacheManager on the canonicalized plan, so
    re-building the same query re-uses the existing entry instead of
    stacking new ones; blocks live until session stop (LRU-evicted, disk-
    spilled — bounded by the CTE's own size).
    """
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK_DESER)
