"""ClickBench-shaped analytics over the `events` table.

The reference ships the full ClickBench suite (reference
benchmark/clickbench/q01.benchmark–q43.benchmark + answers/) over its `hits`
table. The driver testdata has no `hits`, so this family reproduces the
suite's distinct *query shapes* — ungrouped scans, distinct-count, top-K
heavy hitters, time-bucket histograms, multi-key grouping with HAVING,
string/JSON extraction, quantiles — over `events`, each with a DuckDB value
oracle.

Scale notes (the suite is why ClickBench exists): every query here is a
single scan of the fact table with map-side partial aggregation and at most
ONE shuffle on the group keys; top-K goes through TakeOrderedAndProject (no
global sort); value sums run in exact DECIMAL and cast to double only at the
output boundary (hash-safe, and no fp-order nondeterminism at any scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.workload import query


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


_DEC = "decimal(18,2)"


@query(
    "cb_scan_aggregates",
    cast_double=["sum_value"],
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(value) AS BIGINT) AS n_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value,
           round(avg(value), 6) AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events
    """,
)
def cb_scan_aggregates(spark, sf_dir):
    """ClickBench q01-q03 shape: ungrouped full-scan aggregates — partial
    aggregation reduces every partition to one row before the single-row
    exchange; the scan reads only `value` (column pruning)."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("n_value"),
        F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@query(
    "cb_distinct_entities",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS users,
           CAST(count(DISTINCT event_type) AS BIGINT) AS types,
           CAST(count(DISTINCT user_id || '#' || event_type) AS BIGINT) AS user_type_pairs
    FROM events
    """,
)
def cb_distinct_entities(spark, sf_dir):
    """ClickBench q04-q05 shape: exact distinct counts (Spark plans Expand +
    two-phase aggregate; the approx variant for 100 TB is agg_approx_sketches)."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct("event_type").alias("types"),
        F.countDistinct(F.concat_ws("#", "user_id", "event_type")).alias("user_type_pairs"),
    )


@query(
    "cb_minmax_time_range",
    oracle="""
    SELECT min(ts) AS first_ts, max(ts) AS last_ts,
           CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS span_days
    FROM events
    """,
)
def cb_minmax_time_range(spark, sf_dir):
    """ClickBench q06 shape: time-range scan (min/max prunes via parquet
    row-group stats — at 100 TB this touches only footers + one row group
    per file boundary)."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date"))
        .cast("bigint")
        .alias("span_days"),
    )


@query(
    "cb_top_event_types",
    cast_double=["total_value"],
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
    FROM events GROUP BY event_type ORDER BY n DESC, event_type
    """,
)
def cb_top_event_types(spark, sf_dir):
    """ClickBench q08 shape: low-cardinality group + ORDER BY count —
    partial-agg collapses to |types| rows per partition before the exchange."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("total_value"),
        )
        .orderBy(F.desc("n"), "event_type")
    )


@query(
    "cb_heavy_hitter_users",
    cast_double=["total_value"],
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 10
    """,
)
def cb_heavy_hitter_users(spark, sf_dir):
    """ClickBench q09/q13 shape (top-K heavy hitters): group on the entity
    key then TakeOrderedAndProject — the K-row heap replaces a global sort;
    `user_id` ties broken deterministically."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("total_value"),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@query(
    "cb_hourly_histogram",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE event_type IN ('click', 'view')
    GROUP BY 1 ORDER BY 1
    """,
)
def cb_hourly_histogram(spark, sf_dir):
    """ClickBench time-series shape: filtered scan + hour-truncated histogram.
    The event_type filter is pushed to the parquet scan; bucket count is
    bounded (hours), so the exchange is tiny regardless of input size."""
    ev = _ev(spark, sf_dir).where(F.col("event_type").isin("click", "view"))
    return (
        ev.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour_bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("hour_bucket")
    )


@query(
    "cb_group_having_pairs",
    oracle="""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id, event_type
    HAVING count(*) >= 20
    ORDER BY n DESC, user_id, event_type
    """,
)
def cb_group_having_pairs(spark, sf_dir):
    """ClickBench q32 shape: two-key grouping + HAVING — one shuffle on the
    composite key; HAVING filters post-aggregate (tiny)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 20)
        .orderBy(F.desc("n"), "user_id", "event_type")
    )


@query(
    "cb_json_prop_buckets",
    cast_double=["total_value"],
    oracle="""
    SELECT CAST(CAST(props ->> 'k' AS BIGINT) // 10 AS BIGINT) AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
    FROM events WHERE event_type = 'click'
    GROUP BY 1 ORDER BY 1
    """,
)
def cb_json_prop_buckets(spark, sf_dir):
    """ClickBench URL/string-extraction shape, JSON flavor: extract a prop,
    bucket it, aggregate — extraction is a JVM-side expression in the same
    stage as the scan (no UDF, no extra pass)."""
    ev = _ev(spark, sf_dir).where(F.col("event_type") == "click")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k / 10).cast("bigint").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("total_value"),
        )
        .orderBy("k_bucket")
    )


@query(
    "cb_value_quantiles_by_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.90), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def cb_value_quantiles_by_type(spark, sf_dir):
    """ClickBench q28 shape: exact quantiles per group (Spark `percentile`
    = DuckDB quantile_cont, linear interpolation)."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "cb_daily_active_users",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau,
           CAST(count(*) AS BIGINT) AS events
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def cb_daily_active_users(spark, sf_dir):
    """Engagement-report shape (ClickBench date-grouped distinct): per-day
    distinct users — distinct-within-group via two-phase aggregate; day
    cardinality stays bounded as data grows."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("events"),
        )
        .orderBy("day")
    )
