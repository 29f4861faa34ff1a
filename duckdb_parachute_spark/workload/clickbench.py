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
    SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS span_days
    FROM events
    """,
)
def cb_minmax_time_range(spark, sf_dir):
    """ClickBench q06 shape: time-range scan (min/max prunes via parquet
    row-group stats — at 100 TB this touches only footers + one row group
    per file boundary). Timestamps render at second precision: the engines'
    parquet nanos handling differs below that (same rule as
    cb_wide_row_time_topn)."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
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


@query(
    "cb_like_filter_stats",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS c, min(props) AS first_prop
    FROM events
    WHERE props LIKE '%"k": 1%' AND event_type <> 'error'
    GROUP BY event_type
    ORDER BY c DESC, event_type
    LIMIT 10
    """,
)
def cb_like_filter_stats(spark, sf_dir):
    """ClickBench q20/q21 shape (benchmark/clickbench/queries/q20.sql,
    q21.sql: URL LIKE '%google%' + MIN/COUNT per phrase): a contains-LIKE
    predicate that cannot prune row groups, evaluated in the scan stage, then
    a low-cardinality group with min-string and count."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("props").like('%"k": 1%') & (F.col("event_type") != "error"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.min("props").alias("first_prop"))
        .orderBy(F.desc("c"), "event_type")
        .limit(10)
    )


@query(
    "cb_wide_sum_battery",
    oracle="""
    SELECT """
    + ", ".join(f"CAST(sum(event_id + {k}) AS BIGINT) AS s{k}" for k in range(30))
    + """
    FROM events
    """,
)
def cb_wide_sum_battery(spark, sf_dir):
    """ClickBench q30 shape (queries/q30.sql: 90 SUM(ResolutionWidth + k)
    columns): a very wide ungrouped aggregate — one scan, 30 parallel
    accumulators, all in a single whole-stage-codegen pass. Integer sums so
    both engines are exact."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        *[F.sum(F.col("event_id") + k).cast("bigint").alias(f"s{k}") for k in range(30)]
    )


@query(
    "cb_pair_count_topk",
    oracle="""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY user_id, event_type
    ORDER BY c DESC, user_id, event_type
    LIMIT 10
    """,
)
def cb_pair_count_topk(spark, sf_dir):
    """ClickBench q16/q17 shape (queries/q16.sql, q17.sql: GROUP BY UserID,
    SearchPhrase ORDER BY COUNT(*) DESC LIMIT 10): high-cardinality composite
    group + top-k heap, the partial-agg + TakeOrderedAndProject plan."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "user_id", "event_type")
        .limit(10)
    )


@query(
    "cb_point_lookup",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE event_id = 4242
    """,
)
def cb_point_lookup(spark, sf_dir):
    """ClickBench q18 shape (queries/q18.sql: WHERE UserID = <const>): a
    point predicate pushed to the parquet reader — row-group stats skip
    everything outside the matching range (the reference's zonemap path,
    src/storage/table/column_data.cpp:386)."""
    ev = _ev(spark, sf_dir)
    return ev.where(F.col("event_id") == 4242).select("event_id", "user_id", "event_type")


@query(
    "cb_string_sort_limit",
    oracle="""
    SELECT DISTINCT props FROM events WHERE props <> ''
    ORDER BY props LIMIT 10
    """,
)
def cb_string_sort_limit(spark, sf_dir):
    """ClickBench q22 shape (queries/q22.sql: SELECT SearchPhrase ... ORDER BY
    SearchPhrase LIMIT 10): distinct strings + lexicographic top-k."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("props") != "")
        .select("props")
        .distinct()
        .orderBy("props")
        .limit(10)
    )


@query(
    "cb_having_avg_len",
    oracle="""
    SELECT event_type,
           CAST(sum(length(props)) AS DOUBLE) / count(*) AS avg_len,
           CAST(count(*) AS BIGINT) AS c
    FROM events WHERE props <> ''
    GROUP BY event_type
    HAVING count(*) > 50
    ORDER BY avg_len DESC, event_type
    LIMIT 25
    """,
)
def cb_having_avg_len(spark, sf_dir):
    """ClickBench q28 shape (queries/q28.sql: AVG(STRLEN(URL)) ... HAVING
    COUNT(*) > 100000): aggregate-filtered groups with an average string
    length — computed as exact int-sum / count in double so both engines
    round identically."""
    ev = _ev(spark, sf_dir).where(F.col("props") != "")
    return (
        ev.groupBy("event_type")
        .agg(
            (F.sum(F.length("props")).cast("double") / F.count(F.lit(1))).alias("avg_len"),
            F.count(F.lit(1)).alias("c"),
        )
        .where(F.col("c") > 50)
        .orderBy(F.desc("avg_len"), "event_type")
        .limit(25)
    )


@query(
    "cb_distinct_users_per_type",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events WHERE props <> ''
    GROUP BY event_type
    ORDER BY u DESC, event_type
    LIMIT 10
    """,
)
def cb_distinct_users_per_type(spark, sf_dir):
    """ClickBench q12/q14 shape (queries/q12.sql, q14.sql: COUNT(DISTINCT
    UserID) per phrase): distinct-count per group — Spark expands to a
    two-level aggregate (distinct on (type,user) then count), the same
    de-dup-then-count the reference plans."""
    ev = _ev(spark, sf_dir).where(F.col("props") != "")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("u"))
        .orderBy(F.desc("u"), "event_type")
        .limit(10)
    )


@query(
    "cb_date_window_offset",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS pv
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-25 00:00:00'
      AND event_type = 'view'
    GROUP BY 1
    ORDER BY pv DESC, day
    LIMIT 10 OFFSET 5
    """,
)
def cb_date_window_offset(spark, sf_dir):
    """ClickBench q39 shape (queries/q39.sql: date-ranged pageview counts
    with LIMIT ... OFFSET): pushed time-range + type filters, daily rollup,
    ordered page starting at an offset."""
    ev = _ev(spark, sf_dir).where(
        (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-25 00:00:00").cast("timestamp_ntz"))
        & (F.col("event_type") == "view")
    )
    grouped = (
        ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("pv"))
        .orderBy(F.desc("pv"), "day")
    )
    return grouped.offset(5).limit(10)


@query(
    "cb_multi_agg_pairs",
    oracle="""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(sum(event_id) AS DOUBLE) / count(*) AS avg_eid
    FROM events
    GROUP BY user_id, event_type
    ORDER BY c DESC, user_id, event_type
    LIMIT 10
    """,
)
def cb_multi_agg_pairs(spark, sf_dir):
    """ClickBench q33 shape (queries/q33.sql: WatchID, ClientIP groups with
    COUNT / SUM(IsRefresh) / AVG(ResolutionWidth)): composite-key group with
    mixed count/conditional-sum/average — averages as exact-sum/count."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).cast("bigint").alias("n_big"),
            (F.sum("event_id").cast("double") / F.count(F.lit(1))).alias("avg_eid"),
        )
        .orderBy(F.desc("c"), "user_id", "event_type")
        .limit(10)
    )


@query(
    "cb_regex_key_extract",
    oracle="""
    SELECT regexp_extract(props, '"k": (\\d+)', 1) AS k_str, CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE regexp_matches(props, '"k": \\d+')
    GROUP BY 1
    ORDER BY n DESC, k_str
    LIMIT 15
    """,
)
def cb_regex_key_extract(spark, sf_dir):
    """ClickBench REGEXP shape (queries/q28.sql uses REGEXP_REPLACE over
    Referer): regex match + capture-group extraction feeding a group-count —
    both engines run the same RE2-class pattern in the scan stage."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("props").rlike('"k": \\d+'))
        .groupBy(F.regexp_extract("props", '"k": (\\d+)', 1).alias("k_str"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "k_str")
        .limit(15)
    )


@query(
    "cb_not_like_multi_agg",
    oracle="""
    SELECT event_type, min(props) AS min_props, CAST(count(*) AS BIGINT) AS c,
           CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events
    WHERE props LIKE '%"k"%' AND props NOT LIKE '%"k": 9%' AND event_type <> ''
    GROUP BY event_type
    ORDER BY c DESC, event_type
    LIMIT 10
    """,
)
def cb_not_like_multi_agg(spark, sf_dir):
    """ClickBench q23 shape (queries/q23.sql: Title LIKE + URL NOT LIKE +
    MIN/COUNT/COUNT DISTINCT per phrase): positive and negated contains-LIKE
    on the same scan feeding a multi-aggregate group."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(
            F.col("props").like('%"k"%')
            & ~F.col("props").like('%"k": 9%')
            & (F.col("event_type") != "")
        )
        .groupBy("event_type")
        .agg(
            F.min("props").alias("min_props"),
            F.count(F.lit(1)).alias("c"),
            F.count_distinct("user_id").alias("u"),
        )
        .orderBy(F.desc("c"), "event_type")
        .limit(10)
    )


@query(
    "cb_wide_row_time_topn",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS t, user_id, event_type,
           round(value, 4) AS value, props
    FROM events
    WHERE props LIKE '%"k": 4%'
    ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S'), event_id
    LIMIT 10
    """,
)
def cb_wide_row_time_topn(spark, sf_dir):
    """ClickBench q24 shape (queries/q24.sql: SELECT * WHERE URL LIKE ...
    ORDER BY EventTime LIMIT 10): full-width rows through a contains filter
    and a time-ordered TopN — TakeOrderedAndProject on every column, the
    row-reconstruction stress test. ts rendered at second precision (the
    engines' parquet nanos handling differs below that)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("props").like('%"k": 4%'))
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
            "props",
        )
        .orderBy(F.col("t"), "event_id")
        .limit(10)
    )


@query(
    "cb_projection_two_orders",
    oracle="""
    SELECT * FROM (
        SELECT 'by_time' AS ord, event_type, event_id FROM (
            SELECT event_type, event_id FROM events WHERE event_type <> ''
            ORDER BY ts, event_id LIMIT 5
        )
        UNION ALL
        SELECT 'by_value' AS ord, event_type, event_id FROM (
            SELECT event_type, event_id FROM events WHERE event_type <> ''
            ORDER BY event_type, event_id LIMIT 5
        )
    ) u
    ORDER BY ord, event_id
    """,
)
def cb_projection_two_orders(spark, sf_dir):
    """ClickBench q25+q26 shape (queries/q25.sql, q26.sql: the same narrow
    projection under a time ordering vs a lexicographic ordering): two TopN
    plans over one scan, unioned — Catalyst reuses the exchange."""
    ev = _ev(spark, sf_dir).where(F.col("event_type") != "")
    by_time = (
        ev.orderBy("ts", "event_id")
        .limit(5)
        .select(F.lit("by_time").alias("ord"), "event_type", "event_id")
    )
    by_val = (
        ev.orderBy("event_type", "event_id")
        .limit(5)
        .select(F.lit("by_value").alias("ord"), "event_type", "event_id")
    )
    return by_time.unionAll(by_val).orderBy("ord", "event_id")


@query(
    "cb_avg_len_having",
    cast_double=["l"],
    oracle="""
    SELECT user_id % 50 AS grp,
           CAST(sum(length(props)) AS DOUBLE) / count(*) AS l,
           CAST(count(*) AS BIGINT) AS c
    FROM events WHERE props <> ''
    GROUP BY user_id % 50
    HAVING count(*) > 20
    ORDER BY l DESC, grp
    LIMIT 25
    """,
)
def cb_avg_len_having(spark, sf_dir):
    """ClickBench q28 shape (queries/q28.sql: AVG(STRLEN(URL)) per counter
    HAVING COUNT > N): average string length per bucketed key with a HAVING
    gate — avg spelled as exact integer length-sum / count so the double
    quotient is engine-identical."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("props") != "")
        .groupBy((F.col("user_id") % 50).alias("grp"))
        .agg(
            (F.sum(F.length("props")).cast("double") / F.count(F.lit(1))).alias("l"),
            F.count(F.lit(1)).alias("c"),
        )
        .where(F.col("c") > 20)
        .orderBy(F.desc("l"), "grp")
        .limit(25)
    )


@query(
    "cb_regex_replace_domain",
    cast_double=["l"],
    oracle="""
    SELECT regexp_replace(props, '[0-9]+', '#', 'g') AS k,
           CAST(sum(length(props)) AS DOUBLE) / count(*) AS l,
           CAST(count(*) AS BIGINT) AS c,
           min(props) AS m
    FROM events WHERE props <> ''
    GROUP BY k
    HAVING count(*) > 10
    ORDER BY l DESC, k
    LIMIT 25
    """,
)
def cb_regex_replace_domain(spark, sf_dir):
    """ClickBench q29 shape (queries/q29.sql: REGEXP_REPLACE(Referer,
    domain-pattern) + AVG(STRLEN)/COUNT/MIN with HAVING): regex
    normalization as the GROUP key over the full scan — the regex-heavy
    tail of the suite (digit runs -> '#' stands in for the domain
    extraction; Spark's regexp_replace is global by default, DuckDB takes
    the 'g' flag)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("props") != "")
        .groupBy(F.regexp_replace("props", "[0-9]+", "#").alias("k"))
        .agg(
            (F.sum(F.length("props")).cast("double") / F.count(F.lit(1))).alias("l"),
            F.count(F.lit(1)).alias("c"),
            F.min("props").alias("m"),
        )
        .where(F.col("c") > 10)
        .orderBy(F.desc("l"), "k")
        .limit(25)
    )


@query(
    "cb_two_key_profile",
    cast_double=["avg_value"],
    oracle="""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS hi,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value
    FROM events
    GROUP BY user_id, event_type
    ORDER BY c DESC, user_id, event_type
    LIMIT 10
    """,
)
def cb_two_key_profile(spark, sf_dir):
    """ClickBench q33 shape (queries/q33.sql: WatchID, ClientIP GROUP BY with
    COUNT / SUM(IsRefresh) / AVG): high-cardinality two-key group with a
    mixed aggregate battery, top-10 by count. avg from exact decimal sum."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("hi"),
            # Mirror the oracle's CAST(value AS DECIMAL(12,2)) exactly (same
            # tie-rounding) rather than money.cents' floor(x*100+0.5), which
            # assumes 2-decimal round-trippable doubles.
            (F.sum(F.col("value").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        )
        .orderBy(F.desc("c"), "user_id", "event_type")
        .limit(10)
    )


@query(
    "cb_filtered_pageviews_topk",
    oracle="""
    SELECT props, CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE user_id % 62 = 0
      AND ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-28 00:00:00'
      AND event_type <> 'error' AND props <> ''
    GROUP BY props
    ORDER BY pageviews DESC, props
    LIMIT 10
    """,
)
def cb_filtered_pageviews_topk(spark, sf_dir):
    """ClickBench q37 shape (queries/q37.sql: CounterID + date-range +
    flag-filtered URL pageview top-10): a multi-predicate slice (key
    modulus, time window, type exclusion) into a string-group TopN."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(
            (F.col("user_id") % 62 == 0)
            & (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-28 00:00:00").cast("timestamp_ntz"))
            & (F.col("event_type") != "error")
            & (F.col("props") != "")
        )
        .groupBy("props")
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.desc("pageviews"), "props")
        .limit(10)
    )


@query(
    "cb_offset_pageviews",
    oracle="""
    SELECT props, CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE event_type IN ('view', 'click')
    GROUP BY props
    ORDER BY pageviews DESC, props
    LIMIT 10 OFFSET 40
    """,
)
def cb_offset_pageviews(spark, sf_dir):
    """ClickBench q39/q41/q42 shape (queries/q39.sql …: top-10 pageviews at
    OFFSET 1000): ranked aggregation read at an offset — LIMIT+OFFSET over
    a deterministic (tiebroken) ordering."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("props")
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.desc("pageviews"), "props")
        .offset(40)
        .limit(10)
    )


@query(
    "cb_traffic_src_dst",
    oracle="""
    SELECT event_type,
           CASE WHEN user_id % 7 = 0 AND user_id % 3 = 0 THEN props ELSE '' END AS src,
           user_id % 5 AS dst,
           CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type, src, dst
    ORDER BY pageviews DESC, event_type, src, dst
    LIMIT 10 OFFSET 20
    """,
)
def cb_traffic_src_dst(spark, sf_dir):
    """ClickBench q40 shape (queries/q40.sql: TraficSourceID battery with a
    CASE-derived Src column in the GROUP BY): grouping on a conditional
    expression plus raw keys, ranked with an offset."""
    ev = _ev(spark, sf_dir)
    src = F.when(
        ((F.col("user_id") % 7) == 0) & ((F.col("user_id") % 3) == 0), F.col("props")
    ).otherwise(F.lit(""))
    return (
        ev.where(F.col("event_type") != "error")
        .groupBy(
            "event_type", src.alias("src"), (F.col("user_id") % 5).alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.desc("pageviews"), "event_type", "src", "dst")
        .offset(20)
        .limit(10)
    )


@query(
    "cb_minute_series_offset",
    oracle="""
    SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS m,
           CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
    GROUP BY m
    ORDER BY m
    LIMIT 10 OFFSET 100
    """,
)
def cb_minute_series_offset(spark, sf_dir):
    """ClickBench q43 shape (queries/q43.sql: per-minute DATE_TRUNC series
    with LIMIT OFFSET): time-bucketed counts read as an ordered page —
    minute truncation rendered as a string so both engines' parquet
    timestamp units agree."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy(F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm").alias("m"))
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy("m")
        .offset(100)
        .limit(10)
    )


@query(
    "cb_date_minmax",
    oracle="""
    SELECT strftime(min(CAST(ts AS DATE)), '%Y-%m-%d') AS first_day,
           strftime(max(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day
    FROM events
    """,
)
def cb_date_minmax(spark, sf_dir):
    """ClickBench q07 shape (queries/q07.sql: MIN/MAX(EventDate)): the
    date-granular min/max scan — answered entirely from parquet row-group
    statistics at scale. Rendered as date strings so the engines' parquet
    timestamp units cannot differ in the output."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        F.date_format(F.min(F.col("ts").cast("date")), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max(F.col("ts").cast("date")), "yyyy-MM-dd").alias("last_day"),
    )


@query(
    "cb_region_battery",
    cast_double=["sum_value", "avg_value"],
    oracle="""
    SELECT user_id % 32 AS region,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value,
           CAST(count(*) AS BIGINT) AS c,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    GROUP BY region
    ORDER BY c DESC, region
    LIMIT 10
    """,
)
def cb_region_battery(spark, sf_dir):
    """ClickBench q10 shape (queries/q10.sql: RegionID with SUM / COUNT /
    AVG / COUNT(DISTINCT UserID)): a mixed battery including an exact
    distinct-count per low-cardinality group — Spark plans the distinct via
    Expand on the same single shuffle."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy((F.col("user_id") % 32).alias("region"))
        .agg(
            F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("sum_value"),
            F.count(F.lit(1)).alias("c"),
            (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
            F.countDistinct("user_id").alias("users"),
        )
        .select("region", "sum_value", "c", "avg_value", "users")
        .orderBy(F.desc("c"), "region")
        .limit(10)
    )


@query(
    "cb_model_distinct_users",
    oracle="""
    SELECT CAST(props ->> 'k' AS VARCHAR) AS model,
           CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events
    WHERE event_type <> 'error'
    GROUP BY model
    ORDER BY u DESC, model
    LIMIT 10
    """,
)
def cb_model_distinct_users(spark, sf_dir):
    """ClickBench q11 shape (queries/q11.sql: MobilePhoneModel with
    COUNT(DISTINCT UserID) top-10): distinct users per extracted string key
    — the JSON extraction runs JVM-side in the scan stage, the distinct
    aggregates on one shuffle."""
    ev = _ev(spark, sf_dir).where(F.col("event_type") != "error")
    return (
        ev.groupBy(F.get_json_object("props", "$.k").alias("model"))
        .agg(F.countDistinct("user_id").alias("u"))
        .orderBy(F.desc("u"), "model")
        .limit(10)
    )


@query(
    "cb_engine_phrase_topk",
    oracle="""
    SELECT user_id % 13 AS engine, props AS phrase, CAST(count(*) AS BIGINT) AS c
    FROM events
    WHERE event_type <> 'error'
    GROUP BY engine, phrase
    ORDER BY c DESC, engine, phrase
    LIMIT 10
    """,
)
def cb_engine_phrase_topk(spark, sf_dir):
    """ClickBench q15 shape (queries/q15.sql: SearchEngineID, SearchPhrase
    top-10 by count): two-key group where one key is derived — one shuffle
    on the composite, TakeOrderedAndProject top-10."""
    ev = _ev(spark, sf_dir).where(F.col("event_type") != "error")
    return (
        ev.groupBy((F.col("user_id") % 13).alias("engine"), F.col("props").alias("phrase"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "engine", "phrase")
        .limit(10)
    )


@query(
    "cb_user_minute_phrase",
    oracle="""
    SELECT user_id, CAST(minute(ts) AS BIGINT) AS m, props AS phrase,
           CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY user_id, m, phrase
    ORDER BY c DESC, user_id, m, phrase
    LIMIT 10
    """,
)
def cb_user_minute_phrase(spark, sf_dir):
    """ClickBench q19 shape (queries/q19.sql: UserID, extract(minute FROM
    EventTime), SearchPhrase): high-cardinality three-key group with a
    time-field extraction in the key — minute() is sub-second-precision
    independent, so parquet nanos cannot flip it."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id",
            F.minute("ts").cast("long").alias("m"),
            F.col("props").alias("phrase"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "user_id", "m", "phrase")
        .limit(10)
    )


@query(
    "cb_phrase_time_scan",
    oracle="""
    SELECT props AS phrase
    FROM events
    WHERE event_type <> 'error'
    ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S'), props, event_id
    LIMIT 10
    """,
)
def cb_phrase_time_scan(spark, sf_dir):
    """ClickBench q27 shape (queries/q27.sql: SELECT SearchPhrase ... ORDER
    BY EventTime LIMIT 10): a bare row-select TopN by event time — no
    aggregation, TakeOrderedAndProject over the scan. The sort key renders
    ts at second precision (nanos parquet generations differ below that)
    with event_id as the unique tiebreaker, so the limit boundary is
    engine-independent."""
    ev = _ev(spark, sf_dir).where(F.col("event_type") != "error")
    return (
        ev.orderBy(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "props", "event_id")
        .limit(10)
        .select(F.col("props").alias("phrase"))
    )


@query(
    "cb_engine_ip_battery",
    cast_double=["avg_value"],
    oracle="""
    SELECT user_id % 13 AS engine, user_id AS ip, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS refreshes,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
    FROM events
    WHERE event_type <> 'error'
    GROUP BY engine, ip
    ORDER BY c DESC, engine, ip
    LIMIT 10
    """,
)
def cb_engine_ip_battery(spark, sf_dir):
    """ClickBench q31 shape (queries/q31.sql: SearchEngineID, ClientIP with
    COUNT / SUM(IsRefresh) / AVG(ResolutionWidth)): the wide-sum battery on
    a two-key group — count, flag-sum, exact-decimal average in one
    shuffle."""
    ev = _ev(spark, sf_dir).where(F.col("event_type") != "error")
    return (
        ev.groupBy((F.col("user_id") % 13).alias("engine"), F.col("user_id").alias("ip"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("refreshes"),
            (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        )
        .orderBy(F.desc("c"), "engine", "ip")
        .limit(10)
    )


@query(
    "cb_url_topk_plain",
    oracle="""
    SELECT props AS url, CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY url
    ORDER BY c DESC, url
    LIMIT 10
    """,
)
def cb_url_topk_plain(spark, sf_dir):
    """ClickBench q34 shape (queries/q34.sql: URL top-10 by count, no
    filter): the plain string-key heavy hitter — partial counts collapse
    per partition before the single exchange."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.col("props").alias("url"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "url")
        .limit(10)
    )


@query(
    "cb_const_group_topk",
    oracle="""
    SELECT 1 AS one, props AS url, CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY one, url
    ORDER BY c DESC, url
    LIMIT 10
    """,
)
def cb_const_group_topk(spark, sf_dir):
    """ClickBench q35 shape (queries/q35.sql: GROUP BY 1, URL): a constant
    in the grouping key — Catalyst folds the literal out of the exchange
    key, so the plan is identical to the plain group."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.lit(1).alias("one"), F.col("props").alias("url"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "url")
        .limit(10)
    )


@query(
    "cb_ip_arith_groups",
    oracle="""
    SELECT user_id AS ip, user_id - 1 AS ip1, user_id - 2 AS ip2, user_id - 3 AS ip3,
           CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY ip, ip1, ip2, ip3
    ORDER BY c DESC, ip
    LIMIT 10
    """,
)
def cb_ip_arith_groups(spark, sf_dir):
    """ClickBench q36 shape (queries/q36.sql: ClientIP, ClientIP-1, -2, -3):
    arithmetically-derived duplicate group keys — functionally one key, and
    the optimizer shuffles once on the base column, carrying the derived
    columns through."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(
            F.col("user_id").alias("ip"),
            (F.col("user_id") - 1).alias("ip1"),
            (F.col("user_id") - 2).alias("ip2"),
            (F.col("user_id") - 3).alias("ip3"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "ip")
        .limit(10)
    )


@query(
    "cb_title_filtered_topk",
    oracle="""
    SELECT props AS title, CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE user_id % 62 = 0
      AND ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
      AND event_type <> 'error' AND event_type <> 'view' AND props <> ''
    GROUP BY title
    ORDER BY pageviews DESC, title
    LIMIT 10
    """,
)
def cb_title_filtered_topk(spark, sf_dir):
    """ClickBench q38 shape (queries/q38.sql: Title pageviews under
    CounterID + date range + DontCountHits=0 + IsRefresh=0): a top-10 under
    FOUR stacked predicates, all pushed into the scan stage before the
    single group-by shuffle."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(
            (F.col("user_id") % 62 == 0)
            & (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-31 00:00:00").cast("timestamp_ntz"))
            & (F.col("event_type") != "error")
            & (F.col("event_type") != "view")
            & (F.col("props") != "")
        )
        .groupBy(F.col("props").alias("title"))
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.desc("pageviews"), "title")
        .limit(10)
    )


@query(
    "cb_point_hash_offset",
    oracle="""
    SELECT props AS urlhash, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE user_id % 62 = 0 AND event_type <> 'view'
      AND user_id % 7 IN (1, 6)
      AND CAST(props ->> 'k' AS BIGINT) % 10 = 2
    GROUP BY urlhash, day
    ORDER BY pageviews DESC, urlhash, day
    LIMIT 10 OFFSET 5
    """,
)
def cb_point_hash_offset(spark, sf_dir):
    """ClickBench q41 shape (queries/q41.sql: URLHash, EventDate under a
    RefererHash point filter and TraficSourceID IN list, LIMIT OFFSET): a
    point-selective tail read — the hash-equality predicate prunes hard in
    the scan, then a small group is paged at an offset."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(
            (F.col("user_id") % 62 == 0)
            & (F.col("event_type") != "view")
            & (F.col("user_id") % 7).isin(1, 6)
            & (F.get_json_object("props", "$.k").cast("bigint") % 10 == 2)
        )
        .groupBy(
            F.col("props").alias("urlhash"),
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.desc("pageviews"), "urlhash", "day")
        .offset(5)
        .limit(10)
    )


@query(
    "cb_client_dims_offset",
    oracle="""
    SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS width_bucket,
           CAST(length(props) AS BIGINT) AS height,
           CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE user_id % 62 = 0 AND event_type <> 'view'
      AND CAST(props ->> 'k' AS BIGINT) % 10 = 7
    GROUP BY width_bucket, height
    ORDER BY pageviews DESC, width_bucket, height
    LIMIT 10 OFFSET 3
    """,
)
def cb_client_dims_offset(spark, sf_dir):
    """ClickBench q42 shape (queries/q42.sql: WindowClientWidth/Height under
    a URLHash point filter, LIMIT OFFSET): two derived numeric dimensions
    grouped under a point-selective predicate, read as an offset page."""
    ev = _ev(spark, sf_dir)
    return (
        ev.where(
            (F.col("user_id") % 62 == 0)
            & (F.col("event_type") != "view")
            & (F.get_json_object("props", "$.k").cast("bigint") % 10 == 7)
        )
        .groupBy(
            (F.floor(F.col("value") / 50) * 50).cast("long").alias("width_bucket"),
            F.length("props").cast("long").alias("height"),
        )
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.desc("pageviews"), "width_bucket", "height")
        .offset(3)
        .limit(10)
    )
