"""JSON + string + date scalar function coverage (SURVEY §2.9).

Reference: extension/json/json_functions/ (json_extract/->>/json_valid/…),
string functions src/function/scalar/string/ + core_functions manifests,
date functions extension/core_functions/scalar/date/functions.json.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.functions.scalar import time_bucket
from duckdb_parachute_spark.workload import query


@query(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(count(*) FILTER (WHERE json_valid(props)) AS BIGINT) AS n_valid
    FROM events GROUP BY event_type
    """,
)
def json_extract_agg(spark, sf_dir):
    """json_extract (-> / ->>) + json_valid (reference
    extension/json/json_functions/) → get_json_object; validity via try-parse."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.count(F.when(F.try_parse_json("props").isNotNull(), 1)).alias("n_valid"),
    )


@query(
    "json_schema_roundtrip",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json_object('id', event_id, 'k', CAST(json_extract_string(props, '$.k') AS BIGINT)) AS rebuilt
    FROM events WHERE event_id < 20
    """,
)
def json_schema_roundtrip(spark, sf_dir):
    """from_json with an explicit schema + to_json reconstruction (reference
    json_transform/json_create: json_functions/json_create.cpp)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 20)
    parsed = ev.select(
        "event_id", F.from_json("props", "struct<k:bigint>").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.to_json(F.struct(F.col("event_id").alias("id"), F.col("p.k").alias("k"))).alias("rebuilt"),
    )


@query(
    "string_function_suite",
    oracle="""
    SELECT doc_id,
           upper(substr(text, 1, 10)) AS head_upper,
           length(text) AS len,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS len_nospace,
           contains(text, 'spark') AS has_spark,
           starts_with(text, 'the') AS starts_the,
           reverse(substr(text, 1, 5)) AS rev5,
           lpad(lang, 5, '_') AS lang_pad,
           concat_ws('|', lang, source) AS tag,
           md5(substr(text, 1, 32)) AS head_md5,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           replace(substr(text, 1, 20), 'a', '@') AS replaced,
           split_part(text, ' ', 2) AS second_token
    FROM documents WHERE doc_id < 50
    """,
)
def string_function_suite(spark, sf_dir):
    """String scalar battery (reference src/function/scalar/string/*):
    case/substr/length/contains/starts_with/reverse/pad/concat_ws/md5/
    regexp_extract/replace/split_part — all Spark natives."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.length("text").cast("bigint").alias("len"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("bigint").alias("len_nospace"),
        F.contains(F.col("text"), F.lit("spark")).alias("has_spark"),
        F.startswith(F.col("text"), F.lit("the")).alias("starts_the"),
        F.reverse(F.substring("text", 1, 5)).alias("rev5"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.concat_ws("|", "lang", "source").alias("tag"),
        F.md5(F.substring("text", 1, 32)).alias("head_md5"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.replace(F.substring("text", 1, 20), F.lit("a"), F.lit("@")).alias("replaced"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("second_token"),
    )


@query(
    "date_function_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since
    FROM orders WHERE o_orderkey < 100
    """,
)
def date_function_suite(spark, sf_dir):
    """Date/time scalar battery (reference
    extension/core_functions/scalar/date/functions.json): extract parts,
    date_trunc, interval add, last_day, datediff.

    DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → align with -1."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd").alias("due"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("eom"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
    )


@query(
    "time_bucket_rollup",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 6 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def time_bucket_rollup(spark, sf_dir):
    """time_bucket (reference date/functions.json — hypertable-style rollup,
    SURVEY §2.9 gap list) via our scalar composition."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(time_bucket(6 * 3600, F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "unnest_explode_tokens",
    oracle="""
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id < 20)
    WHERE tok <> ''
    GROUP BY tok ORDER BY n DESC, tok LIMIT 25
    """,
)
def unnest_explode_tokens(spark, sf_dir):
    """UNNEST (reference physical_unnest.cpp) → explode, with an aggregation
    on the flattened rows — the canonical token-count pipeline."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(25)
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    """PIVOT (reference physical_pivot.cpp; binder expands value lists) →
    groupBy().pivot(values=[...]) with explicit values so no discovery scan."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "o_orderpriority",
            F.col("F").cast("bigint").alias("F"),
            F.col("O").cast("bigint").alias("O"),
            F.col("P").cast("bigint").alias("P"),
        )
    )


@query(
    "pivot_dynamic_values",
    oracle="""
    SELECT o_orderstatus,
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS "1-URGENT",
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS BIGINT) AS "2-HIGH",
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS BIGINT) AS "3-MEDIUM",
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0) AS BIGINT) AS "4-NOT SPECIFIED",
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS BIGINT) AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_dynamic_values(spark, sf_dir):
    """Dynamic PIVOT: the IN-values are DISCOVERED from a sorted distinct
    scan, not listed by the caller — the reference binder's unlisted-PIVOT
    expansion (physical_pivot.cpp + pivot binder). Two-phase:
    distinct-collect (bounded, driver-side) then the single-pass pivot
    aggregate; column order = sorted discovered values, so the schema is
    deterministic (operators/misc.pivot_dynamic)."""
    from duckdb_parachute_spark.operators.misc import pivot_dynamic

    o = load_table(spark, sf_dir, "orders")
    out = pivot_dynamic(o, ["o_orderstatus"], "o_orderpriority", F.count(F.lit(1)))
    vals = [c for c in out.columns if c != "o_orderstatus"]
    out = out.na.fill(0, vals)
    return out.select(
        "o_orderstatus", *[F.col(f"`{v}`").cast("bigint").alias(v) for v in vals]
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(val, 2) AS val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
          FROM lineitem WHERE l_orderkey < 50)
    UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def unpivot_stack(spark, sf_dir):
    """UNPIVOT (reference binder pivot/unpivot expansion) → DataFrame unpivot
    (stack)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 50)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "val",
        )
        .select("l_orderkey", "l_linenumber", "metric", F.round("val", 2).alias("val"))
    )


@query(
    "json_gap_suite",
    join_arrays=["jkeys"],
    oracle="""
    SELECT event_id,
           json_keys(props) AS jkeys,
           json_valid(props) AS jvalid,
           json_valid(substr(props, 2)) AS jbroken,
           json_array_length('[1,2,3]') AS jarrlen,
           json_merge_patch(props, '{"extra": 1, "k": null}') AS jmerged
    FROM events WHERE event_id < 60
    """,
)
def json_gap_suite(spark, sf_dir):
    """JSON functions SURVEY §2.9 flags as Spark gaps (reference
    extension/json/json_functions/): json_keys ≡ json_object_keys,
    json_valid via try-parse (from_json NULL on failure ≡ invalid),
    json_array_length native, json_merge_patch (RFC 7386: null deletes,
    fields overwrite) composed from parsed maps re-serialized in key order —
    props is flat {k: int}, which keeps the composition exact."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 60)
    props = F.col("props")
    parsed = F.from_json(props, "map<string,int>")
    patch = F.from_json(F.lit('{"extra": 1, "k": null}'), "map<string,string>")
    merged = F.map_filter(
        F.map_zip_with(
            F.transform_values(parsed, lambda k, v: v.cast("string")),
            patch,
            lambda k, v1, v2: F.when(
                F.array_contains(F.from_json(F.lit('["extra","k"]'), "array<string>"), k),
                v2,
            ).otherwise(F.coalesce(v2, v1)),
        ),
        lambda k, v: v.isNotNull(),
    )
    merged_json = F.concat(
        F.lit("{"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.map_entries(merged)),
                lambda e: F.concat(F.lit('"'), e.getField("key"), F.lit('":'), e.getField("value")),
            ),
        ),
        F.lit("}"),
    )
    return ev.select(
        "event_id",
        F.json_object_keys(props).alias("jkeys"),
        F.from_json(props, "map<string,string>").isNotNull().alias("jvalid"),
        F.from_json(F.expr("substring(props, 2)"), "map<string,string>").isNotNull().alias("jbroken"),
        F.json_array_length(F.lit("[1,2,3]")).alias("jarrlen"),
        merged_json.alias("jmerged"),
    )
