"""Scalar-function parity suites (SURVEY §2.9) beyond the string/date suites:
math, list/array (incl. lambdas), struct/map, blob/bit/encoding, generic
conditionals, plus §2.6 sampling and §2.1 series sources.

Reference manifests: extension/core_functions/scalar/{math,list,map,struct,
blob,bit}/functions.json, src/function/scalar/{operator,sequence}/,
src/function/table/range.cpp, src/execution/operator/helper/physical_limit.cpp,
physical_reservoir_sample.cpp.

Float policy: every double expression that differs only in last-ulp between
engines is rounded in-query (scale chosen per magnitude); exact paths
(integers, decimals, md5) are compared bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.workload import query


@query(
    "math_function_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(-l_extendedprice), 2) AS v_abs,
           round(cbrt(l_quantity), 8) AS v_cbrt,
           CAST(ceil(l_discount * 100) AS BIGINT) AS v_ceil,
           CAST(floor(l_tax * 100) AS BIGINT) AS v_floor,
           round(exp(l_discount), 8) AS v_exp,
           round(ln(l_extendedprice), 8) AS v_ln,
           round(log10(l_extendedprice), 8) AS v_log10,
           round(log2(l_quantity), 8) AS v_log2,
           round(sqrt(l_quantity), 8) AS v_sqrt,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS v_sign,
           round(radians(l_quantity), 8) AS v_radians,
           round(degrees(l_discount), 8) AS v_degrees,
           round(pi() * l_quantity, 8) AS v_pi,
           round(pow(l_quantity, 2), 2) AS v_pow,
           CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS v_mod,
           round(atan2(l_discount, l_tax + 0.01), 8) AS v_atan2,
           round(sin(l_discount), 8) AS v_sin,
           round(cos(l_discount), 8) AS v_cos,
           round(tan(l_discount), 8) AS v_tan,
           round(asin(l_discount * 10), 8) AS v_asin,
           round(acos(l_discount * 10), 8) AS v_acos,
           round(atan(l_quantity), 8) AS v_atan,
           greatest(l_discount, l_tax) AS v_greatest,
           least(l_discount, l_tax) AS v_least,
           isnan(l_discount / nullif(l_quantity, 0)) AS v_isnan,
           CAST(isinf(l_extendedprice) AS BOOLEAN) AS v_isinf
    FROM lineitem WHERE l_orderkey < 30
    """,
)
def math_function_suite(spark, sf_dir):
    """Math scalar set (reference extension/core_functions/scalar/math/
    functions.json): one projection, fully inside whole-stage codegen —
    no shuffle, no Python."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 30)
    d, t, q, e = F.col("l_discount"), F.col("l_tax"), F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(-e), 2).alias("v_abs"),
        F.round(F.cbrt(q), 8).alias("v_cbrt"),
        F.ceil(d * 100).cast("bigint").alias("v_ceil"),
        F.floor(t * 100).cast("bigint").alias("v_floor"),
        F.round(F.exp(d), 8).alias("v_exp"),
        F.round(F.log(e), 8).alias("v_ln"),
        F.round(F.log10(e), 8).alias("v_log10"),
        F.round(F.log2(q), 8).alias("v_log2"),
        F.round(F.sqrt(q), 8).alias("v_sqrt"),
        F.signum(d - 0.05).alias("v_sign"),
        F.round(F.radians(q), 8).alias("v_radians"),
        F.round(F.degrees(d), 8).alias("v_degrees"),
        F.round(F.lit(3.141592653589793) * q, 8).alias("v_pi"),
        F.round(F.pow(q, 2), 2).alias("v_pow"),
        (q.cast("bigint") % 7).alias("v_mod"),
        F.round(F.atan2(d, t + 0.01), 8).alias("v_atan2"),
        F.round(F.sin(d), 8).alias("v_sin"),
        F.round(F.cos(d), 8).alias("v_cos"),
        F.round(F.tan(d), 8).alias("v_tan"),
        F.round(F.asin(d * 10), 8).alias("v_asin"),
        F.round(F.acos(d * 10), 8).alias("v_acos"),
        F.round(F.atan(q), 8).alias("v_atan"),
        F.greatest(d, t).alias("v_greatest"),
        F.least(d, t).alias("v_least"),
        F.isnan(d / F.nullif(q, F.lit(0))).alias("v_isnan"),
        (F.abs(e) == float("inf")).alias("v_isinf"),
    )


@query(
    "list_function_suite",
    join_arrays=["sl", "uniq_sorted", "doubled", "longs", "refl"],
    oracle="""
    SELECT doc_id,
           len(words) AS n_words,
           list_slice(words, 2, 4) AS sl,
           list_sort(list_distinct(list_transform(words, w -> lower(w)))) AS uniq_sorted,
           list_reverse_sort(list_transform(words, w -> length(w)))[1] AS max_len,
           list_transform(words, w -> length(w) * 2) AS doubled,
           list_filter(list_transform(words, w -> length(w)), x -> x > 4) AS longs,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_len,
           list_contains(list_transform(words, w -> lower(w)), 'the') AS has_the,
           list_position(words, words[1]) AS first_pos,
           array_to_string(list_slice(words, 1, 3), '-') AS joined,
           flatten([list_slice(words, 1, 2), list_slice(words, 3, 4)]) AS refl,
           list_min(list_transform(words, w -> length(w))) AS min_len
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 40)
    """,
)
def list_function_suite(spark, sf_dir):
    """List/array function set incl. lambdas (reference
    extension/core_functions/scalar/list/functions.json,
    lambda_functions.cpp): transform/filter/aggregate stay JVM-side as
    Catalyst higher-order functions — the 100 TB-safe path (no UDF)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    words = F.split(F.col("text"), " ")
    lens = F.transform(words, lambda w: F.length(w))
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.slice(words, 2, 3).alias("sl"),
        F.array_sort(F.array_distinct(F.transform(words, lambda w: F.lower(w)))).alias("uniq_sorted"),
        F.sort_array(lens, asc=False)[0].alias("max_len"),
        F.transform(words, lambda w: F.length(w) * 2).alias("doubled"),
        F.filter(lens, lambda x: x > 4).alias("longs"),
        F.aggregate(lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total_len"),
        F.array_contains(F.transform(words, lambda w: F.lower(w)), "the").alias("has_the"),
        F.array_position(words, words[0]).alias("first_pos"),
        F.concat_ws("-", F.slice(words, 1, 3)).alias("joined"),
        F.flatten(F.array(F.slice(words, 1, 2), F.slice(words, 3, 2))).alias("refl"),
        F.array_min(lens).alias("min_len"),
    )


@query(
    "struct_map_suite",
    join_arrays=["mkeys"],
    oracle="""
    SELECT event_id,
           struct_extract({'ty': event_type, 'val': round(value, 4)}, 'ty') AS packed_ty,
           struct_extract({'ty': event_type, 'val': round(value, 4)}, 'val') AS packed_val,
           map_keys(MAP {event_type: round(value, 4)}) AS mkeys,
           map_values(MAP {event_type: round(value, 4)})[1] AS mval0,
           element_at(MAP {event_type: round(value, 4)}, event_type)[1] AS melem,
           cardinality(MAP {'a': 1, 'b': 2}) AS msize
    FROM events WHERE event_id < 50
    """,
)
def struct_map_suite(spark, sf_dir):
    """Struct + map function set (reference .../scalar/struct/functions.json,
    .../scalar/map/functions.json): struct_pack/extract ≡ F.struct/getField,
    MAP constructors ≡ create_map. Struct/map cells are unpacked to scalars at
    the output boundary (struct_extract / map_values[1]) so the hash gate sees
    only scalar columns; the nested construction still runs both engines."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 50)
    packed = F.struct(F.col("event_type").alias("ty"), F.round("value", 4).alias("val"))
    m = F.create_map(F.col("event_type"), F.round("value", 4))
    return ev.select(
        "event_id",
        packed.getField("ty").alias("packed_ty"),
        packed.getField("val").alias("packed_val"),
        F.map_keys(m).alias("mkeys"),
        F.map_values(m)[0].alias("mval0"),
        F.element_at(m, F.col("event_type")).alias("melem"),
        F.size(F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))).alias("msize"),
    )


@query(
    "blob_bit_suite",
    oracle="""
    SELECT doc_id,
           base64(encode(substr(text, 1, 24))) AS b64,
           decode(from_base64(base64(encode(substr(text, 1, 24))))) AS roundtrip,
           lower(hex(encode(substr(text, 1, 8)))) AS hexed,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           octet_length(encode(text)) AS blen,
           CAST(doc_id & 255 AS BIGINT) AS v_and,
           CAST(doc_id | 4096 AS BIGINT) AS v_or,
           CAST(xor(doc_id, 1365) AS BIGINT) AS v_xor,
           CAST(doc_id << 3 AS BIGINT) AS v_shl,
           CAST(doc_id >> 2 AS BIGINT) AS v_shr,
           bit_count(doc_id) AS v_bitcount
    FROM documents WHERE doc_id < 64
    """,
)
def blob_bit_suite(spark, sf_dir):
    """Blob/encoding + bitwise operator set (reference
    .../scalar/blob/functions.json, src/function/scalar/operator/): base64
    and hex roundtrips on UTF-8 blobs, hashes, integer bit ops."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 64)
    blob24 = F.encode(F.substring("text", 1, 24), "utf-8")
    k = F.col("doc_id")
    return d.select(
        "doc_id",
        F.base64(blob24).alias("b64"),
        F.decode(F.unbase64(F.base64(blob24)), "utf-8").alias("roundtrip"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "utf-8"))).alias("hexed"),
        F.md5(F.col("text")).alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.octet_length(F.col("text")).alias("blen"),
        k.bitwiseAND(F.lit(255)).alias("v_and"),
        k.bitwiseOR(F.lit(4096)).alias("v_or"),
        k.bitwiseXOR(F.lit(1365)).alias("v_xor"),
        F.shiftleft(k, 3).cast("bigint").alias("v_shl"),
        F.shiftright(k, 2).cast("bigint").alias("v_shr"),
        F.bit_count(k).alias("v_bitcount"),
    )


@query(
    "generic_conditional_suite",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_c,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
           TRY_CAST(o_orderpriority AS INT) AS try_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS try_digit,
           o_orderstatus IS DISTINCT FROM 'F' AS isdf,
           NULL IS NOT DISTINCT FROM NULL AS nnd,
           greatest(o_orderkey, o_custkey, 100) AS g3,
           least(o_orderkey, o_custkey, 100) AS l3,
           if(o_orderstatus = 'F', 'done', 'pending') AS ifv,
           round(coalesce(NULL, o_totalprice, 0.0), 2) AS first_price
    FROM orders WHERE o_orderkey < 200
    """,
)
def generic_conditional_suite(spark, sf_dir):
    """Generic/conditional set (reference .../scalar/generic/functions.json,
    CASE/TRY_CAST semantics src/function/cast/): three-valued logic, NULL-safe
    comparison, n-ary least/greatest type lattice, TRY_CAST never errors."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_c"),
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("try_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("try_digit"),
        (~F.col("o_orderstatus").eqNullSafe(F.lit("F"))).alias("isdf"),
        F.lit(None).cast("string").eqNullSafe(F.lit(None).cast("string")).alias("nnd"),
        F.greatest("o_orderkey", "o_custkey", F.lit(100)).alias("g3"),
        F.least("o_orderkey", "o_custkey", F.lit(100)).alias("l3"),
        F.when(F.col("o_orderstatus") == "F", "done").otherwise("pending").alias("ifv"),
        F.round(F.coalesce(F.lit(None).cast("double"), F.col("o_totalprice"), F.lit(0.0)), 2).alias("first_price"),
    )


@query(
    "sample_deterministic_hash",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
    """,
)
def sample_deterministic_hash(spark, sf_dir):
    """Bernoulli sampling made cross-engine-reproducible: keep rows whose
    md5(key) prefix falls under the rate threshold (~15.6% here). The
    reference's SAMPLE methods (physical_reservoir_sample.cpp,
    sample_options.hpp:20) are seeded-random per engine — a hash-gate is the
    deterministic, restart-safe equivalent used in production pipelines
    (same shape as Spark's df.sample but auditable)."""
    d = load_table(spark, sf_dir, "documents")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "28"
    return d.where(gate).select("doc_id", "lang")


@query(
    "sample_reservoir_fixed",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang FROM documents
        ORDER BY md5('42|' || CAST(doc_id AS VARCHAR))
        LIMIT 25
    ) s
    ORDER BY doc_id
    """,
)
def sample_reservoir_fixed(spark, sf_dir):
    """Fixed-size (k=25) reservoir sample (reference
    physical_reservoir_sample.cpp's FIXED-count mode): exactly k rows,
    uniform, reproducible — rank by seeded md5 of the unique key, keep the
    k smallest (operators/misc.reservoir_sample). Spark executes it as
    TakeOrderedAndProject (per-partition top-k + k-row merge), and the md5
    ranking lets any SQL engine regenerate the identical sample."""
    from duckdb_parachute_spark.operators.misc import reservoir_sample

    d = load_table(spark, sf_dir, "documents")
    return (
        reservoir_sample(d.select("doc_id", "lang"), 25, "doc_id", seed=42)
        .orderBy("doc_id")
    )


@query(
    "limit_offset_topn",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def limit_offset_topn(spark, sf_dir):
    """ORDER BY + LIMIT + OFFSET (reference physical_top_n.cpp,
    topn_optimizer.cpp, physical_limit.cpp): Catalyst plans
    TakeOrderedAndProject — the distributed top-k heap, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .offset(10)
        .limit(20)
    )


@query(
    "range_series_source",
    oracle="""
    SELECT i, i * i AS sq, CAST(i % 5 AS BIGINT) AS m,
           TIMESTAMP '2024-01-01 00:00:00' + to_hours(CAST(i AS BIGINT)) AS ts_h
    FROM generate_series(0, 99) t(i)
    """,
)
def range_series_source(spark, sf_dir):
    """Lazy integer/timestamp series source (reference
    src/function/table/range.cpp) ≡ spark.range — generated per-partition
    with no input files, the canonical parallel generator."""
    return spark.range(0, 100).select(
        F.col("id").alias("i"),
        (F.col("id") * F.col("id")).alias("sq"),
        (F.col("id") % 5).alias("m"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp_ntz") + F.make_interval(hours=F.col("id"))).alias("ts_h"),
    )


@query(
    "regex_function_suite",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{5,})', 1) AS first_long,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head,
           regexp_matches(text, '\\bthe\\b') AS has_the,
           len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word
    FROM (SELECT doc_id, substr(lower(text), 1, 40) AS text FROM documents WHERE doc_id < 40)
    """,
)
def regex_function_suite(spark, sf_dir):
    """Regexp set (reference src/function/scalar/string/regexp/, RE2-backed):
    extract/replace/match/split — Spark's Java regex and DuckDB's RE2 agree on
    this POSIX-safe subset."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    t = F.substring(F.lower(F.col("text")), 1, 40)
    return d.select(
        "doc_id",
        F.regexp_extract(t, r"([a-z]{5,})", 1).alias("first_long"),
        F.regexp_replace(t, r"[aeiou]", "_").alias("devoweled_head"),
        t.rlike(r"\bthe\b").alias("has_the"),
        F.size(F.split(t, r"\s+")).alias("n_tokens"),
        F.regexp_extract(t, r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
    )


_METRIC_PAIRS = [
    ("martha", "marhta"), ("dixon", "dicksonx"), ("kitten", "sitting"),
    ("ca", "abc"), ("abcde", "abcdf"), ("same", "same"),
    ("x", "xyz"), ("hello", "hallo"),
]


@query(
    "string_metric_suite",
    oracle="""
    SELECT a, b,
           hamming(a, a) AS ham_self,
           CASE WHEN length(a) = length(b) THEN hamming(a, b) END AS ham,
           round(jaccard(a, b), 6) AS jac,
           round(jaro_winkler_similarity(a, b), 6) AS jw,
           damerau_levenshtein(a, b) AS dl,
           levenshtein(a, b) AS lev,
           parse_dirpath('/data/raw/' || a || '.txt') AS dirname,
           parse_filename('/data/raw/' || a || '.txt') AS filename,
           format_bytes(length(a) * 123456) AS fmt_bytes,
           to_base(length(a) * 255 + 1, 16) AS hexed,
           strip_accents('àéî õü ÇÑ ' || a) AS folded
    FROM (VALUES ('martha','marhta'), ('dixon','dicksonx'), ('kitten','sitting'),
                 ('ca','abc'), ('abcde','abcdf'), ('same','same'),
                 ('x','xyz'), ('hello','hallo')) t(a, b)
    """,
)
def string_metric_suite(spark, sf_dir):
    """String metrics + path/format helpers SURVEY §2.9 lists as Spark gaps:
    hamming/jaccard as Catalyst set algebra, Jaro-Winkler and full
    Damerau-Levenshtein as Arrow-vectorized UDFs (functions/metrics.py) —
    all value-checked against the reference algorithms in DuckDB. DuckDB's
    hamming() errors on unequal lengths (the oracle gates it the same way our
    composition returns NULL), and its DP metrics are BYTE-based on
    multi-byte text while ours are character-based — the pairs stay ASCII;
    strip_accents is checked on a fixed accented prefix."""
    from duckdb_parachute_spark.functions import metrics as M

    df = spark.createDataFrame(_METRIC_PAIRS, "a string, b string")
    a, b = F.col("a"), F.col("b")
    return df.select(
        "a", "b",
        M.hamming_str(a, a).alias("ham_self"),
        M.hamming_str(a, b).alias("ham"),
        F.round(M.char_jaccard(a, b), 6).alias("jac"),
        F.round(M.jaro_winkler_similarity(a, b), 6).alias("jw"),
        M.damerau_levenshtein(a, b).alias("dl"),
        F.levenshtein(a, b).alias("lev"),
        M.parse_dirpath(F.concat(F.lit("/data/raw/"), a, F.lit(".txt"))).alias("dirname"),
        M.parse_filename(F.concat(F.lit("/data/raw/"), a, F.lit(".txt"))).alias("filename"),
        M.format_bytes(F.length(a) * 123456).alias("fmt_bytes"),
        M.to_base(F.length(a) * 255 + 1, 16).alias("hexed"),
        M.strip_accents(F.concat(F.lit("àéî õü ÇÑ "), a)).alias("folded"),
    )


@query(
    "epoch_timezone_suite",
    oracle="""
    SELECT event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS epoch_millis,
           make_timestamp(epoch_us(CAST(ts AS TIMESTAMP))) AS roundtrip,
           strftime(CAST(timezone('America/New_York', CAST(ts AS TIMESTAMP)) AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS ny_as_utc,
           strftime(CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus_90m,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', CAST(ts AS TIMESTAMP)) AS BIGINT) AS mins_since
    FROM events WHERE event_id < 200
    """,
)
def epoch_timezone_suite(spark, sf_dir):
    """Epoch + timezone conversions (reference epoch/epoch_ms/epoch_us in
    date/functions.json; timezone() via the bundled ICU extension,
    extension/icu/icu_extension.cpp:213): UTC session on both engines makes
    naive-timestamp epoch math identical; the New-York conversion is compared
    through its formatted UTC wall time. convert_timezone interprets the
    naive value as NY wall time, matching DuckDB's timezone(tz, naive)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    ts = F.col("ts").cast("timestamp")
    return ev.select(
        "event_id",
        F.unix_timestamp(ts).alias("epoch_s"),
        F.unix_millis(ts).alias("epoch_millis"),
        F.timestamp_micros(F.unix_micros(ts)).alias("roundtrip"),
        F.date_format(
            F.convert_timezone(F.lit("America/New_York"), F.lit("UTC"), F.col("ts")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("ny_as_utc"),
        F.date_format(ts + F.expr("INTERVAL 90 MINUTES"), "yyyy-MM-dd HH:mm:ss").alias("plus_90m"),
        F.floor(
            (F.unix_timestamp(ts) - F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp")))
            / F.lit(60)
        )
        .cast("bigint")
        .alias("mins_since"),
    )


_STATUS_ENUM = ["F", "O", "P"]


@query(
    "enum_emulation_suite",
    join_arrays=["range_v"],
    oracle="""
    SELECT o_orderkey,
           CAST(enum_code(CAST(o_orderstatus AS ENUM('F','O','P'))) AS INT) AS code,
           enum_first(CAST(o_orderstatus AS ENUM('F','O','P'))) AS first_v,
           enum_last(CAST(o_orderstatus AS ENUM('F','O','P'))) AS last_v,
           enum_range(CAST(o_orderstatus AS ENUM('F','O','P'))) AS range_v
    FROM orders WHERE o_orderkey < 100
    """,
)
def enum_emulation_suite(spark, sf_dir):
    """ENUM type emulation (SURVEY §1.2; reference enum functions in
    extension/core_functions/scalar/enum/): string column + declared value
    list; enum_code/first/last/range derived from the list and checked
    against DuckDB's native anonymous ENUM."""
    from duckdb_parachute_spark.functions.scalar import (
        enum_code,
        enum_first,
        enum_last,
        enum_range,
    )

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        enum_code(F.col("o_orderstatus"), _STATUS_ENUM).alias("code"),
        enum_first(_STATUS_ENUM).alias("first_v"),
        enum_last(_STATUS_ENUM).alias("last_v"),
        enum_range(_STATUS_ENUM).alias("range_v"),
    )


@query(
    "sequence_rownumber_ids",
    oracle="""
    SELECT row_number() OVER (ORDER BY n_nationkey) AS seq_id, n_name
    FROM nation
    """,
)
def sequence_rownumber_ids(spark, sf_dir):
    """Sequences (reference src/function/scalar/sequence/ nextval): the
    deterministic distributed equivalent — row_number over an explicit total
    order. True global counters are unsafe at scale (SURVEY §2.9 sequences
    note); sparse parallel ids exist as functions.scalar.unique_ids."""
    from duckdb_parachute_spark.functions.scalar import sequence_ids

    n = load_table(spark, sf_dir, "nation")
    return sequence_ids(n, ["n_nationkey"]).select("seq_id", "n_name")


@query(
    "sample_stratified_topk",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)
               ) AS rn
        FROM documents
    ) s WHERE rn <= 10 ORDER BY doc_id
    """,
)
def sample_stratified_topk(spark, sf_dir):
    """Stratified sampling: exactly min(10, n) docs per language, the k
    smallest seeded md5 hashes per stratum. Two-phase at scale — broadcast
    per-stratum counts, monotone hash-gate prefilter (~4k+32 rows per
    stratum survive), full-stratum fallback for under-filled gates, window
    rank over the survivor pool only — so a hot stratum never lands in one
    giant window task. Oracle is the single-window definition (identical
    result by the monotone-gate argument)."""
    from duckdb_parachute_spark.operators.misc import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(d, "lang", 10, "doc_id").select("doc_id", "lang").orderBy("doc_id")
