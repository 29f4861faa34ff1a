"""Aggregation operator coverage (SURVEY §2.4).

Reference: PhysicalHashAggregate/PhysicalUngroupedAggregate
(src/execution/operator/aggregate/physical_hash_aggregate.cpp,
physical_ungrouped_aggregate.cpp), grouping sets binder
(src/planner/binder/query_node/bind_select_node.cpp:515,632-644),
distinct aggregates (distinct_aggregate_data.cpp), sorted aggregates
(src/function/aggregate/sorted_aggregate_function.cpp), function manifests
under extension/core_functions/aggregate/*/functions.json.

Spark-first shapes: groupBy/rollup/cube + agg — Catalyst plans partial/final
hash aggregation with map-side combine automatically, which is the
shuffle-minimal strategy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table
from duckdb_parachute_spark.functions import money
from duckdb_parachute_spark.workload import query


def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


@query(
    "agg_rollup",
    cast_double=["sum_qty"],
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP with GROUPING() ids (reference bind_select_node.cpp:632 grouping
    sets expansion; executed as multi-set hash agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Pre-aggregate to the finest grain so the rollup's Expand runs over the
    # 6-row grouped relation instead of 3x the fact table (sum and count are
    # both decomposable; identical integer-unit result).
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(money.cents("l_quantity")).alias("__u"), F.count(F.lit(1)).alias("__n")
    )
    return (
        fine.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            money.units_to_decimal(F.sum("__u"), 2, "decimal(18,2)").alias("sum_qty"),
            F.sum("__n").cast("bigint").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "n")
    )


@query(
    "agg_cube",
    cast_double=["bal"],
    oracle="""
    SELECT c_mktsegment, n_name, count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE (c_mktsegment, n_name)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE over a broadcast dim join."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    fine = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.sum(money.cents("c_acctbal")).alias("__u"), F.count(F.lit(1)).alias("__n"))
    )
    # cube's 4-way Expand runs over the (segment x nation) grouped relation,
    # not the customer table — decomposable re-aggregation, same values.
    return (
        fine.cube("c_mktsegment", "n_name")
        .agg(
            F.sum("__n").cast("bigint").alias("n"),
            money.units_to_decimal(F.sum("__u"), 2, "decimal(18,2)").alias("bal"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (SQL path — SURVEY §3.1 pass-through entry)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(DISTINCT l_orderkey) AS n_ord,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_multi(spark, sf_dir):
    """Multiple DISTINCT aggregates in one query (reference
    distinct_aggregate_data.cpp; Spark plans Expand + two-stage agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_orderkey").alias("n_ord"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_filter_clause",
    cast_double=["urgent_total"],
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DECIMAL(18,2)) AS urgent_total,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_filter_clause(spark, sf_dir):
    """FILTER (WHERE …) on aggregates (SURVEY §2.4; test/sql/aggregate/)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_big"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", _dec("o_totalprice")))
        .cast("decimal(18,2)")
        .alias("urgent_total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_stats_family",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(stddev_pop(l_quantity), 6) AS sdp_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qe,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qe
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats_family(spark, sf_dir):
    """Algebraic aggregate family (reference
    extension/core_functions/aggregate/algebraic/functions.json): stddev/var/
    corr/covar — all Spark natives; rounded to absorb fp noise."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qe"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qe"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qe"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           arg_max(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000000 + o_orderkey) AS key_of_max,
           arg_min(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000000 + o_orderkey) AS key_of_min
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_minmax_by(spark, sf_dir):
    """arg_min/arg_max (reference distributive/functions.json) → min_by/max_by.

    Price ties would make arg_max nondeterministic in both engines, so the
    ordering value packs (price_cents, orderkey) into one bigint — exact
    integer math, unique per row, identical on both sides."""
    o = load_table(spark, sf_dir, "orders")
    rankval = (
        F.round(F.col("o_totalprice") * 100).cast("bigint") * F.lit(10000000000).cast("bigint")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.max_by("o_orderkey", rankval).alias("key_of_max"),
        F.min_by("o_orderkey", rankval).alias("key_of_min"),
    )


@query(
    "agg_string_agg_ordered",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_string_agg_ordered(spark, sf_dir):
    """string_agg(x, sep ORDER BY x) (reference sorted_aggregate_function.cpp)
    → Spark rewrite: array_sort(collect_list) + concat_ws (SURVEY §2.4)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
    )


@query(
    "agg_list_collect",
    join_arrays=["names"],
    oracle="""
    SELECT n_regionkey, list_sort(list(n_name)) AS names,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_list_collect(spark, sf_dir):
    """list() aggregate (reference nested/functions.json) → collect_list;
    sorted for deterministic comparison."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_sort(F.collect_list("n_name")).alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_median_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(median(o_totalprice), 4) AS med,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
           round(quantile_disc(o_totalprice, 0.5), 2) AS med_disc
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_median_percentiles(spark, sf_dir):
    """Holistic aggregates (reference holistic/functions.json): median /
    quantile_cont/disc → Spark median / percentile / percentile(…, disc-style
    via array indexing is unnecessary: percentile_disc does not exist, but
    DuckDB quantile_disc = lower-interpolation percentile; Spark 3.5+ has
    percentile with exact interpolation and mode 'DISC' via expr)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 4).alias("med"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
        F.round(F.expr("percentile_approx(o_totalprice, 0.5, 2147483647)"), 2).alias("med_disc"),
    )


@query(
    "agg_bool_bit",
    oracle="""
    SELECT l_linestatus,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.09) AS any_big_disc,
           CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS band,
           CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bor,
           CAST(bit_xor(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bxor,
           CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_returned
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_bool_bit(spark, sf_dir):
    """bool_and/bool_or/bit_and/bit_or/bit_xor/count_if (reference
    distributive/functions.json) — all Spark natives."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.every(F.col("l_quantity") > 0).alias("all_pos"),
        F.some(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.bit_and(F.col("l_linenumber").cast("bigint")).alias("band"),
        F.bit_or(F.col("l_linenumber").cast("bigint")).alias("bor"),
        F.bit_xor(F.col("l_linenumber").cast("bigint")).alias("bxor"),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
    )


@query(
    "agg_histogram_buckets",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY 1
    """,
)
def agg_histogram_buckets(spark, sf_dir):
    """histogram-style bucketed counts (reference nested/functions.json
    `histogram`) expressed scale-stably as floor-bucket groupBy."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@query(
    "agg_any_value_first_last",
    oracle="""
    SELECT l_returnflag,
           CAST(min(l_orderkey) AS BIGINT) AS first_key,
           CAST(max(l_orderkey) AS BIGINT) AS last_key,
           CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_any_value_first_last(spark, sf_dir):
    """first/last/any_value are order-dependent (nondeterministic under
    parallelism in BOTH engines — reference distributive first/last are
    'any value' semantics too); the hashable contract uses min/max as the
    deterministic stand-ins, which is the documented rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_orderkey").alias("first_key"),
        F.max("l_orderkey").alias("last_key"),
        F.countDistinct("l_linenumber").alias("n_lines"),
    )


@query(
    "agg_regr_family",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regr_family(spark, sf_dir):
    """regr_* linear-regression aggregates (reference
    regression/functions.json) — Spark 3.4+ natives."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("n"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 6).alias("avgx"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 4).alias("avgy"),
    )


@query(
    "agg_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def agg_distinct_rows(spark, sf_dir):
    """DISTINCT (reference plan_distinct.cpp:88 — planned as hash agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_advanced_stats",
    oracle="""
    WITH st AS (
        SELECT l_returnflag AS flag,
               round(skewness(l_extendedprice), 6) AS skew,
               round(kurtosis(l_extendedprice), 6) AS kurt,
               round(ln(product(1 + l_discount / 100)), 4) AS ln_product
        FROM lineitem GROUP BY l_returnflag
    ), en AS (
        SELECT l_returnflag AS flag, round(entropy(l_linestatus), 6) AS status_entropy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT st.flag, skew, kurt, ln_product, status_entropy
    FROM st JOIN en ON st.flag = en.flag
    """,
)
def agg_advanced_stats(spark, sf_dir):
    """Advanced statistical aggregates (reference distributive/functions.json:
    skewness, kurtosis, entropy, product). DuckDB reports SAMPLE-adjusted
    skewness/kurtosis while Spark's are population moments — the adjustments
    are exact algebra on (n, population moment):
      skew_sample = skew_pop * sqrt(n(n-1)) / (n-2)
      kurt_sample = ((n+1)*kurt_pop + 6) * (n-1) / ((n-2)(n-3))
    entropy is Shannon log2 over value frequencies (two-level aggregation);
    product is compared in log space (ln(product) = sum(ln) — sequential
    multiply and exp(sum ln) differ in ulps)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    skew_s = (F.skewness("l_extendedprice") * F.sqrt(n * (n - 1)) / (n - 2)).alias("_s")
    kurt_s = (((n + 1) * F.kurtosis("l_extendedprice") + 6) * (n - 1) / ((n - 2) * (n - 3))).alias("_k")
    st = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(skew_s, 6).alias("skew"),
        F.round(kurt_s, 6).alias("kurt"),
        F.round(F.sum(F.log(F.lit(1) + F.col("l_discount") / 100)), 4).alias("ln_product"),
    )
    counts = li.groupBy(F.col("l_returnflag").alias("flag"), "l_linestatus").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    en = (
        counts.withColumn("t", F.sum("c").over(Window.partitionBy("flag")))
        .groupBy("flag")
        .agg(F.round(-F.sum((F.col("c") / F.col("t")) * F.log2(F.col("c") / F.col("t"))), 6).alias("status_entropy"))
    )
    return st.join(en, "flag")


@query(
    "h2o_groupby_lowcard",
    oracle="""
    SELECT l_returnflag AS id, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v1
    FROM lineitem GROUP BY l_returnflag
    """,
)
def h2o_groupby_lowcard(spark, sf_dir):
    """H2O db-benchmark q1 shape (reference benchmark/h2oai/): sum by a
    low-cardinality key — pure map-side combine, the exchange moves 3 rows
    per mapper."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("id")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("v1")
    )


@query(
    "h2o_groupby_highcard",
    oracle="""
    SELECT l_orderkey AS id,
           CAST(floor(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 10000 AS BIGINT) AS DOUBLE)
                      / count(*)) AS BIGINT) AS v1_scaled,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey
    """,
)
def h2o_groupby_highcard(spark, sf_dir):
    """H2O q3/q5 shape: mean by a high-cardinality key (~orders count
    groups) — the partial-agg benefit shrinks as group count approaches row
    count; AQE sizes the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    num = (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) * 10000).cast("bigint").cast("double")
    return li.groupBy(F.col("l_orderkey").alias("id")).agg(
        F.floor(num / F.count(F.lit(1))).cast("bigint").alias("v1_scaled"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "h2o_top2_per_group",
    oracle="""
    SELECT id, v FROM (
        SELECT l_returnflag AS id, round(l_extendedprice, 2) AS v,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ) t WHERE rn <= 2
    """,
)
def h2o_top2_per_group(spark, sf_dir):
    """H2O q7 shape (largest two v per id): rank-and-filter window — one
    shuffle on the group key, no global sort."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select(F.col("l_returnflag").alias("id"), F.round("l_extendedprice", 2).alias("v"))
    )


@query(
    "agg_mode_mad",
    oracle="""
    WITH counts AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS c
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ), md AS (
        SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
            SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                         ORDER BY c DESC, o_orderpriority) AS rn
            FROM counts) WHERE rn = 1
    ), dev AS (
        SELECT o_orderstatus, round(mad(o_totalprice), 4) AS price_mad
        FROM orders GROUP BY o_orderstatus
    )
    SELECT md.o_orderstatus, mode_priority, price_mad
    FROM md JOIN dev ON md.o_orderstatus = dev.o_orderstatus
    """,
)
def agg_mode_mad(spark, sf_dir):
    """mode + mad (reference holistic/functions.json: mode.cpp, mad in
    quantile.cpp). `mode` is tie-broken to the smallest most-frequent value on
    BOTH engines (DuckDB's native mode leaves ties unspecified, so the oracle
    spells the same deterministic composition); `mad` = median(abs(x -
    median(x))) — Spark lacks it, composed as a two-pass median with the
    per-group median broadcast back (scale-safe: both passes are hash
    aggregates on the group key)."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("c"), "o_orderpriority")
    md = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    med = o.groupBy("o_orderstatus").agg(F.median("o_totalprice").alias("m"))
    dev = (
        o.join(F.broadcast(med), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(F.round(F.median(F.abs(F.col("o_totalprice") - F.col("m"))), 4).alias("price_mad"))
    )
    return md.join(dev, "o_orderstatus").select("o_orderstatus", "mode_priority", "price_mad")


@query(
    "h2o_groupby_median_sd",
    oracle="""
    SELECT l_returnflag AS id4, l_linestatus AS id5,
           round(median(l_extendedprice), 4) AS median_v3,
           round(stddev(l_extendedprice), 6) AS sd_v3
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def h2o_groupby_median_sd(spark, sf_dir):
    """H2O db-benchmark groupby q6 shape (reference benchmark/h2oai/group/
    queries/q06.sql: quantile_cont(v3, 0.5) + stddev(v3) BY id4, id5) —
    a holistic (median) and an algebraic (stddev) aggregate sharing one
    shuffle on a low-cardinality two-column key; rounded to absorb fp
    noise per the registry discipline."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_returnflag").alias("id4"), F.col("l_linestatus").alias("id5")
    ).agg(
        F.round(F.median("l_extendedprice"), 4).alias("median_v3"),
        F.round(F.stddev("l_extendedprice"), 6).alias("sd_v3"),
    )


@query(
    "h2o_groupby_range",
    oracle="""
    SELECT l_partkey AS id3,
           CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                - CAST(min(CAST(l_discount AS DECIMAL(4,2))) * 100 AS BIGINT) AS BIGINT) AS range_v1_v2
    FROM lineitem GROUP BY l_partkey
    """,
)
def h2o_groupby_range(spark, sf_dir):
    """H2O groupby q7 shape (q07.sql: max(v1) - min(v2) BY id3, a
    mid-cardinality key): two distributive aggregates combined post-agg;
    the subtraction runs on exact integer cents so both engines emit
    identical BIGINTs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_partkey").alias("id3")).agg(
        (F.max(money.cents("l_extendedprice")) - F.min(money.cents("l_discount"))).alias(
            "range_v1_v2"
        )
    )


@query(
    "h2o_groupby_r2",
    oracle="""
    SELECT l_returnflag AS id2, l_linestatus AS id4,
           round(pow(corr(l_quantity, l_extendedprice), 2), 6) AS r2
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def h2o_groupby_r2(spark, sf_dir):
    """H2O groupby q9 shape (q09.sql: pow(corr(v1, v2), 2) BY id2, id4):
    the squared correlation — Spark's corr is the same single-pass
    algebraic form DuckDB uses; rounded at the boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_returnflag").alias("id2"), F.col("l_linestatus").alias("id4")
    ).agg(F.round(F.pow(F.corr("l_quantity", "l_extendedprice"), 2), 6).alias("r2"))


@query(
    "h2o_groupby_sixkey",
    oracle="""
    SELECT l_returnflag AS id1, l_linestatus AS id2,
           CAST(l_orderkey % 97 AS BIGINT) AS id3,
           CAST(l_partkey % 23 AS BIGINT) AS id4,
           CAST(l_suppkey % 11 AS BIGINT) AS id5,
           CAST(l_linenumber AS BIGINT) AS id6,
           CAST(sum(CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT)) AS BIGINT) AS v3_units,
           CAST(count(*) AS BIGINT) AS count
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, l_orderkey % 97, l_partkey % 23,
             l_suppkey % 11, l_linenumber
    """,
)
def h2o_groupby_sixkey(spark, sf_dir):
    """H2O groupby q10 shape (q10.sql: sum(v3) + count(*) BY all six id
    columns — the widest-key, highest-group-count question in the suite):
    the exchange key is the full six-column tuple; partial aggregation
    still combines map-side because group count < row count. Tax sums in
    exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_returnflag").alias("id1"),
        F.col("l_linestatus").alias("id2"),
        (F.col("l_orderkey") % 97).cast("bigint").alias("id3"),
        (F.col("l_partkey") % 23).cast("bigint").alias("id4"),
        (F.col("l_suppkey") % 11).cast("bigint").alias("id5"),
        F.col("l_linenumber").cast("bigint").alias("id6"),
    ).agg(
        F.sum(money.cents("l_tax")).alias("v3_units"),
        F.count(F.lit(1)).alias("count"),
    )


@query(
    "h2o_groupby_twokey_multiavg",
    oracle="""
    SELECT l_returnflag AS id1, l_linestatus AS id2,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v1,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE)
             / 100.0 / count(*) AS v2,
           CAST(sum(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) AS DOUBLE)
             / 100.0 / count(*) AS v3,
           CAST(sum(CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT)) AS DOUBLE)
             / 100.0 / count(*) AS v4
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def h2o_groupby_twokey_multiavg(spark, sf_dir):
    """H2O db-benchmark groupby q2+q4 shapes in one entry (reference
    benchmark/h2oai/group/queries/q02.sql: sum BY id1,id2; q04.sql: three
    avgs BY id4) — completing the groupby question list (q1-q10 all
    covered). Two-key low-cardinality exchange; averages are exact
    integer-cent sums over counts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_returnflag").alias("id1"), F.col("l_linestatus").alias("id2")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("v1"),
        money.avg_money("l_extendedprice").alias("v2"),
        money.avg_money("l_discount").alias("v3"),
        money.avg_money("l_tax").alias("v4"),
    )
