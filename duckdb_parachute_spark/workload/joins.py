"""Join operator coverage (SURVEY §2.3).

Reference join strategy selection: src/execution/physical_plan/
plan_comparison_join.cpp:28-107 (equality → hash join; one inequality →
piecewise merge join; two → IEJoin; arbitrary → blockwise NLJ; tiny → NLJ);
AS-OF at plan_asof_join.cpp; positional at physical_positional_join.cpp.

Spark: equality joins shuffle or broadcast (AQE decides); inequality joins
compose equality pre-filters + range predicates so Catalyst keeps them out of
cartesian territory; AS-OF and positional are our composite operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table, maybe_broadcast
from duckdb_parachute_spark.functions import money
from duckdb_parachute_spark.operators import asof_join, distinct_on, positional_join
from duckdb_parachute_spark.workload import query


@query(
    "join_semi_exists",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi_exists(spark, sf_dir):
    """EXISTS → left-semi hash join (reference plan_comparison_join.cpp:66,
    SEMI type; Spark left_semi)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti_not_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_not_exists(spark, sf_dir):
    """NOT EXISTS → left-anti join (reference ANTI hash join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_left_outer_counts",
    oracle="""
    SELECT n_name, CAST(count(c_custkey) AS BIGINT) AS n_cust,
           CAST(coalesce(sum(CAST(round(c_acctbal*100) AS BIGINT)), 0) AS BIGINT) AS bal_cents
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def join_left_outer_counts(spark, sf_dir):
    """LEFT OUTER join preserving empty groups (reference outer_join_marker.cpp
    tracks matches; Spark native)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_cust"),
            F.coalesce(
                F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")), F.lit(0)
            ).cast("bigint").alias("bal_cents"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.k, s.k) AS nationkey,
           CAST(coalesce(c.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(coalesce(s.n_supp, 0) AS BIGINT) AS n_supp
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.k = s.k
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join of two aggregates (nations with customers but no
    suppliers and vice versa survive)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).cast("bigint").alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).cast("bigint").alias("n_supp"),
        )
    )


@query(
    "join_cross_product",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def join_cross_product(spark, sf_dir):
    """Cartesian product (reference physical_cross_product.cpp) with a
    post-filter — Catalyst plans BroadcastNestedLoopJoin on the tiny side."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("r1"), F.col("r_regionkey").alias("k1"))
    b = r.select(F.col("r_name").alias("r2"), F.col("r_regionkey").alias("k2"))
    return a.crossJoin(b).where(F.col("k1") < F.col("k2")).select("r1", "r2")


@query(
    "join_asof_purchase",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase') WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.event_type,
           p.event_id AS purchase_event_id,
           round(p.value, 2) AS purchase_value,
           p.ts AS purchase_ts
    FROM events e ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof_purchase(spark, sf_dir):
    """AS-OF join (flagship custom operator, reference physical_asof_join.cpp;
    semantics spec test/sql/join/asof/test_asof_join.test): each event joined
    to the user's most recent purchase at-or-before its timestamp.

    One shuffle on user_id for |events|+|purchases| rows — the scale-safe
    union+window strategy (see operators/asof.py)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = distinct_on(
        ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id"), "value"
        ),
        keys=["user_id", "ts"],
        order_by=[F.col("event_id").desc()],
    ).select("user_id", "ts", F.col("event_id").alias("p_event_id"), F.col("value").alias("p_value"))
    joined = asof_join(
        ev.select("event_id", "user_id", "event_type", "ts"),
        purchases,
        on="ts",
        by=["user_id"],
        direction="backward",
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("p_event_id").alias("purchase_event_id"),
        F.round("p_value", 2).alias("purchase_value"),
        F.col("ts_right").alias("purchase_ts"),
    )


@query(
    "join_range_inequality",
    cast_double=["rev1", "rev2"],
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY 1
    )
    SELECT strftime(a.d, '%Y-%m-%d') AS d1, strftime(b.d, '%Y-%m-%d') AS d2,
           a.rev AS rev1, b.rev AS rev2
    FROM daily a JOIN daily b
      ON b.d > a.d AND b.d <= a.d + INTERVAL 3 DAY
    WHERE a.rev > b.rev * 2
    """,
)
def join_range_inequality(spark, sf_dir):
    """Range (inequality) join — reference plans PiecewiseMergeJoin/IEJoin
    (physical_piecewise_merge_join.cpp, physical_iejoin.cpp). Spark-first:
    pre-aggregate to shrink inputs, then range-join the compact relation
    (day-count sized, broadcastable at any SF since days don't scale with SF)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("decimal(18,2)").alias("rev")
    )
    a = daily.select(F.col("d").alias("d1"), F.col("rev").alias("rev1"))
    b = daily.select(F.col("d").alias("d2"), F.col("rev").alias("rev2"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("d2") > F.col("d1")) & (F.col("d2") <= F.date_add(F.col("d1"), 3)),
        )
        .where(F.col("rev1") > F.col("rev2") * 2)
        .select(
            F.date_format("d1", "yyyy-MM-dd").alias("d1"),
            F.date_format("d2", "yyyy-MM-dd").alias("d2"),
            "rev1",
            "rev2",
        )
    )


@query(
    "join_positional",
    oracle="""
    SELECT r_name, n_name FROM (
        SELECT a.r_name, a.pos, b.n_name FROM
            (SELECT r_name, row_number() OVER (ORDER BY r_name) AS pos FROM region) a
            FULL OUTER JOIN
            (SELECT n_name, row_number() OVER (ORDER BY n_name) AS pos FROM nation WHERE n_nationkey < 8) b
            USING (pos))
    """,
)
def join_positional(spark, sf_dir):
    """POSITIONAL JOIN (reference physical_positional_join.cpp) — row-by-row
    alignment of two explicitly-ordered relations, NULL-padded like the
    reference's outer semantics."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 8).select("n_name")
    return positional_join(r, n, [F.col("r_name")], [F.col("n_name")]).select("r_name", "n_name")


@query(
    "join_asof_forward_tolerance",
    oracle="""
    SELECT event_id, user_id, ts, next_purchase_ts
    FROM (
        SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
               (SELECT min(CAST(p.ts AS TIMESTAMP)) FROM events p
                WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                  AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)) AS next_purchase_ts
        FROM events e WHERE e.event_type = 'click'
    )
    WHERE next_purchase_ts IS NOT NULL
      AND next_purchase_ts - ts <= INTERVAL 2 HOUR
    """,
)
def join_asof_forward_tolerance(spark, sf_dir):
    """Forward AS-OF join with tolerance (reference physical_asof_join.cpp —
    'forward' = least right ts >= left ts): each click matched to the user's
    next purchase within 2 hours, inner semantics. Same single-shuffle
    union + window rewrite as backward (operators/asof.py), on the mirrored
    ordering. Only the matched timestamp is projected (payload choice on
    equal-ts ties would be nondeterministic in any engine)."""
    from duckdb_parachute_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .distinct()
    )
    out = asof_join(
        clicks,
        purchases,
        on="ts",
        right_on="p_ts",
        by=["user_id"],
        direction="forward",
        tolerance=F.expr("INTERVAL 2 HOURS"),
        how="inner",
    )
    return out.select("event_id", "user_id", "ts", F.col("p_ts").alias("next_purchase_ts"))


@query(
    "join_salted_skew",
    oracle="""
    SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem JOIN (SELECT DISTINCT l_returnflag FROM lineitem) d USING (l_returnflag)
    GROUP BY l_returnflag
    """,
)
def join_salted_skew(spark, sf_dir):
    """Salted join for hot keys (operators/skew.py — SURVEY §4.2 scale
    posture, no reference counterpart: single-node radix partitioning has no
    executor skew). l_returnflag is maximally skewed (3 values over the whole
    fact table); salting scatters each hot key across 8 sub-partitions and
    replicates the dimension side 8×. The oracle checks the join is
    semantically a plain equi-join."""
    from duckdb_parachute_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = li.select("l_returnflag").distinct()
    joined = salted_join(li, dim, on="l_returnflag", hot_keys=["R", "A", "N"], salt=8)
    return (
        joined.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )


_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.rk
FROM region r, LATERAL (
    SELECT n_name, CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS rk
    FROM nation WHERE n_regionkey = r.r_regionkey
    ORDER BY n_name LIMIT 2
) t
"""


@query("join_lateral_topn", oracle=_LATERAL_SQL)
def join_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery (reference plans these as DelimJoin —
    physical_delim_join.cpp + flatten_dependent_join.cpp; Spark 3.4+ has
    native LATERAL). Top-2 nations per region: Catalyst decorrelates to a
    join + per-key window rank, so the execution is one shuffle, not a
    per-row replay of the subquery."""
    from duckdb_parachute_spark.workload.dialect import _views

    _views(spark, sf_dir, "region", "nation")
    return spark.sql(_LATERAL_SQL)


@query(
    "join_range_binned_followups",
    oracle="""
    SELECT p.event_id AS purchase_id, CAST(count(*) AS BIGINT) AS n_followups
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
         JOIN events e
           ON e.user_id = p.user_id
          AND e.ts >  p.ts
          AND e.ts <= p.ts + INTERVAL 10 MINUTE
    GROUP BY p.event_id
    """,
)
def join_range_binned_followups(spark, sf_dir):
    """Point-in-interval join at scale (reference PhysicalIEJoin,
    physical_iejoin.cpp; single-range PiecewiseMergeJoin): events within 10
    minutes after each purchase, counted per purchase. Catalyst would plan the
    raw inequality join as a nested loop; operators/rangejoin.py instead bins
    the time axis (bin = interval width → ≤2 bins per interval) and hash-joins
    on (user_id, bin) — linear shuffle volume at any scale."""
    from duckdb_parachute_spark.operators.rangejoin import point_in_interval_join

    ev = load_table(spark, sf_dir, "events")
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731 - UTC session: NTZ cast is zone-free
    points = ev.select(F.col("user_id"), micros("ts").alias("t"))
    win = F.lit(600 * 1_000_000)  # 10 minutes in micros
    intervals = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            micros("ts").alias("lo"),
            (micros("ts") + win).alias("hi"),
        )
    )
    joined = point_in_interval_join(
        points, intervals, point="t", lo="lo", hi="hi",
        bin_width=600e6, by=["user_id"], lo_open=True,
    )
    return joined.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_followups"))


@query(
    "h2o_join_shapes",
    cast_double=["v"],
    oracle="""
    SELECT 'small' AS side, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    UNION ALL
    SELECT 'medium', CAST(count(*) AS BIGINT),
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2))
    FROM lineitem JOIN part ON l_partkey = p_partkey
    UNION ALL
    SELECT 'big', CAST(count(*) AS BIGINT),
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2))
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def h2o_join_shapes(spark, sf_dir):
    """H2O db-benchmark join suite shapes (reference benchmark/h2oai/,
    test/db-benchmark/): fact joined to small / medium / big right sides.
    Small+medium broadcast (supplier 1e3, part 2e4 rows at sf1 ratios); the
    big side (orders, same order of magnitude as the fact) shuffles on the
    key — exactly the three physical strategies AQE should pick unaided."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")

    def leg(tag, joined):
        return joined.agg(
            F.lit(tag).alias("side"),
            F.count(F.lit(1)).alias("n"),
            money.sum_money("l_extendedprice", out="decimal(20,2)").alias("v"),
        ).select("side", "n", "v")

    return (
        leg("small", li.join(s, F.col("l_suppkey") == F.col("s_suppkey")))
        .unionAll(leg("medium", li.join(p, F.col("l_partkey") == F.col("p_partkey"))))
        .unionAll(leg("big", li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))))
    )


@query(
    "h2o_join_small_int",
    cast_double=["v1", "v2"],
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v1,
           CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v2
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    """,
)
def h2o_join_small_int(spark, sf_dir):
    """H2O join q01 (reference benchmark/h2oai/join/queries/q01.sql:
    x JOIN small USING (id1)): fact joined to the SMALL side on an int key,
    then the suite's count/sum checksum. supplier is x/1e6-sized in the
    h2o ratios — the broadcast gate keeps the hint while it fits."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return li.join(
        maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        money.sum_money("l_extendedprice", out="decimal(20,2)").alias("v1"),
        money.sum_money("s_acctbal", out="decimal(20,2)").alias("v2"),
    )


@query(
    "h2o_join_medium_int",
    cast_double=["v1", "v2"],
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v1,
           CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v2
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def h2o_join_medium_int(spark, sf_dir):
    """H2O join q02 (q02.sql: x JOIN medium USING (id2)): the MEDIUM side
    (x/1e3-sized) on an int key — the regime where the broadcast-vs-shuffle
    decision actually flips with scale, which is exactly what the size gate
    (catalog.maybe_broadcast) decides from the on-disk footprint."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return li.join(
        maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        money.sum_money("l_extendedprice", out="decimal(20,2)").alias("v1"),
        money.sum_money("p_retailprice", out="decimal(20,2)").alias("v2"),
    )


@query(
    "h2o_join_medium_left",
    cast_double=["v1", "v2"],
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(p_partkey) AS BIGINT) AS matched,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v1,
           CAST(sum(CASE WHEN p_partkey IS NOT NULL THEN CAST(p_retailprice AS DECIMAL(12,2)) END) AS DECIMAL(20,2)) AS v2
    FROM lineitem LEFT JOIN (SELECT * FROM part WHERE p_size <= 25) p ON l_partkey = p_partkey
    """,
)
def h2o_join_medium_left(spark, sf_dir):
    """H2O join q03 (q03.sql: x LEFT JOIN medium USING (id2)): the
    row-preserving outer variant — misses survive with NULL payload (the
    medium side is size-filtered so misses actually occur), checksums count
    both total and matched rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    return li.join(
        maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"), "left"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("p_partkey").alias("matched"),
        money.sum_money("l_extendedprice", out="decimal(20,2)").alias("v1"),
        money.units_to_decimal(
            F.sum(F.when(F.col("p_partkey").isNotNull(), money.cents("p_retailprice"))),
            2,
            "decimal(20,2)",
        ).alias("v2"),
    )


@query(
    "h2o_join_string_key",
    cast_double=["v1", "v2"],
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v1,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v2
    FROM (SELECT *, 'id' || CAST(o_custkey AS VARCHAR) AS sk FROM orders) x
    JOIN (SELECT *, 'id' || CAST(c_custkey AS VARCHAR) AS sk FROM customer) m
      USING (sk)
    """,
)
def h2o_join_string_key(spark, sf_dir):
    """H2O join q04 (q04.sql: x JOIN medium USING (id5) — the STRING-key
    variant): both sides derive an 'id<N>' string key (h2o's id5 format)
    and join on it — same cardinality as the int join, but the hash table
    keys are strings, which is the suite's point (string hashing +
    comparison cost)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "sk", F.concat(F.lit("id"), F.col("o_custkey").cast("string"))
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "sk", F.concat(F.lit("id"), F.col("c_custkey").cast("string"))
    )
    return o.join(maybe_broadcast(c, sf_dir, "customer"), "sk").agg(
        F.count(F.lit(1)).alias("n"),
        money.sum_money("o_totalprice", out="decimal(20,2)").alias("v1"),
        money.sum_money("c_acctbal", out="decimal(20,2)").alias("v2"),
    )


@query(
    "h2o_join_big_big",
    cast_double=["v1", "v2"],
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v1,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v2
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def h2o_join_big_big(spark, sf_dir):
    """H2O join q05 (q05.sql: x JOIN big USING (id3)): both sides scale
    with the dataset — at 100 TB neither fits an executor, so this MUST run
    as a co-partitioned shuffle join. orders never gets a broadcast hint
    (it is not behind maybe_broadcast here, deliberately): both sides
    exchange on the key and AQE cannot be tempted into an OOM broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).agg(
        F.count(F.lit(1)).alias("n"),
        money.sum_money("l_extendedprice", out="decimal(20,2)").alias("v1"),
        money.sum_money("o_totalprice", out="decimal(20,2)").alias("v2"),
    )


def _bucketed_join_sides(spark, sf_dir):
    """Write-once bucketed copies of lineitem/orders for `join_bucketed_big_big`
    and return the two table DataFrames. Storage-bucketed joins are the 100 TB
    answer to the big-big shuffle plateau (BASELINE.md round-7 scale points):
    both sides are bucketed on the join key with the SAME bucket count
    (df.write.bucketBy(n, key).sortBy(key).saveAsTable — sources.write_bucketed),
    so the join plans with ZERO exchanges: every task pairs bucket i with
    bucket i, the exact co-located strategy the reference gets from its
    partitioning-aware planner (reference
    src/execution/physical_plan/plan_aggregate.cpp:33). Bucket count is
    data-scaled via scaled_shuffle_partitions — the same dial as every other
    partition decision. The write is amortized setup (like the persisted IVF
    index in sim_ivf_pruned_probe): tables are rebuilt only when absent or
    pointing at a different sf_dir."""
    import re

    from duckdb_parachute_spark.session import scaled_shuffle_partitions
    from duckdb_parachute_spark.sources import write_bucketed

    tag = re.sub(r"[^0-9a-z]", "_", sf_dir.lower()).strip("_")
    t_li, t_o = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    n = scaled_shuffle_partitions(sf_dir)
    if not spark.catalog.tableExists(t_li) or not spark.catalog.tableExists(t_o):
        # The in-memory catalog forgets managed tables across sessions while
        # their warehouse directories persist; clear any stale location so
        # saveAsTable doesn't refuse (LOCATION_ALREADY_EXISTS).
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
        for t in (t_li, t_o):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_quantity"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        write_bucketed(li, t_li, ["l_orderkey"], n, sort_cols=["l_orderkey"])
        write_bucketed(o, t_o, ["o_orderkey"], n, sort_cols=["o_orderkey"])
    return spark.table(t_li), spark.table(t_o)


@query(
    "join_bucketed_big_big",
    cast_double=["v1", "v2"],
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v1,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS v2
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bucketed_big_big(spark, sf_dir):
    """The storage answer to h2o_join_big_big's shuffle plateau: the SAME
    big-big join, but over bucketed tables — the join itself runs with NO
    Exchange (plan-pinned: tests/test_plans.py::test_bucketed_query_join_no_exchange);
    the only shuffle left is the small grouped aggregate after it. The
    merge hint keeps AQE/broadcast from hiding the storage win at small SF;
    at 100 TB broadcast is impossible anyway and this hint-free plan family
    is what a 1000-executor cluster runs."""
    li, o = _bucketed_join_sides(spark, sf_dir)
    return (
        li.hint("merge")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money.sum_money("l_extendedprice", out="decimal(20,2)").alias("v1"),
            money.sum_money("o_totalprice", out="decimal(20,2)").alias("v2"),
        )
        .orderBy("o_orderpriority")
    )
