"""TPC-DS shapes, fifth tranche (round 7): the 31 remaining query numbers —
q4/q7/q10/q11/q14/q18/q19/q20/q22/q24/q26/q29/q30/q33/q37/q40/q42/q43/q52/
q55/q57/q60/q68/q69/q71/q73/q81/q82/q84/q91/q98 — completing TPC-DS 99/99.

Reference queries: /root/reference/extension/tpcds/dsdgen/queries/*.sql —
same adaptation contract as workload/tpcds.py (the driver testdata has no
TPC-DS tables, so each port keeps the reference query's OPERATOR SHAPE and
rebinds it to the TPC-H tables: channels = lineitem returnflag slices
(N=web, A=catalog, R=returns) or orders (store), item=part, geography=
nation/region, demographics=c_mktsegment/o_orderpriority, time-of-day=
events.ts).

Determinism contract inherited from tpcds.py: exact DECIMAL money until the
hash-safe double boundary, averages as exact-sum/count double quotients,
identical aliases both sides, every ORDER BY+LIMIT carries a unique
tiebreaker with explicit NULLS placement. events.value is NOT guaranteed
2-decimal, so it is quantized to DECIMAL(12,2) by the same CAST on both
sides before any sum (clickbench.py discipline).

Scale notes applying to the whole tranche (100 TB posture):
- year-pair growth queries (q4/q11) use the CONDITIONAL-AGGREGATION
  formulation: each channel produces (cust, t96, t97) in ONE shuffle,
  replacing the reference's 6-way self-join of the year_total CTE — same
  result set, 3 fact shuffles total instead of 6 CTE scans + a 6-way join.
- every ROLLUP pre-aggregates to the finest grain BEFORE the Expand
  (Expand multiplies O(groups), not O(fact)).
- dimension joins go through the size-gated catalog.maybe_broadcast.
- scalar thresholds (q14/q24) are 1-row aggregates cross-joined
  (broadcast) — never a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table, maybe_broadcast
from duckdb_parachute_spark.functions import money
from duckdb_parachute_spark.operators.cte import materialized_cte
from duckdb_parachute_spark.workload import query

_TS96 = "TIMESTAMP '1996-01-01 00:00:00'"
_TS97 = "TIMESTAMP '1997-01-01 00:00:00'"
_TS98 = "TIMESTAMP '1998-01-01 00:00:00'"

_DEC = "decimal(12,2)"


def _ntz(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


def _avg_exact(col, scale: int = 2):
    """Exact-sum / count average of a 2-decimal money column, in double —
    the only average spelling whose IEEE result both engines share."""
    return F.sum(money.cents(col)).cast("double") / F.lit(float(10**scale)) / F.count(F.lit(1))


# Oracle fragment for the same exact average.
def _avg_sql(col: str) -> str:
    return f"CAST(sum(CAST({col} AS DECIMAL(12,2))) AS DOUBLE) / count(*)"


# ---------------------------------------------------------------------------
# q4 / q11 — cross-channel year-pair growth CTEs
# ---------------------------------------------------------------------------


def _year_pair(df, key, date_col, value_col, y1=1996, y2=1997):
    """(cust, t96, t97) per customer in ONE aggregation pass — the
    conditional-aggregation replacement for the reference's year_total CTE
    self-joined per (channel, year)."""
    yr = F.year(date_col)
    return df.groupBy(F.col(key).alias("cust")).agg(
        money.units_to_decimal(
            F.sum(F.when(yr == y1, money.cents(value_col))), 2, "decimal(22,2)"
        ).alias("t1"),
        money.units_to_decimal(
            F.sum(F.when(yr == y2, money.cents(value_col))), 2, "decimal(22,2)"
        ).alias("t2"),
    )


@query(
    "tpcds_q4_threechannel_growth",
    oracle=f"""
    WITH store_y AS (
        SELECT o_custkey AS cust,
               CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t1,
               CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t2
        FROM orders WHERE o_orderdate >= {_TS96} AND o_orderdate < {_TS98}
        GROUP BY o_custkey
    ), web_y AS (
        SELECT o_custkey AS cust,
               CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t1,
               CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t2
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'N' AND l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
        GROUP BY o_custkey
    ), cat_y AS (
        SELECT o_custkey AS cust,
               CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t1,
               CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t2
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'A' AND l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, c_mktsegment
    FROM store_y s JOIN web_y w ON s.cust = w.cust
         JOIN cat_y x ON s.cust = x.cust
         JOIN customer ON s.cust = c_custkey
    WHERE s.t1 > 0 AND w.t1 > 0 AND x.t1 > 0
      AND CAST(x.t2 AS DOUBLE) / CAST(x.t1 AS DOUBLE) > CAST(s.t2 AS DOUBLE) / CAST(s.t1 AS DOUBLE)
      AND CAST(x.t2 AS DOUBLE) / CAST(x.t1 AS DOUBLE) > CAST(w.t2 AS DOUBLE) / CAST(w.t1 AS DOUBLE)
    ORDER BY c_custkey
    LIMIT 100
    """,
)
def tpcds_q4(spark, sf_dir):
    """TPC-DS Q4 shape (queries/04.sql): THREE-channel year_total CTE,
    customers whose catalog growth ratio beats both store and web growth.
    The reference spells it as a 6-way self-join of one year_total CTE;
    here each channel computes (cust, y1996, y1997) by conditional
    aggregation in a single shuffle, and the three channel aggregates join
    co-partitioned on the customer key — identical result set, half the
    fact passes. Growth ratios are double quotients of exact decimals; a
    customer missing any (channel, year) cell yields a NULL ratio and is
    excluded, exactly like the reference's inner self-joins."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    o96 = o.where((F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00")) & (F.col("o_orderdate") < _ntz("1998-01-01 00:00:00")))
    li2 = li.where((F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00")) & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00")))
    li_o = li2.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    store = _year_pair(o96, "o_custkey", "o_orderdate", "o_totalprice")
    web = _year_pair(
        li_o.where(F.col("l_returnflag") == "N"), "o_custkey", "l_shipdate", "l_extendedprice"
    ).withColumnRenamed("cust", "w_cust").withColumnRenamed("t1", "w1").withColumnRenamed("t2", "w2")
    cat = _year_pair(
        li_o.where(F.col("l_returnflag") == "A"), "o_custkey", "l_shipdate", "l_extendedprice"
    ).withColumnRenamed("cust", "x_cust").withColumnRenamed("t1", "x1").withColumnRenamed("t2", "x2")
    ratio = lambda hi, lo: F.col(hi).cast("double") / F.col(lo).cast("double")  # noqa: E731
    return (
        store.join(web, F.col("cust") == F.col("w_cust"))
        .join(cat, F.col("cust") == F.col("x_cust"))
        .where(
            (F.col("t1") > 0) & (F.col("w1") > 0) & (F.col("x1") > 0)
            & (ratio("x2", "x1") > ratio("t2", "t1"))
            & (ratio("x2", "x1") > ratio("w2", "w1"))
        )
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("cust") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "tpcds_q11_twochannel_growth_detail",
    oracle=f"""
    WITH store_y AS (
        SELECT o_custkey AS cust,
               CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t1,
               CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS t2
        FROM orders WHERE o_orderdate >= {_TS96} AND o_orderdate < {_TS98}
        GROUP BY o_custkey
    ), web_y AS (
        SELECT o_custkey AS cust,
               CAST(CAST(sum(CASE WHEN year(l_shipdate) = 1996
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) END)
                    AS DECIMAL(27,0)) / 10000 AS DECIMAL(22,4)) AS t1,
               CAST(CAST(sum(CASE WHEN year(l_shipdate) = 1997
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) END)
                    AS DECIMAL(27,0)) / 10000 AS DECIMAL(22,4)) AS t2
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'N' AND l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, c_mktsegment
    FROM store_y s JOIN web_y w ON s.cust = w.cust
         JOIN customer ON s.cust = c_custkey
    WHERE s.t1 > 0 AND w.t1 > 0
      AND CAST(w.t2 AS DOUBLE) / CAST(w.t1 AS DOUBLE) > CAST(s.t2 AS DOUBLE) / CAST(s.t1 AS DOUBLE)
    ORDER BY c_mktsegment, c_custkey
    LIMIT 100
    """,
)
def tpcds_q11(spark, sf_dir):
    """TPC-DS Q11 shape (queries/11.sql): two-channel year_total growth
    (Q4's little sibling) with the customer DETAIL projection and ordering
    on a demographic attribute. Web value uses the discounted price
    (ext_list_price - ext_discount_amt analog) in exact 1e-4 integer
    units. Same conditional-aggregation plan as Q4: one shuffle per
    channel, customer-key co-partitioned joins."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    o96 = o.where((F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00")) & (F.col("o_orderdate") < _ntz("1998-01-01 00:00:00")))
    store = _year_pair(o96, "o_custkey", "o_orderdate", "o_totalprice")
    li_o = (
        li.where(
            (F.col("l_returnflag") == "N")
            & (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    yr = F.year("l_shipdate")
    web = li_o.groupBy(F.col("o_custkey").alias("w_cust")).agg(
        money.units_to_decimal(
            F.sum(F.when(yr == 1996, money.disc_price_units())), 4, "decimal(22,4)"
        ).alias("w1"),
        money.units_to_decimal(
            F.sum(F.when(yr == 1997, money.disc_price_units())), 4, "decimal(22,4)"
        ).alias("w2"),
    )
    return (
        store.join(web, F.col("cust") == F.col("w_cust"))
        .where(
            (F.col("t1") > 0) & (F.col("w1") > 0)
            & (
                F.col("w2").cast("double") / F.col("w1").cast("double")
                > F.col("t2").cast("double") / F.col("t1").cast("double")
            )
        )
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("cust") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_mktsegment", "c_custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q7 / q26 — demographics + promotion star with four averages
# ---------------------------------------------------------------------------


@query(
    "tpcds_q7_demo_promo_item_avgs",
    oracle=f"""
    SELECT p_brand,
           {_avg_sql('l_quantity')} AS agg1,
           {_avg_sql('l_extendedprice')} AS agg2,
           {_avg_sql('l_tax')} AS agg3,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))) AS DOUBLE)
             / 10000.0 / count(*) AS agg4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_orderpriority = '1-URGENT'
      AND (o_orderstatus = 'O' OR l_linestatus = 'F')
      AND l_shipdate >= {_TS96} AND l_shipdate < {_TS97}
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 100
    """,
)
def tpcds_q7(spark, sf_dir):
    """TPC-DS Q7 shape (queries/07.sql: store_sales x customer_demographics
    x promotion x item — one demographic point filter, one promotion OR
    disjunction, four per-item averages): demographics map to the order
    priority, the promotion email/event disjunction to orderstatus/
    linestatus, item to part. All four averages are exact-integer-sum /
    count double quotients; one fact shuffle on the group key."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where((F.col("o_orderstatus") == "O") | (F.col("l_linestatus") == "F"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            _avg_exact("l_quantity").alias("agg1"),
            _avg_exact("l_extendedprice").alias("agg2"),
            _avg_exact("l_tax").alias("agg3"),
            (
                F.sum(money.disc_price_units()).cast("double")
                / F.lit(10000.0)
                / F.count(F.lit(1))
            ).alias("agg4"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


@query(
    "tpcds_q26_catalog_demo_avgs",
    oracle=f"""
    SELECT p_brand,
           {_avg_sql('l_quantity')} AS agg1,
           {_avg_sql('l_extendedprice')} AS agg2,
           {_avg_sql('l_discount')} AS agg3,
           {_avg_sql('o_totalprice')} AS agg4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE l_returnflag = 'R'
      AND c_mktsegment = 'MACHINERY'
      AND (o_orderpriority = '5-LOW' OR o_orderpriority = '4-NOT SPECIFIED')
      AND l_shipdate >= {_TS97} AND l_shipdate < {_TS98}
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 100
    """,
)
def tpcds_q26(spark, sf_dir):
    """TPC-DS Q26 shape (queries/26.sql): Q7's template on the CATALOG
    channel — catalog_sales maps to the R-flagged slice, the bill-customer
    demographic filter to the customer segment, the promotion disjunction
    to order priorities. Same exact-average discipline, one fact
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= _ntz("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED")
    )
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            _avg_exact("l_quantity").alias("agg1"),
            _avg_exact("l_extendedprice").alias("agg2"),
            _avg_exact("l_discount").alias("agg3"),
            _avg_exact("o_totalprice").alias("agg4"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q10 / q69 — demographic count batteries gated by EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------


@query(
    "tpcds_q10_demo_exists_battery",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS cnt1,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS est_bucket,
           count(*) AS cnt2,
           c_nationkey,
           count(*) AS cnt3
    FROM customer
    WHERE c_nationkey IN (0, 1, 2, 3, 4)
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= {_TS96} AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00')
      AND (EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   WHERE o_custkey = c_custkey AND l_returnflag = 'N'
                     AND l_shipdate >= {_TS96} AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00')
           OR EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey = c_custkey AND l_returnflag = 'A'
                        AND l_shipdate >= {_TS96} AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'))
    GROUP BY c_mktsegment, CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT), c_nationkey
    ORDER BY c_mktsegment, est_bucket, c_nationkey
    LIMIT 100
    """,
)
def tpcds_q10(spark, sf_dir):
    """TPC-DS Q10 shape (queries/10.sql): county-filtered customers that
    bought in a store window AND (web OR catalog) window, demographic
    counts repeated per attribute. The OR of two EXISTS becomes ONE
    left-semi join against the UNION of the two channels' customer-key
    sets (set-union preserves EXISTS-OR semantics exactly); the store
    EXISTS is a second semi-join. No row multiplication anywhere — the
    semi-joins keep customer grain."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(0, 1, 2, 3, 4))
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w_lo, w_hi = _ntz("1996-01-01 00:00:00"), _ntz("1996-07-01 00:00:00")
    store_keys = o.where((F.col("o_orderdate") >= w_lo) & (F.col("o_orderdate") < w_hi)).select(
        F.col("o_custkey").alias("k")
    )
    li_win = li.where((F.col("l_shipdate") >= w_lo) & (F.col("l_shipdate") < w_hi))
    li_o = li_win.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    web_or_cat = (
        li_o.where(F.col("l_returnflag") == "N")
        .select(F.col("o_custkey").alias("k"))
        .unionAll(li_o.where(F.col("l_returnflag") == "A").select(F.col("o_custkey").alias("k")))
    )
    bucket = (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long")
    return (
        c.join(store_keys, F.col("c_custkey") == F.col("k"), "left_semi")
        .join(web_or_cat, F.col("c_custkey") == F.col("k"), "left_semi")
        .groupBy("c_mktsegment", bucket.alias("est_bucket"), "c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "c_mktsegment",
            F.col("cnt").alias("cnt1"),
            "est_bucket",
            F.col("cnt").alias("cnt2"),
            "c_nationkey",
            F.col("cnt").alias("cnt3"),
        )
        .orderBy("c_mktsegment", "est_bucket", "c_nationkey")
        .limit(100)
    )


@query(
    "tpcds_q69_demo_not_exists",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS cnt1,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS est_bucket,
           count(*) AS cnt2
    FROM customer
    WHERE c_nationkey IN (5, 6, 7)
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= {_TS97} AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00')
      AND NOT EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey = c_custkey AND l_returnflag = 'N'
                        AND l_shipdate >= {_TS97} AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
      AND NOT EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey = c_custkey AND l_returnflag = 'A'
                        AND l_shipdate >= {_TS97} AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
    GROUP BY c_mktsegment, CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT)
    ORDER BY c_mktsegment, est_bucket
    LIMIT 100
    """,
)
def tpcds_q69(spark, sf_dir):
    """TPC-DS Q69 shape (queries/69.sql): Q10's template with the channel
    gates NEGATED — bought in store but in NEITHER web nor catalog. The
    two NOT EXISTS collapse to ONE left-anti join against the UNION of the
    channels' key sets (De Morgan: not-in-A and not-in-B == not-in-(A∪B));
    the store EXISTS stays a semi-join."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(5, 6, 7))
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w_lo, w_hi = _ntz("1997-01-01 00:00:00"), _ntz("1997-07-01 00:00:00")
    store_keys = o.where((F.col("o_orderdate") >= w_lo) & (F.col("o_orderdate") < w_hi)).select(
        F.col("o_custkey").alias("k")
    )
    li_o = (
        li.where(
            (F.col("l_shipdate") >= w_lo)
            & (F.col("l_shipdate") < w_hi)
            & F.col("l_returnflag").isin("N", "A")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("k"))
    )
    bucket = (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long")
    return (
        c.join(store_keys, F.col("c_custkey") == F.col("k"), "left_semi")
        .join(li_o, F.col("c_custkey") == F.col("k"), "left_anti")
        .groupBy("c_mktsegment", bucket.alias("est_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "c_mktsegment",
            F.col("cnt").alias("cnt1"),
            "est_bucket",
            F.col("cnt").alias("cnt2"),
        )
        .orderBy("c_mktsegment", "est_bucket")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q14 — cross-channel INTERSECT + average-sales threshold
# ---------------------------------------------------------------------------


@query(
    "tpcds_q14_cross_channel_intersect",
    cast_double=["sum_sales"],
    oracle=f"""
    WITH cross_keys AS (
        SELECT p_brand, p_type FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'N' AND l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
        INTERSECT
        SELECT p_brand, p_type FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'A' AND l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
        INTERSECT
        SELECT p_brand, p_type FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
    ), cross_items AS (
        SELECT p_partkey FROM part JOIN cross_keys USING (p_brand, p_type)
    ), avg_sales AS (
        SELECT CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*) AS average_sales
        FROM lineitem WHERE l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
    )
    SELECT channel, p_brand,
           CAST(sum_units AS DECIMAL(27,0)) / 100 AS sum_sales
    FROM (
        SELECT CASE l_returnflag WHEN 'N' THEN 'web' WHEN 'A' THEN 'catalog' ELSE 'store' END AS channel,
               p_brand,
               sum(CAST(l_quantity AS BIGINT)
                   * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sum_units
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= {_TS96} AND l_shipdate < {_TS98}
          AND l_partkey IN (SELECT p_partkey FROM cross_items)
        GROUP BY 1, 2
    ) per
    WHERE CAST(sum_units AS DOUBLE) / 100.0 > (SELECT average_sales FROM avg_sales)
    ORDER BY channel, p_brand
    LIMIT 100
    """,
)
def tpcds_q14(spark, sf_dir):
    """TPC-DS Q14 shape (queries/14.sql): cross_items = item keys present
    in ALL THREE channels (INTERSECT chain), avg_sales = scalar average of
    quantity*price over the channel union, then per-channel per-brand sums
    over cross_items only, kept if above the scalar. The INTERSECT runs on
    deduped (brand, type) key sets (dimension-sized); the scalar threshold
    is a 1-row aggregate cross-joined (broadcast) — no driver collect.

    Round 8 (VERDICT item 2 — multi-consumer CTE): the fact+part join used
    to be consumed FOUR times (3 channel key-sets + the grouped pass), and
    per-consumer pruning forks Catalyst's plan into four full fact scans.
    Now ONE pass pre-aggregates it to (returnflag, brand, type, partkey)
    grain — dimension-sized, ≤ |part|×3 rows — and that base aggregate is
    materialized once (`materialized_cte`, reference physical_cte.cpp:112);
    key-sets, INTERSECT chain, and per-channel sums are all derived from
    the materialized rows. Fact scans: 2 (base agg + the avg_sales scalar,
    which the oracle defines over lineitem WITHOUT the part join — kept
    separate rather than assuming FK integrity). Plan-pinned in
    tests/test_plans.py."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part")
    qty_units = F.col("l_quantity").cast("long") * money.cents("l_extendedprice")
    base = materialized_cte(
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_returnflag", "p_brand", "p_type", "l_partkey")
        .agg(F.sum(qty_units).alias("units"))
    )

    def chan_keys(flag):
        return base.where(F.col("l_returnflag") == flag).select("p_brand", "p_type").distinct()

    cross_keys = chan_keys("N").intersect(chan_keys("A")).intersect(chan_keys("R"))
    cross_items = (
        base.select("p_brand", "p_type", "l_partkey")
        .distinct()
        .join(cross_keys, ["p_brand", "p_type"])
        .select(F.col("l_partkey").alias("ck"))
        .distinct()
    )
    avg_sales = li.agg(
        (F.sum(qty_units).cast("double") / F.lit(100.0) / F.count(F.lit(1))).alias(
            "average_sales"
        )
    )
    channel = (
        F.when(F.col("l_returnflag") == "N", "web")
        .when(F.col("l_returnflag") == "A", "catalog")
        .otherwise("store")
    )
    per = (
        base.join(cross_items, F.col("l_partkey") == F.col("ck"), "left_semi")
        .groupBy(channel.alias("channel"), "p_brand")
        .agg(F.sum("units").alias("sum_units"))
    )
    return (
        per.crossJoin(F.broadcast(avg_sales))
        .where(F.col("sum_units").cast("double") / F.lit(100.0) > F.col("average_sales"))
        .select(
            "channel",
            "p_brand",
            (F.col("sum_units").cast("decimal(27,0)") / 100).alias("sum_sales"),
        )
        .orderBy("channel", "p_brand")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q18 / q22 — ROLLUP hierarchies of exact averages
# ---------------------------------------------------------------------------


@query(
    "tpcds_q18_demo_geo_rollup_avgs",
    oracle=f"""
    SELECT p_brand, r_name, n_name,
           {_avg_sql('l_quantity')} AS agg1,
           {_avg_sql('l_extendedprice')} AS agg2,
           {_avg_sql('l_discount')} AS agg3,
           {_avg_sql('c_acctbal')} AS agg4,
           {_avg_sql('l_tax')} AS agg5
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN part ON l_partkey = p_partkey
    WHERE l_returnflag = 'A'
      AND (c_custkey % 12) IN (1, 2, 6, 8, 9)
      AND l_shipdate >= {_TS96} AND l_shipdate < {_TS97}
      AND n_regionkey IN (0, 1, 2)
    GROUP BY ROLLUP (p_brand, r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, p_brand NULLS FIRST
    LIMIT 100
    """,
)
def tpcds_q18(spark, sf_dir):
    """TPC-DS Q18 shape (queries/18.sql: catalog_sales x two demographics x
    customer_address — seven averages under ROLLUP(item, country, state,
    county)): birth-month filter maps to a custkey residue class, the
    address hierarchy to region/nation. The fact PRE-AGGREGATES to
    (sum_units, count) partials at the finest (brand, region, nation)
    grain BEFORE the rollup Expand — Expand multiplies the dimension-sized
    aggregate, never the fact — and every average is the exact partial-sum
    quotient at the final grain (never an average of averages)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "A")
        & (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where((F.col("c_custkey") % 12).isin(1, 2, 6, 8, 9))
    n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey").isin(0, 1, 2))
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(maybe_broadcast(r, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
    )
    cols = ["l_quantity", "l_extendedprice", "l_discount", "c_acctbal", "l_tax"]
    fine = joined.groupBy("p_brand", "r_name", "n_name").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(money.cents(col)).alias(f"__s{i}") for i, col in enumerate(cols)],
    )
    rolled = fine.rollup("p_brand", "r_name", "n_name").agg(
        F.sum("__n").alias("__n"),
        *[F.sum(f"__s{i}").alias(f"__s{i}") for i in range(len(cols))],
    )
    out = rolled.select(
        "p_brand",
        "r_name",
        "n_name",
        *[
            (F.col(f"__s{i}").cast("double") / F.lit(100.0) / F.col("__n")).alias(f"agg{i + 1}")
            for i in range(len(cols))
        ],
    )
    return out.orderBy(
        F.col("r_name").asc_nulls_first(),
        F.col("n_name").asc_nulls_first(),
        F.col("p_brand").asc_nulls_first(),
    ).limit(100)


@query(
    "tpcds_q22_inventory_rollup_qoh",
    oracle=f"""
    SELECT p_name, p_brand, p_type, p_size,
           {_avg_sql('l_quantity')} AS qoh
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= {_TS96} AND l_shipdate < {_TS97}
    GROUP BY ROLLUP (p_name, p_brand, p_type, p_size)
    ORDER BY qoh NULLS FIRST, p_name NULLS FIRST, p_brand NULLS FIRST,
             p_type NULLS FIRST, p_size NULLS FIRST
    LIMIT 100
    """,
)
def tpcds_q22(spark, sf_dir):
    """TPC-DS Q22 shape (queries/22.sql: average inventory quantity-on-hand
    under a FOUR-level product ROLLUP, ordered by the average itself):
    inventory maps to the shipped-quantity fact. Same pre-aggregate-then-
    Expand discipline as q18 — the rollup runs over the part-grain
    aggregate; qoh is the exact integer-sum / count quotient, so both
    engines sort identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part")
    fine = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_name", "p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(money.cents("l_quantity")).alias("__s"))
    )
    return (
        fine.rollup("p_name", "p_brand", "p_type", "p_size")
        .agg(F.sum("__n").alias("__n"), F.sum("__s").alias("__s"))
        .select(
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            (F.col("__s").cast("double") / F.lit(100.0) / F.col("__n")).alias("qoh"),
        )
        .orderBy(
            F.col("qoh").asc_nulls_first(),
            F.col("p_name").asc_nulls_first(),
            F.col("p_brand").asc_nulls_first(),
            F.col("p_type").asc_nulls_first(),
            F.col("p_size").asc_nulls_first(),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — brand revenue under a geography-mismatch filter
# ---------------------------------------------------------------------------


@query(
    "tpcds_q19_brand_geo_mismatch",
    cast_double=["ext_price"],
    oracle=f"""
    SELECT p_brand,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS ext_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size BETWEEN 1 AND 10
      AND year(l_shipdate) = 1996 AND month(l_shipdate) = 12
      AND c_nationkey <> s_nationkey
    GROUP BY p_brand
    ORDER BY ext_price DESC, p_brand
    LIMIT 100
    """,
)
def tpcds_q19(spark, sf_dir):
    """TPC-DS Q19 shape (queries/19.sql: brand revenue for one month where
    the customer's zip prefix differs from the store's — the
    cross-geography purchase filter): zip mismatch maps to customer-nation
    <> supplier-nation, the manager filter to a part size band. The
    mismatch predicate is evaluated post-join on two broadcast dims; one
    fact shuffle on brand."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == 1996) & (F.month("l_shipdate") == 12)
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size").between(1, 10))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("p_brand")
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("ext_price"))
        .orderBy(F.desc("ext_price"), "p_brand")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q20 / q98 — revenue with ratio-to-class-total (q12 family, other channels)
# ---------------------------------------------------------------------------


@query(
    "tpcds_q20_catalog_revenue_ratio",
    cast_double=["itemrevenue"],
    oracle=f"""
    SELECT p_partkey, p_name, p_type,
           CAST(itemrevenue AS DECIMAL(18,2)) AS itemrevenue,
           CAST(CAST(itemrevenue AS DECIMAL(18,2)) AS DOUBLE) * 100.0
             / CAST(CAST(sum(itemrevenue) OVER (PARTITION BY p_type) AS DECIMAL(18,2)) AS DOUBLE) AS revenueratio
    FROM (
        SELECT p_partkey, p_name, p_type,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS itemrevenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'A'
          AND p_type IN ('ECONOMY', 'PROMO', 'STANDARD')
          AND l_shipdate >= TIMESTAMP '1996-02-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-03-01 00:00:00'
        GROUP BY p_partkey, p_name, p_type
    ) g
    ORDER BY p_type, p_partkey
    """,
)
def tpcds_q20(spark, sf_dir):
    """TPC-DS Q20 shape (queries/20.sql): Q12's ratio-to-class-total on the
    CATALOG channel at item grain with a category IN-list. One fact
    shuffle to the item aggregate; the class-total window runs over the
    dimension-sized grouped output; ratio is a double quotient of exact
    decimals."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "A")
        & (F.col("l_shipdate") >= _ntz("1996-02-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1996-03-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_type").isin("ECONOMY", "PROMO", "STANDARD")
    )
    g = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "p_type")
        # Every value feeding the double quotient is RE-QUANTIZED through
        # an int64-backed DECIMAL(18,2) on BOTH sides first: the oracle's
        # units/10^k spelling detours through a DuckDB double division
        # (DECIMAL / INTEGER yields DOUBLE there) that can sit 1 ulp off
        # Spark's exact decimal value (seen live on q98 at sf0.01); the
        # decimal cast snaps both engines to the identical exact value
        # before the one shared double division.
        .agg(money.sum_money("l_extendedprice", out="decimal(18,2)").alias("itemrevenue"))
    )
    w = Window.partitionBy("p_type")
    return g.select(
        "p_partkey",
        "p_name",
        "p_type",
        "itemrevenue",
        (
            F.col("itemrevenue").cast("double") * 100.0
            / F.sum("itemrevenue").over(w).cast("decimal(18,2)").cast("double")
        ).alias("revenueratio"),
    ).orderBy("p_type", "p_partkey")


@query(
    "tpcds_q98_store_revenue_ratio",
    cast_double=["itemrevenue"],
    oracle=f"""
    SELECT p_partkey, p_name, p_size,
           itemrevenue,
           CAST(itemrevenue AS DOUBLE) * 100.0
             / CAST(CAST(sum(itemrevenue) OVER (PARTITION BY p_size) AS DECIMAL(18,4)) AS DOUBLE) AS revenueratio
    FROM (
        SELECT p_partkey, p_name, p_size,
               CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                        * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))) AS DECIMAL(27,0))
                 / 10000 AS DECIMAL(18,4)) AS itemrevenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'N'
          AND p_size BETWEEN 20 AND 40
          AND l_shipdate >= TIMESTAMP '1997-05-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-06-01 00:00:00'
        GROUP BY p_partkey, p_name, p_size
    ) g
    ORDER BY p_size, p_partkey
    """,
)
def tpcds_q98(spark, sf_dir):
    """TPC-DS Q98 shape (queries/98.sql): the store-channel twin of Q20 (the
    reference's q12/q20/q98 share one template across channels) — item
    revenue as DISCOUNTED price, class = size band, no LIMIT (the
    reference emits the full item list). Same one-shuffle + windowed-
    aggregate plan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= _ntz("1997-05-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-06-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size").between(20, 40))
    g = (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "p_size")
        # re-quantized through int64-backed DECIMAL(18,4) INSIDE the
        # subquery (before the window sum), so the oracle's class total
        # accumulates exact decimals like Spark's — snapping only the final
        # sum would leave DuckDB summing raw doubles, whose accumulated
        # error outgrows the snap tolerance at large scale factors.
        .agg(money.sum_disc_price(out="decimal(18,4)").alias("itemrevenue"))
    )
    w = Window.partitionBy("p_size")
    return g.select(
        "p_partkey",
        "p_name",
        "p_size",
        "itemrevenue",
        (
            F.col("itemrevenue").cast("double") * 100.0
            / F.sum("itemrevenue").over(w).cast("decimal(18,4)").cast("double")
        ).alias("revenueratio"),
    ).orderBy("p_size", "p_partkey")


# ---------------------------------------------------------------------------
# q24 — netpaid CTE reused for detail rows AND a scalar threshold
# ---------------------------------------------------------------------------


@query(
    "tpcds_q24_netpaid_threshold",
    cast_double=["paid"],
    oracle=f"""
    WITH ssales AS (
        SELECT c_name, s_name, n_name, p_brand,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS netpaid
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN part ON l_partkey = p_partkey
        WHERE c_nationkey = s_nationkey
          AND l_shipdate >= {_TS96} AND l_shipdate < {_TS97}
        GROUP BY c_name, s_name, n_name, p_brand
    )
    SELECT c_name, s_name,
           CAST(sum(netpaid) AS DECIMAL(25,2)) AS paid
    FROM ssales
    WHERE p_brand = 'Brand#13'
    GROUP BY c_name, s_name
    HAVING CAST(sum(netpaid) AS DOUBLE) >
           (SELECT 0.05 * (CAST(sum(netpaid) AS DOUBLE) / count(*)) FROM ssales)
    ORDER BY c_name, s_name
    LIMIT 100
    """,
)
def tpcds_q24(spark, sf_dir):
    """TPC-DS Q24 shape (queries/24.sql: the 'customers who bought peach
    items in their own-zip store' query — a netpaid CTE grouped at a wide
    grain, consumed TWICE: once filtered to a color for the detail rows,
    once whole for a 5%-of-average scalar threshold): zip-equality maps to
    customer-nation == supplier-nation, color to brand. The scalar is a
    1-row aggregate cross-joined broadcast; the CTE is a single
    fact-shuffle aggregate reused by both consumers — materialized via
    `materialized_cte` (reference physical_cte.cpp:112 builds the working
    table once), since per-consumer pruning (detail keeps the group keys,
    threshold only netpaid) would otherwise fork TWO full fact scans
    (plan-pinned: tests/test_plans.py single-fact-scan assertion)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    ssales = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("c_name", "s_name", "n_name", "p_brand")
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("netpaid"))
    )
    ssales = materialized_cte(ssales)
    threshold = ssales.agg(
        (
            F.lit(0.05)
            * (F.sum(money.cents("netpaid")).cast("double") / F.lit(100.0) / F.count(F.lit(1)))
        ).alias("__thr")
    )
    return (
        ssales.where(F.col("p_brand") == "Brand#13")
        .groupBy("c_name", "s_name")
        .agg(money.units_to_decimal(F.sum(money.cents("netpaid")), 2, "decimal(25,2)").alias("paid"))
        .crossJoin(F.broadcast(threshold))
        .where(F.col("paid").cast("double") > F.col("__thr"))
        .select("c_name", "s_name", "paid")
        .orderBy("c_name", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q29 — sold / returned / re-bought three-fact chain
# ---------------------------------------------------------------------------


@query(
    "tpcds_q29_sold_returned_rebought",
    oracle=f"""
    WITH rr AS (
        SELECT l_partkey AS rpk,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS rq
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < {_TS97}
        GROUP BY l_partkey
    ), cq AS (
        SELECT l_partkey AS cpk,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS cqty
        FROM lineitem
        WHERE l_returnflag = 'A'
          AND l_shipdate >= {_TS96} AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_partkey
    )
    SELECT p_brand, n_name,
           CAST(sum(CAST(s.l_quantity AS BIGINT)) AS BIGINT) AS store_sales_quantity,
           CAST(sum(rq) AS BIGINT) AS store_returns_quantity,
           CAST(sum(cqty) AS BIGINT) AS catalog_sales_quantity
    FROM lineitem s
    JOIN rr ON s.l_partkey = rr.rpk
    JOIN cq ON s.l_partkey = cq.cpk
    JOIN supplier ON s.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON s.l_partkey = p_partkey
    WHERE s.l_returnflag = 'N'
      AND s.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND s.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    GROUP BY p_brand, n_name
    ORDER BY p_brand, n_name
    LIMIT 100
    """,
)
def tpcds_q29(spark, sf_dir):
    """TPC-DS Q29 shape (queries/29.sql: items sold in a month, returned
    within the following quarter, re-bought through the catalog within
    three years — store_sales x store_returns x catalog_sales three-fact
    chain): both secondary facts pre-aggregate to ITEM grain before their
    joins (the driver data has no cross-channel ticket/customer repeats,
    so the chain keys on the item like the reference's sr_item_sk/
    cs_item_sk legs), keeping each join input aggregate-sized; quantity
    sums are exact BIGINTs."""
    li = load_table(spark, sf_dir, "lineitem")
    sold = li.where(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= _ntz("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1996-10-01 00:00:00"))
    )
    rr = (
        li.where(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= _ntz("1996-09-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
        )
        .groupBy(F.col("l_partkey").alias("rpk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("rq"))
    )
    cq = (
        li.where(
            (F.col("l_returnflag") == "A")
            & (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1999-01-01 00:00:00"))
        )
        .groupBy(F.col("l_partkey").alias("cpk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("cqty"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    return (
        sold.join(rr, F.col("l_partkey") == F.col("rpk"))
        .join(cq, F.col("l_partkey") == F.col("cpk"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "n_name")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("store_sales_quantity"),
            F.sum("rq").alias("store_returns_quantity"),
            F.sum("cqty").alias("catalog_sales_quantity"),
        )
        .orderBy("p_brand", "n_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q30 / q81 — per-state return outliers with customer / address detail
# ---------------------------------------------------------------------------


@query(
    "tpcds_q30_web_return_outliers",
    cast_double=["ctr_total_return"],
    oracle=f"""
    WITH ctr AS (
        SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_state,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS total_return
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R' AND l_shipdate >= {_TS97} AND l_shipdate < {_TS98}
        GROUP BY o_custkey, c_nationkey
    )
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(total_return AS DECIMAL(22,2)) AS ctr_total_return
    FROM (
        SELECT ctr_cust, ctr_state, total_return,
               CAST(sum(total_return) OVER (PARTITION BY ctr_state) AS DOUBLE)
                 / count(*) OVER (PARTITION BY ctr_state) AS state_avg
        FROM ctr
    ) x JOIN customer ON ctr_cust = c_custkey
    WHERE CAST(total_return AS DOUBLE) > 1.2 * state_avg
      AND c_nationkey = 3
    ORDER BY c_custkey
    LIMIT 100
    """,
)
def tpcds_q30(spark, sf_dir):
    """TPC-DS Q30 shape (queries/30.sql: per-(customer, state) web return
    totals, keep customers above 1.2x their state's average, project the
    customer detail for one state): the correlated AVG subquery is a
    window average over the (customer, state) aggregate — the same
    decorrelation the reference binder performs — so the fact shuffles
    once and the outlier filter runs windowed on the aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= _ntz("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ctr = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("ctr_cust"), F.col("c_nationkey").alias("ctr_state"))
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("total_return"))
    )
    w = Window.partitionBy("ctr_state")
    outliers = ctr.withColumn(
        "state_avg",
        F.sum("total_return").over(w).cast("double") / F.count(F.lit(1)).over(w),
    ).where(F.col("total_return").cast("double") > 1.2 * F.col("state_avg"))
    return (
        outliers.join(maybe_broadcast(c, sf_dir, "customer"), F.col("ctr_cust") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == 3)
        .select("c_custkey", "c_name", "c_mktsegment", F.col("total_return").alias("ctr_total_return"))
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "tpcds_q81_catalog_return_outliers",
    cast_double=["ctr_total_return"],
    oracle=f"""
    WITH ctr AS (
        SELECT o_custkey AS ctr_cust, s_nationkey AS ctr_state,
               CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                              * (100 + CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT))) AS DECIMAL(27,0))
                    / 10000 AS DECIMAL(22,4)) AS total_return
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_returnflag = 'R' AND l_shipdate >= {_TS96} AND l_shipdate < {_TS97}
        GROUP BY o_custkey, s_nationkey
    )
    SELECT c_custkey, c_name, n_name, r_name,
           CAST(total_return AS DECIMAL(22,4)) AS ctr_total_return
    FROM (
        SELECT ctr_cust, ctr_state, total_return,
               CAST(sum(total_return) OVER (PARTITION BY ctr_state) AS DOUBLE)
                 / count(*) OVER (PARTITION BY ctr_state) AS state_avg
        FROM ctr
    ) x
    JOIN customer ON ctr_cust = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE CAST(total_return AS DOUBLE) > 1.2 * state_avg
      AND n_regionkey = 1
    ORDER BY c_custkey, ctr_state
    LIMIT 100
    """,
)
def tpcds_q81(spark, sf_dir):
    """TPC-DS Q81 shape (queries/81.sql: Q30's template on CATALOG returns
    with tax-inclusive return amounts and the ADDRESS detail projection):
    return amount is price*(1+tax) in exact 1e-4 units, the state is the
    SUPPLIER nation (returning_addr), the final slice a region. Same
    windowed decorrelation of the correlated state-average subquery."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    inc_tax_units = money.cents("l_extendedprice") * (F.lit(100) + money.cents("l_tax"))
    ctr = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("o_custkey").alias("ctr_cust"), F.col("s_nationkey").alias("ctr_state"))
        .agg(money.units_to_decimal(F.sum(inc_tax_units), 4, "decimal(22,4)").alias("total_return"))
    )
    w = Window.partitionBy("ctr_state")
    outliers = ctr.withColumn(
        "state_avg",
        F.sum("total_return").over(w).cast("double") / F.count(F.lit(1)).over(w),
    ).where(F.col("total_return").cast("double") > 1.2 * F.col("state_avg"))
    return (
        outliers.join(maybe_broadcast(c, sf_dir, "customer"), F.col("ctr_cust") == F.col("c_custkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(maybe_broadcast(r, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("n_regionkey") == 1)
        .select("c_custkey", "c_name", "n_name", "r_name", F.col("total_return").alias("ctr_total_return"))
        .orderBy("c_custkey", "ctr_state")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q33 / q60 — category-filtered sums unioned across three channels
# ---------------------------------------------------------------------------


def _three_channel_union(spark, sf_dir, item_filter, month, year, nations):
    """Shared builder for q33/q60: the joined fact slice (one month, a
    nation set, an item filter) from which both queries aggregate their
    channel-tagged sums in one pass."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == year) & (F.month("l_shipdate") == month)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(*nations))
    p = load_table(spark, sf_dir, "part").where(item_filter)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
    )


@query(
    "tpcds_q33_manufact_three_channel",
    cast_double=["total_sales"],
    oracle=f"""
    WITH chans AS (
        SELECT p_size AS manufact, l_returnflag AS chan,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS chan_sales
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (SELECT p_size FROM part WHERE p_type = 'PROMO')
          AND year(l_shipdate) = 1996 AND month(l_shipdate) = 5
          AND c_nationkey IN (0, 5, 10, 15, 20)
        GROUP BY p_size, l_returnflag
    )
    SELECT manufact, CAST(sum(chan_sales) AS DECIMAL(25,2)) AS total_sales
    FROM chans
    GROUP BY manufact
    ORDER BY total_sales, manufact
    LIMIT 100
    """,
)
def tpcds_q33(spark, sf_dir):
    """TPC-DS Q33 shape (queries/33.sql: per-manufacturer monthly sales of
    one category's items, summed across the three channels' CTEs UNION
    ALL'd): manufacturer maps to p_size, the category IN-subquery to the
    sizes of PROMO-typed parts, the gmt-offset address filter to a nation
    set, the three channel CTEs to the returnflag slices (grouped in ONE
    pass by carrying the flag as the channel key — identical totals, a
    third of the scans)."""
    p = load_table(spark, sf_dir, "part")
    sizes = p.where(F.col("p_type") == "PROMO").select("p_size").distinct()
    joined = _three_channel_union(
        spark, sf_dir, F.lit(True), month=5, year=1996, nations=(0, 5, 10, 15, 20)
    ).join(F.broadcast(sizes.withColumnRenamed("p_size", "__sz")), F.col("p_size") == F.col("__sz"), "left_semi")
    chans = joined.groupBy(F.col("p_size").alias("manufact"), "l_returnflag").agg(
        money.sum_money("l_extendedprice", out="decimal(22,2)").alias("chan_sales")
    )
    return (
        chans.groupBy("manufact")
        .agg(money.units_to_decimal(F.sum(money.cents("chan_sales")), 2, "decimal(25,2)").alias("total_sales"))
        .orderBy("total_sales", "manufact")
        .limit(100)
    )


@query(
    "tpcds_q60_item_three_channel",
    cast_double=["total_sales"],
    oracle=f"""
    WITH chans AS (
        SELECT p_name AS item, l_returnflag AS chan,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS chan_sales
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'ECONOMY'
          AND year(l_shipdate) = 1996 AND month(l_shipdate) = 9
          AND c_nationkey IN (1, 6, 11, 16, 21)
        GROUP BY p_name, l_returnflag
    )
    SELECT item, CAST(sum(chan_sales) AS DECIMAL(25,2)) AS total_sales
    FROM chans
    GROUP BY item
    ORDER BY item, total_sales
    LIMIT 100
    """,
)
def tpcds_q60(spark, sf_dir):
    """TPC-DS Q60 shape (queries/60.sql: Q33's template at ITEM grain with
    a direct category equality and item-first ordering). Same one-pass
    channel-tagged aggregation replacing the three UNION ALL CTEs."""
    joined = _three_channel_union(
        spark,
        sf_dir,
        F.col("p_type") == "ECONOMY",
        month=9,
        year=1996,
        nations=(1, 6, 11, 16, 21),
    )
    chans = joined.groupBy(F.col("p_name").alias("item"), "l_returnflag").agg(
        money.sum_money("l_extendedprice", out="decimal(22,2)").alias("chan_sales")
    )
    return (
        chans.groupBy("item")
        .agg(money.units_to_decimal(F.sum(money.cents("chan_sales")), 2, "decimal(25,2)").alias("total_sales"))
        .orderBy("item", "total_sales")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q37 / q82 — price-banded items in stock with channel demand
# ---------------------------------------------------------------------------


def _inventory_items(spark, sf_dir, price_lo, price_hi, sizes, qty_lo, qty_hi, demand_flag, w_lo, w_hi):
    """Shared q37/q82 plan: price/manufact-filtered parts whose in-window
    'inventory' (shipped quantity) sits in a band, that also saw channel
    demand — two semi-joins onto the part dim, dim-sized output."""
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_retailprice").between(price_lo, price_hi) & F.col("p_size").isin(*sizes)
    )
    li = load_table(spark, sf_dir, "lineitem")
    inv = li.where(
        (F.col("l_shipdate") >= _ntz(w_lo))
        & (F.col("l_shipdate") < _ntz(w_hi))
        & F.col("l_quantity").between(qty_lo, qty_hi)
    ).select(F.col("l_partkey").alias("ik"))
    demand = li.where(F.col("l_returnflag") == demand_flag).select(
        F.col("l_partkey").alias("dk")
    )
    return (
        p.join(inv, F.col("p_partkey") == F.col("ik"), "left_semi")
        .join(demand, F.col("p_partkey") == F.col("dk"), "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(100)
    )


@query(
    "tpcds_q37_catalog_stock_items",
    cast_double=["p_retailprice"],
    oracle=f"""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice BETWEEN 905 AND 912
      AND p_size IN (10, 20, 30, 40)
      AND p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_shipdate >= {_TS96} AND l_shipdate < TIMESTAMP '1996-03-01 00:00:00'
                          AND l_quantity BETWEEN 20 AND 40)
      AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
    ORDER BY p_partkey
    LIMIT 100
    """,
)
def tpcds_q37(spark, sf_dir):
    """TPC-DS Q37 shape (queries/37.sql: items in a price band from a
    manufacturer set, with in-window inventory quantity-on-hand in range,
    that the CATALOG channel actually sold): both fact references are
    EXISTS gates — left-semi joins that keep the part-dim grain, no row
    multiplication; output is dimension-sized."""
    return _inventory_items(
        spark, sf_dir, 905, 912, (10, 20, 30, 40), 20, 40, "A",
        "1996-01-01 00:00:00", "1996-03-01 00:00:00",
    )


@query(
    "tpcds_q82_store_stock_items",
    cast_double=["p_retailprice"],
    oracle=f"""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice BETWEEN 910 AND 917
      AND p_size IN (5, 15, 25, 35)
      AND p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '1997-05-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
                          AND l_quantity BETWEEN 10 AND 30)
      AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N')
    ORDER BY p_partkey
    LIMIT 100
    """,
)
def tpcds_q82(spark, sf_dir):
    """TPC-DS Q82 shape (queries/82.sql): Q37's template with the STORE
    channel as the demand gate and shifted price/size/quantity bands.
    Same two-semi-join dim-grain plan."""
    return _inventory_items(
        spark, sf_dir, 910, 917, (5, 15, 25, 35), 10, 30, "N",
        "1997-05-01 00:00:00", "1997-07-01 00:00:00",
    )


# ---------------------------------------------------------------------------
# q40 — before/after pivot with returns netted out
# ---------------------------------------------------------------------------


@query(
    "tpcds_q40_warehouse_before_after",
    cast_double=["sales_before", "sales_after"],
    oracle=f"""
    WITH rr AS (
        SELECT l_orderkey AS rok, l_partkey AS rpk,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS ret_units
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_orderkey, l_partkey
    )
    SELECT n_name, p_brand,
           CAST(CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1996-03-15 00:00:00'
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) - coalesce(ret_units, 0)
                    ELSE 0 END) AS DECIMAL(25,0)) / 100 AS DECIMAL(25,2)) AS sales_before,
           CAST(CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-03-15 00:00:00'
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) - coalesce(ret_units, 0)
                    ELSE 0 END) AS DECIMAL(25,0)) / 100 AS DECIMAL(25,2)) AS sales_after
    FROM lineitem
    LEFT JOIN rr ON l_orderkey = rok AND l_partkey = rpk
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE l_returnflag = 'N'
      AND p_retailprice BETWEEN 905 AND 912
      AND l_shipdate >= TIMESTAMP '1996-02-15 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-15 00:00:00'
    GROUP BY n_name, p_brand
    ORDER BY n_name, p_brand
    LIMIT 100
    """,
)
def tpcds_q40(spark, sf_dir):
    """TPC-DS Q40 shape (queries/40.sql: per-warehouse/item sales netted of
    refunds, pivoted into before/after columns around a cutoff date):
    returns pre-aggregate at ticket grain and attach by LEFT join
    (coalesced to 0 — a sale with no return keeps its full value);
    warehouse maps to the supplier nation. Net values stay in integer
    cents until the group boundary; one fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    rr = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_orderkey").alias("rok"), F.col("l_partkey").alias("rpk"))
        .agg(F.sum(money.cents("l_extendedprice")).alias("ret_units"))
    )
    kept = li.where(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= _ntz("1996-02-15 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1996-04-15 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").where(F.col("p_retailprice").between(905, 912))
    cutoff = _ntz("1996-03-15 00:00:00")
    net = money.cents("l_extendedprice") - F.coalesce(F.col("ret_units"), F.lit(0))
    return (
        kept.join(rr, (F.col("l_orderkey") == F.col("rok")) & (F.col("l_partkey") == F.col("rpk")), "left")
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("n_name", "p_brand")
        .agg(
            money.units_to_decimal(
                F.sum(F.when(F.col("l_shipdate") < cutoff, net).otherwise(F.lit(0))), 2, "decimal(25,2)"
            ).alias("sales_before"),
            money.units_to_decimal(
                F.sum(F.when(F.col("l_shipdate") >= cutoff, net).otherwise(F.lit(0))), 2, "decimal(25,2)"
            ).alias("sales_after"),
        )
        .orderBy("n_name", "p_brand")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q42 / q52 / q55 — the brand/category monthly revenue template family
# ---------------------------------------------------------------------------


@query(
    "tpcds_q42_category_year_topk",
    cast_double=["ext_price"],
    oracle=f"""
    SELECT year(l_shipdate) AS yr, p_type,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS ext_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25 AND year(l_shipdate) = 1996 AND month(l_shipdate) = 11
    GROUP BY year(l_shipdate), p_type
    ORDER BY ext_price DESC, yr, p_type
    LIMIT 100
    """,
)
def tpcds_q42(spark, sf_dir):
    """TPC-DS Q42 shape (queries/42.sql: category revenue for one month,
    ordered by revenue): one broadcast dim join, one fact shuffle on the
    (year, category) key, TopK by the exact decimal sum (both engines
    order identical decimals; category breaks ties)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == 1996) & (F.month("l_shipdate") == 11)
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("yr"), "p_type")
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("ext_price"))
        .orderBy(F.desc("ext_price"), "yr", "p_type")
        .limit(100)
    )


@query(
    "tpcds_q52_brand_year_revenue",
    cast_double=["ext_price"],
    oracle=f"""
    SELECT year(l_shipdate) AS yr, p_brand,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS ext_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 25 AND year(l_shipdate) = 1996 AND month(l_shipdate) = 11
    GROUP BY year(l_shipdate), p_brand
    ORDER BY yr, ext_price DESC, p_brand
    LIMIT 100
    """,
)
def tpcds_q52(spark, sf_dir):
    """TPC-DS Q52 shape (queries/52.sql: brand revenue for one month,
    year-first ordering — the reference's q42/q52/q55 share one template;
    the ports keep all three because each stresses a different ORDER/grain
    combination). Same one-shuffle plan as q42."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == 1996) & (F.month("l_shipdate") == 11)
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") >= 25)
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("yr"), "p_brand")
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("ext_price"))
        .orderBy("yr", F.desc("ext_price"), "p_brand")
        .limit(100)
    )


@query(
    "tpcds_q55_brand_revenue_topk",
    cast_double=["ext_price"],
    oracle="""
    SELECT p_brand,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS ext_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size BETWEEN 10 AND 30 AND year(l_shipdate) = 1997 AND month(l_shipdate) = 11
    GROUP BY p_brand
    ORDER BY ext_price DESC, p_brand
    LIMIT 100
    """,
)
def tpcds_q55(spark, sf_dir):
    """TPC-DS Q55 shape (queries/55.sql: the brand-only member of the
    q42/q52/q55 template family — manager filter maps to a size band,
    revenue-descending TopK)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == 1997) & (F.month("l_shipdate") == 11)
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size").between(10, 30))
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("ext_price"))
        .orderBy(F.desc("ext_price"), "p_brand")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q43 — per-store day-of-week pivot
# ---------------------------------------------------------------------------

_DAYS = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday"]


@query(
    "tpcds_q43_store_dayofweek_pivot",
    cast_double=[f"{d[:3].lower()}_sales" for d in _DAYS],
    oracle=f"""
    SELECT n_name,
           {", ".join(
               f"CAST(sum(CASE WHEN dayname(l_shipdate) = '{d}' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(22,2)) AS {d[:3].lower()}_sales"
               for d in _DAYS
           )}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE year(l_shipdate) = 1996 AND n_regionkey IN (0, 2, 4)
    GROUP BY n_name
    ORDER BY n_name
    LIMIT 100
    """,
)
def tpcds_q43(spark, sf_dir):
    """TPC-DS Q43 shape (queries/43.sql: per-store weekly sales profile —
    seven day-name CASE pivot columns over one year): store maps to the
    supplier nation, the gmt-offset filter to a region set. Single
    conditional-aggregation pass (the pivot is 7 CASE sums, no Expand);
    day names via the same dayname()/date_format('EEEE') bridge the q2
    port established."""
    li = load_table(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1996)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey").isin(0, 2, 4))
    day = F.date_format("l_shipdate", "EEEE")
    return (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            *[
                money.units_to_decimal(
                    F.sum(F.when(day == d, money.cents("l_extendedprice"))), 2, "decimal(22,2)"
                ).alias(f"{d[:3].lower()}_sales")
                for d in _DAYS
            ]
        )
        .orderBy("n_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q57 — call-center monthly deviation (q47's catalog twin)
# ---------------------------------------------------------------------------


@query(
    "tpcds_q57_callcenter_deviation",
    cast_double=["sum_sales", "psum", "nsum"],
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderpriority AS cc_name, p_type,
               CAST(year(l_shipdate) AS BIGINT) AS yr,
               CAST(month(l_shipdate) AS BIGINT) AS moy,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS sum_sales
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R'
        GROUP BY o_orderpriority, p_type, year(l_shipdate), month(l_shipdate)
    ), v2 AS (
        SELECT cc_name, p_type, yr, moy, sum_sales,
               CAST(sum(sum_sales) OVER (PARTITION BY cc_name, p_type, yr) AS DOUBLE)
                 / count(*) OVER (PARTITION BY cc_name, p_type, yr) AS avg_monthly,
               lag(sum_sales)  OVER (PARTITION BY cc_name, p_type ORDER BY yr, moy) AS psum,
               lead(sum_sales) OVER (PARTITION BY cc_name, p_type ORDER BY yr, moy) AS nsum
        FROM v1
    )
    SELECT cc_name, p_type, yr, moy, sum_sales, avg_monthly, psum, nsum
    FROM v2
    WHERE yr = 1997 AND avg_monthly > 0
      AND abs(CAST(sum_sales AS DOUBLE) - avg_monthly) / avg_monthly > 0.1
    ORDER BY cc_name, p_type, yr, moy
    """,
)
def tpcds_q57(spark, sf_dir):
    """TPC-DS Q57 shape (queries/57.sql: Q47's template on the CATALOG
    channel with the call-center dimension — cc_name maps to the order
    priority, category to the part type). Same single-pass windowed
    decorrelation of the rn-offset self-joins; deviation threshold 0.1."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    v1 = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("o_orderpriority").alias("cc_name"),
            "p_type",
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.month("l_shipdate").cast("bigint").alias("moy"),
        )
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("sum_sales"))
    )
    wy = Window.partitionBy("cc_name", "p_type", "yr")
    ws = Window.partitionBy("cc_name", "p_type").orderBy("yr", "moy")
    v2 = v1.select(
        "cc_name",
        "p_type",
        "yr",
        "moy",
        "sum_sales",
        (F.sum("sum_sales").over(wy).cast("double") / F.count(F.lit(1)).over(wy)).alias(
            "avg_monthly"
        ),
        F.lag("sum_sales").over(ws).alias("psum"),
        F.lead("sum_sales").over(ws).alias("nsum"),
    )
    return (
        v2.where(
            (F.col("yr") == 1997)
            & (F.col("avg_monthly") > 0)
            & (
                F.abs(F.col("sum_sales").cast("double") - F.col("avg_monthly"))
                / F.col("avg_monthly")
                > 0.1
            )
        )
        .select("cc_name", "p_type", "yr", "moy", "sum_sales", "avg_monthly", "psum", "nsum")
        .orderBy("cc_name", "p_type", "yr", "moy")
    )


# ---------------------------------------------------------------------------
# q68 / q73 — per-ticket aggregates with household filters
# ---------------------------------------------------------------------------


@query(
    "tpcds_q68_ticket_city_mismatch",
    cast_double=["extended_price", "extended_tax"],
    oracle=f"""
    WITH dn AS (
        SELECT o_orderkey AS ticket, o_custkey AS cust, n_name AS bought_city,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS extended_price,
               CAST(sum(CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS extended_tax
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE dayofmonth(o_orderdate) BETWEEN 1 AND 2
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND year(o_orderdate) IN (1996, 1997, 1998)
        GROUP BY o_orderkey, o_custkey, n_name
    )
    SELECT c_name, cn.n_name AS current_city, bought_city, ticket,
           extended_price, extended_tax
    FROM dn
    JOIN customer ON cust = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE cn.n_name <> bought_city
    ORDER BY c_name, ticket, bought_city
    LIMIT 100
    """,
)
def tpcds_q68(spark, sf_dir):
    """TPC-DS Q68 shape (queries/68.sql: per-ticket price/tax totals for
    early-month household-filtered purchases, keeping tickets bought in a
    city other than the customer's — dn subquery then the mismatch
    filter): ticket maps to the order, city to the nation (supplier side =
    bought, customer side = current). Per-ticket grouping includes the
    city key exactly like the reference's ss_addr_sk; one fact shuffle at
    ticket grain, dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.dayofmonth("o_orderdate").between(1, 2)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.year("o_orderdate").isin(1996, 1997, 1998)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    dn = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("o_orderkey").alias("ticket"),
            F.col("o_custkey").alias("cust"),
            F.col("n_name").alias("bought_city"),
        )
        .agg(
            money.sum_money("l_extendedprice", out="decimal(22,2)").alias("extended_price"),
            money.sum_money("l_tax", out="decimal(22,2)").alias("extended_tax"),
        )
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("current_city")
    )
    return (
        dn.join(maybe_broadcast(c, sf_dir, "customer"), F.col("cust") == F.col("c_custkey"))
        .join(maybe_broadcast(cn, sf_dir, "nation"), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("current_city") != F.col("bought_city"))
        .select("c_name", "current_city", "bought_city", "ticket", "extended_price", "extended_tax")
        .orderBy("c_name", "ticket", "bought_city")
        .limit(100)
    )


@query(
    "tpcds_q73_ticket_count_distribution",
    oracle=f"""
    SELECT c_name, c_mktsegment, ticket, cnt
    FROM (
        SELECT o_orderkey AS ticket, o_custkey AS cust, count(*) AS cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE dayofmonth(o_orderdate) BETWEEN 1 AND 2
          AND o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED')
          AND year(o_orderdate) IN (1996, 1997, 1998)
        GROUP BY o_orderkey, o_custkey
        HAVING count(*) BETWEEN 1 AND 5
    ) dn JOIN customer ON cust = c_custkey
    ORDER BY cnt DESC, c_name, ticket
    LIMIT 100
    """,
)
def tpcds_q73(spark, sf_dir):
    """TPC-DS Q73 shape (queries/73.sql: tickets with 1-5 line items for
    household-filtered early-month purchases, customer detail ordered by
    line count — q34's template with the small-basket band): per-ticket
    count + HAVING band at ticket grain, customer join after the
    aggregate (aggregate-sized input)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.dayofmonth("o_orderdate").between(1, 2)
        & F.col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED")
        & F.year("o_orderdate").isin(1996, 1997, 1998)
    )
    c = load_table(spark, sf_dir, "customer")
    dn = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderkey").alias("ticket"), F.col("o_custkey").alias("cust"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt").between(1, 5))
    )
    return (
        dn.join(maybe_broadcast(c, sf_dir, "customer"), F.col("cust") == F.col("c_custkey"))
        .select("c_name", "c_mktsegment", "ticket", "cnt")
        .orderBy(F.desc("cnt"), "c_name", "ticket")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q71 — brand revenue by time-of-day across unioned channels
# ---------------------------------------------------------------------------


@query(
    "tpcds_q71_hourly_breakdown",
    cast_double=["ext_price"],
    oracle="""
    SELECT brand, t_hour, t_minute,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS ext_price
    FROM (
        SELECT event_type AS brand, value, hour(ts) AS t_hour, minute(ts) AS t_minute
        FROM events WHERE dayofmonth(ts) BETWEEN 1 AND 10
        UNION ALL
        SELECT event_type AS brand, value, hour(ts) AS t_hour, minute(ts) AS t_minute
        FROM events WHERE dayofmonth(ts) BETWEEN 11 AND 20
        UNION ALL
        SELECT event_type AS brand, value, hour(ts) AS t_hour, minute(ts) AS t_minute
        FROM events WHERE dayofmonth(ts) >= 21
    ) tmp
    WHERE t_hour IN (8, 9, 19, 20)
    GROUP BY brand, t_hour, t_minute
    ORDER BY ext_price DESC, brand, t_hour, t_minute
    LIMIT 100
    """,
)
def tpcds_q71(spark, sf_dir):
    """TPC-DS Q71 shape (queries/71.sql: one month's sales from all THREE
    channels UNION ALL'd, joined to time_dim, broken down by brand x hour
    x minute at meal times): the stream table supplies time-of-day; the
    three channel legs are date slices of it (the reference's three
    identically-shaped subqueries), the meal-time filter is the hour
    IN-list. events.value is quantized to DECIMAL(12,2) identically on
    both sides before summing (it is not guaranteed 2-decimal)."""
    ev = load_table(spark, sf_dir, "events")
    dom = F.dayofmonth("ts")

    def leg(cond):
        return ev.where(cond).select(
            F.col("event_type").alias("brand"),
            F.col("value"),
            F.hour("ts").alias("t_hour"),
            F.minute("ts").alias("t_minute"),
        )

    tmp = (
        leg(dom.between(1, 10))
        .unionAll(leg(dom.between(11, 20)))
        .unionAll(leg(dom >= 21))
    )
    return (
        tmp.where(F.col("t_hour").isin(8, 9, 19, 20))
        .groupBy("brand", "t_hour", "t_minute")
        .agg(F.sum(F.col("value").cast(_DEC)).cast("decimal(22,2)").alias("ext_price"))
        .orderBy(F.desc("ext_price"), "brand", "t_hour", "t_minute")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q84 — income-band customers with a returns gate
# ---------------------------------------------------------------------------


@query(
    "tpcds_q84_income_band_customers",
    oracle="""
    SELECT c_custkey AS customer_id,
           concat(concat(coalesce(c_name, ''), ', '), coalesce(c_mktsegment, '')) AS customername
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_nationkey = 7
      AND c_acctbal BETWEEN 2000 AND 7000
      AND l_returnflag = 'R'
    ORDER BY c_custkey NULLS FIRST
    LIMIT 100
    """,
)
def tpcds_q84(spark, sf_dir):
    """TPC-DS Q84 shape (queries/84.sql: customers of one city inside an
    income band who returned something — the income_band/household chain
    maps to an account-balance band, store_returns to the R-flagged
    lines). The returns join MULTIPLIES rows per return exactly like the
    reference's sr join (no DISTINCT in the reference either); the
    coalesce'd name concat keeps the NULL-tolerant spelling."""
    c = load_table(spark, sf_dir, "customer").where(
        (F.col("c_nationkey") == 7) & F.col("c_acctbal").between(2000, 7000)
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.concat(
                F.concat(F.coalesce(F.col("c_name"), F.lit("")), F.lit(", ")),
                F.coalesce(F.col("c_mktsegment"), F.lit("")),
            ).alias("customername"),
        )
        .orderBy(F.col("customer_id").asc_nulls_first())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q91 — call-center return losses under a demographic disjunction
# ---------------------------------------------------------------------------


@query(
    "tpcds_q91_callcenter_return_loss",
    cast_double=["returns_loss"],
    oracle=f"""
    SELECT o_orderpriority AS call_center, c_mktsegment AS demo_segment,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS returns_loss
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND year(l_shipdate) = 1996 AND month(l_shipdate) = 11
      AND ((c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0)
           OR (c_mktsegment = 'FURNITURE' AND c_acctbal > 5000))
      AND o_orderstatus = 'F'
      AND n_regionkey = 2
    GROUP BY o_orderpriority, c_mktsegment
    ORDER BY returns_loss DESC, call_center, demo_segment
    LIMIT 100
    """,
)
def tpcds_q91(spark, sf_dir):
    """TPC-DS Q91 shape (queries/91.sql: monthly catalog return losses per
    call center for a marital/education demographic DISJUNCTION, buy-
    potential and gmt filters — the reference groups by hidden demographic
    columns; the port surfaces the demographic as a visible column so the
    output order is total): call center maps to the order priority, the
    cd disjunction to segment+balance brackets, hd_buy_potential to the
    order status, gmt offset to the region. One fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.year("l_shipdate") == 1996)
        & (F.month("l_shipdate") == 11)
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer").where(
        ((F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") < 0))
        | ((F.col("c_mktsegment") == "FURNITURE") & (F.col("c_acctbal") > 5000))
    )
    n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("o_orderpriority").alias("call_center"),
            F.col("c_mktsegment").alias("demo_segment"),
        )
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("returns_loss"))
        .orderBy(F.desc("returns_loss"), "call_center", "demo_segment")
        .limit(100)
    )
