"""TPC-DS shapes, fourth tranche start (round 6 tail): return-ratio rank
unions, non-returned-sales anti-joins, reason-adjusted sales.

Reference queries: /root/reference/extension/tpcds/dsdgen/queries/{49,78,93}
.sql — same adaptation contract as workload/tpcds.py (channels map to
lineitem/orders slices; "returns" are the R-flagged lines aggregated at the
(order, part) ticket grain the reference's returns tables key on).

Determinism contract inherited from tpcds.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_parachute_spark.catalog import load_table, maybe_broadcast
from duckdb_parachute_spark.functions import money
from duckdb_parachute_spark.workload import query

_TS96 = "TIMESTAMP '1996-01-01 00:00:00'"
_TS97 = "TIMESTAMP '1997-01-01 00:00:00'"


def _ntz(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


@query(
    "tpcds_q49_return_ratio_ranks",
    cast_double=["return_ratio"],
    oracle=f"""
    WITH per AS (
        SELECT l_linestatus AS channel, l_partkey AS item,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS return_ratio,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) AS currency_ratio
        FROM lineitem
        WHERE l_shipdate >= {_TS96} AND l_shipdate < {_TS97}
        GROUP BY l_linestatus, l_partkey
    ), ranked AS (
        SELECT channel, item, return_ratio,
               CAST(rank() OVER (PARTITION BY channel ORDER BY return_ratio) AS BIGINT) AS return_rank,
               CAST(rank() OVER (PARTITION BY channel ORDER BY currency_ratio) AS BIGINT) AS currency_rank
        FROM per
    )
    SELECT channel, item, return_ratio, return_rank, currency_rank
    FROM ranked
    WHERE return_rank <= 10 OR currency_rank <= 10
    ORDER BY channel, return_rank, currency_rank, item
    LIMIT 100
    """,
)
def tpcds_q49(spark, sf_dir):
    """TPC-DS Q49 shape (queries/49.sql: per-channel 'worst return ratios' —
    quantity-ratio and currency-ratio each rank()ed, keep the top of either
    ranking, union the channels): one conditional-aggregation pass per
    channel partition, two rank windows over the ITEM-grain aggregate
    (dimension-sized — the fact never reaches the window), tie-preserving
    rank filter. Ratios are double quotients of exact integer sums."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
    )
    is_r = F.col("l_returnflag") == "R"
    qty = F.col("l_quantity").cast("long")
    cents = money.cents("l_extendedprice")
    per = li.groupBy(
        F.col("l_linestatus").alias("channel"), F.col("l_partkey").alias("item")
    ).agg(
        (
            F.sum(F.when(is_r, qty).otherwise(F.lit(0))).cast("double")
            / F.sum(qty).cast("double")
        ).alias("return_ratio"),
        (
            F.sum(F.when(is_r, cents).otherwise(F.lit(0))).cast("double")
            / F.sum(cents).cast("double")
        ).alias("currency_ratio"),
    )
    wr = Window.partitionBy("channel").orderBy("return_ratio")
    wc = Window.partitionBy("channel").orderBy("currency_ratio")
    return (
        per.withColumn("return_rank", F.rank().over(wr).cast("long"))
        .withColumn("currency_rank", F.rank().over(wc).cast("long"))
        .where((F.col("return_rank") <= 10) | (F.col("currency_rank") <= 10))
        .select("channel", "item", "return_ratio", "return_rank", "currency_rank")
        .orderBy("channel", "return_rank", "currency_rank", "item")
        .limit(100)
    )


@query(
    "tpcds_q78_nonreturned_ratio",
    cast_double=["web_rev", "store_rev", "ratio"],
    oracle=f"""
    WITH rets AS (
        SELECT DISTINCT l_orderkey AS rok, l_partkey AS rpk
        FROM lineitem WHERE l_returnflag = 'R'
    ), ws AS (
        SELECT year(l_shipdate) AS yr, o_custkey AS cust,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS rev
        FROM lineitem
        LEFT JOIN rets ON l_orderkey = rok AND l_partkey = rpk
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag <> 'R' AND rok IS NULL
        GROUP BY year(l_shipdate), o_custkey
    ), ss AS (
        SELECT year(o_orderdate) AS yr, o_custkey AS cust,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS rev
        FROM orders
        WHERE o_orderstatus <> 'F'
        GROUP BY year(o_orderdate), o_custkey
    )
    SELECT ws.cust AS cust, ws.rev AS web_rev, ss.rev AS store_rev,
           CAST(ws.rev AS DOUBLE) / CAST(ss.rev AS DOUBLE) AS ratio
    FROM ws JOIN ss ON ws.cust = ss.cust AND ws.yr = ss.yr
    WHERE ws.yr = 1996
    ORDER BY ratio DESC, cust
    LIMIT 100
    """,
)
def tpcds_q78(spark, sf_dir):
    """TPC-DS Q78 shape (queries/78.sql: per-customer yearly sales with the
    RETURNED orders anti-joined away — 'WHERE wr_order_number IS NULL' —
    then cross-channel ratio): the returns set is deduped at ticket grain
    and LEFT-joined with a null filter (the decorrelated anti-join the
    reference binder builds); both channel aggregates shuffle on the
    customer key so the final join is co-partitioned."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rets = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("rok"), F.col("l_partkey").alias("rpk"))
        .distinct()
    )
    ws = (
        li.where(F.col("l_returnflag") != "R")
        .join(
            rets,
            (F.col("l_orderkey") == F.col("rok")) & (F.col("l_partkey") == F.col("rpk")),
            "left_anti",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("yr"), F.col("o_custkey").alias("cust"))
        .agg(money.sum_money("l_extendedprice", out="decimal(22,2)").alias("rev"))
    )
    ss = (
        o.where(F.col("o_orderstatus") != "F")
        .groupBy(F.year("o_orderdate").alias("s_yr"), F.col("o_custkey").alias("s_cust"))
        .agg(money.sum_money("o_totalprice", out="decimal(22,2)").alias("s_rev"))
    )
    return (
        ws.where(F.col("yr") == 1996)
        .join(ss, (F.col("cust") == F.col("s_cust")) & (F.col("yr") == F.col("s_yr")))
        .select(
            "cust",
            F.col("rev").alias("web_rev"),
            F.col("s_rev").alias("store_rev"),
            (F.col("rev").cast("double") / F.col("s_rev").cast("double")).alias("ratio"),
        )
        .orderBy(F.desc("ratio"), "cust")
        .limit(100)
    )


@query(
    "tpcds_q93_reason_adjusted_sales",
    cast_double=["sumsales"],
    oracle="""
    WITH rr AS (
        SELECT l_orderkey AS rok, l_partkey AS rpk,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS rq
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        GROUP BY l_orderkey, l_partkey
    )
    SELECT o_custkey AS cust,
           CAST(CAST(sum((CAST(l_quantity AS BIGINT) - coalesce(rq, 0))
                         * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DECIMAL(27,0))
                / 100 AS DECIMAL(25,2)) AS sumsales
    FROM lineitem
    LEFT JOIN rr ON l_orderkey = rok AND l_partkey = rpk
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag <> 'R'
    GROUP BY o_custkey
    ORDER BY sumsales NULLS FIRST, cust NULLS FIRST
    LIMIT 100
    """,
)
def tpcds_q93(spark, sf_dir):
    """TPC-DS Q93 shape (queries/93.sql: 'actual sales' — each sale's value
    reduced by its reason-coded return quantity when one exists, CASE-d per
    row, summed per customer): returns pre-aggregate at ticket grain with a
    reason filter (linestatus F is the reason code here), attach by LEFT
    join, per-row adjusted value in exact integer units, one customer-key
    shuffle. NULLS FIRST ordering matches the reference's explicit
    spelling."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rr = (
        li.where((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"))
        .groupBy(F.col("l_orderkey").alias("rok"), F.col("l_partkey").alias("rpk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("rq"))
    )
    act_units = (
        F.col("l_quantity").cast("long") - F.coalesce(F.col("rq"), F.lit(0))
    ) * money.cents("l_extendedprice")
    return (
        li.where(F.col("l_returnflag") != "R")
        .join(
            rr,
            (F.col("l_orderkey") == F.col("rok")) & (F.col("l_partkey") == F.col("rpk")),
            "left",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(money.units_to_decimal(F.sum(act_units), 2, "decimal(25,2)").alias("sumsales"))
        .orderBy(F.col("sumsales").asc_nulls_first(), F.col("cust").asc_nulls_first())
        .limit(100)
    )
