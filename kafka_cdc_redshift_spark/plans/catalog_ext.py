"""Catalog section 3 (round 3): wider relational surface.

TPC-H-shaped analytics adapted to the driver's tables (no partsupp /
commitdate / shipmode / phone columns exist, so q9/q16/q17/q22 use the
nearest expressible formulation), plus window-frame, pivot, CUBE
grouping-set, set-op, and exact rank-based quantile coverage that the
catalog did not exercise yet.

Conventions follow plans/catalog.py: decimal-exact money sums cast to
double at the edge, identical aliases both sides, deterministic tiebreaks,
years cast to INT in both engines so Arrow schemas line up.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import load_table
from ..sources.envelopes import ORDERS_CHANGELOG_SQL
from .catalog import _dec, _spec


def _rev(ep="l_extendedprice", disc="l_discount"):
    return _dec(F.col(ep), 12, 2) * (F.lit(1) - _dec(F.col(disc), 4, 2))


_REV_SQL = "l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))"


# ---------------------------------------------------------------------------
# TPC-H-shaped joins/aggregations
# ---------------------------------------------------------------------------

@_spec(
    "q7_volume_shipping",
    "nation-pair trade volume by year (TPC-H Q7 shape): fact joins two "
    "broadcast dim chains (cust->nation, supp->nation), disjunctive pair "
    "predicate, shipdate pushdown",
    f"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              CAST(year(l_shipdate) AS INT) AS yr,
              CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
         AND l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <  TIMESTAMP '1998-01-01'
       GROUP BY 1, 2, 3""",
)
def q_q7(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # orders is fact-sized: equi-join; every dim chain broadcasts
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@_spec(
    "q8_market_share",
    "market share of one nation's suppliers in a region's PROMO-part "
    "revenue by year (TPC-H Q8 shape): conditional share in one pass over "
    "a 6-table broadcast-dim join",
    f"""SELECT CAST(year(o_orderdate) AS INT) AS yr,
              CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                                 THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                   / CAST(sum({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
       FROM lineitem
       JOIN part     ON l_partkey = p_partkey
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       JOIN region   ON cn.n_regionkey = r_regionkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate <  TIMESTAMP '1998-01-01'
       GROUP BY 1""",
)
def q_q8(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev()
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast(T.DecimalType(18, 4))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            (F.sum(nation_rev).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
    )


@_spec(
    "q9_product_profit",
    "profit by supplier nation and order year for a part-name family "
    "(TPC-H Q9 shape, no partsupp table -> revenue stands in for profit): "
    "LIKE pushdown on the dim, fact joins stay on join keys",
    f"""SELECT sn.n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
              CAST(sum({_REV_SQL}) AS DOUBLE) AS profit
       FROM lineitem
       JOIN part     ON l_partkey = p_partkey
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       WHERE p_name LIKE '%red%'
       GROUP BY 1, 2""",
)
def q_q9(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum(_rev()).cast("double").alias("profit"))
    )


@_spec(
    "q13_order_distribution",
    "customer order-count distribution (TPC-H Q13 shape): LEFT join with "
    "an extra join-time predicate, then a two-level aggregation",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             GROUP BY c_custkey) c_orders
       GROUP BY c_count""",
)
def q_q13(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_spec(
    "q15_top_supplier",
    "top revenue supplier for a quarter (TPC-H Q15 shape): aggregate once, "
    "compare against its own broadcast max — decimal-exact equality, no "
    "double-compare flake",
    f"""WITH rev AS (
         SELECT l_suppkey AS suppkey, sum({_REV_SQL}) AS total_rev
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
       FROM supplier JOIN rev ON s_suppkey = suppkey
       WHERE total_rev = (SELECT max(total_rev) FROM rev)""",
)
def q_q15(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.max_rev)
        .join(F.broadcast(supp), F.col("suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@_spec(
    "q16_supplier_variety",
    "distinct suppliers per part family (TPC-H Q16 shape over lineitem as "
    "the part-supplier relation): count(DISTINCT) after dim pushdown",
    """SELECT p_brand, p_type, p_size,
              count(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#1' AND p_size <= 10
       GROUP BY p_brand, p_type, p_size""",
)
def q_q16(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 10)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_spec(
    "q17_small_qty_revenue",
    "below-average-quantity revenue for one brand (TPC-H Q17 shape): the "
    "per-part average via a window sharing the partkey partitioning — no "
    "separate aggregate+rejoin",
    f"""WITH b AS (
         SELECT l_quantity, l_extendedprice,
                CAST(sum(l_quantity::DECIMAL(12,2))
                     OVER (PARTITION BY l_partkey) AS DOUBLE)
                  / count(*) OVER (PARTITION BY l_partkey) AS avg_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand = 'Brand#2')
       SELECT CAST(sum(l_extendedprice::DECIMAL(12,2)) AS DOUBLE) / 7.0
                AS avg_yearly,
              count(*) AS n_lines
       FROM b WHERE l_quantity < 0.2 * avg_qty""",
)
def q_q17(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    w = Window.partitionBy("l_partkey")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn(
            "avg_qty",
            F.sum(_dec(F.col("l_quantity"), 12, 2)).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
        )
    )
    return b.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (F.sum(_dec(F.col("l_extendedprice"), 12, 2)).cast("double") / F.lit(7.0))
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@_spec(
    "q19_disjunctive_revenue",
    "disjunctive multi-clause predicate join (TPC-H Q19 shape): three "
    "brand/size/quantity clauses OR-ed inside one join — Catalyst extracts "
    "the common part-side conjuncts below the join",
    f"""SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue, count(*) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30)""",
)
def q_q19(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_spec(
    "q22_dormant_customers",
    "above-average-balance customers with no orders, per nation (TPC-H Q22 "
    "shape): scalar subquery broadcast + anti-join against the fact",
    """WITH avg_bal AS (
         SELECT CAST(sum(c_acctbal::DECIMAL(12,2)) AS DOUBLE) / count(*) AS v
         FROM customer WHERE c_acctbal > 0)
       SELECT n_name AS nation, count(*) AS numcust,
              CAST(sum(c_acctbal::DECIMAL(12,2)) AS DOUBLE) AS totacctbal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       WHERE c_acctbal > (SELECT v FROM avg_bal)
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       GROUP BY n_name""",
)
def q_q22(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(_dec(F.col("c_acctbal"), 12, 2)).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    return (
        cust.join(F.broadcast(avg_bal), cust.c_acctbal > F.col("v"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"), 12, 2)).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# window frames / pivot / grouping sets / set ops / exact quantiles
# ---------------------------------------------------------------------------

@_spec(
    "events_moving_avg",
    "per-user rolling window frame (ROWS BETWEEN 4 PRECEDING AND CURRENT): "
    "decimal-exact frame sum (association-order independent -> identical "
    "across engines) + lag delta; one shuffle on user_id serves both "
    "window functions",
    """SELECT event_id, user_id, value,
              CAST(sum(value::DECIMAL(18,6))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
                / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS mov_avg,
              value - lag(value) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS delta
       FROM events""",
)
def q_events_moving_avg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = order.rowsBetween(-4, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (
            F.sum(_dec(F.col("value"), 18, 6)).over(frame).cast("double")
            / F.count(F.lit(1)).over(frame)
        ).alias("mov_avg"),
        (F.col("value") - F.lag("value").over(order)).alias("delta"),
    )


@_spec(
    "events_series_moving_avg",
    "per-SERIES rolling mean (ROWS BETWEEN 4 PRECEDING AND CURRENT) "
    "where the series key is LOW-cardinality — the window spelling "
    "would funnel each event_type's entire history through one "
    "reducer, so the engine runs it block-partitioned with a p-row "
    "halo (functions/timeseries.moving_window_agg: exact global rank "
    "via range_partitioned_rank, rank-block assignment, the last p "
    "rows of each block copied into the next, frame window within "
    "(series, block), halo rows dropped) — row-for-row equal to the "
    "window spelling, which the oracle keeps",
    """SELECT event_id, event_type, value,
              CAST(sum(value::DECIMAL(18,6))
                   OVER (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
                / count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS mov_avg
       FROM events""",
)
def q_events_series_moving_avg(spark, sf_dir):
    from ..functions.timeseries import moving_window_agg

    ev = load_table(spark, sf_dir, "events")
    out = moving_window_agg(
        ev.select("event_id", "event_type", "ts", "value"),
        ["event_type"], ["ts", "event_id"],
        {
            "__s": F.sum(_dec(F.col("value"), 18, 6)),
            "__c": F.count(F.lit(1)),
        },
        preceding=4,
    )
    return out.select(
        "event_id", "event_type", "value",
        (F.col("__s").cast("double") / F.col("__c")).alias("mov_avg"),
    )


@_spec(
    "events_pivot_counts",
    "per-user event-type pivot (fixed value list -> deterministic columns; "
    "one shuffle, conditional counts)",
    """SELECT user_id,
              count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
              count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
              count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
              count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
              count(CASE WHEN event_type = 'error' THEN 1 END) AS error
       FROM events GROUP BY user_id""",
)
def q_events_pivot(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "signup", "purchase", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves absent combos NULL; the conditional-count twin yields 0
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@_spec(
    "orders_cube",
    "CUBE grouping sets over (status, priority) with an explicit grouping "
    "id (2*g(status)+g(priority), same bit order both engines)",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(2 * grouping(o_orderstatus)
                   + grouping(o_orderpriority) AS INT) AS gid,
              count(*) AS n_orders,
              CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS total
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def q_orders_cube(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.lit(2) * F.grouping("o_orderstatus")
                + F.grouping("o_orderpriority")
            ).cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"), 18, 2)).cast("double").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total")
    )


@_spec(
    "customers_lapsed",
    "set difference (EXCEPT DISTINCT): customers ordering in the first "
    "year but not in the last — hash-partitioned distinct on both legs",
    """SELECT o_custkey AS custkey FROM orders
       WHERE o_orderdate < TIMESTAMP '1996-01-01'
       EXCEPT
       SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '2001-01-01'""",
)
def q_customers_lapsed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    first_year = orders.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("custkey"))
    last_year = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("custkey"))
    return first_year.subtract(last_year)  # EXCEPT DISTINCT


@_spec(
    "doc_len_quantiles",
    "exact rank-based quantiles per language (deterministic: value at "
    "ceil(q*n) of the (n_chars, doc_id)-sorted run — no interpolation "
    "semantics to disagree on across engines)",
    """WITH r AS (
         SELECT lang, n_chars,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY n_chars, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM documents)
       SELECT lang,
              max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
                       THEN n_chars END) AS median_chars,
              max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
                       THEN n_chars END) AS p90_chars,
              max(n) AS n_docs
       FROM r GROUP BY lang""",
)
def q_doc_len_quantiles(spark, sf_dir):
    from kafka_cdc_redshift_spark.util import range_partitioned_rank

    docs = load_table(spark, sf_dir, "documents")
    # exact per-lang rank WITHOUT the per-lang single-reducer sort the
    # window spelling pays (lang is low-cardinality — the ccnet_buckets
    # lesson, same shared machinery); the oracle keeps the SQL window
    # spelling, which the range-partitioned rank replays row-for-row
    r = range_partitioned_rank(
        docs.select("lang", "n_chars", "doc_id"),
        ["lang"], ["n_chars", "doc_id"],
        rank_col="rn", n_col="n",
    )
    at = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.col("n") * q).cast("bigint"), F.col("n_chars")
        )
    )
    return r.groupBy("lang").agg(
        at(0.5).alias("median_chars"),
        at(0.9).alias("p90_chars"),
        F.max("n").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# round-3 LLM-pipeline additions: chunking, corpus geometry, sliding windows
# ---------------------------------------------------------------------------

@_spec(
    "doc_chunks",
    "overlapping context-window chunking (64-token windows, stride 48) — "
    "map-side 1->K explode, no shuffle; the pre-embedding/training split",
    r"""WITH tok AS (
         SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
         FROM documents),
       c AS (
         SELECT doc_id, t, len(t) AS n,
                CASE WHEN len(t) <= 64 THEN 1
                     ELSE CAST(ceil((len(t) - 64) / 48.0) AS INT) + 1
                END AS nc
         FROM tok WHERE len(t) > 0),
       x AS (
         SELECT doc_id, t, n, unnest(range(0, CAST(nc AS BIGINT))) AS k
         FROM c)
       SELECT doc_id, CAST(k AS INT) AS chunk_idx,
              CAST(least(64, n - (k * 48 + 1) + 1) AS INT) AS n_chunk_tokens,
              array_to_string(t[k * 48 + 1 : k * 48 + 64], ' ') AS chunk_text
       FROM x""",
)
def q_doc_chunks(spark, sf_dir):
    from ..functions.curation import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, stride=48
    )


@_spec(
    "sim_pair_hist",
    "pairwise-cosine histogram over a deterministic id-sample (corpus "
    "geometry diagnostic for picking dedup/ANN thresholds); exact fold "
    "arithmetic, floor-bucketed",
    """WITH s AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
                 FROM embeddings WHERE vec_id % 4 = 0),
       p AS (SELECT least(CAST(floor(
                     (list_dot_product(a.e, b.e)
                      / (sqrt(list_dot_product(a.e, a.e))
                         * sqrt(list_dot_product(b.e, b.e)))
                      + 1.0) * 20 / 2.0) AS INT), 19) AS bucket
             FROM s a JOIN s b ON a.id < b.id)
       SELECT bucket, count(*) AS n_pairs FROM p GROUP BY bucket""",
)
def q_sim_pair_hist(spark, sf_dir):
    from ..functions.similarity import cosine_pair_hist

    return cosine_pair_hist(
        load_table(spark, sf_dir, "embeddings"), sample_mod=4, buckets=20
    )


@_spec(
    "events_sliding_rollup",
    "sliding-window aggregation (1 hour window, 15 minute slide -> each "
    "event in 4 windows; streaming twin: window(ts, '1h', '15m') with "
    "watermark)",
    """SELECT time_bucket(INTERVAL '15 minutes', ts)
                - INTERVAL '15 minutes' * k AS window_start,
              event_type, count(*) AS n_events,
              CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS sum_value
       FROM events CROSS JOIN generate_series(0, 3) t(k)
       GROUP BY 1, 2""",
)
def q_events_sliding_rollup(spark, sf_dir):
    from ..streaming.windows import hourly_rollup

    ev = load_table(spark, sf_dir, "events")
    out = hourly_rollup(ev, window="1 hour", slide="15 minutes")
    return out.withColumn(
        "window_start", F.col("window_start").cast("timestamp_ntz")
    )


# ---------------------------------------------------------------------------
# round-3 late additions: the remaining TPC-H query shapes (Q2/Q11/Q12/
# Q20/Q21 adapted — no partsupp/commitdate/receiptdate/shipmode columns
# exist, so lineitem stands in as the part-supplier relation and
# "late" = shipped > 60 days after the order date).  Each one exercises a
# decorrelation pattern Spark users need: window-min join-back (Q2),
# broadcast scalar subquery (Q11), join-time range predicate (Q12),
# correlated-agg semi-join chain (Q20), exists/not-exists self-join
# collapsed to one window pass (Q21).
# ---------------------------------------------------------------------------

@_spec(
    "q2_min_cost_supplier",
    "min-cost supplier per part in a region (TPC-H Q2 shape): the "
    "correlated min subquery decorrelates to a window min over the "
    "part key — one extra shuffle, no self-join re-scan",
    """WITH ps AS (
         SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                min(l_extendedprice::DECIMAL(12,2)) AS cost
         FROM lineitem GROUP BY 1, 2),
       rps AS (
         SELECT partkey, suppkey, cost, s_name, s_acctbal, n_name
         FROM ps JOIN supplier ON suppkey = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'AMERICA')
       SELECT p_partkey, s_name, n_name, s_acctbal,
              CAST(cost AS DOUBLE) AS min_cost
       FROM rps JOIN part ON partkey = p_partkey
       WHERE p_size = 5
         AND cost = (SELECT min(r2.cost) FROM rps r2
                     WHERE r2.partkey = p_partkey)""",
)
def q_q2(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(_dec(F.col("l_extendedprice"), 12, 2)).alias("cost"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 5).select(
        "p_partkey"
    )
    rps = (
        ps.join(F.broadcast(supp), ps.suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("partkey")
    return (
        rps.withColumn("min_cost_d", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost_d"))
        .join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "s_name", "n_name", "s_acctbal",
            F.col("cost").cast("double").alias("min_cost"),
        )
    )


@_spec(
    "q11_important_parts",
    "parts whose one-nation revenue exceeds a fraction of the nation "
    "total (TPC-H Q11 shape): the scalar subquery becomes a 1-row "
    "broadcast cross join; the threshold compare stays decimal-exact",
    f"""WITH v AS (
         SELECT l_partkey AS partkey, sum({_REV_SQL}) AS val
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_5' GROUP BY 1)
       SELECT partkey, CAST(val AS DOUBLE) AS val FROM v
       WHERE val > (SELECT sum(val) * 0.001::DECIMAL(4,3) FROM v)""",
)
def q_q11(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    ).select("n_nationkey")
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev()).alias("val"))
        # v feeds two consumers (threshold scalar + the filter join):
        # materialize once instead of replaying the lineitem join+agg
        # lineage per consumer (same treatment as dedup_semantic)
        .localCheckpoint(eager=False)
    )
    thresh = v.agg(
        (F.sum("val") * F.lit("0.001").cast(T.DecimalType(4, 3))).alias("cut")
    )
    return (
        v.join(F.broadcast(thresh))
        .filter(F.col("val") > F.col("cut"))
        .select("partkey", F.col("val").cast("double").alias("val"))
    )


@_spec(
    "q12_late_shipping",
    "late-shipment priority mix (TPC-H Q12 shape): equi-join carries a "
    "non-equi lateness predicate (shipdate > orderdate + 60 days) plus a "
    "pushed shipdate range; conditional counts in one pass",
    """SELECT l_returnflag AS flag,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate <  TIMESTAMP '1999-01-01'
       GROUP BY 1""",
)
def q_q12(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_spec(
    "q20_excess_suppliers",
    "suppliers holding excess share of a part family (TPC-H Q20 shape): "
    "correlated avg subquery decorrelates to an agg re-joined on the SAME "
    "part key (co-partitioned), then a distinct semi-join up to supplier",
    """WITH sq AS (
         SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                sum(l_quantity::DECIMAL(12,2)) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type = 'SMALL' GROUP BY 1, 2),
       aq AS (SELECT partkey, CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty
              FROM sq GROUP BY 1),
       excess AS (SELECT DISTINCT suppkey FROM sq JOIN aq USING (partkey)
                  WHERE CAST(qty AS DOUBLE) > 1.3 * avg_qty)
       SELECT s_suppkey, s_name FROM supplier
       JOIN excess ON s_suppkey = suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name IN ('NATION_7','NATION_8','NATION_9')""",
)
def q_q20(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    sq = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_dec(F.col("l_quantity"), 12, 2)).alias("qty"))
    )
    # exact decimal sum -> one deterministic double divide (order-free)
    aq = sq.groupBy("partkey").agg(
        (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    excess = (
        sq.join(aq, "partkey")
        .filter(F.col("qty").cast("double") > F.lit(1.3) * F.col("avg_qty"))
        .select("suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9")
    ).select("n_nationkey")
    return (
        supp.join(excess, supp.s_suppkey == F.col("suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )


@_spec(
    "q21_sole_late_supplier",
    "suppliers who alone held up multi-supplier orders (TPC-H Q21 shape): "
    "the EXISTS / NOT EXISTS self-join pair collapses to ONE window pass "
    "over the order key — supplier count and late count per order in a "
    "single shuffle instead of two self-join re-scans",
    """WITH l AS (
         SELECT l_orderkey AS ok, l_suppkey AS sk,
                max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS late
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F' GROUP BY 1, 2)
       SELECT s_name, count(*) AS numwait
       FROM l l1 JOIN supplier ON l1.sk = s_suppkey
       WHERE l1.late = 1
         AND EXISTS (SELECT 1 FROM l l2
                     WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
         AND NOT EXISTS (SELECT 1 FROM l l3
                         WHERE l3.ok = l1.ok AND l3.sk <> l1.sk
                           AND l3.late = 1)
       GROUP BY 1""",
)
def q_q21(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("ok")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.withColumn("n_supps", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_spec(
    "events_gapfill_locf",
    "time-series gap fill with last-observation-carried-forward: hourly "
    "rollup, per-series dense hour grid (sequence + explode), left join "
    "back on the rollup keys, LOCF window per series — the resample step "
    "before any downstream window/anomaly pass over regular intervals",
    """WITH agg AS (
         SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
                sum(value::DECIMAL(18,2)) AS sv
         FROM events GROUP BY 1, 2),
       rng AS (SELECT event_type, min(h) AS h0, max(h) AS h1
               FROM agg GROUP BY 1),
       grid AS (SELECT event_type,
                       unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
                FROM rng),
       j AS (SELECT g.event_type, g.h, a.n, a.sv
             FROM grid g LEFT JOIN agg a
               ON g.event_type = a.event_type AND g.h = a.h)
       SELECT event_type, h AS hour_start,
              COALESCE(n, 0) AS n_events,
              CAST(last_value(sv IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_value,
              (n IS NULL) AS filled
       FROM j""",
)
def q_events_gapfill(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("value"), 18, 2)).alias("sv"),
    )
    # per-series dense grid: the range agg is tiny (one row per series) and
    # the explode fans it back out map-side; no extra corpus shuffle
    rng = agg.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = rng.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    j = grid.join(agg, ["event_type", "h"], "left")
    # LOCF via the two-pass block prefix scan: event_type is
    # low-cardinality, so the plain carry-forward window would funnel
    # each series' full grid through one task; running_agg keeps every
    # sort ~n/P rows (the oracle keeps the window SQL spelling, which
    # the scan replays row-for-row — the grid's (event_type, h) key is
    # a total order)
    from ..functions.timeseries import running_agg

    filled = running_agg(j, ["event_type"], ["h"], lasts={"__locf": "sv"})
    return filled.select(
        "event_type",
        F.col("h").cast("timestamp_ntz").alias("hour_start"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.col("__locf").cast("double").alias("sum_value"),
        F.col("n").isNull().alias("filled"),
    )


@_spec(
    "cdc_scd2_history",
    "SCD type-2 dimension history from the changelog: one row per "
    "non-delete event with [valid_from, valid_to) from a single lead() "
    "window on the key — deletes close the prior version and emit "
    "nothing; merge keeps latest state, this keeps every state",
    f"""WITH {ORDERS_CHANGELOG_SQL}
    SELECT o_orderkey, o_totalprice, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM (SELECT op, o_orderkey, o_totalprice, ts_ms AS valid_from,
                 lead(ts_ms) OVER (PARTITION BY o_orderkey
                                   ORDER BY ts_ms) AS valid_to
          FROM changelog) v
    WHERE op <> 'd'""",
)
def q_cdc_scd2(spark, sf_dir):
    from ..operators.merge import scd2_history
    from .catalog import _fixture
    from ..sources.envelopes import synth_orders_changelog

    cl = _fixture(spark, sf_dir, "changelog", synth_orders_changelog)
    return scd2_history(cl, ["o_orderkey"]).select(
        "o_orderkey", "o_totalprice", "valid_from", "valid_to", "is_current"
    )


@_spec(
    "events_value_deciles",
    "ntile decile summary per series (deterministic tiebreak on event_id): "
    "bucket counts + exact value bounds — the rank-based histogram for "
    "threshold picking; one window shuffle",
    """SELECT event_type, decile, count(*) AS n,
              CAST(min(value) AS DOUBLE) AS lo,
              CAST(max(value) AS DOUBLE) AS hi
       FROM (SELECT event_type, value,
                    ntile(10) OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS decile
             FROM events) t
       GROUP BY 1, 2""",
)
def q_events_deciles(spark, sf_dir):
    from kafka_cdc_redshift_spark.util import (
        closed_form_ntile,
        range_partitioned_rank,
    )

    ev = load_table(spark, sf_dir, "events")
    # exact deciles WITHOUT funnelling each event_type through one
    # reducer: range-partitioned exact rank + the closed-form ntile
    # (the ccnet_buckets machinery); the oracle keeps the SQL ntile
    # spelling, which this replays bit-for-bit. `n` aliased __gn so the
    # bucket count column can keep its contract name.
    r = range_partitioned_rank(
        ev.select("event_type", "value", "event_id"),
        ["event_type"], ["value", "event_id"],
        rank_col="__rk", n_col="__gn",
    )
    return (
        r.withColumn(
            "decile", closed_form_ntile(10, rank_col="__rk", n_col="__gn")
        )
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
        )
    )


@_spec(
    "events_value_percentiles",
    "exact interpolated percentiles per series (percentile / "
    "quantile_cont): p50/p90/p99 in one aggregation — engines agree "
    "bit-for-bit on the linear-interpolation arithmetic",
    """SELECT event_type,
              quantile_cont(value, 0.5) AS p50,
              quantile_cont(value, 0.9) AS p90,
              quantile_cont(value, 0.99) AS p99
       FROM events GROUP BY 1""",
)
def q_events_percentiles(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )


@_spec(
    "events_winsorize_bounds",
    "winsorization prep per series: p05/p95 clip bounds (exact "
    "interpolated) + how many values each bound would clip — bounds agg "
    "broadcasts back against the fact, one aggregation pass each side",
    """WITH b AS (SELECT event_type,
                        quantile_cont(value, 0.05) AS lo,
                        quantile_cont(value, 0.95) AS hi
                 FROM events GROUP BY 1)
       SELECT e.event_type, count(*) AS n,
              CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
                AS n_lo,
              CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
                AS n_hi,
              lo, hi
       FROM events e JOIN b ON e.event_type = b.event_type
       GROUP BY 1, 5, 6""",
)
def q_events_winsorize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias("n_lo"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias("n_hi"),
        )
        .select("event_type", "n", "n_lo", "n_hi", "lo", "hi")
    )


@_spec(
    "events_value_hour_corr",
    "Pearson correlation per series from exact decimal/integer moments "
    "(one agg pass; a naive corr() would flake on float partial-agg "
    "order), degenerate groups (n<=1 or zero variance) excluded "
    "explicitly on both sides",
    """WITH m AS (
         SELECT event_type, count(*) AS n,
                CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS sx,
                CAST(sum(hour(ts)) AS DOUBLE) AS sy,
                CAST(sum(value::DECIMAL(18,2) * hour(ts)) AS DOUBLE) AS sxy,
                CAST(sum(value::DECIMAL(18,2) * value::DECIMAL(18,2))
                     AS DOUBLE) AS sxx,
                CAST(sum(hour(ts) * hour(ts)) AS DOUBLE) AS syy
         FROM events GROUP BY 1)
       SELECT event_type, n,
              (n * sxy - sx * sy)
                / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                AS corr_value_hour
       FROM m
       WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""",
)
def q_events_corr(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    x = _dec(F.col("value"), 18, 2)
    y = F.hour("ts")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    var_x = n * F.col("sxx") - sx * sx
    var_y = n * F.col("syy") - sy * sy
    return (
        m.filter((n > 1) & (var_x > 0) & (var_y > 0))
        .select(
            "event_type", "n",
            ((n * F.col("sxy") - sx * sy)
             / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_value_hour"),
        )
    )


@_spec(
    "events_quantile_sketch_audit",
    "mergeable quantile sketch audited on its RANK guarantee: the "
    "log-bucket histogram (functions/incremental.group_quantile_sketch — "
    "counts add, so streaming batches fold algebraically) must place "
    "each target-rank order statistic inside the bucket it selected. "
    "Output is the EXACT rank statistic (a data value — order-stat "
    "selection, no interpolation arithmetic) plus the in-query audit "
    "flag; the sketch's own bucket ids/estimates stay out of the compare "
    "because cross-engine log2 is not correctly-rounded (the "
    "events_approx_distinct pattern). The exact leg ranks via "
    "util.range_partitioned_rank — event_type is low-cardinality, so a "
    "plain rank window would funnel each type's full value census "
    "through one task (the ccnet_buckets lesson); the helper keeps "
    "every sort task at ~n/P rows and returns the (rank, group total) "
    "pair the ceil(p*tot) selection needs in one pass. Bound + merge "
    "properties are pinned in tests/test_properties.py",
    """WITH n AS (SELECT event_type, count(*) AS tot FROM events GROUP BY 1),
    r AS (SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn
          FROM events),
    p AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p)
    SELECT r.event_type, p.p, r.value AS exact_q,
           TRUE AS sketch_in_bucket
    FROM r JOIN n USING (event_type) CROSS JOIN p
    WHERE r.rn = greatest(CAST(ceil(p.p * n.tot) AS BIGINT), 1)""",
)
def q_events_quantile_sketch_audit(spark, sf_dir):
    from ..functions import incremental

    from kafka_cdc_redshift_spark.util import range_partitioned_rank

    ev = load_table(spark, sf_dir, "events")
    probs = [0.5, 0.9, 0.99]
    # exact rank-r order statistic per (group, p) — a data VALUE, so it
    # hash-matches the oracle's identical selection (event_id tiebreak
    # only stabilizes which duplicate row is picked; the value is equal).
    # range_partitioned_rank = the window spelling row-for-row, without
    # funneling each event_type's census through one sort task
    ranked = range_partitioned_rank(
        ev, ["event_type"], ["value", "event_id"],
        rank_col="rn", n_col="tot",
    )
    pl = F.explode(F.array(*[F.lit(p) for p in probs])).alias("p")
    exact = (
        ranked.select("event_type", "value", "rn", "tot", pl)
        .filter(
            F.col("rn")
            == F.greatest(
                F.ceil(F.col("p") * F.col("tot")).cast("long"), F.lit(1)
            )
        )
        .select("event_type", "p", F.col("value").alias("exact_q"))
    )
    # the sketch's selected bucket must CONTAIN that order statistic: the
    # cumulative-count selection walks buckets in value order, so this
    # holds by construction — the flag audits the implementation
    sk = incremental.group_quantile_sketch(ev, ["event_type"], "value")
    est = incremental.estimate_quantiles(sk, ["event_type"], probs)
    width = 2.0 ** (1.0 / incremental.QSK_BITS_PER_OCTAVE)
    v = F.col("exact_q").cast("double")
    lo, hi = F.col("est"), F.col("est") * F.lit(width)
    in_bucket = F.when(
        F.col("bucket") == 0, F.abs(v) < F.lit(1e-9)
    ).otherwise(
        F.when(
            F.col("bucket") > 0, (v >= lo * 0.999999) & (v <= hi * 1.000001)
        ).otherwise((v <= lo * 0.999999) & (v >= hi * 1.000001))
    )
    return (
        exact.join(est, ["event_type", "p"])
        .select(
            "event_type", "p", "exact_q",
            in_bucket.alias("sketch_in_bucket"),
        )
    )


@_spec(
    "events_topk_cms_audit",
    "mergeable Count-Min heavy-hitters sketch audited on its one-sided "
    "guarantee: for each group's exact top-3 values, the sketch estimate "
    "(functions/incremental.group_freq_sketch — counters add, so "
    "streaming batches fold algebraically) must be >= the true count. "
    "The hash rows are literal modular arithmetic over a Mersenne "
    "prime, not an engine-private hash, so the oracle replays every "
    "bucket id and the estimate itself hash-matches bit-for-bit; "
    "any-batching + bound properties are pinned in "
    "tests/test_properties.py",
    """WITH h AS (SELECT * FROM (VALUES (0, 1664525, 1013904223),
                                 (1, 1103515245, 12345),
                                 (2, 22695477, 1),
                                 (3, 214013, 2531011)) AS t(i, a, b)),
    r AS (SELECT event_type,
                 ((user_id % 2147483647) + 2147483647) % 2147483647 AS rr
          FROM events),
    cnt AS (SELECT event_type, h.i,
                   ((h.a * r.rr + h.b) % 2147483647) % 256 AS bucket,
                   count(*) AS n
            FROM r CROSS JOIN h GROUP BY 1, 2, 3),
    exact AS (SELECT event_type, user_id, count(*) AS exact_cnt
              FROM events GROUP BY 1, 2),
    top3 AS (SELECT event_type, user_id, exact_cnt,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY exact_cnt DESC, user_id) AS rnk
             FROM exact QUALIFY rnk <= 3),
    est AS (SELECT t.event_type, t.user_id, min(c.n) AS cms_est
            FROM top3 t CROSS JOIN h
            JOIN cnt c ON c.event_type = t.event_type AND c.i = h.i
             AND c.bucket = ((h.a * (((t.user_id % 2147483647) + 2147483647)
                                     % 2147483647) + h.b)
                             % 2147483647) % 256
            GROUP BY 1, 2)
    SELECT t.event_type, t.user_id, CAST(t.rnk AS INTEGER) AS rnk,
           CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           e.cms_est >= t.exact_cnt AS est_ge_exact
    FROM top3 t JOIN est e
      ON t.event_type = e.event_type AND t.user_id = e.user_id""",
)
def q_events_topk_cms_audit(spark, sf_dir):
    from ..functions import incremental

    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    top3 = exact.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("exact_cnt").desc(), "user_id"
            )
        ),
    ).filter(F.col("rnk") <= 3)
    sk = incremental.group_freq_sketch(ev, ["event_type"], "user_id")
    est = incremental.estimate_freq(sk, top3, ["event_type"], "user_id")
    return est.select(
        "event_type", "user_id", "rnk", "exact_cnt", "cms_est",
        (F.col("cms_est") >= F.col("exact_cnt")).alias("est_ge_exact"),
    )


@_spec(
    "events_kmv_sample_audit",
    "mergeable KMV bottom-k uniform sample audited end-to-end: the k=64 "
    "smallest-hashed distinct users per event type (functions/incremental"
    ".group_sample_sketch — min-of-union folds, so streaming merges are "
    "idempotent as well as associative/commutative) plus the sketch's "
    "NDV estimator. The hash is literal MINSTD affine arithmetic over a "
    "Mersenne prime, so the oracle replays every hash, the exact sample "
    "membership, AND the estimate bit-for-bit — unlike the engine-"
    "private HLL sketch, whose estimate the catalog can only bound. "
    "Any-batching/replay properties are pinned in tests/test_properties.py",
    """WITH d AS (SELECT DISTINCT event_type, user_id FROM events
                  WHERE user_id IS NOT NULL),
    h AS (SELECT event_type, user_id AS v,
                 (48271 * (((user_id % 2147483647) + 2147483647)
                           % 2147483647) + 33554393) % 2147483647 AS h
          FROM d),
    r AS (SELECT event_type, v, h,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY h, v) AS rnk
          FROM h QUALIFY rnk <= 64),
    g AS (SELECT event_type, count(*) AS sample_size,
                 max(CASE WHEN rnk = 64 THEN h END) AS hk
          FROM r GROUP BY 1),
    x AS (SELECT event_type, count(*) AS ndv_exact FROM d GROUP BY 1),
    e AS (SELECT event_type, sample_size,
                 CASE WHEN sample_size < 64 THEN CAST(sample_size AS DOUBLE)
                      ELSE 135291469761.0 / greatest(CAST(hk AS DOUBLE), 1.0)
                 END AS ndv_est
          FROM g)
    SELECT r.event_type, r.v AS sampled_user, r.h,
           CAST(r.rnk AS INTEGER) AS rnk,
           CAST(e.sample_size AS INTEGER) AS sample_size, e.ndv_est,
           CAST(x.ndv_exact AS BIGINT) AS ndv_exact,
           abs(e.ndv_est / x.ndv_exact - 1.0) < 0.5 AS est_ok
    FROM r JOIN e USING (event_type) JOIN x USING (event_type)""",
)
def q_events_kmv_sample_audit(spark, sf_dir):
    from ..functions import incremental

    ev = load_table(spark, sf_dir, "events")
    sk = incremental.group_sample_sketch(ev, ["event_type"], "user_id")
    rows = incremental.sample_rows(sk, ["event_type"]).withColumnRenamed(
        "v", "sampled_user"
    )
    est = incremental.estimate_distinct_kmv(sk, ["event_type"])
    exact = ev.filter(F.col("user_id").isNotNull()).groupBy("event_type").agg(
        F.countDistinct("user_id").alias("ndv_exact")
    )
    return (
        rows.join(est, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type", "sampled_user", "h", "rnk", "sample_size",
            "ndv_est", "ndv_exact",
            (F.abs(F.col("ndv_est") / F.col("ndv_exact") - F.lit(1.0))
             < F.lit(0.5)).alias("est_ok"),
        )
    )


@_spec(
    "events_grouping_sets",
    "explicit non-hierarchical GROUPING SETS ((event_type), (hour), ()) "
    "— two independent dimension rollups plus the grand total in ONE "
    "shuffle, a shape neither CUBE nor ROLLUP expresses without "
    "computing unwanted combinations; grouping id disambiguates the "
    "all-NULL rows (DataFrame.groupingSets, Spark 4)",
    """SELECT event_type, CAST(hour(ts) AS INT) AS hr,
              CAST(2 * grouping(event_type)
                   + grouping(hour(ts)) AS INT) AS gid,
              count(*) AS n,
              CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS sum_value
       FROM events
       GROUP BY GROUPING SETS ((event_type), (hour(ts)), ())""",
)
def q_events_grouping_sets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hr", F.hour("ts").cast("int")
    )
    et, hr = F.col("event_type"), F.col("hr")
    return (
        ev.groupingSets([[et], [hr], []], et, hr)
        .agg(
            (F.lit(2) * F.grouping(et) + F.grouping(hr))
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("value"), 18, 2)).cast("double").alias("sum_value"),
        )
        .select("event_type", "hr", "gid", "n", "sum_value")
    )
