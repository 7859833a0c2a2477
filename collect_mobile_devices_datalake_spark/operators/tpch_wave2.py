"""TPC-H analogue wave 2: q7/q8/q13/q18/q19/q22 shapes + a numeric range join.

The driver's testdata drops some classic TPC-H columns (no partsupp, no
l_shipmode/l_commitdate, no c_phone), so each query keeps the *shape* —
join topology, aggregation pattern, physical strategy — and adapts the
predicates to the columns that exist. Scale notes per query; the shared
rules (decimal-routed sums, broadcast dims, deterministic tiebreaks) are
in ``relational.py``'s module doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from .relational import dec

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * dec(1 - F.col("l_discount"))


@register(
    "q07_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(CAST(SUM({_REV_SQL}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7-shaped: bilateral trade volume between two nations by ship "
    "year. Both nation dims broadcast; the big fact joins shuffle on the "
    "orderkey/custkey/suppkey chain — at 100 TB bucket lineitem+orders on "
    "orderkey to make the first join shuffle-free.",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    nc = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    ns = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(ns), s.s_nationkey == F.col("snk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(
             CAST(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN {_REV_SQL}
                                ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM({_REV_SQL}) AS VARCHAR) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    GROUP BY year(o.o_orderdate)
    """,
    doc="TPC-H Q8-shaped: one nation's share of PROMO-part revenue sold into "
    "EUROPE, by order year — conditional/total aggregate in one pass "
    "(no second scan for the denominator).",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    nc = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    ns = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    rev = _rev()
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(dec(F.lit(0)))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == r.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("snk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_rev).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13-shaped: customer order-count distribution — left outer "
    "join preserving zero-order customers, then a histogram over the "
    "per-customer counts (double aggregation, both map-side combinable).",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) > 140
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
    """,
    doc="TPC-H Q18-shaped: large-volume orders (HAVING sum(qty) > 140 — the "
    "threshold-aggregate semi-join). The `big` aggregate runs on lineitem "
    "alone and semi-joins back, so the wide 3-table join only sees "
    "qualifying orders.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sq"))
        .filter(F.col("sq") > 140)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "bk"), o.o_orderkey == F.col("bk"), "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM({_REV_SQL}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19-shaped: disjunctive bracket predicates across the join "
    "(part attrs AND lineitem attrs per bracket). Part side broadcast; "
    "the OR-of-ANDs stays a single post-join filter Catalyst can split "
    "into per-side conjuncts where possible.",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#12") & sz.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#23") & sz.between(20, 50) & q.between(20, 50))
    )
    return j.filter(cond).agg(F.sum(_rev()).cast("double").alias("revenue"))


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name,
           COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q22-shaped (no c_phone in testdata → nation stands in for "
    "country code): above-average-balance customers with no 2001 orders — "
    "scalar-subquery threshold + anti-join, grouped by nation. The "
    "decimal-routed mean keeps the threshold bit-identical cross-engine.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("ab"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "range_join_value_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 50.0),
             ('mid', 50.0, 200.0), ('large', 200.0, 1000000.0)
    )
    SELECT b.band, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
    doc="Numeric range join: fact value against band [lo, hi) intervals. "
    "Bands are a literal broadcast dim → BroadcastNestedLoopJoin, the "
    "right plan for interval joins against a small dim (at scale, bin "
    "first via width_bucket-style math when bands are uniform).",
)
def q_range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    bands = spark.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 50.0), ("mid", 50.0, 200.0), ("large", 200.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        e.join(F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
