"""Analytic/relational surface over the lake (SURVEY.md §7 M3).

The reference stores spec data but has no query engine; this module is
the engine. Conventions for oracle parity + 100 TB scale:

- Money/quantity aggregates go through DECIMAL(18,4): decimal addition is
  exact and associative, so the sum is identical regardless of partial-agg
  order across partitions (and matches DuckDB bit-for-bit after the final
  cast to double). Plain double sums would be partition-order dependent.
- Every top-k carries a deterministic tiebreak key.
- Small dims (region, nation, supplier at any SF; customer at test SF) are
  broadcast — Catalyst does it from size stats; `F.broadcast` marks the
  intent explicitly where the dim is known-small by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import load_table


def dec(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,4)")


def dsum(c: Column | str) -> Column:
    """Exact (decimal) sum, surfaced as double."""
    return F.sum(dec(c)).cast("double")


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: scan + pushdown filter + partial/final agg.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    # keep the product within DECIMAL(38,*): combine the two double factors
    # first, cast once — a triple decimal product overflows precision and
    # degrades engine-dependently.
    charge = dec("l_extendedprice") * dec((1 - F.col("l_discount")) * (1 + F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).cast("double").alias("avg_qty"),
            (dsum("l_discount") / F.count("*")).cast("double").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q03_top_revenue",
    oracle="""
    SELECT o.o_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    doc="TPC-H Q3-shaped: selective dim filter → fact join → top-k by aggregate.",
)
def q03_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    revenue = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q05_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-shaped multi-join: star joins with broadcast dims, local-supplier filter.",
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, "region", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    revenue = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q_rollup_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    doc="Hierarchical rollup (region → nation → grand total) — partial aggs reused per level.",
)
def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_bal")
    )


@register(
    "q_cube_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two low-cardinality dims.",
)
def q_cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price")
    )


@register(
    "q_window_topk_per_segment",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    ) WHERE rk <= 3
    """,
    doc="Top-k per group via ranked window — shuffles once on the partition key.",
)
def q_window_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "q_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS running_total,
           lag(o_totalprice) OVER w AS prev_price,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w3 AS DOUBLE) / COUNT(*) OVER w3 AS DOUBLE) AS moving_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING),
           w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS 2 PRECEDING)
    """,
    doc="Running totals, lag, and a moving average in one windowed pass.",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w3 = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.lag("o_totalprice").over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("prev_price"),
        (F.sum(dec("o_totalprice")).over(w3).cast("double") / F.count("*").over(w3))
        .cast("double")
        .alias("moving_avg3"),
    )


@register(
    "q_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="UNION / INTERSECT / EXCEPT composition (reference's Set algebra, app.js:406-413, 477-479).",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("c_custkey"))
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    # SQL precedence: INTERSECT binds tighter than UNION/EXCEPT; UNION/EXCEPT
    # associate left-to-right.
    return building.intersect(big).union(negative).distinct().subtract(finished)


@register(
    "q_semi_anti_join",
    oracle="""
    SELECT c.c_custkey, 'has_big_order' AS tag FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    UNION ALL
    SELECT c.c_custkey, 'no_orders' AS tag FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="left_semi + left_anti — the join family behind crawl_resume (app.js:479).",
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    big = o.filter(F.col("o_totalprice") > 300000)
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("tag")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("tag")
    )
    return semi.unionAll(anti)


@register(
    "q_distinct_agg",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Multi-distinct aggregation (expand + two-phase agg in Spark).",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@register(
    "q_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++) — the 100 TB cardinality path. The HLL "
    "estimate is engine-specific, so the oracled output is the exact count "
    "plus a tolerance assertion: rsd=0.01 must land within 5% of exact (a "
    ">4-sigma bound) — a drifting sketch flips the boolean and fails parity.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    approx = F.approx_count_distinct("l_partkey", 0.01)
    exact = F.countDistinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx.cast("double") - exact.cast("double")) / exact.cast("double")
            < 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 5) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_type, ' ', '-') AS type_dashed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
    doc="String function battery (§2.2 scalar surface).",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("-")).alias("type_dashed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_95,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
    FROM orders
    """,
    doc="Date/time function battery; dow normalized to Sunday=1 on both engines.",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_95"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
    )


@register(
    "q_conditional_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(CAST(SUM(CASE WHEN o_totalprice > 200000 THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS big_order_value
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Pivot-style conditional aggregation.",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n_urgent"),
        F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)).alias("n_low"),
        F.sum(
            F.when(F.col("o_totalprice") > 200000, dec("o_totalprice")).otherwise(dec(F.lit(0)))
        )
        .cast("double")
        .alias("big_order_value"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="JSON payload extraction (versus window.__data analogue, app.js:682-692).",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "order_overlap_stats",
    oracle="""
    WITH iv AS (
      SELECT o.o_custkey, o.o_orderkey, o.o_orderdate AS s,
             MAX(l.l_shipdate) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.o_custkey,
             date_diff('day', greatest(a.s, b.s), least(a.e, b.e))
               AS overlap_days
      FROM iv a JOIN iv b
        ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
       AND a.s <= b.e AND b.s <= a.e
    )
    SELECT p.o_custkey AS custkey,
           CAST(MIN(n.n_orders) AS BIGINT) AS n_orders,
           COUNT(*) AS n_overlap_pairs,
           CAST(MAX(p.overlap_days) AS BIGINT) AS max_overlap_days
    FROM pairs p
    JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM iv GROUP BY 1) n
      ON n.o_custkey = p.o_custkey
    GROUP BY 1
    """,
    doc="Interval-overlap self-join with an equi-key: each order's "
    "fulfillment interval is [o_orderdate, max l_shipdate]; orders of "
    "the SAME customer whose intervals overlap are paired and "
    "summarized per customer. The equi-key (custkey) bounds the join "
    "fan-out to each customer's own orders, so the plan is a plain "
    "shuffled hash join on custkey + a residual range predicate — no "
    "banding needed and no cross product at any scale. The per-order "
    "interval itself comes from one partial aggregation of lineitem.",
)
def q_order_overlap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("e"))
        .select("o_custkey", "o_orderkey", F.col("o_orderdate").alias("s"), "e")
    )
    a = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k_a"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
    )
    b = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
    )
    pairs = a.join(b, "custkey").filter(
        (F.col("k_a") < F.col("k_b"))
        & (F.col("s_a") <= F.col("e_b"))
        & (F.col("s_b") <= F.col("e_a"))
    )
    n_orders = iv.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders")
    )
    return (
        pairs.select(
            "custkey",
            F.datediff(
                F.least("e_a", "e_b"), F.greatest("s_a", "s_b")
            ).alias("overlap_days"),
        )
        .groupBy("custkey")
        .agg(
            F.count("*").alias("n_overlap_pairs"),
            F.max("overlap_days").cast("long").alias("max_overlap_days"),
        )
        .join(F.broadcast(n_orders), "custkey")
        .select(
            "custkey",
            F.col("n_orders").cast("long").alias("n_orders"),
            "n_overlap_pairs",
            "max_overlap_days",
        )
    )


@register(
    "customer_revenue_concentration",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s
      FROM orders GROUP BY o_custkey
    ),
    binned AS (
      SELECT o_custkey, s, ntile(10) OVER (ORDER BY s DESC, o_custkey) AS decile
      FROM spend
    ),
    tot AS (SELECT SUM(s) AS t FROM spend)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE) AS revenue,
           round(CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST((SELECT t FROM tot) AS VARCHAR) AS DOUBLE), 6)
             AS revenue_share
    FROM binned GROUP BY decile ORDER BY decile
    """,
    doc="Revenue-concentration (Pareto) report: customers deciled by "
    "total spend (decile 1 = biggest spenders), with each decile's "
    "exact decimal revenue and share — the 80/20 diagnostic. Exact "
    "ranking without a global sort of customers: the same "
    "rank-from-cumulative-counts construction as curriculum_bins, with "
    "the only global-order window running over the per-distinct-spend "
    "aggregate (bounded for a 2-decimal currency metric; the "
    "curriculum_bins / value_distribution_shift spine shape). Spend "
    "sums and decile revenues are DECIMAL-exact; shares are single "
    "IEEE divisions.",
)
def q_customer_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s")
    )
    by_s = spend.groupBy("s").agg(F.count("*").alias("cnt"))
    w_cum = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, -1)
    offsets = by_s.select(
        "s", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("offset")
    )
    total_n = by_s.agg(F.sum("cnt").alias("n_total"))
    w_in = Window.partitionBy("s").orderBy("o_custkey")
    ranked = (
        spend.select("o_custkey", "s", F.row_number().over(w_in).alias("rn_in"))
        .join(F.broadcast(offsets), "s")
        .crossJoin(F.broadcast(total_n))
        .withColumn("r", F.col("offset") + F.col("rn_in"))
    )
    q, rem, r = (
        F.floor(F.col("n_total") / 10),
        F.col("n_total") % 10,
        F.col("r"),
    )
    big_span = (q + 1) * rem
    decile = F.when(r <= big_span, F.ceil(r / (q + 1))).otherwise(
        rem + F.ceil((r - big_span) / F.greatest(q, F.lit(1)))
    )
    binned = ranked.select("s", decile.cast("int").alias("decile"))
    tot = spend.agg(F.sum("s").alias("t"))
    return (
        binned.groupBy("decile")
        .agg(F.count("*").cast("long").alias("n_customers"), F.sum("s").alias("rev"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.col("rev").cast("double").alias("revenue"),
            F.round(F.col("rev").cast("double") / F.col("t").cast("double"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("decile")
    )


@register(
    "orders_backlog_timeline",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS opened,
             CAST(MAX(l.l_shipdate) AS DATE) AS closed
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT opened AS day, 1 AS d FROM iv
      UNION ALL
      SELECT closed + INTERVAL 1 DAY, -1 FROM iv
    ),
    by_day AS (
      SELECT CAST(day AS DATE) AS day,
             CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS opened,
             CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS closed
      FROM deltas GROUP BY 1
    )
    SELECT day, opened, closed,
           CAST(SUM(opened - closed) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
    FROM by_day
    """,
    doc="Sweep-line backlog timeline: each order is open over "
    "[o_orderdate, max l_shipdate]; +1/-1 boundary deltas aggregated "
    "per day and cumulated give the exact number of concurrently open "
    "orders on every active day — interval COUNTING (the complement of "
    "order_overlap_stats' interval pairing) without ever joining "
    "intervals. The only ordered window runs over the per-day "
    "aggregate — bounded by the calendar, not the order count. All "
    "integers; engine-exact by construction.",
)
def q_orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("opened"))
        .agg(F.to_date(F.max("l_shipdate")).alias("closed"))
    )
    deltas = iv.select(F.col("opened").alias("day"), F.lit(1).alias("d")).unionAll(
        iv.select(F.date_add("closed", 1).alias("day"), F.lit(-1).alias("d"))
    )
    by_day = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias("opened"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("long").alias("closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return by_day.select(
        "day",
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed")).over(w).cast("long").alias("n_open"),
    )
