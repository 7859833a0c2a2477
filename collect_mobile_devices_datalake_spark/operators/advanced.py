"""Advanced relational operators: iterative frontier BFS, as-of join,
pivot, grouping sets, percentiles, array-function battery.

Each one is an operator class the reference either hand-rolls
imperatively (frontier recursion, app.js:166-189) or lacks entirely;
all are expressed as DataFrame plans with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import load_table

# --- iterative frontier discovery (reference #6, app.js:156-194) ------------

BFS_DEPTH = 6


@register(
    "frontier_bfs",
    oracle=f"""
    WITH RECURSIVE b(node, depth) AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION
      SELECT nxt, depth + 1 FROM (
        SELECT (2 * node + 1) % (SELECT COUNT(*) FROM orders) AS nxt, depth
        FROM b WHERE depth < {BFS_DEPTH}
        UNION ALL
        SELECT (3 * node + 2) % (SELECT COUNT(*) FROM orders) AS nxt, depth
        FROM b WHERE depth < {BFS_DEPTH}
      ) t
    )
    SELECT node, CAST(MIN(depth) AS INTEGER) AS depth FROM b GROUP BY node
    """,
    doc="Iterative BFS frontier (gsmarena nav recursion app.js:166-189 as a "
    "driver-side loop of distributed set ops); node graph derived from orders.",
)
def q_frontier_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import scoped_shuffle_width

    orders = load_table(spark, "orders", sf_dir)
    m = orders.count()  # orderkeys are 0..m-1 contiguous
    seed = spark.createDataFrame([(1, 0)], "node bigint, depth int")
    visited = seed
    frontier = seed
    # the frontier doubles per level: |visited| <= 2^(depth+1) rows —
    # per-round shuffles sized to that bound, not the session default
    with scoped_shuffle_width(spark, 2 ** (BFS_DEPTH + 1)):
        visited = _bfs_rounds(spark, visited, frontier, m)
    return visited


def _bfs_rounds(spark: SparkSession, visited: DataFrame, frontier: DataFrame, m: int) -> DataFrame:
    for depth in range(1, BFS_DEPTH + 1):
        nxt = (
            frontier.select(((2 * F.col("node") + 1) % m).alias("node"))
            .unionAll(frontier.select(((3 * F.col("node") + 2) % m).alias("node")))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(depth).alias("depth"))
        )
        # materialize each level: keeps the lineage flat so the loop doesn't
        # build an exponentially deep plan (driver-side BFS, not recursion)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited


# --- as-of join (events: purchase ← most recent click at-or-before) ---------


@register(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join via the union+window method: one shuffle on user_id, "
    "last_value(ignorenulls) carries the latest click forward — no range "
    "explosion at scale (vs join+filter+max).",
)
def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("kind")
    )
    merged = purchases.unionAll(clicks)
    # clicks sort before purchases at equal ts (kind 0 < 1) → at-or-before
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("last_click_ts", click_ts)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
        )
    )


# --- pivot -------------------------------------------------------------------

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Pivot (explicit value list → no extra distinct pass) with count cells.",
)
def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    aliases = {
        "1-URGENT": "p1_urgent",
        "2-HIGH": "p2_high",
        "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_not_specified",
        "5-LOW": "p5_low",
    }
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return pivoted.select(
        "o_orderstatus", *[F.col(f"`{p}`").alias(aliases[p]) for p in PRIORITIES]
    )


# --- grouping sets -----------------------------------------------------------


@register(
    "grouping_sets_mixed",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
    """,
    doc="Explicit GROUPING SETS (neither pure rollup nor cube).",
)
def q_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        """
    )


# --- percentiles -------------------------------------------------------------


@register(
    "percentiles_by_status",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(MIN(o_totalprice), 4) AS lo,
           round(MAX(o_totalprice), 4) AS hi
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles per group (Spark percentile ≡ DuckDB "
    "quantile_cont); approx_percentile is the 100 TB path, checked rows-only.",
)
def q_percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


@register(
    "approx_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_exact,
           TRUE AS est_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile (GK sketch) — mergeable, single pass, the "
    "percentile path that scales. The sketch value is engine-specific, so "
    "the oracled output is the exact median plus a tolerance assertion on "
    "what the sketch actually guarantees: RANK error ≤ N/accuracy (a "
    "value-relative bound would be skew-dependent and can legitimately "
    "fail on a heavy-tailed column). The estimate's rank interval "
    "[count(<est), count(<=est)] must intersect N/2 ± 2N/accuracy; if the "
    "sketch drifts past its bound, the boolean flips and the oracle fails.",
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ACC = 10000
    li = load_table(spark, "lineitem", sf_dir)
    est_df = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(ACC)).alias("est"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_exact"),
    )
    # rank the estimate within its group: with ties, the estimate occupies
    # the rank interval [count(<est), count(<=est)]
    ranked = (
        li.join(F.broadcast(est_df), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("median_exact").alias("median_exact"),
            F.count("*").alias("n"),
            F.sum((F.col("l_extendedprice") < F.col("est")).cast("long")).alias("r_lt"),
            F.sum((F.col("l_extendedprice") <= F.col("est")).cast("long")).alias("r_le"),
        )
    )
    target = F.col("n") * 0.5
    tol = F.greatest(F.col("n") * (2.0 / ACC), F.lit(2.0))
    return ranked.select(
        "l_returnflag",
        "median_exact",
        ((F.col("r_lt") <= target + tol) & (F.col("r_le") >= target - tol)).alias(
            "est_rank_ok"
        ),
    )


# --- array-function battery --------------------------------------------------


@register(
    "array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS first3_sorted,
           CAST(list_contains(toks, 'the') AS BOOLEAN) AS has_the,
           array_to_string(list_reverse(toks[1:3]), ' ') AS first3_reversed
    FROM t
    """,
    doc="Array function battery: size/distinct/sort/slice/contains/reverse/join.",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, "documents", sf_dir)
    toks = tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        # Stringified: the driver's pandas canonicalizer cannot hash list cells.
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), " ").alias(
            "first3_sorted"
        ),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(F.reverse(F.slice(toks, 1, 3)), " ").alias("first3_reversed"),
    )


@register(
    "asof_forward_click",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS next_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts < c.ts
    """,
    doc="FORWARD as-of join: first click strictly after each purchase, "
    "same union+window method as the backward op but with a "
    "currentRow→unboundedFollowing frame — still one shuffle on "
    "user_id, no range explosion. The (ts, kind, event_id) sort puts "
    "equal-ts clicks before the purchase row, which encodes the STRICT "
    "'after' semantics in the frame itself (no post-filter).",
)
def q_asof_forward_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("kind")
    )
    merged = purchases.unionAll(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    next_click = F.first(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("next_click_ts", next_click)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "next_click_ts",
        )
    )


@register(
    "asof_nearest_click",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    back AS (
      SELECT p.event_id, p.user_id, p.ts, cb.ts AS back_ts
      FROM p ASOF LEFT JOIN c cb ON p.user_id = cb.user_id AND p.ts >= cb.ts
    ),
    bf AS (
      SELECT b.event_id, b.user_id, b.ts, b.back_ts, cf.ts AS fwd_ts
      FROM back b ASOF LEFT JOIN c cf ON b.user_id = cf.user_id AND b.ts < cf.ts
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           CASE WHEN back_ts IS NULL THEN fwd_ts
                WHEN fwd_ts IS NULL THEN back_ts
                WHEN date_diff('microsecond', back_ts, ts)
                     <= date_diff('microsecond', ts, fwd_ts) THEN back_ts
                ELSE fwd_ts END AS nearest_click_ts
    FROM bf
    """,
    doc="NEAREST as-of join: closest click in either direction (ties "
    "prefer the at-or-before side). Both directional lookups are window "
    "functions over the SAME (user_id, ts) sort — Catalyst plans ONE "
    "exchange + one sort serving both frames, so 'nearest' costs the "
    "same single shuffle as one-directional as-of; the oracle needs two "
    "chained ASOF joins to say the same thing.",
)
def q_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("kind")
    )
    merged = purchases.unionAll(clicks)
    base = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    click_ts = F.when(F.col("kind") == 0, F.col("ts"))
    back = F.last(click_ts, ignorenulls=True).over(wb)
    fwd = F.first(click_ts, ignorenulls=True).over(wf)
    # events.ts is TIMESTAMP_NTZ; this Spark build refuses NTZ→BIGINT, so hop
    # through LTZ (session TZ pinned UTC → lossless) and take microseconds,
    # matching the oracle's date_diff('microsecond', ...).
    def _us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp_ltz"))

    d_back = _us("ts") - _us("back_ts")
    d_fwd = _us("fwd_ts") - _us("ts")
    return (
        merged.withColumn("back_ts", back)
        .withColumn("fwd_ts", fwd)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
            .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
            .when(d_back <= d_fwd, F.col("back_ts"))
            .otherwise(F.col("fwd_ts"))
            .alias("nearest_click_ts"),
        )
    )


@register(
    "order_value_outliers_mad",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,4)) AS p,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
      FROM orders
    ),
    med AS (  -- med2 = 2 * median, exact decimal (middle-pair sum)
      SELECT o_orderstatus,
             SUM(CASE WHEN rn = (cnt + 1) // 2 THEN p ELSE 0 END)
             + SUM(CASE WHEN rn = (cnt + 2) // 2 THEN p ELSE 0 END) AS med2
      FROM ranked GROUP BY 1
    ),
    dev AS (
      SELECT r.o_orderkey, r.o_orderstatus, r.p,
             abs(2 * r.p - m.med2) AS dev2
      FROM ranked r JOIN med m USING (o_orderstatus)
    ),
    dev_ranked AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY dev2, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
      FROM dev
    ),
    mad AS (  -- mad4 = 4 * MAD, exact decimal
      SELECT o_orderstatus,
             SUM(CASE WHEN rn = (cnt + 1) // 2 THEN dev2 ELSE 0 END)
             + SUM(CASE WHEN rn = (cnt + 2) // 2 THEN dev2 ELSE 0 END) AS mad4
      FROM dev_ranked GROUP BY 1
    )
    SELECT d.o_orderkey, d.o_orderstatus,
           CAST(CAST(d.p AS VARCHAR) AS DOUBLE) AS totalprice,
           round(CAST(CAST(2 * d.dev2 AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(m.mad4 AS VARCHAR) AS DOUBLE), 6) AS mad_score
    FROM dev d JOIN mad m USING (o_orderstatus)
    WHERE d.dev2 > m.mad4
    """,
    doc="Robust (median/MAD) outlier detection per order status. All "
    "medians are computed EXACTLY in the decimal domain via the "
    "middle-pair-sum trick (med2 = v[(n+1)/2] + v[(n+2)/2] = 2x the "
    "interpolated median, so no engine-variant float interpolation "
    "ever happens), and the outlier gate |x - med| > 2 * MAD is the "
    "integer-exact comparison dev2 > mad4 — no FP boundary can "
    "flip a row between engines. At 100 TB the exact per-group rank "
    "pass swaps for approx_percentile (see approx_percentiles); this "
    "operator is the exact twin the sketch is validated against.",
)
def q_order_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    p = F.col("o_totalprice").cast("decimal(18,4)")
    w_rank = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_all = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderkey",
        "o_orderstatus",
        p.alias("p"),
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("cnt"),
    )
    mid_lo = F.expr("(cnt + 1) div 2")
    mid_hi = F.expr("(cnt + 2) div 2")
    zero = F.lit(0).cast("decimal(18,4)")
    med = ranked.groupBy("o_orderstatus").agg(
        (
            F.sum(F.when(F.col("rn") == mid_lo, F.col("p")).otherwise(zero))
            + F.sum(F.when(F.col("rn") == mid_hi, F.col("p")).otherwise(zero))
        ).alias("med2")
    )
    dev = ranked.join(F.broadcast(med), "o_orderstatus").select(
        "o_orderkey",
        "o_orderstatus",
        "p",
        F.abs(F.lit(2) * F.col("p") - F.col("med2")).alias("dev2"),
    )
    w_drank = Window.partitionBy("o_orderstatus").orderBy("dev2", "o_orderkey")
    dev_ranked = dev.select(
        "*",
        F.row_number().over(w_drank).alias("rn"),
        F.count("*").over(w_all).alias("cnt"),
    )
    zero_d = F.lit(0).cast(dev.schema["dev2"].dataType.simpleString())
    mad = dev_ranked.groupBy("o_orderstatus").agg(
        (
            F.sum(F.when(F.col("rn") == mid_lo, F.col("dev2")).otherwise(zero_d))
            + F.sum(F.when(F.col("rn") == mid_hi, F.col("dev2")).otherwise(zero_d))
        ).alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderstatus")
        .filter(F.col("dev2") > F.col("mad4"))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("p").cast("double").alias("totalprice"),
            F.round(
                (F.lit(2) * F.col("dev2")).cast("double")
                / F.col("mad4").cast("double"),
                6,
            ).alias("mad_score"),
        )
    )


def _attribution_oracle() -> str:
    """Compose the as-of join oracle verbatim, credit purchase value to
    the attributed click's hour."""
    from ..registry import REGISTRY

    asof = REGISTRY["asof_purchase_click"].oracle
    return f"""
    WITH attributed AS ({asof})
    SELECT date_trunc('hour', a.last_click_ts) AS click_hour,
           a.last_click_ts IS NOT NULL AS is_attributed,
           COUNT(*) AS n_purchases,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS credited_value
    FROM attributed a JOIN events e ON e.event_id = a.purchase_id
    GROUP BY 1, 2
    """


@register(
    "purchase_attribution",
    oracle=_attribution_oracle(),
    doc="Last-touch attribution report: each purchase's value is "
    "credited to the HOUR of the click the as-of join attributes it to "
    "(asof_purchase_click composed verbatim on both engines); "
    "purchases with no preceding click land in the is_attributed=false "
    "bucket. Credited values are DECIMAL-exact sums. One shuffle on "
    "user_id (inside the as-of) + one on the hour — the standard "
    "marketing-attribution rollup at any scale.",
)
def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    asof = q_asof_purchase_click(spark, sf_dir)
    e = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("purchase_id"), "value"
    )
    return (
        asof.join(e, "purchase_id")
        .groupBy(
            F.date_trunc("hour", "last_click_ts").alias("click_hour"),
            F.col("last_click_ts").isNotNull().alias("is_attributed"),
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("credited_value"),
        )
    )


@register(
    "price_discount_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_discount AS DECIMAL(18,4))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
             SUM(CAST(l_discount AS DECIMAL(18,4))
                 * CAST(l_discount AS DECIMAL(18,4))) AS sxx,
             SUM(CAST(l_discount AS DECIMAL(18,4))
                 * CAST(l_extendedprice AS DECIMAL(18,4))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round((n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                 / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(sx AS VARCHAR) AS DOUBLE)), 6) AS slope,
           round((CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                  - ((n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                     / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                          * CAST(CAST(sx AS VARCHAR) AS DOUBLE)))
                    * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / n, 6)
             AS intercept
    FROM s ORDER BY l_returnflag
    """,
    doc="In-engine simple linear regression (price vs discount per "
    "return flag): every moment (Σx, Σy, Σx², Σxy) is an EXACT decimal "
    "sum — order-independent, partial-aggregation-safe — and the OLS "
    "slope/intercept are closed-form IEEE expressions over those exact "
    "moments, so both engines compute bit-identical coefficients. The "
    "built-in regr_slope/regr_intercept aggregates accumulate in "
    "floating point (order-dependent at scale); this is the "
    "shuffle-stable form a 100 TB fit actually needs.",
)
def q_price_discount_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    dx = F.col("l_discount").cast("decimal(18,4)")
    dy = F.col("l_extendedprice").cast("decimal(18,4)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dx * dy).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Golden-record survivorship: priority-then-recency field resolution
# ---------------------------------------------------------------------------

# Source priority for conflict resolution (higher wins), mirroring the
# reference's merge semantics (app.js fold-to-object, last-wins per key)
# upgraded to explicit survivorship: priority first, recency second,
# event_id as the final total-order tiebreak.
_SURV_PRIO = {"purchase": 5, "signup": 4, "click": 3, "view": 2, "error": 1}

# The three-level ordering (prio, ts, event_id) is packed into ONE
# DECIMAL(38,0)/HUGEINT key so max_by gets a total order with map-side
# partial aggregation (a window would sort every user's history):
#   key = prio * 10^27 + epoch_micros * 10^10 + event_id
# epoch_micros < 10^17 for any date before year 5138 and event_id < 10^10
# by construction, so the three fields cannot collide and the sum stays
# below 6*10^27 << 10^38. Exact on both engines (Spark DECIMAL(38,0),
# DuckDB HUGEINT).
_SURV_KEY_SQL = (
    "CAST(prio AS HUGEINT) * 1000000000000000000000000000"
    " + CAST(epoch_us(ts) AS HUGEINT) * 10000000000"
    " + CAST(event_id AS HUGEINT)"
)


def survivorship_keyed(e: DataFrame) -> DataFrame:
    """(user_id, event_id, event_type, ts, k, okey): events projected to
    the survivorship ordering key — shared by the batch op and the
    streaming maintenance twin (streaming/survivorship_maintenance.py)."""
    prio = F.create_map(
        *[F.lit(x) for kv in _SURV_PRIO.items() for x in kv]
    )[F.col("event_type")]
    dec = 'decimal(38,0)'
    okey = (
        prio.cast(dec) * F.lit("1000000000000000000000000000").cast(dec)
        + F.unix_micros(F.col("ts").cast("timestamp_ltz")).cast(dec)
        * F.lit("10000000000").cast(dec)
        + F.col("event_id").cast(dec)
    )
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        okey.alias("okey"),
    )


def survivorship_golden(keyed: DataFrame) -> DataFrame:
    """One hash aggregation: the per-user argmax fields plus the count
    and recency legs. The argmax/max legs form an idempotent join-
    semilattice (re-merging absorbed rows is a no-op — what the
    streaming twin exploits); n_events is the one non-idempotent SUM."""
    return keyed.groupBy("user_id").agg(
        F.max_by("k", "okey").alias("golden_k"),
        F.max_by("event_id", "okey").alias("golden_event_id"),
        F.max_by("event_type", "okey").alias("golden_type"),
        F.count("*").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )



@register(
    "golden_record_survivorship",
    oracle=f"""
    WITH pe AS (
      SELECT user_id, event_id, event_type, ts,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CASE event_type WHEN 'purchase' THEN 5 WHEN 'signup' THEN 4
                  WHEN 'click' THEN 3 WHEN 'view' THEN 2 ELSE 1 END AS prio
      FROM events
    ),
    keyed AS (SELECT *, {_SURV_KEY_SQL} AS okey FROM pe)
    SELECT user_id,
           max_by(k, okey) AS golden_k,
           CAST(max_by(event_id, okey) AS BIGINT) AS golden_event_id,
           max_by(event_type, okey) AS golden_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts) AS last_ts
    FROM keyed GROUP BY user_id ORDER BY user_id
    """,
    doc="Entity-resolution survivorship: one golden record per user, the "
    "surviving attribute chosen by source priority (purchase > signup > "
    "click > view > error) then recency then event_id — the reference's "
    "fold-to-object last-wins merge (app.js merge_array_object) upgraded "
    "to an explicit, total-ordered conflict-resolution policy. The "
    "(prio, ts, event_id) ordering is packed into a single exact "
    "DECIMAL(38,0) key (doc on _SURV_KEY_SQL) so the whole op is ONE "
    "hash aggregation with map-side partial max_by — no window, no "
    "per-user sort, no shuffle beyond the single groupBy(user_id) "
    "exchange — which is the shape that survives 100 TB of events with "
    "billions of users; ties are impossible because event_id is unique, "
    "so the argmax is deterministic on both engines.",
)
def q_golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return survivorship_golden(survivorship_keyed(e)).orderBy("user_id")
