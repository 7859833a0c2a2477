"""Data-distribution diagnostics — the pre-flight checks a 100 TB job runs.

Before shuffling 100 TB on a key, you want to know (a) whether the key is
skewed (one hot key = one straggler task) and (b) how evenly the hash
partitioner will spread it. Both reports aggregate FIRST (per-key counts,
a shuffle on the diagnosed key itself at a fraction of payload width) and
only then rank/bucket the tiny aggregate — the diagnostic never costs
more than the shuffle it is diagnosing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from .training import _SPLIT_HASH_SQL, split_hash

_TOPK = 20


@register(
    "key_skew_report",
    oracle=f"""
    WITH c AS (
      SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ),
    t AS (SELECT SUM(n) AS total, CAST(AVG(n) AS DOUBLE) AS avg_n FROM c),
    ranked AS (
      SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rank
      FROM c
    )
    SELECT rank, key, n,
           ROUND(CAST(n AS DOUBLE) / total, 12) AS share,
           ROUND(CAST(n AS DOUBLE) / avg_n, 12) AS x_avg
    FROM ranked CROSS JOIN t WHERE rank <= {_TOPK}
    """,
    doc="Join-key skew report: top-20 heaviest o_custkey values with their "
    "share of rows and multiple-of-average — the straggler predictor you "
    "run before shuffling on a key. Per-key counts first (map-side "
    "partial agg), then top-K via rank over the aggregate: Spark plans "
    "the limit as TakeOrdered over per-partition heaps, never a full "
    "sort of the key domain.",
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, "orders", sf_dir)
    c = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count("*").alias("n"))
    t = c.agg(
        F.sum("n").alias("total"), F.avg("n").cast("double").alias("avg_n")
    )
    ranked = c.select(
        "key", "n", F.row_number().over(Window.orderBy(F.desc("n"), "key")).alias("rank")
    ).filter(F.col("rank") <= _TOPK)
    return ranked.crossJoin(F.broadcast(t)).select(
        "rank",
        "key",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 12).alias("share"),
        F.round(F.col("n").cast("double") / F.col("avg_n"), 12).alias("x_avg"),
    )


_N_BUCKETS = 32


@register(
    "partition_size_histogram",
    oracle=f"""
    WITH b AS (
      SELECT {_SPLIT_HASH_SQL.replace("doc_id", "l_orderkey")} % {_N_BUCKETS}
             AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n_rows
    FROM b GROUP BY bucket
    """,
    doc="Hash-partition balance preview: rows per bucket if lineitem were "
    "shuffled 32 ways on l_orderkey, using the engine-portable "
    "multiplicative hash so the histogram is reproducible anywhere. A "
    "lopsided histogram here = executor OOM after the real shuffle; this "
    "is the check that sizes spark.sql.shuffle.partitions before the job.",
)
def q_partition_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    bucket = split_hash("l_orderkey") % _N_BUCKETS
    return (
        li.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "approx_topk_event_types",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Heavy-hitters via the approx_top_k sketch (SpaceSaving-family: "
    "per-partition bounded trackers, mergeable — the 100 TB frequent-"
    "items shape; a plain groupBy on a high-cardinality key would "
    "shuffle the full key domain, the sketch shuffles k items per "
    "partition). Exactness is cardinality-gated and therefore "
    "ORACLE-ABLE here: k=10 exceeds the event_type cardinality (5) and "
    "maxItemsTracked (10k) exceeds per-partition distincts, so the "
    "sketch degrades to exact counts — the same query on a key with "
    "more distincts than k is where the approximation (and the rows-"
    "only gate) would begin.",
)
def q_approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    e.createOrReplaceTempView("_events_topk")
    return spark.sql(
        """
        SELECT t.entry.item AS item, t.entry.count AS n
        FROM (
          SELECT explode(approx_top_k(event_type, 10)) AS entry
          FROM _events_topk
        ) t
        """
    )


@register(
    "value_distribution_shift",
    oracle="""
    WITH ctv AS (
      SELECT value AS v, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    dv AS (
      SELECT v, SUM(c) AS c_v,
             COALESCE(SUM(SUM(c)) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_lt
      FROM ctv GROUP BY v
    ),
    tcum AS (
      SELECT v, event_type, c,
             COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_t_lt
      FROM ctv
    ),
    terms AS (
      SELECT t.event_type,
             t.c,
             -- 2*U contribution of value v for type T vs everything else:
             -- c_T(v) * (2*#others below v + #others tied at v)
             t.c * (2 * (d.cum_lt - t.cum_t_lt) + (d.c_v - t.c)) AS u2_term
      FROM tcum t JOIN dv d USING (v)
    ),
    per_type AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(u2_term) AS BIGINT) AS u2
      FROM terms GROUP BY event_type
    ),
    tot AS (SELECT SUM(n) AS total FROM per_type)
    SELECT p.event_type, p.n,
           CAST(t.total - p.n AS BIGINT) AS n_rest,
           p.u2,
           round(p.u2 / (2.0 * p.n * (t.total - p.n)), 6) AS auc
    FROM per_type p CROSS JOIN tot t
    ORDER BY p.event_type
    """,
    doc="Numeric-distribution drift: the exact Mann-Whitney U statistic "
    "of each event type's `value` distribution against the rest of the "
    "corpus, surfaced as the AUC effect size (0.5 = identical location, "
    "->0/1 = stochastically smaller/larger). Ties are handled exactly: "
    "2*U = sum over values of c_T(v)*(2*below + tied) stays an INTEGER, "
    "so the statistic is bit-identical across engines — the numeric "
    "twin of source_token_drift's chi-square. Cumulative counts run "
    "over the per-distinct-value aggregate (bounded: 2-decimal values "
    "in a bounded range), the curriculum_bins shape — the fact table "
    "itself is never globally sorted.",
)
def q_value_distribution_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, "events", sf_dir)
    ctv = e.groupBy(F.col("value").alias("v"), "event_type").agg(
        F.count("*").alias("c")
    )
    w_lt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    dv = (
        ctv.groupBy("v")
        .agg(F.sum("c").alias("c_v"))
        .select(
            "v",
            "c_v",
            F.coalesce(F.sum("c_v").over(w_lt), F.lit(0)).alias("cum_lt"),
        )
    )
    w_t_lt = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tcum = ctv.select(
        "v",
        "event_type",
        "c",
        F.coalesce(F.sum("c").over(w_t_lt), F.lit(0)).alias("cum_t_lt"),
    )
    terms = tcum.join(dv, "v").select(
        "event_type",
        "c",
        (
            F.col("c")
            * (
                F.lit(2) * (F.col("cum_lt") - F.col("cum_t_lt"))
                + (F.col("c_v") - F.col("c"))
            )
        ).alias("u2_term"),
    )
    per_type = terms.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("u2_term").cast("long").alias("u2"),
    )
    tot = per_type.agg(F.sum("n").alias("total"))
    return (
        per_type.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n",
            (F.col("total") - F.col("n")).cast("long").alias("n_rest"),
            "u2",
            F.round(
                F.col("u2")
                / (F.lit(2.0) * F.col("n") * (F.col("total") - F.col("n"))),
                6,
            ).alias("auc"),
        )
        .orderBy("event_type")
    )


@register(
    "value_ks_statistic",
    oracle="""
    WITH ctv AS (
      SELECT value AS v, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type, SUM(c) AS n_t FROM ctv GROUP BY 1
    ),
    tot AS (SELECT SUM(n_t) AS n FROM totals),
    -- dense per-(type, value) cumulative counts on the shared distinct-value
    -- spine: cum_t = #values <= v in type t, cum_all = #values <= v overall
    spine AS (SELECT DISTINCT v FROM ctv),
    grid AS (
      SELECT s.v, t.event_type, t.n_t, COALESCE(c.c, 0) AS c
      FROM spine s CROSS JOIN totals t
      LEFT JOIN ctv c ON c.v = s.v AND c.event_type = t.event_type
    ),
    cums AS (
      SELECT v, event_type, n_t,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum_t
      FROM grid
    ),
    alls AS (
      SELECT v, SUM(c) AS c_v FROM ctv GROUP BY v
    ),
    all_cums AS (
      SELECT v, SUM(c_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_all
      FROM alls
    ),
    diffs AS (
      SELECT c.event_type, c.n_t, t.n,
             -- |CDF_t - CDF_rest| at v, as the exact integer numerator
             -- |cum_t*(n - n_t) - (cum_all - cum_t)*n_t|
             abs(CAST(c.cum_t AS BIGINT) * (t.n - c.n_t)
                 - (CAST(a.cum_all AS BIGINT) - CAST(c.cum_t AS BIGINT)) * c.n_t)
               AS num
      FROM cums c
      JOIN all_cums a USING (v)
      CROSS JOIN tot t
    )
    SELECT event_type,
           CAST(MIN(n_t) AS BIGINT) AS n,
           CAST(MIN(n - n_t) AS BIGINT) AS n_rest,
           CAST(MAX(num) AS BIGINT) AS ks_num,
           round(MAX(num) / (CAST(MIN(n_t) AS DOUBLE) * MIN(n - n_t)), 6) AS ks
    FROM diffs GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic of each event type's "
    "`value` distribution against the rest: KS = max_v |CDF_t(v) - "
    "CDF_rest(v)|, computed as an exact INTEGER maximum "
    "(|cum_t*(n-n_t) - cum_rest*n_t|, one common denominator "
    "n_t*(n-n_t)) so the argmax and the surfaced statistic are "
    "engine-identical. Catches SHAPE changes the Mann-Whitney AUC "
    "(location shift) misses — together they are the numeric-drift "
    "monitoring pair. Same per-distinct-value aggregate spine as "
    "value_distribution_shift; the fact table is never globally sorted.",
)
def q_value_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, "events", sf_dir)
    ctv = e.groupBy(F.col("value").alias("v"), "event_type").agg(
        F.count("*").alias("c")
    )
    totals = ctv.groupBy("event_type").agg(F.sum("c").alias("n_t"))
    tot = totals.agg(F.sum("n_t").alias("n"))
    spine = ctv.select("v").distinct()
    grid = (
        spine.crossJoin(F.broadcast(totals))
        .join(ctv, ["v", "event_type"], "left")
        .select("v", "event_type", "n_t", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_t = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = grid.select(
        "v", "event_type", "n_t", F.sum("c").over(w_t).alias("cum_t")
    )
    w_all = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    all_cums = (
        ctv.groupBy("v")
        .agg(F.sum("c").alias("c_v"))
        .select("v", F.sum("c_v").over(w_all).alias("cum_all"))
    )
    diffs = (
        cums.join(all_cums, "v")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_t",
            "n",
            F.abs(
                F.col("cum_t") * (F.col("n") - F.col("n_t"))
                - (F.col("cum_all") - F.col("cum_t")) * F.col("n_t")
            ).alias("num"),
        )
    )
    return (
        diffs.groupBy("event_type")
        .agg(
            F.min("n_t").cast("long").alias("n"),
            F.min(F.col("n") - F.col("n_t")).cast("long").alias("n_rest"),
            F.max("num").cast("long").alias("ks_num"),
            F.round(
                F.max("num")
                / (F.min("n_t").cast("double") * F.min(F.col("n") - F.col("n_t"))),
                6,
            ).alias("ks"),
        )
        .orderBy("event_type")
    )
