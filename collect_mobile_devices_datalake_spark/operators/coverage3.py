"""Third coverage wave: ordered/statistical aggregates, window frames,
date arithmetic, bitwise ops, JSON parsing.

Statistical moments (variance/stddev/correlation) are computed from
DECIMAL-exact power sums and finished in double — partition-order
independent, unlike the built-in one-pass aggregators whose double
accumulation is order-dependent across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import load_table
from .relational import dec
from .training import split_hash_sql


@register(
    "minby_maxby_firstlast",
    oracle="""
    SELECT o_orderstatus,
           min_by(o_orderkey, o_totalprice) AS cheapest_order,
           max_by(o_orderkey, o_totalprice) AS priciest_order,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders GROUP BY o_orderstatus
    """,
    doc="min_by/max_by argmin-argmax aggregates (totalprice values are unique "
    "per status at test SF, so argmin/argmax are well-defined).",
)
def q_minby_maxby_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@register(
    "collect_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ' ') AS nations,
           array_to_string(list_sort(list(DISTINCT CAST(c_nationkey AS VARCHAR))), ',') AS nations_csv
    FROM customer GROUP BY c_mktsegment
    """,
    doc="collect_set + deterministic sort; string aggregation via sorted join.",
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return c.groupBy("c_mktsegment").agg(
        # Stringified: the driver's pandas canonicalizer cannot hash list cells.
        # Sort NUMERICALLY first, then cast each element — lexicographic string
        # sort would diverge from the oracle's integer list_sort.
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("c_nationkey")), lambda x: x.cast("string")
            ),
            " ",
        ).alias("nations"),
        F.array_join(
            F.array_sort(F.collect_set(F.col("c_nationkey").cast("string"))), ","
        ).alias("nations_csv"),
    )


@register(
    "stats_moments",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4)) * CAST(o_totalprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           round((sxx - sx * sx / n) / (n - 1), 4) AS variance,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev
    FROM s
    """,
    doc="Sample variance/stddev from decimal-exact power sums — "
    "partition-order independent (one-pass double aggregators are not).",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    x = dec("o_totalprice")
    s = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return s.select(
        "o_orderstatus",
        "n",
        F.round(var, 4).alias("variance"),
        F.round(F.sqrt(var), 6).alias("stddev"),
    )


@register(
    "correlation_price_qty",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 8) AS corr_qty_price
    FROM s
    """,
    doc="Pearson correlation from decimal-exact cross sums.",
)
def q_correlation_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    )
    return s.select(F.round(corr, 8).alias("corr_qty_price"))


@register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           dense_rank() OVER w AS drk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 8) AS prk,
           round(cume_dist() OVER w, 8) AS cd,
           lead(o_orderkey, 1, -1) OVER w AS next_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Rank-family windows: dense_rank/ntile/percent_rank/cume_dist/lead-with-default.",
)
def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("prk"),
        F.round(F.cume_dist().over(w), 8).alias("cd"),
        F.lead("o_orderkey", 1, -1).over(w).alias("next_key"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_similar_price
    FROM orders
    """,
    doc="RANGE window frame (value-based, not row-based).",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 10000)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_similar_price"),
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
           CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP) AS plus_45d,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(date_diff('month', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS months_since_95,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
    doc="Date arithmetic: interval add, epoch seconds, month diff, last_day.",
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        F.date_add(d.cast("date"), 45).cast("timestamp").alias("plus_45d"),
        F.unix_timestamp(d).alias("epoch_s"),
        (F.months_between(d, F.lit("1995-01-01").cast("date")))
        .cast("int")
        .alias("months_since_95"),
        F.last_day(d.cast("date")).cast("timestamp").alias("month_end"),
    )


@register(
    "bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 1365) AS xored,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r
    FROM orders
    """,
    doc="Bitwise battery: and/or/xor/shift (the SimHash/LSH primitive set).",
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
    )


@register(
    "json_struct_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys
    FROM events
    """,
    doc="JSON battery: schema'd from_json field access, validity, key count.",
)
def q_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    parsed = F.from_json("props", "struct<k:int>")
    as_map = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        as_map.isNotNull().alias("is_valid"),
        F.size(F.map_keys(as_map)).cast("int").alias("n_keys"),
    )


@register(
    "sampling",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE {split_hash_sql("o_orderkey")} % 100 < 10
    """,
    doc="Deterministic ~10% Bernoulli sample via multiplicative hash on the "
    "key (the train_split_assign technique) instead of seeded RNG: "
    "engine-portable, reproducible under repartitioning/retries at 100 TB "
    "(df.sample's per-partition RNG is not), and a plain filter, so it "
    "composes with pushdown and costs no shuffle.",
)
def q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training import split_hash

    o = load_table(spark, "orders", sf_dir)
    return o.filter(split_hash("o_orderkey") % 100 < 10).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "unpivot_melt",
    oracle="""
    SELECT c_custkey, metric, value FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
    doc="Unpivot/melt: wide columns -> (metric, value) long form.",
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


@register(
    "map_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(string_split_regex(trim(text), '\\s+')[1:4]) AS ks
      FROM documents
    )
    SELECT doc_id, k AS map_key, CAST(length(k) * 2 AS INTEGER) AS map_value
    FROM t, unnest(ks) AS u(k)
    WHERE length(k) % 2 = 0
    """,
    doc="Map-function battery: map_from_arrays -> transform_values -> "
    "map_filter -> explode (the specs-map manipulation toolkit).",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    ks = F.array_distinct(F.slice(F.split(F.trim("text"), "\\s+"), 1, 4))
    m = F.map_from_arrays(ks, F.transform(ks, lambda k: F.length(k)))
    doubled = F.transform_values(m, lambda k, v: v * 2)
    even_keys = F.map_filter(doubled, lambda k, v: F.length(k) % 2 == 0)
    return d.select("doc_id", F.explode(even_keys).alias("map_key", "map_value")).select(
        "doc_id", "map_key", F.col("map_value").cast("int").alias("map_value")
    )


@register(
    "string_similarity_levenshtein",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_distance
    FROM part a JOIN part b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey % 10 = 0 AND levenshtein(a.p_name, b.p_name) <= 4
    """,
    doc="Edit-distance near-dup pairs, blocked on the first token (blocking "
    "keeps the pair space linear-ish — the classic fuzzy-matching shape).",
)
def q_string_similarity_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_name", F.split("p_name", " ")[0].alias("blk")
    )
    a, b = p.alias("a"), p.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            # cheap length-difference bound: |len(a)-len(b)| > 4 already
            # implies edit distance > 4, so the O(len^2) levenshtein DP
            # only runs on pairs that can survive. Result-identical.
            & (
                F.abs(F.length("a.p_name") - F.length("b.p_name")) <= 4
            ),
        )
        .filter((F.col("a.p_partkey") % 10 == 0) & (lev <= 4))
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            lev.cast("int").alias("edit_distance"),
        )
    )


@register(
    "variant_json_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
             AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
             AS max_k,
           CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_path
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured aggregation through Spark 4's VARIANT type: "
    "parse_json once per row, variant_get typed extraction ('$.k' as "
    "int), absent-path null accounting. VARIANT is the shredded-JSON "
    "scale path — the binary encoding is parsed ONCE at scan time "
    "instead of per json-path expression (get_json_object re-parses "
    "the string for every path it appears in), which at 100 TB of "
    "telemetry is the difference between one decode and k decodes per "
    "row. Oracle = DuckDB's string-path json_extract, same values.",
)
def q_variant_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    missing = F.variant_get(v, "$.missing", "string")
    return e.select("event_type", k.alias("k"), missing.alias("m")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
        F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing_path"),
    )
