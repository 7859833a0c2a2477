"""Second coverage wave: join family, subqueries, scalar batteries,
ordering, and the salted skew join.

Everything here is an oracle-checked DataFrame plan; the salted join in
particular proves the skew-mitigation rewrite is semantics-preserving
(its oracle is the PLAIN join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from .relational import dec

# --- join family -------------------------------------------------------------


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS has_customer,
           COUNT(o.o_orderkey) AS n_orders
    FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
    doc="Full outer join with null-side accounting.",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.groupBy(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey"),
        F.when(c.c_custkey.isNull(), 0).otherwise(1).alias("has_customer"),
    ).agg(F.count(o.o_orderkey).alias("n_orders"))


@register(
    "join_right_with_nulls",
    oracle="""
    SELECT o.o_orderkey, n.n_name
    FROM nation n RIGHT JOIN orders o
      ON n.n_nationkey = o.o_custkey % 50
    """,
    doc="Right outer join; unmatched right rows carry NULL dim columns.",
)
def q_join_right_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return n.join(o, n.n_nationkey == o.o_custkey % 50, "right").select(
        "o_orderkey", "n_name"
    )


@register(
    "join_self_same_day",
    oracle="""
    SELECT a.o_custkey, COUNT(*) AS n_same_day_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderdate = b.o_orderdate
     AND a.o_orderkey < b.o_orderkey
    GROUP BY a.o_custkey
    """,
    doc="Self equi-join: same customer, same day order pairs.",
)
def q_join_self_same_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderdate") == F.col("b.o_orderdate"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(F.count("*").alias("n_same_day_pairs"))
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey % 10
    GROUP BY p.p_brand
    """,
    doc="Skew-mitigating salted join: fact keys salted into 16 buckets, dim "
    "side exploded 16x — the oracle is the PLAIN join, proving the rewrite "
    "is semantics-preserving. (l_partkey % 10 makes a deliberately hot key "
    "distribution: 10 keys for the whole fact table.)",
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    SALT = 16
    li = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_partkey") % 10).alias("k"),
        (F.monotonically_increasing_id() % SALT).cast("int").alias("salt"),
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    p_exploded = p.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    j = li.join(p_exploded, (F.col("k") == F.col("p_partkey")) & (li.salt == p_exploded.salt))
    return j.groupBy("p_brand").agg(F.count("*").alias("n_lines"))


# --- subqueries --------------------------------------------------------------


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE)
      FROM orders)
    """,
    doc="Scalar subquery threshold (decimal-exact avg; broadcast 1-row join).",
)
def q_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    avg = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count("*"))
        .cast("double")
        .alias("avg_price")
    )
    return (
        o.crossJoin(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "correlated_exists_agg",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers_with_urgent
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
    doc="Correlated EXISTS decorrelated to a left_semi join + aggregate.",
)
def q_correlated_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_with_urgent"))
    )


# --- scalar batteries --------------------------------------------------------


@register(
    "math_funcs",
    oracle="""
    SELECT o_orderkey,
           round(abs(o_totalprice - 250000), 6) AS dist_mid,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
           round(sqrt(o_totalprice), 6) AS price_sqrt,
           round(ln(o_totalprice), 6) AS price_ln,
           round(log10(o_totalprice), 6) AS price_log10,
           CAST(sign(o_totalprice - 250000) AS INTEGER) AS above_mid,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
    FROM orders
    """,
    doc="Math battery: abs/ceil/floor/sqrt/ln/log10/sign/mod.",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.abs(p - 250000), 6).alias("dist_mid"),
        F.ceil(p / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor(p / 1000).cast("bigint").alias("price_k_floor"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.signum(p - 250000).cast("int").alias("above_mid"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod7"),
    )


@register(
    "null_funcs",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(nullif(o_orderpriority, '5-LOW')) AS n_not_low,
           CAST(SUM(CASE WHEN nullif(o_orderpriority, '5-LOW') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           coalesce(MIN(nullif(o_orderpriority, '1-URGENT')), 'none') AS min_non_urgent
    FROM orders GROUP BY o_orderstatus
    """,
    doc="NULL-semantics battery: nullif/coalesce/COUNT(col) vs COUNT(*).",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    nl = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    nu = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count(nl).alias("n_not_low"),
        F.sum(F.when(nl.isNull(), 1).otherwise(0)).cast("bigint").alias("n_low"),
        F.coalesce(F.min(nu), F.lit("none")).alias("min_non_urgent"),
    )


@register(
    "regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(regexp_matches(p_name, '^(red|blue|green)') AS BOOLEAN) AS is_primary_color,
           regexp_replace(p_type, '[AEIOU]', '*', 'g') AS type_devoweled,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels
    FROM part
    """,
    doc="Regex battery: extract/match/replace/extract_all-count.",
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.col("p_name").rlike("^(red|blue|green)").alias("is_primary_color"),
        F.regexp_replace("p_type", "[AEIOU]", "*").alias("type_devoweled"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0))
        .cast("int")
        .alias("n_vowels"),
    )


# --- ordering ----------------------------------------------------------------


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5
    """,
    doc="Global sort + limit + offset (deterministic tiebreak).",
)
def q_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(20)
    )


@register(
    "union_byname",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
    """,
    doc="unionByName across differently-ordered projections.",
)
def q_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_acctbal")
    b = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_acctbal").alias("c_acctbal"), F.col("c_custkey").alias("c_custkey")
    ).select("c_acctbal", "c_custkey")
    return a.unionByName(b)
