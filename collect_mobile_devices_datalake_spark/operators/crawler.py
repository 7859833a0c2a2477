"""Crawler-derived operators (SURVEY.md §2.2-§2.3) as registered queries.

Each query re-expresses one reference operator over deterministic
synthetic inputs derived from the driver's ``orders``/``part``/``lineitem``
tables (see ``sources/synthetic.py``), so every one is hash-checkable
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import (
    brand_model_split,
    merge_last_wins,
    to_key,
    strip_trailing_underscores,
    url_dequery,
    value_unit_concat,
)
from ..registry import register
from ..session import load_table
from ..sources.synthetic import (
    SAVED_LIST_SQL,
    SOURCE_LIST_SQL,
    frontier_events,
    source_list,
)

# Shared DuckDB regex: same char class as functions/normalize.KEY_PUNCT_REGEX,
# with SQL quote doubling ('' for ').
_KEY_PUNCT_SQL = "[\\s!\"#$%&''()*+,\\-./:;<=>?@\\[\\]\\^`{|}~]"


@register(
    "resume_pending",
    oracle=f"""
    WITH src AS ({SOURCE_LIST_SQL}), sav AS ({SAVED_LIST_SQL})
    SELECT s.url FROM (SELECT DISTINCT url FROM src) s
    WHERE NOT EXISTS (SELECT 1 FROM sav WHERE sav.url = s.url)
    """,
    doc="Flagship: crawl_resume set difference (app.js:457-482). Physical "
    "form: single-scan fused frontier∪checkpoint (sources/synthetic.py::"
    "frontier_events) + one groupBy — the union+marker rewrite of "
    "operators/resume.py with the derivation's four orders scans fused "
    "into one.",
)
def q_resume_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        frontier_events(orders)
        .groupBy("url")
        .agg(F.max("saved").alias("_any_saved"))
        .filter(F.col("_any_saved") == 0)
        .select("url")
    )


@register(
    "resume_pending_per_source",
    oracle=f"""
    WITH src AS ({SOURCE_LIST_SQL}), sav AS ({SAVED_LIST_SQL}),
    pending AS (
      SELECT s.url FROM (SELECT DISTINCT url FROM src) s
      WHERE NOT EXISTS (SELECT 1 FROM sav WHERE sav.url = s.url)
    )
    SELECT regexp_extract(url, 'devices/([a-z]+)/', 1) AS source,
           COUNT(*) AS n_pending
    FROM pending GROUP BY 1
    """,
    doc="Pending work per crawl source — the progress report the reference logs "
    "(app.js:480) as a proper aggregate.",
)
def q_resume_pending_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    pending = q_resume_pending(spark, sf_dir)
    return pending.groupBy(
        F.regexp_extract("url", "devices/([a-z]+)/", 1).alias("source")
    ).agg(F.count("*").alias("n_pending"))


@register(
    "frontier_dedup",
    oracle=f"""
    WITH src AS ({SOURCE_LIST_SQL})
    SELECT regexp_extract(url, 'devices/([a-z]+)/', 1) AS source,
           COUNT(*) AS n_raw, COUNT(DISTINCT url) AS n_distinct
    FROM src GROUP BY 1
    """,
    doc="Frontier duplicate accounting (reference dedups via `new Set`, app.js:477-478).",
)
def q_frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return source_list(orders).groupBy(
        F.regexp_extract("url", "devices/([a-z]+)/", 1).alias("source")
    ).agg(
        F.count("*").alias("n_raw"),
        F.countDistinct("url").alias("n_distinct"),
    )


@register(
    "to_key_normalize",
    oracle=f"""
    SELECT p_partkey,
           regexp_replace(
             regexp_replace(lower(p_type || ' / ' || p_name || ' !'), '{_KEY_PUNCT_SQL}', '_', 'g'),
             '_+$', '', 'g') AS spec_key
    FROM part
    """,
    doc="to_key heading normalization (app.js:99) + trailing-underscore strip (app.js:100).",
)
def q_to_key_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    raw = F.concat("p_type", F.lit(" / "), "p_name", F.lit(" !"))
    return part.select(
        "p_partkey",
        strip_trailing_underscores(to_key(raw)).alias("spec_key"),
    )


@register(
    "brand_model_split",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_partkey % 10 = 0 THEN 'ios' ELSE 'android' END AS device,
           CASE WHEN p_partkey % 10 = 0 THEN 'Apple'
                ELSE split_part(p_name, ' ', 1) END AS brand,
           CASE WHEN p_partkey % 10 = 0 THEN p_name
                WHEN len(string_split(p_name, ' ')) > 1
                  THEN array_to_string(list_slice(string_split(p_name, ' '), 2, len(string_split(p_name, ' '))), ' ')
                ELSE p_name END AS model
    FROM part
    """,
    doc="brand/model head-token split with geekbench ios override (app.js:579-582, 629-635).",
)
def q_brand_model_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    device = F.when(F.col("p_partkey") % 10 == 0, "ios").otherwise("android")
    bm = brand_model_split(F.col("p_name"), device)
    return part.select(
        "p_partkey",
        device.alias("device"),
        bm["brand"].alias("brand"),
        bm["model"].alias("model"),
    )


@register(
    "merge_last_wins",
    oracle="""
    WITH e AS (
      SELECT p_partkey, 'brand' AS k, p_brand AS v, 1 AS pos FROM part
      UNION ALL SELECT p_partkey, 'brand', p_type, 2 FROM part
      UNION ALL SELECT p_partkey, 'size', CAST(p_size AS VARCHAR), 3 FROM part
      UNION ALL SELECT p_partkey, 'brand', p_name, 4 FROM part
    )
    SELECT p_partkey, k AS spec_key, v AS spec_value FROM (
      SELECT *, row_number() OVER (PARTITION BY p_partkey, k ORDER BY pos DESC) AS rn FROM e
    ) WHERE rn = 1
    """,
    doc="merge_array_object last-wins fold with trailing-underscore key cleanup "
    "(app.js:100) via map_from_entries under LAST_WIN.",
)
def q_merge_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    entries = F.array(
        F.struct(F.lit("brand___").alias("key"), F.col("p_brand").alias("value")),
        F.struct(F.lit("brand_").alias("key"), F.col("p_type").alias("value")),
        F.struct(F.lit("size__").alias("key"), F.col("p_size").cast("string").alias("value")),
        F.struct(F.lit("brand").alias("key"), F.col("p_name").alias("value")),
    )
    merged = part.select("p_partkey", merge_last_wins(entries).alias("specs"))
    return merged.select(
        "p_partkey", F.explode("specs").alias("spec_key", "spec_value")
    )


@register(
    "value_unit_concat",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           trim(l_returnflag || ',' || l_linestatus ||
                coalesce(CASE WHEN l_linenumber % 2 = 0 THEN ' kg' END, '')) AS spec_value
    FROM lineitem
    """,
    doc="values-array + optional unit suffix concat (app.js:702).",
)
def q_value_unit_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    unit = F.when(F.col("l_linenumber") % 2 == 0, " kg")
    values = F.array(F.col("l_returnflag"), F.col("l_linestatus"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        value_unit_concat(values, unit).alias("spec_value"),
    )


@register(
    "url_dequery",
    oracle=f"""
    WITH src AS ({SOURCE_LIST_SQL})
    SELECT DISTINCT regexp_replace(url || CASE WHEN id % 3 = 0 THEN '?utm=x#frag' ELSE '' END,
                                   '[?#].*$', '') AS url
    FROM src
    """,
    doc="URL de-query/de-fragment normalization (app.js:73).",
)
def q_url_dequery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    src = source_list(orders)
    noisy = F.concat(
        "url", F.when(F.col("id") % 3 == 0, "?utm=x#frag").otherwise("")
    )
    return src.select(url_dequery(noisy).alias("url")).distinct()
