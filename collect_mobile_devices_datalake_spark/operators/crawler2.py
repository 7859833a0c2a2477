"""Remaining crawler-source operators (SURVEY §2 #4, #5, #8, #20, #23).

- Paginated JSON-API source (versus, app.js:253-278): page-range
  generator (``spark.range``) → per-page API response (fixture-rendered)
  → ``from_json`` → ``explode(toplist)`` → url projection.
- ``get_links`` CSS-selector projection (app.js:133-143) as an
  href-extraction + explode operator.
- Misc scalars: max-part-index parse (app.js:342), key-set algebra
  (app.js:402-417).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table

API_PAGE_SIZE = 50

_TOPLIST_SCHEMA = "struct<toplist: array<struct<name_url: string>>, page: int>"


def api_page_responses(part: DataFrame, spark: SparkSession) -> DataFrame:
    """Fixture JSON for ``POST /api/top/en/phone {page: i}`` (app.js:256-266).

    Page i lists parts [i*50, i*50+50) as ``toplist[].name_url`` slugs —
    rendered with to-JSON-safe concat, deterministic at any SF.
    """
    page_of = F.floor(F.col("p_partkey") / API_PAGE_SIZE).cast("int")
    slugs = part.select(
        page_of.alias("page"),
        F.concat(
            F.lit('{"name_url":"'),
            F.regexp_replace(F.lower("p_name"), " ", "-"),
            F.lit("-"),
            F.col("p_partkey").cast("string"),
            F.lit('"}'),
        ).alias("item"),
        F.col("p_partkey").alias("k"),
    )
    return slugs.groupBy("page").agg(
        F.concat(
            F.lit('{"page":'),
            F.col("page").cast("string"),
            F.lit(',"toplist":['),
            F.array_join(F.array_sort(F.collect_list(F.struct("k", "item"))).getField("item"), ","),
            F.lit("]}"),
        ).alias("body")
    )


@register(
    "source_api_pagination",
    oracle=f"""
    SELECT CAST(p_partkey // {API_PAGE_SIZE} AS INTEGER) AS page,
           'https://example.com/en/' || replace(lower(p_name), ' ', '-')
             || '-' || CAST(p_partkey AS VARCHAR) AS url
    FROM part
    """,
    doc="Paginated REST source (app.js:253-278): range→fetch(fixture)→"
    "from_json→explode(toplist)→url concat; oracle recomputed from part.",
)
def q_source_api_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    responses = api_page_responses(part, spark)
    parsed = responses.select(
        F.from_json("body", _TOPLIST_SCHEMA).alias("d")
    ).select(
        F.col("d.page").alias("page"), F.explode("d.toplist").alias("item")
    )
    return parsed.select(
        "page",
        F.concat(F.lit("https://example.com/en/"), F.col("item.name_url")).alias("url"),
    )


@register(
    "extract_links",
    oracle=f"""
    WITH pages AS (
      SELECT p_partkey,
             '<a href="/devices/a_' || CAST(p_partkey AS VARCHAR) || '">x</a>'
             || '<a class="nav" href="/devices/b_' || CAST(p_partkey AS VARCHAR) || '">y</a>'
             || '<span>no link</span>' AS html
      FROM part
    )
    SELECT p_partkey, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS link
    FROM pages
    """,
    doc="get_links selector projection (app.js:133-143): href extraction + explode.",
)
def q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    html = F.concat(
        F.lit('<a href="/devices/a_'),
        F.col("p_partkey").cast("string"),
        F.lit('">x</a><a class="nav" href="/devices/b_'),
        F.col("p_partkey").cast("string"),
        F.lit('">y</a><span>no link</span>'),
    )
    return part.select(
        "p_partkey",
        F.explode(F.regexp_extract_all(html, F.lit('href="([^"]*)"'), 1)).alias("link"),
    )


@register(
    "max_part_index",
    oracle="""
    WITH t AS (
      SELECT 'devicespecs_p' || CAST(o_orderkey % 23 AS VARCHAR) AS table_name FROM orders
    )
    SELECT MAX(CAST(regexp_extract(table_name, '_p(\\d+)$', 1) AS INTEGER)) AS max_part
    FROM t
    """,
    doc="Max shard-suffix parse (distribute_table, app.js:342): "
    "regexp_extract + numeric max over catalog-shaped names.",
)
def q_max_part_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    names = o.select(
        F.concat(F.lit("devicespecs_p"), (F.col("o_orderkey") % 23).cast("string")).alias(
            "table_name"
        )
    )
    return names.agg(
        F.max(F.regexp_extract("table_name", "_p(\\d+)$", 1).cast("int")).alias("max_part")
    )


@register(
    "key_set_algebra",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+')[1:6] AS record_keys,
             ['the','data','key','table','row','scan'] AS catalog_cols
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_distinct(record_keys)) AS INTEGER) AS n_record_keys,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(record_keys), k -> NOT list_contains(catalog_cols, k))), ' '), '') AS keys_to_add,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(record_keys), k -> list_contains(catalog_cols, k))), ' '), '') AS keys_existing
    FROM t
    """,
    doc="Key-set union/diff vs live catalog columns (app.js:402-417): the "
    "ALTER-TABLE decision as array algebra (array_except/intersect semantics).",
)
def q_key_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    keys = F.slice(F.split(F.trim("text"), "\\s+"), 1, 6)
    catalog = F.array(*[F.lit(x) for x in ["the", "data", "key", "table", "row", "scan"]])
    dk = F.array_distinct(keys)
    return d.select(
        "doc_id",
        F.size(dk).cast("int").alias("n_record_keys"),
        # Stringified: the driver's pandas canonicalizer cannot hash list cells.
        F.array_join(
            F.array_sort(F.filter(dk, lambda k: ~F.array_contains(catalog, k))), " "
        ).alias("keys_to_add"),
        F.array_join(
            F.array_sort(F.filter(dk, lambda k: F.array_contains(catalog, k))), " "
        ).alias("keys_existing"),
    )
