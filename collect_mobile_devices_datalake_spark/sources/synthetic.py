"""Deterministic crawler-shaped tables derived from driver testdata.

The reference's work-queue tables (``<source>_source_list`` /
``<source>_saved_list``, app.js:145-154) have no counterpart in the
driver's TPC-H-ish testdata, and the DuckDB oracle can only see the
pre-registered driver views. So the frontier/checkpoint tables are
*derived* from ``orders`` with pure SQL-expressible arithmetic — the
exact same rows are constructible in Spark and in the oracle SQL, which
makes the crawler-derived operators (resume anti-join, dedup, frontier)
hash-checkable end-to-end.

Layout mirrors FIXTURES.md §B1/§B2:
- ``source_list``: one URL per order, spread over the five reference
  sources (app.js:757-778); ~5% exact duplicates (o_orderkey % 20 == 0),
  ~2% empty urls (o_orderkey % 50 == 7).
- ``saved_list``: the ~60% "already crawled" subset (o_orderkey % 10 < 6)
  plus ~1% urls NOT in source_list (o_orderkey % 100 == 7 with an
  ``_extra`` suffix) to pin the anti-join direction (app.js:479).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOURCES = ["gsmarena", "geekbench", "productz", "versus", "phonearena"]


def _url_expr() -> F.Column:
    src = (
        F.when(F.col("o_orderkey") % 5 == 0, "gsmarena")
        .when(F.col("o_orderkey") % 5 == 1, "geekbench")
        .when(F.col("o_orderkey") % 5 == 2, "productz")
        .when(F.col("o_orderkey") % 5 == 3, "versus")
        .otherwise("phonearena")
    )
    return F.concat(
        F.lit("https://example.com/devices/"),
        src,
        F.lit("/"),
        F.lower(F.col("o_orderpriority")),
        F.lit("_"),
        F.col("o_orderkey").cast("string"),
    )


def source_list(orders: DataFrame) -> DataFrame:
    """URL frontier: (id, url) with planted duplicates and empties."""
    base = orders.select(
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_orderkey") % 50 == 7, F.lit("")).otherwise(_url_expr()).alias("url"),
    )
    dups = orders.filter(F.col("o_orderkey") % 20 == 0).select(
        F.col("o_orderkey").alias("id"), _url_expr().alias("url")
    )
    return base.unionAll(dups)


def saved_list(orders: DataFrame) -> DataFrame:
    """Progress checkpoint: ~60% of the frontier plus foreign urls."""
    done = (
        orders.filter(F.col("o_orderkey") % 10 < 6)
        .filter(~(F.col("o_orderkey") % 50 == 7))
        .select(F.col("o_orderkey").alias("id"), _url_expr().alias("url"))
    )
    foreign = orders.filter(F.col("o_orderkey") % 100 == 7).select(
        F.col("o_orderkey").alias("id"),
        F.concat(_url_expr(), F.lit("_extra")).alias("url"),
    )
    return done.unionAll(foreign)


def frontier_events(orders: DataFrame) -> DataFrame:
    """Single-scan fusion of ``source_list`` ∪ ``saved_list`` → (url, saved).

    ``resume_pending`` only needs the union of both sides tagged with a
    side marker (operators/resume.py), and both sides derive from the
    same ``orders`` scan — so emit every row-class one order produces as
    a conditional array and explode: ONE parquet scan instead of four.
    At 100 TB this is the difference between reading the fact table once
    and reading it four times; the same multi-output-per-input-row shape
    serves any fan-out derivation (it is the reference's per-page
    "emit N spec rows" loop, app.js:690-710, as a column expression).

    ``saved`` carries 0 for frontier rows, 1 for checkpoint rows —
    ``max(saved) == 0`` per url ⇒ pending.
    """
    url = _url_expr()
    rows = F.array(
        F.struct(
            F.when(F.col("o_orderkey") % 50 == 7, F.lit("")).otherwise(url).alias("url"),
            F.lit(0).alias("saved"),
        ),
        F.when(
            F.col("o_orderkey") % 20 == 0,
            F.struct(url.alias("url"), F.lit(0).alias("saved")),
        ),
        F.when(
            (F.col("o_orderkey") % 10 < 6) & (F.col("o_orderkey") % 50 != 7),
            F.struct(url.alias("url"), F.lit(1).alias("saved")),
        ),
        F.when(
            F.col("o_orderkey") % 100 == 7,
            F.struct(F.concat(url, F.lit("_extra")).alias("url"), F.lit(1).alias("saved")),
        ),
    )
    return (
        orders.select(F.explode(F.array_compact(rows)).alias("e"))
        .select("e.url", "e.saved")
    )


# --- DuckDB-oracle twins (same rows, ANSI SQL over the `orders` view) ---

URL_SQL = (
    "'https://example.com/devices/' || "
    "CASE o_orderkey % 5 WHEN 0 THEN 'gsmarena' WHEN 1 THEN 'geekbench' "
    "WHEN 2 THEN 'productz' WHEN 3 THEN 'versus' ELSE 'phonearena' END "
    "|| '/' || lower(o_orderpriority) || '_' || CAST(o_orderkey AS VARCHAR)"
)

SOURCE_LIST_SQL = f"""
    SELECT o_orderkey AS id,
           CASE WHEN o_orderkey % 50 = 7 THEN '' ELSE {URL_SQL} END AS url
    FROM orders
    UNION ALL
    SELECT o_orderkey AS id, {URL_SQL} AS url
    FROM orders WHERE o_orderkey % 20 = 0
"""

SAVED_LIST_SQL = f"""
    SELECT o_orderkey AS id, {URL_SQL} AS url
    FROM orders WHERE o_orderkey % 10 < 6 AND o_orderkey % 50 <> 7
    UNION ALL
    SELECT o_orderkey AS id, {URL_SQL} || '_extra' AS url
    FROM orders WHERE o_orderkey % 100 = 7
"""
