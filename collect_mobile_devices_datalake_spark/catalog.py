"""Catalog introspection (reference #25/#35/#36, app.js:333-363, 390-399).

The reference asks MySQL's information_schema for table parts and column
lists to drive its dynamic DDL. Spark's equivalents are the catalog API
and the DataFrame schema — there is no ALTER-TABLE dance because the
``specs`` map column absorbs new keys, but the introspection surface is
still part of the engine's API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import TABLES
from .session import load_table


def table_columns(spark: SparkSession, name: str, sf_dir: str) -> list[str]:
    """Column list of a lake table (get_columns_table, app.js:390-399)."""
    return load_table(spark, name, sf_dir).columns


def column_count(spark: SparkSession, name: str, sf_dir: str) -> int:
    """COUNT(*) over information_schema.columns (app.js:344)."""
    return len(table_columns(spark, name, sf_dir))


def describe_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per driver table: n_columns + schema DDL string."""
    rows = []
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        rows.append((name, len(df.columns), df.schema.simpleString()))
    return spark.createDataFrame(rows, "table_name string, n_columns int, schema_ddl string")


def list_ingested_sources(spark: SparkSession, lake_dir: str) -> list[str]:
    """Which crawl sources have landed data (distribute_table's catalog scan
    analogue, app.js:337-344) — directory listing, no table scan."""
    base = os.path.join(lake_dir, "device_specs")
    if not os.path.isdir(base):
        return []
    return sorted(d for d in os.listdir(base) if not d.startswith("_"))


def spec_key_catalog(device_specs: DataFrame) -> DataFrame:
    """The dynamic schema, observed: every spec key with its frequency.

    This replaces ALTER-TABLE bookkeeping (app.js:365-375): the logical
    column set of the wide table is a one-shuffle aggregation over map
    keys, not DDL state.
    """
    from pyspark.sql import functions as F

    return (
        device_specs.select(F.explode(F.map_keys("specs")).alias("spec_key"))
        .groupBy("spec_key")
        .agg(F.count("*").alias("n_records"))
    )
