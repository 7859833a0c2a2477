"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (crawl-resume anti-join →
per-source pending aggregate) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every registered operator from
``collect_mobile_devices_datalake_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from collect_mobile_devices_datalake_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from collect_mobile_devices_datalake_spark.registry import _ensure_loaded, REGISTRY

    _ensure_loaded()
    return REGISTRY["resume_pending_per_source"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each hash-checkable query."""
    return all_oracles()
