"""Central query registry — the contract surface for ``__spark_entry__``.

Every implemented operator registers a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle twin. The driver hash-compares the two at sf0.01, so:

- every computed column is aliased identically on both sides;
- float aggregations go through DECIMAL(18,4) so sums are exact and
  order-independent, then cast back to double;
- top-k queries carry a deterministic tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS: the driver's correctness gate samples registry entries in
    registration order, so the flagship (crawler/resume) and north-star
    LLM-pipeline modules (dedup, similarity, training, ingest, parse,
    streaming-batch) import FIRST to maximize driver-verified coverage of the
    components that matter most; the generic SQL-surface batteries follow.
    """
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        crawler,
        crawler2,
        ingest_queries,
        dedup,
        similarity,
        training,
        training2,
        diagnostics,
        text_analysis,
        text_quality,
        streaming_batch,
        graph,
        lake_ops,
        multimodal_queries,
        advanced,
        relational,
        coverage2,
        coverage3,
        tpch_more,
        tpch_wave2,
        tpch_wave3,
        udf_surface,
    )

    _LOADED = True
