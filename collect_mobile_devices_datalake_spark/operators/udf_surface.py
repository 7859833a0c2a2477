"""UDF / UDAF / UDTF surface (SURVEY §2.8) + schema evolution.

The reference's extensibility point is closures shipped into the browser
(`page.evaluate`); Spark's are vectorized UDFs. This module covers each
kind once, with deterministic kernels so even the Python paths carry
value-level oracles:

- scalar pandas UDF      → already used throughout (parse, multimodal)
- grouped-agg pandas UDF → interpolated median per group (== quantile_cont)
- grouped-map applyInPandas → per-group z-scores (math.fsum → exact sums,
  so group-order independent and SQL-reproducible)
- Python UDTF            → document chunker (table function: one row in,
  N chunk rows out with offsets)
- schema evolution       → unionByName(allowMissingColumns) ≡ the
  reference's additive ALTER-TABLE semantics (app.js:365-375)
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from ..registry import register
from ..session import load_table


# --- grouped-agg pandas UDF --------------------------------------------------


@pandas_udf(DoubleType())
def _median_udaf(v: pd.Series) -> float:
    s = sorted(v.tolist())
    n = len(s)
    if n == 0:
        return float("nan")
    mid = n // 2
    return float(s[mid]) if n % 2 else (s[mid - 1] + s[mid]) / 2.0


@register(
    "udaf_median_per_status",
    oracle="""
    SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS median_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Grouped-agg pandas UDF (Arrow UDAF): interpolated median per group, "
    "value-matched against quantile_cont.",
)
def q_udaf_median_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.round(_median_udaf("o_totalprice"), 4).alias("median_price")
    )


# --- grouped-map applyInPandas ----------------------------------------------


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # math.fsum = exactly-rounded sum → identical regardless of row order,
    # which is what makes a Python grouped-map kernel oracle-checkable
    vals = pdf["o_totalprice"].tolist()
    n = len(vals)
    mean = math.fsum(vals) / n
    var = math.fsum((x - mean) ** 2 for x in vals) / (n - 1) if n > 1 else 0.0
    sd = math.sqrt(var)
    out = pdf[["o_orderkey", "o_orderstatus"]].copy()
    out["zscore"] = [round((x - mean) / sd, 6) if sd else 0.0 for x in vals]
    return out


@register(
    "grouped_map_zscore",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx
      FROM orders GROUP BY o_orderstatus
    ),
    m AS (
      SELECT o_orderstatus, n, sx / n AS mean FROM s
    ),
    v AS (
      SELECT o.o_orderstatus, m.mean, m.n,
             CAST(CAST(SUM(CAST((o.o_totalprice - m.mean) * (o.o_totalprice - m.mean) AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS ss
      FROM orders o JOIN m ON o.o_orderstatus = m.o_orderstatus
      GROUP BY o.o_orderstatus, m.mean, m.n
    )
    SELECT o.o_orderkey, o.o_orderstatus,
           round((o.o_totalprice - v.mean) / sqrt(v.ss / (v.n - 1)), 6) AS zscore
    FROM orders o JOIN v ON o.o_orderstatus = v.o_orderstatus
    """,
    doc="Grouped-map applyInPandas (Arrow batch per group): per-group z-score; "
    "fsum-exact kernel makes the Python path order-independent.",
)
def q_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").applyInPandas(
        _zscore_group, "o_orderkey bigint, o_orderstatus string, zscore double"
    )


# --- Python UDTF -------------------------------------------------------------


@udtf(returnType="chunk_idx int, start_pos int, chunk string")
class ChunkDoc:
    """Table function: split a document into fixed-width character chunks
    with offsets — the map-side expander for context-window packing."""

    def eval(self, text: str, width: int):
        if not text:
            return
        for idx, start in enumerate(range(0, len(text), width)):
            yield idx, start + 1, text[start : start + width]


@register(
    "udtf_chunk_documents",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * 100 + 1 AS INTEGER) AS start_pos,
           substring(text, i * 100 + 1, 100) AS chunk
    FROM documents, unnest(range(0, CAST(ceil(length(text) / 100.0) AS BIGINT))) AS t(i)
    WHERE length(text) > 0
    """,
    doc="Python UDTF (lateral table function): document → N overlapping-free "
    "chunks with offsets; oracle via substring arithmetic.",
)
def q_udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    d.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.start_pos, c.chunk
        FROM udtf_docs, LATERAL chunk_doc(text, 100) c
        WHERE length(text) > 0
        """
    )


# --- schema evolution --------------------------------------------------------


@register(
    "schema_evolution_union",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, NULL AS o_clerk_note
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, NULL, 'batch2'
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    doc="Additive schema evolution (ALTER TABLE ADD COLUMN, app.js:365-375): "
    "old-schema and new-schema batches union with missing columns null-filled "
    "— mergeSchema semantics without DDL.",
)
def q_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    batch1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    batch2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", F.lit("batch2").alias("o_clerk_note")
    )
    return batch1.unionByName(batch2, allowMissingColumns=True)
