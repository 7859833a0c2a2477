"""Streaming ANN-index maintenance: new vectors → neighbor-graph edges.

The batch operator ``nsw_graph_delta`` shown as a continuous pipeline:
vector files landing in a directory are the arrivals; each micro-batch
hashes the new vectors with the index's deterministic hyperplanes,
probes the PERSISTED bucket index for candidates, computes exact-cosine
top-M edges, and appends them to the graph table. The checkpoint makes
restarts incremental and the src-level anti-join makes re-delivered
batches a no-op (effectively-once, same shape as the ingest stream's
``src_url`` MERGE guard in pipeline.py). This is the operational loop a
deployed graph index runs at 100 TB: index builds are one-time,
arrivals are per-batch edge computations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .pipeline import _parquet_exists

VECTORS_SCHEMA = "vec_id bigint, embedding array<float>"


def start_graph_maintenance_stream(
    spark: SparkSession,
    vectors_dir: str,
    graph_dir: str,
    sf_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    from ..operators.similarity import nsw_edges_for_batch

    def fn(batch: DataFrame, batch_id: int) -> None:
        edges = nsw_edges_for_batch(batch.sparkSession, sf_dir, batch)
        if _parquet_exists(graph_dir):
            existing = batch.sparkSession.read.parquet(graph_dir).select("src").distinct()
            edges = edges.join(existing, "src", "left_anti")
        edges.write.mode("append").parquet(graph_dir)

    stream = (
        spark.readStream.schema(VECTORS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(vectors_dir)
    )
    return (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "graph_maint"))
        .trigger(availableNow=True)
        .start()
    )
