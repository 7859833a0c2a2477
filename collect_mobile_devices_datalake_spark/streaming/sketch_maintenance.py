"""Streaming KMV sketch maintenance: per-source distinct cardinality
kept current as document files land.

Each micro-batch computes its own bounded partial sketch (k values per
source, regardless of batch size) and appends it as the batch's
partition; the read path folds every partition through the k-min merge.
The state a 100 TB deployment checkpoints is therefore O(sources * k *
batches-since-compaction), and compaction is the same fold written back
as one partition.

Delivery semantics are STRONGER than dedup/graph maintenance here, and
worth naming: the k-min merge is idempotent (``kmv_merge_expr`` — a
bounded G-set CRDT lattice join), so producer re-delivery of the same
documents under a fresh batch id merges to the IDENTICAL sketch with no
anti-join against prior batches at all. Checkpoint replay still rewrites
the batch's own partition wholesale (repair, not freeze), same as
graph_maintenance.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import functions as F

from ..operators.sketches import (
    _ID_HASH_A,
    _ID_HASH_B,
    K,
    P,
    kmv_merge_expr,
    kmv_kmin,
    token_hash_pairs,
)
from .pipeline import _parquet_exists

DOCS_SCHEMA = "doc_id bigint, text string, source string"
EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint"


def _maintain_batch(sketch_dir: str, k: int = K, key: str = "source", pairs_fn=None):
    """foreachBatch body, exposed for direct testing. ``pairs_fn`` maps
    the raw batch to its (key, h) pairs frame; default = per-source
    token hashes (the vocabulary sketch)."""
    pairs_fn = pairs_fn or token_hash_pairs

    def fn(batch: DataFrame, batch_id: int) -> None:
        partial = kmv_kmin(pairs_fn(batch), k, key)
        partial.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"batch={batch_id}")
        )

    return fn


def dau_pairs(events: DataFrame) -> DataFrame:
    """(day, h): the per-day user-id hash pairs a DAU sketch consumes —
    the streaming side of kmv_daily_active_users."""
    return events.select(
        F.date_trunc("day", "ts").alias("day"),
        ((F.col("user_id") * _ID_HASH_A + _ID_HASH_B) % P).alias("h"),
    )


def read_kmv_state(
    spark: SparkSession,
    sketch_dir: str,
    k: int = K,
    key: str = "source",
    key_type: str = "string",
) -> DataFrame:
    """(key, kmin): the current sketch — fold of every batch partial.

    Reading IS merging: associativity makes the fold order (and any
    duplicate absorption) irrelevant, so a reader racing the writer sees
    some consistent prefix of batches.
    """
    parts = [
        os.path.join(sketch_dir, d)
        for d in (sorted(os.listdir(sketch_dir)) if os.path.isdir(sketch_dir) else [])
        if d.startswith("batch=") and _parquet_exists(os.path.join(sketch_dir, d))
    ]
    if not parts:
        return spark.createDataFrame([], f"{key} {key_type}, kmin array<bigint>")
    return (
        spark.read.parquet(*parts)
        .groupBy(key)
        .agg(kmv_merge_expr(k).alias("kmin"))
    )


def compact_kmv_state(
    spark: SparkSession, sketch_dir: str, k: int = K, key: str = "source"
) -> None:
    """Fold all batch partials into one partition (state maintenance).
    Crash-safe by the same argument as manifest compaction: the merged
    partition is written first; a crash before the sweep leaves extra
    partials whose re-absorption is a no-op (idempotent merge)."""
    merged = read_kmv_state(spark, sketch_dir, k, key).localCheckpoint(eager=True)
    olds = [
        d
        for d in (sorted(os.listdir(sketch_dir)) if os.path.isdir(sketch_dir) else [])
        if d.startswith("batch=")
    ]
    merged.write.mode("overwrite").parquet(os.path.join(sketch_dir, "batch=compacted"))
    import shutil

    for d in olds:
        if d != "batch=compacted":
            shutil.rmtree(os.path.join(sketch_dir, d), ignore_errors=True)


def start_sketch_maintenance_stream(
    spark: SparkSession,
    docs_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(_maintain_batch(sketch_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "sketch_maint"))
        .trigger(availableNow=True)
        .start()
    )


def start_dau_maintenance_stream(
    spark: SparkSession,
    events_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming daily-active-users: each micro-batch of event files
    folds its bounded per-day KMV partial into the state directory —
    the live counterpart of kmv_daily_active_users, with the same
    idempotent-merge delivery semantics as the vocabulary stream (and
    kmv_weekly_from_daily can fold the streamed state directly)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            _maintain_batch(sketch_dir, key="day", pairs_fn=dau_pairs)
        )
        .option("checkpointLocation", os.path.join(checkpoint_dir, "dau_maint"))
        .trigger(availableNow=True)
        .start()
    )
