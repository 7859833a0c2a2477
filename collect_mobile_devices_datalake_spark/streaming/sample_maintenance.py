"""Streaming priority-sample maintenance: the global top-K weighted
sample (Duffield-Lund-Thorup priority sampling,
operators/selection.py) kept current as document files land.

Fifth instance of the batch-partition maintenance protocol and the
second member of the bounded-order-statistic (k-extreme) lattice
family:

- KMV (sketch_maintenance):   k SMALLEST hashes   — idempotent G-set
- CMS / logbin (same module): sum                 — NOT idempotent
- survivorship:               argmax per key      — idempotent
- priority sample (here):     K+1 LARGEST priorities — idempotent

A document's priority q = (w * M) div u is a pure function of
(doc_id, n_chars), so the merge — union of partials, dedup by doc_id,
keep the K+1 largest (priority desc, doc_id asc) — is associative,
commutative, AND idempotent: a re-delivered partial collapses in the
dedup and cannot move the sample. Producer re-delivery under a fresh
batch id is therefore harmless and no compaction manifest is needed
(the KMV guarantee, not the CMS caveat).

Correctness of the bounded per-batch partial: priorities are fixed per
document, so any document in the GLOBAL top-(K+1) ranks at least as
high inside its own batch and survives into that batch's top-(K+1)
partial. The union of partials thus contains the global top-(K+1)
exactly, and reading-is-merging reconstructs it — including tau, the
(K+1)-th priority that prices the unbiased estimator.

State is O((K+1) * batches-since-compaction) rows — bounded by protocol,
independent of corpus size; compaction folds it back to K+1 rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.selection import _PRI_K, _PRI_MOD, _PRI_U_SQL
from .fsutil import delete_dir, dir_has_parquet, list_batch_dirs

DOCS_SCHEMA = "doc_id bigint, source string, n_chars bigint"

_STATE_SCHEMA = "doc_id bigint, source string, w bigint, pri bigint"


def _scored(batch: DataFrame) -> DataFrame:
    """Scan-local (doc_id, source, w, pri) projection — the identical
    arithmetic to the batch kernel (shared _PRI_U_SQL fragment)."""
    return batch.select(
        "doc_id",
        "source",
        (F.col("n_chars") + F.lit(1)).cast("long").alias("w"),
        F.expr(f"(CAST(n_chars + 1 AS BIGINT) * {_PRI_MOD}) div ({_PRI_U_SQL})")
        .cast("long")
        .alias("pri"),
    )


def priority_partial(batch: DataFrame) -> DataFrame:
    """This batch's bounded partial: its local top-(K+1) by priority.
    TakeOrderedAndProject per batch — the partial is K+1 rows no matter
    how large the batch."""
    return _scored(batch).orderBy(F.desc("pri"), "doc_id").limit(_PRI_K + 1)


def _maintain_sample_batch(state_dir: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        priority_partial(batch).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )

    return fn


def read_sample_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current global top-(K+1): fold of every batch partial.
    Reading IS merging — union, dedup by doc_id (priorities are pure
    functions of the row, so duplicates are identical), re-rank, cut.

    Partials are enumerated through the Hadoop FileSystem API (fsutil),
    so a state_dir on HDFS/S3 behaves like the local-disk test path."""
    parts = [
        os.path.join(state_dir, d)
        for d in list_batch_dirs(spark, state_dir)
        if dir_has_parquet(spark, os.path.join(state_dir, d))
    ]
    if not parts:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return (
        spark.read.parquet(*parts)
        .dropDuplicates(["doc_id"])
        .orderBy(F.desc("pri"), "doc_id")
        .limit(_PRI_K + 1)
    )


def compact_sample_state(spark: SparkSession, state_dir: str) -> None:
    """Fold all partials into one K+1-row partition. Idempotent merge →
    the KMV-style sweep: a crash between write and cleanup only leaves
    EXTRA partials whose re-absorption is a no-op."""
    parts = list_batch_dirs(spark, state_dir)
    if len(parts) <= 1:
        return
    merged = read_sample_state(spark, state_dir)
    if "batch=compacted" in parts:
        # re-compaction overwrites a dir the fold is still reading from —
        # only then is a materialization barrier needed (first compaction
        # writes a fresh dir disjoint from every input, so the write job
        # can stream the fold directly)
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, "batch=compacted"))
    for d in parts:
        if d != "batch=compacted":
            delete_dir(spark, os.path.join(state_dir, d))


def start_sample_maintenance_stream(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming weighted sampling: the live counterpart of
    priority_sample_topk."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(_maintain_sample_batch(state_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "psamp_maint"))
        .trigger(availableNow=True)
        .start()
    )
