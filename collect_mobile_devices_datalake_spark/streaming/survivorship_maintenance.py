"""Streaming golden-record survivorship: the per-user conflict-resolved
profile kept current as event files land.

Fourth instance of the batch-partition maintenance protocol, and the
third distinct merge lattice in the family:

- KMV (sketch_maintenance):      k-min   — idempotent G-set CRDT
- CMS / logbin (same module):    sum     — NOT idempotent (manifest
                                           compaction required)
- survivorship (this module):    argmax  — idempotent join-semilattice

The argmax-by-okey merge (okey totally orders events: priority, then
recency, then event_id — operators/advanced.py::survivorship_keyed) is
associative, commutative, AND idempotent: re-merging a batch partial
that was already absorbed cannot move any user's golden record, so
producer re-delivery under a fresh batch id is harmless for every
argmax/max column, with no anti-join and no compaction manifest — the
same delivery guarantee as the KMV streams. The one non-idempotent leg,
``n_events`` (a SUM), inherits the CMS caveat instead: checkpoint
replay repairs in place (a batch id overwrites its own partition
wholesale), wholesale re-delivery double-counts it. The test pins both
behaviors separately — the split is the point: a deployment that needs
exact counts under re-delivery keeps them in the deduplicated lake,
not in a sum lattice.

State is O(users-per-batch * batches-since-compaction); compaction is
the same fold written back as one partition (idempotent merge → the
KMV-style sweep, no manifest needed for the argmax legs; n_events
stays correct because compaction replaces exactly the partials it
read, and `compact_kmv_state`-style crash windows only ever leave
EXTRA partials whose re-absorption is a no-op for argmax and whose
double-count window for n_events is the documented sum caveat).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.advanced import survivorship_golden, survivorship_keyed
from .fsutil import delete_dir, dir_has_parquet, list_batch_dirs

SURV_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def survivorship_partial(batch: DataFrame) -> DataFrame:
    """This batch's bounded per-user partial: one golden-record row per
    user seen in the batch (argmax fields + okey so later merges can
    compare, n_events + last_ts legs)."""
    keyed = survivorship_keyed(batch)
    return keyed.groupBy("user_id").agg(
        F.max("okey").alias("okey"),
        F.max_by("k", "okey").alias("golden_k"),
        F.max_by("event_id", "okey").alias("golden_event_id"),
        F.max_by("event_type", "okey").alias("golden_type"),
        F.count("*").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )


def _maintain_surv_batch(state_dir: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        survivorship_partial(batch).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )

    return fn


def read_survivorship_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current golden records: fold of every batch partial. Reading
    IS merging — argmax-by-okey across partials per user; n_events sums."""
    parts = [
        os.path.join(state_dir, d)
        for d in list_batch_dirs(spark, state_dir)
        if dir_has_parquet(spark, os.path.join(state_dir, d))
    ]
    if not parts:
        return spark.createDataFrame(
            [],
            "user_id bigint, golden_k bigint, golden_event_id bigint, "
            "golden_type string, n_events bigint, last_ts timestamp",
        )
    return (
        spark.read.parquet(*parts)
        .groupBy("user_id")
        .agg(
            F.max_by("golden_k", "okey").alias("golden_k"),
            F.max_by("golden_event_id", "okey").alias("golden_event_id"),
            F.max_by("golden_type", "okey").alias("golden_type"),
            F.sum("n_events").alias("n_events"),
            F.max("last_ts").alias("last_ts"),
        )
    )


def compact_survivorship_state(spark: SparkSession, state_dir: str) -> None:
    """Fold all partials into one partition. The merged partition must
    keep okey (the merge key) — re-derive it as the max okey per user —
    so later batches keep comparing correctly."""
    parts = list_batch_dirs(spark, state_dir)
    if len(parts) <= 1:
        return
    merged = (
        spark.read.parquet(*[os.path.join(state_dir, d) for d in parts])
        .groupBy("user_id")
        .agg(
            F.max("okey").alias("okey"),
            F.max_by("golden_k", "okey").alias("golden_k"),
            F.max_by("golden_event_id", "okey").alias("golden_event_id"),
            F.max_by("golden_type", "okey").alias("golden_type"),
            F.sum("n_events").alias("n_events"),
            F.max("last_ts").alias("last_ts"),
        )
    )
    if "batch=compacted" in parts:
        # re-compaction overwrites a dir the fold still reads — only then
        # is a materialization barrier needed; the first compaction writes
        # a fresh dir disjoint from every input
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, "batch=compacted"))
    for d in parts:
        if d != "batch=compacted":
            delete_dir(spark, os.path.join(state_dir, d))


def start_survivorship_stream(
    spark: SparkSession,
    events_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming entity resolution: the live counterpart of
    golden_record_survivorship."""
    stream = (
        spark.readStream.schema(SURV_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return (
        stream.writeStream.foreachBatch(_maintain_surv_batch(state_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "surv_maint"))
        .trigger(availableNow=True)
        .start()
    )
