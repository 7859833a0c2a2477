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
from .fsutil import (
    delete_dir,
    dir_has_parquet,
    list_batch_dirs,
    manifest_store_for,
)

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
        for d in list_batch_dirs(spark, sketch_dir)
        if dir_has_parquet(spark, os.path.join(sketch_dir, d))
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
    olds = list_batch_dirs(spark, sketch_dir)
    merged = read_kmv_state(spark, sketch_dir, k, key)
    if "batch=compacted" in olds:
        # re-compaction overwrites a dir the fold still reads — only then
        # is a materialization barrier needed; the first compaction writes
        # a fresh dir disjoint from every input
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(os.path.join(sketch_dir, "batch=compacted"))
    for d in olds:
        if d != "batch=compacted":
            delete_dir(spark, os.path.join(sketch_dir, d))


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


# --- Count-Min maintenance ---------------------------------------------------
#
# Same batch-partition protocol as the KMV streams, different lattice:
# the CMS fold is cell-wise SUM, which is associative/commutative but
# NOT idempotent — checkpoint REPLAY is still exactly-once (a replayed
# batch id overwrites its own partition wholesale), but wholesale
# producer RE-DELIVERY under a fresh batch id double-counts, exactly
# like dedup/graph maintenance and unlike the KMV G-set. That is the
# honest semantics of any counting sketch; deployments that need
# re-delivery immunity deduplicate upstream (ingest keep-first) or keep
# the KMV family.

from ..operators.cms import DEPTH, WIDTH, cms_sketch, token_stream  # noqa: E402


def _maintain_cms_batch(sketch_dir: str, depth: int = DEPTH, width: int = WIDTH):
    """foreachBatch body: write this batch's bounded partial sketch
    (<= depth*width cells regardless of batch size) as its partition."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        partial = cms_sketch(token_stream(batch), depth, width)
        partial.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"batch={batch_id}")
        )

    return fn


_CMS_MANIFEST = "compaction.json"


def _cms_live_parts(
    spark: SparkSession, sketch_dir: str, store: object | None = None
) -> list[str]:
    """The live partition set under the compaction manifest rule:
    numeric ``batch=N`` dirs (stream-owned) are live unless the manifest
    lists them as absorbed; ``batch=c<gen>`` dirs (compaction-owned) are
    live ONLY when the manifest names them — an uncommitted compacted
    partition is invisible, which is what makes the non-idempotent sum
    lattice crash-safe (same write-then-rename-manifest protocol as the
    ingest lake's atomic appends).

    Partition dirs are enumerated through the Hadoop FileSystem API
    (fsutil) so HDFS/S3 sketch roots work. The manifest JSON itself is
    read/committed through a ``ManifestStore`` strategy
    (fsutil.manifest_store_for): locally that is os.replace
    overwrite-atomicity — the commit point of the non-idempotent sum
    lattice — and a cluster deployment registers a store with the same
    atomic-overwrite contract for its scheme (HDFS FileContext
    rename-OVERWRITE via RenameContractManifestStore, a table row, S3
    if-none-match). Hadoop's plain FileSystem.rename does NOT overwrite,
    and delete-then-rename opens a window where readers see no manifest
    and double-count, which is why the strategy seam exists. On a remote
    root with NO registered store this read stays sound: no manifest can
    ever exist (compaction refuses up front), so every numeric batch dir
    is live and the sum is exact."""
    absorbed: set[str] = set()
    compacted: str | None = None
    mpath = os.path.join(sketch_dir, _CMS_MANIFEST)
    mstore = store if store is not None else manifest_store_for(sketch_dir)
    m = mstore.read(mpath) if mstore is not None else None
    if m is not None:
        absorbed = set(m.get("absorbed", []))
        compacted = m.get("compacted_dir")
    out = []
    for d in list_batch_dirs(spark, sketch_dir):
        if d in absorbed:
            continue
        if d.startswith("batch=c") and d != compacted:
            continue  # uncommitted (or superseded) compaction output
        if dir_has_parquet(spark, os.path.join(sketch_dir, d)):
            out.append(d)
    return out


def _read_sum_state(
    spark: SparkSession, sketch_dir: str, keys: list[str], empty_schema: str
) -> DataFrame:
    """Generic sum-lattice read: cell-wise sum of every live batch
    partial over ``keys``. Reading IS merging, same as read_kmv_state;
    shared by the CMS and logbin-histogram streams (identical protocol,
    different cell keys)."""
    parts = [os.path.join(sketch_dir, d) for d in _cms_live_parts(spark, sketch_dir)]
    if not parts:
        return spark.createDataFrame([], empty_schema)
    return spark.read.parquet(*parts).groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def read_cms_state(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """(row_j, cell, cnt): the current sketch — cell-wise sum of every
    live batch partial."""
    return _read_sum_state(
        spark, sketch_dir, ["row_j", "cell"], "row_j int, cell bigint, cnt bigint"
    )


def start_cms_maintenance_stream(
    spark: SparkSession,
    docs_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming token-frequency sketch: the live counterpart of
    cms_heavy_hitters' build stage. State is O(depth * width * batches-
    since-compaction) and `compact_cms_state` folds it back to one
    committed generation."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(_maintain_cms_batch(sketch_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "cms_maint"))
        .trigger(availableNow=True)
        .start()
    )


def compact_cms_state(
    spark: SparkSession, sketch_dir: str, store: object | None = None
) -> None:
    _compact_sum_state(spark, sketch_dir, ["row_j", "cell"], store=store)


def _compact_sum_state(
    spark: SparkSession, sketch_dir: str, keys: list[str], store: object | None = None
) -> None:
    """Fold the live partials into one committed generation.

    The sum lattice is NOT idempotent, so unlike `compact_kmv_state`
    the swap must be atomic: the merged partition is written under a
    ``batch=c<gen>`` name that readers IGNORE until the manifest —
    rewritten via the atomic-overwrite protocol — names it and marks the
    absorbed inputs dead. Crash before the commit: readers still see
    exactly the old live set (the orphan c-dir is invisible; re-running
    compaction supersedes it). Crash after: the new generation is live
    and the absorbed dirs are dead regardless of whether the GC sweep
    below finished. Never a double count in any window.

    The commit goes through a ``ManifestStore`` strategy (r12 verdict
    item 5): local roots use os.replace (byte-identical to the previous
    inline protocol); remote roots use the store registered for their
    scheme via ``fsutil.register_manifest_store`` (e.g.
    ``RenameContractManifestStore`` over an HDFS FileContext adapter);
    ``store`` overrides resolution for tests/injection."""
    if store is None:
        store = manifest_store_for(sketch_dir)
    if store is None:
        # no strategy can commit atomically on this root — refuse up
        # front; un-compacted reads stay correct (every numeric batch
        # dir remains live). A cluster deployment registers a
        # store-specific atomic-put strategy (HDFS FileContext
        # rename-OVERWRITE, a table row, S3 if-none-match) via
        # fsutil.register_manifest_store(scheme, store).
        raise NotImplementedError(
            f"sum-lattice compaction needs an atomic manifest swap; the "
            f"local-FS os.replace protocol cannot commit on {sketch_dir!r} "
            "and no manifest store is registered for its scheme "
            "(fsutil.register_manifest_store). Streaming appends and reads "
            "work unchanged on remote roots; compaction requires a "
            "store-specific atomic-put strategy."
        )
    live = _cms_live_parts(spark, sketch_dir, store=store)
    if len(live) <= 1:
        return
    # no materialization barrier: the merged fold is written to a FRESH
    # batch=c<gen+1> dir that is never in `live`, so the write job streams
    # the fold straight from the input partitions it reads
    merged = (
        spark.read.parquet(*[os.path.join(sketch_dir, d) for d in live])
        .groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"))
    )
    gens = [
        int(d[len("batch=c"):])
        for d in list_batch_dirs(spark, sketch_dir, prefix="batch=c")
        if d[len("batch=c"):].isdigit()
    ]
    new_dir = f"batch=c{max(gens, default=-1) + 1}"
    merged.write.mode("overwrite").parquet(os.path.join(sketch_dir, new_dir))

    mpath = os.path.join(sketch_dir, _CMS_MANIFEST)
    prior = store.read(mpath)
    prior_absorbed: list[str] = prior.get("absorbed", []) if prior else []
    store.commit(  # the commit point (atomic-overwrite per the strategy)
        mpath,
        {
            "compacted_dir": new_dir,
            "absorbed": sorted(set(prior_absorbed) | set(live)),
        },
    )

    for d in live:  # GC; crash-safe (manifest already excludes them)
        delete_dir(spark, os.path.join(sketch_dir, d))


# --- log-binned quantile-histogram maintenance -------------------------------
#
# Third instance of the batch-partition protocol, second of the SUM
# lattice: the logbin histogram (operators/sketches.py::logbin_hist) is
# cell-wise additive over (shift, bkey, width) exactly like the CMS is
# over (row_j, cell), so the read/compact/crash-safety machinery is the
# SAME code (_read_sum_state / _compact_sum_state) — a live p50/p90/p99
# over an order stream costs one bounded histogram partial per batch.
# Same delivery caveat as the CMS: checkpoint replay repairs in place,
# wholesale producer re-delivery under a fresh batch id double-counts.

from ..operators.sketches import logbin_hist  # noqa: E402

ORDERS_SCHEMA = "o_orderkey bigint, o_totalprice double"

_LOGBIN_KEYS = ["shift", "bkey", "width"]
_LOGBIN_EMPTY = "shift int, bkey bigint, width bigint, cnt bigint"


def _maintain_logbin_batch(sketch_dir: str):
    """foreachBatch body: this batch's bounded histogram partial
    (<= ~32 buckets per price octave regardless of batch size)."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        c = batch.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
        )
        partial = logbin_hist(c).drop("lower")  # lower = bkey*width, derived
        partial.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"batch={batch_id}")
        )

    return fn


def read_logbin_state(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """(shift, bkey, width, cnt, lower): the current histogram — fold of
    every live batch partial, lower bound rebuilt for the quantile
    read-off."""
    return _read_sum_state(spark, sketch_dir, _LOGBIN_KEYS, _LOGBIN_EMPTY).withColumn(
        "lower", F.col("bkey") * F.col("width")
    )


def compact_logbin_state(
    spark: SparkSession, sketch_dir: str, store: object | None = None
) -> None:
    _compact_sum_state(spark, sketch_dir, _LOGBIN_KEYS, store=store)


def start_logbin_maintenance_stream(
    spark: SparkSession,
    orders_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming price-quantile histogram: the live counterpart of
    logbin_quantile_sketch's build stage. State is O(buckets *
    batches-since-compaction); `compact_logbin_state` folds it back to
    one committed generation under the same manifest commit."""
    stream = (
        spark.readStream.schema(ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(orders_dir)
    )
    return (
        stream.writeStream.foreachBatch(_maintain_logbin_batch(sketch_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "logbin_maint"))
        .trigger(availableNow=True)
        .start()
    )


# --- HyperLogLog maintenance ---------------------------------------------------
#
# The seventh certified lattice family: per-register MAX. Like the KMV
# G-set (and unlike CMS sums), max-merge is IDEMPOTENT — wholesale
# producer re-delivery under a fresh batch id folds to the identical
# register file with no anti-join — and the per-batch partial is the
# hardest-bounded state in the family: <= keys * 256 rows regardless of
# batch size, each row three small ints. This is the sketch a 100 TB
# deployment actually streams for per-key cardinality (distinct counts
# where intersection estimates aren't needed; keep KMV when they are).

from ..operators.sketches import hll_registers  # noqa: E402


def _maintain_hll_batch(sketch_dir: str, key: str = "source", pairs_fn=None):
    """foreachBatch body: this batch's bounded register-file partial
    (<= keys * HLL_M rows) written as its partition."""
    pairs_fn = pairs_fn or token_hash_pairs

    def fn(batch: DataFrame, batch_id: int) -> None:
        partial = hll_registers(pairs_fn(batch), key)
        partial.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"batch={batch_id}")
        )

    return fn


def read_hll_state(
    spark: SparkSession,
    sketch_dir: str,
    key: str = "source",
    key_type: str = "string",
) -> DataFrame:
    """(key, reg, mrho): the current register file — per-register max
    over every batch partial. Reading IS merging, same as KMV."""
    parts = [
        os.path.join(sketch_dir, d)
        for d in list_batch_dirs(spark, sketch_dir)
        if dir_has_parquet(spark, os.path.join(sketch_dir, d))
    ]
    if not parts:
        return spark.createDataFrame(
            [], f"{key} {key_type}, reg bigint, mrho bigint"
        )
    return (
        spark.read.parquet(*parts)
        .groupBy(key, "reg")
        .agg(F.max("mrho").alias("mrho"))
    )


def compact_hll_state(
    spark: SparkSession, sketch_dir: str, key: str = "source"
) -> None:
    """Fold all batch partials into one partition — crash-safe by the
    idempotent-merge argument of compact_kmv_state (a crash before the
    sweep leaves extra partials whose re-absorption is a no-op)."""
    olds = list_batch_dirs(spark, sketch_dir)
    merged = read_hll_state(spark, sketch_dir, key)
    if "batch=compacted" in olds:
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(os.path.join(sketch_dir, "batch=compacted"))
    for d in olds:
        if d != "batch=compacted":
            delete_dir(spark, os.path.join(sketch_dir, d))


def start_hll_maintenance_stream(
    spark: SparkSession,
    docs_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming per-source vocabulary cardinality via HLL registers —
    the live counterpart of hll_register_sketch's register build (over
    word-token hashes, the same pairs the KMV vocabulary stream
    consumes, so the two sketches can be maintained side by side from
    one source)."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(_maintain_hll_batch(sketch_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "hll_maint"))
        .trigger(availableNow=True)
        .start()
    )


# --- Bloom-bitmap maintenance ---------------------------------------------------
#
# The eighth certified lattice family: BITWISE OR over packed 62-bit
# words. Like KMV's G-set and HLL's register max — and unlike the CMS /
# logbin sums — OR is IDEMPOTENT, so wholesale producer re-delivery
# under a fresh batch id folds to the identical bitmap with no
# anti-join, and compaction needs no manifest commit (re-absorbing a
# leftover partial is a no-op). The per-batch partial is hard-bounded
# at <= ceil(m/62) rows (m = 2^20 -> 16,913 words) regardless of batch
# size; the folded state is the EXACT bitmap the batch
# resume_bloom_prefilter builds, so the membership filter a 100 TB
# ingest keeps live (which urls are already saved?) is maintained at
# O(m) state per batch and never rebuilt from the checkpoint table.

from ..operators.selection import bloom_words  # noqa: E402
from ..sources.synthetic import saved_list  # noqa: E402

_BLOOM_EMPTY = "word bigint, bits bigint"
# saved_list's url synthesis needs the priority column too
BLOOM_ORDERS_SCHEMA = "o_orderkey bigint, o_orderpriority string"


def _maintain_bloom_batch(sketch_dir: str, urls_fn=None):
    """foreachBatch body: this batch's packed-bitmap partial. ``urls_fn``
    maps the raw orders batch to its url frame; default = the saved-list
    checkpoint rows (row-wise, so per-batch application distributes over
    the batch union)."""
    urls_fn = urls_fn or (lambda b: saved_list(b).select("url").distinct())

    def fn(batch: DataFrame, batch_id: int) -> None:
        partial = bloom_words(urls_fn(batch))
        partial.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"batch={batch_id}")
        )

    return fn


def read_bloom_state(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """(word, bits): the current bitmap — word-wise OR over every batch
    partial. Reading IS merging, same as KMV/HLL."""
    parts = [
        os.path.join(sketch_dir, d)
        for d in list_batch_dirs(spark, sketch_dir)
        if dir_has_parquet(spark, os.path.join(sketch_dir, d))
    ]
    if not parts:
        return spark.createDataFrame([], _BLOOM_EMPTY)
    return (
        spark.read.parquet(*parts)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def compact_bloom_state(spark: SparkSession, sketch_dir: str) -> None:
    """Fold all batch partials into one partition — crash-safe by the
    same idempotent-merge argument as compact_kmv_state / compact_hll_state
    (a crash before the sweep leaves extra partials whose re-absorption
    is a no-op under OR)."""
    olds = list_batch_dirs(spark, sketch_dir)
    merged = read_bloom_state(spark, sketch_dir)
    if "batch=compacted" in olds:
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(os.path.join(sketch_dir, "batch=compacted"))
    for d in olds:
        if d != "batch=compacted":
            delete_dir(spark, os.path.join(sketch_dir, d))


def start_bloom_maintenance_stream(
    spark: SparkSession,
    orders_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming saved-set membership bitmap: the live counterpart of
    resume_bloom_prefilter's build stage (operators/selection.py). The
    maintained words are broadcast-joinable by the prefilter's probe
    side exactly as the batch-built bitmap is."""
    stream = (
        spark.readStream.schema(BLOOM_ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(orders_dir)
    )
    return (
        stream.writeStream.foreachBatch(_maintain_bloom_batch(sketch_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "bloom_maint"))
        .trigger(availableNow=True)
        .start()
    )
