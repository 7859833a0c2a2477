"""Streaming continuous-aggregate maintenance: the hourly rollup kept
fresh by a watermark-finalized stream.

The batch operator ``rollup_reuse_hierarchy`` derives day/month levels
from hourly partials; this module is the operational loop that MAINTAINS
the hourly level as events arrive. Three Spark capabilities compose:

1. ``dropDuplicatesWithinWatermark("event_id")`` — producer
   re-deliveries (even with jittered timestamps) collapse before they
   can double-count; state is evicted as the watermark advances.
2. a 1-hour tumbling window aggregate in APPEND output mode — a window
   row is emitted exactly once, when the watermark passes its end and
   the count/sum can no longer change (finalization, not re-statement:
   downstream consumers never see a partial total revised).
3. chained stateful operators (dedup → windowed agg) in one query —
   supported for append-mode event-time pipelines since Spark 3.5.

The foreachBatch sink writes each micro-batch's finalized rows into its
own ``batch=<id>`` partition with mode=overwrite, so a checkpoint replay
of a partially-committed batch rewrites the partition wholesale — the
same replay-repair contract as the ingest/graph/dedup maintenance
streams. At 100 TB the emitted rows number |closed hours x types| per
trigger — the fact stream is aggregated before anything is written.

Late data beyond the watermark is dropped by the engine (the standard
contract); the test drives finalization explicitly with a sentinel event
that advances the watermark past the window under test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

WATERMARK = "1 hour"


def finalized_hourly_stream(events: DataFrame) -> DataFrame:
    """Dedup → tumbling 1h aggregate, shaped for APPEND-mode emission."""
    deduped = events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _write_finalized(rollup_dir: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        # append-mode rows are final; the per-batch partition + overwrite
        # makes checkpoint replays repair partial commits
        batch.write.mode("overwrite").parquet(
            os.path.join(rollup_dir, f"batch={batch_id}")
        )

    return fn


def start_rollup_maintenance_stream(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    schema: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return (
        finalized_hourly_stream(stream)
        .writeStream.foreachBatch(_write_finalized(rollup_dir))
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
