"""Registered queries for the multimodal column surface.

Payload bytes are ASCII text, so byte-level features are recomputable in
SQL from ``documents.text`` — the oracle checks the Arrow-UDF plumbing
end-to-end (binary encode → batch transfer → python kernel → result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_images, frame_sample, media_features, media_table
from ..registry import register
from ..session import load_table


@register(
    "media_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           CAST(length(text) AS INTEGER) AS payload_len,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(list_transform(range(1, length(text) + 1),
                     i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), (a, b) -> a + b)
           END AS byte_sum,
           CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id % 8 + 1) * 64 AS INTEGER) END AS width,
           CASE WHEN doc_id % 2 <> 0 THEN 16000 END AS sample_rate
    FROM documents
    """,
    doc="Binary payload + typed metadata: Arrow-batched byte features over the "
    "binary column; metadata predicates prune without touching payload bytes.",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return media_features(media_table(d))


@register(
    "media_frame_sample",
    oracle="""
    WITH audio AS (
      SELECT doc_id AS media_id, CAST(n_chars * 10 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id % 2 <> 0
    )
    SELECT media_id, CAST(unnest(range(0, greatest(n_frames - 1, 0) + 1, 1000)) AS INTEGER) AS frame_idx
    FROM audio
    """,
    doc="Frame-sampling plan for audio/video assets (sequence + explode).",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return media_table(d).transform(frame_sample).select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


@register(
    "media_decode_stats",
    oracle=None,  # decode is a stubbed codec; plumbing checked rows-only + pytest
    doc="mapInPandas image decode (stubbed codec, real Arrow dataflow) → pixel stats.",
)
def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return decode_images(media_table(d))
