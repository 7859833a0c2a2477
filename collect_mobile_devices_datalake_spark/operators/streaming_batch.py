"""Event-time window semantics over ``events``, batch-checkable (M4).

These run the exact expressions the streaming pipeline uses
(``streaming/windows.py`` shares them) but in batch mode so the DuckDB
oracle can verify the semantics: tumbling/sliding via ``window()``,
sessionization via ``session_window()`` (oracled with a gaps-and-islands
rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from .relational import dsum

SESSION_GAP = "30 minutes"


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1h event-time windows (window() in streaming; identical grouping here).",
)
def q_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w, "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_2h_1h",
    oracle="""
    WITH assigned AS (
      SELECT date_trunc('hour', ts) AS window_start, * FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, * FROM events
    )
    SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM assigned GROUP BY 1, 2
    """,
    doc="Sliding windows (2h length, 1h slide): each event lands in 2 windows.",
)
def q_events_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    w = F.window("ts", "2 hours", "1 hour")
    return (
        e.groupBy(w)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM islands GROUP BY user_id, sess
    """,
    doc="Session windows (30 min gap) per user — session_window() in Spark, "
    "gaps-and-islands in the oracle.",
)
def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_dedup_latest",
    oracle="""
    SELECT user_id, event_type, ts AS latest_ts, value AS latest_value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Keep-latest dedup per (user, event_type) — streaming dropDuplicates analogue.",
)
def q_events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
    )
