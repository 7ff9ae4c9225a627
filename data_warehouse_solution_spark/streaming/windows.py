"""Time-window operators over the events table, batch-checkable
(SURVEY §2.C streaming row): tumbling, sliding, and session windows.

These use the exact same ``F.window`` / ``F.session_window``
expressions Structured Streaming executes incrementally — in batch
mode they are fully deterministic, so each gets a DuckDB oracle
(time_bucket for fixed windows, gaps-and-islands for sessions). The
true streaming execution of the same expressions lives in
``.streams`` and is differentially tested against the same oracles.

Scale notes: windowed aggregation shuffles on (window, key) — at
100 TB the watermark bounds state, and session windows require the
key-partitioned shuffle these plans already have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

SESSION_GAP = "6 hours"


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows by event type (decimal-exact sum)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "stream_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - (o * INTERVAL '30 minutes')
               AS window_start,
             value
      FROM events, unnest([0, 1]) AS t(o)
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM slid
    WHERE window_start >= TIMESTAMP '2024-01-01 00:00:00'
    GROUP BY window_start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour, sliding by 30 minutes): every event
    lands in two overlapping windows. The oracle reproduces Spark's
    window assignment by unnesting both slide offsets. Spark drops no
    leading partial windows, so the filter keeps both engines aligned
    to the data's start."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .filter(F.col("w.start") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "stream_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP}'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '{SESSION_GAP}' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (6-hour inactivity gap) per user via the
    native ``session_window`` operator. Spark defines session end as
    last-event + gap; the gaps-and-islands oracle reproduces exactly
    that. In streaming the same expression maintains per-key session
    state bounded by the watermark."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_late_data_policy",
    oracle="""
    WITH maxts AS (SELECT MAX(ts) AS m FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           COUNT(*) AS n_events
    FROM events, maxts
    WHERE ts >= m - INTERVAL '10 minutes' - INTERVAL '1 hour'
    GROUP BY 1
    """,
)
def stream_late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics as a batch-checkable query: with the
    watermark at max(ts) - 10 minutes, only windows that could still
    accept data (window_end > watermark - window) remain open; this
    reproduces the tail the streaming engine would still hold in
    state. The true late-row drop behavior is asserted in
    tests/test_streaming.py."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    max_ts = ev.agg(F.max("ts").alias("m"))
    return (
        ev.join(F.broadcast(max_ts))
        .filter(
            F.col("ts")
            >= F.col("m") - F.expr("INTERVAL 10 minutes") - F.expr("INTERVAL 1 hour")
        )
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
