"""Windowed streaming aggregations, verified in batch parity
(SURVEY.md §2 B.8). The same expressions run under Structured Streaming
(see streaming/runtime.py and tests/test_streaming.py for the
Trigger.AvailableNow parity run); here they execute in batch so DuckDB
can oracle them exactly.

Generalizes the reference's scheduled 5-minute incremental batch (A14,
deploy.sh:36-37) to event-time windowing.

Scale notes (100 TB streams): tumbling/sliding/session windows are
hash aggregates keyed on (window, keys) — state store size is bounded
by watermarking (runtime.py); sliding windows multiply state by
length/slide (4x here) — prefer tumbling + rollup where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register


@register(
    "q_stream_tumbling",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1h window aggregate per event_type (batch parity of "
    "the streaming query; window start emitted as epoch-us).",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("ws_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle="""
SELECT ((epoch_us(ts) // 900000000) * 900000000) - k.k * 900000000 AS ws_us,
       COUNT(*) AS n
FROM events CROSS JOIN generate_series(0, 3) k(k)
GROUP BY 1
""",
    doc="Sliding window (1h length, 15m slide): each event lands in 4 "
    "overlapping windows. Oracle expands the window membership "
    "explicitly (floor-to-slide minus k slides).",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("ws_us"), "n")
    )


@register(
    "q_stream_session",
    oracle="""
WITH g AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
""",
    doc="Session window (30-min gap) per user; oracle is the classic "
    "gaps-and-islands rewrite (DuckDB has no session_window — §7.5). "
    "Spark sessions are half-open [start, last+gap), so a gap of "
    "exactly 30min starts a new session (>= in the oracle).",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
        )
    )


@register(
    "q_stream_static_join",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
    doc="Stream-static enrichment join (events x customer dim), batch "
    "parity (reference A9: dimension lookup before write).",
    scale_notes="No broadcast hint (r6 policy: customer grows with SF) "
    "— the size estimator broadcasts the dim while it fits; in "
    "streaming mode the static side is then re-read per micro-batch, "
    "so at scale snapshot the dim or accept a shuffle join.",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
