"""Batch event-time window operators over `events` (SURVEY.md §2.10 #73-75,
#80).

These are the *batch* twins of the streaming operators in
``streaming/`` — same ``window()`` / ``session_window()`` expressions on
a static DataFrame, which is what lets the DuckDB oracle verify them
(#80) and lets the streaming tests assert stream==batch equality.

Timestamps are truncated to seconds before bucketing on both sides
(fixture is ns-precision; Spark reads µs) — window membership then
agrees exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import dec2, ts_sec
from ..io import load_table
from ..registry import register

_TSEC = "date_trunc('second', ts)"


@register(
    "q73_tumbling_window",
    oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, {_TSEC}) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS VARCHAR) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("timeseries", "window", "bench"),
)
def q73_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1 h event-time window (#73): ``F.window`` — identical
    expression drives the streaming job (#80). Plans as a plain hash
    aggregate on the derived bucket: fully parallel at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(ts_sec("ts"), "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec2("value")).cast("decimal(38,2)").cast("string").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


ORACLE_SLIDING = f"""
SELECT time_bucket(INTERVAL '1 hour', {_TSEC}, INTERVAL (off) MINUTE) AS window_start,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS VARCHAR) AS total_value
FROM events, (VALUES (0), (15), (30), (45)) AS offsets(off)
GROUP BY 1
"""


@register(
    "q74_sliding_window",
    oracle=ORACLE_SLIDING,
    tags=("timeseries", "window"),
)
def q74_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1 h / 15 min window (#74): each event lands in 4 windows
    (Spark expands via its window generator; the oracle mirrors with an
    explicit 4-offset time_bucket cross join)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(ts_sec("ts"), "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec2("value")).cast("decimal(38,2)").cast("string").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


ORACLE_SESSION = f"""
WITH t AS (
  SELECT user_id, {_TSEC} AS tsec, value,
         CASE WHEN {_TSEC} - lag({_TSEC}) OVER (PARTITION BY user_id ORDER BY {_TSEC})
                   > INTERVAL 30 MINUTE
              OR lag({_TSEC}) OVER (PARTITION BY user_id ORDER BY {_TSEC}) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, tsec, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsec
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM t
)
SELECT user_id,
       min(tsec) AS session_start,
       max(tsec) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS VARCHAR) AS total_value
FROM s
GROUP BY user_id, session_no
"""


@register(
    "q75_session_window",
    oracle=ORACLE_SESSION,
    tags=("timeseries", "window"),
)
def q75_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session window (#75): native ``session_window`` (30 min
    inactivity gap; session end = last event + gap). The oracle rebuilds
    sessions with the classic lag/cumulative-flag SQL."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(ts_sec("ts"), "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec2("value")).cast("decimal(38,2)").cast("string").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q151_dynamic_session_window",
    oracle=f"""
WITH t AS (
  SELECT user_id, {_TSEC} AS tsec, value,
    {_TSEC} + CASE WHEN event_type = 'purchase'
                   THEN INTERVAL 60 MINUTE ELSE INTERVAL 30 MINUTE END AS ev_end
  FROM events
), m AS (
  SELECT user_id, tsec, value, ev_end,
    MAX(ev_end) OVER (PARTITION BY user_id ORDER BY tsec
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prev_max_end
  FROM t
), s AS (
  SELECT user_id, tsec, value, ev_end,
    SUM(CASE WHEN prev_max_end IS NULL OR tsec > prev_max_end
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY tsec
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM m
)
SELECT user_id,
  min(tsec) AS session_start,
  max(ev_end) AS session_end,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS VARCHAR)
    AS total_value
FROM s
GROUP BY user_id, session_no
""",
    tags=("timeseries", "window"),
)
def q151_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (#75 extended): purchases
    hold the session open 60 min, everything else 30 — the
    engagement-weighted sessionization real funnels use. Native
    ``session_window`` accepts a gap *column*; sessions merge while
    any member's (event time + its own gap) still covers the next
    event, so the session end is the max per-event deadline, not
    last-event + constant.

    The oracle rebuilds exactly that semantics: boundary ⟺ event time
    exceeds the running max of all previous per-event deadlines (a
    prefix max never masks a later boundary because a true boundary
    strictly dominates every earlier deadline), then the standard
    cumulative-flag grouping. Same single-shuffle-per-key plan as the
    fixed-gap session."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("30 minutes"))
    return (
        ev.groupBy(
            F.session_window(ts_sec("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec2("value")).cast("decimal(38,2)").cast("string").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
