"""Time-series composite operators (SURVEY.md §2.4 #35-36, §4.3).

Spark has no native batch as-of join; the composite here is the
union-tag + window carry-forward pattern: tag both streams, union,
sort per key by event time, carry the last right-side payload forward,
keep left rows. One shuffle, no range explosion, skew-safe (per-key
windows) — this is the scalable shape; a range join would be O(n·m)
per key.

The interval/overlap join uses coarse time-bucket equi-keys so Catalyst
executes a hash join instead of a BroadcastNestedLoop: sessions explode
into the (few) buckets they span, events land in exactly one bucket, so
bucket-equality is a complete and duplicate-free prefilter for the
precise range predicate.

DuckDB's native ASOF JOIN / plain range join serve as the oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.compat import dec2, ts_sec
from ..io import load_table
from ..registry import register

_SECS = "date_diff('second', TIMESTAMP '2024-01-01', ts)"


@register(
    "q35_asof_join",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id AS p_event_id, user_id, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
       date_trunc('second', c.ts) AS click_ts,
       p.p_event_id AS last_purchase_id,
       p.p_value AS last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.p_ts
""",
    tags=("timeseries", "join"),
)
def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (#35): each click matched to the user's latest
    purchase at-or-before it. Union-tag + last(ignorenulls) carry-
    forward; right side ordered before left at equal timestamps to get
    '>=' semantics. Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("p_event_id"),
        F.lit(None).cast("double").alias("p_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), "user_id", "ts", F.lit(0).alias("side"),
        F.col("event_id").alias("p_event_id"), F.col("value").alias("p_value"),
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_purchase_id", F.last("p_event_id", ignorenulls=True).over(w)
        )
        .withColumn("last_purchase_value", F.last("p_value", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            ts_sec("ts").alias("click_ts"),
            "last_purchase_id",
            "last_purchase_value",
        )
    )


@register(
    "q36_interval_join",
    oracle=f"""
WITH sessions AS (
  SELECT event_id AS session_id, user_id,
         {_SECS} AS s_start,
         {_SECS} + 7200 AS s_end
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id, user_id, {_SECS} AS c_sec, value FROM events
  WHERE event_type = 'click'
)
SELECT s.session_id, s.user_id,
  COUNT(c.event_id) AS clicks_in_window,
  CAST(SUM(CAST(c.value AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS click_value
FROM sessions s LEFT JOIN clicks c
  ON s.user_id = c.user_id AND c.c_sec >= s.s_start AND c.c_sec < s.s_end
GROUP BY s.session_id, s.user_id
""",
    tags=("timeseries", "join"),
)
def q36_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/overlap join (#36): clicks falling in the 2 h window
    after each purchase. Coarse 2 h-bucket equi-key (sessions explode
    into the ≤2 buckets they span; each click is in exactly one bucket,
    so no duplicate pairs) turns the range join into a hash join +
    residual range filter — the only join shape that survives when both
    sides are big."""
    ev = load_table(spark, sf_dir, "events")
    secs = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
    width = 7200
    sessions = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("session_id"),
            F.col("user_id").alias("s_user"),
            secs.alias("s_start"),
            (secs + width).alias("s_end"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("s_start") / width).cast("long"),
                    ((F.col("s_end") - 1) / width).cast("long"),
                )
            ),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        F.col("user_id").alias("c_user"),
        secs.alias("c_sec"),
        "value",
    ).withColumn("bucket", (F.col("c_sec") / width).cast("long"))
    joined = sessions.join(
        clicks,
        (sessions.s_user == clicks.c_user)
        & (sessions.bucket == clicks.bucket)
        & (clicks.c_sec >= sessions.s_start)
        & (clicks.c_sec < sessions.s_end),
        "left",
    )
    return joined.groupBy(
        F.col("session_id"), F.col("s_user").alias("user_id")
    ).agg(
        F.count("event_id").alias("clicks_in_window"),
        F.sum(dec2("value")).cast("decimal(38,2)").alias("click_value"),
    )
