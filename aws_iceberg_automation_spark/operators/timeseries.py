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

from ..functions.compat import corr_from_moments, dec2, epoch_secs, month_day, ts_sec
from .analytics import _sql_twin
from ..io import load_table
from ..functions.ckpt import checkpoint_df
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
    "q35b_ohlc_resample",
    oracle="""
SELECT user_id,
  time_bucket(INTERVAL 6 HOUR, date_trunc('second', ts)) AS bucket_start,
  arg_min(value, ts) AS open,
  max(value) AS high,
  min(value) AS low,
  arg_max(value, ts) AS close,
  COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
""",
    tags=("timeseries",),
)
def q35b_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: 6-hour bars per user — open/close via
    min_by/max_by on event time, high/low plain extremes. One hash
    aggregate; the canonical time-series resample at any volume.
    (Timestamps within a bar are unique at second grain in the fixture,
    so first/last are well-defined for the oracle.)"""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window(ts_sec("ts"), "6 hours")
    return (
        ev.groupBy(F.col("user_id"), bucket.alias("w"))
        .agg(
            F.min_by("value", ts_sec("ts")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ts_sec("ts")).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
            "open", "high", "low", "close", "n_events",
        )
    )


@register(
    "q35c_gap_fill_forward",
    oracle="""
WITH grid AS (
  SELECT u.user_id, g.t AS grid_ts
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                            TIMESTAMP '2024-01-30',
                                            INTERVAL 1 DAY)) AS t) g
), obs AS (
  SELECT user_id, date_trunc('second', ts) AS ots, value FROM events
)
SELECT g.user_id, g.grid_ts,
       o.value AS last_value,
       o.ots AS last_event_ts
FROM grid g ASOF LEFT JOIN obs o
  ON g.user_id = o.user_id AND g.grid_ts >= o.ots
""",
    tags=("timeseries",),
)
def q35c_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with forward-fill: a daily grid per user, each grid
    point carrying the latest observation at-or-before it — the
    composite of grid generation (sequence+explode) and the as-of
    carry-forward (#35). DuckDB's native ASOF LEFT JOIN is the oracle.
    At scale the grid is generated, never materialized from driver."""
    ev = load_table(spark, sf_dir, "events")
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                    F.lit("2024-01-30 00:00:00").cast("timestamp_ntz"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("grid_ts"),
        )
        .select(
            "user_id", "grid_ts", F.lit(1).alias("side"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("timestamp_ntz").alias("ots"),
        )
    )
    obs = ev.select(
        "user_id",
        ts_sec("ts").alias("grid_ts"),
        F.lit(0).alias("side"),
        "value",
        ts_sec("ts").alias("ots"),
    )
    tagged = grid.unionByName(obs)
    w = (
        Window.partitionBy("user_id")
        .orderBy("grid_ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_value", F.last("value", ignorenulls=True).over(w))
        .withColumn("last_event_ts", F.last("ots", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("user_id", "grid_ts", "last_value", "last_event_ts")
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
  CAST(CAST(SUM(CAST(c.value AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS VARCHAR) AS click_value
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
        F.sum(dec2("value")).cast("decimal(38,2)").cast("string").alias("click_value"),
    )


def _ewma_alpha() -> float:
    return 0.3


def ewma(df: DataFrame, key: str, order: list[str], value: str, alpha: float) -> DataFrame:
    """Per-key exponentially weighted moving average in event order:
    ``y_i = α·x_i + (1−α)·y_{i−1}`` with ``y_1 = x_1`` (the
    adjust=False convention).

    This recursion is not expressible with Spark's built-in window
    functions (each output depends on the *previous output*, not a
    frame of inputs), so it runs as a grouped-map ``applyInPandas``
    kernel — the sanctioned Arrow-batched Python boundary for
    order-dependent per-key state. The closed-form SQL rewrite
    (cumulative sums scaled by ``(1−α)^(−i)``) was rejected: the scale
    factor overflows/denormalizes beyond ~700 rows per key at α=0.3 —
    a correctness cliff, not a perf trade.

    Scale: one shuffle on ``key``; each key's series arrives as one
    Arrow batch, so the memory bound is the longest single series (the
    same bound any stateful per-key operator carries), and keys scale
    out across executors. The kernel's explicit fold keeps the FP
    operation sequence identical to the oracle's recursive CTE —
    bitwise-equal doubles, surfaced UNROUNDED (do not re-add rounding:
    DuckDB's scaled double-round mis-rounds boundary values that the
    bitwise-equal raw doubles sail through — see q144)."""
    import pandas as pd

    cols = [key, *order, value]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        out, prev = [], None
        for x in pdf[value]:
            prev = x if prev is None else alpha * x + (1.0 - alpha) * prev
            out.append(prev)
        pdf = pdf.copy()
        pdf["ewma"] = out
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*cols).schema.fields
    ) + ", ewma double"
    return df.select(*cols).groupBy(key).applyInPandas(fold, schema)


@register(
    "q144_ewma_user_value",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, event_id, ts, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events
), r AS (
  SELECT user_id, event_id, ts, value, rk, value AS ewma
  FROM base WHERE rk = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.ts, b.value, b.rk,
         -- (1 - 0.3), NOT the literal 0.7: the engine kernel computes
         -- beta = 1.0 - alpha at runtime, and double(1-0.3) is
         -- 0.7000000000000001 — one ulp above the 0.7 literal. The
         -- constant-folded subtraction here reproduces the kernel's
         -- exact multiplier, keeping the whole fold bitwise equal
         -- (caught by the sf0.1 cross-scale gate as a 6th-decimal
         -- rounding flip on long series).
         0.3 * b.value + (1 - 0.3) * r.ewma
  FROM base b JOIN r ON b.user_id = r.user_id AND b.rk = r.rk + 1
)
SELECT user_id, event_id, date_trunc('second', ts) AS ts, value,
  -- UNROUNDED: the engine kernel and this recursive CTE execute the
  -- identical sequential FP op chain (verified bitwise-equal over the
  -- full sf0.1 table), so rounding adds risk instead of removing it —
  -- DuckDB's round() on doubles goes through a scaled multiply and
  -- mis-rounds values like 37.1648884999…96 (×1e6 lands exactly on
  -- .5) that Spark rounds correctly. Round only order-DEPENDENT
  -- aggregates; a deterministic fold is not one.
  ewma
FROM r
""",
    tags=("timeseries", "udf"),
)
def q144_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of each user's event values (the time-series
    smoother behind anomaly baselines and rate trackers). Oracle:
    DuckDB WITH RECURSIVE reproduces the exact recursion (max fixture
    series length ≈ 90, far under any recursion limit)."""
    ev = load_table(spark, sf_dir, "events")
    out = ewma(ev, "user_id", ["ts", "event_id"], "value", _ewma_alpha())
    # ewma surfaces unrounded — see the oracle comment (bitwise-equal
    # deterministic folds; DuckDB's scaled double-round mis-rounds
    # boundary values Spark rounds correctly)
    return out.select(
        "user_id",
        "event_id",
        ts_sec("ts").alias("ts"),
        "value",
        "ewma",
    )


@register(
    "q147_halflife_baseline_anomaly",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, event_id, ts, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events
), r AS (
  SELECT user_id, event_id, ts, value, rk, value AS baseline
  FROM base WHERE rk = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.ts, b.value, b.rk,
    b.value + (r.baseline - b.value)
      * exp(-0.0001925408834888737 *
            (epoch(date_trunc('second', b.ts))
             - epoch(date_trunc('second', r.ts))))
  FROM base b JOIN r ON b.user_id = r.user_id AND b.rk = r.rk + 1
)
SELECT user_id, event_id, date_trunc('second', ts) AS ts, value,
  round(baseline, 6) AS baseline,
  (abs(value - baseline) > 2.0 * greatest(abs(baseline), 1.0)) AS is_anomaly
FROM r
""",
    tags=("timeseries", "udf"),
)
def q147_halflife_baseline_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-interval baseline + anomaly flag: the per-tick EWMA
    (q144) weights every step equally, which is wrong when events
    arrive unevenly — here the smoothing decays by *elapsed time*,
    ``y_i = x_i + (y_{i−1} − x_i)·exp(−Δt·ln2/halflife)`` (half-life
    1 h), so a gap of hours forgets the old baseline while a burst
    barely moves it. Rows deviating >2× from their own baseline flag
    as anomalies — the standard rate-monitor shape.

    Same execution story as q144 (grouped-map Arrow kernel, one shuffle
    on the key, memory bound = longest series); the kernel's explicit
    fold mirrors the oracle's recursive CTE op-for-op. ``exp`` is libm
    on both engines and its per-step ulp noise is ~1e-16 relative —
    round(6) on the baseline and a *relative* anomaly threshold keep
    the comparison decision-stable."""
    import math

    import pandas as pd

    hl_seconds = 3600.0
    lam = math.log(2.0) / hl_seconds  # 0.0001925408834888737, inlined in oracle

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out, prev, prev_ts = [], None, None
        for ts, x in zip(pdf["ts"], pdf["value"]):
            t = ts.floor("s").timestamp()
            if prev is None:
                prev = x
            else:
                prev = x + (prev - x) * math.exp(-lam * (t - prev_ts))
            prev_ts = t
            out.append(prev)
        pdf = pdf.copy()
        pdf["baseline"] = out
        return pdf

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    out = ev.groupBy("user_id").applyInPandas(
        fold,
        "user_id bigint, event_id bigint, ts timestamp_ntz, value double, "
        "baseline double",
    )
    return out.select(
        "user_id",
        "event_id",
        ts_sec("ts").alias("ts"),
        "value",
        F.round("baseline", 6).alias("baseline"),
        (
            F.abs(F.col("value") - F.col("baseline"))
            > 2.0 * F.greatest(F.abs("baseline"), F.lit(1.0))
        ).alias("is_anomaly"),
    )


@register(
    "q35d_asof_forward",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id AS p_event_id, user_id, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
       date_trunc('second', c.ts) AS click_ts,
       p.p_event_id AS next_purchase_id,
       p.p_value AS next_purchase_value,
       CAST(date_diff('second', date_trunc('second', c.ts),
                      date_trunc('second', p.p_ts)) AS BIGINT)
         AS secs_to_purchase
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.p_ts
""",
    tags=("timeseries", "join"),
)
def q35d_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (#35): each click matched to the user's NEXT
    purchase at-or-after it, plus the seconds until it — the
    time-to-conversion label generator (and the mirror of q35's
    backward carry). Same union-tag single-shuffle shape, with the
    carry running BACKWARD: first(ignorenulls) over
    [currentRow, unboundedFollowing] per user. Purchases sort after
    clicks at equal timestamps so '<=' semantics hold. Oracle: DuckDB
    ASOF LEFT JOIN with the forward inequality."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("p_event_id"),
        F.lit(None).cast("double").alias("p_value"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), "user_id", "ts", F.lit(1).alias("side"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
        F.col("ts").alias("p_ts"),
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn(
            "next_purchase_id", F.first("p_event_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "next_purchase_value", F.first("p_value", ignorenulls=True).over(w)
        )
        .withColumn("next_p_ts", F.first("p_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 0)
        .select(
            "event_id",
            "user_id",
            ts_sec("ts").alias("click_ts"),
            "next_purchase_id",
            "next_purchase_value",
            (
                F.date_trunc("second", F.col("next_p_ts")).cast("long")
                - F.date_trunc("second", F.col("ts")).cast("long")
            ).alias("secs_to_purchase"),
        )
    )


@register(
    "q205_rolling_corr",
    oracle="""
WITH daily AS (
  SELECT n.n_name, CAST(l.l_shipdate AS DATE) AS day,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS rev,
    CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS qty
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
    AND l.l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY 1, 2
), idx AS (
  SELECT n_name, day, rev, qty,
         date_diff('day', DATE '1995-01-01', day) AS dayidx
  FROM daily
), m AS (
  -- RANGE frame on the integer day index: a true trailing 30
  -- CALENDAR days — gap days simply contribute no observations
  SELECT n_name, day, dayidx,
    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
    SUM(rev) OVER w AS sx, SUM(qty) OVER w AS sy,
    SUM(rev * qty) OVER w AS sxy,
    SUM(rev * rev) OVER w AS sxx, SUM(qty * qty) OVER w AS syy,
    MIN(dayidx) OVER (PARTITION BY n_name) AS first_idx
  FROM idx
  WINDOW w AS (PARTITION BY n_name ORDER BY dayidx
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT n_name, day,
  round(CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
             THEN NULL
             ELSE (n * sxy - sx * sy)
                  / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        END, 4) AS corr_30d
FROM m WHERE dayidx >= first_idx + 29
""",
    tags=("timeseries", "window"),
)
def q205_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day rolling Pearson correlation between a nation's daily
    revenue and daily shipped quantity — the co-movement diagnostic
    behind price-mix monitoring (correlation breaking down means
    revenue is drifting away from volume: discounting, mix shift, or
    data error). The frame is a true trailing 30 CALENDAR days — a
    RANGE frame over the integer day index, so inactive days simply
    contribute no observations (a ROWS frame would silently widen to
    "last 30 ACTIVE days", mixing months-old data on sparse series).
    Emitted once a nation is ≥29 days past its first active day.

    Scale shape: broadcast dim joins + two-phase hash agg collapse the
    fact table to the (nation × day) grain FIRST; the sliding window
    runs over that tiny per-nation daily series (a year = 365 rows per
    partition), partitioned by nation. The correlation is spelled as
    the explicit five-moment formula — IDENTICAL double expressions in
    both engines (built-in corr() differs in degenerate handling:
    Spark's throws DIVIDE_BY_ZERO on a zero-variance window under
    ANSI, the sf0.1 fixture has one, and ANSI is Spark 4's default) —
    with a variance<=0 guard mapping degenerate windows to NULL on
    both sides; daily inputs are exact-decimal sums surfaced as
    doubles and the result rounds to 4."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(dec2("l_extendedprice")).cast("double").alias("rev"),
            F.sum(dec2("l_quantity")).cast("double").alias("qty"),
        )
    )
    idx = daily.withColumn(
        "dayidx", F.datediff("day", F.lit("1995-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("dayidx")
        .rangeBetween(-29, Window.currentRow)
    )
    w_all = Window.partitionBy("n_name")
    m = idx.select(
        "n_name",
        "day",
        "dayidx",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("rev").over(w).alias("sx"),
        F.sum("qty").over(w).alias("sy"),
        F.sum(F.col("rev") * F.col("qty")).over(w).alias("sxy"),
        F.sum(F.col("rev") * F.col("rev")).over(w).alias("sxx"),
        F.sum(F.col("qty") * F.col("qty")).over(w).alias("syy"),
        F.min("dayidx").over(w_all).alias("first_idx"),
    ).filter(F.col("dayidx") >= F.col("first_idx") + 29)
    return m.select(
        "n_name",
        "day",
        F.round(
            corr_from_moments(
                F.col("n"), F.col("sx"), F.col("sy"),
                F.col("sxy"), F.col("sxx"), F.col("syy"),
            ),
            4,
        ).alias("corr_30d"),
    )


@register(
    "q227_revenue_acf",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS d,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS rev
  FROM lineitem GROUP BY 1
), pairs AS (
  SELECT g.lag, a.rev AS x, b.rev AS y
  FROM daily a CROSS JOIN generate_series(1, 14) g(lag)
  JOIN daily b ON b.d = a.d - g.lag
), m AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
    CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
    SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pairs GROUP BY 1
)
SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
  round(CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
             THEN NULL
             ELSE (n * sxy - sx * sy)
                  / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        END, 4) AS acf
FROM m ORDER BY lag
""",
    tags=("timeseries", "stats"),
)
def q227_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily corpus revenue at lags 1-14
    days — the seasonality detector that tells a forecaster whether
    yesterday (lag 1) or last week (lag 7) predicts today, and the
    pre-flight check before fitting any AR model on the series.
    Pairs align on the CALENDAR day index (q205's lesson): a gap day
    yields no pair rather than silently pairing non-adjacent days.

    Scale shape: the fact table collapses to the daily grain first
    (two-phase exact-decimal agg — |days| rows, calendar-bounded and
    SF-independent), then a 14-way lag explode + self-equi-join on the
    day index runs entirely on that dimension-sized series (broadcast:
    the daily frame grows with the date range, never with corpus
    volume). Correlation is the explicit five-moment formula with the
    degenerate-variance guard (ANSI-safe, q205 pattern), rounded to 4
    — the repo's guard band for cross-engine sum drift."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("d")
    ).agg(F.sum(dec2("l_extendedprice")).cast("double").alias("rev"))
    a = daily.alias("a").select(
        F.col("a.d").alias("d"),
        F.col("a.rev").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(14))).alias("lag"),
    )
    b = daily.alias("b").select(
        F.col("b.d").alias("bd"), F.col("b.rev").alias("y")
    )
    pairs = a.join(
        F.broadcast(b), F.col("bd") == F.col("d") - F.col("lag")
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    m = pairs.groupBy(F.col("lag").cast("int").alias("lag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        n.alias("n"),
        sx.alias("sx"),
        sy.alias("sy"),
        sxy.alias("sxy"),
        sxx.alias("sxx"),
        syy.alias("syy"),
    )
    return (
        m.select(
            "lag",
            "n_pairs",
            F.round(
                corr_from_moments(
                    F.col("n"), F.col("sx"), F.col("sy"),
                    F.col("sxy"), F.col("sxx"), F.col("syy"),
                ),
                4,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "q235_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT n.n_name AS nation, CAST(o.o_orderdate AS DATE) AS day,
    CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(8,2))) * 100 AS BIGINT)
      AS DOUBLE) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), stats AS (
  SELECT nation, CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(rev) AS sx, SUM(rev * rev) AS sxx
  FROM daily GROUP BY 1
), dev AS (
  SELECT d.nation, d.day, s.n,
    round(abs(SUM(d.rev - s.sx / s.n)
              OVER (PARTITION BY d.nation ORDER BY d.day))
          / sqrt((s.sxx - s.sx * s.sx / s.n) / s.n), 4) AS dev
  FROM daily d JOIN stats s USING (nation)
  WHERE (s.sxx - s.sx * s.sx / s.n) / s.n > 0
), mx AS (
  SELECT nation, MAX(dev) AS max_dev, CAST(MAX(n) AS BIGINT) AS n_days
  FROM dev GROUP BY 1
)
SELECT m.nation, m.n_days, MIN(d.day) AS change_day, m.max_dev
FROM mx m JOIN dev d ON d.nation = m.nation AND d.dev = m.max_dev
GROUP BY 1, 2, 4
""",
    tags=("timeseries", "stats"),
)
def q235_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per nation: the day where the
    cumulative sum of mean-centered daily revenue strays farthest from
    zero (scaled by the series' own σ) — the classic single-change
    locator (a level shift makes |S_t| peak exactly at the break).
    q227's ACF says "the series has structure"; this says WHERE it
    broke.

    Scale shape: the fact table collapses to the (nation, day) grain in
    one two-phase exact-decimal agg (calendar×|nations|-bounded); the
    per-nation moments are a 25-row frame broadcast back; the running
    sum is a window PARTITIONED BY nation ordered by day (never
    global). The argmax day is recovered by equality-joining on the
    per-nation max of the ROUNDED deviation and taking MIN(day) — a
    deterministic tie-break in both engines (round-4 note: the rounded
    compare absorbs the engines' segment-tree vs streaming window-sum
    ulp drift). Zero-variance nations fall out on the var > 0 guard."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            (F.sum(dec2("o_totalprice")) * 100)
            .cast("bigint")
            .cast("double")
            .alias("rev")
        )
    )
    stats = daily.groupBy("nation").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rev").alias("sx"),
        F.sum(F.col("rev") * F.col("rev")).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    w = (
        Window.partitionBy("nation")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = (
        daily.join(F.broadcast(stats), "nation")
        .filter(var > 0)
        .select(
            "nation",
            "day",
            "n",
            F.round(
                F.abs(F.sum(F.col("rev") - mean).over(w)) / F.sqrt(var), 4
            ).alias("dev"),
        )
    )
    mx = dev.groupBy("nation").agg(
        F.max("dev").alias("max_dev"),
        F.max("n").cast("bigint").alias("n_days"),
    )
    m, d = mx.alias("m"), dev.select("nation", "day", "dev").alias("d")
    return (
        m.join(
            d,
            (F.col("m.nation") == F.col("d.nation"))
            & (F.col("d.dev") == F.col("m.max_dev")),
        )
        .groupBy(
            F.col("m.nation").alias("nation"),
            F.col("m.n_days").alias("n_days"),
            F.col("m.max_dev").alias("max_dev"),
        )
        .agg(F.min(F.col("d.day")).alias("change_day"))
        .select("nation", "n_days", "change_day", "max_dev")
    )


# The (nation, day, exact-cent) revenue grid shared by the seasonal
# decomposition (q255) and the forecast backtest (q258): the backtest
# scores the SAME series the decomposition explains, so the grid has
# one definition on each side (the ab_treat rationale — a cent/
# attribution change can never reach one consumer and miss the other).
_SQL_NATION_DAILY_REV = """SELECT n.n_name AS nation, CAST(o_orderdate AS DATE) AS day,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(8,2))) * 100 AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2"""


def nation_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :data:`_SQL_NATION_DAILY_REV` — exact BIGINT cents
    at the calendar-bounded (nation, day) grain, one two-phase agg."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg((F.sum(dec2("o_totalprice")) * 100).cast("bigint").alias("rev"))
    )


@register(
    "q255_seasonal_decomposition",
    oracle=f"""
WITH daily AS (
  {_SQL_NATION_DAILY_REV}
), idx AS (
  SELECT nation, rev,
    date_diff('day', DATE '1970-01-01', day) AS d,
    CAST(date_part('dow', day) AS INT) AS dow
  FROM daily
), tr AS (
  SELECT nation, dow, rev,
    CAST(SUM(rev) OVER wsp AS BIGINT) AS wsum,
    CAST(COUNT(*) OVER wsp AS BIGINT) AS wcnt
  FROM idx
  WINDOW wsp AS (PARTITION BY nation ORDER BY d
                 RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT nation, dow,
    CAST(rev AS DOUBLE) AS rev,
    CAST(wsum AS DOUBLE) / wcnt AS trend,
    CAST(rev * wcnt - wsum AS DOUBLE) / wcnt AS detr
  FROM tr
), eff AS (
  SELECT nation, dow,
    CAST(CAST(SUM(CAST(round(detr, 2) AS DECIMAL(18,2))) * 100 AS BIGINT)
      AS DOUBLE) / (100.0 * COUNT(*)) AS effect
  FROM det GROUP BY 1, 2
), parts AS (
  SELECT t.nation, t.rev, t.trend, e.effect,
    t.detr - e.effect AS resid
  FROM det t JOIN eff e ON e.nation = t.nation AND e.dow = t.dow
), nv AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_days,
    SUM(rev * rev) / COUNT(*) - (SUM(rev) / COUNT(*)) * (SUM(rev) / COUNT(*))
      AS v_rev,
    SUM(trend * trend) / COUNT(*)
      - (SUM(trend) / COUNT(*)) * (SUM(trend) / COUNT(*)) AS v_trend,
    SUM(effect * effect) / COUNT(*)
      - (SUM(effect) / COUNT(*)) * (SUM(effect) / COUNT(*)) AS v_week,
    SUM(resid * resid) / COUNT(*)
      - (SUM(resid) / COUNT(*)) * (SUM(resid) / COUNT(*)) AS v_resid
  FROM parts GROUP BY nation
)
SELECT e.nation, e.dow,
  e.effect / 100 AS weekday_effect,
  nv.n_days,
  CASE WHEN nv.v_rev <= 0 THEN NULL
       ELSE round(nv.v_trend / nv.v_rev, 4) END AS trend_share,
  CASE WHEN nv.v_rev <= 0 THEN NULL
       ELSE round(nv.v_week / nv.v_rev, 4) END AS weekly_share,
  CASE WHEN nv.v_rev <= 0 THEN NULL
       ELSE round(nv.v_resid / nv.v_rev, 4) END AS residual_share
FROM eff e JOIN nv ON nv.nation = e.nation
""",
    tags=("timeseries", "analytics", "stats"),
)
def q255_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of per-nation daily revenue:
    rev = trend (7-day centered moving average) + weekly effect (mean
    detrended revenue per weekday) + residual, surfaced as the 7
    weekday effects per nation with the variance share each component
    explains. The structural sequel to q227 (ACF says the series has
    structure), q211 (global weekday shares) and q235 (where it
    broke): HOW MUCH of a nation's revenue variation is trend vs
    weekly rhythm vs noise. Residual share near 1 = don't bother
    forecasting with seasonality; weekly share near 1 = a pure
    day-of-week business.

    Scale shape: the fact table collapses once to the calendar-bounded
    (nation, day) grid; the centered MA is a RANGE window over the
    integer day index PARTITIONED BY nation (the q235 pattern — RANGE,
    not ROWS, so calendar gaps don't silently widen the window);
    weekday effects are a 7×|nations| agg joined back broadcast;
    variance shares come from explicit moments per nation.

    Determinism (code-review r4 + full-suite catch): the MA windows
    aggregate exact INTEGER cents (SUM/COUNT, never a float window
    avg), so trend = wsum/wcnt and detr = (rev·wcnt − wsum)/wcnt are
    single divisions of exact integers — bitwise identical in both
    engines. The weekday effect then sums per-row round(6) values in
    DECIMAL(24,6) (order-independent) before ONE double division —
    the original float-window AVG drifted and q255's small-denominator
    rationals (k/7 cents) land EXACTLY on half-cent boundaries, where
    round(2) flipped between engines at sf0.001 — and the engines'
    round() tie directions differ even on a bitwise-identical double,
    so the effect surfaces UNROUNDED (the SCALE.md sequential-fold
    rule: rounding a bitwise-equal value only adds risk). Variance
    shares round(4) over sums of bitwise-identical per-row doubles.
    Degenerate zero-variance nations surface NULL shares, never an
    ANSI error."""
    daily = nation_daily_revenue(spark, sf_dir)
    idx = daily.select(
        "nation",
        "rev",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias("d"),
        (F.dayofweek("day") - 1).cast("int").alias("dow"),
    )
    w = (
        Window.partitionBy("nation")
        .orderBy("d")
        .rangeBetween(-3, 3)
    )
    tr = idx.select(
        "nation",
        "dow",
        "rev",
        F.sum("rev").over(w).alias("wsum"),
        F.count(F.lit(1)).over(w).alias("wcnt"),
    )
    det = tr.select(
        "nation",
        "dow",
        F.col("rev").cast("double").alias("rev"),
        (F.col("wsum").cast("double") / F.col("wcnt")).alias("trend"),
        (
            (F.col("rev") * F.col("wcnt") - F.col("wsum")).cast("double")
            / F.col("wcnt")
        ).alias("detr"),
    )
    # Per-row round(2) is tie-free here (detr = m/wcnt with wcnt in
    # 1..7 can never equal x.005 exactly — all six denominators yield
    # parity/divisibility contradictions), and keeps the decimal sum's
    # unscaled value orders of magnitude under 2^53 at ANY corpus size,
    # so the ROUTE to double is an exact BIGINT (cents*100) — the
    # direct big-DECIMAL->DOUBLE cast is not correctly rounded in
    # DuckDB once unscaled passes 2^53 (code-review r4 finding; the
    # compat.py decimal rule applied to a mean).
    eff = det.groupBy("nation", "dow").agg(
        (
            (F.sum(F.round("detr", 2).cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)))
        ).alias("effect")
    )
    parts = det.join(F.broadcast(eff), ["nation", "dow"]).select(
        "nation",
        "rev",
        "trend",
        "effect",
        (F.col("detr") - F.col("effect")).alias("resid"),
    )

    def _var(col: str) -> F.Column:
        m = F.sum(F.col(col)) / F.count(F.lit(1))
        return F.sum(F.col(col) * F.col(col)) / F.count(F.lit(1)) - m * m

    nv = parts.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _var("rev").alias("v_rev"),
        _var("trend").alias("v_trend"),
        _var("effect").alias("v_week"),
        _var("resid").alias("v_resid"),
    )
    share = lambda c: F.when(  # noqa: E731
        F.col("v_rev") <= 0, F.lit(None).cast("double")
    ).otherwise(F.round(F.col(c) / F.col("v_rev"), 4))
    return eff.join(F.broadcast(nv), "nation").select(
        "nation",
        "dow",
        (F.col("effect") / 100).alias("weekday_effect"),
        "n_days",
        share("v_trend").alias("trend_share"),
        share("v_week").alias("weekly_share"),
        share("v_resid").alias("residual_share"),
    )


@register(
    "q258_forecast_backtest",
    oracle=f"""
WITH grid AS (
  {_SQL_NATION_DAILY_REV}
), daily AS (
  SELECT nation, date_diff('day', DATE '1970-01-01', day) AS d, rev
  FROM grid
), ev AS (
  SELECT t.nation,
    abs(t.rev - n1.rev) AS ae_naive,
    abs(t.rev - n7.rev) AS ae_seasonal,
    CAST(round(CAST(abs(t.rev - n1.rev) AS DOUBLE) / t.rev, 12)
      AS DECIMAL(20,12)) AS ape_naive,
    CAST(round(CAST(abs(t.rev - n7.rev) AS DOUBLE) / t.rev, 12)
      AS DECIMAL(20,12)) AS ape_seasonal
  FROM daily t
  JOIN daily n1 ON n1.nation = t.nation AND n1.d = t.d - 1
  JOIN daily n7 ON n7.nation = t.nation AND n7.d = t.d - 7
)
SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_eval_days,
  round(CAST(SUM(ae_naive) AS DOUBLE) / COUNT(*) / 100, 2) AS mae_naive,
  round(CAST(SUM(ae_seasonal) AS DOUBLE) / COUNT(*) / 100, 2)
    AS mae_seasonal,
  round(CAST(SUM(ape_naive) AS DOUBLE) / COUNT(*), 6) AS mape_naive,
  round(CAST(SUM(ape_seasonal) AS DOUBLE) / COUNT(*), 6) AS mape_seasonal,
  SUM(ape_seasonal) < SUM(ape_naive) AS seasonal_wins
FROM ev GROUP BY nation
""",
    tags=("timeseries", "analytics", "stats"),
)
def q258_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: naive (yesterday's revenue) vs seasonal-naive
    (same weekday last week) one-day-ahead forecasts of per-nation
    daily revenue, scored by MAE and MAPE over every day where both
    forecasts exist — the baseline table every forecasting effort must
    beat (Hyndman's first rule: if you can't beat seasonal-naive,
    you don't have a forecast). seasonal_wins per nation operationalizes
    q255's weekly-share read: nations with strong weekly rhythm should
    flip it true.

    Plan shape: the fact table collapses once to the calendar-bounded
    (nation, day-index) grid; both "models" are grid self-equi-joins on
    (nation, d−1) / (nation, d−7) — exact calendar lags, no window, no
    gap-blind ROWS frame (the playbook's 30-day-rolling lesson).
    Errors are exact BIGINT cent differences; MAE divides the exact sum
    once. MAPE terms round(12) PER ROW (an exact-chain double —
    identical both engines) and sum in DECIMAL(20,12), so the grouped
    sums are order-independent and the seasonal_wins comparison is on
    exact equal values — a rounded-AVG comparison could flip between
    engines at a 1e-6 boundary under partial-aggregation drift
    (code-review r4 finding). rev > 0 by construction (an observed day
    has ≥1 order of positive totalprice)."""
    # NB the reduced grid sits behind a groupBy agg: its shuffle output
    # is stage-skipped across the three consumers at runtime, and the
    # playbook's A/B measured pinning such frames ~2s SLOWER — so no
    # localCheckpoint here (pin only frames behind big joins).
    daily = nation_daily_revenue(spark, sf_dir).select(
        "nation",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias("d"),
        "rev",
    )
    t = daily.alias("t")
    n1 = daily.select(
        F.col("nation").alias("nation"),
        (F.col("d") + 1).alias("d"),
        F.col("rev").alias("rev_n1"),
    )
    n7 = daily.select(
        F.col("nation").alias("nation"),
        (F.col("d") + 7).alias("d"),
        F.col("rev").alias("rev_n7"),
    )
    ev = (
        t.join(n1, ["nation", "d"])
        .join(n7, ["nation", "d"])
        .select(
            "nation",
            F.abs(F.col("rev") - F.col("rev_n1")).alias("ae_naive"),
            F.abs(F.col("rev") - F.col("rev_n7")).alias("ae_seasonal"),
            F.round(
                F.abs(F.col("rev") - F.col("rev_n1")).cast("double")
                / F.col("rev"),
                12,
            )
            .cast("decimal(20,12)")
            .alias("ape_naive"),
            F.round(
                F.abs(F.col("rev") - F.col("rev_n7")).cast("double")
                / F.col("rev"),
                12,
            )
            .cast("decimal(20,12)")
            .alias("ape_seasonal"),
        )
    )
    n_days = F.count(F.lit(1))
    return ev.groupBy("nation").agg(
        n_days.cast("bigint").alias("n_eval_days"),
        F.round(F.sum("ae_naive").cast("double") / n_days / 100, 2).alias(
            "mae_naive"
        ),
        F.round(F.sum("ae_seasonal").cast("double") / n_days / 100, 2).alias(
            "mae_seasonal"
        ),
        F.round(F.sum("ape_naive").cast("double") / n_days, 6).alias(
            "mape_naive"
        ),
        F.round(F.sum("ape_seasonal").cast("double") / n_days, 6).alias(
            "mape_seasonal"
        ),
        (F.sum("ape_seasonal") < F.sum("ape_naive")).alias("seasonal_wins"),
    )


@register(
    "q282_gapfill_interpolation",
    oracle="""
WITH s AS (
  SELECT l_returnflag AS series,
    date_diff('day', DATE '1992-01-01', l_shipdate) AS d,
    CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
), bounds AS (
  SELECT series, MIN(d) AS lo, MAX(d) AS hi FROM s GROUP BY series
), grid AS (
  SELECT b.series, unnest(range(b.lo, b.hi + 1)) AS d FROM bounds b
), j AS (
  SELECT g.series, g.d, s.qty FROM grid g
  LEFT JOIN s ON s.series = g.series AND s.d = g.d
), ctx AS (
  SELECT series, d, qty,
    last_value(qty IGNORE NULLS) OVER (PARTITION BY series ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN qty IS NOT NULL THEN d END IGNORE NULLS)
      OVER (PARTITION BY series ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
    first_value(qty IGNORE NULLS) OVER (PARTITION BY series ORDER BY d
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN qty IS NOT NULL THEN d END IGNORE NULLS)
      OVER (PARTITION BY series ORDER BY d
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM j
)
SELECT series, CAST(d AS BIGINT) AS day_idx,
  (qty IS NULL) AS filled,
  CAST(CASE
    WHEN qty IS NOT NULL THEN qty * 1000
    ELSE pv * 1000 + ((nv - pv) * 1000 * (d - pd)) // (nd - pd)
  END AS BIGINT) AS qty_x1000
FROM ctx
""",
    tags=("timeseries",),
)
def q282_gapfill_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + linear interpolation of a sparse daily series (the
    resample-to-grid primitive every forecasting/feature pipeline
    needs, which Spark lacks natively): per return flag, aggregate daily
    quantities, explode the full [min_day, max_day] grid per series, and
    fill each missing day by linear interpolation between its nearest
    present neighbors (carry-forward windows with ignorenulls — one
    partitioned window pass each direction, no self-join).

    All-integer fixed point (qty × 1000, truncating div — Spark ``div``
    ≡ DuckDB ``//`` on either sign): interpolated values are
    bit-identical across engines and partitionings, never a float
    rounding-boundary case. Interior grids only — per-series min/max
    bounds mean pv/nd are always defined on filled rows.

    Scale shape: one hash agg to day grain, one tiny per-series bounds
    agg broadcast into a sequence() explode (grid rows ≈ days × series,
    trivially bounded), and two partitioned windows keyed on the series — the
    corpus never sorts globally. Skewed series keys are impossible by
    construction (the day grain caps per-key rows at the date span)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = (
        li.select(
            F.col("l_returnflag").alias("series"),
            F.datediff("l_shipdate", F.lit("1992-01-01").cast("date")).alias("d"),
            "l_quantity",
        )
        .groupBy("series", "d")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    bounds = s.groupBy("series").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = bounds.select(
        "series", F.explode(F.sequence("lo", "hi")).alias("d")
    )
    j = grid.join(s, ["series", "d"], "left")
    wp = (
        Window.partitionBy("series")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("series")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    present_d = F.when(F.col("qty").isNotNull(), F.col("d"))
    ctx = j.select(
        "series",
        "d",
        "qty",
        F.last("qty", ignorenulls=True).over(wp).alias("pv"),
        F.last(present_d, ignorenulls=True).over(wp).alias("pd"),
        F.first("qty", ignorenulls=True).over(wn).alias("nv"),
        F.first(present_d, ignorenulls=True).over(wn).alias("nd"),
    )
    interp = F.expr("pv * 1000 + ((nv - pv) * 1000 * (d - pd)) div (nd - pd)")
    return ctx.select(
        "series",
        F.col("d").cast("bigint").alias("day_idx"),
        F.col("qty").isNull().alias("filled"),
        F.when(F.col("qty").isNotNull(), F.col("qty") * 1000)
        .otherwise(interp)
        .cast("bigint")
        .alias("qty_x1000"),
    )


# Business-day arithmetic: g(e) counts completed business days from the
# epoch (shift +3 aligns week starts to Monday; epoch day 0 was a
# Thursday), so bdays(d1→d2) = g(e2) - g(e1) — pure int math, identical
# on both engines, no calendar/timezone functions anywhere.
_Q310_SQL = """
WITH li AS (
  SELECT o.o_orderdate, l.l_shipdate,
    date_diff('day', DATE '1970-01-01',
              CAST(o.o_orderdate AS DATE)) + 3 AS e1,
    date_diff('day', DATE '1970-01-01',
              CAST(l.l_shipdate AS DATE)) + 3 AS e2
  FROM {lineitem} l JOIN {orders} o ON o.o_orderkey = l.l_orderkey
),
b AS (
  SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS VARCHAR)
      AS order_month,
    (CAST(floor(e2 / 7) AS BIGINT) * 5 + least(e2 % 7, 4))
    - (CAST(floor(e1 / 7) AS BIGINT) * 5 + least(e1 % 7, 4)) AS bdays
  FROM li
)
SELECT order_month,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  round(CAST(SUM(bdays) AS DOUBLE) / COUNT(*), 3) AS avg_bdays_to_ship,
  CAST(MAX(bdays) AS BIGINT) AS max_bdays
FROM b GROUP BY order_month
"""


@register(
    "q310_business_days_to_ship",
    oracle=_Q310_SQL.format(lineitem="lineitem", orders="orders"),
    tags=("timeseries", "scalar"),
)
def q310_business_days_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency in BUSINESS days per order month — the
    SLA metric operations actually contracts on (calendar-day deltas
    overstate weekend-spanning shipments by up to 2/7). Weekend-aware
    date math as a closed form over epoch-day integers: g(e) =
    5·⌊e'/7⌋ + min(e' mod 7, 4) with e' Monday-aligned counts business
    days since the epoch, so the delta is g(ship) − g(order) — no
    per-day explode, no calendar UDF, no timezone anywhere (dates are
    taken as civil dates on both engines).

    Scale shape: an equi-join on the order key (co-partitioned at
    scale), map-side int arithmetic, one month-grain agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("order_d")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.date_format("order_d", "yyyy-MM").alias("order_month"),
        (F.datediff("order_d", F.lit("1970-01-01").cast("date")) + 3).alias(
            "e1"
        ),
        (F.datediff("ship_d", F.lit("1970-01-01").cast("date")) + 3).alias(
            "e2"
        ),
    )
    g1 = (F.col("e1") - (F.col("e1") % 7)) / 7 * 5 + F.least(
        F.col("e1") % 7, F.lit(4)
    )
    g2 = (F.col("e2") - (F.col("e2") % 7)) / 7 * 5 + F.least(
        F.col("e2") % 7, F.lit(4)
    )
    b = j.select(
        "order_month", (g2 - g1).cast("long").alias("bdays")
    )
    return b.groupBy("order_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.sum("bdays").cast("double") / F.count(F.lit(1)), 3).alias(
            "avg_bdays_to_ship"
        ),
        F.max("bdays").cast("bigint").alias("max_bdays"),
    )


@register(
    "q314_twap_by_brand",
    oracle="""
WITH obs AS (
  SELECT p.p_brand,
    date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)) AS e,
    CAST(l.l_extendedprice AS DECIMAL(10,2)) AS px,
    l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
o AS (
  SELECT p_brand, e, px,
    lead(e) OVER (PARTITION BY p_brand
                  ORDER BY e, l_orderkey, l_linenumber) AS e_next
  FROM obs
),
w AS (
  SELECT p_brand, px,
    CAST(COALESCE(e_next, e + 1) - e AS BIGINT) AS wt
  FROM o
)
SELECT p_brand,
  CAST(COUNT(*) AS BIGINT) AS n_obs,
  CAST(SUM(wt) AS BIGINT) AS span_days,
  round(CAST(CAST(SUM(px * wt) AS DECIMAL(38,2)) AS DOUBLE)
        / NULLIF(SUM(wt), 0), 4) AS twap
FROM w GROUP BY p_brand
""",
    tags=("timeseries", "agg"),
)
def q314_twap_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average price per brand (TWAP — the finance/
    pricing aggregate where each observation's weight is the time it
    remained the "current" price, not 1): each shipment's price is
    weighted by the integer days until the brand's next observation
    (same-day earlier observations weigh 0 under the total order —
    last-of-day carries the day, the standard step-function reading;
    the final observation carries 1 day). Exact decimal×int products,
    exact sums, one double division.

    Scale shape: equi-join to part (broadcast-able dim), one per-brand
    window (lead) on the observation order, one brand agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("e"),
        F.col("l_extendedprice").cast("decimal(10,2)").alias("px"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("p_brand").orderBy(
        "e", "l_orderkey", "l_linenumber"
    )
    o = obs.withColumn("e_next", F.lead("e").over(w)).select(
        "p_brand",
        "px",
        (F.coalesce("e_next", F.col("e") + 1) - F.col("e"))
        .cast("long")
        .alias("wt"),
    )
    return o.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum("wt").cast("bigint").alias("span_days"),
        F.round(
            F.sum(F.col("px") * F.col("wt"))
            .cast("decimal(38,2)")
            .cast("double")
            / F.nullif(F.sum("wt"), F.lit(0)),
            4,
        ).alias("twap"),
    )


@register(
    "q316_asof_join_tolerance",
    oracle="""
WITH p AS (
  SELECT event_id AS purchase_id, user_id,
    epoch(date_trunc('second', ts)) AS pt
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch(date_trunc('second', ts)) AS ct,
    event_id AS click_id
  FROM events WHERE event_type = 'click'
),
m AS (
  SELECT purchase_id, user_id, pt, click_id, ct FROM (
    SELECT p.purchase_id, p.user_id, p.pt, c.click_id, c.ct,
      row_number() OVER (PARTITION BY p.purchase_id
                         ORDER BY c.ct DESC, c.click_id DESC) AS rk
    FROM p JOIN c ON c.user_id = p.user_id
      AND c.ct <= p.pt AND c.ct >= p.pt - 1800)
  WHERE rk = 1
)
SELECT p.purchase_id, p.user_id,
  m.click_id AS attributed_click,
  CAST(p.pt - m.ct AS BIGINT) AS gap_sec,
  (m.click_id IS NOT NULL) AS attributed
FROM p LEFT JOIN m ON m.purchase_id = p.purchase_id
""",
    tags=("timeseries", "join"),
)
def q316_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a TOLERANCE bound (pandas merge_asof's
    ``tolerance=``, the missing variant of the q35 family): each
    purchase attributes to the user's most recent click, but ONLY if
    it happened within 30 minutes — older clicks are no attribution,
    not a stale one (the correctness difference between "last touch"
    and "last RELEVANT touch"). Ties on click time break to the larger
    click_id, totally ordered.

    Spark plan is the scalable MERGE-shaped asof: the tolerance turns
    the unbounded backward scan into a bounded RANGE window (max_by
    over [t-1800, t] per user) — no per-row range join against the
    full click history, state bounded by the tolerance at any scale.
    The oracle computes the identical contract with a bounded
    range join + max_by."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "event_id",
        "event_type",
        epoch_secs("ts").alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-1800, 0)
    )
    click_t = F.when(F.col("event_type") == "click", F.col("t"))
    click_key = F.when(
        F.col("event_type") == "click",
        F.struct(F.col("t").alias("ct"), F.col("event_id").alias("cid")),
    )
    enriched = tagged.withColumn(
        "best_click", F.max(click_key).over(w)
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("best_click.cid").alias("attributed_click"),
            (F.col("t") - F.col("best_click.ct"))
            .cast("bigint")
            .alias("gap_sec"),
            F.col("best_click").isNotNull().alias("attributed"),
        )
    )


@register(
    "q348_max_drawdown",
    oracle="""
WITH t AS (
  SELECT user_id, epoch(date_trunc('second', ts)) AS es, event_id,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), cum AS (
  SELECT user_id, es, event_id,
    SUM(cents) OVER (PARTITION BY user_id ORDER BY es, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS bal
  FROM t
), dd AS (
  SELECT user_id, es, event_id, bal,
    MAX(bal) OVER (PARTITION BY user_id ORDER BY es, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - bal AS draw
  FROM cum
), agg AS (
  SELECT user_id, CAST(MAX(draw) AS BIGINT) AS max_dd_cents,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(MAX(bal) AS BIGINT) AS peak_cents
  FROM dd GROUP BY user_id
)
SELECT user_id, max_dd_cents, peak_cents, n_events, rk FROM (
  SELECT *, row_number() OVER (
    ORDER BY max_dd_cents DESC, user_id) AS rk
  FROM agg)
WHERE rk <= 25
""",
    tags=("timeseries",),
)
def q348_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — THE risk statistic of any
    cumulative series (portfolio equity, credits balance, points):
    dd(t) = running_max(balance) − balance(t), reported at its
    per-user max with the peak it fell from. Cumulative sum and
    running max are one pass of per-user PARTITIONED windows over
    exact integer cents — order-tied on (second, event_id) so replays
    are bit-stable; top-25 via the windowless pre-bounded rank.

    Scale shape: two stacked windows on the same (user) partitioning
    — one sort, no extra exchange (Catalyst folds same-spec windows);
    the rank runs on the |users| aggregate frame."""
    from ..functions.ranking import topn_ranked

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        epoch_secs("ts").alias("es"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = e.withColumn("bal", F.sum("cents").over(w))
    dd = cum.withColumn("draw", F.max("bal").over(w) - F.col("bal"))
    agg = dd.groupBy("user_id").agg(
        F.max("draw").cast("bigint").alias("max_dd_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("bal").cast("bigint").alias("peak_cents"),
    )
    return topn_ranked(
        agg, [F.col("max_dd_cents").desc(), F.col("user_id")], 25
    ).select("user_id", "max_dd_cents", "peak_cents", "n_events", "rk")


@register(
    "q349_ltob_downsample",
    oracle="""
WITH t AS (
  SELECT event_type, CAST((month(ts) - 1) * 31 + day(ts) AS BIGINT) AS d,
    epoch(date_trunc('second', ts)) AS x, event_id,
    CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), b AS (
  SELECT event_type, d, CAST(SUM(x) AS BIGINT) AS sx,
    CAST(SUM(y) AS BIGINT) AS sy, COUNT(*) AS n
  FROM t GROUP BY event_type, d
), ctx AS (
  SELECT c.event_type, c.d,
    CAST(p.sx AS DOUBLE) / p.n AS px, CAST(p.sy AS DOUBLE) / p.n AS py,
    CAST(nx.sx AS DOUBLE) / nx.n AS qx, CAST(nx.sy AS DOUBLE) / nx.n AS qy
  FROM b c
  JOIN b p ON p.event_type = c.event_type AND p.d = c.d - 1
  JOIN b nx ON nx.event_type = c.event_type AND nx.d = c.d + 1
), scored AS (
  SELECT t.event_type, t.d, t.event_id, t.y,
    round(ABS((t.x - ctx.px) * (ctx.qy - ctx.py)
              - (ctx.qx - ctx.px) * (t.y - ctx.py)), 4) AS area2
  FROM t JOIN ctx ON ctx.event_type = t.event_type AND ctx.d = t.d
)
SELECT event_type, d AS day, event_id AS kept_event_id,
  y AS kept_cents, area2 FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type, d
    ORDER BY area2 DESC, event_id) AS rk
  FROM scored)
WHERE rk = 1
""",
    tags=("timeseries",),
)
def q349_ltob_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-One-Bucket downsampling — the standard
    visualization decimator (keep the point per bucket that subtends
    the largest triangle with its neighbor buckets' centroids, so
    spikes survive where naive bucket-averages flatten them): one
    point per (event_type, day), neighbors = adjacent days' mean
    points. LTOB is chosen over LTTB because its buckets are
    INDEPENDENT — per-bucket argmax parallelizes embarrassingly,
    while LTTB's selected-previous-point chain is inherently
    sequential (the documented tradeoff).

    Numerics: bucket centroids are exact-int ratios (identical
    doubles), the 2×area is pure arithmetic on those, rounded to 4
    BEFORE the argmax with an event_id tiebreak — rounding ties
    cannot flip the kept point.

    Scale shape: one hash agg to buckets, self-join on day±1
    (equi-join on the bucket frame), then a per-bucket PARTITIONED
    rank — never a global window; edge buckets drop out by the inner
    join, by design."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        month_day("ts").alias("d"),
        epoch_secs("ts").alias("x"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    b = e.groupBy("event_type", "d").agg(
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.count(F.lit(1)).alias("n"),
    )
    p = b.select(
        "event_type",
        (F.col("d") + 1).alias("d"),
        (F.col("sx").cast("double") / F.col("n")).alias("px"),
        (F.col("sy").cast("double") / F.col("n")).alias("py"),
    )
    nx = b.select(
        "event_type",
        (F.col("d") - 1).alias("d"),
        (F.col("sx").cast("double") / F.col("n")).alias("qx"),
        (F.col("sy").cast("double") / F.col("n")).alias("qy"),
    )
    ctx = p.join(nx, ["event_type", "d"])
    scored = e.join(ctx, ["event_type", "d"]).withColumn(
        "area2",
        F.round(
            F.abs(
                (F.col("x") - F.col("px")) * (F.col("qy") - F.col("py"))
                - (F.col("qx") - F.col("px")) * (F.col("y") - F.col("py"))
            ),
            4,
        ),
    )
    w = Window.partitionBy("event_type", "d").orderBy(
        F.col("area2").desc(), F.col("event_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").alias("day"),
            F.col("event_id").alias("kept_event_id"),
            F.col("y").alias("kept_cents"),
            "area2",
        )
    )


@register(
    "q355_rolling_ols_slope",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST((month(ts) - 1) * 31 + day(ts) AS BIGINT) AS d,
    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, (month(ts) - 1) * 31 + day(ts)
), w AS (
  SELECT event_type, d, y,
    COUNT(*) OVER win AS n,
    CAST(SUM(d) OVER win AS BIGINT) AS sx,
    CAST(SUM(y) OVER win AS BIGINT) AS sy,
    CAST(SUM(d * y) OVER win AS BIGINT) AS sxy,
    CAST(SUM(d * d) OVER win AS BIGINT) AS sxx
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, d AS day, y AS day_cents,
  round(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 4)
    AS slope_7d
FROM w WHERE n = 7
""",
    tags=("timeseries",),
)
def q355_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day regression slope of daily revenue — the trend
    detector that, unlike a moving-average delta, weights every point
    in the window (q334's exact-moment OLS composed with q205's
    rolling-frame discipline): the four sufficient sums ride as
    windowed integer aggregates over the per-(type, day) frame, slope
    is one double division, rounded 4. Windows are PARTITIONED by
    event_type over the ≤|days| daily frame — post-aggregate, so the
    window input is bounded by the calendar, not the event count.

    Scale shape: one hash agg events → (type, day), then constant-
    width windows on the tiny frame; n = 7 gates out warm-up rows."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        month_day("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = e.groupBy("event_type", "d").agg(
        F.sum("cents").cast("bigint").alias("y")
    )
    win = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    w = (
        daily.withColumn("n", F.count(F.lit(1)).over(win))
        .withColumn("sx", F.sum("d").over(win).cast("bigint"))
        .withColumn("sy", F.sum("y").over(win).cast("bigint"))
        .withColumn("sxy", F.sum(F.col("d") * F.col("y")).over(win).cast("bigint"))
        .withColumn("sxx", F.sum(F.col("d") * F.col("d")).over(win).cast("bigint"))
        .filter(F.col("n") == 7)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return w.select(
        "event_type",
        F.col("d").alias("day"),
        F.col("y").alias("day_cents"),
        F.round(num.cast("double") / den, 4).alias("slope_7d"),
    )


_Q386_SQL = """
WITH daily AS (
  SELECT event_type, (month(ts) - 1) * 31 + day(ts) AS d,
    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM {events} GROUP BY 1, 2
), nb AS (
  SELECT event_type, d, y,
    LAG(y)  OVER (PARTITION BY event_type ORDER BY d) AS yp,
    LEAD(y) OVER (PARTITION BY event_type ORDER BY d) AS yn
  FROM daily
)
SELECT event_type, d AS day, y AS revenue_cents,
  y - GREATEST(yp, yn) AS prominence_cents
FROM nb
WHERE yp IS NOT NULL AND yn IS NOT NULL
  AND y > yp AND y >= yn
  AND (y - GREATEST(yp, yn)) * 20 >= y
"""


@register(
    "q386_peak_detection",
    oracle=_Q386_SQL.format(events="events"),
    tags=("timeseries",),
)
def q386_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK detection with prominence on the per-type daily revenue
    series — the alerting primitive behind every 'traffic spiked'
    signal: a day is a peak when it strictly beats yesterday, at least
    ties tomorrow (the >/>= asymmetry resolves plateaus to their FIRST
    day, deterministically), and its prominence (height above the
    taller neighbor) is ≥5% of the peak itself — an integer-exact
    relative threshold (p·20 ≥ y, no float ratio). Complements q239's
    seasonal anomalies (which need a baseline model); peaks need only
    the local shape.

    Windows are PARTITIONED per event type over the |days| frame;
    everything rides as exact integer cents."""
    return _sql_twin(spark, sf_dir, _Q386_SQL, ["events"])


_Q387_SQL = """
WITH daily AS (
  SELECT (month(ts) - 1) * 31 + day(ts) AS d,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      AS BIGINT) AS xv,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS yp
  FROM {events} GROUP BY 1
), lags AS (
  SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) AS t(lag)
), joined AS (
  SELECT /*+ BROADCAST(l) */ l.lag, a.xv AS x, b.yp AS y
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.d = a.d + l.lag
), m AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
    CAST(SUM(y * y) AS BIGINT) AS syy
  FROM joined GROUP BY lag
), c AS (
  SELECT lag, n,
    round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
      / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
           * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6)
      AS xcorr
  FROM m
), best AS (
  SELECT MAX(abs(xcorr)) AS mx FROM c
)
SELECT /*+ BROADCAST(b) */ c.lag, c.n AS n_day_pairs, c.xcorr,
  abs(c.xcorr) = b.mx AS is_best_lag
FROM c CROSS JOIN best b
"""


@register(
    "q387_lead_lag_xcorr",
    oracle=_Q387_SQL.format(events="events"),
    tags=("timeseries", "stats"),
)
def q387_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD-LAG cross-correlation between daily view and purchase
    counts at lags −3..+3 — which series LEADS? (positive best lag =
    views predict purchases that many days ahead — the screening step
    before q426's Granger test makes it formal). Each lag is a day-
    shifted equi-join (b.d = a.d + lag) against a broadcast 7-row lag
    table — never a global window — and each lag's Pearson r comes
    from exact integer moments, rounded 6; the argmax flag is one
    broadcast fold.

    Scale: |days|×7 joined rows from one hash agg. Cross-correlating
    100 TB of raw events is THIS shape because the daily rollup comes
    first."""
    return _sql_twin(spark, sf_dir, _Q387_SQL, ["events"])


_Q394_SQL = """
WITH shard_day AS (
  SELECT user_id % 4 AS shard, (month(ts) - 1) * 31 + day(ts) AS d,
    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      AS BIGINT) AS errs,
    CAST(COUNT(*) AS BIGINT) AS reqs
  FROM {events} GROUP BY 1, 2
), budget AS (
  SELECT shard, CAST(floor(SUM(reqs) / 1e2) AS BIGINT) AS err_budget
  FROM shard_day GROUP BY shard
), burn AS (
  SELECT shard, d, errs,
    SUM(errs) OVER (PARTITION BY shard ORDER BY d) AS cum_errs
  FROM shard_day
)
SELECT b.shard, b.d AS day, b.errs AS day_errors,
  CAST(b.cum_errs AS BIGINT) AS cum_errors, g.err_budget,
  round(CAST(b.cum_errs AS DOUBLE) / g.err_budget, 4) AS budget_burned,
  b.cum_errs > g.err_budget AS exhausted
FROM burn b JOIN budget g ON g.shard = b.shard
"""


@register(
    "q394_slo_error_budget",
    oracle=_Q394_SQL.format(events="events"),
    tags=("timeseries", "dq"),
)
def q394_slo_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO ERROR-BUDGET burn-down (SRE's operating currency): with a
    99% success objective, each shard's monthly budget is 1% of its
    request volume; the running error count against it — per shard,
    per day, with the exhaustion flag — is the page-worthy trajectory.
    The cumulative window is PARTITIONED by shard (user_id%4, the
    service-shard stand-in), the budget one hash agg, the join
    broadcast-sized. All integers except the final burn ratio.

    Complements q413 (is the error RATE different?) with the
    operational question (when do we run out?)."""
    return _sql_twin(spark, sf_dir, _Q394_SQL, ["events"])


_Q397_SQL = """
WITH seq AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
    epoch_s, event_id
  FROM (
    SELECT user_id, value, event_id,
      ((month(ts) - 1) * 31 + day(ts)) * 86400
        + hour(ts) * 3600 + minute(ts) * 60 + second(ts) AS epoch_s
    FROM {events})
), tri AS (
  SELECT user_id, v AS v3,
    LAG(v, 1) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS v2,
    LAG(v, 2) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS v1
  FROM seq
), pats AS (
  -- ordinal pattern of (v1, v2, v3), ties resolved to the EARLIER
  -- position (<= / <) — deterministic, stated convention
  SELECT CASE
    WHEN v1 <= v2 AND v2 <= v3 THEN '012'
    WHEN v1 <= v3 AND v3 <  v2 THEN '021'
    WHEN v2 <  v1 AND v1 <= v3 THEN '102'
    WHEN v3 <  v1 AND v1 <= v2 THEN '120'
    WHEN v2 <= v3 AND v3 <  v1 THEN '201'
    ELSE '210' END AS pattern
  FROM tri WHERE v1 IS NOT NULL
), cnt AS (
  SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n FROM pats GROUP BY pattern
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cnt
), ent AS (
  SELECT /*+ BROADCAST(t) */
    CAST(SUM(CAST(floor(
      -(CAST(c.n AS DOUBLE) / t.nn) * ln(CAST(c.n AS DOUBLE) / t.nn) * 1e9)
      AS BIGINT)) AS BIGINT) AS g
  FROM cnt c CROSS JOIN tot t
)
SELECT /*+ BROADCAST(e) */ c.pattern, c.n AS n_triples,
  round(CAST(c.n AS DOUBLE) / t.nn, 6) AS p,
  round(e.g / 1e9 / ln(6e0), 6) AS normalized_perm_entropy
FROM cnt c CROSS JOIN tot t CROSS JOIN ent e
"""


@register(
    "q397_permutation_entropy",
    oracle=_Q397_SQL.format(events="events"),
    tags=("timeseries", "stats"),
)
def q397_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTATION entropy (Bandt-Pompe, order 3) of per-user value
    sequences — complexity measured through ORDINAL patterns: each
    consecutive triple maps to one of 3! = 6 order patterns; the
    Shannon entropy of the pattern distribution (normalized by ln 6)
    reads 1.0 for white noise, lower for any temporal structure —
    robust to monotone transformations and outliers, which is why it
    beats spectral measures on messy behavioral data (and complements
    q141's VALUE entropy with TEMPORAL-ORDER entropy). Tie convention
    (earlier position wins) is explicit in the CASE ladder, so both
    engines classify identically. Windows PARTITION per user; the
    6-row entropy fold rides the 1e-9 grid."""
    return _sql_twin(spark, sf_dir, _Q397_SQL, ["events"])


_Q398_SQL = """
WITH hourly AS (
  SELECT ((month(ts) - 1) * 31 + day(ts) - 1) * 24 + hour(ts) AS h,
    -- whole units, not cents: block moments square these sums, and
    -- int64 headroom must survive the 20x replica's 48M events
    CAST(SUM(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM {events} GROUP BY 1
), blocks AS (
  SELECT /*+ BROADCAST(m) */ m.m, CAST(floor(h.h / (1e0 * m.m)) AS BIGINT)
      AS blk, h.h, h.y
  FROM hourly h
  JOIN (SELECT * FROM (VALUES (24), (72)) AS t(m)) m ON TRUE
), bstats AS (
  SELECT m, blk, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(y) AS BIGINT) AS s, CAST(SUM(y * y) AS BIGINT) AS ss
  FROM blocks GROUP BY m, blk
), dev AS (
  SELECT b.m, b.blk, b.h,
    SUM(b.y - CAST(st.s AS DOUBLE) / st.n) OVER (
      PARTITION BY b.m, b.blk ORDER BY b.h) AS cum
  FROM blocks b JOIN bstats st ON st.m = b.m AND st.blk = b.blk
), rs AS (
  SELECT d.m, d.blk,
    (MAX(d.cum) - MIN(d.cum))
      / sqrt((MAX(st.ss) - CAST(MAX(st.s) AS DOUBLE) * MAX(st.s) / MAX(st.n))
             / MAX(st.n)) AS rs
  FROM dev d JOIN bstats st ON st.m = d.m AND st.blk = d.blk
  WHERE st.n >= CAST(d.m * 3 / 4e0 AS BIGINT)
    AND st.ss * st.n > st.s * st.s
  GROUP BY d.m, d.blk
), avg_rs AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
    CAST(SUM(CAST(floor(rs * 1e6) AS BIGINT)) AS BIGINT) AS g
  FROM rs GROUP BY m
), wide AS (
  SELECT
    MAX(CASE WHEN m = 24 THEN g / 1e6 / n_blocks END) AS rs24,
    MAX(CASE WHEN m = 72 THEN g / 1e6 / n_blocks END) AS rs72,
    MAX(CASE WHEN m = 24 THEN n_blocks END) AS nb24,
    MAX(CASE WHEN m = 72 THEN n_blocks END) AS nb72
  FROM avg_rs
)
SELECT nb24 AS n_blocks_24h, nb72 AS n_blocks_72h,
  round(rs24, 4) AS rs_24h, round(rs72, 4) AS rs_72h,
  round(ln(rs72 / rs24) / ln(3e0), 6) AS hurst_exponent
FROM wide
"""


@register(
    "q398_hurst_rs",
    oracle=_Q398_SQL.format(events="events"),
    tags=("timeseries", "stats"),
)
def q398_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST exponent by rescaled-range (R/S) analysis on the hourly
    revenue series: within blocks of 24 h and 72 h, R = range of the
    cumulative mean-deviation walk, S = block std; H is the log-log
    slope of avg(R/S) between the two block sizes (H ≈ 0.5 memoryless,
    > 0.5 long-range persistent, < 0.5 mean-reverting) — the
    long-memory diagnostic ACF (q227) cannot see because it decays too
    fast to estimate tail dependence. Mandelbrot's original use was
    exactly this series shape (aggregated flows).

    Per-block cumulative walks are windows PARTITIONED by (size,
    block); block moments are exact integers; per-block R/S values
    ride the 1e-6 grid into the block average. Degenerate blocks
    (zero variance or truncated tail blocks) are excluded by stated
    rule on both sides."""
    return _sql_twin(spark, sf_dir, _Q398_SQL, ["events"])


# -- round-10 lag family: calendar-lag autocorrelation machinery --------
#
# One template, two date-shift dialects ({s1}..{s5} placeholders):
# Spark lacks DATE+INT, DuckDB lacks date_add(DATE, INT) — everything
# else in the template is dialect-shared, so both engines evaluate the
# identical arithmetic tree. The daily series is exact integer
# hundred-dollar units (floor, never round — q362); deviation products
# are floored per pair onto the unit grid and BIGINT-summed (q382).
# Lags are CALENDAR lags over an explicit self-equi-join on shifted
# date — no unpartitioned window, gaps simply contribute no pair.

_LAG_SERIES = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS dol
  FROM {orders} GROUP BY CAST(o_orderdate AS DATE)
), s AS (
  SELECT d, CAST(floor(dol / 100e0) AS BIGINT) AS x FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
  FROM s
), d0 AS (
  SELECT CAST(SUM(CAST(floor(
      (x - CAST(sx AS DOUBLE) / n) * (x - CAST(sx AS DOUBLE) / n))
    AS BIGINT)) AS BIGINT) AS s0
  FROM s CROSS JOIN m
)"""


def _lag_cte(k: int, shift: str) -> str:
    return f"""l{k} AS (
  SELECT CAST(SUM(CAST(floor(
      (a.x - CAST(m.sx AS DOUBLE) / m.n)
      * (b.x - CAST(m.sx AS DOUBLE) / m.n)) AS BIGINT)) AS BIGINT) AS sk,
    CAST(COUNT(*) AS BIGINT) AS nk
  FROM s a JOIN s b ON b.d = {shift} CROSS JOIN m
)"""


def _q450_sql(shift_fmt: str, orders: str) -> str:
    lags = ",\n".join(_lag_cte(k, shift_fmt.format(k=k)) for k in range(1, 6))
    rsum = " + ".join(
        f"(CAST(l{k}.sk AS DOUBLE) / d0.s0) * (CAST(l{k}.sk AS DOUBLE)"
        f" / d0.s0) / (m.n - {k})"
        for k in range(1, 6)
    )
    rcols = ",\n  ".join(
        f"round(CAST(l{k}.sk AS DOUBLE) / d0.s0, 6) AS r{k}"
        for k in range(1, 6)
    )
    return f"""
WITH {_LAG_SERIES.format(orders=orders).lstrip()},
{lags}
SELECT m.n AS n_days,
  {rcols},
  round(m.n * (m.n + 2e0) * ({rsum}), 4) AS ljung_box_q,
  round(m.n * (m.n + 2e0) * ({rsum}), 4) > 11.0705 AS reject_white_95
FROM m CROSS JOIN d0
  CROSS JOIN l1 CROSS JOIN l2 CROSS JOIN l3 CROSS JOIN l4 CROSS JOIN l5
"""


@register(
    "q450_ljung_box",
    oracle=_q450_sql("(a.d + {k})", "orders"),
    tags=("timeseries", "stats"),
)
def q450_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the daily-revenue series — are
    the first five autocorrelations jointly zero (white noise), or
    does revenue carry serial structure worth a forecast model? The
    autocorrelation estimates are calendar-lag (an explicit self-join
    on shifted DATE; calendar gaps contribute no pair — documented
    estimator choice, identical on both engines), with deviation
    products floored onto the unit grid per pair and BIGINT-summed, so
    rₖ and Q are deterministic functions of exact integers. Q against
    χ²₅'s 95% point.

    Scale: one day-grain agg from the fact table, then five
    broadcast-sized self-joins on a ~2400-row frame."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tw_orders")
    return spark.sql(_q450_sql("date_add(a.d, {k})", "tw_orders"))


def _q451_sql(shift_fmt: str, orders: str) -> str:
    def diff_cte(name: str, k: int) -> str:
        return f"""{name} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(b.x - a.x) AS BIGINT) AS sd,
    CAST(SUM((b.x - a.x) * (b.x - a.x)) AS BIGINT) AS sdd
  FROM s a JOIN s b ON b.d = {shift_fmt.format(k=k)}
)"""

    return f"""
WITH {_LAG_SERIES.format(orders=orders).lstrip()},
{diff_cte("d1", 1)},
{diff_cte("d5", 5)}
SELECT d1.n AS n_pairs_1d, d5.n AS n_pairs_5d,
  round(((CAST(d5.sdd AS DOUBLE) - CAST(d5.sd AS DOUBLE) * d5.sd / d5.n)
         / d5.n / 5e0)
      / ((CAST(d1.sdd AS DOUBLE) - CAST(d1.sd AS DOUBLE) * d1.sd / d1.n)
         / d1.n), 6) AS variance_ratio
FROM d1 CROSS JOIN d5
"""


@register(
    "q451_variance_ratio",
    oracle=_q451_sql("(a.d + {k})", "orders"),
    tags=("timeseries", "stats"),
)
def q451_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay VARIANCE-RATIO test statistic on daily revenue:
    Var(5-day change)/(5·Var(1-day change)) — exactly 1 for a random
    walk, <1 under mean reversion, >1 under trending. The martingale
    diagnostic quant desks run before fitting anything fancier.
    Differences of the integer series are EXACT ints (no grid needed);
    the two variances and the ratio are one double expression over
    exact (n, Σd, Σd²) triples. Calendar-lag pairs as in q450.

    Scale: one day-grain agg + two self-joins on the day frame."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tw_orders")
    return spark.sql(_q451_sql("date_add(a.d, {k})", "tw_orders"))


def _q452_sql(shift_fmt: str, orders: str) -> str:
    lags = ",\n".join(_lag_cte(k, shift_fmt.format(k=k)) for k in range(1, 4))
    return f"""
WITH {_LAG_SERIES.format(orders=orders).lstrip()},
{lags},
r AS (
  SELECT
    CAST(l1.sk AS DOUBLE) / d0.s0 AS r1,
    CAST(l2.sk AS DOUBLE) / d0.s0 AS r2,
    CAST(l3.sk AS DOUBLE) / d0.s0 AS r3
  FROM d0 CROSS JOIN l1 CROSS JOIN l2 CROSS JOIN l3
), p2 AS (
  SELECT r1, r2, r3,
    r1 * (1e0 - r2) / (1e0 - r1 * r1) AS phi21,
    (r2 - r1 * r1) / (1e0 - r1 * r1) AS phi22
  FROM r
)
SELECT round(r1, 6) AS acf1, round(r2, 6) AS acf2, round(r3, 6) AS acf3,
  round(r1, 6) AS pacf1,
  round((r2 - r1 * r1) / (1e0 - r1 * r1), 6) AS pacf2,
  round((r3 - phi21 * r2 - phi22 * r1)
      / (1e0 - phi21 * r1 - phi22 * r2), 6) AS pacf3
FROM p2
"""


@register(
    "q452_acf_pacf",
    oracle=_q452_sql("(a.d + {k})", "orders"),
    tags=("timeseries", "stats"),
)
def q452_acf_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF and PACF (lags 1–3) of the daily-revenue series — the
    Box-Jenkins model-identification pair: ACF tails off / PACF cuts
    off ⇒ AR order, and vice versa for MA. PACF via the closed-form
    Durbin-Levinson recursion unrolled to level 3 (φ₂₁/φ₂₂ as an
    explicit intermediate layer — a nested subquery, not same-SELECT
    alias reuse, so both engines bind identically). Autocorrelations
    from the q450 grid-int machinery; every PACF is a double
    expression over the same three rₖ doubles on both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tw_orders")
    return spark.sql(_q452_sql("date_add(a.d, {k})", "tw_orders"))


def _q457_sql(shift2: str, orders: str) -> str:
    """shift2 formats with {a} (alias) and {k} (day count)."""
    prev1 = shift2.format(a="b", k=1)
    prev2 = shift2.format(a="c", k=2)
    return f"""
WITH {_LAG_SERIES.format(orders=orders).lstrip()},
sd AS (
  SELECT CAST(SUM(CAST(floor(
      (x - CAST(sx AS DOUBLE) / n) * (x - CAST(sx AS DOUBLE) / n))
    AS BIGINT)) AS BIGINT) AS ss
  FROM s CROSS JOIN m
), z AS (
  SELECT s.d,
    (s.x - CAST(m.sx AS DOUBLE) / m.n)
      / sqrt(CAST(sd.ss AS DOUBLE) / m.n) AS z
  FROM s CROSS JOIN m CROSS JOIN sd
), flags AS (
  SELECT d,
    CASE WHEN z > 3e0 OR z < -3e0 THEN 1 ELSE 0 END AS r1,
    CASE WHEN z > 2e0 THEN 1 WHEN z < -2e0 THEN -1 ELSE 0 END AS s2
  FROM z
), rule2 AS (
  -- simplified Western Electric rule 2: day d beyond 2 sigma AND one
  -- of the two preceding CALENDAR days beyond 2 sigma the same side
  SELECT a.d
  FROM flags a
  LEFT JOIN flags b ON a.d = {prev1}
  LEFT JOIN flags c ON a.d = {prev2}
  WHERE a.s2 <> 0
    AND (COALESCE(b.s2, 0) = a.s2 OR COALESCE(c.s2, 0) = a.s2)
)
SELECT m.n AS n_days,
  (SELECT CAST(SUM(r1) AS BIGINT) FROM flags) AS rule1_violations,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM rule2) AS rule2_violations
FROM m
"""


@register(
    "q457_control_rules",
    oracle=_q457_sql("({a}.d + {k})", "orders"),
    tags=("timeseries", "stats", "dq"),
)
def q457_control_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart control-chart violations on daily revenue — Western
    Electric rule 1 (beyond ±3σ) and the 2-of-3-beyond-2σ-same-side
    run rule (simplified to the two preceding calendar days): the SPC
    layer a pipeline-health monitor runs on any daily metric, catching
    both single spikes (rule 1) and sustained small shifts rule 1
    misses (rule 2). z-scores are one double expression over exact
    integer sums (identical both engines, so the ±kσ comparisons
    agree bit-for-bit); the run rule is two calendar-lag self-joins
    on the day frame — no window."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tw_orders")
    return spark.sql(_q457_sql("date_add({a}.d, {k})", "tw_orders"))


_Q462_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS dol
  FROM {orders} GROUP BY CAST(o_orderdate AS DATE)
), s AS (
  SELECT d, CAST(floor(dol / 100e0) AS BIGINT) AS x FROM daily
), dd AS (
  SELECT /*+ BROADCAST(b) */ a.d AS trough_d, MAX(b.x - a.x) AS fall,
    max_by(b.d, b.x * 100000 - CAST(
      year(b.d) * 372 + (month(b.d) - 1) * 31 + day(b.d) AS BIGINT))
      AS peak_d
  FROM s a JOIN s b ON b.d <= a.d
  GROUP BY a.d
), pick AS (
  SELECT CAST(peak_d AS STRING) AS peak_day,
    CAST(trough_d AS STRING) AS trough_day, fall
  FROM dd ORDER BY fall DESC, trough_d, peak_d LIMIT 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_days,
  peak_day, trough_day,
  round(fall / 100e0 / 100e0, 2) AS max_drawdown_kusd
FROM pick
"""


@register(
    "q462_max_drawdown",
    oracle=_Q462_SQL.format(orders="orders"),
    tags=("timeseries", "finance"),
)
def q462_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN of the daily-revenue level series — the
    largest peak-to-later-trough fall, with its peak and trough days:
    the risk metric every metric dashboard wants next to the trend
    line. The running-peak formulation collapses to a pure pairwise
    MAX over (peak ≤ trough) day pairs — one broadcast theta-join on
    the ~2400-day frame, no running window, no iteration. All values
    exact integers; the argmax pair is fully tie-broken (largest fall,
    then earliest trough, then the peak picked by max_by's
    deterministic integer key: highest x, earliest day)."""
    return _sql_twin(spark, sf_dir, _Q462_SQL, ["orders"])


_Q463_SQL = """
WITH t AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, value,
    (CAST(day(ts) AS BIGINT) * 86400 + CAST(hour(ts) AS BIGINT) * 3600
     + CAST(minute(ts) AS BIGINT) * 60 + CAST(second(ts) AS BIGINT))
      * 17179869184 + event_id AS tk
  FROM {events} WHERE value > 0
), ohlc AS (
  SELECT d, min_by(value, tk) AS o, MAX(value) AS h, MIN(value) AS l,
    max_by(value, tk) AS c, CAST(COUNT(*) AS BIGINT) AS n_ticks
  FROM t GROUP BY d
), gk AS (
  SELECT d, n_ticks,
    CAST(round((5e-1 * ln(h / l) * ln(h / l)
      - (2e0 * ln(2e0) - 1e0) * ln(c / o) * ln(c / o)) * 1e9)
      AS BIGINT) AS v_grid
  FROM ohlc WHERE n_ticks >= 4
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
  round(SUM(v_grid) / CAST(COUNT(*) AS DOUBLE) / 1e9, 6) AS gk_var,
  round(sqrt(SUM(v_grid) / CAST(COUNT(*) AS DOUBLE) / 1e9), 6) AS gk_vol
FROM gk
"""


@register(
    "q463_garman_klass",
    oracle=_Q463_SQL.format(events="events"),
    tags=("timeseries", "finance"),
)
def q463_garman_klass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman-Klass realized-volatility estimator from daily OHLC bars
    built out of the raw event ticks — the range-based variance
    estimate that's ~7× more efficient than close-to-close returns
    because the intraday high/low carry most of the information.
    Bars via min_by/max_by on the q393 deterministic tick key (both
    engines); each day's GK term is one double expression over those
    four bar values, snapped onto the 1e-9 grid, averaged over days.
    Days with <4 ticks are dropped (an OHLC bar needs distinct
    opens/extremes to mean anything).

    Scale: one day-grain agg over the fact stream; everything after
    lives on the ≤31-row bar frame."""
    return _sql_twin(spark, sf_dir, _Q463_SQL, ["events"])


_Q464_SQL = """
WITH mon AS (
  SELECT c.c_mktsegment AS seg,
    CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) AS ym,
    CAST(SUM(CAST(round(o.o_totalprice) AS BIGINT)) AS BIGINT) AS rev
  FROM {orders} o JOIN {customer} c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, year(o.o_orderdate) * 12 + month(o.o_orderdate)
), mkt AS (
  SELECT ym, CAST(SUM(rev) AS BIGINT) AS rev FROM mon GROUP BY ym
), rs AS (
  SELECT a.seg, a.ym,
    (b.rev - CAST(a.rev AS DOUBLE)) / a.rev AS r
  FROM mon a JOIN mon b ON b.seg = a.seg AND b.ym = a.ym + 1
), rm AS (
  SELECT a.ym, (b.rev - CAST(a.rev AS DOUBLE)) / a.rev AS r
  FROM mkt a JOIN mkt b ON b.ym = a.ym + 1
), j AS (
  SELECT rs.seg,
    CAST(round(rs.r * 1e6) AS BIGINT) AS rg,
    CAST(round(rm.r * 1e6) AS BIGINT) AS rk
  FROM rs JOIN rm ON rm.ym = rs.ym
), m AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(rg) AS BIGINT) AS sg, CAST(SUM(rk) AS BIGINT) AS sk,
    CAST(SUM(rg * rk) AS BIGINT) AS sgk,
    CAST(SUM(rg * rg) AS BIGINT) AS sgg,
    CAST(SUM(rk * rk) AS BIGINT) AS skk
  FROM j GROUP BY seg
)
SELECT seg AS segment, n AS n_months,
  round((CAST(sg AS DOUBLE) / n / 1e6)
    / sqrt((CAST(sgg AS DOUBLE) / n - (CAST(sg AS DOUBLE) / n)
          * (CAST(sg AS DOUBLE) / n)) / 1e12), 6) AS sharpe_monthly,
  round((CAST(sgk AS DOUBLE) / n - (CAST(sg AS DOUBLE) / n)
       * (CAST(sk AS DOUBLE) / n))
    / (CAST(skk AS DOUBLE) / n - (CAST(sk AS DOUBLE) / n)
       * (CAST(sk AS DOUBLE) / n)), 6) AS beta_vs_market
FROM m
"""


@register(
    "q464_sharpe_beta",
    oracle=_Q464_SQL.format(orders="orders", customer="customer"),
    tags=("timeseries", "finance", "stats"),
)
def q464_sharpe_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly SHARPE ratio and MARKET BETA per customer segment —
    treating each segment's month-over-month revenue growth as a
    return series and the pooled book as 'the market': the two
    portfolio-risk numbers (risk-adjusted mean, systematic
    sensitivity) any multi-tenant revenue dashboard should report.
    Month indices are exact integers (year·12+month), so the lag join
    is a plain equi-join on ym+1 — dialect-shared, unlike date lags.
    Returns are identical double ratios of exact integer revenues,
    snapped onto the 1e-6 grid (partial boundary months make
    small-sf returns reach O(100), so a finer grid would overflow the
    squared-moment BIGINTs — the q385 sizing rule), and
    Sharpe/beta are single double expressions."""
    return _sql_twin(spark, sf_dir, _Q464_SQL, ["orders", "customer"])


def _q465_sql(shift_fmt: str, orders: str) -> str:
    s1 = shift_fmt.format(k=1)
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS dol,
    CAST(COUNT(*) AS BIGINT) AS vol
  FROM {orders} GROUP BY CAST(o_orderdate AS DATE)
), s AS (
  SELECT d, CAST(floor(dol / 100e0) AS BIGINT) AS x, vol FROM daily
), pair AS (
  SELECT b.d,
    CAST(round(abs((b.x - CAST(a.x AS DOUBLE)) / a.x) / b.vol * 1e12)
      AS BIGINT) AS illiq_grid
  FROM s a JOIN s b ON b.d = {s1}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
  round(SUM(illiq_grid) / CAST(COUNT(*) AS DOUBLE) / 1e6, 6)
    AS amihud_illiq_x1e6
FROM pair
"""


@register(
    "q465_amihud_illiquidity",
    oracle=_q465_sql("(a.d + {k})", "orders"),
    tags=("timeseries", "finance"),
)
def q465_amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud (2002) illiquidity ratio on the daily series — mean of
    |daily return| / daily volume (×10⁶): the price-impact-per-unit-
    flow measure, here 'how much does revenue level move per order of
    activity', the standard liquidity screen in empirical finance.
    Returns are double ratios of exact integers (calendar-lag pairs,
    q450 machinery); each day's ratio snaps onto the 1e-12 grid
    before the BIGINT mean — order-free."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tw_orders")
    return spark.sql(_q465_sql("date_add(a.d, {k})", "tw_orders"))
