"""Window-function operators (SURVEY.md §2.6 #50-55).

Each window spec shuffles once on its partition key then sorts within
partitions — so at scale the partition key choice is the whole story:
per-user/per-customer keys give millions of small partitions (good);
a constant key funnels everything to one task (never do that — all
specs here partition on real keys). Ordering always includes a unique
tiebreaker column so results are deterministic for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.compat import dec2, dec_out, epoch_secs
from ..io import load_table
from ..registry import register


@register(
    "q50_ranking_functions",
    oracle="""
SELECT o_orderkey, o_orderpriority,
  row_number() OVER w AS rn,
  rank()       OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  ntile(4)     OVER w AS quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("window", "bench"),
)
def q50_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family (#50) over per-priority windows; o_orderkey breaks
    price ties so every rank is reproducible."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q51_lag_lead",
    oracle="""
SELECT event_id, user_id,
  lag(value)  OVER w AS prev_value,
  lead(value) OVER w AS next_value,
  lag(value, 2, -1.0) OVER w AS prev2_or_default,
  value - lag(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "timeseries"),
)
def q51_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic offsets (#51) on the event stream, per user in event-time
    order (ts ties broken by event_id). value-deltas stay exact: raw
    double subtraction is IEEE-deterministic on identical inputs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "q52_running_totals",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS running_spend,
  COUNT(*) OVER w AS orders_so_far,
  CAST(CAST(max(CAST(o_totalprice AS DECIMAL(10,2))) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS max_so_far
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def q52_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed running aggregates (#52) + explicit cumulative row frame
    (#53's unbounded-preceding case). Decimal sums keep every prefix
    exact, so the cumulative column is order-proof."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec2("o_totalprice")).over(w).cast("decimal(38,2)").cast("string").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("orders_so_far"),
        F.max(dec2("o_totalprice")).over(w).cast("decimal(38,2)").cast("string").alias("max_so_far"),
    )


@register(
    "q53_moving_window",
    oracle="""
SELECT event_id, user_id,
  CAST(CAST(SUM(CAST(value AS DECIMAL(10,2))) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS sum_7,
  COUNT(*) OVER w AS cnt_7,
  round(CAST(SUM(CAST(value AS DECIMAL(10,2))) OVER w AS DOUBLE) / COUNT(*) OVER w, 6)
    AS moving_avg_7
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "timeseries"),
)
def q53_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded row frame (#53): trailing-7-rows moving aggregate; the
    moving average derives from the exact decimal sum ÷ frame count."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    sum7 = F.sum(dec2("value")).over(w)
    cnt7 = F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id",
        "user_id",
        sum7.cast("decimal(38,2)").cast("string").alias("sum_7"),
        cnt7.alias("cnt_7"),
        F.round(sum7.cast("double") / cnt7, 6).alias("moving_avg_7"),
    )


@register(
    "q54_range_frame_time",
    oracle="""
SELECT event_id, user_id,
  CAST(CAST(SUM(CAST(value AS DECIMAL(10,2)))
       OVER (PARTITION BY user_id ORDER BY date_diff('second', TIMESTAMP '2024-01-01', ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS VARCHAR)
    AS sum_last_hour
FROM events
""",
    tags=("window", "timeseries"),
)
def q54_range_frame_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value/time-range frame (#54): trailing 1-hour window keyed on
    seconds-since-epoch-of-a-fixed-literal — timestampdiff on NTZ is
    timezone-independent, so the oracle agrees whatever the session tz.
    (Spark's rangeBetween needs a numeric ordering key; ns truncation
    doesn't matter because only second-level differences are compared —
    both engines floor to whole seconds.)"""
    ev = load_table(spark, sf_dir, "events")
    secs = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec2("value")).over(w).cast("decimal(38,2)").cast("string").alias("sum_last_hour"),
    )


@register(
    "q55_first_last_value",
    oracle="""
SELECT o_orderkey, o_custkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice)  OVER w AS latest_price,
  nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window",),
)
def q55_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over an explicit full frame (#55) — the
    default frame would make last_value just the current row."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "q127_latest_record_compaction",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_orderdate AS DATE) AS last_update
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn
  FROM orders
)
WHERE rn = 1
""",
    tags=("window",),
)
def q127_latest_record_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log → current state: keep each key's latest record
    (row_number over change-time descending, unique tiebreak so both
    engines pick the same winner). This is the compaction every
    upsert-log consumer runs; one shuffle on the entity key, and at
    100 TB the partition count is |entities| — always scale-safe,
    unlike timestamp-keyed windows."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("last_update"),
        )
    )


def scalable_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list,
    out_col: str = "rn",
    n_parts: int | None = None,
) -> DataFrame:
    """row_number() over (PARTITION BY group ORDER BY order) without the
    few-groups parallelism trap.

    A plain window with a low-cardinality partition key (q50: five
    order priorities) funnels each group through ONE task — the classic
    window bottleneck called out in VERDICT.md r01 (q50 plan audit). At
    100 TB a 20-billion-row priority group simply does not fit one task.

    Two-phase plan, every stage at full parallelism:

    1. ``repartitionByRange(n, group, order)`` — sampled range
       partitioner splits each group's sort order across many
       partitions, in global order (partition i's keys all precede
       partition i+1's).
    2. Local ranks via a window on (partition_id, group) — parallelism
       is ~n, not |groups|.
    3. Per-(partition, group) counts (n·|groups| rows — tiny) get
       prefix-sum offsets by partition id within each group; local rank
       + broadcast-joined offset = exact global row_number.

    Skew-safe by construction: the range partitioner balances on data
    volume, so a hot group spreads over many partitions. Boundary
    placement does not affect the result, only balance, so AQE
    coalescing is harmless. Row numbers are deterministic as long as
    ``order_exprs`` end with a unique tiebreaker.
    """
    spark = df.sparkSession
    n = n_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    range_keys = [F.col(c) for c in group_cols] + list(order_exprs)
    parts = df.repartitionByRange(n, *range_keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid", *group_cols).orderBy(*order_exprs)
    local = parts.withColumn("_lrn", F.row_number().over(w_local))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
        .select("_pid", *group_cols, "_off")
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(out_col, (F.col("_lrn") + F.col("_off")).cast("int"))
        .drop("_pid", "_lrn", "_off")
    )


@register(
    "q50b_scalable_ranking",
    oracle="""
SELECT o_orderkey, o_orderpriority,
  CAST(row_number() OVER (
    PARTITION BY o_orderpriority
    ORDER BY o_totalprice DESC, o_orderkey
  ) AS INTEGER) AS rn
FROM orders
""",
    tags=("window", "scale"),
)
def q50b_scalable_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q50's ranking semantics on the q50-killer plan shape: two-phase
    range-partitioned row_number (``scalable_row_number``) instead of a
    5-partition window. Same answer as the oracle's plain window —
    proven by the shared oracle — but every stage runs at shuffle-width
    parallelism, so the plan survives groups of any size."""
    o = load_table(spark, sf_dir, "orders")
    ranked = scalable_row_number(
        o,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )
    return ranked.select("o_orderkey", "o_orderpriority", "rn")


@register(
    "q128_scd2_dimension",
    oracle="""
WITH changes AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
    lag(o_orderstatus) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ) AS prev_status
  FROM orders
),
versions AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
  FROM changes
  WHERE prev_status IS NULL OR o_orderstatus <> prev_status
)
SELECT o_custkey,
  o_orderstatus AS status,
  CAST(o_orderdate AS DATE) AS valid_from,
  CAST(lead(o_orderdate) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ) AS DATE) AS valid_to,
  CAST(CASE WHEN lead(o_orderdate) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ) IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM versions
""",
    tags=("window",),
)
def q128_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build from a change log: treat
    each customer's orders as status-change events, collapse runs of
    the same status (change detection via lag), then assign validity
    intervals (valid_from/valid_to via lead; open interval = current
    row). This is the standard dimension-history pipeline every
    warehouse maintains; both windows shuffle once on the entity key —
    |entities| partitions, scale-safe at any volume. Versioned-table
    integration: feed ``versioning.Table.changes()`` batches through
    the same shape for incremental SCD2 maintenance."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    versions = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("o_orderstatus") != F.col("prev_status"))
        )
        .drop("prev_status")
    )
    wv = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(wv)
    return versions.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        nxt.cast("date").alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


@register(
    "q154_ratio_to_report",
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_linenumber,
    CAST(l_extendedprice AS DECIMAL(10,2)) AS price
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
  CAST(CAST(price AS DECIMAL(38,2)) AS VARCHAR) AS line_price,
  round(CAST(price AS DOUBLE)
        / CAST(SUM(price) OVER (PARTITION BY l_orderkey) AS DOUBLE), 6)
    AS order_share,
  COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
FROM l
""",
    tags=("window",),
)
def q154_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each line's share of its whole order — the
    *unframed* window aggregate (partition total on every row), the one
    window shape q52-q55's running/sliding frames don't cover. One
    shuffle on the partition key, no sort needed for the total (Spark
    still sorts for the window; an aggregate+rejoin would trade that
    for a second shuffle — at high line-counts-per-key the window wins
    because the partition streams once). Share is an intrinsically
    inexact ratio → computed exact-decimal ÷ exact-decimal in DOUBLE
    and rounded identically on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    price = dec2("l_extendedprice")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dec_out(price, "line_price", 2),
        F.round(
            price.cast("double") / F.sum(price).over(w).cast("double"), 6
        ).alias("order_share"),
        F.count(F.lit(1)).over(w).alias("n_lines"),
    )


_Q312_MASK = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
    "WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 ELSE 16 END"
)


@register(
    "q312_rolling_distinct_bitmask",
    oracle=f"""
WITH e AS (
  SELECT user_id, {_Q312_MASK} AS m,
    epoch(date_trunc('second', ts)) AS tse, event_id
  FROM events
),
r AS (
  SELECT user_id,
    bit_count(CAST(bit_or(m) OVER (PARTITION BY user_id
        ORDER BY tse, event_id
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)) AS k
  FROM e
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(MAX(k) AS BIGINT) AS max_types_in_10,
  round(CAST(SUM(k) AS DOUBLE) / COUNT(*), 4) AS avg_types_in_10
FROM r GROUP BY user_id
""",
    tags=("window", "behavioral"),
)
def q312_rolling_distinct_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING DISTINCT-count over a row frame — the operation SQL
    windows can't express directly (COUNT(DISTINCT) OVER is illegal in
    both engines) — made exact for small domains by the bitmask trick:
    encode each event type as one bit, ``bit_or`` over the trailing
    10-row frame, ``bit_count`` the result. Behavioral diversity per
    sliding window in pure integer ops, no state blow-up (the general-
    domain rolling distinct is q197/q149's exact/sketch pair; this is
    the O(1)-state exact path every low-cardinality column should
    take at 100 TB).

    Scale shape: one per-user window (frame-bounded agg, map-side
    after the window exchange), one user-grain agg."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(_Q312_MASK).alias("m"),
        epoch_secs("ts").alias("tse"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tse", "event_id")
        .rowsBetween(-9, 0)
    )
    r = e.select(
        "user_id",
        F.bit_count(F.expr("bit_or(m)").over(w).cast("bigint")).alias("k"),
    )
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("k").cast("bigint").alias("max_types_in_10"),
        F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_types_in_10"
        ),
    )
