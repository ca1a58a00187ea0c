"""Composite analytics queries — classic decision-support shapes
(TPC-H-style Q3/Q6/Q10/Q18 over the fixture star schema) exercising the
relational operators (§2.3-2.7) *in combination*: multi-join + agg +
top-k pipelines, selective scan-only aggregation, semi-join on a HAVING
subquery. These are the bench workhorses — each is one canonical plan
shape whose scaling behavior is worth tracking release-over-release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import SQL_DISC_PRICE, dec2, dec4, disc_price, dsum, sql_dsum
from ..io import load_table
from ..registry import register


@register(
    "q92_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
  {sql_dsum(SQL_DISC_PRICE, "revenue", 6)},
  CAST(o.o_orderdate AS DATE) AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("analytics", "bench"),
)
def q92_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: selective filters on both fact sides, 3-way join,
    revenue agg, global top-10 (TakeOrdered — no full sort)."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(disc_price(), "revenue", 6))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q93_forecast_revenue_change",
    oracle="""
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(6,4)))
       AS DECIMAL(38,6)) AS VARCHAR) AS potential_revenue,
  COUNT(*) AS n_qualifying
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.06
  AND l_quantity < 24.0
""",
    tags=("analytics", "bench"),
)
def q93_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure scan-side aggregation — every predicate
    pushes to the parquet reader, no join, no group key; the canonical
    'is pushdown working' benchmark."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.06)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec4("l_discount"))
            .cast("decimal(38,6)")
            .cast("string")
            .alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_qualifying"),
        )
    )


@register(
    "q94_returned_item_ranking",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
  {sql_dsum(SQL_DISC_PRICE, "revenue", 6)},
  COUNT(*) AS n_items
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("analytics", "bench"),
)
def q94_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: who returns the most revenue — 4-way join with a
    broadcast nation dim, customer-grain agg, top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(disc_price(), "revenue", 6), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q99_priority_late_orders",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
    tags=("analytics",),
)
def q99_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS with an inequality on columns
    from both sides — Catalyst decorrelates to a semi-join whose
    residual condition evaluates post-match. Counts orders per priority
    having any lineitem shipped >60 days after ordering."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q100_promo_revenue_share",
    oracle=f"""
SELECT
  round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {SQL_DISC_PRICE} END) AS DOUBLE)
        / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE), 6) AS promo_share_pct,
  COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-07-01'
""",
    tags=("analytics",),
)
def q100_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional-aggregate ratio over a fact⋈dim
    join (part broadcast). Both sums are exact decimals; the ratio is
    the one double op, rounded."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    joined = li.join(p, li.l_partkey == p.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price())
    ).cast("double")
    total = F.sum(disc_price()).cast("double")
    return joined.agg(
        F.round(F.lit(100.0) * promo / total, 6).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q95_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
  CAST(o.o_orderdate AS DATE) AS orderdate,
  CAST(CAST(sum_qty AS DECIMAL(38,2)) AS VARCHAR) AS total_qty
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(10,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey) s
  ON s.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
""",
    tags=("analytics",),
)
def q95_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: HAVING-filtered aggregate as a semi-join driver —
    the aggregate-then-join pattern that keeps the fact table from
    joining before it shrinks."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    qty = li.groupBy("l_orderkey").agg(
        F.sum(dec2("l_quantity")).alias("sum_qty")
    )
    big = qty.filter(F.col("sum_qty") > 150)
    return (
        o.join(big.select("l_orderkey"), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(qty, o.o_orderkey == qty.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("sum_qty").cast("decimal(38,2)").cast("string").alias("total_qty"),
        )
    )
