"""Projection / filter / predicate operators (SURVEY.md §2.3 #23-27)
plus the flagship pricing-summary query (§7 Phase 0).

Every query here compiles to scan→filter→project (and for the flagship,
hash-aggregate→sort) with predicates and column pruning pushed into the
parquet scan — verify with ``df.explain("formatted")`` (``PushedFilters``
/ ``ReadSchema``). At 100 TB these are embarrassingly parallel map-side
plans with zero or one shuffle (the flagship's partial+final hash agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    davg,
    dec2,
    dec4,
    disc_price,
    dec_out,
    dsum,
    sql_davg,
    sql_dsum,
)
from ..io import load_table
from ..registry import register

_Q1_CUTOFF = "2001-09-02 00:00:00"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("CAST(l_quantity AS DECIMAL(10,2))", "sum_qty")},
  {sql_dsum("CAST(l_extendedprice AS DECIMAL(10,2))", "sum_base_price")},
  {sql_dsum(SQL_DISC_PRICE, "sum_disc_price", 6)},
  {sql_dsum(SQL_CHARGE, "sum_charge", 10)},
  {sql_davg("CAST(l_quantity AS DECIMAL(10,2))", "avg_qty")},
  {sql_davg("CAST(l_extendedprice AS DECIMAL(10,2))", "avg_price")},
  {sql_davg("CAST(l_discount AS DECIMAL(6,4))", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@register("q01_pricing_summary", oracle=_Q1_ORACLE, tags=("flagship", "bench", "agg"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the engine's spine
    (scan→filter→project→hash-agg→sort).

    Plan notes: filter pushed to parquet; two-phase (partial+final)
    HashAggregate on low-cardinality keys ⇒ the single shuffle moves
    only |groups|×|partitions| rows; decimal sums stay inside
    whole-stage codegen. The filtered scan routes through the shared
    undersplit guard KEYED on l_extendedprice (r10) — an already-read
    high-cardinality column, so column pruning stays at 7 columns
    (keying on l_orderkey would add a scan column): the wide-decimal
    partial sums are the dominant cost (~1.4 s of 1.8 s measured via
    a double-typed control), single-core on the one-split fixture
    scan. The keyless round-robin variant was measured and rejected
    (its hidden pre-repartition local sort ate the gain: 1.16 vs
    1.22 s); HASH repartition needs no sort — 1.031 s → 0.731 s
    min-of-6 at sf0.1. No-op at production split counts; the guard
    sits above the filter so PushedFilters still reaches the scan.
    """
    from ..io import rebalance_if_undersplit

    li = load_table(spark, sf_dir, "lineitem")
    return (
        rebalance_if_undersplit(
            li.filter(
                F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp_ntz")
            ),
            F.col("l_extendedprice"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec2("l_quantity"), "sum_qty"),
            dsum(dec2("l_extendedprice"), "sum_base_price"),
            dsum(disc_price(), "sum_disc_price", 6),
            dsum(charge(), "sum_charge", 10),
            davg(dec2("l_quantity"), "avg_qty"),
            davg(dec2("l_extendedprice"), "avg_price"),
            davg(dec4("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q22_sql_entry_subquery",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
""",
    tags=("sql", "subquery"),
)
def q22_sql_entry_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql() entry path with scalar + IN subqueries. The reference
    funnels *all* execution through spark.sql (create_iceberg_tables.py:151,
    test_iceberg.py:86) — this query keeps that interface first-class,
    and exercises Catalyst's subquery decorrelation (SURVEY §4.2): the
    scalar subquery becomes a broadcast, the IN becomes a semi-join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer_v
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
          AND c_nationkey IN (SELECT n_nationkey FROM nation_v WHERE n_regionkey = 2)
        """
    )


@register(
    "q23_projection",
    oracle=f"""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(CAST({SQL_DISC_PRICE} AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
  CAST(CAST(CAST(l_quantity AS DECIMAL(10,2)) * CAST(l_extendedprice AS DECIMAL(10,2))
            AS DECIMAL(38,4)) AS VARCHAR) AS qty_value,
  upper(l_returnflag) AS flag_upper
FROM lineitem
""",
    tags=("projection",),
)
def q23_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select + aliasing + computed columns (#23). Pure map-side
    narrow plan; ReadSchema should list only the 6 referenced columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dec_out(disc_price(), "revenue", 6),
        dec_out(dec2("l_quantity") * dec2("l_extendedprice"), "qty_value", 4),
        F.upper("l_returnflag").alias("flag_upper"),
    )


@register(
    "q24_filter_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity >= 30.0
  AND l_discount > 0.02 AND l_discount < 0.08
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND NOT (l_returnflag = 'R')
""",
    tags=("filter",),
)
def q24_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean predicate filter (#24); all five predicates
    must appear in PushedFilters at the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30.0)
        & (F.col("l_discount") > 0.02)
        & (F.col("l_discount") < 0.08)
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & ~(F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "q25_null_semantics",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         nullif(o_orderstatus, 'O') AS status_or_null,
         o_totalprice
  FROM orders
)
SELECT
  o_orderkey,
  status_or_null,
  (status_or_null IS NULL) AS is_open,
  (status_or_null IS NOT DISTINCT FROM 'F') AS is_f_nullsafe,
  coalesce(status_or_null, 'OPEN') AS status_filled
FROM t
WHERE status_or_null IS NULL OR status_or_null IS NOT NULL
""",
    tags=("filter", "null"),
)
def q25_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics predicates (#25): isNull / isNotNull / eqNullSafe
    (`<=>`), with NULLs manufactured via nullif (fixtures are null-free)."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        "o_totalprice",
    )
    return t.filter(
        F.col("status_or_null").isNull() | F.col("status_or_null").isNotNull()
    ).select(
        "o_orderkey",
        "status_or_null",
        F.col("status_or_null").isNull().alias("is_open"),
        F.col("status_or_null").eqNullSafe(F.lit("F")).alias("is_f_nullsafe"),
        F.coalesce("status_or_null", F.lit("OPEN")).alias("status_filled"),
    )


@register(
    "q26_in_between_like",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_acctbal BETWEEN 0.0 AND 8000.0
  AND c_name LIKE 'Customer%'
  AND regexp_matches(c_name, '[0-9]$')
""",
    tags=("filter",),
)
def q26_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / RLIKE predicates (#26)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(0.0, 8000.0)
        & F.col("c_name").like("Customer%")
        & F.col("c_name").rlike("[0-9]$")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "q27_conditional_expr",
    oracle="""
SELECT
  o_orderkey,
  CASE WHEN o_totalprice >= 300000 THEN 'high'
       WHEN o_totalprice >= 100000 THEN 'mid'
       ELSE 'low' END AS price_band,
  coalesce(nullif(o_orderpriority, '1-URGENT'), 'TOP') AS priority_or_top,
  CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS finished_price
FROM orders
""",
    tags=("projection", "conditional"),
)
def q27_conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions (#27): when/otherwise, coalesce, nullif."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("1-URGENT")), F.lit("TOP")).alias(
            "priority_or_top"
        ),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(0.0)
        .alias("finished_price"),
    )
