"""Set operations (SURVEY.md §2.8 #61-64).

UNION ALL is a zero-shuffle concatenation of children; the distinct
variants add one hash-aggregate shuffle; INTERSECT/EXCEPT [ALL] plan as
aggregate+join under the hood. At 100 TB: prefer unionByName (schema
drift safety), and push filters into each branch — Catalyst propagates
them through Union children automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def _buyers_and_suppliers(spark: SparkSession, sf_dir: str):
    """Two union-compatible projections: nations of high-balance
    customers vs nations of suppliers."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    s = load_table(spark, sf_dir, "supplier")
    left = c.select(F.col("c_nationkey").alias("nationkey")).withColumn(
        "side", F.lit("customer")
    )
    right = s.select(F.col("s_nationkey").alias("nationkey")).withColumn(
        "side", F.lit("supplier")
    )
    return left, right


_SQL_LEFT = """
SELECT c_nationkey AS nationkey, 'customer' AS side
FROM customer WHERE c_acctbal > 5000.0
"""
_SQL_RIGHT = "SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier"


@register(
    "q61_union_all",
    oracle=f"SELECT * FROM ({_SQL_LEFT}) UNION ALL ({_SQL_RIGHT})",
    tags=("setop",),
)
def q61_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (#61) via unionByName — positional union is a schema-
    drift footgun on wide production tables."""
    left, right = _buyers_and_suppliers(spark, sf_dir)
    return left.unionByName(right)


@register(
    "q62_union_distinct",
    oracle=f"SELECT DISTINCT nationkey FROM (({_SQL_LEFT}) UNION ALL ({_SQL_RIGHT}))",
    tags=("setop",),
)
def q62_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct (#62): concatenate then one hash-distinct."""
    left, right = _buyers_and_suppliers(spark, sf_dir)
    return (
        left.select("nationkey").unionByName(right.select("nationkey")).distinct()
    )


@register(
    "q61b_union_by_name_missing",
    oracle="""
SELECT c_nationkey AS nationkey, c_acctbal AS balance, 'customer' AS side
FROM customer WHERE c_acctbal > 5000.0
UNION ALL
SELECT s_nationkey AS nationkey, NULL AS balance, 'supplier' AS side FROM supplier
""",
    tags=("setop",),
)
def q61b_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) (#61): schema-drift-safe
    union — the absent column nulls in, by name, not by position."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    s = load_table(spark, sf_dir, "supplier")
    left = c.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("side"),
    )
    right = s.select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return left.unionByName(right, allowMissingColumns=True)


@register(
    "q63b_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def q63b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (#63): bag semantics — multiplicity = min of the
    two sides' counts."""
    left, right = _buyers_and_suppliers(spark, sf_dir)
    return left.select("nationkey").intersectAll(right.select("nationkey"))


@register(
    "q64b_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def q64b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (#64): bag difference — copies beyond the right side's
    per-key count survive (contrast with q64's distinct EXCEPT)."""
    left, right = _buyers_and_suppliers(spark, sf_dir)
    return left.select("nationkey").exceptAll(right.select("nationkey"))


@register(
    "q63_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
INTERSECT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def q63_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (#63): nations having both rich customers and any
    supplier. (intersectAll preserves multiplicity when needed.)"""
    left, right = _buyers_and_suppliers(spark, sf_dir)
    return left.select("nationkey").intersect(right.select("nationkey"))


@register(
    "q64_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000.0
""",
    tags=("setop",),
)
def q64_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / subtract (#64): customer nations with no HIGH-BALANCE
    supplier presence. The right side is filtered (s_acctbal > 8000)
    because every nation has some supplier — the unfiltered difference
    was the empty set, a vacuous oracle comparison that exercised
    nothing. (exceptAll exists for bag semantics — not equivalent:
    bag difference keeps rows whose left-count exceeds right-count.)"""
    left, _ = _buyers_and_suppliers(spark, sf_dir)
    rich_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000.0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return left.select("nationkey").subtract(rich_supp)
