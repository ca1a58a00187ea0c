"""Differential tests for functions/ranking: the distributed,
WindowExec-free decompositions must reproduce their single-partition
window oracles EXACTLY — ranks, tiles, prefix sums, and top-n — on
adversarial value distributions (ties, skew, negatives, constants)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.functions.ranking import (
    global_ntile,
    global_row_number,
    partitioned_prefix_sums,
    topn_ranked,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """600 rows: heavy ties (v in 0..9 for most), a skew spike, and
    negatives — the distributions that break naive bucketing."""
    return (
        spark.range(600)
        .select(
            F.col("id"),
            F.when(F.col("id") < 500, (F.col("id") % 10).cast("double"))
            .when(F.col("id") < 580, F.lit(7.0))  # spike on one value
            .otherwise(-(F.col("id").cast("double")))  # negative tail
            .alias("v"),
        )
    )


def test_global_row_number_matches_window(skewed):
    got = global_row_number(skewed, F.col("v"), [F.col("id")], n_buckets=8)
    w = Window.orderBy("v", "id")
    want = skewed.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert sorted(map(tuple, got.select("id", "v", "rk").collect())) == sorted(
        map(tuple, want.select("id", "v", "rk").collect())
    )


@pytest.mark.parametrize("k", [3, 10, 20])
def test_global_ntile_matches_window(skewed, k):
    got = global_ntile(skewed, F.col("v"), [F.col("id")], k, n_buckets=8)
    w = Window.orderBy("v", "id")
    want = skewed.withColumn("bucket", F.ntile(k).over(w))
    assert sorted(map(tuple, got.select("id", "bucket").collect())) == sorted(
        map(tuple, want.select("id", "bucket").collect())
    )


def test_global_ntile_fewer_rows_than_tiles(spark):
    small = spark.range(4).select("id", F.col("id").cast("double").alias("v"))
    got = global_ntile(small, F.col("v"), [F.col("id")], 10, n_buckets=4)
    w = Window.orderBy("v", "id")
    want = small.withColumn("bucket", F.ntile(10).over(w))
    assert sorted(map(tuple, got.select("id", "bucket").collect())) == sorted(
        map(tuple, want.select("id", "bucket").collect())
    )


def test_partitioned_prefix_sums_matches_window(spark):
    # unique values per row (the helper's precondition — 199 rows with
    # a multiplier coprime to 199, so id*37 % 199 is a bijection), two
    # sum columns
    df = spark.range(199).select(
        (F.col("id") * 37 % 199).cast("double").alias("val"),
        (F.col("id") % 5).alias("a"),
        (F.col("id") % 3).alias("b"),
    )
    got = partitioned_prefix_sums(df, F.col("val"), ["a", "b"], n_buckets=8)
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "val",
        F.sum("a").over(w).alias("cum_a"),
        F.sum("b").over(w).alias("cum_b"),
    )
    assert sorted(
        map(tuple, got.select("val", "cum_a", "cum_b").collect())
    ) == sorted(map(tuple, want.select("val", "cum_a", "cum_b").collect()))


def test_topn_ranked_matches_window(skewed):
    got = topn_ranked(skewed, [F.col("v").desc(), F.col("id")], 25)
    w = Window.orderBy(F.col("v").desc(), "id")
    want = (
        skewed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 25)
    )
    assert sorted(map(tuple, got.select("id", "v", "rk").collect())) == sorted(
        map(tuple, want.select("id", "v", "rk").collect())
    )


def test_no_single_partition_window_in_plans(skewed):
    # topn_ranked is fully windowless
    top = topn_ranked(skewed, [F.col("v").desc(), F.col("id")], 25)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # the rank/tile/prefix decompositions use windows, but every one is
    # PARTITIONED (by _bucket) — a windowspecdefinition with an empty
    # partition list would print no partition columns before the sort spec
    for frame in (
        global_row_number(skewed, F.col("v"), [F.col("id")], n_buckets=8),
        global_ntile(skewed, F.col("v"), [F.col("id")], 10, n_buckets=8),
        partitioned_prefix_sums(
            skewed.select(
                F.col("id").cast("double").alias("val"), F.lit(1).alias("c")
            ),
            F.col("val"),
            ["c"],
            n_buckets=8,
        ),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition" in line:
                assert "windowspecdefinition(_bucket" in line, line


def test_grouped_row_number_matches_window(skewed):
    """grouped_row_number must equal row_number() PARTITION BY group on
    the same adversarial distribution, split into 3 uneven groups."""
    from aws_iceberg_automation_spark.functions.ranking import (
        grouped_row_number,
    )

    g = skewed.withColumn(
        "grp",
        F.when(F.col("id") % 7 == 0, "a")
        .when(F.col("id") % 3 == 0, "b")
        .otherwise("c"),
    )
    got = grouped_row_number(
        g, ["grp"], F.col("v"), [F.col("id")], n_buckets=8
    )
    w = Window.partitionBy("grp").orderBy("v", "id")
    want = g.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert sorted(
        map(tuple, got.select("grp", "id", "v", "rk").collect())
    ) == sorted(map(tuple, want.select("grp", "id", "v", "rk").collect()))


def test_grouped_row_number_single_row_groups(spark):
    """Degenerate groups (one row each) all rank 1."""
    from aws_iceberg_automation_spark.functions.ranking import (
        grouped_row_number,
    )

    df = spark.createDataFrame(
        [("a", 5.0, 1), ("b", -2.0, 2), ("c", 0.0, 3)], "grp string, v double, id int"
    )
    got = grouped_row_number(df, ["grp"], F.col("v"), [F.col("id")])
    assert {(r.grp, r.rk) for r in got.collect()} == {
        ("a", 1), ("b", 1), ("c", 1)
    }


def test_grouped_row_number_null_group_kept(spark):
    """A NULL group key is a real group (PARTITION BY semantics): its
    rows must rank 1..n, not silently vanish (review finding r4)."""
    from aws_iceberg_automation_spark.functions.ranking import (
        grouped_row_number,
    )

    df = spark.createDataFrame(
        [(None, 1.0, 1), (None, 2.0, 2), ("a", 3.0, 3)],
        "grp string, v double, id int",
    )
    got = {(r.grp, r.id): r.rk for r in grouped_row_number(
        df, ["grp"], F.col("v"), [F.col("id")]).collect()}
    assert got == {(None, 1): 1, (None, 2): 2, ("a", 3): 1}
