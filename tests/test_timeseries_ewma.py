"""EWMA grouped-map kernel: closed-form recursion check on a tiny
hand-computable series, multi-key independence, and single-row groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.operators.timeseries import ewma


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # key, seq, x
        ("a", 1, 10.0),
        ("a", 2, 20.0),
        ("a", 3, 30.0),
        ("b", 1, 5.0),
        ("b", 2, 5.0),
        ("c", 1, 7.5),
    ]
    return spark.createDataFrame(rows, "k string, seq int, x double")


def test_ewma_closed_form(spark, series):
    out = {
        (r.k, r.seq): r.ewma
        for r in ewma(series, "k", ["seq"], "x", alpha=0.5).collect()
    }
    # y1 = x1; y2 = .5*20 + .5*10 = 15; y3 = .5*30 + .5*15 = 22.5
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 15.0
    assert out[("a", 3)] == 22.5
    # constant series is a fixpoint
    assert out[("b", 1)] == 5.0 and out[("b", 2)] == 5.0
    # singleton group: y1 = x1
    assert out[("c", 1)] == 7.5


def test_ewma_keys_are_independent(spark, series):
    solo = ewma(
        series.filter(F.col("k") == "a"), "k", ["seq"], "x", alpha=0.5
    ).collect()
    both = [
        r
        for r in ewma(series, "k", ["seq"], "x", alpha=0.5).collect()
        if r.k == "a"
    ]
    assert sorted((r.seq, r.ewma) for r in solo) == sorted(
        (r.seq, r.ewma) for r in both
    )


def test_ewma_respects_order_columns(spark):
    # rows delivered out of order must be folded in `order` order
    shuffled = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, 20.0)],
        "k string, seq int, x double",
    )
    out = {r.seq: r.ewma for r in ewma(shuffled, "k", ["seq"], "x", 0.5).collect()}
    assert out == {1: 10.0, 2: 15.0, 3: 22.5}
