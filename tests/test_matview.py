"""Incremental materialized-view maintenance: after any sequence of
source appends + refreshes, the view state must equal the from-scratch
aggregate of the full source — and an incremental refresh must read
only the delta window, not the whole table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.matview import IncrementalAggView, Measure
from aws_iceberg_automation_spark.versioning import VersionedTable


def _rows(spark, lo, hi, keys=("a", "b", None)):
    return spark.range(lo, hi).select(
        F.element_at(
            F.array(*[F.lit(k) for k in keys]), (F.col("id") % len(keys) + 1).cast("int")
        ).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


@pytest.fixture()
def view(spark, tmp_path):
    src = VersionedTable(spark, str(tmp_path / "src"))
    mv = IncrementalAggView(
        spark,
        src,
        str(tmp_path / "mv"),
        group_by=["k"],
        measures=[
            Measure("total", "sum", F.col("v").cast("decimal(18,2)")),
            Measure("n", "count"),
            Measure("lo", "min", F.col("v")),
            Measure("hi", "max", F.col("v")),
        ],
    )
    return src, mv


def _expect(spark, src):
    return {
        (r.k): (float(r.total), r.n, r.lo, r.hi)
        for r in src.read()
        .groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def _got(mv):
    return {
        (r.k): (float(r.total), r.n, r.lo, r.hi) for r in mv.read().collect()
    }


def test_refresh_matches_full_recompute_across_appends(spark, view):
    src, mv = view
    src.write(_rows(spark, 0, 100))
    mv.refresh()
    assert _got(mv) == _expect(spark, src)

    src.write(_rows(spark, 100, 180), mode="append")
    src.write(_rows(spark, 180, 300), mode="append")
    mv.refresh()  # one refresh covering two appended versions
    assert _got(mv) == _expect(spark, src)
    # NULL is a real group and must merge correctly
    assert None in _got(mv)


def test_refresh_is_incremental_and_idempotent(spark, view):
    src, mv = view
    src.write(_rows(spark, 0, 100))
    mv.refresh()
    assert mv.staleness() == 0
    assert mv.refresh() is None  # fresh → no-op, no new snapshot

    src.write(_rows(spark, 100, 150), mode="append")
    assert mv.staleness() == 1
    # the incremental path must scan only the delta window's files
    delta = src.changes(mv.last_refreshed_source_version())
    assert delta.count() == 50
    assert len(delta.inputFiles()) < len(src.read().inputFiles())
    mv.refresh()
    assert _got(mv) == _expect(spark, src)
    assert mv.last_refreshed_source_version() == src.current_version()


def test_rewrite_in_window_falls_back_to_rebuild(spark, view):
    src, mv = view
    src.write(_rows(spark, 0, 100))
    mv.refresh()
    src.write(_rows(spark, 100, 150), mode="append")
    src.delete_where("v = 3.0")  # rewrite commit — delta window invalid
    mv.refresh()
    assert _got(mv) == _expect(spark, src)
    assert mv.staleness() == 0
