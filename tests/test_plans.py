"""Plan-shape guardrails (SURVEY §4): pushdown, pruning, join strategy,
shuffle counts — the properties that decide whether a query survives a
100× scale-up, asserted against the actual physical plans."""

from __future__ import annotations

import pytest

from aws_iceberg_automation_spark.plans.explain import (
    count_exchanges,
    has_operator,
    join_strategies,
    pushed_filters,
    read_schema_columns,
)
from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def q(name, spark):
    return SPECS[name].fn(spark, SF_DIR)


def test_flagship_pushdown_and_pruning(spark):
    df = q("q01_pricing_summary", spark)
    assert any("l_shipdate" in f for f in pushed_filters(df)), "filter not pushed to scan"
    cols = read_schema_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, (
        f"column pruning lost: reading {cols}"
    )
    assert len(cols) == 7


def test_filter_query_pushes_all_predicates(spark):
    df = q("q24_filter_predicates", spark)
    pushed = " ".join(pushed_filters(df))
    for col in ["l_quantity", "l_discount", "l_shipdate", "l_returnflag"]:
        assert col in pushed, f"{col} predicate not pushed: {pushed}"


def test_broadcast_dims_stay_broadcast(spark):
    for name in ["q32_broadcast_dim_join", "q37_star_join_revenue"]:
        strategies = join_strategies(q(name, spark))
        assert "SortMergeJoin" not in strategies or name == "q37_star_join_revenue", (
            f"{name}: dimension join degraded to {strategies}"
        )
        assert "BroadcastHashJoin" in strategies, f"{name}: no broadcast join: {strategies}"


def test_range_band_join_is_broadcast_nlj(spark):
    strategies = join_strategies(q("q33_range_band_join", spark))
    assert "BroadcastNestedLoopJoin" in strategies
    assert "CartesianProduct" not in strategies


def test_interval_join_is_hash_not_nlj(spark):
    strategies = join_strategies(q("q36_interval_join", spark))
    assert "BroadcastNestedLoopJoin" not in strategies, (
        f"bucketed interval join degraded to NLJ: {strategies}"
    )
    assert "CartesianProduct" not in strategies


def test_ann_lsh_join_is_equi_hash(spark):
    strategies = join_strategies(q("q83b_ann_lsh_topk", spark))
    assert "BroadcastNestedLoopJoin" not in strategies
    assert "CartesianProduct" not in strategies


def test_partition_local_sort_has_no_exchange(spark):
    assert count_exchanges(q("q57_partition_local_sort", spark)) == 0


def test_topk_uses_take_ordered(spark):
    assert has_operator(q("q59_topk_global", spark), "TakeOrderedAndProject")


def test_flagship_single_data_shuffle(spark):
    # one aggregate exchange + one tiny final-sort exchange, nothing else
    assert count_exchanges(q("q01_pricing_summary", spark)) <= 2


def test_partition_pruning_on_layout(spark, tmp_path_factory):
    """Day-partitioned layout (sources.write_partitioned) must prune:
    a day-filtered scan reads only matching partition dirs."""
    import pyspark.sql.functions as F

    from aws_iceberg_automation_spark.io import load_table
    from aws_iceberg_automation_spark.plans.explain import plan_string
    from aws_iceberg_automation_spark.sources.files import write_partitioned

    d = str(tmp_path_factory.mktemp("pruned"))
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    write_partitioned(ev, d, partition_by=["day"], sort_within=["ts"])
    scan = spark.read.parquet(d).filter(F.col("day") == "2024-01-05")
    p = plan_string(scan)
    assert "PartitionFilters" in p and "2024-01-05" in p
    assert scan.count() == ev.filter(F.col("day") == "2024-01-05").count()


def test_projection_is_scan_only(spark):
    df = q("q23_projection", spark)
    assert count_exchanges(df) == 0
    assert read_schema_columns(df) == {
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag",
    }
