"""Unit tests for the round-8 operators — closed-form and differential
expectations the sf-fixture oracle gate can't pin by itself: FIFO's
prefix-decomposition vs a genuinely sequential reference, the BOM
arithmetic explode vs an iterative join closure, Bloom's zero-false-
negative contract, bitemporal transaction-time isolation, the spatial
grid join vs in-engine brute force, and the scrambled-replay /
quantile-measure guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def test_fifo_allocation_matches_sequential_reference(spark):
    """q353's closed form (filled = clamp(budget − cum_before, 0, qty))
    must equal a literal per-supplier sequential walk — the claim that
    FIFO-with-fixed-budget is prefix-decomposable, checked row by row
    on the real fixture."""
    from aws_iceberg_automation_spark.functions.compat import epoch_secs
    from aws_iceberg_automation_spark.io import load_table

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("q"),
            epoch_secs("l_shipdate").alias("es"),
        )
        .collect()
    )
    from collections import defaultdict

    per_supp = defaultdict(list)
    for r in li:
        per_supp[r.l_suppkey].append(r)
    want = {}
    for s, rows in per_supp.items():
        rows.sort(key=lambda r: (r.es, r.l_orderkey, r.l_linenumber))
        budget, full, partial, unfilled, units = 500, 0, 0, 0, 0
        for r in rows:
            take = max(0, min(r.q, budget))
            budget -= take
            units += take
            if take == r.q:
                full += 1
            elif take > 0:
                partial += 1
            else:
                unfilled += 1
        want[s] = (len(rows), full, partial, unfilled, units)
    got = {
        r.s_suppkey: (r.n_lines, r.n_full, r.n_partial, r.n_unfilled,
                      r.units_filled)
        for r in SPECS["q353_fifo_allocation"].fn(spark, SF_DIR).collect()
    }
    assert got == want
    # non-vacuous: the budget actually binds somewhere
    assert any(v[3] > 0 or v[2] > 0 for v in want.values())


def test_bom_explode_equals_iterative_closure(spark):
    """q356's arithmetic ancestor explode must equal the generic
    iterative parent-join closure (the path a non-arithmetic hierarchy
    would take) — same rollup, two derivations."""
    from aws_iceberg_automation_spark.io import load_table

    p = load_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("node"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    # iterative closure: (anc, node) pairs by walking parents
    pairs = p.select(F.col("node").alias("anc"), "node", "cents")
    frontier = pairs
    for _ in range(8):
        frontier = (
            frontier.filter(F.col("anc") >= 10)
            .select((F.col("anc") / 10).cast("bigint").alias("anc"),
                    "node", "cents")
        )
        if frontier.isEmpty():
            break
        pairs = pairs.unionAll(frontier)
    roll = (
        pairs.groupBy("anc")
        .agg(
            F.count(F.lit(1)).alias("n_desc"),
            F.sum("cents").alias("subtree_cents"),
        )
        .filter(F.col("n_desc") >= 2)
    )
    want = {
        r.anc: (r.n_desc, r.subtree_cents) for r in roll.collect()
    }
    got_full = SPECS["q356_bom_explosion"].fn(spark, SF_DIR).collect()
    for r in got_full:  # top-25 of the same rollup
        assert want[r.node] == (r.n_desc, r.subtree_cents), r
    assert got_full  # non-vacuous


def test_bloom_semijoin_never_drops_true_members(spark):
    """The Bloom contract: every true member passes (n_pass ≥ n_true),
    and the measured FPR sits under the theory-derived bound."""
    row = SPECS["q345_bloom_semijoin"].fn(spark, SF_DIR).collect()[0]
    assert row.n_pass >= row.n_true
    assert row.fpr_ok
    assert 0 < row.n_true < row.n_probe  # census is non-degenerate


def test_bitemporal_hides_later_transaction_commits(spark):
    """q373 reads the dimension AS OF transaction v2 — commit 3's
    +100 corrections must be invisible even though their valid dates
    match, and both pre/post-1996 rating regimes must appear (the
    valid-time axis is exercised, not just the transaction axis)."""
    rows = SPECS["q373_bitemporal_asof"].fn(spark, SF_DIR).collect()
    ratings = {r.rating for r in rows}
    assert all(r < 100 for r in ratings), ratings  # tx v3 invisible
    assert any(r >= 10 for r in ratings)  # the 1996 uplift applied
    assert any(r < 5 for r in ratings)  # base regime present
    from aws_iceberg_automation_spark.io import load_table

    n_li = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r.n_lines for r in rows) == n_li  # no fact dropped


def test_geo_grid_join_equals_brute_force(spark):
    """The 9-cell grid decomposition must find exactly the pairs the
    O(n²) brute force finds — border pairs included (the failure mode
    of a naive same-cell join)."""
    from aws_iceberg_automation_spark.functions.compat import portable_hash64
    from aws_iceberg_automation_spark.io import load_table

    c = load_table(spark, SF_DIR, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((portable_hash64(F.concat(F.col("c_custkey").cast("string"),
                                   F.lit("#gx"))) % 1000001) / 1000000.0
         ).alias("x"),
        ((portable_hash64(F.concat(F.col("c_custkey").cast("string"),
                                   F.lit("#gy"))) % 1000001) / 1000000.0
         ).alias("y"),
    ).collect()
    r2 = 0.02 * 0.02
    brute = sum(
        1
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
        if (a.x - b.x) ** 2 + (a.y - b.y) ** 2 <= r2
    )
    row = SPECS["q377_geo_grid_join"].fn(spark, SF_DIR).collect()[0]
    assert row.n_pairs == brute
    assert brute > 0  # non-vacuous at sf0.001


def test_scrambled_replay_refuses_vacuous_time_order(spark, tmp_path):
    """A single-chunk 'scramble' has no overlapping ranges to prove
    disorder with — the builder must refuse it rather than let the
    reorder differential silently verify nothing."""
    from aws_iceberg_automation_spark.streaming import jobs

    with pytest.raises(RuntimeError, match="vacuous"):
        jobs.prepare_scrambled_replay_dir(
            spark, SF_DIR, str(tmp_path / "one"), n_chunks=1
        )


def test_sample_quantile_rejects_non_sample_measures(spark, tmp_path):
    from aws_iceberg_automation_spark.matview import (
        IncrementalAggView,
        Measure,
    )
    from aws_iceberg_automation_spark.versioning import VersionedTable

    src = VersionedTable(spark, str(tmp_path / "src"))
    src.write(
        spark.range(10).select(
            F.lit("a").alias("k"), F.col("id").alias("rid"),
            F.col("id").alias("v")
        ),
        "append",
    )
    mv = IncrementalAggView(
        spark,
        src,
        str(tmp_path / "mv"),
        group_by=["k"],
        measures=[Measure("n", "count")],
    )
    mv.refresh()
    with pytest.raises(ValueError, match="not quantile_sample"):
        mv.sample_quantile("n", 50)


def test_fd_discovery_expectations(spark):
    """The key column must prove its keyness; the known non-keys must
    fail with non-zero violation counts — a profiler that calls
    everything an FD (or nothing) is broken either way."""
    rows = {
        r.candidate: r
        for r in SPECS["q364_fd_discovery"].fn(spark, SF_DIR).collect()
    }
    assert rows["o_orderkey -> o_custkey"].holds
    assert rows["o_orderkey -> o_orderstatus"].holds
    assert not rows["o_custkey -> o_orderstatus"].holds
    assert rows["o_custkey -> o_orderstatus"].n_violating_groups > 0


def test_half_plane_offsets_tile_all_neighbor_directions():
    """The q377 probe set's correctness precondition, proven directly:
    the nonzero half-plane offsets plus their negations must cover all
    8 neighbor directions exactly once (any overlap double-counts a
    pair; any gap drops one)."""
    f = {(0, 0), (1, 0), (0, 1), (1, 1), (1, -1)}
    nonzero = f - {(0, 0)}
    neg = {(-dx, -dy) for dx, dy in nonzero}
    assert nonzero | neg == {
        (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    } - {(0, 0)}
    assert not (nonzero & neg)
