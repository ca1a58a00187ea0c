"""PageRank invariants (no SQL oracle for an iterative fixpoint):
known closed-form graphs must come out exact, mass must be conserved,
and the registered supplier query must behave like a distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.operators.graph import pagerank
from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_cycle_is_uniform(spark):
    """On a directed cycle every node is symmetric → rank exactly 1."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    got = {r.node: r.rank for r in pagerank(e, max_iter=20).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in got.values()), got


def test_star_center_dominates_and_mass_conserved(spark):
    """Star graph: all leaves point at the hub. Hub rank must dominate;
    total rank must stay ~N (dangling hub mass recycled uniformly)."""
    leaves = list(range(2, 12))
    e = _edges(spark, [(i, 1) for i in leaves])
    got = {r.node: r.rank for r in pagerank(e, max_iter=30, tol=1e-8).collect()}
    n = len(got)
    assert abs(sum(got.values()) - n) < 1e-3
    hub = got[1]
    assert all(hub > 3 * got[leaf] for leaf in leaves)
    # leaves are symmetric → identical ranks
    leaf_ranks = [got[leaf] for leaf in leaves]
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-9


def test_matches_dense_power_iteration(spark):
    """Differential check vs a numpy reference on a small random-ish
    digraph (fixed edge list, not random at test time)."""
    np = pytest.importorskip("numpy")
    pairs = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (4, 0), (4, 3),
        (5, 0), (1, 5),
    ]
    e = _edges(spark, pairs)
    got = {r.node: r.rank for r in pagerank(e, max_iter=60, tol=1e-12).collect()}

    n, d = 6, 0.85
    M = np.zeros((n, n))
    for s, t in pairs:
        M[t, s] = 1.0
    deg = M.sum(axis=0)
    r = np.ones(n)
    for _ in range(60):
        contrib = np.zeros(n)
        dangling = 0.0
        for s in range(n):
            if deg[s] > 0:
                contrib += M[:, s] * (r[s] / deg[s])
            else:
                dangling += r[s]
        r = (1 - d) + d * (contrib + dangling / n)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-6, (i, got[i], r[i])


def test_supplier_pagerank_query_shape(spark):
    spec = all_specs()["q119_supplier_pagerank"]
    rows = spec.fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20  # sf0.001 has fewer than 20 suppliers
    assert all(r.rank_fp > 0 for r in rows)
    ranks = [r.rank_fp for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_fixedpoint_pagerank_tracks_float_pagerank(spark):
    """The oracle-checkable fixed-point iteration and the float API
    must agree: same graph, 8 rounds each, |fp/1e12 − float| < 1e-6
    per node (integer truncation bias is ≤8e-12)."""
    from aws_iceberg_automation_spark.operators.graph import (
        pagerank_fixedpoint,
    )

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)], ["src", "dst"]
    )
    fp = {
        r.node: r.r / 1e12
        for r in pagerank_fixedpoint(e, iters=8).collect()
    }
    fl = {
        r.node: r.rank
        for r in pagerank(e, max_iter=8, tol=0.0).collect()
    }
    assert fp.keys() == fl.keys()
    for k in fp:
        assert abs(fp[k] - fl[k]) < 1e-6, (k, fp[k], fl[k])


def test_triangle_count_closed_forms(spark):
    from aws_iceberg_automation_spark.operators.graph import triangle_count

    # K5: every node sits in C(4,2) = 6 triangles.
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    out = dict(
        (r.node, r.n_triangles)
        for r in triangle_count(
            spark.createDataFrame(k5, ["x", "y"])
        ).collect()
    )
    assert out == {i: 6 for i in range(5)}

    # path graph (0-1-2-3): no triangles at all
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["x", "y"])
    assert triangle_count(path).count() == 0

    # duplicate / reversed / self-loop edges must not change the answer
    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1)], ["x", "y"]
    )
    out = {r.node: r.n_triangles for r in triangle_count(messy).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_checkpoint_modes_identical(spark):
    """VERDICT r09 ask #3: the reliable-checkpoint option must be a
    durability change ONLY — PageRank over an asymmetric graph must be
    bit-identical under checkpointMode local vs reliable (every
    lineage cut in graph/dedup routes through functions/ckpt.py)."""
    from aws_iceberg_automation_spark.functions.ckpt import MODE_CONF

    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 1), (1, 6)],
    )
    def run():
        return {
            r.node: r.rank for r in pagerank(e, max_iter=12).collect()
        }

    spark.conf.set(MODE_CONF, "local")
    local = run()
    try:
        spark.conf.set(MODE_CONF, "reliable")
        reliable = run()
    finally:
        spark.conf.set(MODE_CONF, "local")
    assert local == reliable  # exact float equality, not approx
    assert spark.sparkContext.getCheckpointDir() is not None

    spark.conf.set(MODE_CONF, "bogus")
    try:
        with pytest.raises(ValueError, match="checkpointMode"):
            run()
    finally:
        spark.conf.set(MODE_CONF, "local")
