"""Link-graph analytics over DataFrames — PageRank-style importance
propagation, the standard web-crawl curation signal (host authority →
document quality prior) and a general supplier/entity-importance tool.

Scale story: each power-iteration round is one equi-join of the edge
list with the current rank vector plus one hash aggregation on the
destination key — the same shuffle budget as one groupBy per round,
never an all-pairs anything. The edge list is repartitioned on ``src``
once up front so every round's join reuses that exchange; only the
(|nodes|-sized) rank vector reshuffles per round. ``localCheckpoint``
after every round cuts the lineage chain, which would otherwise grow
linearly and blow up the planner (the iterative-algorithm tax in
Spark; same pattern as dedup.connected_components). Dangling-node mass
(nodes with no out-links) is folded back uniformly each round via one
scalar aggregate, so ranks stay a proper distribution.

Convention: ranks sum to |nodes| (the "mean rank = 1" formulation),
matching the original PageRank paper's random-surfer stationary
distribution scaled by N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 15,
    tol: float = 1e-4,
) -> DataFrame:
    """PageRank over a directed edge list (``src``, ``dst``) →
    (node, rank). Stops early when total absolute rank change < tol·N.
    """
    edges = (
        edges.select("src", "dst").distinct().repartition("src").localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # src-side state reused every round: (node, deg) with deg NULL = dangling
    state = nodes.join(outdeg, nodes.node == outdeg.src, "left").select(
        "node", "deg"
    ).repartition("node").localCheckpoint(eager=True)
    ranks = state.select("node", F.lit(1.0).alias("rank"))
    for _ in range(max_iter):
        with_deg = ranks.join(state.select("node", "deg"), "node")
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            edges.join(with_deg.filter(F.col("deg").isNotNull()), edges.src == F.col("node"))
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            ranks.join(contribs, ranks.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta < tol * n:
            break
    return ranks


@register(
    "q119_supplier_pagerank",
    oracle=None,  # iterative fixpoint — no single SQL equivalent; invariants in tests/test_graph.py
    tags=("graph",),
)
def q119_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier importance in the customer→supplier purchase graph
    (edge = customer bought from supplier, via orders⋈lineitem): the
    stationary random-surfer distribution surfaces suppliers reachable
    from many distinct customers, not just high-volume ones. Top 20 by
    rank; rank rounded to 4 (iterative float sums are order-dependent
    at ulp level — rounding makes reruns stable)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            # offset supplier ids into their own node-id space
            (F.col("l_suppkey") + F.lit(10_000_000)).alias("dst"),
        )
    )
    pr = pagerank(edges, max_iter=8)
    return (
        pr.filter(F.col("node") > 10_000_000)
        .select(
            (F.col("node") - 10_000_000).alias("s_suppkey"),
            F.round("rank", 4).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), F.col("s_suppkey"))
        .limit(20)
    )
