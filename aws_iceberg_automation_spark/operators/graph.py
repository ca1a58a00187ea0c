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

from pyspark.sql import DataFrame, SparkSession, Window
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


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected edge list (``x``,
    ``y``) → (node, n_triangles).

    Degree-orientation (compact-forward) algorithm: orient every edge
    from the endpoint with smaller (degree, id) to the larger, then
    count wedges src→{d1, d2} closed by an oriented edge d1→d2. Each
    triangle is found exactly once, and — the scale property — every
    node's OUT-degree in the oriented graph is O(√m) regardless of its
    raw degree, so the wedge self-join is bounded even on power-law
    graphs where a hub's raw-degree wedge count would be quadratic.
    Three shuffles total (degree agg, wedge join, closing join); no
    iteration.

    Lineage control: the normalized edge list and the oriented edge
    list are each consumed by MULTIPLE downstream subtrees (degrees ×2,
    rank join; wedge arms ×2, closing join). Without truncation Spark
    re-derives the whole upstream plan — including whatever expensive
    join produced ``edges`` — once per reference (~274 Exchange nodes
    observed on the co-purchase graph, see PLANS.md genesis), and
    exchange reuse cannot collapse them because each arm projects
    differently. ``localCheckpoint`` at both fan-out points pins the
    materialized edge lists, the same pattern ``pagerank`` and
    ``connected_components`` use per iteration."""
    e = (
        edges.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ranked = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_dst"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("id_dst"),
    ).localCheckpoint()
    o1 = oriented.select("src", F.col("dst").alias("d1"),
                         F.col("deg_dst").alias("deg1"), F.col("id_dst").alias("id1"))
    o2 = oriented.select("src", F.col("dst").alias("d2"),
                         F.col("deg_dst").alias("deg2"), F.col("id_dst").alias("id2"))
    wedges = o1.join(o2, "src").filter(
        (F.col("deg1") < F.col("deg2"))
        | ((F.col("deg1") == F.col("deg2")) & (F.col("id1") < F.col("id2")))
    )
    closing = oriented.select(
        F.col("src").alias("d1"), F.col("dst").alias("d2")
    )
    tris = wedges.join(closing, ["d1", "d2"]).select("src", "d1", "d2")
    corners = (
        tris.select(F.col("src").alias("node"))
        .unionAll(tris.select(F.col("d1").alias("node")))
        .unionAll(tris.select(F.col("d2").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


@register(
    "q135_triangle_count",
    oracle="""
WITH cs0 AS (
  SELECT DISTINCT o.o_custkey c, l.l_suppkey s, CAST(l.l_shipdate AS DATE) d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), cs AS (
  SELECT c, s, d FROM (
    SELECT c, s, d,
      row_number() OVER (PARTITION BY s, d ORDER BY c) AS grp_rn
    FROM cs0)
  WHERE grp_rn <= 64
), e AS (
  SELECT DISTINCT a.c AS x, b.c AS y
  FROM cs a JOIN cs b ON a.s = b.s AND a.d = b.d AND a.c < b.c
), t AS (
  SELECT e1.x AS u, e1.y AS v, e2.y AS w
  FROM e e1
  JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
  JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
), corners AS (
  SELECT u AS node FROM t UNION ALL SELECT v FROM t UNION ALL SELECT w FROM t
), counts AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM corners GROUP BY node
)
SELECT node, n_triangles, rk FROM (
  SELECT node, n_triangles,
    row_number() OVER (ORDER BY n_triangles DESC, node) AS rk
  FROM counts)
WHERE rk <= 50
""",
    tags=("graph",),
)
def q135_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the customer co-purchase graph (edge =
    two customers bought from the same supplier with the same ship
    date): the clustering/community-density primitive. The engine side
    runs the degree-oriented algorithm (out-degree bounded at O(√m) —
    survives power-law hubs); the oracle recounts by brute id-ordered
    3-way self-join — a hash match proves the orientation loses/dupes
    no triangle. Top-50 nodes by count.

    Edge-generation skew cap: a popular (supplier, ship-date) group
    with n co-buyers emits C(n,2) edges — unbounded, this is the one
    quadratic term in the pipeline (the round-3 20× probe hit it at
    694 s through an artificially dense replica). Groups are capped at
    their 64 smallest custkeys (deterministic, mirrored exactly in the
    oracle — same discipline as the LSH bucket_cap and the q168 basket
    cap), bounding edge output at groups·C(64,2); the fixture's groups
    are far below the cap, so fixture results are the uncapped truth."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_suppkey").alias("s"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
        .distinct()
    )
    from ..functions.ranking import cap_groups

    cs = cap_groups(cs0, ["s", "d"], [F.col("c")], 64)
    a, b = cs.alias("ga"), cs.alias("gb")
    edges = (
        a.join(
            b,
            (F.col("ga.s") == F.col("gb.s"))
            & (F.col("ga.d") == F.col("gb.d"))
            & (F.col("ga.c") < F.col("gb.c")),
        )
        .select(F.col("ga.c").alias("x"), F.col("gb.c").alias("y"))
        .distinct()
    )
    counts = triangle_count(edges)
    from ..functions.ranking import topn_ranked

    # Pre-bound top-50 (TakeOrderedAndProject) ranked windowlessly — never
    # every node's count on one task.
    return topn_ranked(
        counts, [F.col("n_triangles").desc(), F.col("node")], 50
    ).select("node", "n_triangles", "rk")
