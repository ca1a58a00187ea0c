"""Similarity search over embeddings (SURVEY.md §2.11 #83).

Two paths, same output shape:

- Exact brute-force cosine top-k: query set ⨯ corpus via broadcast
  nested-loop (query side broadcast — the corpus side streams), dot
  products as JVM folds, per-query row_number ≤ k. Correct baseline;
  O(|Q|·N) — fine when |Q| is small or N is oracle-scale.
- LSH-bucketed ANN: sign-random-projection (SRP) bucket keys computed
  with deterministic hash-derived hyperplanes, candidates = bucket
  collisions across probe permutations, exact re-rank inside buckets.
  At 100 TB: bucket key is a cheap map-side expression; the join is a
  hash join on (bucket), i.e. candidates ≪ N — this is the scale path.
  Recall tuning = more planes/probes; tests measure recall vs exact.

Ranking determinism: ranks order by cosine rounded to 6 then vec_id,
so engine-level 1-ulp drift cannot flip neighbor order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ranking import topn_ranked
from ..functions.vectors import cosine, dot
from ..io import load_table, rebalance_if_undersplit
from ..functions.ckpt import checkpoint_df
from ..registry import register

_N_QUERIES = 10
_TOP_K = 5


def _vec_dims(df: DataFrame, vec_col: str) -> int:
    """Dimensionality of ``vec_col`` read from one sample row.

    ``head(1)`` + explicit empty check: bare ``head()[0]`` on an empty
    table returns ``None`` and raises an opaque ``TypeError`` instead
    of the intended explanatory error (ADVICE r7, q172b)."""
    rows = df.select(vec_col).head(1)
    if not rows:
        raise ValueError(
            f"cannot infer vector dimensionality: input table is empty "
            f"(no rows in column {vec_col!r})"
        )
    return len(rows[0][0])


@register(
    "q83_cosine_topk_exact",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
    round(list_dot_product(q.qv, e.v)
          / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6)
      AS cosine
  FROM q JOIN e ON e.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, neighbor_label, cosine, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored)
WHERE rk <= {_TOP_K}
""",
    tags=("similarity", "llm", "vector", "bench"),
)
def q83_cosine_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k (#83 baseline): 10 query vectors vs the whole
    corpus; broadcast the small query side so the corpus never shuffles
    (at scale — locally the undersplit guard rebalances the single-task
    fixture scan so the |Q|·|corpus| cosine folds run on every core;
    guide §2.6, r10); TakeOrdered-style rank-filter per query."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    )
    scored = (
        F.broadcast(q)
        .join(
            rebalance_if_undersplit(e, F.col("vec_id")),
            F.col("vec_id") != F.col("q_id"),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOP_K
    )


def srp_bucket(v, planes: int = 12, seed: str = "srp") -> F.Column:
    """Sign-random-projection bucket key: ``planes`` pseudo-random
    hyperplanes with coefficients derived from xxhash64(seed, plane,
    dim) — deterministic, no stored model, computed map-side. Returns a
    LONG bucket id (one bit per plane)."""
    def coef(p: int, i):
        # uniform-ish in [-0.5, 0.5): engine-hash driven, stable across runs
        return (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(100003)).cast("double")
            / 100003.0
            - 0.5
        )

    def plane_bit(p: int):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: x.cast("double") * coef(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )

    # Unrolled over the (small, static) plane count: the Python shift
    # wrappers need literal shift amounts.
    bucket = plane_bit(0)
    for p in range(1, planes):
        bucket = bucket.bitwiseOR(plane_bit(p))
    return bucket


@register("q83b_ann_lsh_topk", oracle=None, tags=("similarity", "llm", "vector"))
def q83b_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via SRP-LSH bucketing (#83 scale path): join
    queries to corpus on bucket equality over independent hash tables
    (OR-amplification), exact cosine re-rank inside the candidate set.
    Rows-only check; pytest asserts mean recall ≥ 0.8 vs q83.

    Tuning math (p = 1 - θ/π per plane; recall = 1-(1-p^planes)^tables):
    the fixture corpus is near-orthogonal (top-1 cosine ≈ 0.33 ⇒
    p ≈ 0.61), so 3 planes × 8 tables gives ≈ 0.87 expected recall.
    Near-orthogonal data is LSH's worst case — hitting a recall floor
    there costs candidate-set size (2³ buckets/table ⇒ ~N/8 candidates
    per probe). On a real embedding corpus true neighbors sit at
    cosine ≥ 0.8 (p ≥ 0.80, p³ ≈ 0.52) while random pairs stay near
    p ≈ 0.5 (p³ ≈ 0.13): the same recall needs fewer tables *and*
    prunes harder — raise `planes` with corpus tightness."""
    n_tables, planes = 8, 3
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    # (table_id, bucket) rows: bucket membership becomes a plain equi-key
    # → hash join, not an OR-condition nested loop.
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                srp_bucket(F.col("v"), planes=planes, seed=f"srp{t}").alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    corpus = e.withColumn("tb", F.explode(buckets)).select(
        "vec_id", "label", "v", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )
    q = corpus.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        "t",
        "bucket",
    )
    cand = (
        F.broadcast(q)
        .join(corpus, ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", "vec_id", "label", "v")
        .distinct()  # a pair colliding in several tables re-ranks once
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= _TOP_K)


def spherical_kmeans(
    vectors: DataFrame,
    vec_col: str = "v",
    k: int = 16,
    max_iter: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """Distributed spherical k-means (the IVF coarse quantizer) in pure
    DataFrame ops — no MLlib model object, no driver-side data:

    - init: the k hash-least vectors (``orderBy(xxhash64).limit(k)`` =
      TakeOrdered — deterministic pseudo-random spread, no RNG state);
    - assign: broadcast the k centroids, nearest-by-cosine via a
      row_number window over the k candidates per vector;
    - update: per-cluster elementwise mean as ``dim`` codegen'd
      ``avg(v[i])`` aggregates (one hash agg, no explode — at 64 dims
      the shuffle row is k rows wide, nothing else), then re-normalize
      (spherical variant: mean direction is the cosine-optimal
      centroid).

    Each iteration is one broadcast join + one hash agg — at 100 TB the
    corpus streams twice per iteration and only k·dim doubles ever
    concentrate. Empty clusters drop out (k shrinks), which IVF
    tolerates. Returns (c_id, cv) with unit-norm cv."""
    from ..functions.vectors import normalize

    dim = _vec_dims(vectors, vec_col)
    nv = vectors.select("vec_id", normalize(F.col(vec_col)).alias("nv"))
    # seed selection by hash order, but c_id labels assigned in vec_id
    # order among the k survivors (the pre-refactor labeling — q107
    # exposes c_id in its output, so the mapping must stay stable)
    seeds = topn_ranked(
        nv.withColumn("_h", F.xxhash64(F.col("vec_id"), F.lit("kmeans-init"))),
        [F.col("_h"), F.col("vec_id")],
        k,
        rank_name="_hash_rk",
    ).drop("_h", "_hash_rk")
    cent = topn_ranked(seeds, [F.col("vec_id")], k, rank_name="c_id").select(
        "c_id", F.col("nv").alias("cv")
    )
    for _ in range(max_iter):
        # argmax by max_by instead of a row_number window: the N×k
        # scored rows collapse to N map-side (partial agg) before any
        # shuffle; ties break to the smallest c_id via the struct key
        assigned = (
            nv.join(F.broadcast(cent))
            .withColumn("_sim", dot(F.col("nv"), F.col("cv")))
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "c_id", F.struct(F.col("_sim"), (-F.col("c_id")).alias("_t"))
                ).alias("c_id"),
                F.any_value(F.col("nv")).alias("nv"),
            )
        )
        cent = assigned.groupBy("c_id").agg(
            *[F.avg(F.col("nv")[i]).alias(f"_d{i}") for i in range(dim)]
        ).select(
            "c_id",
            normalize(F.array(*[F.col(f"_d{i}") for i in range(dim)])).alias("cv"),
        )
        # k·dim doubles — cutting lineage here is bounded at any scale
        # and stops downstream consumers re-running every Lloyd pass
        # (checkpoint=False keeps the lazy plan for plan-shape tests)
        if checkpoint:
            cent = cent.transform(checkpoint_df)
    return cent


@register("q83d_ann_ivf_topk", oracle=None, tags=("similarity", "llm", "vector"))
def q83d_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (#83 alternative scale path): a spherical-k-means coarse
    quantizer (distributed Lloyd iterations, see spherical_kmeans),
    corpus partitioned by nearest centroid (inverted lists), queries
    probe their nprobe=3 closest lists, exact re-rank inside. The
    centroid table is tiny → broadcast at both assignment and probe;
    the candidate join is an equi-join on centroid id."""
    nprobe = 3
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    centroids = spherical_kmeans(e, "v", k=16, max_iter=2).select(
        "c_id", F.col("cv")
    )

    def nearest(df, vec_col, out, n):
        """n nearest centroids per row. n=1 goes through max_by (N×k
        collapses to N map-side, no window shuffle — the shape used for
        the full-corpus inverted-list assignment); n>1 keeps the
        row_number window (only the tiny query side needs it)."""
        key = df.columns[0]
        scored = df.join(F.broadcast(centroids)).withColumn(
            "_sim", cosine(F.col(vec_col), F.col("cv"))
        )
        if n == 1:
            others = [c for c in df.columns if c != key]
            return scored.groupBy(key).agg(
                F.max_by(
                    "c_id", F.struct(F.col("_sim"), (-F.col("c_id")).alias("_t"))
                ).alias(out),
                *[F.any_value(F.col(c)).alias(c) for c in others],
            )
        w = Window.partitionBy(key).orderBy(F.col("_sim").desc(), F.col("c_id"))
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("cv", "_sim", "_rk")
            .withColumnRenamed("c_id", out)
        )

    lists = nearest(e, "v", "list_id", 1)  # inverted-list assignment
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    probes = nearest(q, "qv", "list_id", nprobe)
    cand = (
        F.broadcast(probes)
        .join(lists, "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= _TOP_K)


@register(
    "q83e_topk_vectorized",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM e),
q AS (SELECT vec_id AS q_id, nv AS qv FROM n WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.q_id, n.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, n.nv), 6) AS cosine
  FROM q JOIN n ON n.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, cosine, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored)
WHERE rk <= {_TOP_K}
""",
    tags=("similarity", "llm", "vector"),
)
def q83e_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized brute-force top-k (#83 throughput path): the
    query matrix rides into every task as a broadcast numpy array; a
    mapInPandas kernel scores each Arrow batch with one matmul and
    emits only per-batch top-k candidates, which a final per-query rank
    reduces. Higher-order-function folds break whole-stage codegen and
    score one pair at a time — the matmul path is the 10-100× batch
    alternative.

    Oracle-backed since round 7 (VERDICT r06 ask #2, the q83f/q271
    playbook): the kernel selects each batch's survivors under the SAME
    total order the global rank and the oracle use — (round(cosine, 6)
    DESC, neighbor_id ASC) — so batch boundaries can't change the
    winner set, and the surfaced score is round(6) of a normalize-then-
    dot pipeline mirrored in DuckDB. The numpy matmul differs from the
    sequential fold only below ~1e-15; a flip would need a true cosine
    within fold-ulp of a half-ulp rounding boundary (none exists in
    the fixtures, and any future one surfaces as a hash mismatch, not
    silent wrongness — same accepted class as q83f's sign margins)."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    q_rows = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r.vec_id for r in q_rows])
    qm = np.array([r.embedding for r in q_rows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, qm))

    def score(batches):
        ids, qmat = bc.value
        for pdf in batches:
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            cand_ids = pdf["vec_id"].to_numpy()
            sims = np.round(qmat @ cm.T, 6)  # |Q| × batch, ranking key
            out = {"q_id": [], "neighbor_id": [], "cosine": []}
            # +1: self may occupy one slot (cosine 1.0, filtered later)
            k = min(_TOP_K + 1, sims.shape[1])
            for qi, q_id in enumerate(ids):
                # total order (rounded sim DESC, neighbor_id ASC) —
                # identical to the global rank, so per-batch pruning
                # is exact even across rounded-cosine ties
                top = np.lexsort((cand_ids, -sims[qi]))[:k]
                for ci in top:
                    out["q_id"].append(int(q_id))
                    out["neighbor_id"].append(int(cand_ids[ci]))
                    out["cosine"].append(float(sims[qi, ci]))
            yield pd.DataFrame(out)

    cand = e.select("vec_id", "embedding").mapInPandas(
        score, schema="q_id long, neighbor_id long, cosine double"
    ).filter(F.col("neighbor_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= _TOP_K)


@register(
    "q83c_dot_topk_normalized",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM e),
q AS (SELECT vec_id AS q_id, nv AS qv FROM n WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.q_id, n.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, n.nv), 6) AS dot_sim
  FROM q JOIN n ON n.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, dot_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dot_sim DESC, neighbor_id) AS rk
  FROM scored)
WHERE rk <= {_TOP_K}
""",
    tags=("similarity", "llm", "vector"),
)
def q83c_dot_topk_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-normalized dot-product top-k (#83): normalize once, then
    similarity is a plain dot — at scale you store normalized vectors
    and halve the arithmetic per candidate."""
    from ..functions.vectors import normalize

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", normalize(F.col("embedding")).alias("nv")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("nv").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("nv")), 6).alias("dot_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dot_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .drop("rk")
    )


@register(
    "q160_hybrid_rrf_search",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('spark', 'merge', 'vector') GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ('spark', 'merge', 'vector') GROUP BY term
), lex AS (
  SELECT doc_id, rk AS lex_rk FROM (
    SELECT tf.doc_id,
      row_number() OVER (
        ORDER BY round(SUM(
          ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
          * tf.tf * 2.2
          / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
        ), 6) DESC, tf.doc_id) AS rk
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id, stats.n_docs, stats.avgdl)
  WHERE rk <= 50
), e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), qv AS (
  SELECT v AS q FROM e WHERE vec_id = 0
), sem AS (
  SELECT vec_id AS doc_id, rk AS sem_rk FROM (
    SELECT e.vec_id,
      row_number() OVER (
        ORDER BY round(list_dot_product(qv.q, e.v)
          / (sqrt(list_dot_product(qv.q, qv.q))
             * sqrt(list_dot_product(e.v, e.v))), 6) DESC, e.vec_id) AS rk
    FROM e CROSS JOIN qv WHERE e.vec_id <> 0)
  WHERE rk <= 50
)
SELECT doc_id, lex_rk, sem_rk, rrf, rk FROM (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
    CAST(lex.lex_rk AS INTEGER) AS lex_rk,
    CAST(sem.sem_rk AS INTEGER) AS sem_rk,
    round(COALESCE(1.0 / (60 + lex.lex_rk), 0)
          + COALESCE(1.0 / (60 + sem.sem_rk), 0), 6) AS rrf,
    row_number() OVER (
      ORDER BY COALESCE(1.0 / (60 + lex.lex_rk), 0)
               + COALESCE(1.0 / (60 + sem.sem_rk), 0) DESC,
               COALESCE(lex.doc_id, sem.doc_id)) AS rk
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
WHERE rk <= 20
""",
    tags=("similarity", "text", "llm", "vector"),
)
def q160_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking (q129's scorer) and
    embedding cosine ranking (q83's scorer, query = vector 0) fused by
    Reciprocal Rank Fusion  rrf = Σ 1/(60 + rank)  over the two top-50
    lists — the standard lexical+semantic fusion in RAG retrieval.

    Plan shape: each branch reduces to a TOP-50 VIA orderBy+limit
    (TakeOrdered — no global single-partition window over the corpus,
    unlike a naive row_number; the rank is then assigned on the
    50-row result where a window costs nothing). The fusion is a
    full-outer join of two 50-row frames — driver-trivial at any
    corpus size; RRF contributions are exact rationals of integer
    ranks, so both engines agree bit-for-bit before the final round.
    """
    k1, b, topn, rrf_k = 1.2, 0.75, 50, 60
    query_terms = ["spark", "merge", "vector"]
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    dl = d.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    terms = d.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(query_terms)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    lex_scores = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("score"))
    )
    lex = topn_ranked(
        lex_scores,
        [F.col("score").desc(), F.col("doc_id")],
        topn,
        rank_name="lex_rk",
    ).select("doc_id", "lex_rk")

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    sem_scores = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("q"), F.col("v")), 6).alias("cos"),
        )
    )
    sem = topn_ranked(
        sem_scores,
        [F.col("cos").desc(), F.col("doc_id")],
        topn,
        rank_name="sem_rk",
    ).select("doc_id", "sem_rk")

    rrf = F.coalesce(1.0 / (rrf_k + F.col("lex_rk")), F.lit(0.0)) + F.coalesce(
        1.0 / (rrf_k + F.col("sem_rk")), F.lit(0.0)
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id", "lex_rk", "sem_rk", rrf.alias("_rrf")
    )
    return (
        topn_ranked(fused, [F.col("_rrf").desc(), F.col("doc_id")], 20)
        .withColumn("rk", F.col("rk").cast("bigint"))
        .select("doc_id", "lex_rk", "sem_rk", F.round("_rrf", 6).alias("rrf"), "rk")
    )


@register(
    "q163_embedding_quantize",
    oracle="""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
), s AS (
  SELECT vec_id, label, x,
    list_max(list_transform(x, e -> abs(e))) / 127 AS scale
  FROM v
), e AS (
  SELECT vec_id, label, scale,
    list_transform(x, e -> abs(e - floor(e / scale + 0.5) * scale)) AS err
  FROM s
)
SELECT vec_id, label,
  round(scale, 9) AS quant_scale,
  round(list_max(err), 9) AS max_abs_err,
  round(list_sum(err) / len(err), 9) AS mean_abs_err
FROM e
""",
    tags=("similarity", "llm", "vector"),
)
def q163_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale =
    max|x|/127, code = round-half-up(x/scale), reported as the
    per-vector reconstruction error a 100 TB embedding store cares
    about before switching to int8 (4× smaller, SIMD-friendly).

    Map-only — zero shuffles at any corpus size; all arithmetic is
    higher-order array expressions over doubles (float→double widening
    is exact, and round-half-up is spelled floor(x/s + 0.5) because
    that is bit-identical across engines, unlike bankers'-vs-away
    rounding of round()). The error bound max_abs_err ≤ scale/2 is
    asserted in pytest rather than emitted (a boolean on a float
    boundary is an ulp coin-flip; the rounded errors are not).
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr("transform(embedding, e -> cast(e AS double))").alias("x"),
    )
    s = e.withColumn(
        "scale", F.expr("array_max(transform(x, e -> abs(e))) / 127")
    )
    err = s.withColumn(
        "err",
        F.expr("transform(x, e -> abs(e - floor(e / scale + 0.5d) * scale))"),
    )
    return err.select(
        "vec_id",
        "label",
        F.round("scale", 9).alias("quant_scale"),
        F.round(F.expr("array_max(err)"), 9).alias("max_abs_err"),
        F.round(
            F.expr("aggregate(err, 0d, (a, e) -> a + e) / size(err)"), 9
        ).alias("mean_abs_err"),
    )


@register("q172_pq_adc_topk", oracle=None, tags=("similarity", "llm", "vector", "bench"))
def q172_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (#83 memory-bound scale path): vectors
    are unit-normalized, split into M=8 subspaces, each subspace
    k-means-quantized to K=16 codes, and every 64-dim float vector
    compresses to ONE 32-bit packed code (64× smaller than float32 —
    the difference between an embedding index that fits executor RAM
    at 100 TB and one that doesn't). Queries score the compressed
    corpus via ADC (asymmetric distance computation): per query, an
    M×K lookup table of subspace distances is built once, and each
    corpus code costs M table gathers — no float vector is touched
    until the exact re-rank of the top 4k ADC candidates.

    Spark shapes, in order:
    - codebook training: numpy Lloyd on a BOUNDED deterministic sample
      (≤2048 vectors — industry practice trains 256-code books on a
      ~100k sample regardless of corpus size; the collect is bounded
      at any scale);
    - encode: broadcast codebooks + mapInPandas argmin kernel, pure
      map over the corpus — the only full-corpus pass;
    - ADC scan: broadcast |Q|×M×K LUTs, mapInPandas gather kernel with
      per-batch top-candidate pre-reduction (k·partitions rows leave
      each task, TakeOrdered shape);
    - re-rank: equi-join of the tiny candidate set back to original
      vectors, exact JVM-fold cosine, per-query row_number ≤ k.

    Rows-only check (k-means codebooks are engine-specific); pytest
    asserts recall ≥ 0.8 vs q83's exact neighbors and the 32-bit code
    packing invariant."""
    import numpy as np
    import pandas as pd

    M, K, LLOYD_ITER, SAMPLE_N = 8, 16, 10, 2048
    # Shortlist width is THE recall knob (ADC is a lossy sieve, the
    # re-rank is exact): 20×k on the fixtures' near-orthogonal
    # worst-case geometry; at a real corpus's clustered geometry the
    # customary 4-10×k suffices. Cost stays k·partitions-shaped.
    rerank_n = 20 * _TOP_K

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )

    # --- bounded deterministic training sample → driver-side Lloyd ---
    sample_rows = (
        e.filter(F.col("vec_id") < SAMPLE_N).select("v").collect()
    )
    S = np.array([r.v for r in sample_rows], dtype=np.float64)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    dim = S.shape[1]
    sub = dim // M
    books = np.zeros((M, K, sub))
    for m in range(M):
        x = S[:, m * sub : (m + 1) * sub]
        c = x[:K].copy()  # deterministic init: first K sample rows
        for _ in range(LLOYD_ITER):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for j in range(K):
                if (a == j).any():
                    c[j] = x[a == j].mean(0)
        books[m] = c
    bc_books = spark.sparkContext.broadcast(books)

    # --- encode: corpus → packed 32-bit PQ codes (pure map) ----------
    def encode(batches):
        b = bc_books.value
        for pdf in batches:
            vm = np.array(list(pdf["v"]), dtype=np.float64)
            vm /= np.linalg.norm(vm, axis=1, keepdims=True)
            code = np.zeros(len(vm), dtype=np.int64)
            for m in range(M):
                x = vm[:, m * sub : (m + 1) * sub]
                d2 = (
                    (x**2).sum(1)[:, None]
                    - 2 * x @ b[m].T
                    + (b[m] ** 2).sum(1)[None, :]
                )
                code |= d2.argmin(1).astype(np.int64) << (4 * m)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "pq_code": code})

    codes = e.select("vec_id", "v").mapInPandas(
        encode, schema="vec_id long, pq_code long"
    )

    # --- query LUTs: |Q|×M×K squared-distance tables (bounded) -------
    q_rows = (
        e.filter(F.col("vec_id") < _N_QUERIES).select("vec_id", "v").collect()
    )
    q_ids = np.array([r.vec_id for r in q_rows])
    qm = np.array([r.v for r in q_rows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    luts = np.zeros((len(q_ids), M, K))
    for m in range(M):
        qx = qm[:, m * sub : (m + 1) * sub]
        luts[:, m, :] = (
            (qx**2).sum(1)[:, None]
            - 2 * qx @ books[m].T
            + (books[m] ** 2).sum(1)[None, :]
        )
    bc_luts = spark.sparkContext.broadcast((q_ids, luts))

    # --- ADC scan over codes with per-batch top-candidate cut --------
    def adc(batches):
        ids, lut = bc_luts.value
        for pdf in batches:
            code = pdf["pq_code"].to_numpy()
            d = np.zeros((len(ids), len(code)))
            for m in range(M):
                idx = (code >> (4 * m)) & 0xF
                d += lut[:, m, :][:, idx]
            out = {"q_id": [], "neighbor_id": [], "adc_d2": []}
            top_n = min(rerank_n + 1, d.shape[1])
            for qi, q_id in enumerate(ids):
                top = np.argpartition(d[qi], top_n - 1)[:top_n]
                for ci in top:
                    out["q_id"].append(int(q_id))
                    out["neighbor_id"].append(int(pdf["vec_id"].iloc[ci]))
                    out["adc_d2"].append(float(d[qi, ci]))
            yield pd.DataFrame(out)

    cand = (
        codes.mapInPandas(adc, schema="q_id long, neighbor_id long, adc_d2 double")
        .filter(F.col("neighbor_id") != F.col("q_id"))
    )
    wq = Window.partitionBy("q_id").orderBy("adc_d2", "neighbor_id")
    shortlist = (
        cand.withColumn("_ark", F.row_number().over(wq))
        .filter(F.col("_ark") <= rerank_n)
        .select("q_id", "neighbor_id")
    )

    # --- exact re-rank of the shortlist against original vectors -----
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    rer = (
        shortlist.join(
            e.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("label").alias("neighbor_label"),
                     "v"),
            "neighbor_id",
        )
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            "neighbor_label",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return rer.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= _TOP_K)


def _q186_oracle() -> str:
    """Compose the three already-proven oracles (exact truth = q83,
    candidates = q83f SRP / q287 IVF) into one metrics query. DuckDB
    accepts a WITH inside a CTE body, so each registered oracle embeds
    verbatim — the eval replays the SAME SQL the per-index hash rows
    attest. MRR is computed in INTEGERS (60 div best_rk is exact for
    rk in 1..5) so no float sum is partition-order-dependent."""
    truth = _REGISTRY["q83_cosine_topk_exact"].oracle
    srp = _REGISTRY["q83f_ann_lsh_topk_portable"].oracle
    ivf = _REGISTRY["q287_ann_ivf_topk_portable"].oracle
    denom_r = _TOP_K * _N_QUERIES
    denom_m = 60 * _N_QUERIES
    rows = []
    for name, cand in (("ivf_portable", ivf), ("srp_lsh_portable", srp)):
        rows.append(f"""
SELECT '{name}' AS system,
  CAST({_N_QUERIES} AS BIGINT) AS n_queries,
  round(CAST((SELECT COALESCE(SUM(n_hits), 0) FROM
    (SELECT t.q_id, COUNT(*) AS n_hits
     FROM ({cand}) c JOIN truth t
       ON t.q_id = c.q_id AND t.neighbor_id = c.neighbor_id
     GROUP BY t.q_id)) AS DOUBLE) / {denom_r}, 6) AS macro_recall_at_k,
  round(CAST((SELECT COALESCE(SUM(60 // best_rk), 0) FROM
    (SELECT t.q_id, MIN(c.rk) AS best_rk
     FROM ({cand}) c JOIN truth t
       ON t.q_id = c.q_id AND t.neighbor_id = c.neighbor_id
     GROUP BY t.q_id)) AS DOUBLE) / {denom_m}, 6) AS macro_mrr""")
    union = "\nUNION ALL\n".join(rows)
    return f"WITH truth AS ({truth})\n{union}\nORDER BY system"


@register(
    "q186_retrieval_metrics",
    oracle=None,  # resolved after module import (needs q287) — see below
    tags=("similarity", "llm", "vector"),
)
def q186_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation harness: scores the engine's
    PORTABLE approximate indexes (q83f SRP-LSH, q287 IVF) against the
    exact brute-force ground truth with the standard IR metrics —
    macro recall@k and MRR — the numbers an index tuning loop actually
    optimizes. Oracle-backed since round 7 (VERDICT r06 ask #2): with
    the index side on the portable coefficient/seed family, the whole
    eval — ground truth, candidate lists, hit joins, metrics — replays
    in DuckDB and the metric VALUES hash-check, not just float ranges.
    The xxhash64-family indexes (q83b/q83d/q172) keep their dedicated
    recall-floor pytests; this harness is the reusable eval an
    operator runs after every re-index.

    Determinism: recall is exact-integer hit counts over a fixed
    denominator; MRR folds 60 div best_rk (exact int for rk ≤ 5) and
    divides ONCE — no order-dependent float reduction anywhere (the
    q240 lesson applied to IR metrics).

    Plan shape: ground truth and each candidate list are k·|Q|-row
    frames (tiny by construction — top-k outputs); metrics are a semi
    join + per-query agg + one global sum per system. All cost lives
    in producing the candidate lists themselves (each already
    hash-attested under its own query)."""
    exact = q83_cosine_topk_exact(spark, sf_dir).select(
        F.col("q_id").alias("t_q_id"), F.col("neighbor_id").alias("rel_id")
    )
    systems = {
        "srp_lsh_portable": q83f_ann_lsh_topk_portable,
        "ivf_portable": q287_ann_ivf_topk_portable,
    }
    outs = []
    for name, fn in systems.items():
        cand = fn(spark, sf_dir).select("q_id", "neighbor_id", "rk")
        hits = cand.join(
            exact,
            (cand.q_id == F.col("t_q_id"))
            & (cand.neighbor_id == F.col("rel_id")),
        ).select("q_id", "rk")
        per_q = hits.groupBy("q_id").agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("rk").alias("best_rk"),
        )
        outs.append(
            per_q.agg(
                F.lit(name).alias("system"),
                F.lit(_N_QUERIES).cast("bigint").alias("n_queries"),
                F.round(
                    F.coalesce(F.sum("n_hits"), F.lit(0)).cast("double")
                    / F.lit(_TOP_K * _N_QUERIES),
                    6,
                ).alias("macro_recall_at_k"),
                F.round(
                    F.coalesce(
                        F.sum(F.expr("60 div best_rk")), F.lit(0)
                    ).cast("double")
                    / F.lit(60 * _N_QUERIES),
                    6,
                ).alias("macro_mrr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("system")


# q186's oracle composes q83/q83f/q287's registered oracles, so it can
# only be rendered once those registrations exist (bottom of module).
from ..registry import _REGISTRY  # noqa: E402

@register(
    "q199_embedding_centroid_quality",
    oracle="""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ex AS (
  SELECT vec_id, label,
         unnest(range(1, len(v) + 1)) AS pos,
         unnest(v) AS x
  FROM e
), cen AS (
  SELECT label, pos, avg(x) AS cx FROM ex GROUP BY 1, 2
), cnorm AS (
  SELECT label, SUM(cx * cx) AS cn2 FROM cen GROUP BY 1
), per AS (
  SELECT ex.vec_id, ex.label,
         SUM(x * cx) AS dot, SUM(x * x) AS vn2
  FROM ex JOIN cen ON cen.label = ex.label AND cen.pos = ex.pos
  GROUP BY 1, 2
), cosd AS (
  SELECT per.label,
         round(dot / (sqrt(vn2) * sqrt(cn2)), 5) AS cos_c
  FROM per JOIN cnorm ON cnorm.label = per.label
)
SELECT label,
  COUNT(*) AS n_vecs,
  round(avg(cos_c), 5) AS avg_cos_centroid,
  min(cos_c) AS min_cos_centroid
FROM cosd GROUP BY label
""",
    tags=("similarity", "llm", "vector"),
)
def q199_embedding_centroid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid cohesion audit: the class centroid (per-dim
    mean) and each vector's cosine to it, summarized as avg/min per
    label — the standard embedding-quality check before using labels
    for curation (a low min flags mislabeled or outlier vectors; a low
    avg flags an incoherent class). Complements q107's SemDeDup
    clustering and q186's retrieval metrics with a *supervised*
    cohesion measure.

    Scale shape: vectors explode to (label, dim) grain map-side
    (|N|×d rows, no shuffle), centroids are a two-phase hash agg to the
    tiny |labels|×d frame, which BROADCASTS back for the dot products —
    the corpus never shuffles at all; the only wide movement is the
    per-vector re-group (vec_id keyed), and that is the minimum any
    per-vector score needs. At 100 TB the centroid frame is still
    kilobytes (labels × dims), so the plan is scan → explode → agg →
    broadcast-join → agg, no sort anywhere. Cosines round to 5 before
    any cross-row reduction so engine ulp drift cannot move the min."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select(
        "vec_id", "label", F.posexplode("v").alias("p0", "x")
    ).select("vec_id", "label", (F.col("p0") + 1).alias("pos"), "x")
    cen = ex.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
    cnorm = cen.groupBy("label").agg(
        F.sum(F.col("cx") * F.col("cx")).alias("cn2")
    )
    per = (
        ex.join(F.broadcast(cen), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("cx")).alias("dot"),
            F.sum(F.col("x") * F.col("x")).alias("vn2"),
        )
    )
    # try_divide: a zero-norm vector (padding/failed embedding) makes
    # the denominator 0 — NULL cosine in both engines (dropped by
    # avg/min), never an ANSI DIVIDE_BY_ZERO crash.
    cosd = per.join(F.broadcast(cnorm), "label").select(
        "label",
        F.round(
            F.try_divide(F.col("dot"), F.sqrt("vn2") * F.sqrt("cn2")), 5
        ).alias("cos_c"),
    )
    return cosd.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("cos_c"), 5).alias("avg_cos_centroid"),
        F.min("cos_c").alias("min_cos_centroid"),
    )


_NDCG_K = 10


@register(
    "q230_ndcg_exact",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
      FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.q_id, q.q_label, e.label AS n_label, e.vec_id AS neighbor_id,
    round(list_dot_product(q.qv, e.v)
          / (sqrt(list_dot_product(q.qv, q.qv))
             * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM q JOIN e ON e.vec_id <> q.q_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
       ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
), rel AS (
  SELECT q_id, CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
               AS BIGINT) AS n_rel
  FROM scored GROUP BY 1
), dcg AS (
  SELECT q_id, MAX(q_label) AS label,
    SUM(CASE WHEN n_label = q_label THEN 1.0 / log2(rk + 1) ELSE 0 END) AS dcg
  FROM ranked WHERE rk <= {_NDCG_K} GROUP BY 1
), ideal AS (
  SELECT i AS n,
    SUM(1.0 / log2(i + 1)) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS idcg
  FROM generate_series(1, {_NDCG_K}) t(i)
)
SELECT d.q_id, d.label, r.n_rel, round(d.dcg, 6) AS dcg,
  CASE WHEN r.n_rel = 0 THEN NULL
       ELSE round(d.dcg / i.idcg, 6)
  END AS ndcg
FROM dcg d JOIN rel r USING (q_id)
LEFT JOIN ideal i ON i.n = LEAST({_NDCG_K}, r.n_rel)
""",
    tags=("similarity", "llm", "vector"),
)
def q230_ndcg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of exact cosine retrieval against label-match relevance
    — the graded, position-discounted IR metric q186's recall/MRR
    can't express (recall ignores order, MRR sees only the first hit).
    This is the harness number an embedding upgrade must move; the
    same formula evaluates any candidate index by swapping the ranked
    frame (LSH/IVF/PQ top-k from q83b/d/q172).

    Scale shape: identical to q83's exact-scan shape — the 10-query
    frame broadcasts onto ONE corpus scan (corpus never shuffles, and
    the scan/cosine work runs exactly once: rank, relevant-count, and
    DCG all fold out of a single window-then-agg over the scored frame
    on the same q_id partitioning, no self-join), and the ideal-DCG
    normalizer folds a ≤10-term series per query. The n_rel = 0 guard
    is explicit on both engines (Spark's sequence(1, 0) yields a
    DESCENDING [1,0], not an empty list — the empty-relevance case
    must never reach it)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            F.col("label").alias("n_label"),
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    match = (F.col("n_label") == F.col("q_label")).cast("double")
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    per_query = (
        scored.withColumn("rk", F.row_number().over(w))
        .groupBy("q_id")
        .agg(
            F.max("q_label").alias("label"),
            F.sum(match).cast("bigint").alias("n_rel"),
            F.sum(
                F.when(
                    F.col("rk") <= _NDCG_K, match / F.log2(F.col("rk") + 1)
                ).otherwise(F.lit(0.0))
            ).alias("dcg"),
        )
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(_NDCG_K), F.col("n_rel").cast("int"))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
    )
    return per_query.select(
        "q_id",
        "label",
        "n_rel",
        F.round("dcg", 6).alias("dcg"),
        F.when(F.col("n_rel") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("dcg") / idcg, 6))
        .alias("ndcg"),
    )


@register(
    "q242_label_centroid_separation",
    oracle="""
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ex AS (
  SELECT label,
         unnest(range(1, len(v) + 1)) AS pos,
         unnest(v) AS x
  FROM e
), cen AS (
  SELECT label, pos, avg(x) AS cx FROM ex GROUP BY 1, 2
), cn AS (
  SELECT label, sqrt(SUM(cx * cx)) AS nrm FROM cen GROUP BY 1
), dots AS (
  SELECT a.label AS label_a, b.label AS label_b, SUM(a.cx * b.cx) AS dot
  FROM cen a JOIN cen b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
)
SELECT d.label_a, d.label_b,
  round(d.dot / (na.nrm * nb.nrm), 5) AS cos_centroids
FROM dots d
JOIN cn na ON na.label = d.label_a
JOIN cn nb ON nb.label = d.label_b
""",
    tags=("similarity", "llm", "vector"),
)
def q242_label_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between label centroids — the BETWEEN-class
    companion to q199's within-class cohesion. Together they are the
    Davies-Bouldin-style separability read: labels whose centroids sit
    near cosine 1 are candidates for merging (or evidence of a
    labeling fault); a label with high q199 cohesion AND low q242
    cosine to every other centroid is a well-separated class an
    embedding-based curator can trust.

    Plan shape: the corpus reduces ONCE to the |labels|×d centroid
    frame (explode map-side, two-phase avg agg); every later stage —
    norms, the label<label pairwise dot, the final join — runs on that
    kilobyte-scale frame, so pair cost is |labels|²·d/2 multiplies
    regardless of corpus size. At 100 TB the only corpus-wide work is
    the same single explode+agg q199 already pays; cosines round(5)
    before surfacing (q199's proven ulp contract)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select("label", F.posexplode("v").alias("p0", "x")).select(
        "label", (F.col("p0") + 1).alias("pos"), "x"
    )
    cen = ex.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
    cn = cen.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("nrm")
    )
    a, b = cen.alias("a"), cen.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(F.sum(F.col("a.cx") * F.col("b.cx")).alias("dot"))
    )
    na = cn.select(F.col("label").alias("label_a"), F.col("nrm").alias("nrm_a"))
    nb = cn.select(F.col("label").alias("label_b"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            # try_divide: an all-zero label centroid (degenerate input)
            # must yield NULL, not an ANSI DIVIDE_BY_ZERO — matching
            # DuckDB's NULL on double/0 (q199's guard, same rationale)
            F.round(
                F.try_divide(F.col("dot"), F.col("nrm_a") * F.col("nrm_b")), 5
            ).alias("cos_centroids"),
        )
    )


@register(
    "q248_embedding_dim_stats",
    oracle="""
WITH e AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ex AS (
  SELECT unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x FROM e
), m AS (
  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(x) AS s1, SUM(x * x) AS s2
  FROM ex GROUP BY pos
), stats AS (
  SELECT pos, n,
    s1 / n AS mean,
    s2 / n - (s1 / n) * (s1 / n) AS var
  FROM m
), tot AS (SELECT SUM(var) AS tv FROM stats)
SELECT CAST(pos AS INT) AS pos, n,
  round(mean, 5) AS dim_mean,
  round(var, 6) AS dim_var,
  round(var / tot.tv, 6) AS var_share
FROM stats CROSS JOIN tot
""",
    tags=("similarity", "llm", "vector", "dq"),
)
def q248_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance/variance-share over the embedding
    space — the anisotropy audit (Ethayarajh 2019: contextual
    embedding variance concentrates in few directions). A dimension
    with var_share ≈ 0 is dead weight every cosine pays for (prune or
    re-project); a large |mean| signals an uncentered space where
    cosine degenerates toward the common-direction similarity. The
    check to run BEFORE trusting q83/q107/q173's cosine geometry.

    Plan shape: explode to (pos, x) map-side, ONE two-phase hash agg
    to the d-row moment frame (n, Σx, Σx²), then pure scalar math and
    a 1-row broadcast total — corpus shuffles nothing wider than d
    groups at any scale. Variance via explicit moments (the q205
    five-moment discipline: identical op chain on both engines, no
    Welford-vs-textbook kernel drift), rounded 5/6 before surfacing."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select(F.posexplode("v").alias("p0", "x")).select(
        (F.col("p0") + 1).cast("int").alias("pos"), "x"
    )
    m = ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    stats = m.select("pos", "n", mean.alias("mean"), var.alias("var"))
    tot = stats.agg(F.sum("var").alias("tv"))
    return stats.crossJoin(F.broadcast(tot)).select(
        "pos",
        "n",
        F.round("mean", 5).alias("dim_mean"),
        F.round("var", 6).alias("dim_var"),
        # try_divide: a fully-degenerate space (every dim constant →
        # tv = 0) surfaces NULL shares, never an ANSI crash
        F.round(F.try_divide(F.col("var"), F.col("tv")), 6).alias("var_share"),
    )


@register(
    "q267_embedding_outliers",
    oracle="""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ex AS (
  SELECT vec_id, label,
         unnest(range(1, len(v) + 1)) AS pos,
         unnest(v) AS x
  FROM e
), cen AS (
  SELECT label, pos, avg(x) AS cx FROM ex GROUP BY 1, 2
), cnorm AS (
  SELECT label, SUM(cx * cx) AS cn2 FROM cen GROUP BY 1
), per AS (
  SELECT ex.vec_id, ex.label,
         SUM(x * cx) AS dot, SUM(x * x) AS vn2
  FROM ex JOIN cen ON cen.label = ex.label AND cen.pos = ex.pos
  GROUP BY 1, 2
), cosd AS (
  SELECT per.label, per.vec_id,
         round(dot / (sqrt(vn2) * sqrt(cn2)), 5) AS cos_c
  FROM per JOIN cnorm ON cnorm.label = per.label
), ranked AS (
  SELECT label, vec_id, cos_c,
         row_number() OVER (
           PARTITION BY label ORDER BY cos_c ASC, vec_id ASC
         ) AS outlier_rank
  FROM cosd
)
SELECT label, vec_id, cos_c AS cos_centroid,
       CAST(outlier_rank AS INT) AS outlier_rank
FROM ranked WHERE outlier_rank <= 5
""",
    tags=("similarity", "llm", "vector"),
)
def q267_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-outlier NAMING: the 5 vectors farthest from their own
    label centroid (lowest cosine), per label — the action list q199's
    summary only hints at (q199 says 'label 7 has a low min'; this says
    WHICH vec_ids to audit/drop — mislabeled-data detection, the
    curation step before trusting labels for training). Cosines round
    to 5 BEFORE ranking on both sides so engine ulp drift cannot
    reorder the boundary; ties break by vec_id — a total order.

    Scale shape: identical to q199 up to the per-vector cosine (corpus
    never shuffles; centroids broadcast), then a label-partitioned
    bottom-5 that compiles to WindowGroupLimit (map-side per-partition
    heaps carry ≤5 rows per label per mapper — asserted in
    test_plans). Output is |labels|×5 rows at any corpus size."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select(
        "vec_id", "label", F.posexplode("v").alias("p0", "x")
    ).select("vec_id", "label", (F.col("p0") + 1).alias("pos"), "x")
    cen = ex.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
    cnorm = cen.groupBy("label").agg(
        F.sum(F.col("cx") * F.col("cx")).alias("cn2")
    )
    per = (
        ex.join(F.broadcast(cen), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("cx")).alias("dot"),
            F.sum(F.col("x") * F.col("x")).alias("vn2"),
        )
    )
    cosd = per.join(F.broadcast(cnorm), "label").select(
        "label",
        "vec_id",
        F.round(
            F.try_divide(F.col("dot"), F.sqrt("vn2") * F.sqrt("cn2")), 5
        ).alias("cos_c"),
    )
    # asc_nulls_last, not asc: a zero-norm vector (vn2 = 0) gives NULL
    # cos_c via try_divide; Spark's ASC default is NULLS FIRST while
    # DuckDB's is NULLS LAST, so plain asc() would seat such a vector
    # at outlier_rank 1 on the Spark side only. NULLS LAST on both
    # engines ranks them after every real cosine, tie-broken by vec_id
    # identically.
    w = Window.partitionBy("label").orderBy(
        F.col("cos_c").asc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        cosd.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= 5)
        .select(
            "label",
            "vec_id",
            F.col("cos_c").alias("cos_centroid"),
            F.col("outlier_rank").cast("int").alias("outlier_rank"),
        )
    )


def _q271_oracle() -> str:
    from ..functions.compat import sql_portable_hash64

    h = sql_portable_hash64("CAST(vec_id AS VARCHAR)")
    cos = (
        "round(list_dot_product(x.v, c.cv) / "
        "(sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(c.cv, c.cv))), 5)"
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
base AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
delta AS (SELECT * FROM e WHERE vec_id % 10 = 0),
seeds AS (SELECT vec_id, v FROM base ORDER BY {h}, vec_id LIMIT 16),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS c_id, v AS cv
  FROM seeds
),
sb AS (
  SELECT x.vec_id, c.c_id, {cos} AS sim,
    row_number() OVER (PARTITION BY x.vec_id
                       ORDER BY {cos} DESC, c.c_id) AS rk
  FROM base x CROSS JOIN cent c
),
sd AS (
  SELECT x.vec_id, c.c_id, {cos} AS sim,
    row_number() OVER (PARTITION BY x.vec_id
                       ORDER BY {cos} DESC, c.c_id) AS rk
  FROM delta x CROSS JOIN cent c
),
nb AS (SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_base FROM sb WHERE rk = 1 GROUP BY c_id),
nd AS (SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_new,
              round(CAST(SUM(CAST(sim AS DECIMAL(18,5))) AS DOUBLE)
                    / COUNT(*), 5) AS avg_cos_new
       FROM sd WHERE rk = 1 GROUP BY c_id)
SELECT c.c_id AS list_id,
  COALESCE(nb.n_base, 0) AS n_base,
  COALESCE(nd.n_new, 0) AS n_new,
  nd.avg_cos_new
FROM cent c
LEFT JOIN nb ON nb.c_id = c.c_id
LEFT JOIN nd ON nd.c_id = c.c_id
"""


@register(
    "q271_ivf_delta_reassign",
    oracle=_q271_oracle(),
    tags=("similarity", "llm", "vector", "versioning"),
)
def q271_ivf_delta_reassign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance on snapshot deltas (VERDICT
    r05 ask #3b — composes versioning.changes() with the IVF
    assignment): the corpus lives in a VersionedTable (v1 = the 90%
    base the index was built on, v2 = an appended 10% delta batch);
    maintenance scores ONLY ``changes(1)`` — the new rows read from
    only the files v2 added — against the existing centroid table and
    appends their postings, per-list growth reported next to the base
    postings. At 100 TB this is the difference between re-indexing the
    corpus and touching the day's arrivals.

    Oracle determinism: centroids are the 16 hash-least base vectors
    (portable md5 hash — no Lloyd float averaging), assignment argmax
    runs on cosine ROUNDED to 5 with c_id tiebreak, so both engines
    pick identical lists (the q199-proven tolerance). The production
    path swaps in spherical_kmeans centroids (q83d) — identical
    assignment plumbing, rows-only check territory.

    Scale shape: centroid frame broadcasts everywhere; the delta scan
    never touches base files (changes() reads the v2 file diff);
    base postings are one broadcast-join + agg at index-build time.
    Nothing shuffles but the (c_id) aggregates."""
    import os

    from ..functions.compat import portable_hash64
    from ..versioning import VersionedTable, session_fixture_dir

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    d = session_fixture_dir(spark, "q271_ivf")
    vt = VersionedTable(spark, os.path.join(d, "emb"))
    vt.write(e.filter(F.pmod("vec_id", F.lit(10)) != 0), "append")  # v1: base
    vt.write(e.filter(F.pmod("vec_id", F.lit(10)) == 0), "append")  # v2: delta
    base = vt.read(version=1)
    delta = vt.changes(1)  # only v2's files — the incremental read

    seeds = topn_ranked(
        base.withColumn("_h", portable_hash64(F.col("vec_id").cast("string"))),
        [F.col("_h"), F.col("vec_id")],
        16,
        rank_name="_hrk",
    ).drop("_h", "_hrk")
    cent = topn_ranked(seeds, [F.col("vec_id")], 16, rank_name="c_id").select(
        "c_id", F.col("v").alias("cv")
    )

    def assign(df: DataFrame) -> DataFrame:
        scored = df.join(F.broadcast(cent)).withColumn(
            "sim", F.round(cosine(F.col("v"), F.col("cv")), 5)
        )
        return scored.groupBy("vec_id").agg(
            F.max_by(
                "c_id", F.struct(F.col("sim"), (-F.col("c_id")).alias("_t"))
            ).alias("c_id"),
            F.max("sim").alias("sim"),
        )

    nb = assign(base).groupBy("c_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base")
    )
    # avg of per-row-rounded doubles is a partition-order-dependent
    # float reduction (the q240 tie class): sum the round(5) values
    # EXACTLY in DECIMAL(18,5) — order-independent — then one double
    # division + round, mirrored in the oracle (round-6 advice).
    nd = assign(delta).groupBy("c_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new"),
        F.round(
            F.sum(F.col("sim").cast("decimal(18,5)")).cast("double")
            / F.count(F.lit(1)),
            5,
        ).alias("avg_cos_new"),
    )
    return (
        cent.select(F.col("c_id").alias("list_id"))
        .join(nb.withColumnRenamed("c_id", "list_id"), "list_id", "left")
        .join(nd.withColumnRenamed("c_id", "list_id"), "list_id", "left")
        .select(
            "list_id",
            F.coalesce("n_base", F.lit(0).cast("bigint")).alias("n_base"),
            F.coalesce("n_new", F.lit(0).cast("bigint")).alias("n_new"),
            "avg_cos_new",
        )
    )


def _srp_coefs(planes: int, dims: int, seed: str) -> list[list[float]]:
    """Portable SRP hyperplane coefficients: uniform-ish in [-0.5, 0.5)
    derived from the md5-based portable hash of (seed, plane, dim) —
    data-independent CONSTANTS, computed once driver-side and inlined
    as literals in both the Spark plan and the DuckDB oracle, so the
    projections are the same IEEE fold on both engines (the q83-proven
    list_dot_product ≡ zip_with/aggregate equivalence)."""
    import hashlib

    def h(p: int, i: int) -> int:
        key = f"{seed}:{p}:{i}".encode()
        return int(hashlib.md5(key).hexdigest()[:15], 16)

    return [
        [h(p, i) % 100003 / 100003.0 - 0.5 for i in range(dims)]
        for p in range(planes)
    ]


def _q83f_oracle(n_tables: int, planes: int, dims: int) -> str:
    table_branches = []
    for t in range(n_tables):
        coefs = _srp_coefs(planes, dims, f"srp{t}")
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product(v, {coefs[p]!r}::DOUBLE[]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p in range(planes)
        )
        table_branches.append(
            f"SELECT vec_id, label, v, {t} AS t, {bucket} AS bucket FROM e"
        )
    member = "\nUNION ALL\n".join(table_branches)
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), member AS (
{member}
), q AS (
  SELECT vec_id AS q_id, v AS qv, t, bucket FROM member
  WHERE vec_id < {_N_QUERIES}
), cand AS (
  SELECT DISTINCT q.q_id, m.vec_id AS neighbor_id, m.label AS neighbor_label,
    round(list_dot_product(q.qv, m.v)
          / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(m.v, m.v))), 6)
      AS cosine
  FROM q JOIN member m ON m.t = q.t AND m.bucket = q.bucket
  WHERE m.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, neighbor_label, cosine, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM cand)
WHERE rk <= {_TOP_K}
"""


_Q83F_DIMS = 64  # embeddings fixture dimensionality (guarded at run time)


@register(
    "q83f_ann_lsh_topk_portable",
    oracle=_q83f_oracle(8, 3, _Q83F_DIMS),
    tags=("similarity", "llm", "vector"),
)
def q83f_ann_lsh_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q83b's SRP-LSH ANN with the hyperplanes on the PORTABLE
    coefficient family — the whole scale path (bucket membership per
    hash table, equi-join candidate generation, exact re-rank) replays
    in DuckDB and the top-k itself hash-checks (round-6 conversion:
    the first ANN variant with a full value oracle, not just a recall
    floor). Projection signs are deterministic cross-engine because
    the coefficients are INLINED literal doubles and both engines fold
    the dot product sequentially (q83's proven equivalence); a sign
    flip would need |proj| below fold ulp (~1e-15) — none exists in
    the fixture, and any future flip surfaces as a hash mismatch, not
    silent wrongness.

    Same plan as q83b: map-side bucket keys, broadcast query side,
    equi-join on (table, bucket), distinct, re-rank — candidates ≪ N,
    the LSH contract. xxhash64 coefficients (q83b) remain the
    production default; rows-only recall floors keep covering that
    path."""
    n_tables, planes = 8, 3
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    dims = _vec_dims(e, "v")
    if dims != _Q83F_DIMS:
        raise ValueError(
            f"embeddings dim {dims} != {_Q83F_DIMS}: regenerate the "
            "q83f oracle with the new dimensionality"
        )

    def bucket_col(t: int):
        coefs = _srp_coefs(planes, dims, f"srp{t}")
        b = F.lit(0).cast("long")
        for p in range(planes):
            proj = F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(c) for c in coefs[p]]),
                    lambda x, c: x.cast("double") * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            b = b + F.when(proj >= 0, F.lit(1 << p)).otherwise(0).cast("long")
        return b

    buckets = F.array(
        *[
            F.struct(F.lit(t).alias("t"), bucket_col(t).alias("bucket"))
            for t in range(n_tables)
        ]
    )
    member = e.withColumn("tb", F.explode(buckets)).select(
        "vec_id",
        "label",
        "v",
        F.col("tb.t").alias("t"),
        F.col("tb.bucket").alias("bucket"),
    )
    q = member.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "t", "bucket"
    )
    cand = (
        F.broadcast(q)
        .join(member, ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", "vec_id", "label", "v")
        .distinct()
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOP_K
    )


_IVFP_K = 16  # portable IVF: coarse-quantizer list count
_IVFP_NPROBE = 4


def _q287_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _q287_oracle() -> str:
    from ..functions.compat import sql_portable_hash64

    h = sql_portable_hash64("CAST(vec_id AS VARCHAR)")
    asg_cos = _q287_cos("x.v", "c.cv")
    cand_cos = _q287_cos("qq.v", "m.v")
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (SELECT vec_id, v FROM e ORDER BY {h}, vec_id LIMIT {_IVFP_K}),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS c_id, v AS cv
  FROM seeds
),
asg AS (
  SELECT vec_id, c_id FROM (
    SELECT x.vec_id, c.c_id,
      row_number() OVER (PARTITION BY x.vec_id
                         ORDER BY round({asg_cos}, 5) DESC, c.c_id) AS crk
    FROM e x CROSS JOIN cent c)
  WHERE crk = 1
),
probes AS (
  SELECT q_id, c_id FROM (
    SELECT x.vec_id AS q_id, c.c_id,
      row_number() OVER (PARTITION BY x.vec_id
                         ORDER BY round({asg_cos}, 5) DESC, c.c_id) AS crk
    FROM e x CROSS JOIN cent c WHERE x.vec_id < {_N_QUERIES})
  WHERE crk <= {_IVFP_NPROBE}
),
cand AS (
  SELECT p.q_id, m.vec_id AS neighbor_id, m.label AS neighbor_label,
    round({cand_cos}, 6) AS cosine
  FROM probes p
  JOIN asg a ON a.c_id = p.c_id
  JOIN e m ON m.vec_id = a.vec_id
  JOIN e qq ON qq.vec_id = p.q_id
  WHERE m.vec_id <> p.q_id
)
SELECT q_id, neighbor_id, neighbor_label, cosine, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM cand)
WHERE rk <= {_TOP_K}
"""


@register(
    "q287_ann_ivf_topk_portable",
    oracle=_q287_oracle(),
    tags=("similarity", "llm", "vector"),
)
def q287_ann_ivf_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k on the PORTABLE coarse quantizer (round-7 twin of
    q83f, same playbook as q271): inverted lists are the 16
    hash-least seed vectors (portable md5-derived order — no engine
    RNG, no Lloyd float drift), every vector joins its argmax-cosine
    list via the round(5)+smallest-c_id key, queries probe their
    4 nearest lists, and candidates get an exact round(6)
    cosine re-rank. The whole pipeline — seed choice, assignment,
    probing, re-rank — replays in DuckDB, so the top-k hash-checks
    end-to-end (the first IVF variant with a full value oracle; q83d's
    xxhash64 quantizer remains the production default with its recall
    floor).

    Scale shape: centroids are a 16-row broadcast; assignment
    is map-side (N×16 scored pairs collapse to N in a partial
    agg before any shuffle); candidate generation is an equi-join on
    c_id — probe-side rows only ever meet their own lists' vectors,
    never the corpus (the IVF contract that bounds work at 100 TB)."""
    from ..functions.compat import portable_hash64

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    seeds = topn_ranked(
        e.withColumn("_h", portable_hash64(F.col("vec_id").cast("string"))),
        [F.col("_h"), F.col("vec_id")],
        _IVFP_K,
        rank_name="_hrk",
    ).drop("_h", "_hrk", "label")
    cent = topn_ranked(
        seeds, [F.col("vec_id")], _IVFP_K, rank_name="c_id"
    ).select("c_id", F.col("v").alias("cv"))

    sim = F.round(cosine(F.col("v"), F.col("cv")), 5)
    asg = (
        e.join(F.broadcast(cent))
        .withColumn("_sim", sim)
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "c_id", F.struct(F.col("_sim"), (-F.col("c_id")).alias("_t"))
            ).alias("c_id"),
            F.any_value("label").alias("neighbor_label"),
            F.any_value("v").alias("nv"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("c_id"))
    probes = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
        .join(F.broadcast(cent))
        .withColumn("_sim", F.round(cosine(F.col("qv"), F.col("cv")), 5))
        .withColumn("_crk", F.row_number().over(wq))
        .filter(F.col("_crk") <= _IVFP_NPROBE)
        .select("q_id", "qv", "c_id")
    )
    cand = (
        F.broadcast(probes)
        .join(asg, "c_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "neighbor_label",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOP_K
    )


_PQP_M, _PQP_K, _PQP_SUB = 4, 8, 16  # 4 subspaces × 16 dims, 8 codes each
_PQP_RERANK = 8 * _TOP_K


def _pqp_codebook() -> list[list[list[float]]]:
    """Portable PQ codebook: M×K×SUB literal centroids in [-0.5, 0.5)
    from the same md5 coefficient family as _srp_coefs — data-independent
    CONSTANTS inlined into both the Spark plan and the DuckDB oracle, so
    encode/ADC replay bit-for-bit (q172's Lloyd-trained books stay the
    production default; recall there, replayability here)."""
    import hashlib

    def h(m: int, j: int, i: int) -> int:
        key = f"pq:{m}:{j}:{i}".encode()
        return int(hashlib.md5(key).hexdigest()[:15], 16)

    return [
        [
            [h(m, j, i) % 100003 / 100003.0 - 0.5 for i in range(_PQP_SUB)]
            for j in range(_PQP_K)
        ]
        for m in range(_PQP_M)
    ]


def _pqp_cc(c: list[float]) -> float:
    # sequential fold — one shared literal, both engines consume it
    acc = 0.0
    for x in c:
        acc += x * x
    return acc


def _q172b_oracle() -> str:
    books = _pqp_codebook()
    vals = ",\n    ".join(
        f"({m}, {j}, {books[m][j]!r}::DOUBLE[], {_pqp_cc(books[m][j])!r})"
        for m in range(_PQP_M)
        for j in range(_PQP_K)
    )
    ms = ",".join(f"({m})" for m in range(_PQP_M))
    cos = _q287_cos("q.v", "mm.v")
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (
  SELECT vec_id, m,
         list_slice(v, m*{_PQP_SUB}+1, m*{_PQP_SUB}+{_PQP_SUB}) AS x
  FROM e, (VALUES {ms}) AS ms(m)
),
books AS (SELECT * FROM (VALUES
    {vals}
  ) AS t(m, j, cv, cc)),
d2 AS (
  SELECT s.vec_id, s.m, b.j,
    round(list_dot_product(s.x, s.x)
          - 2*list_dot_product(s.x, b.cv) + b.cc, 9) AS d2
  FROM subs s JOIN books b ON b.m = s.m
),
enc AS (
  SELECT vec_id, m, j FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d2, j) AS rk FROM d2)
  WHERE rk = 1
),
lut AS (
  SELECT vec_id AS q_id, m, j, CAST(d2 AS DECIMAL(20,9)) AS lutd
  FROM d2 WHERE vec_id < {_N_QUERIES}
),
adc AS (
  SELECT l.q_id, enc.vec_id AS neighbor_id, SUM(l.lutd) AS adc_d2
  FROM enc JOIN lut l ON l.m = enc.m AND l.j = enc.j
  WHERE enc.vec_id <> l.q_id
  GROUP BY l.q_id, enc.vec_id
),
short AS (
  SELECT q_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY adc_d2, neighbor_id) AS srk
    FROM adc)
  WHERE srk <= {_PQP_RERANK}
),
rer AS (
  SELECT s.q_id, s.neighbor_id, mm.label AS neighbor_label,
    round({cos}, 6) AS cosine
  FROM short s
  JOIN e q ON q.vec_id = s.q_id
  JOIN e mm ON mm.vec_id = s.neighbor_id
)
SELECT q_id, neighbor_id, neighbor_label, cosine, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM rer)
WHERE rk <= {_TOP_K}
"""


@register(
    "q172b_pq_adc_topk_portable",
    oracle=_q172b_oracle(),
    tags=("similarity", "llm", "vector"),
)
def q172b_pq_adc_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q172's PQ-ADC ANN on a PORTABLE literal codebook (staged round-8
    conversion, completing the ANN-family playbook: SRP q83f, IVF q287,
    PQ here): every 64-dim vector encodes to M=4 subspace code ids
    (argmin squared distance to 8 literal centroids per subspace,
    round(9)+smallest-j key), queries keep an M×K LUT of their own
    subspace distances, ADC distance = exact DECIMAL sum of M LUT
    gathers, and the top ADC shortlist gets the exact round(6) cosine
    re-rank. Encode, LUT, ADC, shortlist, re-rank all replay in DuckDB
    — the top-k hash-checks end-to-end. q172 (Lloyd books, packed
    32-bit codes, mapInPandas gather kernels) remains the production
    memory-bound scale path with its recall-floor test.

    Scale shape: the codebook is a 32-row broadcast; encode is
    argmin-as-partial-agg (min_by map-side combine — N×M×K scored rows
    never shuffle); the ADC scan is an (m, j) equi-join against a
    broadcast |Q|×M×K LUT followed by a (q_id, vec_id) partial-agg sum
    — per-vector cost O(M·|Q|), the PQ contract; only the ≤|Q|·40-row
    shortlist ever touches float vectors again."""
    books = _pqp_codebook()
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    dims = _vec_dims(e, "v")
    if dims != _PQP_M * _PQP_SUB:
        raise ValueError(
            f"embeddings dim {dims} != {_PQP_M * _PQP_SUB}: regenerate "
            "the q172b codebook for the new dimensionality"
        )

    subs = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("v", m * _PQP_SUB + 1, _PQP_SUB).alias("x"),
                    )
                    for m in range(_PQP_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.x").alias("x"))

    codes_tbl = spark.createDataFrame(
        [
            (m, j, books[m][j], _pqp_cc(books[m][j]))
            for m in range(_PQP_M)
            for j in range(_PQP_K)
        ],
        "m int, j int, cv array<double>, cc double",
    )
    d2 = subs.join(F.broadcast(codes_tbl), "m").withColumn(
        "d2",
        F.round(
            dot(F.col("x"), F.col("x"))
            - 2 * dot(F.col("x"), F.col("cv"))
            + F.col("cc"),
            9,
        ),
    )
    # argmin as a partial agg (map-side combine), not a window — the
    # N×M×K scored rows collapse to N×M before any shuffle
    enc = d2.groupBy("vec_id", "m").agg(
        F.min_by("j", F.struct(F.col("d2"), F.col("j"))).alias("j")
    )
    lut = (
        d2.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            "m",
            "j",
            F.col("d2").cast("decimal(20,9)").alias("lutd"),
        )
    )
    adc = (
        enc.join(F.broadcast(lut), ["m", "j"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("lutd").alias("adc_d2"))
    )
    ws = Window.partitionBy("q_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    short = (
        adc.withColumn("_srk", F.row_number().over(ws))
        .filter(F.col("_srk") <= _PQP_RERANK)
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
    )
    qv = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    rer = (
        short.join(F.broadcast(qv), "q_id")
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("neighbor_label"),
                F.col("v").alias("nv"),
            ),
            "neighbor_id",
        )
        .select(
            "q_id",
            "neighbor_id",
            "neighbor_label",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return rer.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOP_K
    )


# Late-bind q186's composed oracle now that q83/q83f/q287 are all
# registered (dataclass is frozen — rebuild the spec).
from dataclasses import replace as _dc_replace  # noqa: E402

_REGISTRY["q186_retrieval_metrics"] = _dc_replace(
    _REGISTRY["q186_retrieval_metrics"], oracle=_q186_oracle()
)


@register(
    "q369_dim_truncation_recall",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    CAST(embedding AS DOUBLE[])[1:16] AS vt
  FROM embeddings
), q AS (SELECT vec_id AS q_id, v AS qv, vt AS qvt FROM e
         WHERE vec_id < {_N_QUERIES}),
full_rk AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id ORDER BY
        round(list_dot_product(q.qv, e.v)
          / (sqrt(list_dot_product(q.qv, q.qv))
             * sqrt(list_dot_product(e.v, e.v))), 6) DESC,
        e.vec_id) AS rk
    FROM q JOIN e ON e.vec_id <> q.q_id) t
  WHERE rk <= {_TOP_K}
), trunc_rk AS (
  SELECT q_id, neighbor_id FROM (
    SELECT q.q_id, e.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.q_id ORDER BY
        round(list_dot_product(q.qvt, e.vt)
          / (sqrt(list_dot_product(q.qvt, q.qvt))
             * sqrt(list_dot_product(e.vt, e.vt))), 6) DESC,
        e.vec_id) AS rk
    FROM q JOIN e ON e.vec_id <> q.q_id) t
  WHERE rk <= {_TOP_K}
)
SELECT f.q_id,
  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_overlap,
  round(CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / {_TOP_K}, 6) AS recall
FROM full_rk f
LEFT JOIN trunc_rk t
  ON t.q_id = f.q_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.q_id
""",
    tags=("similarity", "vector", "llm"),
)
def q369_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation recall: top-k cosine
    neighbors using only the FIRST 16 of 64 dimensions, measured
    against the full-dimension exact top-k — the feasibility probe
    for the standard two-stage retrieval trick (coarse search in a
    prefix of the embedding, exact re-rank in full precision) that
    cuts index memory and bandwidth 4× at 100 TB. Per-query overlap
    counts are exact integers; both rankings round cosines to 6 with
    vec_id tiebreaks, the q83 determinism contract.

    Scale shape: two broadcast-query scans (the q83 exact plan ×2 —
    oracle-scale by design; the production path composes truncation
    with the q83f/q287 bucketed indexes)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.slice(F.col("embedding"), 1, 16).alias("vt"),
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("vt").alias("qvt"),
    )

    def topk(qcol: str, ecol: str):
        scored = F.broadcast(q).join(e, e.vec_id != F.col("q_id")).select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col(qcol), F.col(ecol)), 6).alias("c"),
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("c").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _TOP_K)
            .select("q_id", "neighbor_id")
        )

    full = topk("qv", "v")
    trunc = topk("qvt", "vt").withColumnRenamed("neighbor_id", "t_id")
    return (
        full.join(
            trunc,
            (full.q_id == trunc.q_id) & (full.neighbor_id == trunc.t_id),
            "left",
        )
        .groupBy(full.q_id.alias("q_id"))
        .agg(
            F.sum(F.when(F.col("t_id").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_overlap")
        )
        .select(
            "q_id",
            "n_overlap",
            F.round(F.col("n_overlap").cast("double") / _TOP_K, 6).alias(
                "recall"
            ),
        )
    )


@register(
    "q402_gram_matrix",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), exi AS (
  SELECT vec_id AS vec, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x
  FROM e
), g AS (
  SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS gval
  FROM exi a JOIN exi b ON b.vec = a.vec AND a.pos <= b.pos
  GROUP BY a.pos, b.pos
)
SELECT i, j, round(gval, 3) AS gram, rk FROM (
  SELECT i, j, gval,
    row_number() OVER (ORDER BY abs(gval) DESC, i, j) AS rk
  FROM g)
WHERE rk <= 25
""",
    tags=("vector",),
)
def q402_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GRAM MATRIX G = EᵀE of the embedding store — the
    64×64 second-moment matrix that PCA (q403), whitening (q419) and
    every covariance-based diagnostic start from, computed as pure
    relational algebra: posexplode to (vec, dim, x), self-join per
    vector on dim_a ≤ dim_b (upper triangle — symmetry is free), hash
    aggregate to the 2080-entry matrix. The per-(i,j) partial sums
    combine MAP-SIDE, so the 64²/2·N product rows flow through
    whole-stage codegen and only |dims|²-sized partials ever shuffle —
    the reason EᵀE (d×d, data-reduced) scales where the N×N kernel
    matrix would not. Top-25 entries by magnitude (TakeOrdered, no
    global window); values round(3) under the q199 ulp contract for
    float-data sums."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select(
        "vec_id", F.posexplode("v").alias("p0", "x")
    ).select("vec_id", (F.col("p0") + 1).alias("pos"), "x")
    a, b = ex.alias("a"), ex.alias("b")
    g = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.pos") <= F.col("b.pos")),
        )
        .groupBy(F.col("a.pos").alias("i"), F.col("b.pos").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("gval"))
    )
    return topn_ranked(
        g, [F.abs(F.col("gval")).desc(), F.col("i"), F.col("j")], 25
    ).select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.round("gval", 3).alias("gram"),
        "rk",
    )


_PCA_ROUNDS = 5


def _q403_oracle() -> str:
    """DuckDB-only oracle (MATERIALIZED is legal here): same Gram CTE,
    same uniform init, 5 unrolled normalized power-iteration rounds."""
    sql = """
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), exi AS MATERIALIZED (
  SELECT vec_id AS vec, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x
  FROM e
), gU AS MATERIALIZED (
  SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS gval
  FROM exi a JOIN exi b ON b.vec = a.vec AND a.pos <= b.pos
  GROUP BY a.pos, b.pos
), g AS MATERIALIZED (
  SELECT i, j, gval FROM gU
  UNION ALL
  SELECT j, i, gval FROM gU WHERE i <> j
), v0 AS MATERIALIZED (
  SELECT DISTINCT i AS pos, 0.125 AS c FROM g
)
"""
    prev = "v0"
    for r in range(1, _PCA_ROUNDS + 1):
        sql += f"""
, w{r} AS MATERIALIZED (
  SELECT g.i AS pos, SUM(g.gval * v.c) AS wc
  FROM g JOIN {prev} v ON v.pos = g.j GROUP BY g.i
), n{r} AS MATERIALIZED (
  SELECT sqrt(SUM(wc * wc)) AS nrm FROM w{r}
), v{r} AS MATERIALIZED (
  SELECT w.pos, w.wc / n.nrm AS c FROM w{r} w CROSS JOIN n{r} n
)"""
        prev = f"v{r}"
    sql += f"""
, ray AS (
  SELECT SUM(w.wc * v.c) AS eig
  FROM w{_PCA_ROUNDS} w JOIN v{_PCA_ROUNDS - 1} v ON v.pos = w.pos
)
SELECT pos AS dim, round(loading, 4) AS loading, rk,
  round((SELECT eig FROM ray), 2) AS eigenvalue
FROM (
  SELECT pos, c * (CASE WHEN (SELECT SUM(CASE WHEN c > 0 THEN 1 ELSE -1 END
                                           * abs(c)) FROM v{_PCA_ROUNDS}) >= 0
                        THEN 1 ELSE -1 END) AS loading,
    row_number() OVER (ORDER BY abs(c) DESC, pos) AS rk
  FROM v{_PCA_ROUNDS})
WHERE rk <= 8
"""
    return sql


@register(
    "q403_pca_power_iteration",
    oracle=_q403_oracle(),
    tags=("vector",),
)
def q403_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP PRINCIPAL COMPONENT of the embedding store by POWER
    ITERATION on q402's Gram matrix: v ← G·v/‖G·v‖ from the uniform
    start, 5 rounds — each round is one 64-row-keyed equi-join + one
    hash agg over the 2080-entry matrix frame, i.e. CONSTANT work
    after the one corpus-wide Gram pass, which is exactly why
    power-iteration PCA scales to 100 TB of vectors while full SVD
    does not. Sign is fixed by the sum-of-components convention
    (eigenvectors are sign-ambiguous; both engines apply the same
    rule), the eigenvalue is the Rayleigh quotient vᵀGv, and the
    top-8 loadings surface by magnitude (TakeOrdered). The matrix is
    localCheckpoint-pinned before the loop (the q360 lineage
    discipline). Oracle: the identical trajectory unrolled in
    MATERIALIZED CTEs."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select(
        "vec_id", F.posexplode("v").alias("p0", "x")
    ).select("vec_id", (F.col("p0") + 1).alias("pos"), "x")
    a, b = ex.alias("a"), ex.alias("b")
    g_u = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.pos") <= F.col("b.pos")),
        )
        .groupBy(F.col("a.pos").alias("i"), F.col("b.pos").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("gval"))
    )
    g = (
        g_u.unionAll(
            g_u.filter(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "gval"
            )
        )
        .repartition("j")
        .transform(checkpoint_df)
    )
    v = g.select(F.col("i").alias("pos")).distinct().select(
        "pos", F.lit(0.125).alias("c")
    )
    w = None
    v_prev = None
    for _ in range(_PCA_ROUNDS):
        v_prev = v
        w = (
            g.join(F.broadcast(v.withColumnRenamed("pos", "j")), "j")
            .groupBy(F.col("i").alias("pos"))
            .agg(F.sum(F.col("gval") * F.col("c")).alias("wc"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("wc") * F.col("wc"))).alias("nrm"))
        v = (
            w.crossJoin(F.broadcast(nrm))
            .select("pos", (F.col("wc") / F.col("nrm")).alias("c"))
            .transform(checkpoint_df)
        )
    eig = (
        w.join(v_prev.withColumnRenamed("c", "cp"), "pos")
        .agg(F.sum(F.col("wc") * F.col("cp")).alias("eig"))
    )
    sign = v.agg(
        F.when(F.sum("c") >= 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("sg")
    )
    ranked = topn_ranked(
        v.crossJoin(F.broadcast(sign)).select(
            "pos", (F.col("c") * F.col("sg")).alias("loading")
        ),
        [F.abs(F.col("loading")).desc(), F.col("pos")],
        8,
    )
    return ranked.crossJoin(F.broadcast(eig)).select(
        F.col("pos").cast("bigint").alias("dim"),
        F.round("loading", 4).alias("loading"),
        "rk",
        F.round("eig", 2).alias("eigenvalue"),
    )


@register(
    "q419_whitening_isotropy",
    oracle="""
WITH e AS (
  SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
), ex AS (
  SELECT vid, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x FROM e
), stats AS (
  SELECT pos, AVG(x) AS m,
    sqrt((SUM(x * x) - SUM(x) * SUM(x) / COUNT(*)) / (COUNT(*) - 1)) AS sd
  FROM ex GROUP BY pos
), z AS (
  SELECT ex.vid, ex.pos, ex.x, (ex.x - s.m) / s.sd AS zx
  FROM ex JOIN stats s ON s.pos = ex.pos
), pairs AS (
  SELECT a.vid AS va, a.pos,
    a.x AS xa, b.x AS xb, a.zx AS za, b.zx AS zb
  FROM z a JOIN z b ON b.vid = a.vid + 1 AND b.pos = a.pos
), percos AS (
  SELECT va,
    SUM(xa * xb) / sqrt(SUM(xa * xa) * SUM(xb * xb)) AS cos_raw,
    SUM(za * zb) / sqrt(SUM(za * za) * SUM(zb * zb)) AS cos_white
  FROM pairs GROUP BY va
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
  round(AVG(abs(cos_raw)), 4) AS mean_abs_cos_raw,
  round(AVG(abs(cos_white)), 4) AS mean_abs_cos_whitened,
  round(AVG(abs(cos_raw)) - AVG(abs(cos_white)), 4) AS isotropy_gain
FROM percos
""",
    tags=("vector",),
)
def q419_whitening_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding WHITENING and its isotropy payoff, measured: per-dim
    standardization z = (x−μ_d)/σ_d (the cheap diagonal whitening every
    retrieval stack tries first), evaluated by the mean |cosine| over
    consecutive-id vector pairs before vs after — anisotropic
    embedding spaces (the 'narrow cone' pathology of transformer
    embeddings) show mean |cos| ≫ 0, and whitening's job is to push it
    toward 0; the GAIN column is the measured improvement. Pairs are
    deterministic (vid, vid+1) equi-joins — |N| pairs, no sampling RNG,
    no all-pairs. Per-dim stats come from one explode + hash agg
    (q248's shape); per-pair cosines are 64-term folds rounded under
    the q199 ulp contract."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select(
        "vec_id", F.posexplode("v").alias("p0", "x")
    ).select(F.col("vec_id").alias("vid"), (F.col("p0") + 1).alias("pos"), "x")
    stats = ex.groupBy("pos").agg(
        F.avg("x").alias("m"),
        F.sqrt(
            (
                F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    z = ex.join(F.broadcast(stats), "pos").select(
        "vid", "pos", "x", ((F.col("x") - F.col("m")) / F.col("sd")).alias("zx")
    )
    a, b = z.alias("a"), z.alias("b")
    pairs = a.join(
        b,
        (F.col("b.vid") == F.col("a.vid") + 1)
        & (F.col("b.pos") == F.col("a.pos")),
    ).select(
        F.col("a.vid").alias("va"),
        F.col("a.x").alias("xa"),
        F.col("b.x").alias("xb"),
        F.col("a.zx").alias("za"),
        F.col("b.zx").alias("zb"),
    )
    percos = pairs.groupBy("va").agg(
        (
            F.sum(F.col("xa") * F.col("xb"))
            / F.sqrt(
                F.sum(F.col("xa") * F.col("xa"))
                * F.sum(F.col("xb") * F.col("xb"))
            )
        ).alias("cos_raw"),
        (
            F.sum(F.col("za") * F.col("zb"))
            / F.sqrt(
                F.sum(F.col("za") * F.col("za"))
                * F.sum(F.col("zb") * F.col("zb"))
            )
        ).alias("cos_white"),
    )
    return percos.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(F.abs("cos_raw")), 4).alias("mean_abs_cos_raw"),
        F.round(F.avg(F.abs("cos_white")), 4).alias("mean_abs_cos_whitened"),
        F.round(
            F.avg(F.abs("cos_raw")) - F.avg(F.abs("cos_white")), 4
        ).alias("isotropy_gain"),
    )
