"""Corpus-curation operators for LLM training-data pipelines (extends
SURVEY.md §2.11 beyond the reference surface): PII scrubbing,
benchmark-contamination detection, intra-document repetition signals,
domain-mixture resampling, SemDeDup-style embedding pruning, and
tokenizer-fertility accounting.

Scale stories (all pure JVM expressions unless noted):

- PII scrub (q103): three chained ``regexp_replace`` passes — a map-only
  stage, no shuffle, whole-stage codegen. At 100 TB this is the cheapest
  kind of pass there is; the only cost knob is regex complexity.
- Contamination (q104): explode train-doc n-grams and LEFT SEMI join
  against the distinct n-gram set of the eval/benchmark docs. Benchmark
  suites are tiny (≤ millions of n-grams) → the eval side broadcasts and
  the 100 TB train side never shuffles; per-doc counts are a map-side
  partial agg on doc_id (already co-located after explode).
- Repetition (q105): per-doc n-gram distinct ratios are array
  expressions (O(doc length) each, no shuffle); the top-term fraction
  uses explode → two-phase hash agg on (doc_id, term), the word-count
  shape — never a per-doc quadratic loop.
- Mixture resampling (q106): one tiny per-language token census
  (broadcast back), then a deterministic md5-gate filter — map-only on
  the corpus. ``df.sample`` is partitioning-dependent; the hash gate
  reproduces the exact same sample on any cluster shape, which is what
  makes a training mixture auditable.
- SemDeDup (q107): a portable hash-least coarse quantizer (broadcast
  centroids, one map-side partial agg) restricts the near-dup pair
  search to within-list (multi-probe=2 for boundary pairs), so the
  pairwise stage is bounded by list size, not corpus size. Semantics:
  drop any vector with a strictly-lower-id neighbor above the cosine
  threshold in a shared probed list — deterministic, order-free, and
  DuckDB-replayable end to end (oracle-backed since round 7).
- Fertility (q108): plain two-phase hash agg per (lang, source) over
  regexp token counts; byte counts via octet_length (UTF-8 aware on
  both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..functions.ckpt import checkpoint_df
from ..registry import register
from ..functions.compat import sql_portable_hash64
from .analytics import _sql_twin

# RE2-compatible (DuckDB) and Java-compatible (Spark) alike: no
# lookaround, no backreferences.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


def _augmented_text() -> F.Column:
    """The documents fixture is synthetic word salad with no PII, so the
    operator injects a deterministic contact block per doc (derived from
    doc_id alone) and then scrubs it — exercising the real regex path
    end-to-end with an oracle-checkable result."""
    return F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.format_string("%04d", (F.col("doc_id") % 10000).cast("int")),
        F.lit(" ref 123-45-6789"),
    )


_SQL_AUG = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or "
    "+1-555-' || printf('%04d', CAST(doc_id % 10000 AS INT)) || ' ref 123-45-6789'"
)


@register(
    "q103_pii_scrub",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_SQL_AUG} AS t FROM documents),
scrub AS (
  SELECT doc_id, t,
    regexp_replace(regexp_replace(regexp_replace(t,
      '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_PHONE_RE}', '<PHONE>', 'g'),
      '{_SSN_RE}', '<ID>', 'g') AS clean_text
  FROM aug)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INT) AS n_phones,
  CAST(len(regexp_extract_all(t, '{_SSN_RE}')) AS INT) AS n_ids,
  md5(clean_text) AS scrubbed_md5,
  CAST(strlen(clean_text) AS BIGINT) AS scrubbed_bytes,
  NOT regexp_matches(clean_text, '{_EMAIL_RE}|{_PHONE_RE}|{_SSN_RE}') AS is_clean
FROM scrub
""",
    tags=("curation", "llm"),
)
def q103_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count then scrub emails/phones/SSN-shaped ids with
    chained regexp_replace; emit the scrubbed-text md5 (value proof
    without an unbounded text column) and an is_clean re-scan flag."""
    d = load_table(spark, sf_dir, "documents")
    aug = _augmented_text()
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _SSN_RE,
        "<ID>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(aug, F.lit(_SSN_RE)).cast("int").alias("n_ids"),
        F.md5(clean).alias("scrubbed_md5"),
        F.octet_length(clean).cast("bigint").alias("scrubbed_bytes"),
        (~clean.rlike(f"{_EMAIL_RE}|{_PHONE_RE}|{_SSN_RE}")).alias("is_clean"),
    )


def _ngrams(tokens: F.Column, n: int) -> F.Column:
    """Word n-grams as an array expression. Guarded: Spark's sequence()
    runs DESCENDING when start > stop, so short docs must short-circuit
    to an empty array explicitly."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.array_join(F.slice(tokens, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "q104_contamination_check",
    oracle="""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ng AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(t) >= 3
      THEN list_transform(range(1, len(t) - 1),
                          i -> array_to_string(t[i:i+2], ' '))
      ELSE [] END) AS gs
  FROM tk),
eval_ng AS (SELECT DISTINCT unnest(gs) AS g FROM ng WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, unnest(gs) AS g FROM ng WHERE doc_id % 97 <> 0),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams
        FROM train GROUP BY doc_id),
hit AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        FROM train t JOIN eval_ng e ON t.g = e.g GROUP BY t.doc_id)
SELECT tot.doc_id, n_ngrams,
  COALESCE(n_contaminated, 0) AS n_contaminated,
  round(CAST(COALESCE(n_contaminated, 0) AS DOUBLE) / n_ngrams, 6)
    AS contamination_rate
FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
""",
    tags=("curation", "llm"),
)
def q104_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: the held-out set is the
    doc_id % 97 == 0 slice standing in for an eval benchmark; every
    training doc reports how many of its distinct word 3-grams appear
    in the eval n-gram set. 3-grams (not the production 8-13) because
    the fixture vocabulary is ~40 words; the plan shape is n-agnostic.
    Eval n-grams broadcast; the train side never shuffles for the semi
    join, then aggregates on the exploded doc_id (map-side partials)."""
    d = load_table(spark, sf_dir, "documents")
    ng = d.select(
        "doc_id", F.array_distinct(_ngrams(F.split("text", " "), 3)).alias("gs")
    )
    eval_ng = (
        ng.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
    )
    train = ng.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.explode("gs").alias("g")
    )
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hit = (
        train.join(F.broadcast(eval_ng), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return tot.join(hit, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        F.round(
            F.coalesce("n_contaminated", F.lit(0)).cast("double")
            / F.col("n_ngrams"),
            6,
        ).alias("contamination_rate"),
    )


@register(
    "q105_repetition_stats",
    oracle="""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ngr AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)),
      i -> array_to_string(t[i:i+1], ' ')) ELSE [] END AS g2,
    CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1),
      i -> array_to_string(t[i:i+2], ' ')) ELSE [] END AS g3
  FROM tk),
ngf AS (
  SELECT doc_id,
    CASE WHEN len(g2) > 0 THEN round(
      1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
      ELSE 0.0 END AS dup_2gram_frac,
    CASE WHEN len(g3) > 0 THEN round(
      1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6)
      ELSE 0.0 END AS dup_3gram_frac
  FROM ngr),
cnt AS (SELECT doc_id, term, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(t) AS term FROM tk)
        GROUP BY doc_id, term),
agg AS (SELECT doc_id,
          CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          CAST(MAX(c) AS BIGINT) AS top_cnt
        FROM cnt GROUP BY doc_id)
SELECT agg.doc_id, n_tokens,
  round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
  round(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_term_frac,
  dup_2gram_frac, dup_3gram_frac
FROM agg JOIN ngf ON agg.doc_id = ngf.doc_id
""",
    tags=("curation", "llm"),
)
def q105_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (Gopher-style quality rules):
    type-token ratio, top-term fraction, duplicated 2-/3-gram
    fractions. High duplicate-n-gram fractions mark boilerplate and
    degenerate generations. Term stats go explode → (doc_id, term) hash
    agg (never a per-doc nested loop); n-gram distinct ratios stay
    array-local per row."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("t"))
    g2, g3 = _ngrams(F.col("t"), 2), _ngrams(F.col("t"), 3)

    def dup_frac(g: F.Column) -> F.Column:
        return F.when(
            F.size(g) > 0,
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / F.size(g),
                6,
            ),
        ).otherwise(F.lit(0.0))

    ngf = base.select(
        "doc_id",
        dup_frac(g2).alias("dup_2gram_frac"),
        dup_frac(g3).alias("dup_3gram_frac"),
    )
    cnt = (
        base.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_cnt"),
    )
    return agg.join(ngf, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.col("top_cnt").cast("double") / F.col("n_tokens"), 6).alias(
            "top_term_frac"
        ),
        "dup_2gram_frac",
        "dup_3gram_frac",
    )


# Target language shares for the training mixture (sum to 1.0). A real
# pipeline reads these from a run config; constants keep the operator
# oracle-checkable.
_MIX_TARGETS = {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}

_SQL_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_TARGETS.items()
) + " ELSE 0.0 END"


@register(
    "q106_domain_mixture",
    oracle=f"""
WITH dt AS (SELECT doc_id, lang,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents),
census AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_toks FROM dt GROUP BY lang),
tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total_toks FROM dt),
rates AS (SELECT lang,
            least(CAST(1.0 AS DOUBLE),
                  ({_SQL_MIX_CASE}) * total_toks / lang_toks) AS rate
          FROM census, tot)
SELECT doc_id, dt.lang, n_tok, round(rate, 6) AS sample_rate
FROM dt JOIN rates ON dt.lang = rates.lang
WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
      / 16777216.0 < rate
""",
    tags=("curation", "sampling", "llm"),
)
def q106_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixture resampling: census per-language token
    mass, derive the per-language keep rate that moves the corpus
    toward the target shares (capped at 1.0 — upsampling is a separate
    epoch-weighting concern), then take a deterministic md5-gate sample
    at that rate. Hash gating (not df.sample) makes the mixture
    reproducible on any cluster shape/partitioning — auditable
    training data. The census is |languages| rows → broadcast back;
    the corpus pass is map-only."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    census = dt.groupBy("lang").agg(F.sum("n_tok").alias("lang_toks"))
    total = dt.groupBy().agg(F.sum("n_tok").alias("total_toks"))
    target = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _MIX_TARGETS.items()
        ],
        F.lit(0.0),
    )
    rates = census.crossJoin(F.broadcast(total)).select(
        "lang",
        F.least(
            F.lit(1.0), target * F.col("total_toks") / F.col("lang_toks")
        ).alias("rate"),
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        / F.lit(16777216.0)
    )
    return (
        dt.join(F.broadcast(rates), "lang")
        .filter(gate < F.col("rate"))
        .select("doc_id", "lang", "n_tok", F.round("rate", 6).alias("sample_rate"))
    )


def _q107_oracle() -> str:
    from ..functions.compat import sql_portable_hash64

    h = sql_portable_hash64("CAST(vec_id AS VARCHAR)")

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b})))"
        )

    return f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
copies AS (
  SELECT vec_id + 100000 AS vec_id, list_prepend(v[1] * 1.05, v[2:]) AS v
  FROM base WHERE vec_id < 50
),
e AS (SELECT * FROM base UNION ALL SELECT * FROM copies),
ks AS (SELECT greatest(8, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS k FROM e),
seeds AS (
  SELECT vec_id, v FROM (
    SELECT vec_id, v,
      row_number() OVER (ORDER BY {h}, vec_id) AS hrk
    FROM e)
  WHERE hrk <= (SELECT k FROM ks)
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS c_id, v AS cv
  FROM seeds
),
ranked AS (
  SELECT x.vec_id, c.c_id, x.v,
    row_number() OVER (PARTITION BY x.vec_id
                       ORDER BY round({cos("x.v", "c.cv")}, 5) DESC,
                                c.c_id) AS crk
  FROM e x CROSS JOIN cent c
),
asg AS (SELECT vec_id, c_id, v FROM ranked WHERE crk = 1),
member AS (SELECT vec_id, c_id, v FROM ranked WHERE crk <= 2),
dup AS (
  SELECT b.vec_id, round(MAX({cos("a.v", "b.v")}), 6) AS max_sim_to_lower
  FROM member a JOIN member b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
  WHERE {cos("a.v", "b.v")} >= 0.92
  GROUP BY b.vec_id
)
SELECT a.vec_id, a.c_id,
  d.vec_id IS NULL AS kept,
  COALESCE(d.max_sim_to_lower, 0.0) AS max_sim_to_lower
FROM asg a LEFT JOIN dup d ON d.vec_id = a.vec_id
"""


@register(
    "q107_semdedup",
    oracle=_q107_oracle(),
    tags=("curation", "dedup", "llm", "vector"),
)
def q107_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning: cluster embeddings with a
    coarse quantizer, then inside each cluster drop every vector that
    has a strictly-lower-id neighbor with cosine ≥ τ. Clustering
    bounds the pairwise stage to cluster size (vs corpus-quadratic);
    the min-id rule is deterministic and order-free, so results are
    reproducible across cluster shapes.

    Oracle-backed since round 7 (VERDICT r06 ask #3, the q271/q83f
    playbook): the quantizer is the k hash-least PORTABLE seed vectors
    (md5-derived order, no engine RNG, no Lloyd float drift) and the
    assignment key is round(cosine, 5) with smallest-c_id tiebreak —
    the whole cluster-then-prune pipeline replays in DuckDB and the
    kept/dropped sets hash-check. The in-cluster threshold compares
    RAW cosines (both engines fold sequentially — bit-identical), per
    the threshold contract; only surfaced values round.

    k SCALES with the corpus — k = max(8, ceil(√N)), mirrored in the
    oracle via a row_number ≤ (SELECT k) seed cut (round-7 full-
    registry 20× probe catch: the original FIXED k=8 made cluster size
    N/8, so the intra-cluster pair stage was corpus-QUADRATIC — the
    exact failure SemDeDup's clustering exists to prevent; the probe
    hung past 20 minutes at 40 k vectors). √N balances the two terms:
    assignment is N·√N broadcast-join rows and the pair stage is
    N·√N-bounded; measured 20 min+ → 78 s at the 20× replica, and
    31 s with the per-vector norm precompute below. At
    100 TB the centroid frame itself outgrows one broadcast — the
    documented next step is the standard two-level quantizer (√k
    super-lists over the same portable ordering), which changes k's
    growth law, not this query's shape.

    Multi-probe prune (probe=2): each vector participates in its TWO
    nearest lists for the pair search (reported c_id stays the argmax
    list). A near-dup pair straddling a Voronoi boundary is invisible
    to single-assignment SemDeDup — both members sit near the same
    boundary, so their top-2 list sets overlap and the pair is found
    at 2× (not quadratic) cost. Found one real split on the sf0.001
    fixture (vec 38 vs its copy).

    The fixture's 500 embeddings are near-orthogonal (max pairwise
    cosine 0.51 — no natural near-dups), so the operator injects a
    deterministic near-identical copy of every vec_id < 50 at
    vec_id + 100000 (one coordinate scaled 5%); the prune must drop
    exactly the injected copies and keep every original."""
    from ..functions.compat import portable_hash64
    from ..functions.ranking import topn_ranked
    from ..functions.vectors import cosine

    tau = 0.92
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    copies = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x * F.lit(1.05)).otherwise(
                x.cast("double")
            )
        ).alias("v"),
    )
    from ..functions.vectors import dot

    # Per-vector norm precomputed ONCE (sqrt(dot(v,v)) is a pure
    # function of v, so dot(a,b)/(na*nb) is bit-identical to
    # cosine(a,b) — same ops, same order): drops the fold count per
    # scored pair from 3 to 1 across both the assignment and the
    # in-cluster pair stage (measured 78 → 30 s at the 20× replica).
    e_all = base.unionAll(copies)
    # EXACT-DUP PRE-COLLAPSE (round-9, driven by the 40x two-point
    # probe: slope 2.0 — the key-shifted replicas hold F identical
    # copies of every vector, and identical-vector cliques cost F²
    # in the pair stage; dup-heavy corpora are exactly SemDeDup's
    # target input, so this is a production property, not a replica
    # artifact). Collapse byte-identical vectors to their min-id
    # representative BEFORE clustering; expand afterwards. Provably
    # result-identical: a clique's non-representatives are dups by
    # definition (cosine of identical vectors = 1 ± ulp → rounds to
    # 1.0 ≥ τ, and the representative holds the clique's min id), a
    # clique's cosine against any other vector is one value shared by
    # every member, and the min-id condition against outside vectors
    # is decided by the representative's id (= the clique minimum).
    # On the fixtures no two vectors are byte-identical (the injected
    # near-copies differ in one coordinate), so the collapse is a
    # no-op there and the oracle replays unchanged.
    reps = e_all.groupBy("v").agg(F.min("vec_id").alias("rep_id"))
    members = e_all.join(reps, "v").select("vec_id", "rep_id")
    e = (
        e_all.join(
            members.filter(F.col("vec_id") == F.col("rep_id")).select(
                "vec_id"
            ),
            "vec_id",
            "left_semi",
        )
        .withColumn("nv", F.sqrt(dot(F.col("v"), F.col("v"))))
    )
    # k = max(8, ceil(sqrt(N))): one bounded-scalar count() action —
    # the oracle computes the identical k in its ks CTE
    import math

    k = max(8, math.ceil(math.sqrt(e.count())))
    seeds = topn_ranked(
        e.withColumn("_h", portable_hash64(F.col("vec_id").cast("string"))),
        [F.col("_h"), F.col("vec_id")],
        k,
        rank_name="_hrk",
    ).drop("_h", "_hrk")
    cent = topn_ranked(seeds, [F.col("vec_id")], k, rank_name="c_id").select(
        "c_id", F.col("v").alias("cv"), F.col("nv").alias("ncv")
    )
    # top-2 lists per vector in ONE map-side partial agg (collect the
    # k (sim, -c_id) structs, sort desc, slice) — no N×k shuffle, no
    # second argmax pass; struct order ≡ the oracle's (sim DESC, c_id)
    probed = (
        e.join(F.broadcast(cent))
        .select(
            "vec_id",
            "v",
            "nv",
            F.struct(
                F.round(
                    dot(F.col("v"), F.col("cv"))
                    / (F.col("nv") * F.col("ncv")),
                    5,
                ).alias("s"),
                (-F.col("c_id")).alias("nc"),
            ).alias("_key"),
            "c_id",
        )
        .groupBy("vec_id")
        .agg(
            F.any_value("v").alias("v"),
            F.any_value("nv").alias("nv"),
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_key"), F.col("c_id"))),
                    asc=False,
                ),
                1,
                2,
            ).alias("_top2"),
        )
    )
    assigned = probed.select(
        "vec_id", F.col("_top2")[0]["c_id"].alias("c_id"), "v"
    )
    member = probed.select(
        "vec_id", F.explode("_top2").alias("_m"), "v", "nv"
    ).select("vec_id", F.col("_m.c_id").alias("c_id"), "v", "nv")
    a = member.select(
        F.col("c_id"),
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("nv").alias("n_a"),
    )
    b = member.select(
        F.col("c_id"),
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("nv").alias("n_b"),
    )
    dup = (
        a.join(b, ["c_id"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")),
        )
        .filter(F.col("cos") >= tau)
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.round(F.max("cos"), 6).alias("max_sim_to_lower"))
    )
    rep_result = assigned.join(dup, "vec_id", "left").select(
        "vec_id",
        "c_id",
        F.col("max_sim_to_lower").isNull().alias("kept"),
        F.coalesce("max_sim_to_lower", F.lit(0.0)).alias("max_sim_to_lower"),
    )
    # expand the collapsed cliques: every non-representative copy is a
    # drop at similarity 1.0, carrying its representative's cluster
    dup_copies = (
        members.filter(F.col("vec_id") != F.col("rep_id"))
        .join(
            rep_result.select(F.col("vec_id").alias("rep_id"), "c_id"),
            "rep_id",
        )
        .select(
            "vec_id",
            "c_id",
            F.lit(False).alias("kept"),
            F.lit(1.0).alias("max_sim_to_lower"),
        )
    )
    return rep_result.unionByName(dup_copies).orderBy("vec_id")


@register(
    "q108_tokenizer_fertility",
    oracle="""
SELECT lang, source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS BIGINT)
    AS bpe_ish_tokens,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
  CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
  round(CAST(SUM(strlen(text)) AS DOUBLE)
        / SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]'))), 6)
    AS bytes_per_token,
  round(CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS DOUBLE)
        / SUM(len(string_split(text, ' '))), 6) AS fertility
FROM documents
GROUP BY lang, source
""",
    tags=("curation", "text", "llm"),
)
def q108_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility accounting per (lang, source): BPE-ish token
    counts (q85f's GPT-2-style pre-tokenizer regex) vs bytes and
    whitespace words — the corpus-costing numbers (bytes/token,
    tokens/word) that size a training run and expose languages a
    tokenizer fragments badly. Two-phase hash agg; the regex runs
    map-side once per doc."""
    d = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit("([a-z]+|[0-9]|[^a-z0-9 ])"), 0))
    ws = F.size(F.split("text", " "))
    nb = F.octet_length("text")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bpe).alias("bpe_ish_tokens"),
            F.sum(ws).alias("ws_tokens"),
            F.sum(nb).alias("n_bytes"),
            F.round(
                F.sum(nb).cast("double") / F.sum(bpe), 6
            ).alias("bytes_per_token"),
            F.round(F.sum(bpe).cast("double") / F.sum(ws), 6).alias("fertility"),
        )
    )


@register(
    "q136_weighted_sample",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang,
    round(
      pow(
        (('0x' || substring(md5(doc_id::VARCHAR || ':ws'), 1, 15))::BIGINT + 1)
          / 1152921504606846977.0,
        1.0 / greatest(n_chars, 1)
      ), 9) AS k
  FROM documents
)
SELECT lang, doc_id, rk FROM (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rk
  FROM keyed)
WHERE rk <= 20
""",
    tags=("curation", "llm"),
)
def q136_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, 20 docs per
    language, weight = document length: Efraimidis–Spirakis priorities
    (key = u^(1/w), keep the k largest) with the uniform u derived from
    md5(doc_id) instead of an RNG — so the sample is a pure function of
    the data, reproducible on any cluster shape / partition count,
    cross-engine verifiable (the oracle recomputes identical keys), and
    auditable (the mixture-sampling requirement q106 documents). Keys
    are rounded to 9 digits with a doc_id tiebreak so rank boundaries
    cannot flip on last-ulp libm differences. Map-only key computation;
    one shuffle on lang for the per-group top-k."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(float(16**15 + 1))
    key = F.round(
        F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1))), 9
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("k").desc(), F.col("doc_id"))
    return (
        d.select("doc_id", "lang", key.alias("k"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", "rk")
    )


@register(
    "q153_quality_classifier_score",
    oracle="""
WITH f AS (
  SELECT doc_id, lang,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      / len(string_split(text, ' ')) AS distinct_ratio,
    CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
      / length(text) AS alpha_ratio,
    CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
      AS chars_per_token
  FROM documents
), z AS (
  SELECT doc_id, lang,
    -2.0 + 0.01 * n_tokens + 3.0 * distinct_ratio
         + 1.5 * alpha_ratio - 0.1 * chars_per_token AS logit
  FROM f
)
SELECT doc_id, lang,
  round(logit, 6) AS logit,
  round(1.0 / (1.0 + exp(-logit)), 6) AS quality_score,
  (1.0 / (1.0 + exp(-logit)) >= 0.5) AS keep
FROM z
""",
    tags=("curation", "llm"),
)
def q153_quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring — the linear-classifier stand-in for
    the fasttext/logreg quality filters real corpus pipelines run
    (score = σ(w·features), keep if ≥ threshold). Weights here are
    fixed literals so the oracle can replay the exact arithmetic; a
    trained model swaps in the same way — coefficients are a broadcast
    of a few KB and scoring stays a map-side JVM expression
    (whole-stage codegen, no Python, no shuffle). Only a *non-linear*
    model (trees, a neural scorer) would need the pandas-UDF boundary.

    Feature extraction is shared with q86's hand-rule filter — the
    point of the pair: same features, rule-based vs learned decision,
    both one scan. Scores/logits round(6) both sides (exp is libm);
    the keep flag compares the unrounded score on both sides."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    n_tokens = F.size(tokens).cast("double")
    distinct_ratio = F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens)
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-z ]", "")).cast("double")
        / F.length("text")
    )
    cpt = F.length("text").cast("double") / F.size(tokens)
    logit = (
        F.lit(-2.0)
        + F.lit(0.01) * n_tokens
        + F.lit(3.0) * distinct_ratio
        + F.lit(1.5) * alpha_ratio
        - F.lit(0.1) * cpt
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return d.select(
        "doc_id",
        "lang",
        F.round(logit, 6).alias("logit"),
        F.round(score, 6).alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


@register(
    "q162_deterministic_shuffle",
    oracle="""
SELECT doc_id,
  CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':shuf'), 1, 15)
       AS BIGINT) % 8 AS INTEGER) AS shard,
  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':shuf'), 1, 15)
       AS BIGINT) AS shuffle_key
FROM documents
""",
    tags=("curation", "llm"),
)
def q162_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible pre-training shuffle: every document gets a stable
    pseudo-random 60-bit key (md5 of its id) and a shard assignment —
    a pure function of the data, identical on any cluster shape or
    engine, unlike ``df.sample``/``rand()``. The downstream writer gets
    a global shuffle for free via ``partitionBy(shard)`` +
    ``sortWithinPartitions(shuffle_key)``: no global sort, no window,
    no driver-side position counter — the assignment itself is map-only
    with ZERO shuffles at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    hex15 = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuf"))), 1, 15
    )
    key = F.conv(hex15, 16, 10).cast("long")
    return d.select(
        "doc_id",
        F.pmod(key, F.lit(8)).cast("int").alias("shard"),
        key.alias("shuffle_key"),
    )


@register(
    "q169_exposure_weights",
    oracle="""
WITH copies AS (
  SELECT md5(text) AS content_key, COUNT(*) AS n_copies
  FROM documents GROUP BY md5(text)
)
SELECT d.doc_id, c.n_copies,
  round(1.0 / c.n_copies, 6) AS train_weight
FROM documents d JOIN copies c ON md5(d.text) = c.content_key
""",
    tags=("curation", "llm"),
)
def q169_exposure_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-exposure control: every document's training weight is
    1/n_copies of its exact content hash, so duplicated content
    contributes one document's worth of gradient signal no matter how
    many times the crawl re-collected it — the soft alternative to
    hard-dropping dups (and the knob epoch-capping schemes build on).

    Plan shape: one hash-groupBy on md5(text) (the q81 shuffle) and
    one shuffle join back on the same key — two passes over (hash,
    id)-sized rows, linear at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    key = F.md5("text").alias("content_key")
    copies = d.groupBy(key).agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        d.select("doc_id", key)
        .join(copies, "content_key")
        .select(
            "doc_id",
            "n_copies",
            F.round(1.0 / F.col("n_copies"), 6).alias("train_weight"),
        )
    )


@register(
    "q170_temperature_mixture",
    oracle="""
WITH census AS (
  SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
), scored AS (
  SELECT *,
    pow(n_tokens / CAST((SELECT SUM(n_tokens) FROM census) AS DOUBLE),
        0.7) AS raw
  FROM census
)
SELECT lang, n_docs, n_tokens,
  round(n_tokens / CAST((SELECT SUM(n_tokens) FROM census) AS DOUBLE), 6)
    AS natural_share,
  round(raw / (SELECT SUM(raw) FROM scored), 6) AS sampled_share,
  round((raw / (SELECT SUM(raw) FROM scored))
        / (n_tokens / CAST((SELECT SUM(n_tokens) FROM census) AS DOUBLE)),
        6) AS upsample_factor
FROM scored
""",
    tags=("curation", "llm"),
)
def q170_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (α = 0.7): sampled share ∝
    (natural token share)^α, the standard multilingual rebalancing —
    α < 1 upsamples tail languages and downsamples the head (the
    upsample_factor column is the rate a sampler would apply per
    language).

    Plan shape: one token census per language (|langs| groups), then
    pure scalar math on a broadcast-size table — two 1-row global
    aggregates ride along as broadcast cross joins. The corpus is
    scanned exactly once at any scale.
    """
    alpha = 0.7
    d = load_table(spark, sf_dir, "documents")
    census = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    tot = census.agg(F.sum("n_tokens").cast("double").alias("total_tokens"))
    scored = census.crossJoin(F.broadcast(tot)).withColumn(
        "raw", F.pow(F.col("n_tokens") / F.col("total_tokens"), alpha)
    )
    zsum = scored.agg(F.sum("raw").alias("z"))
    nat = F.col("n_tokens") / F.col("total_tokens")
    samp = F.col("raw") / F.col("z")
    return (
        scored.crossJoin(F.broadcast(zsum))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(nat, 6).alias("natural_share"),
            F.round(samp, 6).alias("sampled_share"),
            F.round(samp / nat, 6).alias("upsample_factor"),
        )
    )


@register(
    "q173_semantic_contamination",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id,
        list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
      FROM e),
ev AS (SELECT vec_id AS eval_id, nv AS ev_v FROM n
       WHERE vec_id % 50 = 0 AND vec_id < 2500),
tr AS (SELECT vec_id AS train_id, nv AS tr_v FROM n WHERE vec_id % 50 <> 0),
scored AS (
  SELECT eval_id, train_id,
    round(list_dot_product(ev_v, tr_v), 6) AS c
  FROM ev CROSS JOIN tr)
SELECT eval_id, train_id AS nearest_train_id, c AS max_cosine,
  (c >= 0.9) AS contaminated
FROM (SELECT *, row_number() OVER (PARTITION BY eval_id
                                   ORDER BY c DESC, train_id) AS rk
      FROM scored)
WHERE rk = 1
""",
    tags=("curation", "llm", "vector"),
)
def q173_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic
    companion to q104's n-gram check: paraphrased eval leakage that
    shares no n-grams still lands at cosine ≈ 1. The bounded eval
    slice (vec_id % 50 = 0 below a fixed ceiling — a benchmark is a
    FIXED-size artifact, it must not grow with the corpus) stands in
    for the benchmark; every eval vector reports its nearest TRAINING
    vector and whether it crosses the contamination threshold (0.9 —
    standard SemDeDup/decontamination territory).

    Plan shape: the eval set is bounded → broadcast; the 100 TB
    training side streams once and partially aggregates map-side down
    to |eval| rows (max_by keyed on eval_id). Both sides are
    unit-normalized BEFORE pairing, so each pair costs ONE sequential
    fold instead of dot+two norms — measured 3× on the 20× replica
    (the norms are map-side, amortized over |eval| pairings). Scan
    cost is |eval|·N fold evaluations: exact and oracle-checkable, the
    right shape for nightly decontamination runs; for much larger
    query sets swap the scoring kernel for q83e's Arrow matmul (same
    output columns, rows-only check). Determinism: cosines are rounded
    BEFORE the argmax and ties break to the smallest train_id on both
    engines. The fixtures' near-orthogonal vectors legitimately flag
    nothing; pytest injects a verbatim eval copy into train and
    asserts it flags.
    """
    from ..functions.vectors import dot, normalize

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", normalize(F.col("embedding")).alias("nv")
    )
    ev = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2500)).select(
        F.col("vec_id").alias("eval_id"), F.col("nv").alias("ev_v")
    )
    tr = e.filter(F.col("vec_id") % 50 != 0).select(
        F.col("vec_id").alias("train_id"), F.col("nv").alias("tr_v")
    )
    scored = (
        tr.join(F.broadcast(ev))
        .select(
            "eval_id",
            "train_id",
            F.round(dot(F.col("ev_v"), F.col("tr_v")), 6).alias("c"),
        )
    )
    best = scored.groupBy("eval_id").agg(
        F.max_by(
            "train_id", F.struct(F.col("c"), (-F.col("train_id")).alias("_t"))
        ).alias("nearest_train_id"),
        F.max("c").alias("max_cosine"),
    )
    return best.select(
        "eval_id",
        "nearest_train_id",
        "max_cosine",
        (F.col("max_cosine") >= 0.9).alias("contaminated"),
    )


@register(
    "q174_source_overlap",
    oracle="""
WITH words AS (SELECT source, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT source, g FROM (
  SELECT source, unnest(CASE WHEN len(t) >= 3
    THEN list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))
    ELSE [] END) AS g FROM words)),
tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY source),
pairs AS (SELECT a.source AS sa, b.source AS sb,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
          GROUP BY 1, 2)
SELECT sa AS source_a, sb AS source_b, shared AS n_shared,
  ta.n AS n_grams_a, tb.n AS n_grams_b,
  round(CAST(shared AS DOUBLE) / least(ta.n, tb.n), 6) AS overlap_coeff
FROM pairs JOIN tot ta ON sa = ta.source JOIN tot tb ON sb = tb.source
""",
    tags=("curation", "llm"),
)
def q174_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap matrix: for every pair of corpus
    sources, how many distinct word 3-grams they share and the overlap
    coefficient |A∩B| / min(|A|,|B|) — the census a curation pipeline
    runs before mixing crawls (a mirror site shows up as a ~1.0 cell;
    an aggregator as a high row). 3-grams for the same fixture-
    vocabulary reason as q104.

    Plan shape: the matrix is |sources|² (a SMALL dimension — 20 here,
    thousands at worst) but is computed without ever pairing documents:
    distinct (source, gram) pairs → self-join on the gram key → count
    per source pair. Per-gram work is (sources containing it)² ≤
    |sources|², bounded by the source dimension, never by corpus size;
    the distinct and the pair count are both word-count-shaped
    two-phase aggs. Totals are a |sources|-row broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.select(
            "source",
            F.explode(_ngrams(F.split("text", " "), 3)).alias("g"),
        )
        .distinct()
    )
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "g")
    b = sh.select(F.col("source").alias("source_b"), "g")
    pairs = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_grams_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_grams_b"))
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_grams_a",
            "n_grams_b",
            F.round(
                F.col("n_shared")
                / F.least("n_grams_a", "n_grams_b").cast("double"),
                6,
            ).alias("overlap_coeff"),
        )
    )


@register(
    "q175_quality_calibration",
    oracle="""
WITH t AS (SELECT doc_id, source,
  -- UNROUNDED: the same two-divide/one-multiply double expression as
  -- the engine ⇒ bitwise-equal values. Rounding here is a trap: these
  -- are ratios of small integers, which land exactly on 6th-decimal
  -- halfway points where Spark rounds HALF_UP and DuckDB half-to-even
  -- (caught by the sf0.1 cross-scale gate at 2.0578125).
  (CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')))
        * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' '))) AS raw_score
  FROM documents)
SELECT doc_id, source, raw_score,
  round(percent_rank() OVER (PARTITION BY source ORDER BY raw_score), 6)
    AS calib_pct,
  CAST(ntile(10) OVER (PARTITION BY source ORDER BY raw_score, doc_id)
       AS INT) AS calib_decile
FROM t
""",
    tags=("curation", "llm"),
)
def q175_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score calibration: raw heuristic scores are
    not comparable across sources (a wiki crawl and a forum crawl have
    different score distributions), so curation pipelines rank-
    normalize per source before applying one corpus-wide keep
    threshold. Emits each doc's raw score, its within-source
    percent_rank (uniform [0,1] per source by construction) and
    decile.

    Plan shape: features are map-side; the only wide op is one window
    partitioned by source. Source is a mid-cardinality key whose
    partitions can be large — at the scale where one source outgrows
    a task, switch the rank to the q50b two-phase range-partitioned
    shape (same output, oracle-identical). Determinism: percent_rank
    is a pure function of the value order (ties share a rank), and
    the decile orders by (score, doc_id) — unique, so ntile's
    row-order dependence never bites.
    """
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    # unrounded on purpose — see the oracle comment (halfway-rounding
    # divergence on dyadic small-int ratios); the op sequence matches
    # the oracle exactly, so the doubles are bitwise equal
    raw = (F.length("text").cast("double") / F.size(tokens)) * (
        F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens)
    )
    t = d.select("doc_id", "source", raw.alias("raw_score"))
    from pyspark.sql import Window

    wp = Window.partitionBy("source").orderBy("raw_score")
    wd = Window.partitionBy("source").orderBy("raw_score", "doc_id")
    return t.select(
        "doc_id",
        "source",
        "raw_score",
        F.round(F.percent_rank().over(wp), 6).alias("calib_pct"),
        F.ntile(10).over(wd).cast("int").alias("calib_decile"),
    )


@register(
    "q176_corpus_datasheet",
    oracle="""
WITH d AS (SELECT lang, source, doc_id, md5(text) AS h,
                  len(string_split(text, ' ')) AS nt
           FROM documents),
dupc AS (SELECT h, COUNT(*) AS c FROM d GROUP BY h),
tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS corpus_tokens FROM d)
SELECT lang, source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(nt) AS BIGINT) AS n_tokens,
  round(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS avg_doc_tokens,
  CAST(MIN(nt) AS BIGINT) AS min_doc_tokens,
  CAST(MAX(nt) AS BIGINT) AS max_doc_tokens,
  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
  round(CAST(SUM(nt) AS DOUBLE) / ANY_VALUE(t.corpus_tokens), 6)
    AS token_share
FROM d JOIN dupc USING (h) CROSS JOIN tot t
GROUP BY lang, source
""",
    tags=("curation", "llm"),
)
def q176_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datasheet (the "datasheets for datasets" census): one row
    per (lang, source) cell with document/token counts, doc-length
    spread, exact-duplicate incidence, and the cell's share of corpus
    tokens — the artifact published alongside a training corpus and
    the first thing a mixture rebalance (q106/q170) consumes.

    Plan shape: one map pass derives (hash, token count); the dup flag
    is a join against a (hash → count) two-phase agg — shuffles carry
    (32-byte hash, count) pairs only; the datasheet itself is one hash
    agg on the tiny (lang, source) key space, and the corpus-total
    join is a 1-row broadcast. avg is spelled exact-integer-sum ÷
    count so both engines compute one identical division instead of
    order-dependent running means.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("nt"),
    )
    dupc = d.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    tot = d.agg(F.sum("nt").cast("bigint").alias("corpus_tokens"))
    return (
        d.join(dupc, "h")
        .crossJoin(F.broadcast(tot))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("nt").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_doc_tokens"),
            F.min("nt").cast("bigint").alias("min_doc_tokens"),
            F.max("nt").cast("bigint").alias("max_doc_tokens"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.round(
                F.sum("nt").cast("double") / F.any_value("corpus_tokens"), 6
            ).alias("token_share"),
        )
    )


@register(
    "q178_shard_manifest",
    oracle="""
WITH d AS (
  SELECT doc_id,
    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':shuf'), 1, 15)
         AS BIGINT) % 8 AS INTEGER) AS shard,
    CAST('0x' || substring(md5(CAST(text AS VARCHAR)), 1, 15) AS BIGINT)
      AS content_h,
    len(string_split(text, ' ')) AS nt
  FROM documents),
tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS corpus_tokens FROM d)
SELECT shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(nt) AS BIGINT) AS n_tokens,
  round(CAST(SUM(nt) AS DOUBLE) / ANY_VALUE(t.corpus_tokens), 6)
    AS token_share,
  bit_xor(content_h) AS fingerprint
FROM d CROSS JOIN tot t
GROUP BY shard
""",
    tags=("curation", "llm"),
)
def q178_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest — the checksum artifact published next
    to a packaged corpus (q162 assigns the shards; this is the ledger
    consumers verify against): per shard, doc/token counts, token
    share, and a content fingerprint.

    The fingerprint is the bitwise XOR of per-doc 60-bit content
    hashes: commutative and constant-state, so it needs no sort, no
    concatenated-string agg (which would grow with shard size), and
    no order guarantee from the engine — any re-computation on any
    cluster shape reproduces it bit-for-bit, and a single changed/
    missing/duplicated doc flips it. Whole thing is one map pass +
    one 8-group hash agg + a 1-row broadcast total.
    """
    d = load_table(spark, sf_dir, "documents").select(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuf"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(8),
        )
        .cast("int")
        .alias("shard"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long")
        .alias("content_h"),
        F.size(F.split("text", " ")).alias("nt"),
    )
    tot = d.agg(F.sum("nt").cast("bigint").alias("corpus_tokens"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("nt").cast("double") / F.any_value("corpus_tokens"), 6
            ).alias("token_share"),
            F.expr("bit_xor(content_h)").alias("fingerprint"),
        )
    )


@register(
    "q183_corpus_diff",
    oracle="""
WITH cur AS (
  SELECT doc_id, md5(text) AS h, len(string_split(text, ' ')) AS nt
  FROM documents),
prev AS (
  SELECT doc_id,
    md5(CASE WHEN doc_id % 89 = 0 THEN 'legacy ' || text ELSE text END) AS h,
    len(string_split(CASE WHEN doc_id % 89 = 0
                          THEN 'legacy ' || text ELSE text END, ' ')) AS nt
  FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id + 1000000, md5(text), len(string_split(text, ' '))
  FROM documents WHERE doc_id % 101 = 0),
j AS (
  SELECT CASE WHEN p.doc_id IS NULL THEN 'added'
              WHEN c.doc_id IS NULL THEN 'removed'
              WHEN c.h <> p.h THEN 'modified'
              ELSE 'unchanged' END AS change_type,
    COALESCE(c.nt, 0) AS cur_nt, COALESCE(p.nt, 0) AS prev_nt
  FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id)
SELECT change_type,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(cur_nt) AS BIGINT) AS cur_tokens,
  CAST(SUM(cur_nt - prev_nt) AS BIGINT) AS token_delta
FROM j GROUP BY change_type
""",
    tags=("curation", "llm"),
)
def q183_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus release diff — the change summary published between two
    dataset versions (added / removed / modified / unchanged doc and
    token deltas). The "previous release" here is derived
    deterministically from the fixture (drops, edits, and renumbered
    extras), the same injected-defect pattern as q103/q121; in
    production both sides are real snapshots (versioning.VersionedTable
    time-travel reads feed this directly).

    Plan shape: content equality travels as md5 hashes, so the
    full-outer join on doc_id carries (id, 32-byte hash, token count)
    per side — never text; the summary is a 4-group hash agg. One
    shuffle per side at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    cur = d.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("nt"),
    )
    prev_text = F.when(
        F.col("doc_id") % 89 == 0, F.concat(F.lit("legacy "), F.col("text"))
    ).otherwise(F.col("text"))
    prev = (
        d.filter(F.col("doc_id") % 97 != 0)
        .select(
            "doc_id",
            F.md5(prev_text).alias("h"),
            F.size(F.split(prev_text, " ")).alias("nt"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 101 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.md5("text").alias("h"),
                F.size(F.split("text", " ")).alias("nt"),
            )
        )
    )
    return corpus_diff_summary(cur, prev)


def _row_diff(cur_keyed: DataFrame, prev_keyed: DataFrame) -> DataFrame:
    """Shared core over pre-keyed (doc_id, h, nt) frames: one row per
    doc present in either version with its change classification and
    both token counts. The single place the diff semantics live."""
    j = cur_keyed.alias("c").join(
        prev_keyed.alias("p"), F.col("c.doc_id") == F.col("p.doc_id"), "full_outer"
    )
    change = (
        F.when(F.col("p.doc_id").isNull(), F.lit("added"))
        .when(F.col("c.doc_id").isNull(), F.lit("removed"))
        .when(F.col("c.h") != F.col("p.h"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col("c.doc_id"), F.col("p.doc_id")).alias("doc_id"),
        change.alias("change_type"),
        F.coalesce(F.col("c.nt"), F.lit(0)).alias("cur_nt"),
        F.coalesce(F.col("p.nt"), F.lit(0)).alias("prev_nt"),
    )


def _keyed(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("nt"),
    )


def corpus_diff(cur: DataFrame, prev: DataFrame) -> DataFrame:
    """Row-level diff of two (doc_id, text) corpus versions: one row per
    doc present in either side with change_type in added/removed/
    modified/unchanged and both token counts. Feed it two
    ``VersionedTable.read(version=...)`` time-travel frames to diff
    real releases; q183 summarizes it."""
    return _row_diff(_keyed(cur), _keyed(prev))


def corpus_diff_summary(cur_keyed: DataFrame, prev_keyed: DataFrame) -> DataFrame:
    """Summary layer over pre-keyed (doc_id, h, nt) frames (q183's
    internal shape — avoids re-hashing when the caller already built
    hashes, as the oracle-twin query does)."""
    return (
        _row_diff(cur_keyed, prev_keyed)
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("cur_nt").cast("bigint").alias("cur_tokens"),
            F.sum(F.col("cur_nt") - F.col("prev_nt"))
            .cast("bigint")
            .alias("token_delta"),
        )
    )


_LOGIT_SQL = """
  -2.0 + 0.01 * CAST(len(string_split(text, ' ')) AS DOUBLE)
       + 3.0 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')))
       + 1.5 * (CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                / length(text))
       - 0.1 * (CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')))
"""


def _logit_col() -> F.Column:
    tokens = F.split("text", " ")
    return (
        F.lit(-2.0)
        + 0.01 * F.size(tokens).cast("double")
        + 3.0 * (F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens))
        + 1.5
        * (
            F.length(F.regexp_replace("text", "[^a-z ]", "")).cast("double")
            / F.length("text")
        )
        - 0.1 * (F.length("text").cast("double") / F.size(tokens))
    )


@register(
    "q188_decile_lift",
    oracle=f"""
WITH f AS (
  SELECT doc_id, (lang = 'en') AS pos, {_LOGIT_SQL} AS logit
  FROM documents
), ranked AS (
  SELECT pos, ntile(10) OVER (ORDER BY logit DESC, doc_id) AS decile FROM f
), agg AS (
  SELECT decile,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile
), tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS total_pos,
         CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM agg
)
SELECT CAST(decile AS INT) AS decile, n_docs, n_pos,
  round(CAST(n_pos AS DOUBLE) / n_docs, 6) AS pos_rate,
  round(CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE) / t.total_pos, 6)
    AS cum_capture,
  round((CAST(n_pos AS DOUBLE) / n_docs)
        / (CAST(t.total_pos AS DOUBLE) / t.total_docs), 6) AS lift
FROM agg CROSS JOIN tot t
""",
    tags=("curation", "llm"),
)
def q188_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the standard evaluation of a ranking
    classifier (here q153's quality scorer against an is-English
    pseudo-label): rank all docs by score, cut into deciles, and
    report per-decile positive rate, cumulative capture, and lift vs
    base rate. The artifact that answers "if I keep only the top 20%
    by score, what fraction of the good docs do I keep?" — the actual
    threshold-picking question of a quality filter.

    Plan note: the decile cut reproduces ntile(10) EXACTLY but
    distributed — a bucketed global row_number
    (functions/ranking.global_row_number: no single-partition stage)
    plus ntile's closed-form tile assignment (the first N mod 10
    tiles take ⌈N/10⌉ rows, the rest ⌊N/10⌋); the 10-row cumulative
    capture runs through a triangular broadcast self-join, so the
    whole query is WindowExec-free at any corpus size. The cut orders
    by (logit desc, doc_id) — unique → deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    from ..functions.ranking import desc_as_asc, global_ntile

    f = d.select(
        (F.col("lang") == "en").alias("pos"), _logit_col().alias("logit"), "doc_id"
    )
    ranked = global_ntile(
        f, desc_as_asc(F.col("logit")), [F.col("doc_id")], 10, out_name="decile"
    ).select("pos", "decile")
    # the 10-row per-decile agg feeds both sides of the cumulative
    # cross-join below; localCheckpoint pins it so the full scan+ntile
    # pipeline runs once, not per reference (the graph operators'
    # lineage-control pattern — note this makes the PLANS.md audit row
    # show the post-checkpoint plan, as it does for the graph family)
    agg = (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
        )
        .transform(checkpoint_df)
    )
    # one 10×10 cross join yields cumulative capture AND grand totals
    # as conditional/unconditional sums — windowless, single pass
    cum = (
        agg.alias("p")
        .join(
            F.broadcast(
                agg.select("decile", "n_pos", "n_docs").alias("q")
            ),
            F.lit(True),
        )
        .groupBy(F.col("p.decile").alias("decile"))
        .agg(
            F.any_value("p.n_docs").alias("n_docs"),
            F.any_value("p.n_pos").alias("n_pos"),
            F.sum(F.when(F.col("q.decile") <= F.col("p.decile"), F.col("q.n_pos")))
            .cast("bigint")
            .alias("cum_pos"),
            F.sum("q.n_pos").cast("bigint").alias("total_pos"),
            F.sum("q.n_docs").cast("bigint").alias("total_docs"),
        )
    )
    return (
        cum
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_docs",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n_docs"), 6).alias(
                "pos_rate"
            ),
            F.round(
                F.col("cum_pos").cast("double") / F.col("total_pos"), 6
            ).alias("cum_capture"),
            F.round(
                (F.col("n_pos").cast("double") / F.col("n_docs"))
                / (F.col("total_pos").cast("double") / F.col("total_docs")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "q190_auc_roc",
    oracle=f"""
WITH f AS (
  SELECT doc_id, (lang = 'en') AS pos, {_LOGIT_SQL} AS logit FROM documents
), r AS (
  SELECT pos, row_number() OVER (ORDER BY logit, doc_id) AS rk FROM f
), agg AS (
  SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
         SUM(CASE WHEN pos THEN rk ELSE 0 END) AS pos_rank_sum
  FROM r
)
SELECT n_pos, n_neg,
  round((CAST(pos_rank_sum AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2)
        / (CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc
FROM agg
""",
    tags=("curation", "llm"),
)
def q190_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC of the quality scorer against the is-English
    pseudo-label via the Mann-Whitney rank-sum identity: AUC =
    (Σ ranks(positives) − n₊(n₊+1)/2) / (n₊·n₋) — no threshold sweep,
    no trapezoid integration, one ranking pass. The single
    discrimination number reported next to q188's decile table.

    Ties: row_number with a doc_id tiebreak (identical on both
    engines) — the fixture's continuous-ish scores make exact score
    ties measure-zero; with heavily quantized scores switch to average
    ranks (rank() + count)/2. The global rank is computed EXACTLY but
    distributed (functions/ranking.global_row_number): score-quantile
    buckets + per-bucket offsets + partitioned within-bucket windows —
    no single-partition stage, same integer ranks, same hash."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.ranking import global_row_number

    f = d.select(
        (F.col("lang") == "en").alias("pos"),
        _logit_col().alias("logit"),
        "doc_id",
    )
    r = global_row_number(f, F.col("logit"), [F.col("doc_id")]).select("pos", "rk")
    agg = r.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("bigint").alias("n_neg"),
        F.sum(F.when(F.col("pos"), F.col("rk")).otherwise(0)).alias("pos_rank_sum"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (
                F.col("pos_rank_sum").cast("double")
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2
            )
            / (F.col("n_pos").cast("double") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


@register(
    "q191_calibration_brier",
    oracle=f"""
WITH f AS (
  SELECT (lang = 'en') AS pos,
    1.0 / (1.0 + exp(-({_LOGIT_SQL}))) AS p
  FROM documents
), b AS (
  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bucket, pos, p FROM f
)
SELECT bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  round(SUM(p) / COUNT(*), 6) AS mean_predicted,
  round(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
    AS observed_rate,
  round(SUM((p - CASE WHEN pos THEN 1.0 ELSE 0.0 END)
            * (p - CASE WHEN pos THEN 1.0 ELSE 0.0 END)) / COUNT(*), 6)
    AS brier
FROM b GROUP BY bucket
""",
    tags=("curation", "llm"),
)
def q191_calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve + per-bin Brier score for the quality scorer:
    predictions bucketed into ten probability bins, each reporting
    mean predicted probability vs observed positive rate (the
    reliability diagram's points — a well-calibrated scorer has them
    equal) and its Brier contribution. The diagnostic that says
    whether q153's scores can be *thresholded on probability* or only
    *ranked* (q188/q190 measure ranking; this measures probability
    truthfulness).

    Plan shape: pure map (score + bucket) into a 10-group hash agg —
    no global window at all, fully scalable as-is. Sum-of-double
    ordering: mean_predicted/brier sums are rounded AFTER an exact
    agreement on addends... both engines sum the same doubles in
    arbitrary order, so round(, 6) absorbs the reorder ulps (q43
    stats-agg precedent)."""
    d = load_table(spark, sf_dir, "documents")
    p = 1.0 / (1.0 + F.exp(-_logit_col()))
    y = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    b = d.select(
        F.least(F.floor(p * 10), F.lit(9)).cast("int").alias("bucket"),
        p.alias("p"),
        y.alias("y"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.sum("p") / F.count(F.lit(1)), 6).alias("mean_predicted"),
        F.round(F.sum("y") / F.count(F.lit(1)), 6).alias("observed_rate"),
        F.round(
            F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y")))
            / F.count(F.lit(1)),
            6,
        ).alias("brier"),
    )


@register(
    "q225_source_jsd",
    oracle="""
WITH c AS (
  SELECT source, CAST(LEAST(FLOOR(n_chars / 50.0), 11) AS INTEGER) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM c GROUP BY 1),
grid AS (
  SELECT t.source, b.bucket, t.tot,
    CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / (t.tot + 12) AS p
  FROM t CROSS JOIN generate_series(0, 11) b(bucket)
  LEFT JOIN c ON c.source = t.source AND c.bucket = b.bucket
)
SELECT a.source AS source_a, b.source AS source_b,
  CAST(MAX(a.tot) AS BIGINT) AS n_docs_a,
  CAST(MAX(b.tot) AS BIGINT) AS n_docs_b,
  round(SUM(0.5 * a.p * LN(2 * a.p / (a.p + b.p))
          + 0.5 * b.p * LN(2 * b.p / (a.p + b.p))), 6) AS jsd_nats
FROM grid a JOIN grid b ON a.bucket = b.bucket AND a.source < b.source
GROUP BY 1, 2
""",
    tags=("curation", "stats"),
)
def q225_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two corpus
    sources over the doc-length distribution — the symmetric, bounded
    (≤ ln 2) companion to q120's PSI drift score: PSI monitors ONE
    distribution over time, JSD maps WHICH sources are interchangeable
    and which bring genuinely different material, the matrix a mixture
    designer (q106/q170) reads before reweighting.

    Scale shape: one scan collapses the corpus to |sources| × 12
    fixed-width bins (two-phase agg; bins fixed up front — q120's
    lesson — so runs stay comparable), +1 Laplace smoothing makes
    every cell positive so the KL terms need no zero-guards, and the
    pairwise stage is a bucket-equi-join over a 240-row grid that is
    domain-sized (|sources|·|bins|) at ANY corpus scale — broadcast,
    never a fact-side cross join."""
    d = load_table(spark, sf_dir, "documents")
    nbins, width = 12, 50.0
    c = d.groupBy(
        "source",
        F.least(F.floor(F.col("n_chars") / width), F.lit(nbins - 1))
        .cast("int")
        .alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("c"))
    t = c.groupBy("source").agg(F.sum("c").cast("bigint").alias("tot"))
    bins = t.select(
        "source",
        "tot",
        F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bucket"),
    )
    grid = bins.join(c, ["source", "bucket"], "left").select(
        "source",
        "bucket",
        "tot",
        (
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
            / (F.col("tot") + nbins)
        ).alias("p"),
    )
    a, b = grid.alias("a"), grid.alias("b")
    pa, pb = F.col("a.p"), F.col("b.p")
    term = 0.5 * pa * F.log(2 * pa / (pa + pb)) + 0.5 * pb * F.log(
        2 * pb / (pa + pb)
    )
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.max("a.tot").cast("bigint").alias("n_docs_a"),
            F.max("b.tot").cast("bigint").alias("n_docs_b"),
            F.round(F.sum(term), 6).alias("jsd_nats"),
        )
    )


@register(
    "q228_source_verbosity",
    oracle="""
WITH med AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    quantile_cont(n_chars, 0.5) AS med_chars
  FROM documents GROUP BY 1
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
below AS (
  SELECT m.source, CAST(COUNT(*) AS BIGINT) AS n_below
  FROM med m JOIN documents d ON d.n_chars <= m.med_chars
  GROUP BY 1
)
SELECT m.source, m.n_docs, round(m.med_chars, 1) AS med_chars,
  round(CAST(b.n_below AS DOUBLE) / t.n, 6) AS global_pctl
FROM med m JOIN below b USING (source), tot t
""",
    tags=("curation", "stats"),
)
def q228_source_verbosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source verbosity ranking: each source's median doc length placed
    on the GLOBAL length CDF — "src7's median doc sits at the 83rd
    percentile of the whole corpus" — the normalized comparison that
    raw medians can't give when sources differ wildly in size, and the
    first read before length-based mixture reweighting (q106/q170).

    Scale shape: per-source exact medians come from one two-phase agg
    (|sources| rows, domain-fixed); the global CDF evaluation is NOT a
    global sort/window — the 20-row medians frame broadcasts onto a
    single corpus scan as a theta join (n_chars <= median) and
    collapses map-side to per-source below-counts. The global total is
    folded from the |sources|-row medians frame (sum of per-source
    counts), not a third corpus pass. Zero unpartitioned windows, wire
    cost = |sources| rows."""
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile(F.col("n_chars"), F.lit(0.5)).alias("med_chars"),
    )
    tot = med.agg(F.sum("n_docs").alias("n"))
    m = med.select("source", "med_chars")
    below = (
        d.alias("d")
        .join(F.broadcast(m.alias("m")), F.col("d.n_chars") <= F.col("m.med_chars"))
        .groupBy(F.col("m.source").alias("source"))
        .agg(F.count(F.lit(1)).alias("n_below"))
    )
    return (
        med.join(below, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round("med_chars", 1).alias("med_chars"),
            F.round(F.col("n_below").cast("double") / F.col("n"), 6).alias(
                "global_pctl"
            ),
        )
    )


@register(
    "q240_dsir_importance",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS w
  FROM documents
), cc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c_c FROM tok GROUP BY w
), cstat AS (
  SELECT CAST(SUM(c_c) AS DOUBLE) AS t_c, CAST(COUNT(*) AS DOUBLE) AS v
  FROM cc
), ct AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c_t FROM tok
  WHERE lang = 'en' GROUP BY w
), tstat AS (
  SELECT CAST(COALESCE(SUM(c_t), 0) AS DOUBLE) AS t_t FROM ct
), docw AS (
  SELECT t.doc_id, t.source, t.lang,
    round(AVG(
      ln((COALESCE(ct.c_t, 0) + 1.0) / (tstat.t_t + cstat.v))
      - ln((cc.c_c + 1.0) / (cstat.t_c + cstat.v))
    ), 6) AS w_doc
  FROM tok t
  JOIN cc ON cc.w = t.w
  LEFT JOIN ct ON ct.w = t.w
  CROSS JOIN cstat CROSS JOIN tstat
  GROUP BY t.doc_id, t.source, t.lang
)
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  round(CAST(SUM(CAST(w_doc AS DECIMAL(18, 6))) AS DOUBLE)
        / COUNT(*), 5) AS avg_importance,
  round(AVG(CASE WHEN w_doc > 0 THEN 1.0 ELSE 0.0 END), 6)
    AS frac_upweighted
FROM docw GROUP BY source, lang
""",
    tags=("curation", "llm", "sampling"),
)
def q240_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every doc by
    the mean log-likelihood ratio of its tokens under a target-domain
    unigram LM (here: the lang='en' slice) vs the raw-corpus unigram
    LM, both add-one smoothed over the corpus vocabulary. Positive
    w_doc = the doc looks more like the target than like the average
    corpus doc — resampling ∝ exp(w) shifts the mixture toward the
    target domain. Surfaced per (source, lang): English slices should
    score positive, others negative — the sanity check that makes the
    weights trustworthy before a resample run.

    Plan shape: the two "LMs" are word-count hash aggs (vocabulary-
    sized, shuffle-join sides, never broadcast — same discipline as
    q159's bigram LM); totals/vocab size ride as 1-row broadcast cross
    joins; scoring is the token stream equi-joined against the two
    count tables on the word key, then a two-phase per-doc avg and a
    tiny per-(source,lang) rollup. The corpus shuffles only at word
    grain — exactly what any unigram LM costs. Per-doc avgs round(6)
    before the >0 comparison (q159-proven cross-engine contract)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    cc = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c_c"))
    cstat = cc.agg(
        F.sum("c_c").cast("double").alias("t_c"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ct = (
        tok.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    tstat = ct.agg(
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("double").alias("t_t")
    )
    ratio = F.log(
        (F.coalesce(F.col("c_t"), F.lit(0)) + 1.0) / (F.col("t_t") + F.col("v"))
    ) - F.log((F.col("c_c") + 1.0) / (F.col("t_c") + F.col("v")))
    docw = (
        tok.join(cc, "w")
        .join(ct, "w", "left")
        .crossJoin(F.broadcast(cstat))
        .crossJoin(F.broadcast(tstat))
        .groupBy("doc_id", "source", "lang")
        .agg(F.round(F.avg(ratio), 6).alias("w_doc"))
    )
    # Exact-decimal sum, then ONE double division: per-doc weights are
    # already 6-dp multiples, so DECIMAL(18,6) holds them exactly and
    # the grouped sum is order-independent on both engines — the avg
    # can then never drift across partitionings (the raw double AVG
    # flipped a 6th digit at a .0000005 boundary in the first gate run).
    return docw.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("w_doc").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            5,
        ).alias("avg_importance"),
        F.round(
            F.avg(F.when(F.col("w_doc") > 0, 1.0).otherwise(0.0)), 6
        ).alias("frac_upweighted"),
    )


@register(
    "q241_token_epoch_plan",
    oracle="""
WITH census AS (
  SELECT source,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total FROM census
), w AS (
  SELECT source, n_tokens,
    sqrt(CAST(n_tokens AS DOUBLE) / tot.total) AS raw
  FROM census CROSS JOIN tot
), z AS (SELECT SUM(raw) AS z FROM w)
SELECT source, n_tokens,
  round(CAST(n_tokens AS DOUBLE) / tot.total, 6) AS natural_share,
  round(w.raw / z.z, 6) AS sample_weight,
  CAST(floor((w.raw / z.z) * 2.0 * tot.total) AS BIGINT) AS alloc_tokens,
  round(CAST(floor((w.raw / z.z) * 2.0 * tot.total) AS BIGINT)
        / CAST(n_tokens AS DOUBLE), 4) AS epochs,
  round(CAST(floor((w.raw / z.z) * 2.0 * tot.total) AS BIGINT)
        / CAST(n_tokens AS DOUBLE), 4) > 4.0 AS clipped,
  least(CAST(floor((w.raw / z.z) * 2.0 * tot.total) AS BIGINT),
        4 * n_tokens) AS effective_tokens
FROM w CROSS JOIN z CROSS JOIN tot
""",
    tags=("curation", "llm", "sampling"),
)
def q241_token_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch allocator — the data-constrained-scaling
    planning table (Muennighoff et al. 2023: repeating data beyond ~4
    epochs yields rapidly diminishing returns). Given a training budget
    of 2× the corpus and a √-share target mixture (τ=0.5 temperature —
    upsample tail sources), emit per source: the allocation, the epoch
    count it implies over the available tokens, whether it breaches the
    4-epoch repeat ceiling, and the ceiling-capped effective tokens.
    The artifact a pretraining data lead reads to decide which sources
    need MORE collection rather than more repetition.

    Plan shape: one corpus scan for the per-source token census
    (map-side size(split) — no explode), then pure scalar math on a
    |sources|-row frame with two 1-row broadcast cross joins (total,
    normalizer). Epoch ratios are exact BIGINT/BIGINT divisions after
    floor — the float appears only inside floor(), where a ulp flips
    the answer only if the exact product sits within 1e-9 of an
    integer (sqrt outputs: measure-zero). All surfaced doubles
    round(4-6) on both engines."""
    d = load_table(spark, sf_dir, "documents")
    census = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    tot = census.agg(F.sum("n_tokens").cast("double").alias("total"))
    w = census.crossJoin(F.broadcast(tot)).withColumn(
        "raw", F.sqrt(F.col("n_tokens").cast("double") / F.col("total"))
    )
    z = w.agg(F.sum("raw").alias("z"))
    alloc = F.floor((F.col("raw") / F.col("z")) * 2.0 * F.col("total")).cast(
        "bigint"
    )
    epochs = F.round(alloc / F.col("n_tokens").cast("double"), 4)
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("total"), 6
            ).alias("natural_share"),
            F.round(F.col("raw") / F.col("z"), 6).alias("sample_weight"),
            alloc.alias("alloc_tokens"),
            epochs.alias("epochs"),
            (epochs > 4.0).alias("clipped"),
            F.least(alloc, F.lit(4) * F.col("n_tokens")).alias(
                "effective_tokens"
            ),
        )
    )


def _q343_oracle() -> str:
    from ..functions.compat import sql_portable_hash64

    ph = sql_portable_hash64("tok")
    return f"""
WITH tok AS (
  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
), hashed AS (
  SELECT lang, tok, {ph} % 4096 AS bucket FROM tok
), loads AS (
  SELECT lang, bucket, COUNT(*) AS c FROM hashed GROUP BY lang, bucket
)
SELECT lang,
  CAST(SUM(c) AS BIGINT) AS n_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
  CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_collided,
  CAST(MAX(c) AS BIGINT) AS max_load,
  round(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS collision_rate
FROM loads GROUP BY lang
"""


@register(
    "q343_feature_hash_collisions",
    oracle=_q343_oracle(),
    tags=("llm", "text"),
)
def q343_feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the 'hashing trick' every vowpal-style
    featurizer uses to cap vocabulary memory): per-language vocabulary
    hashed into 4096 buckets, with the collision census that tells you
    whether the dimensionality is honest — tokens lost to shared
    buckets, the worst bucket load, and the collision rate. Portable
    hash → DuckDB replays bucket-for-bucket.

    Scale shape: explode → DISTINCT (lang, token) hash agg — the
    word-count shape — then a |buckets|-bounded second agg. The census
    is what production uses to pick the dimension BEFORE burning a
    training run on a saturated feature space."""
    from ..functions.compat import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .select("lang", (portable_hash64(F.col("tok")) % 4096).alias("bucket"))
    )
    loads = tok.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("c"))
    return loads.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
        (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias("n_collided"),
        F.max("c").cast("bigint").alias("max_load"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c"), 6
        ).alias("collision_rate"),
    )


_Q344_ORACLE = """
WITH base AS (
  SELECT doc_id, source,
    CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS y
  FROM documents
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS k
  FROM base GROUP BY source
)
SELECT b.doc_id, b.source, CAST(b.y AS INT) AS y,
  round(CAST(s.k - b.y AS DOUBLE) / (s.n - 1), 6) AS te_loo,
  round((CAST(s.k - b.y AS DOUBLE) + 20.0 * 0.5) / (s.n - 1 + 20.0), 6)
    AS te_loo_smoothed
FROM base b JOIN s ON s.source = b.source
WHERE b.doc_id < 200
"""


@register(
    "q344_target_encode_loo",
    oracle=_Q344_ORACLE,
    tags=("llm", "analytics"),
)
def q344_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (the ML-prep categorical encoder
    that avoids self-leakage: each row's category rate EXCLUDES its
    own label — encoding with it included is the classic train-time
    leak): te = (k_cat − y_row)/(n_cat − 1), plus the m-estimate
    smoothed variant (m=20 toward the 0.5 prior) that tames rare
    categories. Exact integer numerators/denominators → identical
    divisions, rounded 6.

    Scale shape: one hash agg to |categories|, broadcast back onto
    the rows — map-only after the census; the doc_id < 200 window
    bounds the surfaced rows, not the computation."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("n_chars") > 300, 1).otherwise(0).alias("y"),
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("k"),
    )
    return (
        d.filter(F.col("doc_id") < 200)
        .join(F.broadcast(s), "source")
        .select(
            "doc_id",
            "source",
            F.col("y").cast("int").alias("y"),
            F.round(
                (F.col("k") - F.col("y")).cast("double") / (F.col("n") - 1), 6
            ).alias("te_loo"),
            F.round(
                ((F.col("k") - F.col("y")).cast("double") + F.lit(20.0 * 0.5))
                / (F.col("n") - 1 + F.lit(20.0)),
                6,
            ).alias("te_loo_smoothed"),
        )
    )


@register(
    "q366_cohens_kappa",
    oracle="""
WITH lab AS (
  SELECT lang,
    CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS a,
    CASE WHEN len(string_split(text, ' ')) > 55 THEN 1 ELSE 0 END AS b
  FROM documents
), s AS (
  SELECT lang, COUNT(*) AS n,
    CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM lab GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_docs, n11, n10, n01, n00,
  round(
    (CAST(n11 + n00 AS DOUBLE) / n
     - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
        + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n))
    / (1.0
       - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
          + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n)),
    6) AS kappa
FROM s
""",
    tags=("llm", "stats"),
)
def q366_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two quality raters — the
    chance-corrected agreement every labeling pipeline should report
    instead of raw accuracy (two raters that both say 'keep' 90% of
    the time agree 82% BY CHANCE): rater A = char-length gate, rater
    B = token-count gate, per language. κ = (p_o − p_e)/(1 − p_e)
    from the exact 2×2 confusion integers; one double expression,
    rounded 6.

    Scale shape: map-side labels + one hash agg to |langs| confusion
    rows; O(1) after."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.when(F.col("n_chars") > 300, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split("text", " ")) > 55, 1).otherwise(0).alias("b"),
    )
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00"))
    ) / (n * F.col("n"))
    return s.select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


_Q367_KS = (50, 100, 200, 400)


_Q367_ORACLE = " UNION ALL ".join(
    f"""
SELECT CAST({k} AS BIGINT) AS k,
  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_topk,
  round(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) / {k}, 6)
    AS precision_at_k,
  round(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        / (SELECT COUNT(*) FROM documents WHERE lang = 'en'), 6)
    AS recall_at_k
FROM (
  SELECT (lang = 'en') AS pos FROM (
    SELECT lang, row_number() OVER (
      ORDER BY {_LOGIT_SQL} DESC, doc_id) AS rk
    FROM documents) t WHERE rk <= {k}) u"""
    for k in _Q367_KS
)


@register(
    "q367_precision_at_k",
    oracle=_Q367_ORACLE,
    tags=("llm", "analytics"),
)
def q367_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@k / recall@k curve of the quality-scorer ranking
    against the is-English pseudo-label — the operating-point view
    q190's single AUC number hides (a ranker can have fine AUC and
    useless precision at the cut you actually deploy). Four k cuts;
    each is a windowless pre-bounded top-k (TakeOrderedAndProject via
    topn_ranked — the global-rank decomposition never materializes a
    full sort), counted exactly.

    Scale shape: per cut, a top-k over the scored scan + one count —
    k is constant, so the whole curve is O(scan)."""
    from ..functions.ranking import topn_ranked

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").alias("pos"), _logit_col().alias("s")
    )
    total_pos = d.filter("pos").count()
    outs = []
    for k in _Q367_KS:
        top = topn_ranked(d, [F.col("s").desc(), F.col("doc_id")], k)
        outs.append(
            top.agg(
                F.sum(F.when(F.col("pos"), 1).otherwise(0))
                .cast("bigint")
                .alias("n_pos_topk")
            ).select(
                F.lit(k).cast("bigint").alias("k"),
                "n_pos_topk",
                F.round(F.col("n_pos_topk").cast("double") / k, 6).alias(
                    "precision_at_k"
                ),
                F.round(
                    F.col("n_pos_topk").cast("double") / total_pos, 6
                ).alias("recall_at_k"),
            )
        )
    res = outs[0]
    for x in outs[1:]:
        res = res.unionAll(x)
    return res


def _q375_oracle() -> str:
    from ..functions.compat import sql_portable_hash64

    def cand(k: int) -> str:
        h = sql_portable_hash64(
            f"CAST(c.o_custkey AS VARCHAR) || '#neg{k}'"
        )
        return (
            f"SELECT c.o_custkey, {h} % (SELECT mx FROM mp) AS cand_part"
            " FROM custs c"
        )

    cands = " UNION ALL ".join(cand(k) for k in range(4))
    return f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), custs AS (SELECT DISTINCT o_custkey FROM pos),
mp AS (SELECT MAX(p_partkey) + 1 AS mx FROM part),
cands AS ({cands}),
flagged AS (
  SELECT c.o_custkey, c.cand_part,
    CASE WHEN p.l_partkey IS NOT NULL THEN 1 ELSE 0 END AS was_pos
  FROM cands c
  LEFT JOIN pos p
    ON p.o_custkey = c.o_custkey AND p.l_partkey = c.cand_part
), seg AS (
  SELECT cu.c_mktsegment AS seg, f.was_pos
  FROM flagged f JOIN customer cu ON cu.c_custkey = f.o_custkey
)
SELECT seg AS c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_candidates,
  CAST(SUM(was_pos) AS BIGINT) AS n_collisions,
  CAST(COUNT(*) - SUM(was_pos) AS BIGINT) AS n_kept,
  round(CAST(SUM(was_pos) AS DOUBLE) / COUNT(*), 6) AS collision_rate
FROM seg GROUP BY seg
"""


@register(
    "q375_negative_sampling",
    oracle=_q375_oracle(),
    tags=("llm", "analytics"),
)
def q375_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling — the recommender/contrastive
    training-prep step (for each customer, draw parts they did NOT
    buy as negatives): 4 hash-drawn candidates per customer over the
    part-key space, rejected when they collide with a true positive
    (the LEFT anti-flag join), censused per market segment. Hash
    draws make the training set reproducible on any cluster shape
    (the q162 deterministic-shuffle rule applied to sampling) and the
    collision rate measures how many redraws production would need —
    which is the number this census exists to audit.

    Scale shape: positives = one distinct hash agg; candidates are
    map-side; rejection is one equi-join on (customer, part)."""
    from ..functions.compat import portable_hash64

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cu = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    pos = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    custs = pos.select("o_custkey").distinct()
    mx = p.agg((F.max("p_partkey") + 1).alias("mx"))
    cands = None
    for k in range(4):
        c = custs.crossJoin(F.broadcast(mx)).select(
            "o_custkey",
            (
                portable_hash64(
                    F.concat(
                        F.col("o_custkey").cast("string"), F.lit(f"#neg{k}")
                    )
                )
                % F.col("mx")
            ).alias("cand_part"),
        )
        cands = c if cands is None else cands.unionAll(c)
    flagged = cands.join(
        pos.withColumnRenamed("l_partkey", "cand_part").withColumn(
            "was_pos", F.lit(1)
        ),
        ["o_custkey", "cand_part"],
        "left",
    ).withColumn("was_pos", F.coalesce(F.col("was_pos"), F.lit(0)))
    seg = flagged.join(
        F.broadcast(cu.select("c_custkey", "c_mktsegment")),
        flagged.o_custkey == F.col("c_custkey"),
    )
    return seg.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("was_pos").cast("bigint").alias("n_collisions"),
        (F.count(F.lit(1)) - F.sum("was_pos"))
        .cast("bigint")
        .alias("n_kept"),
        F.round(
            F.sum("was_pos").cast("double") / F.count(F.lit(1)), 6
        ).alias("collision_rate"),
    )


_Q396_SQL = """
WITH rows_ AS (
  SELECT p.p_brand AS brand,
    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
  FROM {lineitem} l JOIN {part} p ON p.p_partkey = l.l_partkey
), byb AS (
  SELECT brand, CAST(SUM(bad) AS BIGINT) AS nb,
    CAST(COUNT(*) AS BIGINT) - CAST(SUM(bad) AS BIGINT) AS ng
  FROM rows_ GROUP BY brand
), tot AS (
  SELECT CAST(SUM(nb) AS BIGINT) AS tb, CAST(SUM(ng) AS BIGINT) AS tg
  FROM byb
), woe AS (
  SELECT /*+ BROADCAST(t) */ b.brand, b.nb, b.ng,
    ln((CAST(b.nb AS DOUBLE) / t.tb) / (CAST(b.ng AS DOUBLE) / t.tg))
      AS woe,
    (CAST(b.nb AS DOUBLE) / t.tb - CAST(b.ng AS DOUBLE) / t.tg)
      * ln((CAST(b.nb AS DOUBLE) / t.tb) / (CAST(b.ng AS DOUBLE) / t.tg))
      AS iv_term
  FROM byb b CROSS JOIN tot t
  WHERE b.nb > 0 AND b.ng > 0
), iv AS (
  SELECT CAST(SUM(CAST(floor(iv_term * 1e9) AS BIGINT)) AS BIGINT) AS g
  FROM woe
)
SELECT /*+ BROADCAST(i) */ w.brand, w.nb AS n_returned, w.ng AS n_kept,
  round(w.woe, 6) AS woe,
  round(i.g / 1e9, 6) AS information_value
FROM woe w CROSS JOIN iv i
"""


@register(
    "q396_woe_iv",
    oracle=_Q396_SQL.format(lineitem="lineitem", part="part"),
    tags=("curation", "ml", "stats"),
)
def q396_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT OF EVIDENCE + Information Value of brand → return-flag —
    the credit-scoring feature-screening pair (WOE is the log-odds
    encoding a scorecard feeds to logistic models; IV =
    Σ(bad%−good%)·WOE summarizes the feature's total separating power;
    the classic read: <0.02 useless, >0.3 strong). Complements q344's
    leave-one-out target encoding (which prevents leakage at row
    grain) with the bucket-grain screening statistic.

    Counts exact from one hash agg; WOE is one ln over count ratios
    (rounded 6); the IV cross-bucket sum rides the 1e-9 grid. Brands
    with a zero cell are excluded (WOE undefined) — the standard
    convention, stated rather than silently smoothed.

    Scale: fact-dim join + hash agg to |brands|."""
    return _sql_twin(spark, sf_dir, _Q396_SQL, ["lineitem", "part"])


@register(
    "q417_stratified_kfold",
    oracle=f"""
WITH folds AS (
  SELECT label,
    {sql_portable_hash64("CAST(vec_id AS VARCHAR)")} % 5 AS fold
  FROM embeddings
)
SELECT fold, label, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM folds GROUP BY fold, label
""",
    tags=("curation", "ml"),
)
def q417_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-FOLD cross-validation assignment with per-label
    balance census — the split_bucket (q206) idea extended from a
    fixed train/val/test cut to k rotating folds: fold(id) =
    portable_hash64(id) mod 5, reproducible across runs, engines and
    cluster shapes (no RNG, no shuffle-order dependence), which is
    what makes CV results comparable between retrains. The census
    (fold × label counts) IS the stratification audit: hash uniformity
    keeps every label's mass within sampling noise of 1/5 per fold —
    the label-leakage-free approximation to sklearn's StratifiedKFold
    that scales to 100 TB because it is one map-side expression plus
    one hash agg."""
    e = load_table(spark, sf_dir, "embeddings")
    from ..functions.compat import portable_hash64

    return (
        e.select(
            "label",
            (portable_hash64(F.col("vec_id").cast("string")) % 5).alias(
                "fold"
            ),
        )
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


_Q404_SQL = """
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
    CAST(SUM(n_chars) AS BIGINT) AS sv,
    CAST(SUM(n_chars * n_chars) AS BIGINT) AS svv
  FROM {documents} GROUP BY source
), sd AS (
  SELECT source, nh,
    sqrt((svv - CAST(sv AS DOUBLE) * sv / nh) / (nh - 1)) AS sh
  FROM s WHERE nh > 1
), quota AS (
  SELECT source, nh, sh,
    CAST(floor(nh * sh * 1e4) AS BIGINT) AS wgrid
  FROM sd
), tot AS (
  SELECT CAST(SUM(wgrid) AS BIGINT) AS tw, CAST(COUNT(*) AS BIGINT) AS k
  FROM quota
), q2 AS (
  SELECT /*+ BROADCAST(t) */ q.source, q.nh, q.sh,
    -- integer-exact quota on the grid: base = floor(1000*w/T),
    -- remainder compared as exact integers
    CAST(floor(1e3 * q.wgrid / t.tw) AS BIGINT) AS base,
    1000 * q.wgrid - CAST(floor(1e3 * q.wgrid / t.tw) AS BIGINT) * t.tw
      AS rem
  FROM quota q CROSS JOIN tot t
), leftover AS (
  SELECT 1000 - CAST(SUM(base) AS BIGINT) AS extra FROM q2
), ranked AS (
  SELECT /*+ BROADCAST(b) */ a.source, a.nh, a.sh, a.base,
    1 + CAST(SUM(CASE WHEN b.rem > a.rem
          OR (b.rem = a.rem AND b.source < a.source)
        THEN 1 ELSE 0 END) AS BIGINT) AS rk
  FROM q2 a JOIN q2 b ON TRUE
  GROUP BY a.source, a.nh, a.sh, a.base
)
SELECT /*+ BROADCAST(l) */ r.source, r.nh AS stratum_size,
  round(r.sh, 4) AS stratum_sd,
  CAST(r.base + CASE WHEN r.rk <= l.extra THEN 1 ELSE 0 END AS BIGINT)
    AS n_alloc
FROM ranked r CROSS JOIN leftover l
"""


@register(
    "q404_neyman_allocation",
    oracle=_Q404_SQL.format(documents="documents"),
    tags=("curation", "stats"),
)
def q404_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-optimal stratified sample allocation: split a 1000-doc
    labeling budget across sources with n_h ∝ N_h·S_h (stratum size ×
    stratum std of doc length) — the design that minimizes the
    stratified estimator's variance for fixed budget; big AND noisy
    strata get the samples, uniform strata barely any. The q96c exact-N
    sampler draws a stratified sample; this computes what the strata
    ALLOCATION should be in the first place.

    Integerization is largest-remainder (Hamilton) on an exact integer
    grid: weights floor to a 1e4 grid (1000·w must stay < 2^53 for the
    exact-floor argument even at replica scale), bases are exact floor(1000·w/T)
    (both factors < 2⁵³ so the double division floors exactly),
    remainders compare as exact integers with a source tiebreak, and
    the allocations sum to EXACTLY 1000 by construction. Rank over the
    20-row frame is a broadcast pair-count join, not a global window.

    Scale: one hash agg to |strata|, then constant-size algebra."""
    return _sql_twin(spark, sf_dir, _Q404_SQL, ["documents"])
