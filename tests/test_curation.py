"""Invariant tests for the corpus-curation operators (curation.py).

Oracle equality for q103-q106/q108 is covered by the registry-wide
contract test; these assert the *semantic* guarantees the oracle can't
express — scrub completeness, contamination-set construction, mixture
feasibility, and the SemDeDup kept-set separation/justification
invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def test_pii_scrub_is_complete(spark):
    """After scrubbing, no doc may still match any PII pattern, and
    every doc must have seen at least one email redaction (the injected
    contact block guarantees ≥1 of each kind)."""
    pdf = SPECS["q103_pii_scrub"].fn(spark, SF_DIR).toPandas()
    assert pdf["is_clean"].all()
    assert (pdf["n_emails"] >= 1).all()
    assert (pdf["n_phones"] >= 1).all()
    assert (pdf["n_ids"] >= 1).all()


def test_contamination_excludes_eval_docs(spark):
    """Eval-slice docs (doc_id % 97 == 0) must not appear as train rows,
    and rates must be within [0, 1]."""
    pdf = SPECS["q104_contamination_check"].fn(spark, SF_DIR).toPandas()
    assert (pdf["doc_id"] % 97 != 0).all()
    assert ((pdf["contamination_rate"] >= 0) & (pdf["contamination_rate"] <= 1)).all()
    assert (pdf["n_contaminated"] <= pdf["n_ngrams"]).all()


def test_repetition_fracs_bounded(spark):
    pdf = SPECS["q105_repetition_stats"].fn(spark, SF_DIR).toPandas()
    for c in ("type_token_ratio", "top_term_frac", "dup_2gram_frac", "dup_3gram_frac"):
        assert ((pdf[c] >= 0) & (pdf[c] <= 1)).all(), c
    # a word-salad doc over a tiny vocabulary must repeat terms
    assert (pdf["type_token_ratio"] < 1).any()


def test_domain_mixture_rates_feasible(spark):
    """Keep rates are capped at 1; every kept doc's md5-gate fraction is
    below its language's rate (the filter actually enforced it); and an
    overrepresented language is downsampled (rate < 1 for at least one
    language on the fixture, whose lang mix is uneven)."""
    pdf = SPECS["q106_domain_mixture"].fn(spark, SF_DIR).toPandas()
    assert (pdf["sample_rate"] <= 1.0).all()
    assert (pdf["sample_rate"] > 0.0).all()
    assert (pdf["sample_rate"] < 1.0).any()


def test_semdedup_drops_injected_copies_only(spark):
    """The injected vec_id+100000 near-copies must all drop; every
    original must survive (max natural pairwise cosine on the fixture
    is ~0.51, far under tau=0.92)."""
    pdf = SPECS["q107_semdedup"].fn(spark, SF_DIR).toPandas()
    injected = pdf[pdf["vec_id"] >= 100000]
    originals = pdf[pdf["vec_id"] < 100000]
    assert len(injected) == min(50, len(originals))
    assert (~injected["kept"]).all(), "all injected near-copies must be pruned"
    assert originals["kept"].all(), "no original may be pruned"
    assert (injected["max_sim_to_lower"] >= 0.92).all()


def test_semdedup_kept_set_separation(spark):
    """No two kept vectors in the same cluster may have cosine >= tau
    (the min-id rule guarantees this); and the result is deterministic
    across runs."""
    import numpy as np

    fn = SPECS["q107_semdedup"].fn
    pdf = fn(spark, SF_DIR).toPandas()
    pdf2 = fn(spark, SF_DIR).toPandas()
    assert pdf.equals(pdf2), "SemDeDup must be deterministic"

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    # reconstruct injected copies
    for vid in list(emb):
        if vid < 50:
            v = emb[vid].copy()
            v[0] *= 1.05
            emb[vid + 100000] = v
    kept = pdf[pdf["kept"]]
    for c_id, grp in kept.groupby("c_id"):
        ids = list(grp["vec_id"])
        vs = [emb[i] / np.linalg.norm(emb[i]) for i in ids]
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                assert float(vs[i] @ vs[j]) < 0.92, (c_id, ids[i], ids[j])


def test_fertility_consistency(spark):
    """Aggregated per-(lang, source) token sums must equal the q85f
    per-doc counts summed the same way (two independent plans, same
    numbers)."""
    agg = SPECS["q108_tokenizer_fertility"].fn(spark, SF_DIR).toPandas()
    per_doc = SPECS["q85f_bpe_ish_tokens"].fn(spark, SF_DIR).toPandas()
    assert agg["bpe_ish_tokens"].sum() == per_doc["bpe_ish_tokens"].sum()
    assert agg["ws_tokens"].sum() == per_doc["ws_tokens"].sum()
    assert (agg["fertility"] >= 1.0).all()  # BPE-ish never merges across words


def test_weighted_sample_biases_toward_heavy_docs(spark):
    """Length-weighted sampling must overrepresent long docs: the mean
    n_chars of the sample should exceed the corpus mean (and the query
    is deterministic — two runs give identical rows)."""
    from tests.conftest import SF_DIR

    from aws_iceberg_automation_spark.io import load_table
    from aws_iceberg_automation_spark.registry import all_specs

    fn = all_specs()["q136_weighted_sample"].fn
    d = load_table(spark, SF_DIR, "documents")
    sampled = fn(spark, SF_DIR).join(d, "doc_id")
    m_sample = sampled.agg(F.avg("n_chars")).first()[0]
    m_corpus = d.agg(F.avg("n_chars")).first()[0]
    assert m_sample > m_corpus
    r1 = sorted((r.lang, r.doc_id) for r in fn(spark, SF_DIR).collect())
    r2 = sorted((r.lang, r.doc_id) for r in fn(spark, SF_DIR).collect())
    assert r1 == r2


def test_semantic_contamination_flags_injected_copy(spark):
    """A training vector that verbatim-copies an eval vector must flag
    that eval row contaminated at cosine 1.0 with the copy as nearest;
    the untouched near-orthogonal fixture rows must all stay clean."""
    from aws_iceberg_automation_spark.io import load_table
    from aws_iceberg_automation_spark.operators.curation import (
        q173_semantic_contamination,
    )

    base = (
        q173_semantic_contamination(spark, SF_DIR)
        .toPandas()
        .set_index("eval_id")
    )
    assert not base["contaminated"].any()

    # Inject: train vec 90001 (90001 % 50 != 0) = copy of eval vec 50.
    e = load_table(spark, SF_DIR, "embeddings")
    leak = e.filter(F.col("vec_id") == 50).select(
        F.lit(90001).cast("long").alias("vec_id"),
        "embedding",
        "label",
    )
    import aws_iceberg_automation_spark.operators.curation as cur

    patched = e.unionByName(leak.select(e.columns))
    orig = cur.load_table
    try:
        cur.load_table = lambda s, d, t: patched if t == "embeddings" else orig(s, d, t)
        out = (
            q173_semantic_contamination(spark, SF_DIR)
            .toPandas()
            .set_index("eval_id")
        )
    finally:
        cur.load_table = orig
    assert bool(out.loc[50, "contaminated"])
    assert out.loc[50, "nearest_train_id"] == 90001
    assert out.loc[50, "max_cosine"] == 1.0
    clean = out.drop(index=50)
    assert not clean["contaminated"].any()


def test_source_overlap_mirror_site_hits_one(spark):
    """Two sources carrying identical text must score overlap 1.0;
    a source of globally-unique grams overlaps nothing."""
    from aws_iceberg_automation_spark.operators.curation import _ngrams  # noqa: F401
    import aws_iceberg_automation_spark.operators.curation as cur
    from aws_iceberg_automation_spark.operators.curation import q174_source_overlap
    from aws_iceberg_automation_spark.io import load_table

    e = spark.createDataFrame(
        [
            (1, "mirrorA", "a b c d e f g h"),
            (2, "mirrorB", "a b c d e f g h"),
            (3, "lonely", "zz1 zz2 zz3 zz4"),
            (4, "mirrorB", "extra words here too"),
        ],
        "doc_id long, source string, text string",
    )
    orig = cur.load_table
    try:
        cur.load_table = lambda s, d, t: e if t == "documents" else orig(s, d, t)
        rows = {
            (r.source_a, r.source_b): r
            for r in q174_source_overlap(spark, SF_DIR).collect()
        }
    finally:
        cur.load_table = orig
    m = rows[("mirrorA", "mirrorB")]
    assert m.n_shared == 6 and m.overlap_coeff == 1.0  # 8 tokens → 6 3-grams
    assert not any("lonely" in k for k in rows)


def test_quality_calibration_uniform_per_source(spark):
    """Every source's calibrated ranks must span [0, 1] and its deciles
    must be balanced within one row (the point of rank normalization)."""
    pdf = SPECS["q175_quality_calibration"].fn(spark, SF_DIR).toPandas()
    for _, g in pdf.groupby("source"):
        assert g["calib_pct"].min() == 0.0
        assert g["calib_pct"].max() == 1.0
        sizes = g.groupby("calib_decile").size()
        assert set(sizes.index) == set(range(1, 11))
        assert sizes.max() - sizes.min() <= 1


def test_corpus_datasheet_shares_sum_to_one(spark):
    """Token shares across (lang, source) cells partition the corpus;
    doc counts must total the corpus and dup counts start at zero on
    the all-distinct fixture."""
    pdf = SPECS["q176_corpus_datasheet"].fn(spark, SF_DIR).toPandas()
    assert abs(pdf["token_share"].sum() - 1.0) < 1e-4
    assert pdf["n_docs"].sum() == 500
    assert (pdf["n_dup_docs"] == 0).all()
    assert (pdf["min_doc_tokens"] <= pdf["max_doc_tokens"]).all()


def test_shard_manifest_fingerprint_order_free_and_sensitive(spark):
    """The XOR fingerprint must be identical under any physical row
    order, and must flip when a single document's content changes."""
    from aws_iceberg_automation_spark.io import load_table
    import aws_iceberg_automation_spark.operators.curation as cur

    base = {
        r.shard: r.fingerprint
        for r in SPECS["q178_shard_manifest"].fn(spark, SF_DIR).collect()
    }
    d = load_table(spark, SF_DIR, "documents")
    orig = cur.load_table
    try:
        cur.load_table = (
            lambda s, dd, t: d.repartition(13) if t == "documents" else orig(s, dd, t)
        )
        reordered = {
            r.shard: r.fingerprint
            for r in SPECS["q178_shard_manifest"].fn(spark, SF_DIR).collect()
        }
        mutated_src = d.withColumn(
            "text",
            F.when(F.col("doc_id") == 0, F.lit("tampered")).otherwise(
                F.col("text")
            ),
        )
        cur.load_table = (
            lambda s, dd, t: mutated_src if t == "documents" else orig(s, dd, t)
        )
        tampered = {
            r.shard: r.fingerprint
            for r in SPECS["q178_shard_manifest"].fn(spark, SF_DIR).collect()
        }
    finally:
        cur.load_table = orig
    assert reordered == base
    assert tampered != base
    # only doc 0's shard may differ
    diff = [s for s in base if tampered.get(s) != base[s]]
    assert len(diff) == 1


def test_decile_lift_accounting(spark):
    """Deciles must partition the corpus, cumulative capture must end at
    1.0, and the lift-weighted doc shares must average to the base rate."""
    pdf = (
        SPECS["q188_decile_lift"].fn(spark, SF_DIR).toPandas().sort_values("decile")
    )
    assert list(pdf["decile"]) == list(range(1, 11))
    assert pdf["n_docs"].sum() == 500
    assert abs(pdf["cum_capture"].iloc[-1] - 1.0) < 1e-6
    base = pdf["n_pos"].sum() / pdf["n_docs"].sum()
    recon = (pdf["lift"] * base * pdf["n_docs"]).sum() / pdf["n_docs"].sum()
    assert abs(recon - base) < 1e-3


def test_auc_matches_sklearn_free_reference(spark):
    """AUC from the rank-sum identity must equal a direct pairwise
    computation on a small hand corpus (P(score_pos > score_neg))."""
    import aws_iceberg_automation_spark.operators.curation as cur

    d = spark.createDataFrame(
        [
            (1, "en", "aaa bbb ccc ddd eee fff"),
            (2, "en", "aaa bbb ccc ddd eee fff ggg hhh"),
            (3, "de", "zz1 zz2"),
            (4, "de", "zz3 zz4 zz5"),
            (5, "en", "short"),
        ],
        "doc_id long, lang string, text string",
    )
    orig = cur.load_table
    try:
        cur.load_table = lambda s, dd, t: d if t == "documents" else orig(s, dd, t)
        row = SPECS["q190_auc_roc"].fn(spark, SF_DIR).collect()[0]
        scores = {
            r.doc_id: r.logit
            for r in d.select(
                "doc_id", cur._logit_col().alias("logit")
            ).collect()
        }
    finally:
        cur.load_table = orig
    pos = [scores[i] for i in (1, 2, 5)]
    neg = [scores[i] for i in (3, 4)]
    pairs = [(p > n) + 0.5 * (p == n) for p in pos for n in neg]
    assert abs(row.auc - round(sum(pairs) / len(pairs), 6)) < 1e-9
    assert row.n_pos == 3 and row.n_neg == 2


def test_calibration_bins_partition_and_bound(spark):
    """Calibration bins must partition the corpus with probabilities
    inside their bin ranges and Brier in [0, 1]."""
    pdf = SPECS["q191_calibration_brier"].fn(spark, SF_DIR).toPandas()
    assert pdf["n_docs"].sum() == 500
    for _, r in pdf.iterrows():
        assert r["bucket"] / 10 <= r["mean_predicted"] <= (r["bucket"] + 1) / 10 + 1e-9
        assert 0.0 <= r["observed_rate"] <= 1.0
        assert 0.0 <= r["brier"] <= 1.0


def test_source_jsd_identical_vs_disjoint(spark, tmp_path):
    """q225: two sources with identical length distributions score
    JSD exactly 0; two sources concentrated in different buckets score
    strictly positive and below the ln(2) bound."""
    import math

    from aws_iceberg_automation_spark.io import SCHEMAS

    docs = []
    k = 0
    for src, n_chars in (("sa", 60), ("sc", 60), ("sb", 160)):
        for _ in range(6):
            k += 1
            docs.append((k, "w " * 5, "en", src, n_chars))
    spark.createDataFrame(docs, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        (r.source_a, r.source_b): r.jsd_nats
        for r in SPECS["q225_source_jsd"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == 3  # C(3, 2) pairs, each emitted once (a < b)
    assert out[("sa", "sc")] == 0.0
    assert 0.0 < out[("sa", "sb")] <= math.log(2.0)
    # sc's distribution equals sa's, so both disjoint pairs score the same
    assert out[("sa", "sb")] == out[("sb", "sc")]


def test_source_verbosity_known_cdf(spark, tmp_path):
    """q228 on two 3-doc sources: each source's median lands at the
    exact global CDF position (docs <= median / all docs)."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    docs = [
        (1, "t", "en", "sa", 10),
        (2, "t", "en", "sa", 20),
        (3, "t", "en", "sa", 30),
        (4, "t", "en", "sb", 40),
        (5, "t", "en", "sb", 50),
        (6, "t", "en", "sb", 60),
    ]
    spark.createDataFrame(docs, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.source: r
        for r in SPECS["q228_source_verbosity"].fn(spark, str(tmp_path)).collect()
    }
    assert out["sa"].med_chars == 20.0 and out["sa"].global_pctl == 0.333333
    assert out["sb"].med_chars == 50.0 and out["sb"].global_pctl == 0.833333
