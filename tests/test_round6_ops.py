"""Unit tests for the round-6 operators on tiny synthetic frames —
closed-form expectations the sf-fixture oracle gate can't pin (exact
interpolation values, containment on a known subset, SCD2 interval
edges, PPS determinism under repartitioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_gapfill_linear_interpolation_closed_form(spark):
    """Grid 1..5 with days 2 and 4 missing: day 2 interpolates between
    (1,10) and (3,40) -> 25.0; day 4 between (3,40) and (5,10) -> 25.0;
    truncating div semantics on a non-integer midpoint."""
    # drive the registered query's private math through a local frame
    # shaped like its post-agg series: (series, d, qty)
    s = spark.createDataFrame(
        [("A", 1, 10), ("A", 3, 40), ("A", 5, 10), ("B", 7, 5)],
        "series string, d int, qty bigint",
    )
    from pyspark.sql import Window

    bounds = s.groupBy("series").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    grid = bounds.select("series", F.explode(F.sequence("lo", "hi")).alias("d"))
    j = grid.join(s, ["series", "d"], "left")
    wp = Window.partitionBy("series").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("series").orderBy("d").rowsBetween(
        0, Window.unboundedFollowing
    )
    present_d = F.when(F.col("qty").isNotNull(), F.col("d"))
    ctx = j.select(
        "series",
        "d",
        "qty",
        F.last("qty", ignorenulls=True).over(wp).alias("pv"),
        F.last(present_d, ignorenulls=True).over(wp).alias("pd"),
        F.first("qty", ignorenulls=True).over(wn).alias("nv"),
        F.first(present_d, ignorenulls=True).over(wn).alias("nd"),
    )
    interp = F.expr("pv * 1000 + ((nv - pv) * 1000 * (d - pd)) div (nd - pd)")
    out = {
        (r.series, r.d): r.v
        for r in ctx.select(
            "series",
            "d",
            F.when(F.col("qty").isNotNull(), F.col("qty") * 1000)
            .otherwise(interp)
            .alias("v"),
        ).collect()
    }
    assert out[("A", 1)] == 10_000
    assert out[("A", 2)] == 25_000  # 10 + (40-10)*1/2
    assert out[("A", 3)] == 40_000
    assert out[("A", 4)] == 25_000  # 40 + (10-40)*1/2
    assert out[("A", 5)] == 10_000
    assert out[("B", 7)] == 5_000  # singleton series: no gaps


def test_containment_detects_subset_doc(spark, tmp_path):
    """A doc whose shingles are a strict subset of a larger doc must
    pair with containment 1.0 from the small side and subset_flag on
    a low-Jaccard mirror. Candidates pair on the HASH-LEAST shingle,
    so the suffix is chosen (portable md5 hash computed in pure
    Python) such that no suffix-side shingle undercuts the base's
    anchor — mirroring real subsets, where the anchor usually falls in
    the shared span."""
    import hashlib

    from aws_iceberg_automation_spark.registry import all_specs

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def shingle_hashes(words: list[str]) -> list[int]:
        return [
            h64(" ".join(words[i : i + 5]))
            for i in range(len(words) - 4)
        ]

    # base must be large enough that its anchor (min of 36 hashes) has
    # a real chance of surviving the suffix's ~30 new draws (min-of-4
    # vs 60 draws succeeded ~1e-6 of the time); jaccard = 36/66 ≈ 0.55
    # stays under the 0.6 mirror threshold
    base_words = [f"base{i}" for i in range(40)]
    anchor = min(shingle_hashes(base_words))
    big_words = None
    for seed in range(500):
        cand = base_words + [f"w{seed}_{i}" for i in range(30)]
        if min(shingle_hashes(cand)) == anchor:
            big_words = cand
            break
    assert big_words is not None, "no anchor-preserving suffix in 500 seeds"
    base, big = " ".join(base_words), " ".join(big_words)
    df = spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, big, "en", "s", len(big))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = tmp_path / "docs"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    # the query loads documents.parquet from sf_dir; point it at tmp
    spec = all_specs()["q285_doc_containment_pairs"]
    rows = spec.fn(spark, str(d)).collect()
    pair = [r for r in rows if r.doc_id_a == 1 and r.doc_id_b == 2]
    assert pair, f"subset pair not found in {rows}"
    r = pair[0]
    assert r.containment_ab == 1.0  # small side fully contained
    assert r.jaccard < 0.6
    assert r.subset_flag


def test_scd2_interval_edges(spark, tmp_path):
    """Three states with a repeat: v v p p v -> intervals v, p, v with
    correct valid_from/valid_to chaining and exactly one current row."""
    import datetime

    from aws_iceberg_automation_spark.registry import all_specs

    t0 = datetime.datetime(2024, 1, 1)
    evs = [
        (1, t0, 7, "view", 0.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=10), 7, "view", 0.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=20), 7, "purchase", 0.0, "{}"),
        (4, t0 + datetime.timedelta(seconds=30), 7, "purchase", 0.0, "{}"),
        (5, t0 + datetime.timedelta(seconds=40), 7, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        evs,
        "event_id bigint, ts timestamp_ntz, user_id bigint,"
        " event_type string, value double, props string",
    )
    d = tmp_path / "evs"
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    rows = sorted(
        all_specs()["q273_scd2_intervals"].fn(spark, str(d)).collect(),
        key=lambda r: r.version_seq,
    )
    assert [r.state for r in rows] == ["view", "purchase", "view"]
    assert [r.is_current for r in rows] == [False, False, True]
    # each interval closes exactly where the next opens
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert rows[2].valid_to is None


def test_pps_sample_invariant_under_repartitioning(spark):
    """The weighted PPS pick set must be IDENTICAL under any physical
    partitioning — the reproducibility contract sampleBy can't give."""
    from aws_iceberg_automation_spark.functions.ranking import (
        partitioned_prefix_sums,
    )
    from aws_iceberg_automation_spark.registry import all_specs

    spec = all_specs()["q279_weighted_pps_sample"]
    a = {r.doc_id for r in spec.fn(spark, SF_DIR).collect()}
    # same math on a deliberately hostile repartitioning
    from aws_iceberg_automation_spark.io import load_table

    d = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .repartition(13)
    )
    c = partitioned_prefix_sums(d, F.col("doc_id"), ["n_chars"])
    w = d.agg(
        F.greatest(
            F.expr("CAST(SUM(n_chars) AS BIGINT) div 50"),
            F.lit(1).cast("bigint"),
        ).alias("w")
    )
    b = {
        r.doc_id
        for r in c.crossJoin(F.broadcast(w))
        .filter(
            F.expr("cum_n_chars div w")
            > F.expr("(cum_n_chars - n_chars) div w")
        )
        .collect()
    }
    assert a == b and len(a) > 10


def test_sketch_set_ops_identities(spark):
    """Exact inclusion-exclusion identity holds and both sketch gates
    pass on the fixture."""
    from aws_iceberg_automation_spark.registry import all_specs

    r = all_specs()["q280_sketch_set_ops"].fn(spark, SF_DIR).collect()[0]
    assert r.n_intersect <= min(r.n_a, r.n_b)
    assert r.n_union <= r.n_a + r.n_b
    assert r.n_a + r.n_b - r.n_union == r.n_intersect
    assert r.union_est_ok and r.intersect_est_ok


def test_expire_retention_plan_reclaims_only_unreachable(spark):
    """Row-level retention accounting: only v1's own files are
    reclaimable under keep-last-2 (v2's files stay referenced by v3)."""
    from aws_iceberg_automation_spark.registry import all_specs

    rows = {
        r.version: r
        for r in all_specs()["q277_expire_retention_plan"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert rows[1].expired and rows[2].expired
    assert not rows[3].expired and not rows[4].expired
    assert rows[1].n_rows_reclaimable == rows[1].n_rows_visible > 0
    assert rows[2].n_rows_reclaimable == 0  # v2's files still feed v3
    assert rows[3].n_rows_visible > rows[2].n_rows_visible  # append grew it
    assert rows[3].n_rows_reclaimable == rows[4].n_rows_reclaimable == 0


def test_ivf_delta_covers_exactly_the_delta(spark):
    """Postings growth must account for every delta vector exactly
    once: sum(n_new) == |vec_id % 10 == 0| and sum(n_base) == the rest."""
    from aws_iceberg_automation_spark.io import load_table
    from aws_iceberg_automation_spark.registry import all_specs

    out = all_specs()["q271_ivf_delta_reassign"].fn(spark, SF_DIR).collect()
    e = load_table(spark, SF_DIR, "embeddings")
    n_delta = e.filter(F.pmod("vec_id", F.lit(10)) == 0).count()
    n_base = e.count() - n_delta
    assert sum(r.n_new for r in out) == n_delta
    assert sum(r.n_base for r in out) == n_base
    assert len(out) == 16  # every list reported, zeros included
