"""Registry-wide contract test: every registered query runs on sf0.001
and, when it declares an oracle, matches DuckDB exactly — the same gate
the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def test_registry_nonempty():
    assert "q01_pricing_summary" in SPECS


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, oracle_check):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke; invariants live in dedicated tests
    else:
        oracle_check(df, spec.oracle)


def test_driver_priority_names_exist():
    """Every name in the driver-ordering list must be a registered query
    (a stale name would silently waste a verification slot), and the
    ordered registry must put the priority names first."""
    from aws_iceberg_automation_spark.registry import _DRIVER_PRIORITY

    missing = [n for n in _DRIVER_PRIORITY if n not in SPECS]
    assert not missing, f"stale priority names: {missing}"
    assert list(SPECS)[: len(_DRIVER_PRIORITY)] == [
        n for n in _DRIVER_PRIORITY if n in SPECS
    ]


def test_first_50_specs_have_no_untestable_outputs(spark):
    """The driver's 50-spec budget must not be burned on queries whose
    final schema the driver cannot canonicalize (array/map/struct) or
    that surface raw DECIMAL (never hash-equal vs DuckDB float64)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    first50 = list(SPECS)[:50]
    bad: list[str] = []
    for name in first50:
        df = SPECS[name].fn(spark, SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, bad


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert "sum_qty" in e.entry(spark).columns


def test_top50_window_spends_budget_on_unproven_oracle_backed_queries():
    """The driver verifies only the first 50 specs per round; that
    budget must go where attestation is weakest (VERDICT r02 ask #1).
    Through round 10 that meant queries with no driver row in ANY prior
    round; as of round 10 every oracle-backed query has a green row
    from some round, so the budget's job becomes RE-ATTESTATION: a slot
    is well spent iff the query's implementation (or a helper under it)
    changed after its last green row — otherwise the driver re-proves
    the proven (VERDICT r10 ask #1 names the r10-rewritten paths).
    Mechanically: every slot must be oracle-backed, and the window must
    not be a stale copy of a FULLY-verified prior window — rotation is
    an explicit act that must touch the list."""
    import json
    import os

    from aws_iceberg_automation_spark.registry import all_specs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified_by_round: dict[str, int] = {}
    for fn in sorted(os.listdir(repo)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            rnd = int(fn[len("CORRECTNESS_r"):-len(".json")])
            for name, row in json.load(open(os.path.join(repo, fn))).items():
                # only GREEN rows count as attested — a crash row
                # (rows_match null) must not bar a query from
                # re-occupying a verification slot
                if row.get("rows_match") and row.get("schema_match"):
                    verified_by_round[name] = max(
                        verified_by_round.get(name, 0), rnd
                    )
    specs = all_specs()
    top50 = list(specs)[:50]
    assert len(top50) == 50
    rows_only = [n for n in top50 if specs[n].oracle is None]
    assert rows_only == [], f"rows-only specs in the top-50 window: {rows_only}"
    # The window must not be byte-identical to a prior FULLY-verified
    # window: if every slot is already green, at least the round-11
    # re-attestation anchors (the r10-rewritten bench paths, which had
    # no post-rewrite driver row — VERDICT r10 "what's wrong" #3) must
    # be present, proving the list was deliberately rotated onto the
    # changed code rather than left re-proving an unchanged set.
    reattest_anchors = {
        "q208_rfm_segments",
        "q82_minhash_lsh_neardup",
        "q171_span_dedup_clean",
        "q01_pricing_summary",
        "q38_hash_agg_groupby",
        "q83_cosine_topk_exact",
    }
    already = [n for n in top50 if n in verified_by_round]
    if len(already) == 50:
        assert reattest_anchors <= set(top50), (
            "top-50 window is fully verified AND carries none of the "
            "rewritten-path re-attestation anchors — rotate "
            "_DRIVER_PRIORITY onto the paths whose code changed since "
            f"their last green row: {sorted(reattest_anchors - set(top50))}"
        )


def test_hostile_sweep_covers_whole_registry():
    """The committed hostile-sweep report (SWEEP_REPORT.json — written
    by scripts/verify_contract.py under SPARK_GRAFT_VERIFY_REPORT with
    hostile session confs) must name every registered query, and every
    named query must have passed. A query registered after the sweep
    reddens HERE instead of silently dodging the 'whole registry'
    claim (VERDICT r03 ask #3 — q195 post-dated the round-3 sweep)."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Both committed hostile variants are held to the same bar: the
    # ANSI-off/Asia-Kolkata/7-partition sweep (SWEEP_REPORT.json) and
    # the ANSI-on/Pacific-Chatham/67-partition sweep (_V2) — round 5
    # put variant 2 under the guard too, so "passes both polarities"
    # stays a measured claim, not a remembered one.
    for fname in ("SWEEP_REPORT.json", "SWEEP_REPORT_V2.json"):
        path = os.path.join(repo, fname)
        assert os.path.exists(path), f"{fname} missing — run the hostile sweep"
        report = json.load(open(path))["results"]
        unswept = sorted(set(SPECS) - set(report))
        assert not unswept, f"{fname}: registered but never hostile-swept: {unswept}"
        red = sorted(n for n, s in report.items() if s == "FAIL")
        assert not red, f"{fname}: hostile sweep failures committed: {red}"


def test_scale_md_sweep_count_matches_report():
    """SCALE.md's headline hostile-sweep count must equal the committed
    SWEEP_REPORT.json size (VERDICT r04 ask #5 — the doc said 234/234
    while the report held 273). Parses the 'N/N green over the whole
    registry' phrase so any future drift reddens here."""
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = json.load(open(os.path.join(repo, "SWEEP_REPORT.json")))["results"]
    text = open(os.path.join(repo, "SCALE.md")).read()
    m = re.search(r"\*\*(\d+)/(\d+) green over the\s+whole registry\*\*", text)
    assert m, "SCALE.md no longer states the sweep count phrase"
    assert int(m.group(1)) == int(m.group(2)) == len(report), (
        f"SCALE.md says {m.group(0)} but SWEEP_REPORT.json has "
        f"{len(report)} queries — update the doc (or re-run the sweep)"
    )


@pytest.mark.parametrize(
    "name",
    [
        "q31_anti_join",
        "q64_except",
        "q82d_embedding_neardup",
        "q326_sequence_gap_detection",
    ],
)
def test_fixture_results_stay_nonvacuous(name, spark):
    """These queries once returned the empty set on the fixtures,
    making their oracle comparison verify nothing (empty == empty).
    Their filters were retuned to produce rows; a fixture-generator
    change that flips any back to empty must fail HERE, not silently
    re-vacuate the gate."""
    from tests.conftest import SF_DIR

    from aws_iceberg_automation_spark.registry import all_specs

    n = all_specs()[name].fn(spark, SF_DIR).count()
    assert n > 0, f"{name} is vacuous again (0 rows at {SF_DIR})"


def test_plans_md_covers_registry_and_bans_cartesian():
    """Registry-wide plan lint over the committed PLANS.md audit: every
    registered query has a row (so the doc is regenerated after each
    registration batch), no batch plan chose CartesianProduct anywhere
    (the one strategy with no bounded-work story — every intentional
    small-side cross join in the repo broadcasts, which Catalyst plans
    as BroadcastNestedLoop), and q208's exchange count stays at the
    multi-dimension-ntile level (the round-5 74→20 rewrite) so a
    regression back to chained decompositions reddens here instead of
    silently re-inflating the bench."""
    import os
    import re

    from aws_iceberg_automation_spark.registry import all_specs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = {}
    for line in open(os.path.join(repo, "PLANS.md")):
        m = re.match(r"\| (q\w+) \| (\S+) \| (\S+) \|", line)
        if m:
            rows[m.group(1)] = (m.group(2), m.group(3))
    missing = sorted(set(all_specs()) - set(rows))
    assert not missing, (
        f"queries registered but absent from PLANS.md: {missing} — "
        "re-run scripts/plan_report.py"
    )
    cartesian = sorted(n for n, (_, joins) in rows.items() if "X" in joins)
    assert not cartesian, f"CartesianProduct in committed plans: {cartesian}"
    q208_shuffles = rows["q208_rfm_segments"][0]
    assert q208_shuffles != "—" and int(q208_shuffles) <= 24, (
        f"q208 exchange count regressed to {q208_shuffles} (was 20 after "
        "the global_ntiles rewrite, 74 before it)"
    )


def test_plans_md_bench_exec_rows_measured_and_arrow_only():
    """The post-execution (AQE-final) audit of the bench set (VERDICT
    r05 ask #5): PLANS.md must carry an ``exec:`` row for every
    non-streaming bench-tagged query, each with a MEASURED codegen span
    count (> 0 — the pre-execution table legitimately reads 0 under
    AQE; the executed plan never should), and no row may contain
    BatchEvalPython — the row-at-a-time Python boundary; every Python
    crossing in the bench set must be an Arrow-batched operator."""
    import os
    import re

    from aws_iceberg_automation_spark.registry import all_specs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = {}
    for line in open(os.path.join(repo, "PLANS.md")):
        m = re.match(r"\| exec:(q\w+) \| (\d+) \| (\S+) \|", line)
        if m:
            rows[m.group(1)] = (int(m.group(2)), m.group(3))
    expected = sorted(
        n
        for n, s in all_specs().items()
        if "bench" in s.tags and "streaming" not in s.tags
    )
    missing = sorted(set(expected) - set(rows))
    assert not missing, (
        f"bench queries without an exec: row in PLANS.md: {missing} — "
        "re-run scripts/plan_report.py"
    )
    zero = sorted(n for n in expected if rows[n][0] == 0)
    assert not zero, f"bench queries with zero executed codegen spans: {zero}"
    rowpy = sorted(n for n in expected if "BatchEvalPython" in rows[n][1])
    assert not rowpy, f"row-at-a-time Python in the bench set: {rowpy}"
    # VERDICT r06 ask #6: the audit must also cover the 10 most
    # expensive non-streaming registry queries by measured hostile-sweep
    # wall seconds — the codegen claim measured where the time goes.
    import json

    sweep = json.load(open(os.path.join(repo, "SWEEP_REPORT.json")))
    secs = sweep.get("seconds", {})
    if secs:
        specs = all_specs()
        top = sorted(
            (n for n in secs if n in specs and "streaming" not in specs[n].tags),
            key=lambda n: -secs[n],
        )[:10]
        unaudited = sorted(set(top) - set(rows))
        assert not unaudited, (
            f"top sweep-cost queries without an exec: row: {unaudited} — "
            "re-run scripts/plan_report.py after the sweep"
        )
        rowpy = sorted(n for n in top if "BatchEvalPython" in rows[n][1])
        assert not rowpy, f"row-at-a-time Python in top sweep-cost set: {rowpy}"


def test_probe20x_covers_whole_registry():
    """PROBE20X.json (the full-registry 20× scale probe — every
    registered query measured at the key-shifted replica) must name
    every registered query, the same discipline the hostile-sweep
    guard enforces for correctness: a query registered after the last
    probe reddens here instead of silently dodging the 'measured at
    20×' claim. Round 7 introduced the artifact after the full probe
    caught two scale defects (q107's quadratic pair stage, q82c's
    60×-per-bit md5) that per-round newcomer probes alone had missed."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "PROBE20X.json")
    assert os.path.exists(path), "PROBE20X.json missing — run the full 20× probe"
    probed = json.load(open(path))["seconds"]
    unprobed = sorted(set(SPECS) - set(probed))
    assert not unprobed, (
        f"registered but never 20×-probed: {unprobed} — run "
        "scripts/scale_stress.py 20 /root/testdata/sf0.1 ALL and refresh "
        "PROBE20X.json"
    )
