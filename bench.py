"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with the noop sink (full pipeline, no driver
collect). One warm-up run of the flagship amortizes JVM/codegen start.

Timing methodology (round-3 disclosure, VERDICT r02 nit #5; n raised
to 3 per VERDICT r05 ask #7): each query runs three times; the
headline ``value``/``queries`` report the MIN (this container's
wall-clock drifts 1.5-2.5× with co-tenant load — round-2 A/B
re-benched identical code at 1.5× hours later, round 5 measured q82 at
3.0→8.1 s with zero code change; min-of-n measures the code, not the
noisiest neighbor). The line ALSO reports
``value_first_run``/``queries_first_run`` — the first-shot numbers on
the same methodology as the anchor and BENCH_r01, so both
round-over-round and vs-anchor comparisons stay methodology-stable —
plus a ``noise_note`` so the artifact carries its own caveat.
``n`` records runs-per-query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from aws_iceberg_automation_spark.registry import all_specs
    from aws_iceberg_automation_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    headline = [n for n, s in specs.items() if "bench" in s.tags] or [e.FLAGSHIP]

    # warm-up (JVM, codegen, parquet footer cache)
    specs[e.FLAGSHIP].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    n_runs = 3
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for i in range(n_runs):
            t0 = time.monotonic()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if i == 0:
                first_run[name] = round(dt, 3)
            best = min(best, dt)
        timings[name] = round(best, 3)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "n": n_runs,
        "value_first_run": round(sum(first_run.values()), 3),
        "queries_first_run": first_run,
        "noise_note": (
            "co-tenant wall-clock drift on this box is 1.5-2.5x within a "
            "session (measured rounds 2/5 on identical code); compare "
            "min-of-n across rounds, never single first-run numbers"
        ),
        "sf": float(m.group(1)) if m else sf_dir,
    }
    # The anchor (BENCH_ANCHOR.json) froze a 12-query set; round 4 put
    # the LLM-pipeline heavies (span-rewrite / LSH dedup / PQ-ADC)
    # under the same gate, which grows the headline total. For an
    # apples-to-apples vs-anchor read, also report the total over
    # exactly the anchor's query set.
    anchor_path = os.path.join(REPO, "BENCH_ANCHOR.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor_qs = set(json.load(f).get("queries", {}))
        if anchor_qs <= set(timings):
            out["value_anchor_set"] = round(
                sum(timings[q] for q in anchor_qs), 3
            )
            out["value_anchor_set_first_run"] = round(
                sum(first_run[q] for q in anchor_qs), 3
            )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
