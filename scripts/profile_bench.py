"""Per-query bench profiler (guide §1: measure first).

For each bench-tagged query (or names passed on argv) at
$SPARK_GRAFT_SF_DIR: wall seconds for a noop-sink run, the number of
Spark JOBS the run launched (eager boundary collects / broadcasts show
up here — each job is ~50-150 ms of fixed local-mode latency), the
number of stages, and the AQE-final exchange count. Prints one JSON
line per query plus a sorted summary.

Usage: python scripts/profile_bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = [a for a in args if not os.path.isdir(a)]

    from aws_iceberg_automation_spark.registry import all_specs
    from aws_iceberg_automation_spark.session import get_spark

    spark = get_spark(app_name="profile-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    if not names:
        names = [n for n, s in specs.items() if "bench" in s.tags]

    tracker = spark.sparkContext.statusTracker()

    # warm-up
    specs[names[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        jobs_before = tracker.getJobIdsForGroup(None)
        n_jobs_before = max(jobs_before) if jobs_before else -1
        t0 = time.monotonic()
        df = specs[name].fn(spark, sf_dir)
        t_build = time.monotonic() - t0
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        jobs_after = tracker.getJobIdsForGroup(None)
        n_jobs_after = max(jobs_after) if jobs_after else -1
        n_jobs = n_jobs_after - n_jobs_before
        n_stages = 0
        for jid in jobs_after:
            if jid > n_jobs_before:
                info = tracker.getJobInfo(jid)
                if info:
                    n_stages += len(info.stageIds)
        try:
            final = df._jdf.queryExecution().executedPlan().toString()
            n_ex = final.count("Exchange")
        except Exception:
            n_ex = -1
        rows.append(
            {
                "query": name,
                "sec": round(dt, 3),
                "build_sec": round(t_build, 3),
                "jobs": n_jobs,
                "stages": n_stages,
                "exec_exchanges": n_ex,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        spark.sparkContext.setJobDescription(None)

    rows.sort(key=lambda r: -r["sec"])
    print("\n== sorted by wall sec ==")
    for r in rows:
        print(
            f"{r['sec']:8.3f}s  jobs={r['jobs']:3d} stages={r['stages']:3d} "
            f"exch={r['exec_exchanges']:3d} build={r['build_sec']:6.3f}s  "
            f"{r['query']}"
        )
    print(
        json.dumps(
            {
                "total_sec": round(sum(r["sec"] for r in rows), 3),
                "total_jobs": sum(r["jobs"] for r in rows),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
