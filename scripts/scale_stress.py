"""Scale-up stress: synthesize an N×-replicated copy of the sf0.1
fixtures (key-shifted so joins stay consistent and cardinalities really
grow), written as multiple parquet files per table, then run the bench
headline queries against it. This is the 'would the plan survive a
scale-up' probe the local fixtures can't provide: multi-file parallel
scans, bigger shuffles, same plans.

Usage: python scripts/scale_stress.py [factor] [base_sf_dir] [extra_query ...]
Runs the bench-tagged headline set plus any extra named registry
queries. Writes to /tmp/scale_stress_sf<factor>/ and prints one JSON
line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from aws_iceberg_automation_spark.io import load_table  # noqa: E402
from aws_iceberg_automation_spark.registry import all_specs  # noqa: E402
from aws_iceberg_automation_spark.session import get_spark  # noqa: E402

# key columns shifted per replica so fact/dim multiplicities scale.
# EVERY foreign key must shift with its parent: un-shifted l_suppkey/
# l_partkey made all N replicas' lineitems reference the 1× supplier/
# part rows — (supplier, day) co-purchase groups then grew N× and the
# pair joins N²× (the round-3 q135 probe artifact), while part/supplier
# joins silently dropped replicas 1..N-1 on dangling keys.
_SHIFT = {
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "region": [],
    "nation": [],
}
_STRIDE = 10_000_000


def build(spark, base: str, out: str, factor: int) -> None:
    for t, keys in _SHIFT.items():
        src = load_table(spark, base, t)
        if not keys or factor == 1 or t in ("region", "nation"):
            rep = src
        else:
            copies = []
            for i in range(factor):
                c = src
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * _STRIDE))
                copies.append(c)
            rep = copies[0]
            for c in copies[1:]:
                rep = rep.unionByName(c)
        n_files = 16 if t in ("lineitem", "orders", "events") else 4
        rep.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = f"/tmp/scale_stress_x{factor}"
    spark = get_spark(app_name="scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # Reuse a completed replica (all 10 tables committed) when
    # SPARK_GRAFT_STRESS_REUSE=1 — probing a long newcomer list in
    # several short runs must not pay the multi-minute build each time.
    reuse = os.environ.get("SPARK_GRAFT_STRESS_REUSE") == "1" and all(
        os.path.exists(os.path.join(out, f"{t}.parquet", "_SUCCESS"))
        for t in _SHIFT
    )
    if reuse:
        build_sec = 0.0
    else:
        if os.path.exists(out):
            shutil.rmtree(out)
        t0 = time.monotonic()
        build(spark, base, out, factor)
        build_sec = round(time.monotonic() - t0, 1)

    specs = all_specs()
    if sys.argv[3:] == ["ALL"]:
        # full-registry probe: every registered query, bench set first
        headline = [n for n, s in specs.items() if "bench" in s.tags]
        headline += [n for n in specs if n not in headline]
    elif os.environ.get("SPARK_GRAFT_STRESS_ONLY") == "1":
        # extras only — skip the bench headline set (already probed)
        headline = [n for n in sys.argv[3:] if n in specs]
    else:
        headline = [n for n, s in specs.items() if "bench" in s.tags]
        headline += [n for n in sys.argv[3:] if n in specs and n not in headline]
    if not headline:
        sys.exit("no queries selected (unknown names under STRESS_ONLY?)")
    specs[headline[0]].fn(spark, out).write.format("noop").mode("overwrite").save()
    timings = {}
    for name in headline:
        t0 = time.monotonic()
        specs[name].fn(spark, out).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"[probe] {name}: {timings[name]}s", flush=True)
    print(
        json.dumps(
            {
                "factor": factor,
                "build_sec": build_sec,
                "total_sec": round(sum(timings.values()), 3),
                "queries": timings,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
