"""Dump .explain('formatted') for named queries to plans/r10/<q>_<tag>.txt.

Also appends the AQE-final executedPlan (after a noop-sink run) so plan
claims (exchange counts, join strategies) are checkable post-AQE.

Usage: python scripts/dump_plans.py <tag> [sf_dir] [query ...]
  tag = before | after
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = [a for a in rest if not os.path.isdir(a)]

    from aws_iceberg_automation_spark.registry import all_specs
    from aws_iceberg_automation_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    if not names:
        names = [n for n, s in specs.items() if "bench" in s.tags]

    out_dir = os.path.join(REPO, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        df.write.format("noop").mode("overwrite").save()
        final = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== explain(formatted), pre-execution ==\n{formatted}\n")
            f.write(f"\n== AQE-final executedPlan after noop run ==\n{final}\n")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
