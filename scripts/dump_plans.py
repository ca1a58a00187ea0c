"""Dump .explain('formatted') for named queries to
plans/$SPARK_GRAFT_PLANS_ROUND/<q>_<tag>.txt (round dir default r10).

Also appends the AQE-final executedPlan (after a noop-sink run) so plan
claims (exchange counts, join strategies) are checkable post-AQE.

Usage: [SPARK_GRAFT_PLANS_ROUND=r11] python scripts/dump_plans.py <tag> [sf_dir] [query ...]
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

    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10")
    )
    os.makedirs(out_dir, exist_ok=True)
    from aws_iceberg_automation_spark.plans.explain import final_plan_string

    for name in names:
        df = specs[name].fn(spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # r11 fix: the old form ran a noop WRITE and then printed
        # df.queryExecution().executedPlan() — but the write is its
        # OWN QueryExecution, so the df's plan was never executed and
        # the "AQE-final" section silently showed the pre-AQE shape
        # (the q171 evidence contradiction VERDICT r10 flagged).
        # final_plan_string collects THROUGH the df's own execution,
        # which is the only way the printed plan is the one that ran.
        final = final_plan_string(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== explain(formatted), pre-execution ==\n{formatted}\n")
            f.write(f"\n== AQE-final executedPlan (collected) ==\n{final}\n")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
