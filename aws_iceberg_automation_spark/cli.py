"""CLI — parity with the reference's two entry points, fail-loud.

- ``create-table <spec.yml> [--warehouse DIR]`` mirrors
  ``python create_iceberg_table.py <config_yaml> <warehouse_path>``
  (reference `create_iceberg_tables.py:59-65`): validate the YAML spec,
  ensure the namespace, execute the DDL, print it. Unlike the reference
  (which swallows DDL errors at `:153-156` and always exits 0), any
  failure exits non-zero.
- ``diagnose`` mirrors the CI smoke script (`test_iceberg.py`): session
  + catalog health, but as real checks with a meaningful exit code
  instead of printed checkmarks that never fail the job.
- ``snapshots`` / ``rollback`` expose the versioned-table time-travel
  surface (#15 fallback, versioning.py) for operators: inspect the
  snapshot log, rewind a table to an earlier committed state.

Usage::

    python -m aws_iceberg_automation_spark.cli create-table spec.yml
    python -m aws_iceberg_automation_spark.cli diagnose
    python -m aws_iceberg_automation_spark.cli snapshots /path/to/table
    python -m aws_iceberg_automation_spark.cli rollback /path/to/table 3
    python -m aws_iceberg_automation_spark.cli dq-check data.parquet rules.yml
    python -m aws_iceberg_automation_spark.cli explain q01_pricing_summary
    python -m aws_iceberg_automation_spark.cli sql "SELECT count(*) FROM lineitem"
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="aws-iceberg-automation-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create-table", help="create a table from a YAML spec")
    c.add_argument("spec", help="path to the YAML table spec")
    c.add_argument("--warehouse", default=None, help="warehouse directory")
    c.add_argument(
        "--catalog", default=None, help="target catalog (default: session catalog)"
    )

    sub.add_parser("diagnose", help="session/catalog health check")

    s = sub.add_parser("snapshots", help="versioned-table snapshot log")
    s.add_argument("root", help="versioned table root path")

    r = sub.add_parser("rollback", help="rewind a versioned table")
    r.add_argument("root", help="versioned table root path")
    r.add_argument("version", type=int, help="snapshot version to restore")

    ch = sub.add_parser(
        "changes", help="incremental append-diff row count between snapshots"
    )
    ch.add_argument("root", help="versioned table root path")
    ch.add_argument("from_version", type=int, help="exclusive lower snapshot")
    ch.add_argument(
        "--to", type=int, default=None, help="inclusive upper snapshot (default CURRENT)"
    )

    sq = sub.add_parser("sql", help="run Spark SQL over the fixture tables")
    sq.add_argument("query", help="SQL text (tables: region nation customer ...)")
    sq.add_argument(
        "--sf-dir", dest="sql_sf_dir", default="/root/testdata/sf0.001",
        help="fixture directory",
    )
    sq.add_argument("--limit", type=int, default=100, help="max rows printed")

    ex = sub.add_parser(
        "explain", help="physical plan + shape summary for a registered query"
    )
    ex.add_argument("query", help="registry query name (e.g. q01_pricing_summary)")
    ex.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001", help="fixture directory"
    )

    cl = sub.add_parser(
        "changelog", help="row-level CDC summary between snapshots"
    )
    cl.add_argument("root", help="versioned table root path")
    cl.add_argument("from_version", type=int, help="exclusive lower snapshot")
    cl.add_argument(
        "--to", type=int, default=None, help="inclusive upper snapshot (default CURRENT)"
    )

    br = sub.add_parser("branch", help="versioned-table branch/tag/publish")
    br.add_argument("root", help="versioned table root path")
    br.add_argument(
        "action",
        choices=["create", "tag", "drop", "publish", "merge", "list"],
        help="ref operation (merge = 3-way key-grain merge into main)",
    )
    br.add_argument("name", nargs="?", default=None, help="ref name")
    br.add_argument(
        "--at", type=int, default=None, help="snapshot version (default CURRENT)"
    )
    br.add_argument(
        "--on",
        default=None,
        help="comma-separated merge key columns (required for merge)",
    )
    br.add_argument(
        "--resolve",
        choices=["ours", "theirs"],
        default=None,
        help="conflict policy for merge (default: raise on conflicts)",
    )

    al = sub.add_parser(
        "alter", help="metadata-only schema evolution on a versioned table"
    )
    al.add_argument("root", help="versioned table root path")
    al.add_argument(
        "--add", action="append", default=[],
        help="'name type' column to add (repeatable)",
    )
    al.add_argument(
        "--rename", action="append", default=[],
        help="'old=new' column rename (repeatable)",
    )
    al.add_argument(
        "--drop", action="append", default=[], help="column to drop (repeatable)"
    )
    al.add_argument(
        "--widen", action="append", default=[],
        help="'col=type' legal type promotion, e.g. qty=bigint (repeatable)",
    )

    de = sub.add_parser(
        "delete-eq",
        help="merge-on-read equality delete (writes a delete FILE, no rewrite)",
    )
    de.add_argument("root", help="versioned table root path")
    de.add_argument(
        "predicate", nargs="?", default=None,
        help="SQL predicate selecting rows to delete (omit with --compact)",
    )
    de.add_argument(
        "--keys", default=None, help="comma-separated equality-delete key columns"
    )
    de.add_argument(
        "--compact", action="store_true",
        help="fold all accumulated delete files into a clean rewrite instead",
    )

    dq = sub.add_parser(
        "dq-check", help="run a YAML rule suite against a parquet table"
    )
    dq.add_argument("path", help="parquet file/directory to validate")
    dq.add_argument("rules", help="YAML rule file: rules: [{name, expr}, ...]")

    orp = sub.add_parser(
        "orphans", help="list (or remove) unreferenced data files of a versioned table"
    )
    orp.add_argument("root", help="versioned table root")
    orp.add_argument("--remove", action="store_true", help="delete the orphans")
    orp.add_argument(
        "--older-than",
        type=float,
        default=259_200,
        dest="older_than",
        help="minimum file age in seconds (default 3 days — shields in-flight writes)",
    )

    cr = sub.add_parser(
        "corpus-report",
        help="print the corpus datasheet (per lang x source census)",
    )
    cr.add_argument(
        "--sf-dir", default="/root/testdata/sf0.01", dest="cr_sf_dir"
    )

    args = p.parse_args(argv)

    from .catalog import TableManager
    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}", warehouse=getattr(args, "warehouse", None))
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "create-table":
        from .tablespec import SpecError, TableSpec

        try:
            spec = TableSpec.from_yaml(args.spec)
            mgr = TableManager(spark, catalog=args.catalog)
            ddl = mgr.create_table(spec)
        except (SpecError, Exception) as e:  # noqa: BLE001 — fail loud, exit 1
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(ddl)
        print(f"created {spec.qualified_name} (format capability: {mgr.using})")
        return 0

    if args.cmd == "diagnose":
        mgr = TableManager(spark)
        diag = mgr.diagnostics()
        print(json.dumps(diag, indent=2, default=str))
        healthy = bool(diag["spark_version"]) and isinstance(diag["namespaces"], list)
        return 0 if healthy else 1

    if args.cmd == "sql":
        from .io import register_views

        register_views(spark, args.sql_sf_dir)
        try:
            df = spark.sql(args.query)
        except Exception as e:  # noqa: BLE001 — fail loud, exit 1
            print(f"error: {e}", file=sys.stderr)
            return 1
        rows = df.limit(args.limit).collect()
        print(json.dumps([r.asDict(recursive=True) for r in rows], default=str, indent=2))
        return 0

    if args.cmd == "explain":
        from .plans.explain import plan_string, pushed_filters
        from .registry import all_specs

        specs = all_specs()
        if args.query not in specs:
            print(f"error: unknown query {args.query!r}", file=sys.stderr)
            close = [n for n in specs if args.query.split("_")[0] in n]
            if close:
                print(f"did you mean: {', '.join(close[:5])}", file=sys.stderr)
            return 1
        df = specs[args.query].fn(spark, args.sf_dir)
        plan = plan_string(df)
        print(plan)
        shape = {
            "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
            "exchanges": plan.count("Exchange"),
            "pushed_filters": pushed_filters(df),
            "python_boundaries": sum(
                plan.count(op)
                for op in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
            ),
            "row_python_udfs": plan.count("BatchEvalPython"),
        }
        print(json.dumps(shape, indent=2))
        return 0

    if args.cmd == "dq-check":
        import yaml

        from pyspark.sql import functions as F

        from .operators.dq import Rule, validate

        with open(args.rules) as fh:
            doc = yaml.safe_load(fh)
        entries = (doc or {}).get("rules") or []
        if not entries:
            print("error: no rules in spec", file=sys.stderr)
            return 1
        try:
            rules = [Rule(e["name"], F.expr(e["expr"])) for e in entries]
            report = validate(spark.read.parquet(args.path), rules).collect()
        except Exception as e:  # noqa: BLE001 — fail loud, exit 1
            print(f"error: {e}", file=sys.stderr)
            return 1
        out = [
            {"rule": r.rule, "n_violations": r.n_violations, "passed": r.passed}
            for r in report
        ]
        print(json.dumps({"table": args.path, "report": out}, indent=2))
        return 0 if all(r.passed for r in report) else 1

    if args.cmd == "orphans":
        from .versioning import VersionedTable, VersioningError

        try:
            vt = VersionedTable(spark, args.root)
            orphans = vt.orphan_files(
                remove=args.remove, older_than_seconds=args.older_than
            )
        except (VersioningError, OSError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(
            json.dumps(
                {
                    "root": args.root,
                    "removed" if args.remove else "orphans": orphans,
                    "count": len(orphans),
                },
                indent=2,
            )
        )
        return 0

    if args.cmd == "corpus-report":
        from .registry import all_specs

        specs = all_specs()
        rows = (
            specs["q176_corpus_datasheet"]
            .fn(spark, args.cr_sf_dir)
            .orderBy("lang", "source")
            .collect()
        )
        print(
            json.dumps(
                {"sf_dir": args.cr_sf_dir, "cells": [r.asDict() for r in rows]},
                indent=2,
            )
        )
        return 0

    if args.cmd == "changes":
        from .versioning import VersionedTable, VersioningError

        vt = VersionedTable(spark, args.root)
        try:
            delta = vt.changes(args.from_version, args.to)
            print(
                json.dumps(
                    {
                        "from": args.from_version,
                        "to": args.to if args.to is not None else vt.current_version(),
                        "rows": delta.count(),
                        "files": len(delta.inputFiles()),
                    }
                )
            )
        except VersioningError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        return 0

    if args.cmd == "changelog":
        from pyspark.sql import functions as F

        from .versioning import VersionedTable, VersioningError

        vt = VersionedTable(spark, args.root)
        try:
            delta = vt.changelog(args.from_version, args.to)
            counts = {
                r._change_type: r.n
                for r in delta.groupBy("_change_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            print(
                json.dumps(
                    {
                        "from": args.from_version,
                        "to": args.to if args.to is not None else vt.current_version(),
                        "changes": counts,
                    }
                )
            )
        except VersioningError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        return 0

    if args.cmd == "branch":
        from .versioning import VersionedTable, VersioningError

        vt = VersionedTable(spark, args.root)
        try:
            if args.action in ("create", "tag", "drop", "publish") and not args.name:
                print("error: ref name required", file=sys.stderr)
                return 1
            if args.action == "create":
                vt.create_branch(args.name, at_version=args.at)
            elif args.action == "tag":
                vt.create_tag(args.name, at_version=args.at)
            elif args.action == "drop":
                vt.drop_ref(args.name)
            elif args.action == "publish":
                vt.publish_branch(args.name)
            elif args.action == "merge":
                if not args.on:
                    print("error: --on key columns required", file=sys.stderr)
                    return 1
                res = vt.merge_branch(
                    args.name, on=args.on.split(","), resolve=args.resolve
                )
                # one machine-readable JSON object per invocation, like
                # every other CLI path (round-9 ADVICE: the shared
                # current/refs print after the merge print emitted two)
                print(
                    json.dumps(
                        {
                            **res,
                            "current": vt.current_version(),
                            "refs": vt.refs(),
                        }
                    )
                )
                return 0
            print(
                json.dumps({"current": vt.current_version(), "refs": vt.refs()})
            )
        except VersioningError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        return 0

    if args.cmd == "alter":
        from .versioning import VersionedTable, VersioningError

        vt = VersionedTable(spark, args.root)
        renames = {}
        for r in args.rename:
            old, _, new = r.partition("=")
            if not new:
                print(f"error: --rename wants 'old=new', got {r!r}", file=sys.stderr)
                return 1
            renames[old] = new
        widens = {}
        for w in args.widen:
            col, _, typ = w.partition("=")
            if not typ:
                print(f"error: --widen wants 'col=type', got {w!r}", file=sys.stderr)
                return 1
            widens[col] = typ
        try:
            v = None
            if args.add or renames or args.drop:
                v = vt.alter_table(
                    adds=args.add or None,
                    renames=renames or None,
                    drops=args.drop or None,
                )
            if widens:
                v = vt.alter_column_type(widens)
            if v is None:
                print("error: nothing to alter", file=sys.stderr)
                return 1
        except VersioningError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(json.dumps({"version": v, "schema": vt.snapshot(v).schema}))
        return 0

    if args.cmd == "delete-eq":
        from .versioning import VersionedTable, VersioningError

        vt = VersionedTable(spark, args.root)
        try:
            if args.compact:
                v = vt.compact_eq_deletes()
            else:
                if not args.predicate or not args.keys:
                    print(
                        "error: predicate and --keys required (or --compact)",
                        file=sys.stderr,
                    )
                    return 1
                v = vt.delete_where_eq(args.predicate, keys=args.keys.split(","))
        except VersioningError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        snap = vt.snapshot(v)
        print(
            json.dumps(
                {
                    "version": v,
                    "op": snap.op,
                    "n_delete_files": sum(
                        len(e["files"]) for e in snap.eq_deletes
                    ),
                }
            )
        )
        return 0

    if args.cmd in ("snapshots", "rollback"):
        from .versioning import VersionedTable, VersioningError

        vt = VersionedTable(spark, args.root)
        try:
            if args.cmd == "rollback":
                vt.rollback(args.version)
            log = [s.__dict__ | {"n_files": len(s.files)} for s in vt.snapshots()]
            for entry in log:
                entry.pop("files")
                entry.pop("stats", None)  # per-file bounds — too wide for the log view
            print(
                json.dumps(
                    {"current": vt.current_version(), "snapshots": log}, indent=2
                )
            )
        except VersioningError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
