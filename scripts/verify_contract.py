"""Mirror of the driver's correctness gate, runnable locally.

Runs ``entry(spark)`` as a smoke check, then every ``queries()`` entry
against its ``oracle_sql()`` DuckDB counterpart at the given scale
factor: row-count, sorted-column-name schema, and an order-insensitive
exact value comparison (the driver hashes values, so exact is the bar).

Usage: python scripts/verify_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def canon(v):
    """Canonicalize one cell so Spark and DuckDB values compare exactly.
    Every result is a (tag, payload) tuple of strings so mixed NULL /
    non-NULL columns still sort (Python can't order str vs tuple)."""
    if v is None:
        return ("0n", "")
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, Decimal):
        return ("f", repr(float(v)))
    if isinstance(v, int):
        return ("i", str(v).rjust(24))
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v.hex())
    if isinstance(v, (list, tuple)):
        return ("l", repr(tuple(canon(x) for x in v)))
    if isinstance(v, dict):
        return ("d", repr(tuple(sorted((str(k), canon(x)) for k, x in v.items()))))
    return ("s", str(v))


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def run(sf_dir: str, only: list[str]) -> int:
    import duckdb

    import __spark_entry__ as e
    from aws_iceberg_automation_spark.io import TABLES
    from aws_iceberg_automation_spark.session import get_spark

    spark = get_spark(app_name="verify-contract")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    smoke = e.entry(spark).collect()
    print(f"[smoke] entry() -> {len(smoke)} rows", flush=True)

    qs, oracles = e.queries(), e.oracle_sql()
    names = only or list(qs)
    failed = []
    for name in names:
        t0 = time.monotonic()
        try:
            df = qs[name](spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            failed.append(name)
            print(f"[FAIL] {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows "
                  f"({time.monotonic()-t0:.1f}s)", flush=True)
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as ex:
            failed.append(name)
            print(f"[FAIL] {name}: oracle error: {ex}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
            if cs != co:
                for i, (a, b) in enumerate(zip(cs, co)):
                    if a != b:
                        problems.append(f"first diff row {i}:\n  spark={a}\n  duck ={b}")
                        break
                else:
                    problems.append("value diff at tail")
        if problems:
            failed.append(name)
            print(f"[FAIL] {name}: " + "; ".join(problems))
        else:
            print(f"[ok] {name}: {len(srows)} rows match "
                  f"({time.monotonic()-t0:.1f}s)", flush=True)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args
    sys.exit(run(sf_dir, only))
