"""Shared test fixtures: one session-scoped SparkSession + the
engine-vs-DuckDB oracle comparator (mirror of the driver's gate)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_iceberg_automation_spark.io import TABLES  # noqa: E402
from aws_iceberg_automation_spark.session import get_spark  # noqa: E402
from scripts.verify_contract import canon_rows  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


@pytest.fixture(scope="session")
def oracle_check(duck):
    """Assert a Spark DataFrame matches DuckDB SQL exactly
    (schema by sorted names, row count, order-insensitive values)."""

    def check(df, sql: str):
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
        rel = duck.sql(sql)
        ocols = [d[0] for d in rel.description]
        orows = rel.fetchall()
        assert sorted(scols) == sorted(ocols), f"schema: {sorted(scols)} != {sorted(ocols)}"
        assert len(srows) == len(orows), f"rowcount: {len(srows)} != {len(orows)}"
        cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
        if cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            raise AssertionError(f"value mismatch; first diffs: {diffs}")
        return len(srows)

    return check
