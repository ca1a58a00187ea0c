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
from scripts.verify_contract import DriverCrash, _canon, compare  # noqa: E402

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
    """Assert a Spark DataFrame matches DuckDB SQL under the external
    driver's observed canonicalization (pandas on both sides, Decimal≠
    float64, unhashable cells = crash) — see scripts/verify_contract.py."""

    def check(df, sql: str):
        spark_pd = df.toPandas()
        duck_pd = duck.sql(sql).df()
        try:
            problems = compare(spark_pd, duck_pd)
        except DriverCrash as e:
            raise AssertionError(f"driver canonicalizer would crash: {e}") from e
        assert not problems, "; ".join(problems)
        return len(spark_pd)

    return check
