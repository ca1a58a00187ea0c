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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert "sum_qty" in e.entry(spark).columns
