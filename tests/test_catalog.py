"""Layer-A runtime tests: namespace/table lifecycle + row-level ops on
the capability-gated catalog (parquet fallback in this container —
identical API surface to the Iceberg path; SURVEY §2.1/§2.2)."""

from __future__ import annotations

import pytest

from aws_iceberg_automation_spark.catalog import TableManager
from aws_iceberg_automation_spark.tablespec import TableSpec


@pytest.fixture(scope="module")
def mgr(spark):
    m = TableManager(spark)
    yield m
    m.drop_namespace("it_db", cascade=True)


@pytest.fixture(scope="module")
def spec(tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse") / "it_db" / "people"
    return TableSpec.from_dict(
        {
            "database": "it_db",
            "table": "people",
            "location": str(loc),
            "partitioned_by": ["country"],
            "columns": [
                {"name": "id", "type": "bigint"},
                {"name": "name", "type": "string"},
                {"name": "country", "type": "string"},
                {"name": "balance", "type": "double"},
            ],
        }
    )


def test_create_and_describe(mgr, spec):
    ddl = mgr.create_table(spec)
    assert "CREATE TABLE IF NOT EXISTS it_db.people" in ddl
    assert "people" in mgr.list_tables("it_db")
    assert "it_db" in mgr.list_namespaces()
    # idempotent (IF NOT EXISTS — reference behavior #1)
    mgr.create_table(spec)
    created = mgr.show_create("it_db.people")
    assert "id BIGINT" in created or "id bigint" in created.lower()


def test_append_and_read(mgr, spec, spark):
    df = spark.createDataFrame(
        [(1, "ada", "DE", 10.0), (2, "bo", "US", 20.0), (3, "cy", "DE", 30.0)],
        schema=spec.to_struct_type(),
    )
    mgr.append("it_db.people", df)
    assert mgr.table("it_db.people").count() == 3


def test_merge_upsert(mgr, spec, spark):
    src = spark.createDataFrame(
        [(2, "bo2", "US", 25.0), (4, "di", "FR", 40.0)],
        schema=spec.to_struct_type(),
    )
    mgr.merge_upsert("it_db.people", src, on=["id"])
    rows = {r.id: r for r in mgr.table("it_db.people").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2].name == "bo2" and rows[2].balance == 25.0  # matched → updated
    assert rows[4].country == "FR"  # not matched → inserted


def test_update_where(mgr):
    mgr.update_where("it_db.people", "country = 'DE'", {"balance": "balance + 1.0"})
    rows = {r.id: r.balance for r in mgr.table("it_db.people").collect()}
    assert rows[1] == 11.0 and rows[3] == 31.0 and rows[2] == 25.0


def test_delete_where(mgr):
    mgr.delete_where("it_db.people", "balance > 26.0")  # removes id 3 (31.0) and 4 (40.0)
    assert {r.id for r in mgr.table("it_db.people").collect()} == {1, 2}


def test_iceberg_sql_renderers():
    """Unit coverage for the Iceberg-path statements (#19/#20) — the
    strings the extensions execute where the runtime JAR exists."""
    from aws_iceberg_automation_spark.catalog import (
        render_delete_sql,
        render_merge_sql,
        render_update_sql,
    )

    m = render_merge_sql("db.t", "src", ["id", "day"], ["v", "tag"])
    assert m == (
        "MERGE INTO db.t t USING src s ON t.id = s.id AND t.day = s.day "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v, t.tag = s.tag "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert render_delete_sql("db.t", "v > 3") == "DELETE FROM db.t WHERE v > 3"
    assert (
        render_update_sql("db.t", "tag = 'a'", {"v": "v + 1"})
        == "UPDATE db.t SET v = v + 1 WHERE tag = 'a'"
    )


def test_merge_duplicate_source_keys_rejected(mgr, spec, spark):
    from aws_iceberg_automation_spark.catalog import CatalogError

    dup = spark.createDataFrame(
        [(7, "x", "DE", 1.0), (7, "y", "DE", 2.0)], schema=spec.to_struct_type()
    )
    with pytest.raises(CatalogError, match="duplicate keys"):
        mgr.merge_upsert("it_db.people", dup, on=["id"])


def test_transform_partitioning_gated_without_iceberg(mgr, tmp_path):
    from aws_iceberg_automation_spark.catalog import CatalogError

    if mgr.using == "iceberg":
        pytest.skip("iceberg available")
    spec = TableSpec.from_dict(
        {
            "database": "it_db",
            "table": "events_daily",
            "location": str(tmp_path / "events_daily"),
            "partitioned_by": ["days(ts)"],
            "columns": [
                {"name": "ts", "type": "timestamp_ntz"},
                {"name": "n", "type": "bigint"},
            ],
        }
    )
    with pytest.raises(CatalogError, match="Iceberg"):
        mgr.create_table(spec)


def test_time_travel_gated_without_iceberg(mgr):
    from aws_iceberg_automation_spark.catalog import CatalogError

    if mgr.using == "iceberg":
        pytest.skip("iceberg available — gating path not applicable")
    with pytest.raises(CatalogError, match="snapshot"):
        mgr.table_at("it_db.people", snapshot_id=1)
    with pytest.raises(CatalogError, match="snapshot"):
        mgr.snapshots("it_db.people")


def test_diagnostics(mgr):
    d = mgr.diagnostics()
    assert d["using"] in ("parquet", "iceberg")
    assert "it_db" in d["namespaces"]
    assert d["spark_version"].startswith("4.")


def test_cli_explain(spark, capsys):
    from aws_iceberg_automation_spark.cli import main

    assert main(["explain", "q37_star_join_revenue"]) == 0
    out = capsys.readouterr().out
    assert "BroadcastHashJoin" in out and '"row_python_udfs": 0' in out
    assert main(["explain", "q37_nope"]) == 1


def test_cli_sql(spark, capsys):
    import json as _json

    from aws_iceberg_automation_spark.cli import main

    assert main(["sql", "SELECT COUNT(*) AS n FROM region"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out == [{"n": 5}]
    assert main(["sql", "SELECT * FROM nonexistent_tbl"]) == 1


def test_analyze_collects_stats(spark):
    from aws_iceberg_automation_spark.catalog import TableManager

    mgr = TableManager(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS db1")
    spark.sql("DROP TABLE IF EXISTS db1.stats_t")
    spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS v"
    ).write.saveAsTable("db1.stats_t")
    try:
        out = mgr.analyze("db1.stats_t", columns=["v"])
        assert out["statistics"] and "1000 rows" in out["statistics"]
        col = out["first_column_stats"]
        assert col.get("distinct_count") == "7"
    finally:
        spark.sql("DROP TABLE IF EXISTS db1.stats_t")
