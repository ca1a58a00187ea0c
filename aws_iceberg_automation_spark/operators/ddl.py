"""Catalog & DDL as a driver-checkable query (SURVEY.md §2.1, VERDICT
r03 ask #4): the reference's whole Layer-A lifecycle — YAML spec →
rendered CREATE TABLE → live table → INSERT → SELECT back (reference
behavior ``create_iceberg_tables.py:24-37,142-151``) — exercised inside
one ``(spark, sf_dir) → DataFrame`` entry so the DDL path earns a real
CORRECTNESS hash row instead of pytest-only proof.

The oracle is a literal VALUES table: the round-trip is deterministic by
construction (fixed spec, fixed inserted rows), so the driver's
hash-match proves create/insert/read-back fidelity end to end, including
that identity partition columns (CountryRegion, PostalCode) survive the
partitioned write unmangled."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TableManager
from ..registry import register
from ..tablespec import TableSpec

_SPEC_PATH = Path(__file__).resolve().parents[2] / "tablespecs" / "customers.yml"

_ROWS = [
    ("C001", "Ada", "Lovelace", "GB", "SW1A1AA"),
    ("C002", "Alan", "Turing", "GB", "CB21TN"),
    ("C003", "Grace", "Hopper", "US", "22203"),
    ("C004", "Annie", "Easley", "US", "44135"),
    ("C005", "Margaret", "Hamilton", "US", "02139"),
]

_ORACLE = """
SELECT * FROM (VALUES
  ('C001', 'Ada', 'GB', 'SW1A1AA', 'bronze', 'customers',
   CAST(10 AS BIGINT), 'CountryRegion, PostalCode'),
  ('C002', 'Alan', 'GB', 'CB21TN', 'bronze', 'customers',
   CAST(10 AS BIGINT), 'CountryRegion, PostalCode'),
  ('C003', 'Grace', 'US', '22203', 'bronze', 'customers',
   CAST(10 AS BIGINT), 'CountryRegion, PostalCode'),
  ('C004', 'Annie', 'US', '44135', 'bronze', 'customers',
   CAST(10 AS BIGINT), 'CountryRegion, PostalCode'),
  ('C005', 'Margaret', 'US', '02139', 'bronze', 'customers',
   CAST(10 AS BIGINT), 'CountryRegion, PostalCode')
) AS t(customer_id, first_name, country_region, postal_code,
       database_name, table_name, n_columns, partition_spec)
"""


def _purge_orphan_location(spark: SparkSession, spec: TableSpec) -> None:
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme not in ("", "file"):
        return  # object-store warehouse: no local orphan to clear
    loc = Path(wh.path) / f"{spec.database}.db" / spec.table
    if loc.exists():
        shutil.rmtree(loc)


@register("q196_ddl_roundtrip", oracle=_ORACLE, tags=("catalog", "ddl"))
def q196_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec→DDL→table→SELECT round-trip (#1-#7, #9): parse the parity
    spec (tablespecs/customers.yml — the reference's one concrete
    example table), render and execute its CREATE TABLE (identity-
    partitioned, parquet fallback when no Iceberg JAR — same gate as
    TableManager everywhere), append five literal customers through the
    column-aligning writer, and read them back FROM THE TABLE with the
    spec's shape surfaced as data (database, table, column count,
    partition spec)."""
    spec = TableSpec.from_yaml(str(_SPEC_PATH))
    mgr = TableManager(spark)
    fq = spec.qualified_name  # bronze.customers
    # Idempotent per run: a managed table, purged and rebuilt, so a
    # re-run in a warm session can never double-insert.
    mgr.ensure_namespace(spec.database)
    mgr.drop_table(fq)
    # The session catalog is in-memory: a previous PROCESS may have left
    # the managed location on disk while this session's DROP knows
    # nothing of it, and CREATE then fails LOCATION_ALREADY_EXISTS.
    # The table was just dropped (or never existed here), so the
    # directory is an orphan by definition — purge it.
    _purge_orphan_location(spark, spec)
    mgr.create_table(spec, if_not_exists=False)
    cols = [n for n, _ in spec.columns]
    rows = [
        {
            "CustomerID": cid,
            "FirstName": first,
            "LastName": last,
            "CountryRegion": country,
            "PostalCode": postal,
        }
        for cid, first, last, country, postal in _ROWS
    ]
    df = spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows], schema=spec.to_struct_type()
    )
    mgr.append(fq, df)
    part_spec = ", ".join(p.to_ddl() for p in spec.partitioned_by)
    return mgr.table(fq).select(
        F.col("CustomerID").alias("customer_id"),
        F.col("FirstName").alias("first_name"),
        F.col("CountryRegion").alias("country_region"),
        F.col("PostalCode").alias("postal_code"),
        F.lit(spec.database).alias("database_name"),
        F.lit(spec.table).alias("table_name"),
        F.lit(len(spec.columns)).cast("bigint").alias("n_columns"),
        F.lit(part_spec).alias("partition_spec"),
    )
