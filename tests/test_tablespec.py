"""Layer-A spec tests: YAML → TableSpec → StructType + DDL (SURVEY §2.1)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    FloatType,
    IntegerType,
    MapType,
    StringType,
    StructType,
    TimestampNTZType,
)

from aws_iceberg_automation_spark.tablespec import (
    PartitionField,
    SpecError,
    TableSpec,
    parse_type,
)

REFERENCE_SPEC = {
    # Shape of /root/reference/iceberg_tables/customers.yml:1-28
    "database": "bronze",
    "table": "customers",
    "location": "s3://lakehouse/warehouse/bronze/customers",
    "format_version": 2,
    "partitioned_by": ["CountryRegion", "PostalCode"],
    "columns": [
        {"name": n, "type": "string"}
        for n in [
            "FirstName", "LastName", "CompanyName", "EmailAddress", "Phone",
            "CustomerID", "AddressLine1", "City", "CountryRegion", "PostalCode",
        ]
    ],
}


def test_reference_spec_ddl_is_config_driven():
    """The rendered DDL must follow the spec — the reference's hardcode
    bug (create_iceberg_tables.py:38-55) must not be replicated."""
    spec = TableSpec.from_dict(REFERENCE_SPEC)
    ddl = spec.to_ddl(catalog="glue_catalog")
    assert "CREATE TABLE IF NOT EXISTS glue_catalog.bronze.customers" in ddl
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (CountryRegion, PostalCode)" in ddl
    assert "LOCATION 's3://lakehouse/warehouse/bronze/customers'" in ddl
    assert "'format-version'='2'" in ddl
    assert "FirstName string" in ddl and "PostalCode string" in ddl


def test_struct_type_roundtrip():
    spec = TableSpec.from_dict(REFERENCE_SPEC)
    st = spec.to_struct_type()
    assert isinstance(st, StructType)
    assert [f.name for f in st.fields][:2] == ["FirstName", "LastName"]
    assert all(f.dataType == StringType() for f in st.fields)


def test_parse_types():
    assert parse_type("bigint").simpleString() == "bigint"
    assert parse_type("DECIMAL(18,6)") == DecimalType(18, 6)
    assert parse_type("array<float>") == ArrayType(FloatType())
    assert parse_type("map<string, int>") == MapType(StringType(), IntegerType())
    st = parse_type("struct<k:int, v:array<string>>")
    assert isinstance(st, StructType) and st.fieldNames() == ["k", "v"]
    assert parse_type("timestamp_ntz") == TimestampNTZType()
    with pytest.raises(SpecError):
        parse_type("frobnicate")
    with pytest.raises(SpecError):
        parse_type("array<int")
    with pytest.raises(SpecError):
        parse_type("int extra")


def test_partition_transforms():
    assert PartitionField.parse("c").to_ddl() == "c"
    assert PartitionField.parse("bucket(16, id)").to_ddl() == "bucket(16, id)"
    assert PartitionField.parse("days(ts)").to_ddl() == "day(ts)"
    assert PartitionField.parse("truncate(4, name)").to_ddl() == "truncate(4, name)"
    with pytest.raises(SpecError):
        PartitionField.parse("bucket(id)")
    with pytest.raises(SpecError):
        PartitionField.parse("shard(7, id)")


@pytest.mark.parametrize(
    "mutation",
    [
        {"database": None},
        {"table": "has space"},
        {"columns": []},
        {"columns": [{"name": "a"}]},
        {"columns": [{"name": "a", "type": "int"}, {"name": "A", "type": "int"}]},
        {"partitioned_by": ["not_a_column"]},
        {"format_version": 9},
    ],
)
def test_invalid_specs_fail_loudly(mutation):
    conf = dict(REFERENCE_SPEC)
    conf.update(mutation)
    with pytest.raises(SpecError):
        TableSpec.from_dict(conf)


def test_from_yaml(tmp_path):
    y = textwrap.dedent(
        """
        database: silver
        table: events_rollup
        format_version: 2
        partitioned_by: [days(ts), "bucket(8, user_id)"]
        columns:
          - {name: ts, type: timestamp_ntz}
          - {name: user_id, type: bigint}
          - {name: n, type: bigint}
          - {name: props, type: "map<string,string>"}
        """
    )
    p = tmp_path / "spec.yml"
    p.write_text(y)
    spec = TableSpec.from_yaml(str(p))
    ddl = spec.to_ddl()
    assert "PARTITIONED BY (day(ts), bucket(8, user_id))" in ddl
    assert "props map<string,string>" in ddl
