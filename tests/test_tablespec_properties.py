"""Property-based tests for the table-spec type parser: any Spark
DataType we can render to DDL must round-trip through parse_type —
the YAML `type` field is user input, so the grammar gets fuzzed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from aws_iceberg_automation_spark.tablespec import parse_type, type_to_ddl

_SIMPLE = [
    StringType(), BooleanType(), BinaryType(), ByteType(), ShortType(),
    IntegerType(), LongType(), FloatType(), DoubleType(), DateType(),
    TimestampType(), TimestampNTZType(),
]

_names = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True)


def _types(depth: int = 2) -> st.SearchStrategy[DataType]:
    base = st.sampled_from(_SIMPLE) | st.builds(
        lambda p, s: DecimalType(p, min(s, p)),
        st.integers(1, 38),
        st.integers(0, 18),
    )
    if depth == 0:
        return base
    inner = _types(depth - 1)
    return (
        base
        | st.builds(ArrayType, inner)
        | st.builds(MapType, _types(0), inner)
        | st.builds(
            lambda names, ts: StructType(
                [StructField(n, t, True) for n, t in zip(names, ts)]
            ),
            st.lists(_names, min_size=1, max_size=4, unique=True),
            st.lists(inner, min_size=4, max_size=4),
        )
    )


@settings(max_examples=200, deadline=None)
@given(_types())
def test_type_roundtrip_through_ddl(t: DataType):
    assert parse_type(type_to_ddl(t)) == t


def _has_struct(t: DataType) -> bool:
    if isinstance(t, StructType):
        return True
    if isinstance(t, ArrayType):
        return _has_struct(t.elementType)
    if isinstance(t, MapType):
        return _has_struct(t.keyType) or _has_struct(t.valueType)
    return False


@settings(max_examples=100, deadline=None)
@given(_types())
def test_parse_is_case_insensitive_for_keywords(t: DataType):
    from hypothesis import assume

    # uppercasing a struct DDL would also uppercase its field *names*
    assume(not _has_struct(t))
    assert parse_type(type_to_ddl(t).upper()) == t
