"""Fixture-drift tripwire: the driver REGENERATES /root/testdata between
rounds, and physical details have changed before (round 1 wrote
events.ts as timestamp[ns], round 2 as timestamp[us] — silently breaking
every event query until caught). This test pins what the engine assumes
about each fixture's parquet footer so the next drift fails here, first,
with a pointer — not as 16 red oracle rows."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_iceberg_automation_spark.io import SCHEMAS
from tests.conftest import SF_DIR

# Spark logical type -> acceptable pyarrow physical types
_OK = {
    "bigint": lambda t: pa.types.is_int64(t),
    "int": lambda t: pa.types.is_int32(t),
    "double": lambda t: pa.types.is_float64(t),
    "float": lambda t: pa.types.is_float32(t),
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    # any timestamp precision: the loader adapts (io._events_needs_rebuild)
    "timestamp_ntz": lambda t: pa.types.is_timestamp(t),
    "array<float>": lambda t: (
        (pa.types.is_list(t) or pa.types.is_large_list(t))
        and pa.types.is_float32(t.value_type)
    ),
}


@pytest.mark.parametrize("table", sorted(SCHEMAS))
def test_fixture_footer_matches_declared_schema(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    footer = pq.read_schema(path)
    declared = SCHEMAS[table]
    assert footer.names == [f.name for f in declared.fields], (
        f"{table}: fixture columns changed — update io.SCHEMAS and re-run "
        f"the full contract gate (footer: {footer.names})"
    )
    for f in declared.fields:
        phys = footer.field(f.name).type
        logical = f.dataType.simpleString()
        ok = _OK.get(logical)
        assert ok is not None, f"{table}.{f.name}: no physical rule for {logical}"
        assert ok(phys), (
            f"{table}.{f.name}: declared {logical} but fixture stores {phys} — "
            "the generator changed the physical type again; adapt io.load_table "
            "(see _events_needs_rebuild for the pattern)"
        )
