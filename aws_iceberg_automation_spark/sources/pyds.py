"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the modern extension point for sources Spark has no built-in reader
for (internal services, bespoke formats, synthetic load).

`SyntheticEventsDataSource` is a deterministic generator: every field
of row *i* is a pure function of md5(seed:i), so (a) re-reads are
bit-identical on any cluster shape, (b) partitions generate
independently (each `InputPartition` carries only its row range — the
planner ships no data, and generation parallelism = requested
partitions), and (c) an external engine can re-derive the same rows
from the same md5 math — which is how q166's DuckDB oracle checks a
*data source* without any shared files.

Register per-session via ``spark.dataSource.register(
SyntheticEventsDataSource)`` then ``spark.read.format(
"synthetic_events").option(...).load()``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_TYPES = ["click", "error", "purchase", "signup", "view"]
_SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: str) -> None:
        self.start = start
        self.end = end
        self.seed = seed


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.seed = str(options.get("seed", "pyds"))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _RangePartition(p * per, min((p + 1) * per, self.n_rows), self.seed)
            for p in range(self.n_partitions)
            if p * per < self.n_rows
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            h = hashlib.md5(f"{partition.seed}:{i}".encode()).hexdigest()
            yield (
                i,
                int(h[0:4], 16) % 500,
                _TYPES[int(h[4:6], 16) % 5],
                int(h[6:16], 16) / 1099511627776.0 * 100.0,  # / 16^10
            )


class SyntheticEventsDataSource(DataSource):
    """`format("synthetic_events")`: options n_rows, n_partitions, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str | StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)
