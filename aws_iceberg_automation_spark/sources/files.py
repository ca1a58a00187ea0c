"""File sources & sinks beyond the managed-table path (SURVEY.md §2.2):
schema'd parquet/CSV/JSON readers and layout-aware writers.

Readers always take explicit schemas — inference is a full extra pass
over the data (deadly at scale) and non-deterministic across engines.

The writer encodes the 100 TB layout discipline: partition directories
on coarse keys (date), files sorted within partitions on query keys —
that sort is what gives parquet/Iceberg tight min-max stats, so scan
pruning works *inside* partitions too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with declared schema; malformed rows fail loudly
    (FAILFAST) rather than silently nulling — data bugs surface at
    ingest, not three joins later."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with declared schema (PERMISSIVE off — same
    fail-loud stance as CSV)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
) -> str:
    """Layout-aware write: hive-style partition dirs + within-partition
    sort. ``repartition(partition cols)`` first so each partition value
    is written by one task (otherwise every task writes a file into
    every partition dir — the small-files problem at its worst)."""
    out = df.repartition(*partition_by)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode(mode).partitionBy(*partition_by).format(file_format).save(path)
    return path
