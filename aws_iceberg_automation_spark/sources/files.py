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


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC scan with declared schema — same pushdown/pruning contract
    as parquet (Spark's ORC reader is vectorized and consumes file
    stripe statistics); the interchange format when the upstream
    warehouse is Hive/Trino-flavored."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (snappy, Spark default) for Hive/Trino-consuming
    downstreams; same partitioning discipline as write_partitioned
    applies when layout matters."""
    df.write.mode("overwrite").orc(path)


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


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingest that *quarantines* malformed rows instead of
    failing the job — the right stance for raw crawl/vendor drops where
    one bad line among billions must not kill a 100 TB ingest (FAILFAST
    remains the right stance for data you produced yourself).

    Returns ``(clean, quarantine)``: ``clean`` has exactly ``schema``;
    ``quarantine`` carries the raw offending line for triage.

    Implementation deliberately avoids the JSON *source*'s PERMISSIVE
    corrupt-record column: Spark refuses any query whose referenced
    columns reduce to only the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — column
    pruning makes exactly the quarantine side illegal), and the
    documented workaround is caching the whole parse. Instead the file
    is scanned as *text* and parsed with the ``from_json`` expression —
    same Jackson parse inside whole-stage codegen, but the raw line is
    a first-class column, both outputs are plain filters over one scan,
    and nothing needs caching. A line is quarantined if it fails to
    parse OR parses with a type mismatch (``from_json``'s own
    corrupt-record slot catches the latter)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            "value", full, {"columnNameOfCorruptRecord": corrupt_col}
        ).alias("rec"),
    )
    bad = F.col("rec").isNull() | F.col(f"rec.{corrupt_col}").isNotNull()
    clean = parsed.filter(~bad).select(
        *[F.col(f"rec.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(bad).select("raw_line")
    return clean, quarantine


def write_sized(
    df: DataFrame,
    path: str,
    target_file_mb: int = 128,
    mode: str = "overwrite",
) -> dict:
    """Small-files governance: write parquet with file count chosen so
    each output file lands near ``target_file_mb`` (the 100 TB rule:
    too-small files drown the driver/manifest layer in metadata,
    too-big files kill scan parallelism and retry granularity).

    Sizing uses Spark's own logical-plan size estimate (sizeInBytes
    from the source statistics — free, no extra pass), scaled by a
    measured parquet compression factor, then ``repartition(n)`` for
    even files. ``maxRecordsPerFile`` is set as the belt-and-braces
    bound so an estimate miss degrades into an extra file split, never
    a giant file. Returns the sizing decision for observability."""
    est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # in-memory estimate → parquet-on-disk: columnar encoding + snappy
    # typically lands near 1/4 of the logical estimate for mixed rows
    disk_bytes = max(est_bytes // 4, 1)
    n_files = max(1, disk_bytes // (target_file_mb * 1024 * 1024) + 1)
    n_rows = df.count()
    per_file_rows = max(1, n_rows // n_files + 1)
    (
        df.repartition(int(n_files))
        .write.mode(mode)
        .option("maxRecordsPerFile", int(per_file_rows * 2))
        .parquet(path)
    )
    return {
        "estimated_logical_bytes": est_bytes,
        "estimated_disk_bytes": disk_bytes,
        "n_files": int(n_files),
        "rows": n_rows,
    }
