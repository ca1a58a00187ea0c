"""Bucketed tables: co-located joins and aggregations with ZERO
exchange (SURVEY.md §2 scale axis "bucketing for co-located joins";
the Iceberg ``bucket(N, key)`` partition-transform analog on the plain
Spark session catalog).

Why this matters at 100 TB: a fact-fact join on a high-cardinality key
(orders ⋈ customer on custkey, lineitem ⋈ orders on orderkey) is a
full shuffle of BOTH sides every time it runs. If the tables are
written ``bucketBy(N, key)`` with the SAME bucket count, every join or
groupBy on that key reads bucket i of each side into the same task —
the exchange disappears from the plan entirely, turning the recurring
nightly join from a 2×-table-size network event into a local merge.
``sortBy(key)`` inside the bucket additionally removes the sort stage
of a sort-merge join.

Rules the helpers enforce / document:
- Both sides must use the SAME bucket count (Spark joins bucketed
  tables shuffle-free only when counts match; a mismatch silently
  re-shuffles the smaller side).
- Bucket count is a layout-time commitment: pick N ≈ table size /
  target file size (128-512 MB buckets), and pick it once — changing N
  rewrites the table. At 100 TB and 256 MB targets that is N in the
  tens of thousands; N also caps the join's parallelism, so never
  bucket a growing table below the cluster's core count.
- Bucketed output must go through ``saveAsTable`` (the bucket metadata
  lives in the catalog, not in parquet footers); ``parquet(path)``
  writes would silently drop the bucket spec.
- ``spark.sql.sources.bucketing.enabled`` (default true) must stay on
  at read time, and AQE keeps working — bucketing removes the
  exchange, AQE still plans everything downstream.

The pytest proves the property differentially: the same join on
bucketed inputs plans ZERO shuffle exchanges while the identical
unbucketed join plans two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    fq_table: str,
    key: str | list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a managed bucketed table: ``bucketBy(n, key)``
    (+ ``sortBy`` so sort-merge joins skip their sort stage). The
    bucket spec lives in the catalog — this MUST be ``saveAsTable``,
    a path write would lose it."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(fq_table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. The plan
    this produces contains no Exchange on either side — assert it with
    :func:`exchange_count` when wiring a new pair."""
    on = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the analyzed physical plan
    (broadcast exchanges excluded — they are not the shuffle this
    layout exists to kill)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def session_table(spark: SparkSession, prefix: str) -> str:
    """Per-SESSION managed-table name ``<prefix>_<appId>`` plus GC of
    stale same-prefix directories from previous sessions — the q284
    naming rule generalized: within a session repeated invocations
    (bench ×3, plan_report) OVERWRITE one copy; a fresh session gets a
    new applicationId-derived name, because a fixed name would collide
    with the on-disk location a previous session left behind that the
    new in-memory catalog knows nothing about (LOCATION_ALREADY_EXISTS).
    Warehouse growth stays bounded at one live copy per prefix. Spark
    gate processes never run concurrently (the q196 rule)."""
    import os
    import shutil

    tag = spark.sparkContext.applicationId.replace("-", "_").lower()
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.removeprefix("file:")
    if os.path.isdir(wh):
        for name in os.listdir(wh):
            if name.startswith(prefix + "_") and not name.endswith(tag):
                shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    return f"{prefix}_{tag}"
