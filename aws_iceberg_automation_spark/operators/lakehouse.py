"""Lakehouse lifecycle operators as driver-checkable queries: SCD2
reconstruction, version-to-version semantic diffs, snapshot-retention
planning, partition-pruned scans, and schema-evolution reads — the
table-maintenance surface the reference automates (its whole job is
Iceberg DDL bootstrap, create_iceberg_tables.py) re-expressed over the
JAR-free ``VersionedTable`` analog (versioning.py) so every path runs
and hash-verifies in this container; the Iceberg-native twins are the
same call shapes behind the capability gate.

Each query BUILDS its fixture table from deterministic slices of the
TPC-H parquet (so the DuckDB oracle can re-derive the expected state
from the same predicates), then exercises the lifecycle API and
surfaces an aggregate the driver hashes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.compat import sql_dsum, dsum
from ..io import load_table
from ..registry import register
from ..versioning import (
    VersionedTable,
    VersioningError,
    session_fixture_dir,
)


@register(
    "q273_scd2_intervals",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, event_type,
    epoch(date_trunc('second', ts)) AS tse
  FROM events
), o AS (
  SELECT *,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY tse, event_id) AS prev
  FROM ev
), ch AS (
  SELECT user_id, event_type AS state, tse AS valid_from, event_id
  FROM o WHERE prev IS NULL OR prev <> event_type
), w AS (
  SELECT user_id, state, valid_from,
    CAST(row_number() OVER (PARTITION BY user_id
                            ORDER BY valid_from, event_id) AS INT) AS version_seq,
    lead(valid_from) OVER (PARTITION BY user_id
                           ORDER BY valid_from, event_id) AS valid_to
  FROM ch
)
SELECT user_id, state,
  CAST(valid_from AS BIGINT) AS valid_from,
  CAST(valid_to AS BIGINT) AS valid_to,
  version_seq,
  (valid_to IS NULL) AS is_current
FROM w
""",
    tags=("lakehouse", "cdc"),
)
def q273_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 reconstruction from a change stream: collapse each
    user's event sequence to the rows where the tracked attribute
    (event_type as the \"state\") actually CHANGES, then close each
    interval with the next change's timestamp — the
    (key, value, valid_from, valid_to, is_current) dimension history
    every warehouse backfill and point-in-time training-data join
    needs. MERGE-based SCD2 maintenance (catalog.merge_upsert /
    VersionedTable.merge) applies these same rows incrementally; this
    is the deterministic batch rebuild both are audited against.

    Scale shape: two partitioned windows on the natural key — one
    shuffle on user_id total; change-collapse happens before the
    second window so interval rows (≪ events) are all it sorts."""
    from ..functions.compat import epoch_secs

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        epoch_secs("ts").alias("tse"),
    )
    wo = Window.partitionBy("user_id").orderBy("tse", "event_id")
    ch = (
        ev.withColumn("prev", F.lag("event_type").over(wo))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("tse").alias("valid_from"),
            "event_id",
        )
    )
    wc = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return ch.select(
        "user_id",
        "state",
        F.col("valid_from").cast("bigint").alias("valid_from"),
        F.lead("valid_from").over(wc).cast("bigint").alias("valid_to"),
        F.row_number().over(wc).cast("int").alias("version_seq"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@register(
    "q274_time_travel_diff",
    oracle="""
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderdate >= DATE '1999-01-01' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_added,
  CAST(SUM(CASE WHEN o_orderdate < DATE '1997-01-01' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN o_orderdate >= DATE '1997-01-01'
                 AND o_orderdate < DATE '1999-01-01' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_common
FROM orders GROUP BY o_orderpriority
""",
    tags=("lakehouse", "versioning"),
)
def q274_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic diff between two snapshots of the same table (the
    audit behind every \"what changed since the model was trained?\"
    question): v1 holds orders before 1999, v2 OVERWRITES with the
    1997+ window (the fixture's order dates span 1995..2001 at every
    sf); the diff reads BOTH versions via time travel
    (``read(version=...)``) and classifies keys added / removed /
    common with two anti-joins and a semi-join, rolled up per order
    priority. The oracle re-derives the three classes from the slice
    predicates — so the hash row proves snapshot isolation returned
    exactly the committed states."""
    d = session_fixture_dir(spark, "q274_ttd")
    vt = VersionedTable(spark, os.path.join(d, "orders"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    vt.write(o.filter(F.col("o_orderdate") < "1999-01-01"), "append")
    vt.write(o.filter(F.col("o_orderdate") >= "1997-01-01"), "overwrite")
    old = vt.read(version=1)
    new = vt.read(version=2)
    keys_old = old.select("o_orderkey")
    keys_new = new.select("o_orderkey")
    added = new.join(keys_old, "o_orderkey", "left_anti").groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_added"))
    removed = old.join(keys_new, "o_orderkey", "left_anti").groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_removed"))
    common = new.join(keys_old, "o_orderkey", "left_semi").groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    zero = F.lit(0).cast("bigint")
    return (
        added.join(removed, "o_orderpriority", "full_outer")
        .join(common, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.coalesce("n_added", zero).alias("n_added"),
            F.coalesce("n_removed", zero).alias("n_removed"),
            F.coalesce("n_common", zero).alias("n_common"),
        )
    )


@register(
    "q277_expire_retention_plan",
    oracle="""
WITH c AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderdate < DATE '1997-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN o_orderdate >= DATE '1997-01-01'
                   AND o_orderdate < DATE '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN o_orderdate >= DATE '1998-01-01'
                   AND o_orderdate < DATE '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS cc,
    CAST(SUM(CASE WHEN o_orderdate >= DATE '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM orders
)
SELECT * FROM (
  SELECT 1 AS version, 'append' AS op, a AS n_rows_visible,
         TRUE AS expired, a AS n_rows_reclaimable FROM c
  UNION ALL SELECT 2, 'overwrite', b, TRUE, 0 FROM c
  UNION ALL SELECT 3, 'append', b + cc, FALSE, 0 FROM c
  UNION ALL SELECT 4, 'overwrite', d, FALSE, 0 FROM c
)
""",
    tags=("lakehouse", "versioning"),
)
def q277_expire_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-retention planning + execution (Iceberg
    ``expire_snapshots`` analog): build a 4-commit lineage
    (append / overwrite / append / overwrite over deterministic order
    slices), compute the keep-last-2 retention plan FROM THE MANIFESTS
    — per snapshot: visible rows, expired flag, and the rows in its
    OWN files that no kept snapshot references (the only data expiry
    may reclaim; an overwritten-but-still-referenced file reclaims
    nothing) — then actually run ``expire_snapshots(keep_last=2)`` and
    fail loudly if a kept version lost a row. The oracle re-derives
    every number from the slice predicates.

    Scale note: the plan is pure manifest arithmetic (file-set algebra
    on snapshot metadata); the only data read is the reclaimable file
    set itself — never the table."""
    d = session_fixture_dir(spark, "q277_exp")
    vt = VersionedTable(spark, os.path.join(d, "orders"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    slices = [
        (F.col("o_orderdate") < "1997-01-01", "append"),
        (
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01"),
            "overwrite",
        ),
        (
            (F.col("o_orderdate") >= "1998-01-01")
            & (F.col("o_orderdate") < "1999-01-01"),
            "append",
        ),
        (F.col("o_orderdate") >= "1999-01-01", "overwrite"),
    ]
    for pred, mode in slices:
        vt.write(o.filter(pred), mode)
    snaps = vt.snapshots()
    keep = {s.version for s in snaps[-2:]}
    kept_files = {f for s in snaps if s.version in keep for f in s.files}
    rows = []
    for s in snaps:
        parent_files = set(vt.snapshot(s.parent).files) if s.parent else set()
        own = set(s.files) - parent_files
        reclaim = sorted(own - kept_files)
        n_reclaim = (
            spark.read.parquet(*reclaim).count() if reclaim else 0
        )
        rows.append(
            (
                s.version,
                s.op,
                vt.read(version=s.version).count(),
                s.version not in keep,
                n_reclaim,
            )
        )
    expected_kept = {v: n for v, _, n, exp, _ in rows if not exp}
    vt.expire_snapshots(keep_last=2)
    for v, n in expected_kept.items():
        got = vt.read(version=v).count()
        if got != n:
            raise VersioningError(
                f"expire_snapshots corrupted kept v{v}: {got} != {n}"
            )
    return spark.createDataFrame(
        rows,
        "version int, op string, n_rows_visible bigint, "
        "expired boolean, n_rows_reclaimable bigint",
    )


@register(
    "q281_pruned_scan_filter",
    oracle=f"""
SELECT l_linestatus,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  {sql_dsum("l_quantity", "sum_qty")}
FROM lineitem WHERE l_returnflag = 'R'
GROUP BY l_linestatus
""",
    tags=("lakehouse", "versioning"),
)
def q281_pruned_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned snapshot scan: write lineitem hive-partitioned
    by return flag (partition values folded into the manifest's
    per-file bounds), then ``scan([("l_returnflag","=","R")])`` — the
    manifest proves 2 of 3 partitions dead BEFORE Spark opens a file,
    and the scan fails loudly inside the query if pruning did not
    actually drop them (the property pytest proves on synthetic
    tables, here attested on the driver fixture). Result must equal
    the plain filtered aggregate — stats only ever remove provably
    dead IO."""
    from ..functions.compat import dec2

    d = session_fixture_dir(spark, "q281_prune")
    vt = VersionedTable(spark, os.path.join(d, "li"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    vt.write(li, "append", partition_by=["l_returnflag"])
    filters = [("l_returnflag", "=", "R")]
    # plan_files IS scan's planning rule (manifest bounds + bloom
    # sidecars) — the audit measures the real thing, not a re-derived
    # subset of it
    kept = vt.plan_files(filters, version=1)
    if not len(kept) < len(vt.snapshot(1).files):
        raise VersioningError(
            "partition pruning did not drop any files for l_returnflag='R'"
        )
    return vt.scan(filters).groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum(dec2("l_quantity"), "sum_qty"),
    )


@register(
    "q283_schema_drift_union",
    oracle=f"""
SELECT
  CASE WHEN o_orderdate < DATE '1998-01-01' THEN NULL
       ELSE o_orderpriority END AS o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {sql_dsum("o_totalprice", "sum_price")}
FROM orders
GROUP BY 1
""",
    tags=("lakehouse", "versioning"),
)
def q283_schema_drift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (Iceberg add-column semantics on the
    JAR-free analog): commit v1 with the original 3-column feed, then
    append v2 rows carrying a NEW column — ``read()`` stitches the
    generations together by name with NULL back-fill for pre-evolution
    rows, exactly how an Iceberg reader surfaces an added column. The
    rollup groups BY the evolved column, so the NULL group is the
    pre-evolution population — the census a migration audit wants."""
    from ..functions.compat import dec2

    d = session_fixture_dir(spark, "q283_drift")
    vt = VersionedTable(spark, os.path.join(d, "orders"))
    o = load_table(spark, sf_dir, "orders")
    vt.write(
        o.filter(F.col("o_orderdate") < "1998-01-01").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "append",
    )
    vt.write(
        o.filter(F.col("o_orderdate") >= "1998-01-01").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        ),
        "append",
    )
    return vt.read().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum(dec2("o_totalprice"), "sum_price"),
    )
