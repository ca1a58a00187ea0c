"""Lineage-cut policy for iterative kernels (PageRank, BFS, label
propagation, connected-components closure, k-core peeling, …).

Every iterative DataFrame kernel must cut lineage each round or the
plan grows linearly and the planner blows up. Two ways to cut it:

- ``localCheckpoint`` (the default): blocks are pinned in executor
  block-manager storage. Fast (no FS round-trip), but NOT fault
  tolerant — if an executor is lost, the pinned blocks die with it and
  the job fails unrecoverably, because the lineage that could have
  recomputed them was just truncated. Acceptable on a single-box
  ``local[*]`` session (executor loss == driver loss anyway); a real
  risk on a 1000-executor cluster where losing one executor over a
  30-round kernel is the EXPECTED case, not the corner case.

- reliable ``checkpoint``: blocks are written to the checkpoint
  directory (HDFS/S3 on a cluster), so any executor can re-read them
  after a loss. Costs one distributed write + read per round — the
  insurance premium a 100 TB job pays happily, because the alternative
  is restarting a multi-hour kernel from round 0.

``checkpoint_df(df)`` routes between them via session conf
``spark.graft.checkpointMode`` = ``local`` (default) | ``reliable``,
so EVERY kernel that lineage-cuts through this helper inherits the
cluster-appropriate policy from one switch — no per-kernel API churn.
In ``reliable`` mode the checkpoint dir is auto-initialized (once) to
conf ``spark.graft.checkpointDir`` or a ``file:`` temp dir on local
sessions; on a real cluster set it to a durable shared FS.

Result contract: the two modes MUST be bit-identical — a checkpoint is
a materialization point, never a semantics change. A pytest proves one
graph kernel hash-equal under both modes (tests/test_graph.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

MODE_CONF = "spark.graft.checkpointMode"
DIR_CONF = "spark.graft.checkpointDir"


def checkpoint_df(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage under the session's checkpoint policy (see module
    doc). Drop-in replacement for ``df.localCheckpoint(eager)``."""
    spark = df.sparkSession
    mode = spark.conf.get(MODE_CONF, "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode != "reliable":
        raise ValueError(
            f"{MODE_CONF} must be 'local' or 'reliable', got {mode!r}"
        )
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        configured = spark.conf.get(DIR_CONF, None)
        sc.setCheckpointDir(
            configured or tempfile.mkdtemp(prefix="spark-graft-ckpt-")
        )
    return df.checkpoint(eager=eager)
