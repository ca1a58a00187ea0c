"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when SQL-expressible,
a matching DuckDB oracle SQL string. ``__spark_entry__.py`` exposes this
registry to the verification driver.

Engine/oracle agreement conventions (see SURVEY.md §4.3 watch-list and
functions/compat.py for the full rationale):

- Alias every computed/aggregate column identically on both sides.
- **Decimal inside, string out**: sum money/rates through DECIMAL casts
  (exact, order-independent), then surface the final column as STRING
  (``CAST(dec AS STRING)`` / ``AS VARCHAR``). The driver canonicalizes
  via pandas where DuckDB decimals degrade to float64 but Spark's stay
  ``decimal.Decimal`` — never hash-equal; and DuckDB's decimal→DOUBLE
  cast is not correctly rounded, so double surfaces drift by ulps.
  Digit strings are identical in both engines (round-1 lesson).
- **No ARRAY/MAP/STRUCT in final schemas**: the driver's pandas
  canonicalizer dies on unhashable cells. ``array_join``/``to_json``
  the final projection on both sides; keep structured types internal.
- ``CAST(SUM(int) AS BIGINT)`` in oracle SQL (DuckDB sums ints to
  HUGEINT, which pandas/hashers mangle).
- Truncate ``events.ts`` to seconds on both sides (ns vs µs physical).
- Round genuinely order-dependent float aggregates (stddev/corr/...)
  to 4-6 decimals on both sides.
- Match int *kinds* too: pandas int64 vs float64 never hash-equal.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
_OPERATOR_MODULES = [
    "aws_iceberg_automation_spark.operators.relational",
    "aws_iceberg_automation_spark.operators.joins",
    "aws_iceberg_automation_spark.operators.aggregates",
    "aws_iceberg_automation_spark.operators.windows",
    "aws_iceberg_automation_spark.operators.sorts",
    "aws_iceberg_automation_spark.operators.setops",
    "aws_iceberg_automation_spark.operators.scalars",
    "aws_iceberg_automation_spark.operators.analytics",
    "aws_iceberg_automation_spark.operators.behavioral",
    "aws_iceberg_automation_spark.operators.timeseries",
    "aws_iceberg_automation_spark.operators.events",
    "aws_iceberg_automation_spark.operators.dedup",
    "aws_iceberg_automation_spark.operators.similarity",
    "aws_iceberg_automation_spark.operators.text",
    "aws_iceberg_automation_spark.operators.multimodal",
    "aws_iceberg_automation_spark.operators.udfs",
    "aws_iceberg_automation_spark.operators.curation",
    "aws_iceberg_automation_spark.operators.dq",
    "aws_iceberg_automation_spark.operators.graph",
    "aws_iceberg_automation_spark.operators.lakehouse",
    "aws_iceberg_automation_spark.operators.ddl",
    "aws_iceberg_automation_spark.streaming.queries",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    tags: tuple[str, ...]


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False

# The external driver verifies the FIRST 50 specs in queries() order and
# stops (its per-round verification budget). Registration order is
# therefore attestation budget: re-listing an already-green query
# re-proves the proven. Round-8 rotation (VERDICT r07 ask #1): the
# round-7 window went 50/50 green, so this window leads with
# q172b_pq_adc_topk_portable (the one oracle-backed query with no
# driver row — staged at round-7 end) followed by the 49 round-8
# newcomers q330..q378 in numeric order — exactly 50, zero re-proofs.
# Rows-only specs NEVER occupy a top-50 slot (they cannot earn a hash
# row); after this window the never-attested oracle-backed set is
# EMPTY.
_DRIVER_PRIORITY = [
    "q172b_pq_adc_topk_portable",
    "q330_bucketed_incremental_neardup",
    "q331_quantile_sketch_merge",
    "q332_clustering_coefficient",
    "q333_stream_reorder_sessions",
    "q334_ols_by_group",
    "q335_welch_ttest",
    "q336_gini_by_segment",
    "q337_hhi_concentration",
    "q338_weighted_percentile",
    "q339_wilson_ci",
    "q340_kaplan_meier",
    "q341_quantile_normalize",
    "q342_wasserstein_1d",
    "q343_feature_hash_collisions",
    "q344_target_encode_loo",
    "q345_bloom_semijoin",
    "q346_dp_noisy_counts",
    "q347_l_diversity",
    "q348_max_drawdown",
    "q349_ltob_downsample",
    "q350_dau_wau_stickiness",
    "q351_cohort_ltv_curve",
    "q352_entry_exit_census",
    "q353_fifo_allocation",
    "q354_skyline_2d",
    "q355_rolling_ols_slope",
    "q356_bom_explosion",
    "q357_bfs_hops",
    "q358_common_neighbor_linkpred",
    "q359_degree_assortativity",
    "q360_markov_stationary",
    "q361_mor_read_equivalence",
    "q362_binpack_compaction_plan",
    "q363_merkle_integrity",
    "q364_fd_discovery",
    "q365_isoweek_rollup",
    "q366_cohens_kappa",
    "q367_precision_at_k",
    "q368_pareto_share",
    "q369_dim_truncation_recall",
    "q370_sharded_topk_merge",
    "q371_window_funnel",
    "q372_abandonment_census",
    "q373_bitemporal_asof",
    "q374_harmonic_centrality_2hop",
    "q375_negative_sampling",
    "q376_term_trends",
    "q377_geo_grid_join",
    "q378_props_profile",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as the named driver query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags))
        return fn

    return deco


def load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate not-yet-built operator modules during incremental
            # rounds, but never mask real import errors inside a module.
            if e.name != mod:
                raise
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    """Registry in driver-verification order: _DRIVER_PRIORITY names
    first, everything else in registration order after them."""
    load_all()
    prio = [n for n in _DRIVER_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(prio)]
    return {n: _REGISTRY[n] for n in [*prio, *rest]}


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
