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
# re-proves the proven. Round-9 rotation (VERDICT r08 ask #1): the
# round-8 window went 50/50 green and attestation debt is zero, so
# this window is exactly the 50 round-9 newcomers q379..q428 in
# numeric order — led by the named asks (schema-evolution attestation
# q379, MOR delete files + compaction q380, label-propagation
# communities q381). Rows-only specs NEVER occupy a top-50 slot (they
# cannot earn a hash row).
_DRIVER_PRIORITY = [
    "q379_schema_evolution_scan",
    "q380_mor_delete_compaction",
    "q381_label_propagation",
    "q382_anderson_darling_ksample",
    "q383_kendall_tau",
    "q384_mcnemar_paired",
    "q385_anova_oneway",
    "q386_peak_detection",
    "q387_lead_lag_xcorr",
    "q388_ridge_regression_2f",
    "q389_kmeans_1d_unrolled",
    "q390_logistic_gd_unrolled",
    "q391_kcore_decomposition",
    "q392_personalized_pagerank",
    "q393_cdc_netting",
    "q394_slo_error_budget",
    "q395_stream_ohlc_replay",
    "q396_woe_iv",
    "q397_permutation_entropy",
    "q398_hurst_rs",
    "q399_t_closeness",
    "q400_randomized_response",
    "q401_largest_remainder_alloc",
    "q402_gram_matrix",
    "q403_pca_power_iteration",
    "q404_neyman_allocation",
    "q405_rake_keyphrases",
    "q406_haversine_distance",
    "q407_golden_record_merge",
    "q408_price_volume_mix",
    "q409_branch_merge_3way",
    "q410_scan_pruning_census",
    "q411_binary_header_census",
    "q412_stream_cdc_netting_replay",
    "q413_poisson_rate_test",
    "q414_james_stein_shrinkage",
    "q415_conformal_interval",
    "q416_gumbel_block_maxima",
    "q417_stratified_kfold",
    "q418_shapley_attribution",
    "q419_whitening_isotropy",
    "q420_rfm_migration",
    "q421_runs_test",
    "q422_diff_in_diff",
    "q423_min_variance_portfolio",
    "q424_var_cvar",
    "q425_durbin_watson",
    "q426_granger_1lag",
    "q427_bpe_merge_rounds",
    "q428_mann_kendall",
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
