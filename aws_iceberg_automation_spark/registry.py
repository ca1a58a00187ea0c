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
# re-proves the proven. Round-6 rotation (VERDICT r05 ask #1): rounds
# 1-5 drove 235 queries green (233 hash rows); this window holds ALL 32
# remaining never-driver-verified oracle-backed specs — the q240..q262
# attestation tail, the round-5 registrations q263..q269, and the
# q41/q42b sketch->error-bound oracle conversions — followed by the
# round-6 newcomers in registration order (18 slots). Attesting this
# window takes the never-attested oracle-backed set to ZERO. Rows-only
# specs NEVER occupy a top-50 slot (they cannot earn a hash row).
_DRIVER_PRIORITY = [
    # -- round-6 window part 1: the 32 staged (gate-green end of r5) --
    "q240_dsir_importance",
    "q241_token_epoch_plan",
    "q242_label_centroid_separation",
    "q243_duplicate_ngram_mass",
    "q244_readability",
    "q245_hapax_ratio",
    "q246_tfidf_top_terms",
    "q247_template_prefix_census",
    "q248_embedding_dim_stats",
    "q249_doclen_histogram",
    "q250_source_ks_drift",
    "q251_growth_accounting",
    "q252_term_burstiness",
    "q253_dedup_threshold_curve",
    "q254_experiment_power",
    "q255_seasonal_decomposition",
    "q256_stream_drift_monitor",
    "q257_ab_srm_check",
    "q258_forecast_backtest",
    "q259_source_lang_entropy",
    "q260_bulk_discount_curve",
    "q261_order_size_dispersion",
    "q262_positional_dup_mass",
    "q263_stream_static_replay",
    "q41_approx_count_distinct",
    "q42b_percentile_sketch",
    "q264_stream_stream_full_outer",
    "q265_doc_repetition",
    "q266_cdc_upsert_replay",
    "q267_embedding_outliers",
    "q268_minhash_estimator_audit",
    "q269_crawl_novelty",
    # -- round-6 window part 2: newcomers (18 slots to the line) --
    # 16 new operators + the q119/q96b rows-only->oracle conversions
    # (changed semantics => their old rows-only attestations are void;
    # they re-earn hash rows here).
    "q270_journey_census",
    "q271_ivf_delta_reassign",
    "q272_stream_lakehouse_rollup",
    "q273_scd2_intervals",
    "q274_time_travel_diff",
    "q275_bpe_pair_census",
    "q276_media_integrity_audit",
    "q277_expire_retention_plan",
    "q278_copurchase_2hop_recs",
    "q279_weighted_pps_sample",
    "q280_sketch_set_ops",
    "q281_pruned_scan_filter",
    "q282_gapfill_interpolation",
    "q283_schema_drift_union",
    "q284_bucketed_join",
    "q285_doc_containment_pairs",
    "q119_supplier_pagerank",
    "q96b_stratified_sample",
    # ---- 50-slot budget line (driver stops here) ----
    # round-6 late conversions (rows-only -> oracle-backed; changed
    # semantics void their old rows-only attestations): head of the
    # round-7 window.
    "q149_rolling_distinct_sketch",
    "q187_dedup_metrics",
    "q85g_freq_terms_sketch",
    "q83f_ann_lsh_topk_portable",
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
