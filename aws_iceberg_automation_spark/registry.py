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
# re-proves the proven. Round-4 rotation (VERDICT r03 ask #1): rounds
# 1-3 drove 133 queries green; this window holds the LAST 47
# never-driver-verified oracle-backed specs plus 3 queries that earned
# brand-new oracles this round (the DDL round-trip q196 — ask #4 — and
# two rows-only→oracle conversions, ask #2). A green r04 makes every
# oracle-backed query in the window driver-attested. The round also
# converted seven MORE rows-only queries to real oracles (portable-hash
# CMS q193/q194/q195, the full LSH dedup family q82/q167/q131, and
# q84c's arithmetic expansion) — those queue for round 5; verified and
# rows-only specs follow in registration order. Rows-only specs NEVER
# occupy a top-50 slot (they cannot earn a hash row).
_DRIVER_PRIORITY = [
    # -- round-4 window: 50 never-driver-verified, all oracle-backed --
    "q35c_gap_fill_forward",
    "q68b_posexplode",
    "q75b_sessionize_ids",
    "q85e_fingerprint",
    "q85f_bpe_ish_tokens",
    "q99_priority_late_orders",
    "q96c_stratified_exact_n",
    "q121_fuzzy_catalog_match",
    "q123_udtf_sentences",
    "q124_salted_hot_join",
    "q125_table_reconcile",
    "q127_latest_record_compaction",
    "q128_scd2_dimension",
    "q130_doc_chunking",
    "q136_weighted_sample",
    "q70b_variant_semistructured",
    "q141_token_entropy",
    "q142_langid_confusion",
    "q144_ewma_user_value",
    "q145_quality_aware_dedup",
    "q147_halflife_baseline_anomaly",
    "q148_bitmap_exact_distinct",
    "q150_udtf_dynamic_schema",
    "q151_dynamic_session_window",
    "q152_arrow_native_kernel",
    "q153_quality_classifier_score",
    "q154_ratio_to_report",
    "q155_edit_distance_match",
    "q157_try_arithmetic",
    "q159_bigram_lm_score",
    "q162_deterministic_shuffle",
    "q163_embedding_quantize",
    "q35d_asof_forward",
    "q164_event_transition_matrix",
    "q165_winsorized_stats",
    "q166_python_datasource",
    "q168_copurchase_pairs",
    "q169_exposure_weights",
    "q170_temperature_mixture",
    "q173_semantic_contamination",
    "q174_source_overlap",
    "q175_quality_calibration",
    "q176_corpus_datasheet",
    "q177_sequence_pattern",
    "q178_shard_manifest",
    "q179_pmi_cooccurrence",
    "q192_sales_opportunity",
    "q196_ddl_roundtrip",
    "q71b_hash_salting",
    "q82c_simhash",
    # ---- 50-slot budget line (driver stops here) ----
    # round-5 queue: rows-only→oracle conversions (VERDICT r03 ask #2)
    # plus eleven operators built late in round 4 (exact rolling
    # distinct, grouped OLS trend, embedding-centroid cohesion,
    # revenue-weighted percentiles, last-touch attribution, Zipf fit,
    # Benford audit, chi-square independence, rolling correlation,
    # split manifest, split-leakage audit) — all oracle-backed, locally
    # green at sf0.001/0.01/0.1 and under both hostile sweep variants.
    "q193_countmin_heavy_hitters",
    "q194_stream_countmin_replay",
    "q195_cms_join_size_estimate",
    "q82_minhash_lsh_neardup",
    "q167_neardup_clusters",
    "q131_incremental_neardup",
    "q84c_frame_sampling",
    "q197_rolling_distinct_exact",
    "q198_revenue_trend_ols",
    "q199_embedding_centroid_quality",
    "q200_weighted_percentile",
    "q201_touch_attribution",
    "q202_zipf_fit",
    "q203_benford_deviation",
    "q204_chi2_independence",
    "q205_rolling_corr",
    "q206_split_manifest",
    "q207_split_leakage",
    "q208_rfm_segments",
    "q209_pareto_abc",
    "q210_segment_gini",
    "q211_weekday_seasonality",
    "q212_interarrival_burstiness",
    "q213_ship_delay_survival",
    "q214_order_backlog",
    "q215_mad_outliers",
    "q216_vocab_growth",
    "q217_association_rules",
    "q218_new_vs_returning",
    "q219_conversion_latency",
    "q220_discount_elasticity",
    "q221_cohort_ltv",
    "q222_bootstrap_ci",
    "q223_join_skew_audit",
    "q224_pareto_skyline",
    "q225_source_jsd",
    "q226_price_index",
    "q227_revenue_acf",
    "q228_source_verbosity",
    "q229_theil_decomposition",
    "q230_ndcg_exact",
    "q231_theil_sen_trend",
    "q232_hhi_concentration",
    "q233_mutual_information",
    "q234_activity_islands",
    "q235_cusum_changepoint",
    "q236_doc_distinctiveness",
    "q237_vocab_jaccard",
    "q238_cuped_lift",
    "q239_seasonal_anomaly",
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
