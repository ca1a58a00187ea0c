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
# re-proves the proven. Round-3 rotation (VERDICT r02 ask #1): the
# top-50 window holds ONLY oracle-backed queries that have never
# received a driver row (not in CORRECTNESS_r01 ∪ r02) — decision-
# support twins q109-q140, the LLM-curation suite q101-q108, the DQ
# suite, retrieval/spans/eval metrics, and the stream-replay variants.
# Green across r01+r02+r03 then covers 133 of 202 registered queries.
# The next 46 (still never-verified, oracle-backed) queue for round 4;
# verified and rows-only specs follow in registration order. Rows-only
# specs NEVER occupy a top-50 slot (they cannot earn a hash row).
_DRIVER_PRIORITY = [
    # -- round-3 window: 50 never-driver-verified, all oracle-backed --
    "q109_local_supplier_volume",
    "q110_volume_shipping",
    "q111_market_share",
    "q112_part_type_profit",
    "q113_top_supplier",
    "q114_small_qty_revenue",
    "q115_brand_discount_revenue",
    "q132_waiting_supplier",
    "q133_order_count_distribution",
    "q134_min_cost_supplier",
    "q135_triangle_count",
    "q137_late_shipment_priority",
    "q138_important_part_value",
    "q139_supplier_part_variety",
    "q140_dominant_supplier",
    "q101_corpus_curation",
    "q102_sequence_packing",
    "q103_pii_scrub",
    "q104_contamination_check",
    "q105_repetition_stats",
    "q106_domain_mixture",
    "q108_tokenizer_fertility",
    "q116_dq_profile",
    "q117_dq_referential",
    "q118_dq_constraints",
    "q120_drift_psi",
    "q143_value_histogram",
    "q156_equidepth_histogram",
    "q161_key_skew_profile",
    "q181_k_anonymity",
    "q189_ks_statistic",
    "q129_bm25_search",
    "q160_hybrid_rrf_search",
    "q158_dup_span_coverage",
    "q171_span_dedup_clean",
    "q184_disorder_audit",
    "q185_unpivot",
    "q188_decile_lift",
    "q190_auc_roc",
    "q191_calibration_brier",
    "q74b_stream_sliding_replay",
    "q75c_stream_session_replay",
    "q122_stream_stream_join",
    "q146_stream_stream_left_outer",
    "q180_stream_sequence_pattern",
    "q35b_ohlc_resample",
    "q81b_normalized_dedup",
    "q126_grouping_sets_time_hierarchy",
    "q50b_scalable_ranking",
    "q183_corpus_diff",
    # ---- 50-slot budget line (driver stops here) ----
    # round-4 queue: remaining never-verified oracle-backed specs
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
