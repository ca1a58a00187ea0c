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
# re-proves the proven. Round-7 rotation (VERDICT r06 ask #1): the
# round-6 window went 50/50 green, so this window leads with the 4
# conversions staged below the line at round-6 end, the 3 round-7
# rows-only->oracle conversions (changed semantics => any old
# attestation is void; they earn hash rows here), and the 43 round-7
# newcomers in registration order — exactly 50, zero re-proofs.
# Rows-only specs NEVER occupy a top-50 slot (they cannot earn a hash
# row); the remaining never-attested oracle-backed set after this
# window is exactly {q172b_pq_adc_topk_portable} — the one round-7
# late addition, staged at the head of the round-8 rotation the same
# way q83f/q149/q187/q85g were staged at round-6 end.
_DRIVER_PRIORITY = [
    "q149_rolling_distinct_sketch",
    "q187_dedup_metrics",
    "q85g_freq_terms_sketch",
    "q83f_ann_lsh_topk_portable",
    "q83e_topk_vectorized",
    "q186_retrieval_metrics",
    "q107_semdedup",
    "q287_ann_ivf_topk_portable",
    "q288_snapshot_incremental_neardup",
    "q289_url_canonical_dedup",
    "q290_stream_session_rollup",
    "q291_wap_publish_audit",
    "q292_partition_evolution_scan",
    "q293_forgotten_user_audit",
    "q294_matview_cdc_refresh",
    "q295_clamped_running_balance",
    "q296_mann_whitney_u",
    "q297_sprt_sequential_test",
    "q298_bh_fdr_control",
    "q299_spearman_rank_corr",
    "q300_unigram_surprisal",
    "q301_vocab_coverage",
    "q302_cross_source_dups",
    "q303_zorder_locality",
    "q304_kwic_concordance",
    "q305_transition_dwell",
    "q306_session_concurrency",
    "q307_topk_with_ties",
    "q308_invoice_reconciliation",
    "q309_ips_offpolicy_eval",
    "q310_business_days_to_ship",
    "q311_behavior_bitmask_census",
    "q312_rolling_distinct_bitmask",
    "q313_weekly_cohort_overlap",
    "q314_twap_by_brand",
    "q315_event_streak_rle",
    "q316_asof_join_tolerance",
    "q317_tag_read_isolation",
    "q318_compact_equivalence",
    "q319_rollback_lineage",
    "q320_expire_snapshots_gc",
    "q321_lsh_band_tradeoff",
    "q322_percentile_two_phase",
    "q323_fk_inference_profile",
    "q324_stream_bitmask_profile",
    "q325_luhn_checksum_census",
    "q326_sequence_gap_detection",
    "q327_exact_mode_by_group",
    "q328_priority_inversion_audit",
    "q329_branch_divergence_summary",
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
