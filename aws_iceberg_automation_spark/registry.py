"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when SQL-expressible,
a matching DuckDB oracle SQL string. ``__spark_entry__.py`` exposes this
registry to the verification driver.

Engine/oracle agreement conventions (see SURVEY.md §4.3 watch-list):

- Alias every computed/aggregate column identically on both sides.
- Sum doubles through DECIMAL casts (exact, order-independent), then
  cast the result to DOUBLE — bit-identical across engines.
- ``CAST(SUM(int) AS BIGINT)`` in oracle SQL (DuckDB sums ints to
  HUGEINT, which pandas/hashers mangle).
- Truncate ``events.ts`` to seconds on both sides (ns vs µs physical).
- Round genuinely order-dependent float aggregates (stddev/corr/...)
  to 4-6 decimals on both sides.
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
    load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
