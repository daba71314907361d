"""Query registry: the engine's declared operator surface.

Every operator from SURVEY.md §2 that is implemented registers here with a
``(spark, sf_dir) -> DataFrame`` callable and (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` simply re-exports these.

Contract notes (driver harness):
- Column names must match between the Spark result and the oracle SQL; the
  driver sorts columns by name before hashing values.
- Floating aggregates are rounded identically on both sides so that
  summation-order differences can't flip the value hash.
- Timestamps are formatted to strings ('yyyy-MM-dd HH:mm:ss') on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an engine op. ``oracle=None`` => rows-only check (non-SQL op)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from wri_data_processing_spark.queries import (  # noqa: F401
        affinity,
        aggregates,
        data_quality,
        events_analytics,
        flagship,
        geo,
        graph,
        io_ops,
        llm_dedup,
        llm_pipeline,
        llm_similarity,
        llm_text,
        multimodal,
        relational,
        scalar_fns,
        scale_patterns,
        setops,
        sorts,
        stats_numeric,
        streaming_batch,
        tpch_extra,
        warehouse_ops,
        windows,
    )
