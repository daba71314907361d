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


# Driver-sample priority: the correctness harness samples the FIRST ~50
# registered queries, so registration order decides which operators get a
# hard driver-verified CORRECTNESS row each round.  Round-5 sample
# (VERDICT r4 item 3: spend slots on the 59 never-driver-sampled ops):
# (a) the two r4 red rows, re-sampled to prove their fixes green, plus the
#     new numeric reprojection oracle (r4 item 4),
# (b) the TPC-H q2-q22 suite — the largest contiguous never-sampled block,
# (c) the window/join/scan/stats/graph/warehouse tail with only local
#     evidence after four rounds.
# Positions 51+ queue the remaining never-sampled ops for the next rotation,
# ahead of everything already driver-verified in r1-r4.
_DRIVER_SAMPLE_PRIORITY: list[str] = [
    # -- round-5 fix targets (red in r4, fixed this round) --
    "multimodal_features",
    "pipeline_clean_corpus",
    # -- new numeric oracle for the reprojection edge (r4 item 4) --
    "geo_reproject_bbox_vals",
    # -- TPC-H suite: never driver-sampled in any round --
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_region_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_customers",
    "q11_important_stock",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume",
    "q19_discounted_revenue",
    "q20_excess_inventory",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # -- window tail --
    "window_ntile",
    "window_first_last",
    "window_percent_rank",
    # -- relational tail --
    "subquery_correlated",
    "join_lateral",
    "cte_recursive_chain",
    "join_cross",
    "join_null_safe",
    "join_asof_forward",
    # -- source formats --
    "scan_jsonl",
    "scan_orc",
    # -- stats / profiling family --
    "stats_moments",
    "stats_welch_ttest",
    "stats_corr_matrix",
    "agg_histogram",
    "profile_columns",
    # -- graph --
    "graph_pagerank",
    "graph_triangle_count",
    # -- warehouse maintenance --
    "merge_upsert",
    "scd2_user_state",
    # -- events anomaly family --
    "events_zscore_outliers",
    "events_mad_outliers",
    "events_cusum",
    # -- reshape / interface --
    "unpivot_melt",
    "nested_order_baskets",
    "sql_interface",
    "materialized_reuse",
    # -- positions 51+: remaining never-sampled ops, next rotation --
    "pandas_grouped_map",
    "pandas_grouped_agg",
    "join_bloom_prefilter",
    "agg_hll_mergeable",
    "skyline_pareto_frontier",
    "maintenance_compaction",
    "stream_static_join",
    "stream_sliding_window",
    "geo_layer_cog_pipeline",
    "dedup_minhash_ml",
    "sim_ann_brp_ml",
    "geo_reproject_bbox",
    "sink_cog_lzw_bigtiff",  # new in r5 (LZW/BigTIFF dialect round-trip)
    "dedup_clusters_unique",  # new in r5 (duplication-invariant clusters)
    "scan_schema_evolution",  # new in r5 (mergeSchema drift handling)
    "dedup_substring",  # new in r5 (exact substring-span dedup, Lee et al.)
    "sim_ann_sq8",  # new in r5 (int8 scalar-quantized ANN + exact re-rank)
    "stream_join_outer",  # new in r5 (left-outer stream-stream interval join)
    "embed_kmeans_iterate",  # new in r5 (two exact Lloyd rounds, unrolled oracle)
    "dedup_substring_winnow",  # new in r5 (content-defined fingerprint sampling)
    "corpus_prep_pipeline",  # new in r5 (composed end-to-end prep with fate report)
    "geo_zonal_stats",  # new in r5 (zonal raster statistics, exact decimal sums)
    "geo_focal_mean",  # new in r5 (3x3 focal mean via scatter, not self-join)
    "geo_slope",  # new in r5 (central-difference gradient, 2-addend-exact floats)
    "geo_hillshade",  # new in r5 (trig-free Lambertian shading, IEEE-exact)
    "geo_raster_algebra",  # new in r5 (two-band normalized difference via co-partitioned join)
    "text_compression_ratio",  # new in r5 (zlib quality signal, declared Arrow boundary)
    "dedup_substring_spans",  # new in r5 (merged duplicated intervals, the cut list)
    "pipeline_mask_spans",  # new in r5 (per-doc masking decision from the cut list)
]


def _apply_driver_sample_order() -> None:
    """Reorder REGISTRY in place so priority queries register first.

    Mutates the existing dict (callers hold references to it) rather than
    rebinding the module global.
    """
    snapshot = dict(REGISTRY)
    missing = [n for n in _DRIVER_SAMPLE_PRIORITY if n not in snapshot]
    if missing:
        raise RuntimeError(f"priority list names unregistered queries: {missing}")
    REGISTRY.clear()
    for name in _DRIVER_SAMPLE_PRIORITY:
        REGISTRY[name] = snapshot[name]
    for name, fn in snapshot.items():
        if name not in REGISTRY:
            REGISTRY[name] = fn


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

    _apply_driver_sample_order()
