"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered operator
from go_integ_spark (SURVEY.md §2 inventory + the analytics layer)
for the driver's DuckDB correctness gate.

Query order: staleness-driven family round-robin. Pure
cost-ascending order (rounds 1-3) maximized the COUNT of gate rows
but starved the expensive tail; round 4's blind rotation put every
family in front but cycled without memory, so a query the driver
never reached could stay unreached for many rounds. The committed
``CORRECTNESS_r*.json`` files at the repo root ARE the memory: each
query's priority is the last round in which the driver recorded a
GREEN row for it (never-checked or last-seen-failing sorts first),
so a time-budgeted sweep always spends its budget on the least-
recently-verified work. Family round-robin interleaving is kept on
top (rank-k block = every family's k-th stalest member) so even a
tiny budget still touches every operator family.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_integ_spark.registry import load_all

# Measured per-query seconds at sf0.01 (warm session, local[8]);
# unlisted queries sort by name at the end of their cost bucket.
# Refresh with: scripts/time_queries.py
_MEASURED_COST = {
    "text_pii_redact": 0.13,
    "dedup_minhash_lsh": 0.14,
    "text_fingerprint": 0.14,
    "text_token_count": 0.14,
    "multimodal_metadata": 0.15,
    "text_repetition_ratio": 0.15,
    "cdc_scd2_history": 0.16,
    "curation_shuffle_shards": 0.16,
    "curation_weighted_sample": 0.16,
    "embedding_random_projection": 0.16,
    "sample_stratified": 0.16,
    "sink_singer_envelope": 0.16,
    "window_running_customer_spend": 0.16,
    "window_trailing_spend": 0.16,
    "text_chunk_overlap": 0.17,
    "text_quality_score": 0.17,
    "text_unigram_entropy": 0.17,
    "curation_blocklist_filter": 0.18,
    "sink_airbyte_envelope": 0.18,
    "text_classifier_score": 0.18,
    "window_order_gaps": 0.18,
    "agg_correlation": 0.19,
    "agg_sketch_accuracy": 0.19,
    "asof_join_click_attribution": 0.19,
    "dedup_keep_latest": 0.19,
    "asof_join_purchase_click": 0.2,
    "contamination_ngram_overlap": 0.2,
    "incremental_cursor_read": 0.2,
    "corpus_token_stats": 0.21,
    "curation_mix_weights": 0.21,
    "text_gopher_quality": 0.21,
    "text_word_stats": 0.21,
    "agg_cube_status_priority": 0.22,
    "agg_distinct_counts": 0.22,
    "curation_temperature_sampling": 0.22,
    "curation_domain_cap": 0.23,
    "events_hourly_rollup": 0.23,
    "events_sessionize": 0.23,
    "join_anti_customers_without_orders": 0.23,
    "set_intersect_rich_building": 0.23,
    "agg_regression": 0.24,
    "asof_join_tolerance": 0.24,
    "connector_file_incremental_read": 0.24,
    "dedup_exact": 0.24,
    "join_semi_customers_with_orders": 0.24,
    "agg_grouping_sets": 0.25,
    "agg_percentiles": 0.25,
    "curation_holdout_split": 0.25,
    "events_funnel": 0.25,
    "sort_limit_top_lineitems": 0.25,
    "window_top_orders_per_customer": 0.25,
    "curation_annotation_agreement": 0.26,
    "curation_epoch_schedule": 0.26,
    "q1_pricing_summary": 0.27,
    "asof_join_nearest": 0.28,
    "curation_pack_sequences": 0.28,
    "events_unpivot_metrics": 0.28,
    "q6_forecast_revenue": 0.28,
    "text_dup_ngram_fraction": 0.28,
    "agg_weighted_median": 0.3,
    "curation_split_leakage": 0.3,
    "embedding_dim_profile": 0.3,
    "embedding_health": 0.3,
    "events_pivot_type_counts": 0.3,
    "q14_promo_effect": 0.3,
    "range_join_error_clicks": 0.3,
    "sink_partition_plan": 0.3,
    "agg_mode_deterministic": 0.31,
    "dedup_paragraph": 0.31,
    "set_except_rich_not_building": 0.31,
    "similarity_pq_encode": 0.31,
    "text_embed_hash": 0.31,
    "multimodal_resize_thumbs": 0.32,
    "cdc_snapshot_diff": 0.33,
    "curation_dedup_impact": 0.33,
    "set_union_distinct": 0.33,
    "subquery_orders_above_avg": 0.33,
    "text_vocab_growth": 0.33,
    "curation_quality_filter": 0.34,
    "multimodal_decode_features": 0.34,
    "agg_histogram": 0.35,
    "text_lang_id": 0.35,
    "curation_boilerplate_ngrams": 0.36,
    "events_markov_next": 0.36,
    "events_rfm": 0.36,
    "events_user_lifetime": 0.36,
    "similarity_ivf_cell_balance": 0.36,
    "window_ewma_value": 0.36,
    "dedup_exact_substring": 0.37,
    "events_cohort_retention": 0.37,
    "multimodal_audio_vad": 0.37,
    "curation_mirror_blocklist": 0.38,
    "curation_ngram_novelty": 0.38,
    "curation_quality_calibration": 0.38,
    "dedup_canonical_pick": 0.38,
    "events_session_stats": 0.38,
    "stream_source_documents_build": 0.38,
    "events_top_paths": 0.39,
    "events_transition_matrix": 0.39,
    "multimodal_frame_sample": 0.39,
    "agg_rollup_nation_segment": 0.4,
    "events_bot_gap_regularity": 0.4,
    "q13_customer_distribution": 0.4,
    "q17_small_quantity_revenue": 0.4,
    "text_heavy_hitters": 0.4,
    "window_share_of_segment": 0.4,
    "events_json_extract": 0.41,
    "join_interval_overlap": 0.41,
    "q4_late_orders": 0.41,
    "q19_disjunctive_predicates": 0.42,
    "q22_idle_customers": 0.42,
    "dedup_containment": 0.43,
    "dedup_ngram_jaccard": 0.43,
    "dedup_soft_weights": 0.43,
    "events_attribution_linear": 0.43,
    "q12_priority_shipping": 0.43,
    "similarity_sq_encode": 0.43,
    "window_rolling_distinct_hll": 0.43,
    "multimodal_phash_dedup": 0.44,
    "q15_top_supplier": 0.45,
    "join_salted_skew": 0.46,
    "text_bpe_vocab": 0.46,
    "graph_triangle_count": 0.48,
    "stream_source_embeddings_build": 0.48,
    "text_zipf_fit": 0.48,
    "text_collocations": 0.49,
    "connector_http_paginated_read": 0.51,
    "events_hourly_gapfill": 0.51,
    "graph_dup_flow": 0.51,
    "multimodal_scene_cuts": 0.51,
    "embedding_outliers": 0.52,
    "events_anomaly_mad": 0.54,
    "q3_shipping_priority": 0.54,
    "window_rolling_distinct_users": 0.55,
    "text_rake_keywords": 0.58,
    "q10_returned_items": 0.59,
    "curation_diversity_sample": 0.63,
    "graph_degree_distribution": 0.66,
    "text_bpe_apply": 0.66,
    "q9_product_profit": 0.67,
    "multimodal_phash_neighbors": 0.68,
    "q18_large_volume_customers": 0.68,
    "ann_bruteforce_topk": 0.69,
    "similarity_hard_negatives": 0.7,
    "corpus_source_divergence": 0.71,
    "basket_part_pairs": 0.72,
    "q5_local_supplier_volume": 0.73,
    "q7_volume_shipping": 0.74,
    "similarity_threshold_join": 0.74,
    "text_bm25_topk": 0.74,
    "connector_graphql_cursor_read": 0.75,
    "agg_bloom_prefilter": 0.76,
    "curation_token_budget_select": 0.76,
    "q16_supplier_part_count": 0.76,
    "q21_late_supplier_wait": 0.76,
    "streaming_pk_dedup": 0.8,
    "q8_market_share": 0.81,
    "q20_promotion_candidates": 0.82,
    "window_spend_quartiles": 0.83,
    "text_bigram_logprob": 0.84,
    "curation_dsir_weights": 0.85,
    "similarity_mmr_rerank": 0.87,
    "agg_countmin_sketch": 0.91,
    "dedup_embedding_cosine": 0.91,
    "q11_important_part_value": 0.94,
    "q2_min_cost_supplier": 0.95,
    "text_lang_confusion": 0.95,
    "streaming_chunk_manifest": 0.97,
    "stream_source_events_build": 0.99,
    "dedup_shingle_cache_build": 1.0,
    "ann_ivf_topk": 1.01,
    "text_winnow_fingerprint": 1.01,
    "similarity_hybrid_rrf": 1.04,
    "text_tfidf_topk": 1.06,
    "similarity_matryoshka_recall": 1.07,
    "text_perplexity_buckets": 1.07,
    "dedup_incremental_lsh": 1.08,
    "dedup_semdedup": 1.11,
    "similarity_pq_search": 1.14,
    "streaming_static_enrich": 1.17,
    "streaming_session_window": 1.18,
    "dedup_srp_buckets": 1.19,
    "similarity_ivf_probe_recall": 1.21,
    "dedup_paraphrase_pairs": 1.25,
    "streaming_foreach_batch_merge": 1.27,
    "similarity_recall_eval": 1.28,
    "streaming_srp_registry": 1.28,
    "dedup_simhash": 1.31,
    "dedup_threshold_sweep": 1.31,
    "contamination_embedding": 1.32,
    "similarity_ndcg_eval": 1.36,
    "streaming_paragraph_dedup": 1.43,
    "curation_pipeline_funnel": 1.45,
    "similarity_pq_agreement": 1.45,
    "streaming_anomaly_mad": 1.45,
    "embedding_kmeans": 1.46,
    "graph_pagerank_sources": 1.47,
    "embedding_knn_graph": 1.58,
    "dedup_embedding_cosine_strict": 1.59,
    "text_winnow_overlap": 1.63,
    "dedup_clusters": 1.72,
    "similarity_cluster_purity": 1.74,
    "streaming_running_max_cursor": 1.76,
    "streaming_histogram": 1.88,
    "ann_ivfpq_topk": 2.01,
    "streaming_hourly_counts": 2.06,
    "ann_ivfpq_residual_topk": 2.1,
    "ann_ivf_topk_partitioned": 2.12,
    "streaming_stream_join": 2.13,
    "similarity_bitext_pairs": 2.47,
    "dedup_lsh_pairs_build": 3.33,
    "connector_datasource_distributed_read": 4.08,
    "embedding_communities": 6.48,
    "er_blocked_fuzzy_parts": 1.51,
    "er_blocking_quality": 1.40,
    "er_golden_record": 2.60,
    "events_changepoint_cusum": 3.18,
    "events_forecast_eval": 1.20,
    "streaming_changepoint_cusum": 2.50,
    "streaming_phash_registry": 2.40,
}


# Queries whose IMPLEMENTATION OR ORACLE changed since their last
# green row: a past green proves the OLD form, so treat them as
# never-verified and let them lead the sweep. Remove an entry once a
# committed CORRECTNESS file shows the new form green (its fresh
# green round then orders it naturally).
# r10: emptied — CORRECTNESS_r09 shows both r9 entries
# (similarity_bitext_pairs, similarity_threshold_join) green ON
# THEIR NEW FORMS, so their fresh green rounds order them naturally.
_FORCE_RECHECK: frozenset[str] = frozenset()


def _last_green_rounds() -> dict[str, int]:
    """Per query, the highest round whose committed
    ``CORRECTNESS_r*.json`` records a GREEN row: no error, row count
    and schema match, and the value hash either matches or is absent
    (rows-only queries carry ``hash_match: null``). A query whose only
    rows are errors or hash-fails — like ``events_sessionize``'s stale
    r1 traceback or ``similarity_pq_search``'s r4 fail — stays at -1
    and therefore leads its family in the next sweep. Queries in
    ``_FORCE_RECHECK`` are dropped from the map (old greens proved a
    form that no longer exists).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        stem = os.path.basename(path)
        try:
            rnd = int(stem.removeprefix("CORRECTNESS_r").removesuffix(".json"))
            with open(path) as f:
                rows = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is not False
            )
            if green:
                last[name] = max(last.get(name, -1), rnd)
    for name in _FORCE_RECHECK:
        last.pop(name, None)
    return last


_ORDER_CACHE: list[str] | None = None


def _ordered_names() -> list[str]:
    """Staleness-driven family round-robin (see module docstring).

    Primary key is the last-green round itself: the ENTIRE
    never-verified bucket precedes everything already green (a family
    with a deep unverified tail — the ten TPC-H joins in round 4 —
    must not queue behind other families' already-green members).
    Within a staleness bucket, families interleave via
    rank-within-family, cheapest first, so the sweep still spreads
    across operator families. Memoized for the process lifetime: the
    driver may write this round's CORRECTNESS file mid-run, and
    re-deriving the order from it would shift the sequence between
    ``queries()`` and ``oracle_sql()``.
    """
    global _ORDER_CACHE
    if _ORDER_CACHE is not None:
        return _ORDER_CACHE
    registry = load_all()
    last_green = _last_green_rounds()
    families: dict[str, list[str]] = {}
    for name, spec in registry.items():
        families.setdefault(spec.tags[0] if spec.tags else "misc", []).append(name)
    keyed: list[tuple[int, int, float, str]] = []
    for members in families.values():
        members.sort(
            key=lambda n: (last_green.get(n, -1), _MEASURED_COST.get(n, 99.0), n)
        )
        keyed.extend(
            (last_green.get(name, -1), rank, _MEASURED_COST.get(name, 99.0), name)
            for rank, name in enumerate(members)
        )
    keyed.sort()
    _ORDER_CACHE = [name for _, _, _, name in keyed]
    return _ORDER_CACHE


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
