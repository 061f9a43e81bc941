"""Central query registry.

Each operator module exports ``QUERIES`` (name -> callable(spark, sf_dir)
-> DataFrame) and ``ORACLES`` (name -> DuckDB SQL twin, omitted for
non-SQL-expressible operators). ``__spark_entry__.py`` re-exports the
merged registry; the names are the SURVEY.md §2 operator IDs.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The external correctness harness certifies the FIRST 50 ``queries()``
# entries per round (dict insertion order). Rounds 1-2 signed the
# SURVEY §2 relational core; round 3 signed the LLM-data-pipeline
# suite (dedup / similarity / text / curation / sampling / pipeline
# analytics / time-series). Round 4 rotates in the suites that have
# NEVER had a driver-signed row — the full TPC-H batch (q2-q22), the
# datamix / skew / layout suites, the extras remainder — plus the
# repaired ``embed_centroid_stats`` (r3's one red row, now integer-unit
# string accumulators) and ``sim_ivf_kmeans_topk`` (promised rotation
# after its unrolled-Lloyd oracle landed in r3). The three §2
# sentinels stay pinned so the core never goes a round unsigned.
# Entries NOT listed keep module order after the priority block and
# stay covered every round by the local parity suite
# (tests/test_oracle_parity.py) and the representation audit
# (tools/canon_check.py — run it before rotating anything in).
#
# Round-5 rotation candidates (oracled, never driver-signed): the
# dedup extension batch (soft_weights, prefix, lsh_verified, pagerank,
# triangles, containment, passage, semdedup), the similarity remainder
# (pq, prefix, filtered, ivfpq, knn_join), the curation remainder
# (boilerplate, schema_stats, gopher_gates, inverted_index, rarity,
# dup_rate, chunking, weighted_terms), sampling (importance, domain
# cap, global order), analytics (bitmap_distinct, pivot_status_by_day),
# text_ngram_diversity, and the round-4 additions (dedup_lines_c4,
# url_canonical_dedup, quality_lm_surprise, quality_domain_calibrated,
# mask_span_plan, embed_pca_power, sim_hard_negatives,
# event_transition_matrix, curation_funnel, dedup_quality_survivor,
# vocab_bpe_pair_stats, dedup_lsh_calibration, sample_curriculum_order,
# vocab_bpe_learn_merges, tokenize_with_learned_bpe,
# sim_ann_recall_eval, mix_anneal_schedule, quality_classifier_eval,
# mix_drift_chi2, search_bm25_topk, dsir_importance,
# layout_compaction_plan, embed_outlier_scores,
# decontaminate_span_lengths, profile_source_overlap, ts_vwap_bars,
# sketch_cms_heavy_hitters, sketch_bloom_decontaminate,
# search_hybrid_rrf, search_mmr_diversify, layout_zonemap_skipping,
# search_prf_expand, tokens_context_audit, sample_kcenter_coreset,
# sketch_hll_distinct, sketch_kmv_overlap, decontaminate_semantic,
# sim_sq8_topk, events_funnel_steps, events_retention_cohorts,
# basket_pair_lift, customer_rfm_segments, events_active_users_rolling,
# revenue_concentration_gini, dedup_substring_spans,
# er_blocked_matching, stats_robust_mad, skyline_pareto_parts,
# view_incremental_merge, experiment_ab_lift, path_topk_journeys,
# profile_table_stats, sketch_quantile_histogram,
# graph_label_propagation, graph_kcore, sample_temporal_split,
# metrics_bootstrap_ci, stats_ks_drift, dedup_winnowing,
# mm_phash_dedup)
# — ~87 entries;
# prioritize the never-signed suites, spill the remainder to r6.
_PRIORITY: list[str] = [
    # §2 sentinels — pinned every round.
    "w1_minute_activity",
    "q0_snapshot_topk",
    "j1_star_join_revenue",
    # r3's red row, repaired this round — must re-certify.
    "embed_centroid_stats",
    # TPC-H batch (analytics + tpch + tpch_full modules).
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_lines",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_sole_returning_supplier",
    "q22_global_sales_opportunity",
    # Dataset-mix / incremental-dedup suite.
    "mix_epoch_repeats",
    "mix_temperature_weights",
    "mix_domain_weights",
    "dedup_incremental_ingest",
    "dedup_cross_source",
    "sample_token_budget",
    # Skew tools.
    "agg_salted_skew",
    "join_salted_skew",
    # Physical layout.
    "j8_bucketed_join",
    "layout_zorder_events",
    # Extras remainder.
    "reconcile_checksum",
    "feature_quantile_bucketize",
    "agg_grouping_sets",
    "agg_stats_moments",
    "agg_quartiles_exact",
    "wf_share_of_total",
    "wf_first_last_nth",
    "agg_mode_exact",
    "f_regexp_funcs",
    "sql_api_snapshot",
    # Streaming-twin batch windows not yet signed.
    "w9_cascaded_rollup",
    "w11_minute_distinct_users",
    # Singles.
    "j7_full_outer_reconcile",
    "f_variant_funcs",
    "sim_ivf_kmeans_topk",
]

_MODULES: list[str] = [
    "real_time_streaming_system_with_apache_kafka_spark.operators.windows",
    "real_time_streaming_system_with_apache_kafka_spark.operators.relational",
    "real_time_streaming_system_with_apache_kafka_spark.operators.aggregates",
    "real_time_streaming_system_with_apache_kafka_spark.operators.joins",
    "real_time_streaming_system_with_apache_kafka_spark.operators.scalars",
    "real_time_streaming_system_with_apache_kafka_spark.generator",
    "real_time_streaming_system_with_apache_kafka_spark.operators.dedup",
    "real_time_streaming_system_with_apache_kafka_spark.operators.text",
    "real_time_streaming_system_with_apache_kafka_spark.operators.similarity",
    "real_time_streaming_system_with_apache_kafka_spark.operators.multimodal",
    "real_time_streaming_system_with_apache_kafka_spark.operators.analytics",
    "real_time_streaming_system_with_apache_kafka_spark.operators.tpch",
    "real_time_streaming_system_with_apache_kafka_spark.operators.tpch_full",
    "real_time_streaming_system_with_apache_kafka_spark.operators.dashboard",
    "real_time_streaming_system_with_apache_kafka_spark.operators.extras",
    "real_time_streaming_system_with_apache_kafka_spark.operators.timeseries",
    "real_time_streaming_system_with_apache_kafka_spark.operators.sampling",
    "real_time_streaming_system_with_apache_kafka_spark.operators.pipeline_analytics",
    "real_time_streaming_system_with_apache_kafka_spark.operators.curation",
    "real_time_streaming_system_with_apache_kafka_spark.operators.skew",
    "real_time_streaming_system_with_apache_kafka_spark.operators.datamix",
    "real_time_streaming_system_with_apache_kafka_spark.operators.layout",
    "real_time_streaming_system_with_apache_kafka_spark.operators.retrieval",
    "real_time_streaming_system_with_apache_kafka_spark.operators.sketches",
]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(mod_name)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query id {name!r} in {mod_name}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name in oracles:
                raise ValueError(f"duplicate oracle id {name!r} in {mod_name}")
            oracles[name] = textwrap.dedent(sql).strip()
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    missing = [k for k in _PRIORITY if k not in queries]
    if missing:
        raise ValueError(f"priority keys without queries: {missing}")
    if len(set(_PRIORITY)) != len(_PRIORITY):
        raise ValueError("duplicate keys in _PRIORITY")
    ordered = {k: queries[k] for k in _PRIORITY}
    ordered.update((k, v) for k, v in queries.items() if k not in ordered)
    return ordered, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
