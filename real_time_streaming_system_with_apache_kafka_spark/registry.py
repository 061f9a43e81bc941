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
# SURVEY §2 relational core; round 3 the LLM-data-pipeline suite;
# round 4 the TPC-H batch (q2-q22) + datamix / skew / layout / extras;
# round 5 the dedup-extension / dup-graph / BPE / similarity-remainder
# / pipeline-analytics batch. Round 6 rotates in 47 more of the
# never-driver-signed entries: the 11 golden-fixture oracles (the 10
# dash_* frames + src1_trade_generator — src1 upgrades its r1-r4
# rows-only signature to a hash signature), retrieval, sketches,
# sampling (incl. the r5-added sample_cluster_safe_split), mix,
# layout, view_incremental_merge, the pack/export dataloader pair,
# and 11 of the 18 curation remainder. The three §2 sentinels stay
# pinned so the core never goes a round unsigned. Entries NOT listed
# keep module order after the priority block and stay covered every
# round by the local parity suite (tests/test_oracle_parity.py) and
# the representation audit (tools/canon_check.py — run it before
# rotating anything in).
#
# Round-7 rotation candidates (the 10 left unsigned after r6): the
# curation-remainder tail (quality_lm_surprise,
# quality_domain_calibrated, quality_classifier_eval, mask_span_plan,
# curation_funnel, decontaminate_span_lengths, profile_source_overlap)
# and the 3 by-design rows-only entries (mm_feature_extract,
# approx_hll_partials, approx_aggregates — no oracle; the driver
# records the weaker rows-only check for these), plus the r6-added
# dedup_embedding_multiprobe (oracled, canon-clean, never signed).
_PRIORITY: list[str] = [
    # §2 sentinels — pinned every round.
    "w1_minute_activity",
    "q0_snapshot_topk",
    "j1_star_join_revenue",
    # Golden-fixture oracles: the 10 dashboard frames + the generator
    # itself (DuckDB twins over tests/fixtures/trades_seed42_n20000
    # .parquet, bit-pinned to the live generator by pytest).
    "dash_kpis",
    "dash_status_distribution",
    "dash_asset_class_exposure",
    "dash_counterparty_top10",
    "dash_venue_distribution",
    "dash_fee_mix",
    "dash_side_split",
    "dash_minute_activity",
    "dash_breaks_table",
    "dash_recent_trades",
    "src1_trade_generator",
    # Retrieval suite.
    "search_bm25_topk",
    "dsir_importance",
    "search_hybrid_rrf",
    "search_mmr_diversify",
    "search_prf_expand",
    # Sketches.
    "sketch_cms_heavy_hitters",
    "sketch_bloom_decontaminate",
    "sketch_hll_distinct",
    "sketch_kmv_overlap",
    "sketch_quantile_histogram",
    # Sampling / splits.
    "sample_kcenter_coreset",
    "sample_importance_weighted",
    "sample_domain_cap",
    "shuffle_global_order",
    "sample_curriculum_order",
    "sample_temporal_split",
    "stats_ks_drift",
    "sample_cluster_safe_split",
    # Data-mix.
    "mix_drift_chi2",
    "mix_anneal_schedule",
    # Layout.
    "layout_compaction_plan",
    "layout_zonemap_skipping",
    # Incremental view maintenance.
    "view_incremental_merge",
    # Dataloader prep (r5 additions).
    "pack_sequences_plan",
    "export_shard_plan",
    # Curation remainder (11 of 18; tail spills to r7).
    "text_boilerplate_strip",
    "profile_schema_stats",
    "quality_gopher_gates",
    "tokens_context_audit",
    "embed_outlier_scores",
    "profile_table_stats",
    "text_inverted_index",
    "text_rarity_score",
    "profile_dup_rate_by_source",
    "chunk_documents",
    "quality_weighted_terms",
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
