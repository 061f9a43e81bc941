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
# Round-7 rotation closes the certification ledger: the 11 entries
# never driver-signed after r6 (the 7-entry curation-remainder tail,
# the 3 by-design rows-only entries — no oracle; the driver records
# the weaker rows-only check for these — and the r6-added
# dedup_embedding_multiprobe), plus w4_wire_roundtrip_dedup (upgraded
# rows-only -> golden-fixture HASH oracle this round) and
# sim_ivf_kmeans_topk (quantizer re-specified to the count-derived
# blocks.py machinery this round — a materially new plan needs a
# fresh signature). The remaining 34 slots re-sign the §2 relational
# core last signed in r1/r2, BEFORE the r3+ session-default changes:
# predicates, projections, aggregates, sorts, scalar functions, and a
# joins/setops/window-function sample. With this window every one of
# the registry's entries has been driver-signed at least once
# (cumulative distinct-signed = 244/244).
_PRIORITY: list[str] = [
    # §2 sentinels — pinned every round.
    "w1_minute_activity",
    "q0_snapshot_topk",
    "j1_star_join_revenue",
    # Never-signed tail: curation remainder (7, all oracled).
    "quality_lm_surprise",
    "quality_domain_calibrated",
    "quality_classifier_eval",
    "mask_span_plan",
    "curation_funnel",
    "decontaminate_span_lengths",
    "profile_source_overlap",
    # Never-signed tail: by-design rows-only (no oracle).
    "mm_feature_extract",
    "approx_hll_partials",
    "approx_aggregates",
    # Never-signed tail: r6-added multiprobe dedup (oracled).
    "dedup_embedding_multiprobe",
    # Upgraded / re-specified this round.
    "w4_wire_roundtrip_dedup",
    "sim_ivf_kmeans_topk",
    # §2 core re-signs (last signed r1/r2): predicates.
    "p1_equality_filter",
    "p2_substring_filter",
    "p3_boolean_rate",
    "p4_set_membership",
    "p5_numeric_threshold",
    # Projections.
    "pr1_projection",
    "pr2_derived_columns",
    "pr3_type_casts",
    "pr4_display_format",
    # Aggregates.
    "a1_count",
    "a2_totals",
    "a3_conditional_counts",
    "a4_boolean_mean",
    "a5_derived_ratios",
    "a7_groupby_sum",
    "a9_unpivot_fee_mix",
    # Sorts / top-k.
    "s2_top10_by_aggregate",
    "s3_sort_by_aggregate",
    "s4_head_after_sort",
    "s5_value_counts",
    # Scalar functions.
    "f_string_funcs",
    "f_hash_id",
    "f_date_arithmetic",
    "f_date_format",
    "f_timestamp_parts",
    "f_rounding_math",
    "f_conditional",
    "f_json_extract",
    # Joins / setops / window-functions sample.
    "agg_rollup",
    "agg_cube",
    "j4_range_join",
    "asof_join_events",
    "wf_lag_lead_running",
    "setop_union_distinct",
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
