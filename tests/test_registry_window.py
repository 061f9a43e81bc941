"""Certification-window invariants.

The external correctness harness signs the FIRST 50 ``queries()``
entries each round (dict insertion order). These tests pin the window's
composition so a refactor can't silently rotate a suite out of
certification or put an uncanonicalizable output inside the window.
"""

from __future__ import annotations

import pytest

from real_time_streaming_system_with_apache_kafka_spark import registry

WINDOW = 50

# The three §2 sentinels stay driver-signed every round (VERDICT r2 #3).
SENTINELS = ["w1_minute_activity", "q0_snapshot_topk", "j1_star_join_revenue"]

# Round-5 rotation: 47 of the 87 oracled-but-never-driver-signed
# entries (registry.py comment documents the 40-entry r6 spill).
ROTATED_SUITES = {
    "dedup_graph": [
        "dedup_soft_weights",
        "dedup_prefix",
        "dedup_lsh_verified",
        "dedup_lsh_calibration",
        "dedup_quality_survivor",
        "dedup_containment",
        "dedup_passage",
        "dedup_semdedup",
        "dedup_lines_c4",
        "url_canonical_dedup",
        "dedup_substring_spans",
        "dedup_winnowing",
        "er_blocked_matching",
        "graph_pagerank_dupgraph",
        "graph_triangle_count",
        "graph_label_propagation",
        "graph_kcore",
    ],
    "bpe_text": [
        "vocab_bpe_pair_stats",
        "vocab_bpe_learn_merges",
        "tokenize_with_learned_bpe",
        "text_ngram_diversity",
    ],
    "similarity": [
        "sim_pq_topk",
        "sim_prefix_topk",
        "sim_filtered_topk",
        "sim_ivfpq_topk",
        "sim_knn_join",
        "sim_sq8_topk",
        "sim_hard_negatives",
        "sim_ann_recall_eval",
        "embed_pca_power",
        "decontaminate_semantic",
    ],
    "multimodal": ["mm_phash_dedup"],
    "pipeline_analytics": [
        "events_funnel_steps",
        "events_retention_cohorts",
        "basket_pair_lift",
        "customer_rfm_segments",
        "events_active_users_rolling",
        "revenue_concentration_gini",
        "experiment_ab_lift",
        "path_topk_journeys",
        "event_transition_matrix",
        "agg_bitmap_distinct",
        "pivot_status_by_day",
        "stats_robust_mad",
        "skyline_pareto_parts",
        "metrics_bootstrap_ci",
        "ts_vwap_bars",
    ],
}


@pytest.fixture(scope="module")
def window() -> list[str]:
    return list(registry.all_queries())[:WINDOW]


def test_priority_list_is_exactly_the_window(window):
    assert registry._PRIORITY == window
    assert len(set(window)) == WINDOW


def test_sentinels_in_window(window):
    for key in SENTINELS:
        assert key in window, f"sentinel {key} rotated out of the window"


def test_rotated_suites_fully_in_window(window):
    for suite, keys in ROTATED_SUITES.items():
        if suite == "tpch":  # prefix entries: q2_..q22_
            missing = [
                p for p in keys if not any(w.startswith(p) for w in window)
            ]
        else:
            missing = [k for k in keys if k not in window]
        assert not missing, f"{suite} keys outside the window: {missing}"


def test_priority_keys_all_exist():
    # _collect() raises on unknown priority keys; reaching here with the
    # full registry loaded proves every priority key resolves.
    queries = registry.all_queries()
    assert all(k in queries for k in registry._PRIORITY)


def test_no_complex_typed_outputs_in_window(spark, window):
    """Array/map/struct outputs break the harness's pandas canonicalizer
    (CORRECTNESS_r02: f_map_funcs red row) — nothing in the window may
    emit one."""
    queries = registry.all_queries()
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name in window:
        schema = queries[name](spark, sf).schema
        complex_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if f.dataType.simpleString().startswith(("array", "map", "struct"))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, f"complex-typed outputs in window: {offenders}"


def test_no_decimal_outputs_in_window(spark, window):
    """A decimal output column collects as a Python Decimal on the
    Spark side while DuckDB's pandas conversion yields float64 —
    numerically equal, representationally hash-different
    (CORRECTNESS_r02 f_map_funcs, r03 embed_centroid_stats; scale-0
    is no safer: Decimal('123') vs 123.0). Window queries must emit
    fractional values as double, as integer-unit bigint, or as
    decimal(38,0)-cast-to-string (reconcile_checksum's shape) — never
    as a decimal column. Decimal is the right type INSIDE a plan
    (exact sums); it just can't be an output column of a certified
    query."""
    from pyspark.sql.types import DecimalType

    queries = registry.all_queries()
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name in window:
        schema = queries[name](spark, sf).schema
        frac = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if frac:
            offenders[name] = frac
    assert not offenders, f"decimal outputs in window: {offenders}"
