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

# Round-9 rotation: every entry whose plan or schema changed this
# round (the approx-sketch RSE re-derivation, the empty-doc-safe
# mm_feature_extract oracle, the retrieval corpus-statistics memo, and
# the checkpoint-release family), plus the stalest signatures — the
# whole r2-signed cohort, both r3-signed stream windows, and TPC-H
# q2-q16 from the r4 cohort (q17-q22 + datamix/skew/layout/extras are
# the r10 cohort; registry.py documents the history).
ROTATED_SUITES = {
    "changed_this_round": [
        "approx_hll_partials",
        "mm_feature_extract",
        "search_bm25_topk",
        "search_prf_expand",
        "search_hybrid_rrf",
        "search_mmr_diversify",
        "stats_ks_drift",
        "sketch_kmv_overlap",
        "embed_pca_power",
        "sim_sq8_topk",
        "mm_phash_dedup",
        "revenue_concentration_gini",
        "layout_zonemap_skipping",
        "stats_robust_mad",
        "dedup_cc_survivors",
        "sample_cluster_safe_split",
        "graph_pagerank_dupgraph",
        "graph_triangle_count",
        "graph_label_propagation",
        "graph_kcore",
        "dedup_lsh_verified",
        "dedup_containment",
        # r9 restart: extra-session perf rewrites (the bootstrap's
        # DRAWS moved to boot_v2, so its values/oracle changed too).
        "metrics_bootstrap_ci",
        "basket_pair_lift",
        "dedup_winnowing",
    ],
    "r2_resign": [
        "agg_distinct_count",
        "agg_percentiles",
        "j2_semi_join",
        "j3_anti_join",
        "j5_topk_per_group",
        "j6_outer_join_coverage",
        "setop_intersect",
        "setop_except",
    ],
    "r3_stream_windows": [
        "w1_tumbling_window",
        "w6_sliding_window",
    ],
    # prefix-matched in the test: TPC-H q2..q10 of the r4 cohort
    # (q11-q16 yielded their slots to the r9-session-3 rewrites and
    # join the r10 cohort with the rest of the r4 remainder).
    "tpch": [f"q{i}_" for i in range(2, 11)],
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
    emit one. NO rows-only exemption: r7 proved the driver sorts EVERY
    windowed result through pandas before recording even spark_rows
    (mm_feature_extract's array<double> died in sort_values with
    'unhashable type: numpy.ndarray' and got a null-rows crash row), so
    the lint applies to oracled and rows-only entries alike."""
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
    oracles = registry.all_oracles()
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name in window:
        if name not in oracles:  # rows-only: never canonicalized
            continue
        schema = queries[name](spark, sf).schema
        frac = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if frac:
            offenders[name] = frac
    assert not offenders, f"decimal outputs in window: {offenders}"
