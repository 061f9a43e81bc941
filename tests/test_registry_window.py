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

# Round-7 rotation: the 11 entries never driver-signed after r6, the
# two entries upgraded/re-specified this round, and a §2-core re-sign
# block (last signed r1/r2). With this window, cumulative
# distinct-signed = 244/244.
ROTATED_SUITES = {
    "never_signed_oracled": [
        "quality_lm_surprise",
        "quality_domain_calibrated",
        "quality_classifier_eval",
        "mask_span_plan",
        "curation_funnel",
        "decontaminate_span_lengths",
        "profile_source_overlap",
        "dedup_embedding_multiprobe",
    ],
    "never_signed_rows_only": [
        "mm_feature_extract",
        "approx_hll_partials",
        "approx_aggregates",
    ],
    "upgraded_this_round": [
        "w4_wire_roundtrip_dedup",  # rows-only -> golden-fixture hash
        "sim_ivf_kmeans_topk",  # count-derived quantizer re-spec
    ],
    "core_resign": [
        "p1_equality_filter",
        "p2_substring_filter",
        "p3_boolean_rate",
        "p4_set_membership",
        "p5_numeric_threshold",
        "pr1_projection",
        "pr2_derived_columns",
        "pr3_type_casts",
        "pr4_display_format",
        "a1_count",
        "a2_totals",
        "a3_conditional_counts",
        "a4_boolean_mean",
        "a5_derived_ratios",
        "a7_groupby_sum",
        "a9_unpivot_fee_mix",
        "s2_top10_by_aggregate",
        "s3_sort_by_aggregate",
        "s4_head_after_sort",
        "s5_value_counts",
        "f_string_funcs",
        "f_hash_id",
        "f_date_arithmetic",
        "f_date_format",
        "f_timestamp_parts",
        "f_rounding_math",
        "f_conditional",
        "f_json_extract",
        "agg_rollup",
        "agg_cube",
        "j4_range_join",
        "asof_join_events",
        "wf_lag_lead_running",
        "setop_union_distinct",
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
    oracles = registry.all_oracles()
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name in window:
        if name not in oracles:
            # Rows-only entries are never canonicalized — the driver
            # records only spark_rows + err='no_oracle' (CORRECTNESS_r01
            # w4 row), so a complex column can't hash-mismatch. The lint
            # protects the hasher; it doesn't apply here.
            continue
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
