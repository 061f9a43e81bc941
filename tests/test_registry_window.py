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

# Round-3 rotation: the LLM-data-pipeline suites must be in-window.
ROTATED_SUITES = {
    "dedup": [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "dedup_cc_survivors",
    ],
    "similarity": [
        "sim_bruteforce_topk",
        "sim_ivf_topk",
        "sim_lsh_topk",
        "sim_range_search",
    ],
    "text": [
        "corpus_curation_pipeline",
        "text_stats_quality",
        "text_langid",
        "text_langid_confusion",
        "text_fingerprint",
        "text_token_stats_by_lang",
    ],
    "curation": [
        "decontaminate_holdout",
        "pack_sequences",
        "text_tfidf_terms",
        "text_pii_redact",
        "embed_centroid_stats",
        "profile_length_histogram",
    ],
    "sampling": [
        "split_train_holdout",
        "sample_events_deterministic",
        "agg_distinct_twophase",
        "sample_stratified_balanced",
    ],
    "pipeline_analytics": [
        "funnel_conversion",
        "cohort_retention",
        "tokens_top_terms",
        "text_repetition_signals",
    ],
    "timeseries": [
        "ts_resample_locf",
        "wf_range_frame",
        "ts_ohlc_bars",
        "ts_gap_stats",
        "anomaly_zscore",
        "ts_ewma_exact",
        "scd2_user_state",
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
