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
# Round-7 closed the certification ledger at 243/244 distinct-signed:
# 241 hash-green at least once, 2 rows-only witnessed (the approx
# sketches), and mm_feature_extract CRASHED the driver's canonicalizer
# (array<double> output -> unhashable ndarray; CORRECTNESS_r07
# spark_rows: null) — the one entry with zero driver evidence.
#
# Round-8 rotation signed all 50 of its rows (CORRECTNESS_r08: 50/50
# hash-green, zero err — the ledger closed at 244/244 cumulatively
# distinct-signed).
#
# Round-9 rotation: (a) every entry whose PLAN or SCHEMA changed this
# round gets a fresh signature — approx_hll_partials (merge tolerance
# re-derived from the estimator RSE; boolean column renamed
# merge_within_rse), mm_feature_extract (empty-doc-safe oracle), the
# four retrieval entries (corpus-statistics memo replaced the totals/
# df aggregations and the PRF mining checkpoints), and the sixteen
# operators whose localCheckpoint leak was fixed at the source
# (checkpoint_result / exit unpersist — values identical, plans not);
# (b) the remaining 25 slots take the stalest signatures: the whole
# r2-signed cohort (8), both r3-signed stream windows, and the first
# 15 of the 46-entry r4 cohort (TPC-H q2-q16). The r4 remainder
# (q17-q22 + datamix/skew/layout/extras, 31 entries) is the r10
# cohort — registry history above tracks it.
#
# r9 restart addendum: the extra-session perf work changed three more
# plans — basket_pair_lift (pattern-histogram-derived supports, one
# corpus pass), dedup_winnowing (checkpointed winnowed set + hub
# anti-join), and metrics_bootstrap_ci (whose DRAWS changed: boot_v2
# packs 4 replicas per md5, so its values and oracle moved together —
# the one entry whose fresh signature is mandatory, not hygiene).
# They took the last three r9 slots; the r9 session-3 rewrites
# (dedup_substring_spans, decontaminate_semantic, quality_lm_surprise)
# displaced q11-q13 into the r10 cohort.
#
# Round-10 rotation (optimization round 2): (a) every entry whose
# PLAN changed this round gets a fresh signature — embed_pca_power
# (per-round corpus jobs -> one exact Gram pass + driver matvecs),
# decontaminate_semantic (score-once-per-pair set dedup),
# dedup_winnowing (array-local fingerprint selection) — values
# verified identical against the full 244-oracle parity run each
# batch; (b) the r4 remainder takes its long-scheduled turn — TPC-H
# q11-q22 + the datamix/skew/layout/extras cohort, 37 entries, the
# stalest signatures on the ledger (signed r4, never since); (c) the
# 7 remaining slots start on the r5-signed cohort (alphabetical
# order, next 24 are the r11 cohort if rotation continues).
_PRIORITY: list[str] = [
    # §2 sentinels — pinned every round.
    "w1_minute_activity",
    "q0_snapshot_topk",
    "j1_star_join_revenue",
    # Plans changed this round (r10 optimization rewrites).
    "embed_pca_power",
    "decontaminate_semantic",
    "dedup_winnowing",
    # r4-signed cohort, part 2 of 2: TPC-H q11-q22.
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
    # r4-signed cohort: datamix / skew / layout / extras remainder.
    "agg_grouping_sets",
    "agg_mode_exact",
    "agg_quartiles_exact",
    "agg_salted_skew",
    "agg_stats_moments",
    "dedup_cross_source",
    "dedup_incremental_ingest",
    "embed_centroid_stats",
    "f_regexp_funcs",
    "f_variant_funcs",
    "feature_quantile_bucketize",
    "j7_full_outer_reconcile",
    "j8_bucketed_join",
    "join_salted_skew",
    "layout_zorder_events",
    "mix_domain_weights",
    "mix_epoch_repeats",
    "mix_temperature_weights",
    "reconcile_checksum",
    "sample_token_budget",
    "sql_api_snapshot",
    "w11_minute_distinct_users",
    "w9_cascaded_rollup",
    "wf_first_last_nth",
    "wf_share_of_total",
    # Stalest after the r4 cohort: first 7 of the r5-signed batch.
    "agg_bitmap_distinct",
    "customer_rfm_segments",
    "dedup_lines_c4",
    "dedup_lsh_calibration",
    "dedup_passage",
    "dedup_prefix",
    "dedup_quality_survivor",
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
