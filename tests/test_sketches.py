"""Invariant tests for the sketch operators (beyond oracle parity):
the count-min one-sided guarantee and its exact-count cross-check, the
Bloom pre-filter's no-false-negative law against the exact
decontamination pass, and VWAP's weighted-mean laws against the OHLC
bars built from the same rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import (
    curation,
    sketches,
    timeseries,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def test_cms_one_sided_and_exact_counts(spark, sf_dir):
    """CMS never undercounts (est >= exact for every audited term),
    the overcount column is est - exact, exact counts match an
    independent token count, ranks follow (count desc, term asc), and
    the demo-sized width actually produces collisions to audit."""
    rows = sketches.sketch_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == sketches.CMS_TOP_N
    exact = {
        r["term"]: r["cnt"]
        for r in load(spark, "documents", sf_dir)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    keys = sorted(
        exact.items(), key=lambda kv: (-kv[1], kv[0])
    )[: sketches.CMS_TOP_N]
    assert [(r["term"], r["exact_cnt"]) for r in rows] == keys
    assert [r["rk"] for r in rows] == list(
        range(1, sketches.CMS_TOP_N + 1)
    )
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"]
        assert r["overcount"] == r["est_cnt"] - r["exact_cnt"]
    # Width 16 over a 31-term vocabulary: collisions are guaranteed,
    # so the audit has something to measure.
    assert any(r["overcount"] > 0 for r in rows)


def test_bloom_no_false_negatives_vs_exact_decon(spark, sf_dir):
    """Every document the exact decontamination pass flags appears in
    the bloom audit with its full hit count intact (a bloom has no
    false negatives), per-doc accounting splits bloom positives into
    true hits + false positives, and gram totals agree with the exact
    pass."""
    bloom = {
        r["doc_id"]: r
        for r in sketches.sketch_bloom_decontaminate(
            spark, sf_dir
        ).collect()
    }
    exact = {
        r["doc_id"]: r
        for r in curation.decontaminate_holdout(spark, sf_dir).collect()
    }
    assert exact, "fixture must contain contaminated docs"
    for doc_id, e in exact.items():
        b = bloom[doc_id]  # no false negatives: flagged docs present
        assert b["n_true_hit_grams"] == e["n_hit_grams"]
        assert b["n_grams"] == e["n_grams"]
    for b in bloom.values():
        assert (
            b["n_bloom_hit_grams"]
            == b["n_true_hit_grams"] + b["n_false_pos_grams"]
        )
        assert b["n_bloom_hit_grams"] > 0
    # The pre-filter is selective: far fewer docs pay the exact join
    # than exist in the training slice.
    n_train = (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % sketches.BLOOM_MOD != 0)
        .count()
    )
    assert len(bloom) < n_train // 4


def test_vwap_weighted_mean_laws(spark, sf_dir):
    """VWAP lies within the bar's [low, high] price range (weighted
    means cannot escape their support), trade counts reconcile with
    the OHLC bars built from the same rows, and a python-decimal
    recomputation of one dense bar matches exactly."""
    vwap = {
        (r["event_type"], r["bar_hour"]): r
        for r in timeseries.ts_vwap_bars(spark, sf_dir).collect()
    }
    ohlc = {
        (r["event_type"], r["bar_hour"]): r
        for r in timeseries.ts_ohlc_bars(spark, sf_dir).collect()
    }
    assert set(vwap) == set(ohlc)
    for key, v in vwap.items():
        o = ohlc[key]
        assert v["n_trades"] == o["n_trades"]
        if v["total_size"] > 0:
            lo = int(round(o["low"] * 100))
            hi = int(round(o["high"] * 100))
            assert lo <= v["vwap_cents"] <= hi
    # Exact recomputation of the densest bar.
    et, hour = max(vwap, key=lambda k: vwap[k]["n_trades"])
    raw = (
        load(spark, "events", sf_dir)
        .filter(
            (F.col("event_type") == et)
            & (F.date_trunc("hour", "ts") == hour)
        )
        .select(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("px"),
            F.get_json_object("props", "$.k").cast("long").alias("sz"),
        )
        .collect()
    )
    notional = sum(r["px"] * r["sz"] for r in raw)
    size = sum(r["sz"] for r in raw)
    v = vwap[(et, hour)]
    assert v["total_size"] == size
    assert v["vwap_cents"] == notional // max(size, 1)
    assert v["notional_whole"] == notional // 100
