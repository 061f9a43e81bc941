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


def _fingerprints(spark, sf_dir):
    """(source, fingerprint-digest) python twin of the operators'
    sorted-distinct-words md5 (profile_source_overlap's shape)."""
    import hashlib

    rows = (
        load(spark, "documents", sf_dir)
        .select("source", "text")
        .collect()
    )
    out = []
    for r in rows:
        fp = " ".join(sorted(set(r["text"].split(" "))))
        out.append(
            (r["source"], hashlib.md5(fp.encode()).hexdigest())
        )
    return out


def test_hll_python_reimpl_and_merge_law(spark, sf_dir):
    """Full python reimplementation of the HLL audit — registers,
    scaled harmonic sum, integer estimate, error ppm — matches every
    row, and the ALL row's registers equal the element-wise MAX of
    the per-source registers (the union-merge law that makes the
    sketch distributable)."""
    import hashlib

    M, RMAX = sketches.HLL_M, sketches.HLL_RHO_MAX
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    for source, digest in _fingerprints(spark, sf_dir):
        h = int(
            hashlib.md5(
                f"{sketches.HLL_TAG}#{digest}".encode()
            ).hexdigest()[:8],
            16,
        )
        bucket, w = h % M, h // M
        rho = RMAX - w.bit_length() if w else RMAX
        for key in (source, "ALL"):
            regs.setdefault(key, {})
            regs[key][bucket] = max(regs[key].get(bucket, 0), rho)
            exact.setdefault(key, set()).add(digest)

    def est(r: dict[int, int]) -> int:
        s = sum(1 << (RMAX - m) for m in r.values())
        s += (M - len(r)) * (1 << RMAX)
        return sketches._HLL_EST_NUM // (sketches.HLL_ALPHA_DEN * s)

    got = {
        r["src"]: r
        for r in sketches.sketch_hll_distinct(spark, sf_dir).collect()
    }
    assert set(got) == set(regs)
    for src, r in regs.items():
        row = got[src]
        e, n = est(r), len(exact[src])
        assert row["exact_distinct"] == n
        assert row["est_hll"] == e
        d = (e - n) * 1000000
        assert row["err_ppm"] == (
            d // n if d >= 0 else -((-d) // n)
        )
        assert row["n_zero_regs"] == M - len(r)
        assert row["max_rho"] == max(r.values())
    # Merge law: ALL registers == element-wise max of source registers.
    merged: dict[int, int] = {}
    for src, r in regs.items():
        if src == "ALL":
            continue
        for b, m in r.items():
            merged[b] = max(merged.get(b, 0), m)
    assert merged == regs["ALL"]
    assert got["ALL"]["est_hll"] == est(merged)


def test_kmv_python_reimpl_and_bounds(spark, sf_dir):
    """Full python reimplementation of the KMV overlap matrix: every
    pair's union-sketch size, match count, estimated and exact
    Jaccard ppm, and signed error agree; matches <= ku <= K; every
    source pair is present."""
    import hashlib
    from itertools import combinations

    K = sketches.KMV_K
    hashes: dict[str, set] = {}
    digests: dict[str, set] = {}
    for source, digest in _fingerprints(spark, sf_dir):
        h = int(
            hashlib.md5(
                f"{sketches.KMV_TAG}#{digest}".encode()
            ).hexdigest()[:8],
            16,
        )
        hashes.setdefault(source, set()).add(h)
        digests.setdefault(source, set()).add(digest)
    sketch = {s: set(sorted(v)[:K]) for s, v in hashes.items()}
    got = {
        (r["source_a"], r["source_b"]): r
        for r in sketches.sketch_kmv_overlap(spark, sf_dir).collect()
    }
    expected_pairs = set(combinations(sorted(sketch), 2))
    assert set(got) == expected_pairs
    for a, b in expected_pairs:
        row = got[(a, b)]
        union_k = sorted(sketch[a] | sketch[b])[:K]
        ku = len(union_k)
        matches = sum(
            1 for h in union_k if h in sketch[a] and h in sketch[b]
        )
        inter = len(digests[a] & digests[b])
        exact_ppm = (
            inter * 1000000 // (len(digests[a]) + len(digests[b]) - inter)
        )
        assert row["ku"] == ku
        assert row["matches"] == matches
        assert 0 <= matches <= ku <= K
        assert row["jaccard_est_ppm"] == matches * 1000000 // ku
        assert row["jaccard_exact_ppm"] == exact_ppm
        assert row["err_ppm"] == row["jaccard_est_ppm"] - exact_ppm
