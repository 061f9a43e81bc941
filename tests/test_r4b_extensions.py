"""Invariant tests for the late round-4 operator additions (beyond the
oracle parity every entry already gets in test_oracle_parity.py):
classifier-eval confusion-matrix laws, mixture-drift accounting,
BM25 ranking structure, DSIR feature accounting and target separation,
and the compaction planner's greedy-cut law.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import (
    curation,
    datamix,
    layout,
    retrieval,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def test_classifier_eval_confusion_laws(spark, sf_dir):
    """tp+fp+fn+tn is the corpus size at every threshold; raising the
    threshold can only shrink the predicted-positive set (tp, fp
    non-increasing; fn, tn non-decreasing); recall is non-increasing;
    and the ppm metrics match their defining integer divisions."""
    rows = curation.quality_classifier_eval(spark, sf_dir).collect()
    n_docs = load(spark, "documents", sf_dir).count()
    assert [r["threshold"] for r in rows] == curation.CLS_EVAL_THRESHOLDS
    prev = None
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n_docs
        assert r["precision_ppm"] == r["tp"] * 1_000_000 // max(
            r["tp"] + r["fp"], 1
        )
        assert r["recall_ppm"] == r["tp"] * 1_000_000 // max(
            r["tp"] + r["fn"], 1
        )
        assert r["f1_ppm"] == r["tp"] * 2_000_000 // max(
            2 * r["tp"] + r["fp"] + r["fn"], 1
        )
        if prev is not None:
            assert r["tp"] <= prev["tp"] and r["fp"] <= prev["fp"]
            assert r["fn"] >= prev["fn"] and r["tn"] >= prev["tn"]
            assert r["recall_ppm"] <= prev["recall_ppm"]
        prev = r
    # The grid spans a real curve on this corpus: the lowest threshold
    # predicts (nearly) everything positive, the highest prunes hard.
    assert rows[0]["tp"] + rows[0]["fp"] > rows[-1]["tp"] + rows[-1]["fp"]


def test_mix_drift_accounting(spark, sf_dir):
    """Realized shares sum to ~1e6 (truncation loses < S ppm), chi2
    contributions are non-negative, the weight column equals the
    mix_domain_weights table, and sampled counts never exceed the
    source's document count."""
    rows = datamix.mix_drift_chi2(spark, sf_dir).collect()
    n_sources = len(rows)
    total_realized = sum(r["realized_ppm"] for r in rows)
    assert 1_000_000 - n_sources <= total_realized <= 1_000_000
    for r in rows:
        assert r["chi2_contrib_ppm"] >= 0
        assert r["sampled_docs"] >= 0 and r["obs_tokens"] >= 0

    weights = {
        r["source"]: int(r["weight_ppm"])
        for r in datamix.mix_domain_weights(spark, sf_dir).collect()
    }
    per_source_docs = {
        r["source"]: r["n"]
        for r in load(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["weight_ppm"] == weights[r["source"]]
        assert r["sampled_docs"] <= per_source_docs[r["source"]]


def test_bm25_ranking_structure(spark, sf_dir):
    """Ranks are dense 1..K per query; scores are non-increasing in
    rank (ties broken by doc_id); every hit matches at least one query
    term; and the rare term 'dup' dominates: for the 'dup scan' probe,
    every top-k document actually contains 'dup' (its idf dwarfs the
    uniform-df head terms)."""
    out = retrieval.search_bm25_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in retrieval.BM25_QUERIES}
    for qid, rows in by_q.items():
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= retrieval.BM25_TOPK
        for a, b in zip(rows, rows[1:]):
            assert (a["score_ppm"], -a["doc_id"]) >= (
                b["score_ppm"],
                -b["doc_id"],
            )
        assert all(r["n_terms_hit"] >= 1 for r in rows)

    texts = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load(spark, "documents", sf_dir).collect()
    }
    dup_query = [r for r in out if r["query_id"] == 4]
    assert dup_query and all("dup" in texts[r["doc_id"]] for r in dup_query)


def test_dsir_feature_accounting_and_separation(spark, sf_dir):
    """n_feats equals n_words-1 for every multi-word doc (bigram
    count), and the mean importance of target-language docs exceeds
    the mean of the rest — the separation DSIR exists to produce
    (target docs score target-like by construction)."""
    out = retrieval.dsir_importance(spark, sf_dir)
    docs = load(spark, "documents", sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("nw")
    )
    bad = (
        out.join(docs, "doc_id")
        .filter(F.col("n_feats") != F.col("nw") - 1)
        .count()
    )
    assert bad == 0

    means = {
        r["is_t"]: r["m"]
        for r in out.groupBy(
            (F.col("lang") == retrieval.DSIR_TARGET_LANG).alias("is_t")
        )
        .agg(F.avg("mean_importance_ppm").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_span_lengths_reconcile_with_holdout(spark, sf_dir):
    """The span audit covers exactly the contaminated-doc set the hit
    counter reports, with identical per-doc totals, and every max span
    obeys 1 <= max_span_grams <= n_hit_grams with the word-length
    identity span_words = span_grams + N - 1."""
    spans = {
        r["doc_id"]: r
        for r in curation.decontaminate_span_lengths(spark, sf_dir).collect()
    }
    hold = {
        r["doc_id"]: r
        for r in curation.decontaminate_holdout(spark, sf_dir).collect()
    }
    assert set(spans) == set(hold)
    for doc_id, r in spans.items():
        assert r["n_hit_grams"] == hold[doc_id]["n_hit_grams"]
        # holdout counts DISTINCT grams; the span pass counts
        # positional grams, so totals can only be >=.
        assert r["n_grams"] >= hold[doc_id]["n_grams"]
        assert 1 <= r["max_span_grams"] <= r["n_hit_grams"]
        assert r["max_span_words"] == r["max_span_grams"] + curation.DECON_N - 1


def test_source_overlap_matrix_laws(spark, sf_dir):
    """Pairs are ordered (a < b), shared counts never exceed either
    side's digest total, the Jaccard matches its defining integer
    division, and the matrix is consistent with an independent
    per-source fingerprint recount."""
    rows = curation.profile_source_overlap(spark, sf_dir).collect()
    assert rows, "fixture has cross-source near-dup fingerprints"
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    per_source = {
        r["source"]: r["n"]
        for r in load(spark, "documents", sf_dir)
        .select(fp.alias("d"), "source")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["n_a"] == per_source[r["source_a"]]
        assert r["n_b"] == per_source[r["source_b"]]
        assert 1 <= r["n_shared"] <= min(r["n_a"], r["n_b"])
        assert r["jaccard_ppm"] == r["n_shared"] * 1_000_000 // (
            r["n_a"] + r["n_b"] - r["n_shared"]
        )


def test_embed_outlier_scores_against_numpy(spark, sf_dir):
    """Structural laws (dense ranks per label, non-increasing scores,
    share sum bounded by 1e6) plus an independent numpy recomputation
    of the full per-label ranking on the quantized integers — the
    whole n^2*dist2 arithmetic is re-derived outside Spark/DuckDB."""
    from decimal import ROUND_HALF_UP, Decimal

    out = curation.embed_outlier_scores(spark, sf_dir).collect()
    by_label: dict[int, list] = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    for label, rows in by_label.items():
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= curation.OUTLIER_TOPK
        vals = [int(r["dist2_n2_e14"]) for r in rows]
        assert vals == sorted(vals, reverse=True) or all(
            a > b or (a == b and x["vec_id"] < y["vec_id"])
            for (a, x), (b, y) in zip(zip(vals, rows), zip(vals[1:], rows[1:]))
        )
        assert sum(r["share_ppm"] for r in rows) <= 1_000_000

    emb = load(spark, "embeddings", sf_dir).collect()
    labels = sorted({r["label"] for r in emb})
    check_label = labels[0]
    # Quantize exactly as the engines do: double -> shortest decimal
    # repr -> HALF_UP at 7 dp (Spark's cast to decimal(18,7) goes via
    # BigDecimal.valueOf == Double.toString == Python repr).
    def quant(v: float) -> int:
        return int(
            Decimal(repr(v)).quantize(
                Decimal("1e-7"), rounding=ROUND_HALF_UP
            )
            * 10_000_000
        )

    q = {
        r["vec_id"]: [quant(v) for v in r["embedding"]]
        for r in emb
        if r["label"] == check_label
    }
    n = len(q)
    dims = len(next(iter(q.values())))
    s = [sum(x[p] for x in q.values()) for p in range(dims)]
    dist2 = {
        vid: sum((n * x[p] - s[p]) ** 2 for p in range(dims))
        for vid, x in q.items()
    }
    expect = sorted(dist2.items(), key=lambda kv: (-kv[1], kv[0]))[
        : curation.OUTLIER_TOPK
    ]
    got = [
        (r["vec_id"], int(r["dist2_n2_e14"]))
        for r in by_label[check_label]
    ]
    assert got == expect


def test_compaction_plan_greedy_cut_law(spark, sf_dir):
    """Within each partition: prefix sums are consistent (each row's
    cum_bytes_before is the previous row's cum + bytes), the bin is
    exactly cum div target, bins are non-decreasing in file order, and
    every bin break is justified — the previous bin's running total
    crossed the target."""
    rows = layout.layout_compaction_plan(spark, sf_dir).collect()
    t = layout.COMPACT_TARGET_BYTES
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r["partition_day"], []).append(r)
    for day, frows in by_day.items():
        cum = 0
        prev_bin = 0
        for r in frows:
            assert r["cum_bytes_before"] == cum, (day, r["file_id"])
            assert r["target_bin"] == cum // t
            assert r["target_bin"] >= prev_bin
            prev_bin = r["target_bin"]
            cum += r["bytes"]
        # At sf0.01 every day has enough micro-batch files to need
        # at least one cut — the planner is exercised, not vacuous.
        assert prev_bin >= 1
