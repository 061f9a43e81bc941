"""Invariant tests for the round-4 operator additions (beyond the
oracle parity every entry already gets in test_oracle_parity.py):
C4 line dedup's conservation/reconstruction laws, the PCA projection's
centering identity, URL canonicalization idempotence, and the Markov
matrix's stochastic-closure property.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import (
    dedup,
    pipeline_analytics,
    similarity,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def test_lines_c4_conserves_and_reconstructs(spark, sf_dir):
    """Every doc appears exactly once; kept+dropped lines equal the
    split count; a doc with zero drops reconstructs its text verbatim
    (proves the order-preserving rebuild end to end); corpus-wide,
    each distinct line loses all but one occurrence."""
    out = dedup.dedup_lines_c4(spark, sf_dir)
    docs = load(spark, "documents", sf_dir)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == docs.count()

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    n_intact = 0
    for doc_id, r in rows.items():
        assert 0 <= r["n_dropped"] <= r["n_lines"]
        if r["n_dropped"] == 0:
            assert r["cleaned_text"] == texts[doc_id], doc_id
            n_intact += 1
    assert n_intact > 0  # fixture has unique docs too

    # Conservation: total kept lines == number of DISTINCT lines
    # (keep-first semantics retains exactly one copy of each).
    words = F.split("text", " ")
    n_lines = F.ceil(F.size(words) / dedup.PASSAGE_WORDS).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(words, i * dedup.PASSAGE_WORDS + 1, dedup.PASSAGE_WORDS),
            " ",
        ),
    )
    exploded = docs.select(F.explode(lines).alias("line"))
    n_distinct = exploded.distinct().count()
    kept_total = out.agg(
        F.sum(F.col("n_lines") - F.col("n_dropped"))
    ).collect()[0][0]
    assert kept_total == n_distinct


def test_pca_projections_sum_to_zero(spark, sf_dir):
    """The projection is onto a direction of the CENTERED matrix:
    sum_i proj_i = v . sum_i y_i = v . 0 = 0 exactly — an integer
    identity, so the string-encoded units must sum to exactly zero."""
    out = similarity.embed_pca_power(spark, sf_dir).collect()
    assert len(out) > 0
    total = sum(int(r["proj_units"]) for r in out)
    assert total == 0
    # Degenerate-corpus guard aside, the direction must carry signal:
    # at least one nonzero projection.
    assert any(int(r["proj_units"]) != 0 for r in out)


def test_pca_direction_is_stable_under_partitioning(spark, sf_dir):
    """Same projections whatever the parallelism — the decimal-exact
    accumulators make the power iteration partitioning-independent."""
    a = {
        r["vec_id"]: r["proj_units"]
        for r in similarity.embed_pca_power(spark, sf_dir).collect()
    }
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {
            r["vec_id"]: r["proj_units"]
            for r in similarity.embed_pca_power(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_url_canonicalization_idempotent_and_tracking_free(spark, sf_dir):
    out = dedup.url_canonical_dedup(spark, sf_dir)
    rows = out.collect()
    docs_total = load(spark, "documents", sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == docs_total
    assert any(r["n_docs"] > 1 for r in rows)  # canonicalization merges
    for r in rows:
        url = r["canonical_url"]
        assert url == url.lower()
        assert "#" not in url and "utm_" not in url and "ref=" not in url
        assert "://www." not in url
        assert not url.endswith(("?", "&"))


def test_domain_calibration_keeps_top_fraction_everywhere(spark, sf_dir):
    """Every source is represented; kept fraction per source is the
    configured top fraction within quantization (ranks are unique, so
    keep-count = ceil-ish of frac * n); pct_rank bounded in [0, 1]."""
    from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
        CALIB_TOP_FRAC,
        quality_domain_calibrated,
    )

    out = quality_domain_calibrated(spark, sf_dir)
    per_src = (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if("keep").alias("n_keep"),
            F.min("pct_rank").alias("lo"),
            F.max("pct_rank").alias("hi"),
        )
        .collect()
    )
    n_sources = (
        load(spark, "documents", sf_dir).select("source").distinct().count()
    )
    assert len(per_src) == n_sources
    for r in per_src:
        assert 0.0 <= r["lo"] and r["hi"] <= 1.0
        # unique ordering => kept = #{ranks with (rank-1)/(n-1) < frac }
        expected = sum(
            1 for k in range(r["n"]) if k / max(r["n"] - 1, 1) < CALIB_TOP_FRAC
        )
        assert r["n_keep"] == expected, r


def test_mask_span_plan_spans_are_valid_slices(spark, sf_dir):
    from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
        MASK_SPAN,
        mask_span_plan,
    )

    plan = mask_span_plan(spark, sf_dir)
    texts = {
        r["doc_id"]: r["text"].split(" ")
        for r in load(spark, "documents", sf_dir).collect()
    }
    rows = plan.collect()
    assert rows, "threshold should select some spans"
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        words = texts[r["doc_id"]]
        assert 0 <= r["span_start"] < len(words)
        assert 1 <= r["span_len"] <= MASK_SPAN
        assert r["span_len"] == min(MASK_SPAN, len(words) - r["span_start"])
        assert r["masked_text"] == " ".join(
            words[r["span_start"] : r["span_start"] + MASK_SPAN]
        )
        per_doc.setdefault(r["doc_id"], []).append(r["sentinel_id"])
    for doc_id, sentinels in per_doc.items():
        assert sorted(sentinels) == list(range(len(sentinels))), doc_id
    # ~5% of positions start a span (13/256); allow generous slack.
    n_positions = sum(len(w) for w in texts.values())
    frac = len(rows) / n_positions
    assert 0.02 < frac < 0.10, frac


def test_hard_negatives_are_cross_label_and_bounded(spark, sf_dir):
    """Structure: rank dense per anchor, negatives from a different
    label than the anchor, and no mined negative can beat the
    exhaustive best cross-label cosine (LSH candidates are a subset
    of all cross-label pairs)."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.arrays import (
        cosine,
    )
    from real_time_streaming_system_with_apache_kafka_spark.operators.similarity import (
        EMBEDDING_DIM,
        HARD_NEG_K,
        N_QUERIES,
        sim_hard_negatives,
    )

    out = sim_hard_negatives(spark, sf_dir).collect()
    assert out
    emb = load(spark, "embeddings", sf_dir).filter(
        F.size("embedding") == EMBEDDING_DIM
    )
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    per_q: dict[int, list[int]] = {}
    for r in out:
        assert r["neg_label"] == labels[r["neighbor_id"]]
        assert r["neg_label"] != labels[r["query_id"]]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= HARD_NEG_K
    # Exhaustive cross-label ceiling per anchor.
    a = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("ql"),
        F.col("embedding").alias("qe"),
    )
    b = emb.select(
        F.col("label").alias("nl"), F.col("embedding").alias("ne")
    )
    best = (
        a.crossJoin(b)
        .filter(F.col("ql") != F.col("nl"))
        .withColumn("cos", cosine(F.col("qe"), F.col("ne")))
        .groupBy("query_id")
        .agg(F.max("cos").alias("best"))
    )
    ceiling = {r["query_id"]: r["best"] for r in best.collect()}
    for r in out:
        assert r["cos"] <= ceiling[r["query_id"]] + 1e-12


def test_transition_matrix_is_stochastic_closure(spark, sf_dir):
    """Shares sum to 1 over the whole matrix; counts equal
    (total events - distinct users), the lag-pair identity."""
    out = pipeline_analytics.event_transition_matrix(spark, sf_dir)
    rows = out.collect()
    ev = load(spark, "events", sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9


def test_curation_funnel_stage_monotonicity(spark, sf_dir):
    """Each stage can only shrink: n_unique <= n_quality <= n_raw per
    source; raw totals reconcile with the corpus; survival_rate is the
    n_unique/n_raw ratio."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import curation

    rows = curation.curation_funnel(spark, sf_dir).collect()
    assert rows
    n_docs = load(spark, "documents", sf_dir).count()
    assert sum(r["n_raw"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_unique"] <= r["n_quality"] <= r["n_raw"]
        assert abs(r["survival_rate"] - r["n_unique"] / r["n_raw"]) < 1e-12


def test_quality_survivor_one_per_component_and_maximal(spark, sf_dir):
    """Exactly one survivor per component, and no member of the
    component strictly beats it on (quality_score, n_chars, -doc_id).
    Components must agree with dedup_cc_survivors'."""
    out = dedup.dedup_quality_survivor(spark, sf_dir).collect()
    cc = {
        r["doc_id"]: r["component"]
        for r in dedup.dedup_cc_survivors(spark, sf_dir).collect()
    }
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load(spark, "documents", sf_dir).select("doc_id", "n_chars").collect()
    }
    by_comp: dict[int, list] = {}
    for r in out:
        assert cc[r["doc_id"]] == r["component"]
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        survivors = [m for m in members if m["is_survivor"]]
        assert len(survivors) == 1
        key = lambda m: (-m["quality_score"], -chars[m["doc_id"]], m["doc_id"])  # noqa: E731
        assert min(members, key=key)["doc_id"] == survivors[0]["doc_id"]


def test_bpe_pair_stats_ranking_and_shape(spark, sf_dir):
    """Pairs are 2-char substrings, ranking is (weight desc, pair asc),
    and a hand-computed weight for the top pair matches a direct
    recount over the corpus."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import text as t

    rows = t.vocab_bpe_pair_stats(spark, sf_dir).collect()
    assert len(rows) == t.BPE_TOP_PAIRS
    keys = [(-r["weight"], r["pair"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert len(r["pair"]) == 2 and r["n_vocab_words"] >= 1
    # Direct recount of the top pair: occurrences of the pair across
    # all word instances (overlapping positions included).
    top = rows[0]["pair"]
    docs = load(spark, "documents", sf_dir)
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    recount = words.select(
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.length("w") - 1, F.lit(0))),
                lambda i: F.col("w").substr(i, F.lit(2)) == F.lit(top),
            )
        ).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    assert recount == rows[0]["weight"]


def test_lsh_calibration_reconciles_with_verified(spark, sf_dir):
    """Per-level counts are sane and the true-positive total equals
    the verified pair count — the calibration table and the two-stage
    verify can never tell different stories."""
    rows = dedup.dedup_lsh_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_true"] <= r["n_pairs"]
        assert abs(r["precision"] - r["n_true"] / r["n_pairs"]) < 1e-12
        assert 0 <= r["n_agree"] <= dedup.N_HASHES
    n_verified = dedup.dedup_lsh_verified(spark, sf_dir).count()
    assert sum(r["n_true"] for r in rows) == n_verified


def test_curriculum_order_dense_and_stage_sorted(spark, sf_dir):
    """curriculum_pos is a dense permutation 0..N-1 and stage is
    non-increasing along it (quality-first); within a stage the order
    matches the seeded hash."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import sampling

    rows = sorted(
        sampling.sample_curriculum_order(spark, sf_dir).collect(),
        key=lambda r: r["curriculum_pos"],
    )
    n = load(spark, "documents", sf_dir).count()
    assert [r["curriculum_pos"] for r in rows] == list(range(n))
    stages = [r["stage"] for r in rows]
    assert stages == sorted(stages, reverse=True)


def _ref_bpe(vocab: dict, rounds: int):
    """Pure-Python reference BPE with the operator's exact conventions:
    symbols ride as chars (merge r -> chr(0xE000+r)), winner ties break
    on the pair string, merging is str.replace (greedy left-to-right
    non-overlapping — the same algorithm in the JVM and DuckDB)."""
    expand: dict = {}
    merges = []
    cur = dict(vocab)
    for r in range(rounds):
        w: dict = {}
        for word, f in cur.items():
            for i in range(len(word) - 1):
                p = word[i : i + 2]
                w[p] = w.get(p, 0) + f
        if not w:
            break
        pair = min(w, key=lambda p: (-w[p], p))
        sent = chr(0xE000 + r)
        left = expand.get(pair[0], pair[0])
        right = expand.get(pair[1], pair[1])
        expand[sent] = left + right
        merges.append((r + 1, left, right, w[pair]))
        nxt: dict = {}
        for word, f in cur.items():
            w2 = word.replace(pair, sent)
            nxt[w2] = nxt.get(w2, 0) + f
        cur = nxt
    return merges


def test_bpe_learn_merges_matches_reference(spark, sf_dir):
    """The distributed training loop equals a sequential reference BPE
    over the same vocabulary, on the real corpus AND on a crafted
    vocabulary that forces a merged symbol into the round-2 winner
    (exercising sentinel expansion)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import text as t

    vocab_rows = (
        load(spark, "documents", sf_dir)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    vocab = {r["word"]: r["freq"] for r in vocab_rows}
    got = sorted(map(tuple, t.vocab_bpe_learn_merges(spark, sf_dir).collect()))
    assert got == _ref_bpe(vocab, t.BPE_MERGE_ROUNDS)

    crafted = spark.createDataFrame(
        [("abc", 100), ("ab", 10)], "word string, freq bigint"
    )
    got2 = sorted(map(tuple, t.learn_merges(crafted, 2).collect()))
    assert got2 == [(1, "a", "b", 110), (2, "ab", "c", 100)]
    assert got2 == _ref_bpe({"abc": 100, "ab": 10}, 2)


def test_bpe_pair_stats_agrees_with_training_round_one(spark, sf_dir):
    """The single-iteration ranking operator and round 1 of the
    training loop must crown the same merge with the same weight."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import text as t

    top = t.vocab_bpe_pair_stats(spark, sf_dir).collect()[0]
    first = (
        t.vocab_bpe_learn_merges(spark, sf_dir)
        .filter(F.col("merge_rank") == 1)
        .collect()[0]
    )
    assert first["merge_left"] + first["merge_right"] == top["pair"]
    assert first["weight"] == top["weight"]


def test_tokenize_apply_compression_law(spark, sf_dir):
    """Applying the learned merges can only shrink: after <= before per
    doc; corpus-wide shrinkage equals a sequential reference replay of
    the replace chain EXACTLY, and is bounded above by the published
    weights (weights count OVERLAPPING pair positions, replace merges
    non-overlapping left-to-right, so equality holds only when no
    winner self-overlaps — e.g. 'aa' inside 'aaa' scores 2 but saves 1)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import text as t

    rows = t.tokenize_with_learned_bpe(spark, sf_dir).collect()
    assert rows
    n_docs = load(spark, "documents", sf_dir).count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 < r["n_symbols_after"] <= r["n_symbols_before"]
        assert abs(
            r["compression"] - r["n_symbols_after"] / r["n_symbols_before"]
        ) < 1e-12
    vocab = {
        r["word"]: r["freq"]
        for r in (
            load(spark, "documents", sf_dir)
            .select(F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
            .collect()
        )
    }
    expected_saved, cur = 0, dict(vocab)
    for r_i in range(t.BPE_MERGE_ROUNDS):
        w: dict = {}
        for word, f in cur.items():
            for i in range(len(word) - 1):
                pair = word[i : i + 2]
                w[pair] = w.get(pair, 0) + f
        if not w:
            break
        pair = min(w, key=lambda pp: (-w[pp], pp))
        sent = chr(0xE000 + r_i)
        nxt: dict = {}
        for word, f in cur.items():
            w2 = word.replace(pair, sent)
            expected_saved += f * (len(word) - len(w2))
            nxt[w2] = nxt.get(w2, 0) + f
        cur = nxt
    merges = t.vocab_bpe_learn_merges(spark, sf_dir).collect()
    saved = sum(r["n_symbols_before"] - r["n_symbols_after"] for r in rows)
    assert saved == expected_saved
    assert saved <= sum(m["weight"] for m in merges)


def test_ann_recall_eval_reconciles_with_overlap(spark, sf_dir):
    """Per-query recall equals the measured top-K overlap between the
    index and the brute-force truth, computed independently here."""
    rows = similarity.sim_ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) == similarity.N_QUERIES
    truth: dict[int, set] = {}
    for r in similarity.sim_bruteforce_topk(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set] = {}
    for r in similarity.sim_lsh_topk(spark, sf_dir).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in rows:
        inter = len(truth[r["query_id"]] & got.get(r["query_id"], set()))
        assert r["n_hits"] == inter
        assert abs(r["recall"] - inter / similarity.TOP_K) < 1e-12


def test_anneal_schedule_budget_laws(spark, sf_dir):
    """Phase targets respect the budget split: each phase's targets sum
    to its budget minus sub-n_sources truncation loss; quality tokens
    never exceed source tokens; anneal targets are ordered like the
    quality-token pool."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import datamix

    rows = datamix.mix_anneal_schedule(spark, sf_dir).collect()
    srcs = {r["source"] for r in rows}
    total = sum(r["source_tokens"] for r in rows if r["phase"] == "main")
    budget = datamix.BUDGET_MULT * total
    main_b = budget * (100 - datamix.ANNEAL_PCT) // 100
    anneal_b = budget - main_b
    for phase, phase_budget in [("main", main_b), ("anneal", anneal_b)]:
        got = sum(r["target_tokens"] for r in rows if r["phase"] == phase)
        assert phase_budget - len(srcs) < got <= phase_budget
    by_src = {(r["phase"], r["source"]): r for r in rows}
    for s in srcs:
        r = by_src[("anneal", s)]
        assert 0 <= r["quality_tokens"] <= r["source_tokens"]
    ann = sorted(
        (r for r in rows if r["phase"] == "anneal"),
        key=lambda r: r["quality_tokens"],
    )
    targets = [r["target_tokens"] for r in ann]
    assert targets == sorted(targets)
