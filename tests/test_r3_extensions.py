"""Semantic invariants for the late-round-3 operators (beyond the
DuckDB parity suite): chunker coverage, KNN-join structure, passage
dedup vs exact dedup consistency, containment bounds, linear-classifier
scoring, trigram-diversity accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    QUALITY_BIAS,
    QUALITY_WEIGHTS,
    chunk_documents,
    quality_weighted_terms,
)
from real_time_streaming_system_with_apache_kafka_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    dedup_containment,
    dedup_exact,
    dedup_passage,
)
from real_time_streaming_system_with_apache_kafka_spark.operators.similarity import (
    sim_knn_join,
)
from real_time_streaming_system_with_apache_kafka_spark.operators.text import (
    text_ngram_diversity,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def test_chunker_covers_every_word(spark, sf_smoke):
    chunks = chunk_documents(spark, sf_smoke)
    docs = load(spark, "documents", sf_smoke).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    )
    # Per doc: chunk 0 exists, indices are dense, and the last chunk's
    # start + n_tokens reaches the word count (full coverage — the
    # stride < chunk size guarantees interior coverage).
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("first_idx"),
        F.max("chunk_idx").alias("last_idx"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max(F.col("chunk_idx") * CHUNK_STRIDE + F.col("n_tokens")).alias(
            "covered"
        ),
    )
    joined = per_doc.join(docs, "doc_id")
    n_docs = docs.count()
    assert per_doc.count() == n_docs  # no document dropped
    assert joined.filter(F.col("first_idx") != 0).count() == 0
    assert (
        joined.filter(
            F.col("n_chunks") != F.col("last_idx") + 1
        ).count()
        == 0
    )  # dense indices
    assert joined.filter(F.col("covered") < F.col("n_words")).count() == 0


def test_chunker_first_chunk_is_prefix(spark, sf_smoke):
    row = (
        chunk_documents(spark, sf_smoke)
        .filter((F.col("doc_id") == 1) & (F.col("chunk_idx") == 0))
        .collect()[0]
    )
    text = (
        load(spark, "documents", sf_smoke)
        .filter(F.col("doc_id") == 1)
        .collect()[0]["text"]
    )
    words = text.split(" ")
    assert row["chunk_text"] == " ".join(words[:CHUNK_TOKENS])
    assert row["n_tokens"] == min(CHUNK_TOKENS, len(words))


def _learned_cells(spark, sf_smoke):
    """The corpus with its learned blocking cell — the same quantizer
    the operators use (functions/blocks.py)."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.blocks import (
        with_block_cells,
    )

    emb = load(spark, "embeddings", sf_smoke)
    return with_block_cells(emb).select(
        "vec_id", "label", "embedding", F.col("block").alias("cell")
    )


def test_knn_join_structure(spark, sf_smoke):
    blocked = _learned_cells(spark, sf_smoke)
    knn = sim_knn_join(spark, sf_smoke)
    # Exactly one row per vector whose learned cell has >= 2 members.
    cell_sizes = blocked.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    expected = (
        blocked.join(cell_sizes, "cell").filter(F.col("n") >= 2).count()
    )
    assert knn.count() == expected
    assert knn.select("vec_id").distinct().count() == expected
    # Neighbor is a different vector from the same cell; cosine bounded.
    lab = blocked.select(
        F.col("vec_id").alias("nn_id"), F.col("cell").alias("nn_cell")
    )
    bad = (
        knn.join(lab, "nn_id")
        .filter(
            (F.col("nn_cell") != F.col("cell"))
            | (F.col("nn_id") == F.col("vec_id"))
            | (F.col("cos") > 1.0000001)
            | (F.col("cos") < -1.0000001)
        )
        .count()
    )
    assert bad == 0


def test_knn_join_matches_exhaustive_within_cell(spark, sf_smoke):
    """The kernel's argmax equals a plain DataFrame max over all
    same-cell cosines (independent derivation through the exact
    pair-join path over the SAME learned cells)."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.arrays import (
        cosine,
    )

    blocked = _learned_cells(spark, sf_smoke)
    a = blocked.select("cell", F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = blocked.select("cell", F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    best = (
        a.join(b, "cell")
        .filter(F.col("va") != F.col("vb"))
        .withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .groupBy("va")
        .agg(F.max("cos").alias("best_cos"))
    )
    knn = sim_knn_join(spark, sf_smoke).select(
        F.col("vec_id").alias("va"), "cos"
    )
    mism = (
        knn.join(best, "va")
        .filter(F.abs(F.col("cos") - F.col("best_cos")) > 1e-12)
        .count()
    )
    assert mism == 0


def test_knn_join_recall_vs_global_exact(spark, sf_smoke):
    """The IVF recall tradeoff, MEASURED against the exact global 1-NN
    (brute-force cross join) AND against the r3-r5 label blocking it
    replaced. The fixture is nearly adversarial for any blocking —
    vectors are close to mutually orthogonal (max same-label cosine
    ~0.51), so exact nearest neighbors carry little cosine margin and
    cell boundaries cut many of them — but the learned count-derived
    cells must (a) strictly beat the old fixed-label blocking on both
    recall and mean cosine loss, and (b) clear loose absolute floors
    (measured r6 at sf0.001: learned recall 0.276 / loss 0.054 vs
    label 0.070 / 0.098)."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.arrays import (
        cosine,
    )

    emb = load(spark, "embeddings", sf_smoke)
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    glob = (
        a.crossJoin(b)
        .filter(F.col("va") != F.col("vb"))
        .withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .groupBy("va")
        .agg(F.max("cos").alias("global_cos"))
    )

    def stats(nn_df):
        rows = nn_df.join(glob, "va").collect()
        assert rows, "fixture yields no 1-NN rows"
        kept = sum(1 for r in rows if r["cell_cos"] >= r["global_cos"] - 1e-9)
        loss = sum(
            max(0.0, r["global_cos"] - r["cell_cos"]) for r in rows
        ) / len(rows)
        return kept / len(rows), loss

    knn = sim_knn_join(spark, sf_smoke).select(
        F.col("vec_id").alias("va"), F.col("cos").alias("cell_cos")
    )
    recall, mean_loss = stats(knn)

    # The replaced baseline: within-LABEL exact 1-NN.
    al = emb.select("label", F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    bl = emb.select("label", F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    label_nn = (
        al.join(bl, "label")
        .filter(F.col("va") != F.col("vb"))
        .withColumn("c", cosine(F.col("ea"), F.col("eb")))
        .groupBy("va")
        .agg(F.max("c").alias("cell_cos"))
    )
    label_recall, label_loss = stats(label_nn)

    assert recall > label_recall, (recall, label_recall)
    assert mean_loss < label_loss, (mean_loss, label_loss)
    assert recall >= 0.15, f"1-NN recall {recall:.2f}"
    assert mean_loss < 0.08, f"mean cosine loss {mean_loss:.4f}"


def test_passage_dedup_flags_prefix_groups(spark, sf_dir):
    """Documents sharing a 20-word prefix (dedup_prefix groups) share
    at least their first 10-word passage, so every member must surface
    in the passage-dedup report with n_dup_passages >= 1."""
    from real_time_streaming_system_with_apache_kafka_spark.operators.dedup import (
        PREFIX_WORDS,
        dedup_prefix,
    )

    docs = load(spark, "documents", sf_dir)
    groups = dedup_prefix(spark, sf_dir)  # only n_members > 1 groups
    prefix = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, PREFIX_WORDS))
    )
    members = (
        docs.withColumn("prefix_hash", prefix)
        .join(F.broadcast(groups.select("prefix_hash")), "prefix_hash")
        .select("doc_id")
    )
    n_members = members.count()
    assert n_members > 0, "fixture should contain shared-prefix docs"
    flagged = dedup_passage(spark, sf_dir).join(members, "doc_id")
    assert flagged.count() == n_members
    assert flagged.filter(F.col("n_dup_passages") < 1).count() == 0


def test_containment_bounds_and_direction(spark, sf_dir):
    pairs = dedup_containment(spark, sf_dir)
    rows = pairs.collect()
    assert len(rows) > 0, "fixture near-dups should produce containments"
    for r in rows:
        assert CONTAINMENT_THRESHOLD <= r["containment"] <= 1.0
        assert r["doc_a"] != r["doc_b"]


def test_weighted_terms_scores_one_doc(spark, sf_smoke):
    docs = load(spark, "documents", sf_smoke)
    n_docs = docs.count()
    scored = quality_weighted_terms(spark, sf_smoke)
    assert scored.count() == n_docs  # whole-corpus domain
    text = docs.filter(F.col("doc_id") == 0).collect()[0]["text"]
    expected = QUALITY_BIAS + sum(
        QUALITY_WEIGHTS.get(w, 0) for w in text.split(" ")
    )
    got = scored.filter(F.col("doc_id") == 0).collect()[0]["score"]
    assert got == expected


def test_ngram_diversity_accounting(spark, sf_smoke):
    """Total trigram occurrences per lang must equal the sum over docs
    of max(n_words - 2, 1) — the clamp's arithmetic identity."""
    docs = load(spark, "documents", sf_smoke)
    expected = {
        r["lang"]: r["total"]
        for r in docs.select(
            "lang",
            F.greatest(
                F.size(F.split("text", " ")) - 2, F.lit(1)
            ).alias("k"),
        )
        .groupBy("lang")
        .agg(F.sum("k").alias("total"))
        .collect()
    }
    got = text_ngram_diversity(spark, sf_smoke).collect()
    assert {r["lang"]: r["n_trigrams"] for r in got} == expected
    for r in got:
        assert 0 < r["diversity"] <= 1.0
        assert r["n_distinct_trigrams"] <= r["n_trigrams"]


def test_semdedup_consistent_with_pair_derivation(spark, sf_dir):
    """keep/drop must agree with an independent pair derivation: a
    vector is dropped iff some LOWER-id vector in the same LEARNED
    quantizer cell clears the SemDeDup threshold (note: relative to
    ALL lower-id cell-mates, not only kept ones — the deterministic
    variant the oracle encodes)."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.arrays import (
        cosine,
    )
    from real_time_streaming_system_with_apache_kafka_spark.operators.dedup import (
        SEMDEDUP_THRESHOLD,
        dedup_semdedup,
    )

    blocked = _learned_cells(spark, sf_dir)
    a = blocked.select("cell", F.col("vec_id").alias("lo"), F.col("embedding").alias("ea"))
    b = blocked.select("cell", F.col("vec_id").alias("hi"), F.col("embedding").alias("eb"))
    expected_dropped = (
        a.join(b, "cell")
        .filter(F.col("lo") < F.col("hi"))
        .withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= SEMDEDUP_THRESHOLD)
        .select(F.col("hi").alias("vec_id"))
        .distinct()
    )
    got_dropped = dedup_semdedup(spark, sf_dir).filter(~F.col("keep")).select("vec_id")
    assert got_dropped.count() == expected_dropped.count()
    assert got_dropped.exceptAll(expected_dropped).count() == 0
    assert got_dropped.count() > 0, "fixture should drop some vectors"


def test_regex_ngrams_match_lambda_form(spark, sf_dir):
    """The codegen'd regex gram pass must produce byte-identical gram
    arrays to the interpreted transform-lambda spec for every document
    and every n used by an operator (3: diversity/shingles, 5:
    decontamination)."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.ngrams import (
        regex_word_ngrams,
    )
    from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
        _ngrams,
    )

    docs = load(spark, "documents", sf_dir)
    for n in (3, 5):
        mism = (
            docs.select(
                _ngrams(F.split("text", " "), n).alias("spec"),
                regex_word_ngrams(F.col("text"), n).alias("fast"),
            )
            .filter(F.col("spec") != F.col("fast"))
            .count()
        )
        assert mism == 0, f"n={n}"


def test_regex_ngrams_null_text_matches_spec(spark):
    """Out-of-contract input hardening (review finding): NULL text must
    yield the same degenerate gram list [''] as the interpreted spec
    twin, not [NULL] — a null gram would silently diverge from DuckDB
    count(DISTINCT) semantics if a corpus ever carried null text."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.ngrams import (
        regex_word_ngrams,
    )
    from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
        _ngrams,
    )

    df = spark.createDataFrame([(None,)], "text string")
    for n in (3, 5):
        row = df.select(
            _ngrams(F.split("text", " "), n).alias("spec"),
            regex_word_ngrams(F.col("text"), n).alias("fast"),
        ).collect()[0]
        assert row["spec"] == row["fast"] == [""], f"n={n}"


def test_boilerplate_strip_agrees_with_passage_profile(spark, sf_dir):
    """Cross-operator invariant: with the same 10-word windows,
    text_boilerplate_strip's dropped-window count per doc must equal
    dedup_passage's duplicated-passage count (strip REMOVES exactly
    what the profile COUNTS), and the cleaned text must contain
    exactly the kept windows' words."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import curation, dedup

    assert curation.BP_WINDOW == dedup.PASSAGE_WORDS
    assert curation.BP_THRESHOLD == 2  # profile counts n_global > 1
    prof = {
        r.doc_id: r.n_dup_passages
        for r in dedup.dedup_passage(spark, sf_dir).collect()
    }
    stripped = dedup.load(spark, "documents", sf_dir).select("doc_id").join(
        curation.text_boilerplate_strip(spark, sf_dir), "doc_id"
    )
    rows = stripped.collect()
    assert len(rows) >= len(prof)  # profile reports dup-bearing docs only
    for r in rows:
        assert r.n_dropped == prof.get(r.doc_id, 0), r.doc_id
        # Rebuilt text word count = kept windows' words (last window
        # may be short only if it is the document's final window).
        kept = r.n_windows - r.n_dropped
        n_words = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert n_words <= kept * curation.BP_WINDOW
        assert n_words > (kept - 1) * curation.BP_WINDOW - 1 or kept == 0


def test_reconcile_checksum_order_invariant_and_sensitive(spark, sf_dir):
    """The signature is invariant to partitioning/row order (sums
    commute) and sensitive to any single-row change."""
    from pyspark.sql import functions as F

    from real_time_streaming_system_with_apache_kafka_spark.operators import extras

    base = {
        r.l_returnflag: (r.n_rows, r.hash_sum)
        for r in extras.reconcile_checksum(spark, sf_dir).collect()
    }

    # Invariance: recompute over an adversarially repartitioned and
    # re-sorted copy (different partitioning AND row order).
    # reconcile_checksum reads through load_rebalanced (the gated
    # compute-rebalance); patch that symbol to inject the shuffled copy.
    orig_load = extras.load_rebalanced
    shuffled = (
        orig_load(spark, "lineitem", sf_dir)
        .repartition(7, "l_partkey")
        .sortWithinPartitions(F.col("l_extendedprice").desc())
    )
    try:
        extras.load_rebalanced = (
            lambda s, name, sf: shuffled
            if name == "lineitem"
            else orig_load(s, name, sf)
        )
        again = {
            r.l_returnflag: (r.n_rows, r.hash_sum)
            for r in extras.reconcile_checksum(spark, sf_dir).collect()
        }
    finally:
        extras.load_rebalanced = orig_load
    assert base == again

    # Sensitivity: perturb one row's quantity -> that flag's signature
    # moves, others stay (recompute the canon inline on mutated data).
    probe = (
        extras.load(spark, "lineitem", sf_dir)
        .orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .limit(1)
        .collect()[0]
    )
    flag = probe.l_returnflag
    mut = extras.load(spark, "lineitem", sf_dir).withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") == probe.l_orderkey)
            & (F.col("l_linenumber") == probe.l_linenumber),
            F.col("l_quantity") + 1,
        ).otherwise(F.col("l_quantity")),
    )
    try:
        extras.load_rebalanced = lambda s, name, sf: mut if name == "lineitem" else orig_load(s, name, sf)
        mutated = {
            r.l_returnflag: (r.n_rows, r.hash_sum)
            for r in extras.reconcile_checksum(spark, sf_dir).collect()
        }
    finally:
        # Restore the symbol that was patched (a previous version
        # restored extras.load here, leaving load_rebalanced patched
        # for the rest of the session — poisoning any later extras
        # operator reading lineitem through it).
        extras.load_rebalanced = orig_load
    assert mutated[flag] != base[flag]
    for k in base:
        if k != flag:
            assert mutated[k] == base[k]


def test_hll_partials_merge_identity_and_accuracy(spark, sf_dir):
    """Sketch mergeability: the union of per-type HLL sketches must
    give the IDENTICAL estimate to one direct whole-table sketch
    (register-wise max commutes with partitioning), and estimates stay
    within 5% of exact."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import analytics

    rows = {
        r.event_type: r
        for r in analytics.approx_hll_partials(spark, sf_dir).collect()
    }
    ev = load(spark, "events", sf_dir)
    exact_all = ev.select("user_id").distinct().count()
    # The r8 hash-grade contract folds merge identity and accuracy into
    # boolean output columns — assert them true, and cross-check the
    # exact side independently.
    assert rows["(all)"].n_exact == exact_all
    for t, r in rows.items():
        assert r.hll_within_5pct, f"{t}: estimate drifted past 5%"
        assert r.merge_within_rse, f"{t}: union-of-partials drifted past 2xRSE from direct"
        if t != "(all)":
            assert r.n_exact > 0


def test_bitmap_distinct_or_merge_recombination(spark, sf_dir):
    """The stored per-(type, bucket) bitmaps must recombine: OR-merging
    across ALL types and popcounting gives exactly the global distinct
    count — the re-groupable exact-distinct property that motivates the
    bitmap rollup."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import analytics

    ev = load(spark, "events", sf_dir)
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    merged = (
        per_bucket.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        .collect()[0]
        .n
    )
    exact = ev.select("user_id").distinct().count()
    assert merged == exact
    # And the registry query's per-type counts are exact too.
    rows = {r.event_type: r.n_users for r in analytics.agg_bitmap_distinct(spark, sf_dir).collect()}
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert rows == truth


def test_triangle_count_matches_naive_enumeration(spark, sf_dir):
    """Degree-ordered orientation must count exactly the triangles the
    naive id-ordered a<b<c enumeration finds (independent derivation),
    with each corner credited once per triangle."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import dedup

    edges = dedup._dup_edges(spark, sf_dir)
    canon = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    wedges = canon.join(
        canon.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )  # a<b<c paths
    naive = wedges.join(
        canon.select("a", F.col("b").alias("c")), ["a", "c"]
    ).select("a", "b", "c").distinct()
    naive_members = {}
    for r in naive.collect():
        for v in (r.a, r.b, r.c):
            naive_members[v] = naive_members.get(v, 0) + 1
    got = {
        r.doc_id: r.n_triangles
        for r in dedup.graph_triangle_count(spark, sf_dir).collect()
    }
    assert got == naive_members


def test_epoch_repeats_arithmetic_identity(spark, sf_dir):
    """The plan must reconstruct: full_epochs = target div tokens,
    and the fractional pass in ppm never reaches a full extra epoch;
    realized tokens (full + fractional) land within one ppm-truncation
    of the target."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import datamix

    rows = datamix.mix_epoch_repeats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.full_epochs == r.target_tokens // r.source_tokens
        assert 0 <= r.remainder_ppm < 1_000_000
        realized = (
            r.full_epochs * r.source_tokens
            + r.remainder_ppm * r.source_tokens / 1_000_000
        )
        assert abs(realized - r.target_tokens) <= r.source_tokens / 1_000_000 + 1


def test_soft_weights_conserve_group_mass(spark, sf_dir):
    """Soft-dedup weights: every doc appears once, and each duplicate
    group's total weight is one document's worth (1e6 ppm) up to
    integer truncation — the property that makes downweighting
    equivalent in expectation to keeping one copy."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import dedup

    rows = dedup.dedup_soft_weights(spark, sf_dir).collect()
    n_docs = load(spark, "documents", sf_dir).count()
    assert len(rows) == n_docs
    by_group = {}
    for r in rows:
        assert r.weight_ppm == 1_000_000 // r.n_copies
    groups = {}
    for r in rows:
        groups.setdefault(r.n_copies, 0)
        groups[r.n_copies] += 1
    # group-size accounting: members with n_copies=k come in groups of
    # k, so the count of such rows is divisible by k.
    for k, n in groups.items():
        assert n % k == 0, (k, n)
        total_ppm = k * (1_000_000 // k)
        assert 1_000_000 - k < total_ppm <= 1_000_000


def test_multiprobe_pairs_superset_of_single_probe(spark, sf_smoke):
    """Every single-probe pair is a multi-probe pair (each vector's
    rk-1 cell is among its nprobe cells), and multi-probe recovers
    strictly more of the brute-force ground truth on the fixture —
    the measured recall knob the operator exists to expose."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.arrays import (
        cosine,
    )
    from real_time_streaming_system_with_apache_kafka_spark.operators.dedup import (
        COSINE_THRESHOLD,
        dedup_embedding_cosine,
        dedup_embedding_multiprobe,
    )

    single = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine(spark, sf_smoke).collect()
    }
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_multiprobe(spark, sf_smoke).collect()
    }
    assert single <= multi, sorted(single - multi)[:5]

    emb = load(spark, "embeddings", sf_smoke)
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    truth = {
        (r["va"], r["vb"])
        for r in a.crossJoin(b)
        .filter(F.col("va") < F.col("vb"))
        .withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("va", "vb")
        .collect()
    }
    assert multi <= truth  # blocking never invents pairs
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi > recall_single, (recall_multi, recall_single)


def test_block_quantizer_partition_independent(spark, sf_smoke):
    """The learned blocking quantizer's docstring claims determinism
    under any partitioning (hash-ordered init/sample, decimal-exact
    means). Pin it: the same corpus through different partition
    counts must learn IDENTICAL centroids and assign IDENTICAL cells."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.blocks import (
        learn_block_quantizer,
        make_assign_udf,
    )

    emb = load(spark, "embeddings", sf_smoke)
    k1, c1 = learn_block_quantizer(emb.repartition(3))
    k2, c2 = learn_block_quantizer(emb.repartition(13))
    assert k1 == k2
    assert c1 == c2  # float-exact: every mean is decimal-exact
    a1 = {
        r["vec_id"]: r["cell"]
        for r in emb.repartition(5)
        .withColumn("cell", make_assign_udf(c1)(F.col("embedding")))
        .select("vec_id", "cell")
        .collect()
    }
    a2 = {
        r["vec_id"]: r["cell"]
        for r in emb.coalesce(1)
        .withColumn("cell", make_assign_udf(c2)(F.col("embedding")))
        .select("vec_id", "cell")
        .collect()
    }
    assert a1 == a2


def test_block_quantizer_memo_keys_do_not_collide_across_corpora(spark):
    """sf0.001 and sf0.01 embeddings both hold 500 vectors but are
    different corpora: the (path, count) memo key must keep their
    trained quantizers separate."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.blocks import (
        learn_block_quantizer,
    )

    a = "/root/testdata/sf0.001"
    b = "/root/testdata/sf0.01"
    emb_a = load(spark, "embeddings", a)
    emb_b = load(spark, "embeddings", b)
    ka, ca = learn_block_quantizer(emb_a, cache_key=a)
    kb, cb = learn_block_quantizer(emb_b, cache_key=b)
    assert ka == kb == 23  # ceil(sqrt(500))
    assert ca != cb, "different corpora must learn different centroids"
    # And the memo returns the SAME object on a repeat call.
    ka2, ca2 = learn_block_quantizer(emb_a, cache_key=a)
    assert ca2 is ca


def test_quantizer_memo_invalidated_by_content_rewrite(spark, tmp_path):
    """r7 ADVICE fix: the memo key is CONTENT-derived, not just
    (path, count). A corpus rewritten in place — same path, same
    vec_ids, same row count, different vectors — must retrain instead
    of serving stale centroids (which would silently diverge from the
    DuckDB oracle, which always retrains on live data)."""
    from pyspark.sql import functions as F

    from real_time_streaming_system_with_apache_kafka_spark.functions.blocks import (
        learn_block_quantizer,
    )

    path = str(tmp_path / "corpus")
    src = load(spark, "embeddings", "/root/testdata/sf0.001")
    src.write.mode("overwrite").parquet(path)
    emb1 = spark.read.parquet(path)
    k1, c1 = learn_block_quantizer(emb1, cache_key=path)
    # Rewrite IN PLACE: same vec_ids/count, every vector negated.
    rewritten = src.withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    rewritten.write.mode("overwrite").parquet(path)
    emb2 = spark.read.parquet(path)
    k2, c2 = learn_block_quantizer(emb2, cache_key=path)
    assert k2 == k1  # same count -> same cell count
    assert c2 != c1, "content rewrite must invalidate the memo"
    # And the fresh centroids really come from the rewritten data:
    # negation flips no cosine (cos(-a,-c) = cos(a,c)), so training
    # follows identical assignments and every decimal-exact mean is
    # exactly negated — float-exact, no tolerance.
    assert c2 == [[-x for x in v] for v in c1]
