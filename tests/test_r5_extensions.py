"""Round-5 additions: sequence packing + export sharding + the pHash
kernel's huge-vocabulary fallback path."""

from __future__ import annotations

import numpy as np
import pandas as pd

from real_time_streaming_system_with_apache_kafka_spark.operators import (
    datamix,
    multimodal,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def test_phash_fallback_equals_matmul_path():
    """The 64-pass per-bit reduceat fallback (taken when chunk docs x
    vocabulary exceeds the count-matrix budget) is bit-identical to
    the BLAS-matmul path. Random binary payloads make the trigram
    vocabulary wide: 300 docs x 3000 bytes ~ 875k distinct grams, so
    one 300-doc chunk exceeds CM_CELLS (2^24) and takes the fallback,
    while 2-doc batches (vocab ~6k each) take the matmul path. Driver-
    side only — exercises the kernel closure, no Spark session."""
    rng = np.random.default_rng(7)
    payloads = [rng.integers(0, 256, 3000, dtype=np.uint8).tobytes() for _ in range(300)]
    fn = multimodal.make_phash_batches()
    big = pd.concat(
        list(fn(iter([pd.DataFrame({"doc_id": range(300), "payload": payloads})])))
    )
    small_parts = []
    for i in range(0, 300, 2):
        small_parts.append(
            pd.concat(
                list(
                    fn(
                        iter(
                            [
                                pd.DataFrame(
                                    {
                                        "doc_id": [i, i + 1],
                                        "payload": payloads[i : i + 2],
                                    }
                                )
                            ]
                        )
                    )
                )
            )
        )
    small = pd.concat(small_parts)
    merged = big.merge(small, on="doc_id", suffixes=("_fb", "_mm"))
    assert len(merged) == 300
    assert (merged["phash_fb"] == merged["phash_mm"]).all()


def test_pack_sequences_python_recompute(spark, sf_smoke):
    """Two-phase bucketed prefix sum equals the sequential layout."""
    docs = sorted(
        (r["doc_id"], len(r["text"].split(" ")))
        for r in load(spark, "documents", sf_smoke)
        .select("doc_id", "text")
        .collect()
    )
    expected = {}
    offset = 0
    for doc_id, n in docs:
        first = offset // datamix.SEQ_LEN
        last = (offset + n - 1) // datamix.SEQ_LEN
        expected[doc_id] = (n, offset, first, last, last - first)
        offset += n
    rows = datamix.pack_sequences_plan(spark, sf_smoke).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (
            r["n_tokens"],
            r["tokens_before"],
            r["first_seq"],
            r["last_seq"],
            r["n_boundary_cuts"],
        ) == expected[r["doc_id"]], r["doc_id"]


def test_pack_sequences_boundary_law(spark, sf_smoke):
    """Conservation: total boundary cuts == number of SEQ_LEN
    boundaries that fall strictly inside some document — every token
    of the packed stream is accounted for, zero padding."""
    rows = datamix.pack_sequences_plan(spark, sf_smoke).collect()
    total_tokens = sum(r["n_tokens"] for r in rows)
    n_seqs = (total_tokens + datamix.SEQ_LEN - 1) // datamix.SEQ_LEN
    assert all(0 <= r["first_seq"] <= r["last_seq"] < n_seqs for r in rows)
    # Each internal boundary (1..n_seqs-1) is either a clean document
    # edge or cuts exactly one document.
    cut_total = sum(r["n_boundary_cuts"] for r in rows)
    clean_edges = sum(
        1
        for r in rows
        if r["tokens_before"] % datamix.SEQ_LEN == 0
        and r["tokens_before"] > 0
    )
    assert cut_total + clean_edges == (
        n_seqs - 1 + (1 if total_tokens % datamix.SEQ_LEN == 0 else 0)
    )


def test_cluster_safe_split_no_crossing_and_recompute(spark, sf_smoke):
    """The cluster-keyed split admits ZERO crossing near-dup pairs (by
    construction — both endpoints share a component), and every audit
    number matches a python recompute from the component labels and
    the edge set."""
    import hashlib

    from real_time_streaming_system_with_apache_kafka_spark.operators import dedup

    comp = {
        r["doc_id"]: r["component"]
        for r in dedup.dedup_cc_survivors(spark, sf_smoke)
        .select("doc_id", "component")
        .collect()
    }
    edges = {
        (r["src"], r["dst"])
        for r in dedup._dup_edges(spark, sf_smoke).collect()
        if r["src"] < r["dst"]
    }

    def split_of(x):
        h = hashlib.md5(
            f"{dedup.SPLIT_TAG}#{x}".encode()
        ).hexdigest()[:6]
        return "test" if int(h, 16) % 100 < dedup.SPLIT_TEST_PCT else "train"

    exp_cross_naive = sum(
        1 for a, b in edges if split_of(a) != split_of(b)
    )
    exp_cross_cluster = sum(
        1 for a, b in edges if split_of(comp[a]) != split_of(comp[b])
    )
    assert exp_cross_cluster == 0  # components never straddle
    per_split = {"train": [0, set()], "test": [0, set()]}
    for d, c in comp.items():
        s = split_of(c)
        per_split[s][0] += 1
        per_split[s][1].add(c)
    rows = dedup.sample_cluster_safe_split(spark, sf_smoke).collect()
    assert {r["split"] for r in rows} <= {"train", "test"}
    for r in rows:
        assert r["cross_pairs_cluster"] == 0
        assert r["cross_pairs_naive"] == exp_cross_naive
        assert r["n_dup_pairs"] == len(edges)
        assert r["n_docs"] == per_split[r["split"]][0]
        assert r["n_components"] == len(per_split[r["split"]][1])


def test_export_shard_plan_recompute_and_balance(spark, sf_smoke):
    """Snake assignment equals the sequential recompute, and every
    shard lands within max-doc-tokens of the ideal split (the snake
    guarantee)."""
    docs = sorted(
        (
            (-len(r["text"].split(" ")), r["doc_id"])
            for r in load(spark, "documents", sf_smoke)
            .select("doc_id", "text")
            .collect()
        )
    )
    n = datamix.N_SHARDS
    exp_tokens = [0] * n
    exp_docs = [0] * n
    for pos, (neg_tok, _doc) in enumerate(docs):
        p = pos % (2 * n)
        shard = p if p < n else 2 * n - 1 - p
        exp_tokens[shard] += -neg_tok
        exp_docs[shard] += 1
    rows = datamix.export_shard_plan(spark, sf_smoke).collect()
    assert len(rows) == n
    for r in rows:
        assert r["shard_tokens"] == exp_tokens[r["shard_id"]]
        assert r["n_docs"] == exp_docs[r["shard_id"]]
    total = sum(exp_tokens)
    max_doc = -docs[0][0]
    ideal = total / n
    assert all(abs(t - ideal) <= 2 * max_doc for t in exp_tokens)
    for r in rows:
        expected_ppm = (r["shard_tokens"] * n - total) * 1_000_000
        expected_ppm = (
            expected_ppm // total
            if expected_ppm >= 0
            else -((-expected_ppm) // total)
        )
        assert r["dev_ppm"] == expected_ppm
