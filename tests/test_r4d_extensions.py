"""Invariant tests for the fourth round-4 continuation batch:
cross-document substring-span dedup and blocked record linkage —
each re-derived in plain python from the same fixture and required to
agree row-for-row with the engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import dedup
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def _word_ngrams(text: str, n: int) -> list[str]:
    words = (text or "").split(" ")
    if len(words) < n:
        return [text or ""]
    return [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]


def test_substring_spans_matches_python_recompute(spark, sf_smoke):
    """Full python reimplementation at sf0.001: positional 5-grams,
    cross-document duplicate set (>= 2 distinct docs), per-doc island
    runs — the engine's per-doc rows must agree exactly, including the
    integer-ppm arithmetic and the ORDER BY."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, "documents", sf_smoke)
        .select("doc_id", "text")
        .collect()
    }
    gram_docs: dict[str, set[int]] = {}
    positions: dict[int, list[str]] = {}
    for doc_id, text in docs.items():
        grams = _word_ngrams(text, dedup.SPAN_N)
        positions[doc_id] = grams
        for g in grams:
            gram_docs.setdefault(g, set()).add(doc_id)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expected = {}
    for doc_id, grams in positions.items():
        hits = [i for i, g in enumerate(grams) if g in dup]
        if not hits:
            continue
        best = run = 1
        for a, b in zip(hits, hits[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        expected[doc_id] = (
            len(grams),
            len(hits),
            best,
            best + dedup.SPAN_N - 1,
            len(hits) * 1000000 // len(grams),
        )
    rows = dedup.dedup_substring_spans(spark, sf_smoke).collect()
    assert [r["doc_id"] for r in rows] == sorted(expected)
    for r in rows:
        assert (
            r["n_grams"],
            r["n_dup_grams"],
            r["max_dup_run_grams"],
            r["max_dup_span_words"],
            r["dup_gram_ppm"],
        ) == expected[r["doc_id"]]
    # The fixture's near-duplicate docs guarantee long shared spans.
    assert any(r["max_dup_run_grams"] > 1 for r in rows)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_er_blocked_matching_python_recompute(spark, sf_smoke):
    """Rebuild the dirty-record fixture and the blocked comparison in
    plain python (including a reference Levenshtein) from the raw
    custkeys and require the summary row to agree count-for-count.
    Also pins the designed signal: blocking recall < 1 (every 9th
    entity mis-blocks) and match recall < blocking recall (every 5th
    entity's double-drop exceeds the threshold)."""
    keys = [
        r["c_custkey"]
        for r in load(spark, "customer", sf_smoke).select("c_custkey").collect()
    ]
    adj = dedup.ER_ADJ.split(",")
    noun = dedup.ER_NOUN.split(",")
    recs = []
    for k in keys:
        e, v = k // 2, k % 2
        name = f"{adj[e % 8]} {noun[(e // 8) % 8]} {e}"
        if v == 1:
            p = e % 10  # 0-based count of kept prefix chars
            name = name[:p] + name[p + 1 :]
            if e % 5 == 0:
                q = e % 7
                name = name[:q] + name[q + 1 :]
        city = (e + 1) % dedup.ER_CITY_MOD if v == 1 and e % 9 == 0 else (
            e % dedup.ER_CITY_MOD
        )
        recs.append((k, e, name, city))
    n_cand = n_match = n_true_cob = n_true_match = 0
    for i, (ra, ea, na, ca) in enumerate(recs):
        for rb, eb, nb, cb in recs[i + 1 :]:
            if ca != cb:
                continue
            n_cand += 1
            match = _lev(na, nb) <= dedup.ER_LEV_MATCH
            n_match += match
            if ea == eb:
                n_true_cob += 1
                n_true_match += match
    ent: dict[int, int] = {}
    for _, e, _, _ in recs:
        ent[e] = ent.get(e, 0) + 1
    n_true_pairs = sum(k * (k - 1) // 2 for k in ent.values())
    [row] = dedup.er_blocked_matching(spark, sf_smoke).collect()
    assert row["n_entities"] == len(ent)
    assert row["n_records"] == len(recs)
    assert row["n_true_pairs"] == n_true_pairs
    assert row["n_candidate_pairs"] == n_cand
    assert row["n_matched"] == n_match
    assert row["n_true_matched"] == n_true_match
    assert row["blocking_recall_ppm"] == n_true_cob * 1000000 // max(
        n_true_pairs, 1
    )
    assert row["match_recall_ppm"] == n_true_match * 1000000 // max(
        n_true_pairs, 1
    )
    assert row["precision_ppm"] == n_true_match * 1000000 // max(n_match, 1)
    assert 0 < row["match_recall_ppm"] < row["blocking_recall_ppm"] < 1000000


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_er_blocking_is_equality_join(spark, sf_dir):
    """The candidate generator must be an equality (hash/sort-merge)
    join on the block key — never an all-pairs nested loop. The only
    nested-loop allowed is the final broadcast of the 1-row truth
    aggregate onto the 1-row candidate aggregate."""
    plan = _plan(dedup.er_blocked_matching(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # The block-key candidate join is an equality join.
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # Exactly one nested-loop operator (tree + detail block = 2 string
    # occurrences in formatted output): the 1-row x 1-row summary glue.
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_substring_spans_shuffles_hashes_not_text(spark, sf_dir):
    """Both gram-keyed exchanges move the md5 key, never gram text,
    and nothing in the plan is an all-pairs join."""
    plan = _plan(dedup.dedup_substring_spans(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "md5" in plan
