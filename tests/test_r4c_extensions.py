"""Invariant tests for the late round-4 continuation additions:
reciprocal-rank-fusion accounting for hybrid retrieval.
"""

from __future__ import annotations

from real_time_streaming_system_with_apache_kafka_spark.operators import (
    retrieval,
)


def test_hybrid_rrf_fusion_laws(spark, sf_dir):
    """Every fused row's rrf_ppb equals the recomputed contributions
    of its reported ranks; ranks of 0 mean 'absent from that list' and
    contribute nothing; each query returns a dense 1..K fused ranking
    ordered by (rrf desc, doc_id asc); both retrievers actually
    contribute to the fused set; and the lexical list agrees with
    search_bm25_topk."""
    rows = retrieval.search_hybrid_rrf(spark, sf_dir).collect()
    k, scale, damp = (
        retrieval.BM25_TOPK,
        retrieval.RRF_SCALE,
        retrieval.RRF_K,
    )
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in retrieval.BM25_QUERIES}
    lex_truth = {
        (r["query_id"], r["doc_id"]): r["rk"]
        for r in retrieval.search_bm25_topk(spark, sf_dir).collect()
    }
    for qid, qrows in by_q.items():
        assert [r["fused_rank"] for r in qrows] == list(range(1, k + 1))
        prev = None
        for r in qrows:
            expect = 0
            if r["lex_rank"] > 0:
                expect += scale // (damp + r["lex_rank"])
            if r["vec_rank"] > 0:
                expect += scale // (damp + r["vec_rank"])
            assert r["rrf_ppb"] == expect and expect > 0
            if r["lex_rank"] > 0:
                assert lex_truth[(qid, r["doc_id"])] == r["lex_rank"]
            if prev is not None:
                assert (prev["rrf_ppb"], -prev["doc_id"]) >= (
                    r["rrf_ppb"],
                    -r["doc_id"],
                )
            prev = r
    assert any(r["lex_rank"] > 0 for r in rows)
    assert any(r["vec_rank"] > 0 for r in rows)
