"""IVF contract: probing NPROBE cells must recover most of the exact
top-k (recall vs brute force), and every IVF hit must carry the same
cosine the brute-force path computed (the kernel is shared)."""

from __future__ import annotations

from real_time_streaming_system_with_apache_kafka_spark.operators import similarity


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.sim_bruteforce_topk(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.sim_ivf_topk(spark, sf_dir).collect()
    }
    assert len(bf) == similarity.N_QUERIES * similarity.TOP_K
    hits = set(bf) & set(ivf)
    recall = len(hits) / len(bf)
    # nprobe=2 of 10 cells on random-ish data: expect meaningful but
    # partial recall; the floor guards against a broken probe path.
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    for k in hits:
        assert bf[k] == ivf[k]  # identical exact kernel on both paths


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.sim_bruteforce_topk(spark, sf_dir).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.sim_lsh_topk(spark, sf_dir).collect()
    }
    hits = set(bf) & set(lsh)
    recall = len(hits) / len(bf)
    # Random-hyperplane ANN on a near-random corpus: partial recall by
    # design; the floor guards against a broken bucket/probe path.
    assert recall >= 0.15, f"LSH recall collapsed: {recall}"
    for k in hits:
        assert bf[k] == lsh[k]


def test_centroids_shape(spark, sf_dir):
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

    emb = load(spark, "embeddings", sf_dir)
    cents = similarity.cell_centroids(emb).collect()
    n_labels = emb.select("label").distinct().count()
    dim = len(emb.first()["embedding"])
    assert len(cents) == n_labels
    assert all(len(c["centroid"]) == dim for c in cents)
