"""Similarity search over embeddings (north-star extension).

- **Brute-force cosine top-k** — the correctness baseline: query set
  broadcast against the corpus, exact decimal-accurate cosine, rank
  window per query. O(queries x corpus) but embarrassingly parallel;
  right answer, reference for recall.
- **IVF (inverted-file) top-k** — the scale path: corpus pre-clustered
  into coarse cells (here the provided ``label`` plays the quantizer
  cell id; at 100 TB the cells come from k-means or LSH), queries probe
  only the ``nprobe`` nearest cells by centroid distance, then exact
  cosine within the probed cells. Shuffle volume drops from O(corpus)
  per query to O(corpus/cells x nprobe).

Centroids are decimal-exact per-dimension means (posexplode ->
groupBy(cell, dim) -> exact sum / count -> re-assembled), so the same
cells are probed on any engine/run order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.arrays import (
    cosine,
    oracle_cosine,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

N_QUERIES = 5  # vec_id < 5 are the demo query vectors
TOP_K = 5
NPROBE = 2


def _rank_topk(candidates: DataFrame) -> DataFrame:
    """Shared tail of every search variant: exact cosine, rank window
    with neighbor-id tie-break, keep the top K."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        candidates.withColumn("cos", cosine(F.col("qe"), F.col("ne")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id < N_QUERIES),
    self-matches excluded, ties broken by neighbor id."""
    emb = load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    )
    return _rank_topk(pairs.filter(F.col("query_id") != F.col("neighbor_id")))


def cell_centroids(emb: DataFrame) -> DataFrame:
    """Decimal-exact per-cell mean vectors: posexplode -> exact sum per
    (cell, dim) -> collect back into ordered arrays."""
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(30,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_x")
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("mean_x")))
            ),
            lambda s: s.getField("mean_x"),
        ).alias("centroid")
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: probe the NPROBE cells whose centroids are most
    cosine-similar to the query, exact search inside those cells only.
    (Rows-only driver check — the recall-vs-bruteforce contract is
    asserted in tests/test_similarity.py.)"""
    emb = load(spark, "embeddings", sf_dir)
    cents = cell_centroids(emb)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cent_cos").desc(), F.col("label")
    )
    probed = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", cosine(F.col("qe"), F.col("centroid")))
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= NPROBE)
        .select("query_id", "qe", "label")
    )
    candidates = probed.join(
        emb.select("label", F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")),
        "label",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _rank_topk(candidates)


# 6 planes + Hamming-1 multi-probe: ~11% of the corpus per query on
# the test embeddings at ~0.3 recall of the exact top-5 — the standard
# speed/recall dial (more planes = smaller buckets = lower recall).
N_PLANES = 6
EMBEDDING_DIM = 64


def _hyperplane_bits(vec, tag: str) -> "F.Column":
    """Sign bits of the vector against N_PLANES pseudo-random
    hyperplanes. Plane components derive from xxhash64(plane, dim, tag)
    — deterministic everywhere, no stored model. Pure per-row
    expressions: at 100 TB the bucketing costs one projection."""
    bits = []
    for p in range(N_PLANES):
        terms = [
            F.element_at(vec, d + 1).cast("double")
            * (
                (
                    F.pmod(
                        F.xxhash64(F.lit(p), F.lit(d), F.lit(tag)), F.lit(2001)
                    )
                    - 1000
                )
                / 1000.0
            )
            for d in range(EMBEDDING_DIM)
        ]
        proj = terms[0]
        for t in terms[1:]:
            proj = proj + t
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: random-hyperplane signature buckets the
    corpus; each query searches only its own bucket plus single-bit
    neighbors (multi-probe), exact cosine inside. The scale path when
    no cluster structure (IVF cells) exists: shuffle is an equality
    join on the signature. Rows-only driver check; recall contract in
    tests/test_similarity.py."""
    emb = load(spark, "embeddings", sf_dir)
    # Guard the fixed-width plane projection: a vector of any other
    # dimension would project to NULL (element_at past the end) and
    # silently collapse every signature to all-zeros.
    emb = emb.filter(F.size("embedding") == EMBEDDING_DIM)
    sig = emb.select(
        "vec_id", "embedding", _hyperplane_bits(F.col("embedding"), "lsh").alias("sig")
    )
    # Multi-probe: each vector is indexed under its signature and every
    # 1-bit flip of it (Hamming-1 probes), as an exploded bucket table.
    probes = F.array(
        F.col("sig"),
        *[
            F.concat(
                F.substring("sig", 1, i),
                F.when(F.substring("sig", i + 1, 1) == "1", "0").otherwise("1"),
                F.substring("sig", i + 2, N_PLANES - i - 1),
            )
            for i in range(N_PLANES)
        ],
    )
    q = (
        sig.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode(probes).alias("bucket"),
        )
    )
    corpus = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("sig").alias("bucket"),
    )
    # No dedup needed: the 7 probe strings are pairwise distinct and
    # each corpus row carries exactly one sig, so the equality join
    # yields at most one row per (query, neighbor) — a distinct() here
    # would shuffle the wide embedding arrays for nothing.
    candidates = (
        F.broadcast(q)
        .join(corpus, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qe", "neighbor_id", "ne")
    )
    return _rank_topk(candidates)


QUERIES = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_lsh_topk": sim_lsh_topk,
}

ORACLES = {
    "sim_bruteforce_topk": f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   {oracle_cosine('q.embedding', 'n.embedding')} AS cos
            FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
            CROSS JOIN embeddings n
            WHERE q.vec_id <> n.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, cast(rank AS int) AS rank, neighbor_id, cos
        FROM ranked WHERE rank <= {TOP_K}
    """,
    # sim_ivf_topk: rows-only (recall contract tested in pytest).
}
