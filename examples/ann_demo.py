"""ANN index ladder demo: every similarity operator, Spark-first.

    python examples/ann_demo.py [sf_dir]

Runs the whole approximate-nearest-neighbor ladder over the synthetic
embeddings table and reports each variant's agreement with the exact
brute-force baseline — the accuracy/cost trade-off a 100 TB vector
corpus navigates:

  brute force        exact cosine, query set broadcast (baseline)
  IVF (labels)       probe 2 coarse cells, exact inside
  IVF (learned)      spherical k-means quantizer, same probe
  LSH                6 sign-hash tables + Hamming-1 multi-probe
  PQ                 16-byte codes, integer ADC scan, exact rerank
  prefix (MRL)       first-16-dim cosine shortlist, exact rerank
  IVF+PQ             cells prune the scan, codes prune the bytes
  range search       all neighbors above a cosine radius
  kNN self-join      every vector's nearest same-cell neighbor

Every stage is the registered operator itself (no demo-only logic), so
what this prints is exactly what the oracle-checked registry computes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_streaming_system_with_apache_kafka_spark.operators import similarity  # noqa: E402
from real_time_streaming_system_with_apache_kafka_spark.session import get_session  # noqa: E402

VARIANTS = [
    ("sim_ivf_topk", similarity.sim_ivf_topk),
    ("sim_ivf_kmeans_topk", similarity.sim_ivf_kmeans_topk),
    ("sim_lsh_topk", similarity.sim_lsh_topk),
    ("sim_pq_topk", similarity.sim_pq_topk),
    ("sim_prefix_topk", similarity.sim_prefix_topk),
    ("sim_ivfpq_topk", similarity.sim_ivfpq_topk),
]
# sim_filtered_topk is exact over a METADATA-filtered subset (not
# comparable to the unfiltered baseline) — reported separately below.


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("rtss_ann_demo")

    t0 = time.monotonic()
    bf = {
        (r.query_id, r.neighbor_id): r.cos
        for r in similarity.sim_bruteforce_topk(spark, sf_dir).collect()
    }
    print(f"brute force: {len(bf)} result rows "
          f"({time.monotonic() - t0:.2f}s) — exact baseline")
    if not bf:
        print("no baseline results — does the embeddings table have "
              "the vec_id < 5 query rows?")
        return

    for name, fn in VARIANTS:
        t0 = time.monotonic()
        got = {
            (r.query_id, r.neighbor_id): r.cos for r in fn(spark, sf_dir).collect()
        }
        dt = time.monotonic() - t0
        hits = set(bf) & set(got)
        exact_vals = (
            "n/a" if not hits else all(bf[k] == got[k] for k in hits)
        )
        print(
            f"{name:22s} recall@5={len(hits) / len(bf):.2f} "
            f"({dt:.2f}s, hit cosines exact: {exact_vals})"
        )

    filt = similarity.sim_filtered_topk(spark, sf_dir)
    print(f"filtered search: top-5 over label >= "
          f"{similarity.FILTER_MIN_LABEL} only — {filt.count()} rows, "
          "exact over the eligible set (pre-filter pushdown)")
    rng = similarity.sim_range_search(spark, sf_dir)
    print(f"range search: {rng.count()} neighbors above "
          f"cos >= {similarity.RANGE_THRESHOLD}")
    knn = similarity.sim_knn_join(spark, sf_dir)
    print(f"kNN self-join: {knn.count()} vectors matched to their "
          f"exact in-cell nearest neighbor")


if __name__ == "__main__":
    main()
