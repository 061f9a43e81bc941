"""sf1 scale soak (VERDICT r1 #3).

Materializes a 10x replica of /root/testdata/sf0.1 (~6M lineitem rows)
under .scale/sf1, runs the bench headline set there, and reports
per-query sf1/sf0.1 runtime ratios. A ratio near 10 is linear scaling;
well above ~15 flags a plan that would not survive 100x.

Replication model (one replica = one key-space stripe):

- region/nation are SF-invariant in TPC-H and copied as-is.
- Every other table gets key columns offset by ``rep * STRIDE`` so
  referential joins (orders->customer, lineitem->part/supplier,
  events.user_id) stay consistent within a stripe and never collide
  across stripes.
- embeddings.label is offset per replica: block COUNT scales with the
  corpus while block SIZE stays constant — exactly how an IVF coarse
  quantizer behaves when the corpus grows (more cells, same cell
  occupancy). vec_id 0..4 (the demo query vectors) exist only in
  stripe 0, as in a real query workload.
- documents are replicated byte-identical: duplicate-group size grows
  10x by construction, which is a *harder* (and realistic, common-
  crawl-like) dedup workload; minhash pair OUTPUT therefore grows
  ~quadratically in group size by data design, not by plan defect —
  its wall-clock is reported but judged against that expectation.

Usage: python tools/scale_soak.py [--skip-generate]
Writes SOAK_r2.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_time_streaming_system_with_apache_kafka_spark import registry  # noqa: E402
from real_time_streaming_system_with_apache_kafka_spark.session import get_session  # noqa: E402
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load  # noqa: E402
from bench import HEADLINE  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
DST_SF = os.path.join(REPO, ".scale", "sf1")
N_REPLICAS = 10
STRIDE = 100_000_000  # far above any base key
LABEL_STRIDE = 1_000

# table -> (bigint key columns to stripe, int label-ish columns to stripe)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]
# Output partitions sized to keep files ~10-60 MB at this volume.
PARTITIONS = {"lineitem": 16, "orders": 8, "events": 8}


def generate(spark) -> None:
    os.makedirs(DST_SF, exist_ok=True)
    for t in COPY_AS_IS:
        shutil.copyfile(
            os.path.join(SRC_SF, f"{t}.parquet"), os.path.join(DST_SF, f"{t}.parquet")
        )
        print(f"  {t}: copied (SF-invariant)")
    reps = F.explode(F.sequence(F.lit(0), F.lit(N_REPLICAS - 1))).alias("rep")
    for t, keys in KEYED.items():
        df = load(spark, t, SRC_SF).select("*", reps)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("rep").cast("long") * STRIDE)
        if t == "embeddings":
            df = df.withColumn(
                "label", F.col("label") + F.col("rep") * F.lit(LABEL_STRIDE)
            )
        df = df.drop("rep").repartition(PARTITIONS.get(t, 4))
        out = os.path.join(DST_SF, f"{t}.parquet")
        tmp = out + ".dir"
        df.write.mode("overwrite").parquet(tmp)
        # The loaders accept a directory, but keep the flat single-file
        # layout only for the tiny tables; facts stay multi-file dirs
        # (that IS the at-scale layout).
        if os.path.isfile(out):
            os.remove(out)
        if os.path.isdir(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        n = spark.read.parquet(out).count()
        print(f"  {t}: {n} rows")


def run_bench(spark, sf_dir: str) -> dict[str, float]:
    queries = registry.all_queries()
    for warm in ["a1_count", "s5_value_counts", "dedup_exact", "mm_frame_sample"]:
        queries[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)
        print(f"  {name}: {times[name]}s", flush=True)
    return times


def main() -> None:
    spark = get_session("rtss_soak")
    if "--skip-generate" not in sys.argv:
        print("generating sf1 ...")
        generate(spark)
    print("bench @ sf0.1 ...")
    t01 = run_bench(spark, SRC_SF)
    print("bench @ sf1 ...")
    t1 = run_bench(spark, DST_SF)
    ratios = {
        k: (round(t1[k] / t01[k], 2) if t01[k] > 0 else None) for k in t1
    }
    report = {
        "metric": "sf1_soak",
        "sf0_1_total_sec": round(sum(t01.values()), 3),
        "sf1_total_sec": round(sum(t1.values()), 3),
        "queries_sf0_1": t01,
        "queries_sf1": t1,
        "ratio_sf1_over_sf0_1": ratios,
        "replicas": N_REPLICAS,
    }
    with open(os.path.join(REPO, "SOAK_r2.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
