"""End-to-end LLM training-data curation demo, Spark-first.

    python examples/curation_demo.py [sf_dir]

Runs the corpus-assembly pipeline this engine adds beyond the
reference's trade analytics, against the synthetic documents table:

  quality gates -> fingerprint dedup        (corpus_curation_pipeline)
  -> incremental-ingest admission            (dedup_incremental_ingest)
  -> benchmark decontamination               (decontaminate_holdout)
  -> per-language token budget               (sample_token_budget)
  -> context-window sequence packing         (pack_sequences)
  -> deterministic global training shuffle   (shuffle_global_order)
  -> reproducible train/holdout split        (split_train_holdout)

Every stage is the registered operator itself (no demo-only logic), so
what this prints is exactly what the oracle-checked registry computes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from real_time_streaming_system_with_apache_kafka_spark.operators import (  # noqa: E402
    curation,
    dedup,
    datamix,
    sampling,
    text,
)
from real_time_streaming_system_with_apache_kafka_spark.session import (  # noqa: E402
    get_session,
    pin_session_defaults,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pin_session_defaults(get_session("curation_demo"))

    curated = text.corpus_curation_pipeline(spark, sf_dir)
    print(f"[1] quality gates + fingerprint dedup: {curated.count()} docs survive")

    admitted = datamix.dedup_incremental_ingest(spark, sf_dir)
    print(f"[2] incremental ingest (batch vs history): {admitted.count()} new docs admitted")

    contaminated = curation.decontaminate_holdout(spark, sf_dir)
    print(f"[3] decontamination: {contaminated.count()} docs overlap the benchmark")

    stripped = curation.text_boilerplate_strip(spark, sf_dir)
    n_strip = stripped.filter(F.col("n_dropped") > 0).count()
    print(f"[3b] boilerplate strip: {n_strip} docs had corpus-frequent "
          "windows removed (text rebuilt)")

    soft = dedup.dedup_soft_weights(spark, sf_dir)
    n_down = soft.filter(F.col("n_copies") > 1).count()
    print(f"[3c] soft dedup: {n_down} docs downweighted to 1/n_copies "
          "instead of dropped")

    budgeted = datamix.sample_token_budget(spark, sf_dir)
    print("[4] token budget per language:")
    budgeted.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("lang").show()

    packed = curation.pack_sequences(spark, sf_dir)
    n_chunks = packed.select("shard", "chunk").distinct().count()
    print(f"[5] sequence packing: {packed.count()} docs into {n_chunks} context windows")

    shuffled = sampling.shuffle_global_order(spark, sf_dir)
    print(f"[6] global shuffle: {shuffled.count()} docs, positions 0..N-1, "
          "reproducible on any cluster size")

    split = sampling.split_train_holdout(spark, sf_dir)
    split.groupBy("split").count().orderBy("split").show()
    print("[7] split done — same assignment on every engine/run.")

    print("[8] epoch/repetition plan per source (2x-corpus budget):")
    datamix.mix_epoch_repeats(spark, sf_dir).select(
        "source", "full_epochs", "remainder_ppm"
    ).orderBy("source").show(5)


if __name__ == "__main__":
    main()
