"""Sampling/split contracts: stable assignment, sane fractions,
subset-invariance (adding or removing other rows never moves a row's
bucket — the property that makes the split safe on a growing corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import sampling


def test_split_fractions_and_disjointness(spark, sf_dir):
    df = sampling.split_train_holdout(spark, sf_dir)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    frac = counts.get("holdout", 0) / total
    assert 0.05 < frac < 0.15, f"holdout fraction off: {frac}"
    # Buckets and labels agree.
    assert df.filter((F.col("bucket") >= 90) & (F.col("split") != "holdout")).count() == 0
    assert df.filter((F.col("bucket") < 90) & (F.col("split") != "train")).count() == 0


def test_split_subset_invariance(spark, sf_dir):
    """Bucket assignment must be a pure function of the row key: the
    assignment computed on a filtered corpus equals the full-corpus
    assignment restricted to that subset."""
    full = sampling.split_train_holdout(spark, sf_dir)
    sub = {
        r["doc_id"]: r["bucket"]
        for r in full.filter(F.col("doc_id") % 7 == 0).collect()
    }
    again = {
        r["doc_id"]: r["bucket"]
        for r in sampling.split_train_holdout(spark, sf_dir)
        .filter(F.col("doc_id") % 7 == 0)
        .collect()
    }
    assert sub == again and len(sub) > 0


def test_sample_is_stable_and_sized(spark, sf_dir):
    s1 = {r["event_id"] for r in sampling.sample_events_deterministic(spark, sf_dir).collect()}
    s2 = {r["event_id"] for r in sampling.sample_events_deterministic(spark, sf_dir).collect()}
    assert s1 == s2
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

    n = load(spark, "events", sf_dir).count()
    assert 0.05 < len(s1) / n < 0.15
