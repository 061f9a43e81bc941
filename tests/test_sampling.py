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


def test_shuffle_global_order_is_dense_permutation(spark, sf_dir):
    """Positions must be exactly 0..N-1 with no gaps or dups, and the
    assignment must not depend on the physical partitioning."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import sampling

    out = sampling.shuffle_global_order(spark, sf_dir)
    rows = out.collect()
    n = len(rows)
    assert sorted(r.shuffle_pos for r in rows) == list(range(n))
    # Same answer under a different partitioning of the input scan.
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {r.doc_id: r.shuffle_pos
                 for r in sampling.shuffle_global_order(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert again == {r.doc_id: r.shuffle_pos for r in rows}


def test_token_budget_floor_semantics(spark, sf_dir):
    """Every language's admitted set must (a) stay below budget before
    the crossing doc and (b) stop admitting once the floor is crossed:
    tokens_before < BUDGET for all admitted, and the admitted set is a
    prefix of the md5 order (no later doc admitted after a rejection)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import datamix

    rows = datamix.sample_token_budget(spark, sf_dir).collect()
    assert all(r.tokens_before < datamix.TOKEN_BUDGET for r in rows)
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    # Each language admits at least one doc and crosses the floor
    # (total admitted tokens >= budget) unless the stratum is tiny.
    totals: dict[str, int] = {}
    for r in rows:
        totals[r.lang] = totals.get(r.lang, 0) + r.n_tokens
    for lang, tot in totals.items():
        assert tot >= datamix.TOKEN_BUDGET or by_lang[lang] > 0


def test_domain_cap_bound_and_partitioning_invariance(spark, sf_dir):
    """Every source keeps at most DOMAIN_CAP docs, survivors are a
    subset of that source's docs, and the selection is identical under
    any input partitioning (the md5 order is data-derived, not
    partition-derived)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import sampling

    out = sampling.sample_domain_cap(spark, sf_dir).collect()
    per_source: dict[str, int] = {}
    for r in out:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
        assert 1 <= r["domain_rank"] <= sampling.DOMAIN_CAP
    assert max(per_source.values()) <= sampling.DOMAIN_CAP

    # Same result regardless of how the input arrives partitioned.
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load
    from pyspark.sql import functions as F, Window

    docs = load(spark, "documents", sf_dir).repartition(7, "lang")
    h = F.md5(F.concat_ws("#", F.lit("domcap_v1"), F.col("doc_id")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    again = (
        docs.select("doc_id", "source", "lang", h.alias("h"))
        .withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= sampling.DOMAIN_CAP)
        .select("doc_id", "source", "lang", "domain_rank")
        .collect()
    )
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
