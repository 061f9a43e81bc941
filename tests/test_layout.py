"""Storage-layout proofs: partition pruning reaches the scan, bucketed
joins run without exchanges (sources/layout.py), and the registry-level
layout operators hold their envelope/plan contracts
(operators/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark import generator
from real_time_streaming_system_with_apache_kafka_spark.operators import layout as op_layout
from real_time_streaming_system_with_apache_kafka_spark.sources import layout


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_pruning(spark, tmp_path):
    trades = generator.trades(spark, 5_000)
    path = str(tmp_path / "trades_by_date")
    layout.write_partitioned(trades, path, "trade_date")

    one_day = trades.select("trade_date").distinct().limit(1).collect()[0][0]
    pruned = layout.read_partitioned(spark, path).filter(
        F.col("trade_date") == F.lit(one_day)
    )
    plan = _plan(pruned)
    # The filter became a partition filter on the scan (directory
    # pruning), not a row-level post-scan predicate.
    assert "PartitionFilters" in plan
    assert "trade_date" in plan.split("PartitionFilters")[1].splitlines()[0]
    # And it actually restricts the data read.
    assert pruned.count() == trades.filter(F.col("trade_date") == F.lit(one_day)).count()


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        trades = generator.trades(spark, 5_000)
        left = trades.select("trade_id", "counterparty", "notional_value")
        right = trades.select("trade_id", "status", "settlement_venue")
        layout.write_bucketed_table(left, "trades_left_b", "trade_id")
        layout.write_bucketed_table(right, "trades_right_b", "trade_id")

        lb = spark.table("trades_left_b")
        rb = spark.table("trades_right_b")
        joined = lb.join(rb, "trade_id")
        plan = _plan(joined)
        # Co-located buckets: a sort-merge join with ZERO shuffle
        # exchanges (the unbucketed equivalent needs two).
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 5_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS trades_left_b")
        spark.sql("DROP TABLE IF EXISTS trades_right_b")


# --------------------------------------------------------------------
# Registry-level layout operators (operators/layout.py)


def test_zorder_envelopes_tight_in_both_dimensions(spark, sf_dir):
    """Fixing the leading 4 bits of BOTH normalized dims (256 Z
    buckets) bounds every bucket's raw envelope to ~1/16 of each
    dimension's range — the multi-dim pruning property a 1-D layout
    cannot give (a time-sorted layout leaves user spans at full
    range)."""
    rows = op_layout.layout_zorder_events(spark, sf_dir).collect()
    assert rows, "no buckets"
    u_lo = min(r.u_min for r in rows)
    u_hi = max(r.u_max for r in rows)
    t_lo = min(r.t_min for r in rows)
    t_hi = max(r.t_max for r in rows)
    u_cap = (u_hi - u_lo) // 16 + 2  # 1/16 window + normalization rounding
    t_cap = (t_hi - t_lo) // 16 + 2
    for r in rows:
        assert r.u_max - r.u_min <= u_cap, r
        assert r.t_max - r.t_min <= t_cap, r
    # The win vs a 1-D (time-only) layout: there, any bucket spanning
    # >1 minute covers ~the full user range; here every bucket's user
    # span is a sliver.
    assert max(r.u_max - r.u_min for r in rows) <= (u_hi - u_lo) // 8


def test_j8_bucketed_star_tables_join_without_exchange(spark, sf_dir):
    """The registry operator's lineitem/orders bucket tables: the
    sort-merge join subtree carries NO Exchange — the shuffle is paid
    once at write time, never per join."""
    li, od = op_layout.bucketed_join_frames(spark, sf_dir)
    joined = li.hint("merge").join(
        od, li.l_orderkey == od.o_orderkey
    ).select("l_orderkey", "l_extendedprice", "o_orderpriority")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan


def test_j8_bucketed_join_rowcount_matches_plain_join(spark, sf_dir):
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

    li, od = op_layout.bucketed_join_frames(spark, sf_dir)
    n_bucketed = li.join(od, li.l_orderkey == od.o_orderkey).count()
    n_plain = (
        load(spark, "lineitem", sf_dir)
        .join(
            load(spark, "orders", sf_dir),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n_bucketed == n_plain


def test_dynamic_partition_pruning_on_partitioned_table(spark, tmp_path):
    """Dynamic partition pruning: joining a date-partitioned fact to a
    filtered dim plants a dynamicpruning subquery in the fact scan's
    PartitionFilters — at 100 TB the fact directories for excluded
    days are never read, even though the pruning values are only known
    at runtime."""
    trades = generator.trades(spark, 5_000)
    path = str(tmp_path / "trades_dpp")
    layout.write_partitioned(trades, path, "trade_date")
    fact = layout.read_partitioned(spark, path)

    # DPP's benefit heuristic wants a SELECTIVE dim: a stored dim
    # table with a pushed filter (the star-schema shape it exists for).
    dim_path = str(tmp_path / "day_dim")
    keep_days = [
        r[0]
        for r in trades.select("trade_date").distinct().orderBy("trade_date").limit(2).collect()
    ]
    (
        trades.select("trade_date")
        .distinct()
        .withColumn(
            "day_tag",
            F.when(F.col("trade_date").isin(keep_days), "keep").otherwise("drop"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path).filter(F.col("day_tag") == "keep")
    joined = fact.join(F.broadcast(dim), "trade_date").select(
        "trade_date", "notional_value", "day_tag"
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # And the pruning is real: only the dim's days survive.
    assert joined.select("trade_date").distinct().count() == 2


def test_runtime_bloom_filter_join_injection(spark, sf_dir):
    """Runtime Bloom-filter join (Catalyst InjectRuntimeFilter): with a
    selective dim filter and a too-big-to-broadcast build side, the
    fact scan gains a might_contain(bloom_filter_agg(...)) semi-filter
    built from the dim at runtime — at 100 TB this discards most fact
    rows before the shuffle. The thresholds are production-scale, so
    the test lowers the application-side floor to let the tiny fixture
    qualify; the rewrite itself is the stock optimizer rule."""
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load(spark, "lineitem", sf_dir)
        od = load(spark, "orders", sf_dir).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "l_extendedprice", "o_orderpriority"
        )
        plan = _plan(j)
        assert "might_contain" in plan.lower()
        assert "bloom_filter_agg" in plan.lower()
        n_bloom = j.count()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # The runtime filter must be semantics-preserving.
    li = load(spark, "lineitem", sf_dir)
    od = load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    assert n_bloom == li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
