"""Storage-layout plan proofs: partition pruning reaches the scan and
bucketed joins run without exchanges — the two properties the layout
module exists to provide (asserted on the physical plan, not assumed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark import generator
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
