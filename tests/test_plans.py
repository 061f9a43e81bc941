"""Physical-plan audits: the properties that make these queries scale
must be visible in the plan, not assumed (SURVEY.md §4 / task brief:
pushdown reaches the scan, dims broadcast, top-K avoids a global sort,
heavy kernels don't inherit single-file parallelism)."""

from __future__ import annotations

from real_time_streaming_system_with_apache_kafka_spark.operators import (
    joins,
    relational,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(relational.p1_equality_filter(spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    # Only the 4 selected columns reach the scan.
    assert "o_orderpriority" not in plan.split("ReadSchema")[1][:300]


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(joins.j1_star_join_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan


def test_q5_broadcasts_all_dims_single_fact_shuffle(spark, sf_dir):
    """TPC-H Q5: supplier/customer/nation/region all broadcast; the
    only exchanges are the fact-fact join and the final agg."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import analytics

    plan = _plan(analytics.q5_local_supplier_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # supp, cust, nation(+region folded)
    # The correlated c_nationkey = s_nationkey must ride a join, not a
    # post-join filter over a cross product.
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q10_take_ordered_no_global_sort(spark, sf_dir):
    from real_time_streaming_system_with_apache_kafka_spark.operators import analytics

    plan = _plan(analytics.q10_returned_items(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan and "l_returnflag" in plan  # filter reaches scan


def test_resample_spine_no_cartesian(spark, sf_dir):
    """The time spine must come from per-group sequence+explode, never
    a calendar cross join against the fact table."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import timeseries

    plan = _plan(timeseries.ts_resample_locf(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_deterministic_sample_is_scan_side_filter(spark, sf_dir):
    """The md5-bucket sample is a pure per-row filter — one scan, no
    shuffle, no join."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import sampling

    plan = _plan(sampling.sample_events_deterministic(spark, sf_dir))
    assert "Exchange" not in plan  # no shuffle anywhere
    assert "Join" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(relational.q0_snapshot_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT


def test_projection_prunes_scan(spark, sf_dir):
    plan = _plan(relational.pr1_projection(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_shipdate" not in read_schema  # unused columns pruned


def test_q6_is_pure_scan_aggregate(spark, sf_dir):
    """Q6 must compile to scan -> partial agg -> single-row final agg:
    no join operator of any kind, and every predicate pushed to the
    parquet reader."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import tpch

    plan = _plan(tpch.q6_forecast_revenue(spark, sf_dir))
    assert "Join" not in plan
    assert "GreaterThanOrEqual(l_shipdate,1996-01-01" in plan
    assert "LessThan(l_quantity,24" in plan


def test_q14_single_broadcast_join(spark, sf_dir):
    from real_time_streaming_system_with_apache_kafka_spark.operators import tpch

    plan = _plan(tpch.q14_promo_effect(spark, sf_dir))
    # Tree form counts each operator once (details repeat the name).
    assert plan.count("BroadcastHashJoin Inner") == 1  # part is the only join
    assert "GreaterThanOrEqual(l_shipdate,1996-09-01" in plan


def test_q15_scalar_subquery_broadcasts(spark, sf_dir):
    """The max-revenue scalar must arrive as a broadcast one-row build
    side, never a nested-loop or cartesian comparison."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import tpch

    plan = _plan(tpch.q15_top_supplier(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # max scalar + supplier dim
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q17_brand_filter_reaches_both_scans(spark, sf_dir):
    """The decorrelated per-part average must broadcast back, and the
    brand filter must prune the part scan (the lineitem side is pruned
    through the broadcast join, not a scan filter)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import tpch

    plan = _plan(tpch.q17_small_qty_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EqualTo(p_brand,Brand#23)" in plan


def test_q18_having_then_topk(spark, sf_dir):
    """The HAVING aggregate runs before any join, and the final order/
    limit is TakeOrderedAndProject, not a global sort."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import tpch

    plan = _plan(tpch.q18_large_volume_customer(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_compiles_to_semi_join(spark, sf_dir):
    from real_time_streaming_system_with_apache_kafka_spark.operators import tpch

    plan = _plan(tpch.q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "EqualTo(l_returnflag,R)" in plan  # pushed to the lineitem scan
