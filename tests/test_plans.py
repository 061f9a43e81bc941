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
