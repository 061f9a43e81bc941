"""Aggregations (SURVEY.md §2.4, reference dashboard.py:74-243).

The reference recomputes every aggregate eagerly in pandas over a
<=5000-row snapshot on each 5 s poll. Here each is a declarative plan
that Catalyst executes as partial (map-side combine) + final hash
aggregation — one shuffle keyed by the group columns, linear scaling
with executors. Conditional counts (A3) collapse the reference's
filter-then-len pattern (dashboard.py:79-81, three passes) into a single
scan.

Gap-fill beyond the reference (SURVEY.md §2.4 "extend" notes): distinct
counts, exact percentiles, ROLLUP/CUBE — Spark built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import (
    dsum,
    oracle_dsum,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def a1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: COUNT(*) (dashboard.py:74 ``len(df_trades)``)."""
    li = load(spark, "lineitem", sf_dir)
    return li.agg(F.count(F.lit(1)).alias("total_rows"))


def a2_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: whole-table sums (dashboard.py:75-76 total notional/fees)."""
    li = load(spark, "lineitem", sf_dir)
    return li.agg(
        dsum(F.col("l_extendedprice"), "total_price"),
        dsum(F.col("l_quantity"), "total_quantity"),
    )


def a3_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: settled/pending/break counts (dashboard.py:79-81) — three
    predicates in ONE pass instead of the reference's three filters."""
    orders = load(spark, "orders", sf_dir)

    def count_if(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return orders.agg(
        count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        count_if(F.col("o_orderstatus") == "P").alias("n_pending"),
        F.count(F.lit(1)).alias("n_total"),
    )


def a4_boolean_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: boolean mean as a rate (dashboard.py:83 STP rate)."""
    li = load(spark, "lineitem", sf_dir)
    return li.agg(
        F.avg((F.col("l_returnflag") != "R").cast("int")).alias("stp_rate"),
    )


def a5_derived_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: post-aggregation ratio arithmetic with div-by-zero guards
    (dashboard.py:84-87, :100: settlement rate, break rate, avg size)."""
    orders = load(spark, "orders", sf_dir)
    agged = orders.agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("total_dec"),
    )
    from real_time_streaming_system_with_apache_kafka_spark.functions.exact import ratio

    return agged.select(
        ratio(F.col("n_f"), F.col("n"), "settlement_rate_pct"),
        ratio(F.col("n_p"), F.col("n"), "pending_rate_pct"),
        (F.col("total_dec").cast("double") / F.col("n")).alias("avg_order_value"),
    )


def a7_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: group-by sum (dashboard.py:145 notional by asset class)."""
    li = load(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(dsum(F.col("l_extendedprice"), "total_price"))
        .orderBy("l_returnflag")
    )


def a9_unpivot_fee_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: multi-column sums reshaped long (dashboard.py:200-207 fee-mix
    pie) — one agg + ``stack`` unpivot, not three scans."""
    li = load(spark, "lineitem", sf_dir)
    agged = li.agg(
        dsum(F.col("l_quantity"), "q"),
        dsum(F.col("l_discount"), "d"),
        dsum(F.col("l_tax"), "t"),
    )
    return agged.selectExpr(
        "stack(3, 'quantity', q, 'discount', d, 'tax', t) AS (component, amount)"
    )


def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (gap-fill; SURVEY.md §2.4)."""
    li = load(spark, "lineitem", sf_dir)
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (gap-fill; SURVEY.md §2.4)."""
    li = load(spark, "lineitem", sf_dir)
    return li.agg(
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("p50_quantity"),
        F.percentile(F.col("l_quantity"), F.lit(0.9)).alias("p90_quantity"),
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (gap-fill; SURVEY.md §2.4)."""
    li = load(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("l_quantity"), "sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (gap-fill; SURVEY.md §2.4)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.withColumn("day", F.to_date("ts"))
        .cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "sum_value"))
    )


QUERIES = {
    "a1_count": a1_count,
    "a2_totals": a2_totals,
    "a3_conditional_counts": a3_conditional_counts,
    "a4_boolean_mean": a4_boolean_mean,
    "a5_derived_ratios": a5_derived_ratios,
    "a7_groupby_sum": a7_groupby_sum,
    "a9_unpivot_fee_mix": a9_unpivot_fee_mix,
    "agg_distinct_count": agg_distinct_count,
    "agg_percentiles": agg_percentiles,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
}

ORACLES = {
    "a1_count": "SELECT count(*) AS total_rows FROM lineitem",
    "a2_totals": f"""
        SELECT {oracle_dsum('l_extendedprice', 'total_price')},
               {oracle_dsum('l_quantity', 'total_quantity')}
        FROM lineitem
    """,
    "a3_conditional_counts": """
        SELECT cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS n_finished,
               cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS n_open,
               cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS n_pending,
               count(*) AS n_total
        FROM orders
    """,
    "a4_boolean_mean": """
        SELECT avg(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS stp_rate
        FROM lineitem
    """,
    "a5_derived_ratios": """
        WITH agged AS (
            SELECT sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f,
                   sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_p,
                   count(*) AS n,
                   sum(cast(o_totalprice AS decimal(38,6))) AS total_dec
            FROM orders
        )
        SELECT CASE WHEN n = 0 THEN 0.0
                    ELSE cast(n_f AS double) / cast(n AS double) * 100 END
                   AS settlement_rate_pct,
               CASE WHEN n = 0 THEN 0.0
                    ELSE cast(n_p AS double) / cast(n AS double) * 100 END
                   AS pending_rate_pct,
               cast(total_dec AS double) / n AS avg_order_value
        FROM agged
    """,
    "a7_groupby_sum": f"""
        SELECT l_returnflag, {oracle_dsum('l_extendedprice', 'total_price')}
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "a9_unpivot_fee_mix": f"""
        WITH agged AS (
            SELECT {oracle_dsum('l_quantity', 'q')},
                   {oracle_dsum('l_discount', 'd')},
                   {oracle_dsum('l_tax', 't')}
            FROM lineitem
        )
        SELECT 'quantity' AS component, q AS amount FROM agged
        UNION ALL SELECT 'discount', d FROM agged
        UNION ALL SELECT 'tax', t FROM agged
    """,
    "agg_distinct_count": """
        SELECT count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_suppliers,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
    """,
    "agg_percentiles": """
        SELECT quantile_cont(l_quantity, 0.5) AS p50_quantity,
               quantile_cont(l_quantity, 0.9) AS p90_quantity
        FROM lineitem
    """,
    "agg_rollup": f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               {oracle_dsum('l_quantity', 'sum_qty')}
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "agg_cube": f"""
        SELECT event_type, cast(date_trunc('day', ts) AS date) AS day,
               count(*) AS n,
               {oracle_dsum('value', 'sum_value')}
        FROM events
        GROUP BY CUBE (event_type, day)
    """,
}
