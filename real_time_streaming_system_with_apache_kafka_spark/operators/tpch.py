"""Additional TPC-H query shapes (Q4/Q6/Q14/Q15/Q17/Q18 adapted to the
driver's star schema — the test tables carry no partsupp/commitdate/
shipmode columns, so predicates are re-targeted onto columns that exist
while keeping each query's *shape* intact).

These are the canonical decision-support patterns a reference user would
expect from a snapshot SQL surface (reference dashboard.py:236-303 runs
ad-hoc SQL over the trades table; this module is the same capability
exercised over the TPC-H-ish tables):

- Q6: pure scan-side conditional aggregate — no join, no shuffle beyond
  a single scalar combine; the predicate set must reach the parquet scan.
- Q14: two conditional aggregates over a fact x dim join, ratioed.
- Q15: aggregate, then filter rows equal to the aggregate's max — the
  scalar-subquery pattern, implemented as a broadcast of one scalar row
  (never a window over an unpartitioned frame, which would single-thread
  the agg output at scale).
- Q17: correlated aggregate subquery (per-part average) re-expressed as
  an aggregate-then-broadcast-join — the standard decorrelation Spark's
  optimizer applies to correlated scalar subqueries, written explicitly.
- Q18: HAVING over a fact-side aggregate, then joined back to the
  dimensions — the agg output (rare keys) drives the join, so the
  post-filter join is cheap regardless of fact size.
- Q4: EXISTS rewritten as a left-semi join (Spark's own plan for
  EXISTS), then a tiny group-count.

All money arithmetic uses the shared exact-decimal kernels from
``functions.exact`` so results are bit-identical to the DuckDB oracle
and order-independent across any executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import (
    davg,
    dec4,
    dsum,
    oracle_davg,
    oracle_dsum,
    revenue_dec,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

_DEC = "decimal(38,6)"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: one-year ship window, discount band, small quantities —
    sum(extendedprice * discount). Every predicate is scan-pushable and
    the aggregate is a single scalar, so the whole query is a parquet
    scan + map-side combine: the cheapest possible shape at 100 TB."""
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_revenue = dec4("l_extendedprice") * dec4("l_discount", 6)
    return li.agg(
        F.sum(disc_revenue.cast(_DEC)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts in one month.
    part broadcasts (dim), lineitem never shuffles; both conditional
    sums ride the same map-side combine."""
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = load(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = revenue_dec().cast(_DEC)
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo_rev).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_pct"
            ),
            "promo_revenue",
            "total_revenue",
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.
    The scalar subquery (max over the revenue CTE) becomes a broadcast
    of a single aggregated row — the agg output is one row regardless of
    supplier count, so this plan is flat in fact size. Revenue stays in
    exact decimal through the equality test (bit-exact tie semantics),
    cast to double only for presentation."""
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(revenue_dec().cast(_DEC)).alias("rev_dec")
    )
    max_rev = rev.agg(F.max("rev_dec").alias("max_dec"))
    supp = load(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev), rev.rev_dec == F.col("max_dec"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: yearly revenue lost if small-quantity orders (below
    20% of the part's average quantity) were not taken, for one brand.
    The correlated per-part AVG subquery is decorrelated into an
    explicit aggregate joined back by part key; the brand filter
    broadcasts through part, so only that brand's lineitems ever reach
    the aggregate or the join."""
    part = load(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_part = branded.groupBy("l_partkey").agg(davg(F.col("l_quantity"), "avg_qty"))
    return (
        branded.join(F.broadcast(per_part.withColumnRenamed("l_partkey", "pp_key")),
                     F.col("l_partkey") == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (
                F.sum(dec4("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_qty"),
        )
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose orders exceed 300 total units.
    The HAVING filter runs on the fact-side aggregate first (one shuffle
    on l_orderkey, map-side combine), so only the few surviving order
    keys join back to orders/customer — the join input shrinks by the
    aggregate's selectivity before any dimension is touched."""
    li = load(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = load(spark, "orders", sf_dir)
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority for orders with at
    least one returned lineitem in a quarter (the schema has no
    commit/receipt dates, so the EXISTS predicate is returnflag='R').
    EXISTS = left-semi join: lineitem is pre-filtered and deduplicated
    by the semi join itself, never multiplying order rows."""
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    returned = load(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q4_order_priority": q4_order_priority,
}

ORACLES = {
    "q6_forecast_revenue": """
        SELECT cast(sum(cast(cast(l_extendedprice AS decimal(12,4))
                             * cast(l_discount AS decimal(6,4)) AS decimal(38,6)))
                    AS double) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q14_promo_effect": """
        WITH agg AS (
            SELECT cast(sum(CASE WHEN p_type = 'PROMO'
                       THEN cast(cast(l_extendedprice AS decimal(12,4))
                                 * cast(1 - l_discount AS decimal(6,4)) AS decimal(38,6))
                       ELSE cast(0 AS decimal(38,6)) END) AS double) AS promo_revenue,
                   cast(sum(cast(cast(l_extendedprice AS decimal(12,4))
                                 * cast(1 - l_discount AS decimal(6,4)) AS decimal(38,6)))
                        AS double) AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= timestamp '1996-09-01'
              AND l_shipdate < timestamp '1996-10-01'
        )
        SELECT 100.0 * promo_revenue / total_revenue AS promo_pct,
               promo_revenue, total_revenue
        FROM agg
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(cast(cast(l_extendedprice AS decimal(12,4))
                            * cast(1 - l_discount AS decimal(6,4)) AS decimal(38,6)))
                       AS rev_dec
            FROM lineitem
            WHERE l_shipdate >= timestamp '1996-01-01'
              AND l_shipdate < timestamp '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, cast(rev_dec AS double) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
        ORDER BY s_suppkey
    """,
    "q17_small_qty_revenue": f"""
        WITH branded AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#23'
        ),
        per_part AS (
            SELECT l_partkey AS pp_key, {oracle_davg('l_quantity', 'avg_qty')}
            FROM branded
            GROUP BY l_partkey
        )
        SELECT cast(sum(cast(cast(l_extendedprice AS decimal(12,4))
                             AS decimal(38,6))) AS double) / 7.0 AS avg_yearly,
               count(*) AS n_small_qty
        FROM branded JOIN per_part ON l_partkey = pp_key
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q18_large_volume_customer": f"""
        WITH big AS (
            SELECT l_orderkey, {oracle_dsum('l_quantity', 'total_qty')}
            FROM lineitem
            GROUP BY l_orderkey
            HAVING {oracle_dsum('l_quantity', 'x').replace(' as x', '')} > 300
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= timestamp '1996-01-01'
          AND o_orderdate < timestamp '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
}
