"""Projections, predicates, sorts and top-K (SURVEY.md §2.2/§2.6).

Reference surface being re-expressed:

- Q0/S1: the dashboard's one SQL query — ``SELECT * FROM trades [WHERE
  status=:s] ORDER BY timestamp DESC LIMIT :n`` (dashboard.py:23-28).
  Spark plans this as ``TakeOrderedAndProject`` — a distributed top-K
  that never materializes the full sort, exactly what you want at
  100 TB: each partition keeps its local K, the driver merges.
- P1-P5: the predicate zoo (equality dashboard.py:79, substring
  dashboard.py:80-81, boolean dashboard.py:83, set membership
  producer.py:105, numeric threshold producer.py:101). All are plain
  Catalyst expressions, so they push down to the parquet scan.
- PR1-PR4: column projection (dashboard.py:119-121), derived columns
  (producer.py:78-105), casts (dashboard.py:70-71), display formatting
  (dashboard.py:284-286).
- S2-S5: top-10 by aggregate (dashboard.py:165), sort-by-aggregate
  (dashboard.py:146), head-N (dashboard.py:121,:281), value_counts
  ordering (dashboard.py:131).

Every ordered-limit query carries an explicit unique tie-breaker key so
the selected row SET is deterministic (SURVEY.md §7.2: equal timestamps
make a bare LIMIT nondeterministic on any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def q0_snapshot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q0/S1: filtered recency snapshot — equality predicate + ORDER BY
    ts DESC LIMIT 500 (dashboard.py:23-28), event_id as tie-breaker."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.filter(F.col("event_type") == "error")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(500)
        .select(*_EVENT_COLS)
    )


def p1_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: equality predicate (dashboard.py:79) — pushed to the scan."""
    orders = load(spark, "orders", sf_dir)
    return orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def p2_substring_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: substring predicate (dashboard.py:80-81 ``str.contains``)."""
    orders = load(spark, "orders", sf_dir)
    return orders.filter(F.col("o_orderpriority").contains("URGENT")).select(
        "o_orderkey", "o_orderpriority"
    )


def p3_boolean_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A4: boolean-column mean — the STP-rate computation
    (dashboard.py:83) as a single-pass conditional aggregate."""
    li = load(spark, "lineitem", sf_dir)
    eligible = F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
    return li.agg(
        (eligible * 100.0 / F.count(F.lit(1))).alias("stp_rate_pct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def p4_set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: NOT-IN membership (producer.py:105 ``status not in breaks``)."""
    li = load(spark, "lineitem", sf_dir)
    return li.filter(~F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


def p5_numeric_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: numeric threshold (producer.py:101 ``notional > 1e6``)."""
    orders = load(spark, "orders", sf_dir)
    return orders.filter(F.col("o_totalprice") > 300000.0).select(
        "o_orderkey", "o_totalprice"
    )


def pr1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR1: narrow column projection (dashboard.py:119-121) — Catalyst
    prunes the parquet scan to exactly these columns."""
    li = load(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


def pr2_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR2: derived/computed columns (producer.py:78-105: notional,
    fees, conditional priority, boolean eligibility)."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.exact import dec4, round2

    li = load(spark, "lineitem", sf_dir)
    # Decimal-exact products (see functions/exact.py): inputs have 2dp
    # intrinsic precision, so scale-4 casts are exact and the rounded
    # results are engine-independent.
    revenue = dec4("l_extendedprice") * dec4(1 - F.col("l_discount"), 6)
    charge = revenue * dec4(1 + F.col("l_tax"), 6)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round2(revenue, "revenue"),
        round2(charge, "charge"),
        F.when((F.col("l_returnflag") == "R") | (F.col("l_extendedprice") > 50000), "High")
        .otherwise("Normal")
        .alias("priority"),
        (~F.col("l_returnflag").isin("A", "R")).alias("stp_eligible"),
    )


def pr3_type_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR3: type casts (dashboard.py:70-71 string->timestamp; here
    timestamp->date, long->string, double->decimal-scale round)."""
    orders = load(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderkey").cast("string").alias("orderkey_str"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price_2dp"),
    )


def pr4_display_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR4: display formatting (dashboard.py:284-286 ``$%,.2f``/``%.4f``
    pandas lambdas) as JVM-side format_string — no Python in the loop."""
    orders = load(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        # %.2f of an intrinsically-2dp double and %.6f of a /1000
        # quotient (intrinsically 5dp) never hit a rounding boundary, so
        # Java and C formatting agree (see functions/exact.py).
        F.format_string("$%.2f", F.col("o_totalprice")).alias("total_price_usd"),
        F.format_string("%.6f", F.col("o_totalprice") / 1000.0).alias("price_k_6dp"),
    )


def s2_top10_by_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: top-10 entities by aggregate (dashboard.py:164-165
    counterparty exposure) — agg then TakeOrderedAndProject."""
    ev = load(spark, "events", sf_dir)
    from real_time_streaming_system_with_apache_kafka_spark.functions.exact import dsum

    return (
        ev.groupBy("user_id")
        .agg(dsum(F.col("value"), "total_value"))
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(10)
    )


def s3_sort_by_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: full sort of aggregates (dashboard.py:145-146 asset-class
    bars)."""
    ev = load(spark, "events", sf_dir)
    from real_time_streaming_system_with_apache_kafka_spark.functions.exact import dsum

    return (
        ev.groupBy("event_type")
        .agg(dsum(F.col("value"), "total_value"))
        .orderBy(F.col("total_value").desc(), F.col("event_type"))
    )


def s4_head_after_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: head-N over an ordered scan (dashboard.py:121, :281)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(20)
        .select("event_id", "ts", "event_type", "value")
    )


def s5_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/A6: frequency table with value_counts ordering
    (dashboard.py:131-132)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("event_type"))
    )


QUERIES = {
    "q0_snapshot_topk": q0_snapshot_topk,
    "p1_equality_filter": p1_equality_filter,
    "p2_substring_filter": p2_substring_filter,
    "p3_boolean_rate": p3_boolean_rate,
    "p4_set_membership": p4_set_membership,
    "p5_numeric_threshold": p5_numeric_threshold,
    "pr1_projection": pr1_projection,
    "pr2_derived_columns": pr2_derived_columns,
    "pr3_type_casts": pr3_type_casts,
    "pr4_display_format": pr4_display_format,
    "s2_top10_by_aggregate": s2_top10_by_aggregate,
    "s3_sort_by_aggregate": s3_sort_by_aggregate,
    "s4_head_after_sort": s4_head_after_sort,
    "s5_value_counts": s5_value_counts,
}

ORACLES = {
    "q0_snapshot_topk": """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        WHERE event_type = 'error'
        ORDER BY ts DESC, event_id DESC
        LIMIT 500
    """,
    "p1_equality_filter": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderstatus = 'F'
    """,
    "p2_substring_filter": """
        SELECT o_orderkey, o_orderpriority
        FROM orders WHERE o_orderpriority LIKE '%URGENT%'
    """,
    "p3_boolean_rate": """
        SELECT sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) * 100.0
                   / count(*) AS stp_rate_pct,
               count(*) AS n_rows
        FROM lineitem
    """,
    "p4_set_membership": """
        SELECT l_orderkey, l_linenumber, l_returnflag
        FROM lineitem WHERE l_returnflag NOT IN ('A', 'R')
    """,
    "p5_numeric_threshold": """
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_totalprice > 300000.0
    """,
    "pr1_projection": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        FROM lineitem
    """,
    "pr2_derived_columns": """
        SELECT l_orderkey,
               l_linenumber,
               cast(round(cast(l_extendedprice AS decimal(12,4))
                          * cast(1 - l_discount AS decimal(6,4)), 2) AS double) AS revenue,
               cast(round(cast(l_extendedprice AS decimal(12,4))
                          * cast(1 - l_discount AS decimal(6,4))
                          * cast(1 + l_tax AS decimal(6,4)), 2) AS double) AS charge,
               CASE WHEN l_returnflag = 'R' OR l_extendedprice > 50000
                    THEN 'High' ELSE 'Normal' END AS priority,
               l_returnflag NOT IN ('A', 'R') AS stp_eligible
        FROM lineitem
    """,
    "pr3_type_casts": """
        SELECT o_orderkey,
               cast(o_orderdate AS date) AS order_date,
               cast(o_orderkey AS varchar) AS orderkey_str,
               cast(cast(o_totalprice AS decimal(18,2)) AS double) AS total_price_2dp
        FROM orders
    """,
    "pr4_display_format": """
        SELECT o_orderkey,
               '$' || printf('%.2f', o_totalprice) AS total_price_usd,
               printf('%.6f', o_totalprice / 1000.0) AS price_k_6dp
        FROM orders
    """,
    "s2_top10_by_aggregate": """
        SELECT user_id,
               cast(sum(cast(value AS decimal(38,6))) AS double) AS total_value
        FROM events GROUP BY user_id
        ORDER BY total_value DESC, user_id LIMIT 10
    """,
    "s3_sort_by_aggregate": """
        SELECT event_type,
               cast(sum(cast(value AS decimal(38,6))) AS double) AS total_value
        FROM events GROUP BY event_type
        ORDER BY total_value DESC, event_type
    """,
    "s4_head_after_sort": """
        SELECT event_id, ts, event_type, value
        FROM events ORDER BY ts ASC, event_id ASC LIMIT 20
    """,
    "s5_value_counts": """
        SELECT event_type, count(*) AS n
        FROM events GROUP BY event_type ORDER BY n DESC, event_type
    """,
}
