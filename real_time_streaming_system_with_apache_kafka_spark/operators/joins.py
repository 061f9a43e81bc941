"""Joins, window functions, set operations (SURVEY.md §2.3/§2.5/§2.7).

The reference has a single table and NO joins/window-functions/set-ops
(SURVEY.md §2.3: verified absent from producer/consumer/dashboard).
These are the gap-fill relational operators the star-schema oracle
suite requires, written scale-first:

- The fact-to-fact join (lineitem x orders) shuffles on the join key;
  every dimension (customer/nation/region, each orders-of-magnitude
  smaller) is explicitly ``F.broadcast`` so the 100 TB fact table never
  shuffles for them.
- Per-group top-K uses a rank window, which Spark executes with a
  single hash exchange on the partition key — no global sort.
- The as-of join is the composition pattern (union + last-ignoring-
  nulls window), not a cross join: cost is one shuffle on user_id,
  robust at any scale. DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import (
    ORACLE_REVENUE_SUM,
    dsum,
    revenue_dec,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
    load,
    load_rebalanced,
)


def j1_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact x fact x broadcast-dims star join — revenue by nation
    for one year (TPC-H Q5 shape). Dims broadcast; facts shuffle once
    on the join key."""
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load(spark, "customer", sf_dir)
    nat = load(spark, "nation", sf_dir)
    reg = load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_dec().cast("decimal(38,6)")).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: LEFT SEMI (EXISTS) — customers who placed an urgent order."""
    cust = load(spark, "customer", sf_dir)
    urgent = load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: LEFT ANTI (NOT EXISTS) — parts never shipped."""
    part = load(spark, "part", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_retailprice")
    )


def j4_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: range/interval-predicate join — parts classified into price
    bands. The band table is tiny and broadcast, so the theta join is a
    broadcast nested loop over a handful of rows per input row."""
    part = load(spark, "part", sf_dir)
    bands = spark.createDataFrame(
        [("budget", 0.0, 930.0), ("mid", 930.0, 960.0), ("premium", 960.0, 10000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), dsum(F.col("p_retailprice"), "total_price"))
        .orderBy("band")
    )


def j5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (window gap-fill, SURVEY.md §2.5): top-3 line items per
    return flag by price — rank window with deterministic tie-breaks,
    one exchange on the group key, no global sort. Rebalanced load so
    the map-side WindowGroupLimit prune runs at machine width even on
    a degenerate single-rowgroup input (no-op on well-laid-out data)."""
    li = load_rebalanced(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("l_returnflag", "rank", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


def wf_lag_lead_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (gap-fill, SURVEY.md §2.5): per-user
    lag/lead and a decimal-exact running sum in event-time order."""
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(38,6)")).over(wsum).cast("double").alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator; Spark lacks a native one): for each
    error event, the most recent signup ts of the same user at-or-before
    it. Implemented as union + last(ignore-nulls) window — a single
    shuffle on user_id, no per-key cross product; DuckDB's native ASOF
    JOIN serves as the oracle."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("event_type").isin("error", "signup")
    )
    # Signups sort before errors at equal ts (tag 0 < 1) so the match is
    # inclusive, matching ASOF's `s.ts <= e.ts`.
    tagged = ev.withColumn(
        "tag", F.when(F.col("event_type") == "signup", 0).otherwise(1)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    signup_ts = F.last(
        F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("signup_ts", signup_ts)
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            F.col("ts").alias("error_ts"),
            "user_id",
            "signup_ts",
        )
    )


def j6_outer_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: left-outer dim->fact with null-group semantics — every
    customer with order count and spend, zero-filled for order-less
    customers. Both sides shuffle once on the key and the aggregation
    reuses that partitioning (no second exchange); the preserved side
    of an outer join can't broadcast, so this is the honest at-scale
    plan."""
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    orders = load(spark, "orders", sf_dir).select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")),
                F.lit(0).cast("decimal(38,6)"),
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


def j7_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: full-outer reconciliation of two aggregates — per-user click
    activity vs purchase activity, keeping users present on either side
    (the standard two-pipeline diff/reconcile shape). Completes the join
    surface: equi/broadcast (j1), semi (j2), anti (j3), range (j4),
    as-of, left-outer (j6), full-outer (here).

    Scale shape: both inputs aggregate FIRST (map-side combine on
    user_id), so the full-outer join — which can never broadcast, both
    sides preserved — joins two already-shrunk keyed aggregates that
    share the user_id hash partitioning; AQE coalesces the post-join
    partitions."""
    ev = load(spark, "events", sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("cu"))
        .agg(F.count(F.lit(1)).alias("n_clicks"), dsum(F.col("value"), "click_value"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("pu"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum(F.col("value"), "purchase_value"),
        )
    )
    return (
        clicks.join(purchases, clicks.cu == purchases.pu, "full")
        .select(
            F.coalesce(F.col("cu"), F.col("pu")).alias("user_id"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("click_value"), F.lit(0.0)).alias("click_value"),
            F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
            F.coalesce(F.col("purchase_value"), F.lit(0.0)).alias("purchase_value"),
            (F.col("cu").isNotNull() & F.col("pu").isNotNull()).alias("on_both"),
        )
    )


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two overlapping event selections."""
    ev = load(spark, "events", sf_dir)
    a = ev.filter(F.col("value") > 400).select("event_id", "event_type", "value")
    b = ev.filter(F.col("event_type") == "click").select("event_id", "event_type", "value")
    return a.union(b).distinct()


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two event selections."""
    ev = load(spark, "events", sf_dir)
    a = ev.filter(F.col("value") > 400).select("event_id", "event_type", "value")
    b = ev.filter(F.col("event_type") == "click").select("event_id", "event_type", "value")
    return a.intersect(b)


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) of two event selections. ``subtract`` is the
    SQL-EXCEPT twin; exceptAll().distinct() would diverge when a row
    appears in both sides with different multiplicities."""
    ev = load(spark, "events", sf_dir)
    a = ev.filter(F.col("value") > 400).select("event_id", "event_type", "value")
    b = ev.filter(F.col("event_type") == "click").select("event_id", "event_type", "value")
    return a.subtract(b)


QUERIES = {
    "j1_star_join_revenue": j1_star_join_revenue,
    "j2_semi_join": j2_semi_join,
    "j3_anti_join": j3_anti_join,
    "j4_range_join": j4_range_join,
    "j5_topk_per_group": j5_topk_per_group,
    "j6_outer_join_coverage": j6_outer_join_coverage,
    "j7_full_outer_reconcile": j7_full_outer_reconcile,
    "wf_lag_lead_running": wf_lag_lead_running,
    "asof_join_events": asof_join_events,
    "setop_union_distinct": setop_union_distinct,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
}

ORACLES = {
    "j1_star_join_revenue": f"""
        SELECT n_name, {ORACLE_REVENUE_SUM} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= timestamp '1996-01-01'
          AND o_orderdate < timestamp '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "j2_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    "j3_anti_join": """
        SELECT p_partkey, p_name, p_retailprice
        FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    "j4_range_join": """
        SELECT band, count(*) AS n_parts,
               cast(sum(cast(p_retailprice AS decimal(38,6))) AS double) AS total_price
        FROM part
        JOIN (VALUES ('budget', 0.0, 930.0),
                     ('mid', 930.0, 960.0),
                     ('premium', 960.0, 10000.0)) AS bands(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
        ORDER BY band
    """,
    "j5_topk_per_group": """
        SELECT l_returnflag, cast(rank AS int) AS rank,
               l_orderkey, l_linenumber, l_extendedprice
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_extendedprice DESC,
                                               l_orderkey, l_linenumber) AS rank
            FROM lineitem
        )
        WHERE rank <= 3
    """,
    "j6_outer_join_coverage": """
        SELECT c_custkey, c_name,
               count(o_orderkey) AS n_orders,
               cast(coalesce(sum(cast(o_totalprice AS decimal(38,6))),
                             0) AS double) AS total_spent
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "j7_full_outer_reconcile": """
        WITH clicks AS (
            SELECT user_id AS cu, count(*) AS n_clicks,
                   cast(sum(cast(value AS decimal(38,6))) AS double)
                       AS click_value
            FROM events WHERE event_type = 'click' GROUP BY user_id
        ),
        purchases AS (
            SELECT user_id AS pu, count(*) AS n_purchases,
                   cast(sum(cast(value AS decimal(38,6))) AS double)
                       AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        )
        SELECT coalesce(cu, pu) AS user_id,
               coalesce(n_clicks, 0) AS n_clicks,
               coalesce(click_value, 0.0) AS click_value,
               coalesce(n_purchases, 0) AS n_purchases,
               coalesce(purchase_value, 0.0) AS purchase_value,
               cu IS NOT NULL AND pu IS NOT NULL AS on_both
        FROM clicks FULL JOIN purchases ON cu = pu
    """,
    "wf_lag_lead_running": """
        SELECT user_id, event_id, ts, value,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               cast(sum(cast(value AS decimal(38,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS double) AS running_value,
               cast(row_number() OVER w AS int) AS seq
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "asof_join_events": """
        SELECT e.event_id, e.ts AS error_ts, e.user_id, s.ts AS signup_ts
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON e.user_id = s.user_id AND s.ts <= e.ts
    """,
    "setop_union_distinct": """
        SELECT event_id, event_type, value FROM events WHERE value > 400
        UNION
        SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    """,
    "setop_intersect": """
        SELECT event_id, event_type, value FROM events WHERE value > 400
        INTERSECT
        SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    """,
    "setop_except": """
        SELECT event_id, event_type, value FROM events WHERE value > 400
        EXCEPT
        SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    """,
}
