"""The reference dashboard's analytic surface, query for query
(dashboard.py:74-288), over the engine's own trade stream.

A user of the reference pipeline runs ~10 chart/KPI computations
against the Postgres snapshot every 5 s; these are the same
computations as lazy Spark plans over the seeded trade generator —
each function cites the dashboard lines it reproduces. Driver check is
rows-only (the inputs are generated, not oracle tables); the numeric
semantics are covered by the oracle-checked A*/S*/W* twins on the star
schema and by the generator's invariant tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import dsum, ratio
from real_time_streaming_system_with_apache_kafka_spark.generator import trades

N_TRADES = 20_000


def _trades(spark: SparkSession) -> DataFrame:
    return trades(spark, N_TRADES)


def dash_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI row (dashboard.py:74-87): totals, status counts, STP rate,
    settlement/break rates, avg fee bps — one pass, one row."""
    t = _trades(spark)
    n = F.count(F.lit(1))
    notional = F.sum(F.col("notional_value").cast("decimal(38,2)"))
    fees = F.sum(F.col("total_fees").cast("decimal(38,2)"))
    settled = F.sum(F.when(F.col("status") == "Settled", 1).otherwise(0))
    pending = F.sum(F.when(F.col("status").contains("Pending"), 1).otherwise(0))
    breaks = F.sum(F.when(F.col("status").contains("Break"), 1).otherwise(0))
    stp = F.sum(F.col("stp_eligible").cast("int"))
    return t.agg(
        n.alias("total_trades"),
        notional.cast("double").alias("total_notional"),
        fees.cast("double").alias("total_fees"),
        settled.alias("settled_count"),
        pending.alias("pending_count"),
        breaks.alias("break_count"),
        # ratio(): the reference's div-by-zero-guarded rate arithmetic
        # (dashboard.py:83-87 ternaries) — one definition for all rates.
        ratio(stp, n, "stp_rate_pct"),
        ratio(settled, n, "settlement_rate_pct"),
        ratio(breaks, n, "break_rate_pct"),
        ratio(fees, notional, "avg_fee_bps", scale=10_000),
        ratio(notional, n, "avg_trade_size", scale=1),
    )


def dash_status_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status pie (dashboard.py:131-132 value_counts)."""
    t = _trades(spark)
    return (
        t.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("status"))
    )


def dash_asset_class_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notional by asset class, sorted (dashboard.py:145-146)."""
    t = _trades(spark)
    return (
        t.groupBy("asset_class")
        .agg(dsum(F.col("notional_value").cast("double"), "notional"))
        .orderBy(F.col("notional").desc(), F.col("asset_class"))
    )


def dash_counterparty_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 counterparty exposure (dashboard.py:164-165)."""
    t = _trades(spark)
    return (
        t.groupBy("counterparty")
        .agg(dsum(F.col("notional_value").cast("double"), "notional"))
        .orderBy(F.col("notional").desc(), F.col("counterparty"))
        .limit(10)
    )


def dash_venue_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Settlement venue counts (dashboard.py:181-182)."""
    t = _trades(spark)
    return (
        t.groupBy("settlement_venue")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("settlement_venue"))
    )


def dash_fee_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fee composition pie (dashboard.py:200-207): one agg + unpivot."""
    t = _trades(spark)
    agged = t.agg(
        dsum(F.col("brokerage_fee").cast("double"), "b"),
        dsum(F.col("clearing_fee").cast("double"), "c"),
        dsum(F.col("exchange_fee").cast("double"), "e"),
    )
    return agged.selectExpr(
        "stack(3, 'Brokerage', b, 'Clearing', c, 'Exchange', e) AS (fee_type, amount)"
    )


def dash_side_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buy/Sell notional split (dashboard.py:220)."""
    t = _trades(spark)
    return (
        t.groupBy("side")
        .agg(dsum(F.col("notional_value").cast("double"), "notional"))
        .orderBy("side")
    )


def dash_minute_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute trade count + notional (dashboard.py:236-243)."""
    t = _trades(spark)
    return (
        t.groupBy(F.date_trunc("minute", F.col("timestamp")).alias("minute_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            dsum(F.col("notional_value").cast("double"), "notional"),
        )
        .orderBy("minute_ts")
    )


def dash_breaks_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Break alert table: 6 columns, latest 10 (dashboard.py:117-122)."""
    t = _trades(spark)
    return (
        t.filter(F.col("status").contains("Break"))
        .orderBy(F.col("timestamp").desc(), F.col("trade_id"))
        .limit(10)
        .select("trade_id", "instrument", "counterparty", "status", "notional_value", "timestamp")
    )


def dash_recent_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent trades table: 11 columns, latest 20 (dashboard.py:275-288)
    incl. the display formatting (PR4)."""
    t = _trades(spark)
    return (
        t.orderBy(F.col("timestamp").desc(), F.col("trade_id"))
        .limit(20)
        .select(
            "trade_id",
            "timestamp",
            "asset_class",
            "instrument",
            "side",
            F.col("quantity").cast("double").alias("quantity"),
            F.format_string("%.4f", F.col("price").cast("double")).alias("price_fmt"),
            F.format_string("$%.2f", F.col("notional_value").cast("double")).alias("notional_fmt"),
            "counterparty",
            "status",
            "priority",
        )
    )


QUERIES = {
    "dash_kpis": dash_kpis,
    "dash_status_distribution": dash_status_distribution,
    "dash_asset_class_exposure": dash_asset_class_exposure,
    "dash_counterparty_top10": dash_counterparty_top10,
    "dash_venue_distribution": dash_venue_distribution,
    "dash_fee_mix": dash_fee_mix,
    "dash_side_split": dash_side_split,
    "dash_minute_activity": dash_minute_activity,
    "dash_breaks_table": dash_breaks_table,
    "dash_recent_trades": dash_recent_trades,
}
ORACLES: dict[str, str] = {}
