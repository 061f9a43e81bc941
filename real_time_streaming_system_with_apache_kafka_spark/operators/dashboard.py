"""The reference dashboard's analytic surface, query for query
(dashboard.py:74-288), over the engine's own trade stream.

A user of the reference pipeline runs ~10 chart/KPI computations
against the Postgres snapshot every 5 s; these are the same
computations as lazy Spark plans over the seeded trade generator —
each function cites the dashboard lines it reproduces.

Oracle strategy (r5): the generator is xxhash64-seeded and therefore
not re-expressible in ANSI SQL, but it IS deterministic — so a GOLDEN
PARQUET FIXTURE of ``trades(seed=42, n=20000)`` is committed at
``tests/fixtures/trades_seed42_n20000.parquet``, pinned bit-for-bit to
the live generator by ``tests/test_dashboard_oracles.py`` (any
generator drift fails the pin test before it can skew an oracle). Each
dash oracle recomputes the frame in DuckDB from ``read_parquet`` of
the fixture while the Spark side runs the real generator, making these
full-path hash checks: generator == fixture (pytest) AND aggregation
logic == SQL twin (driver hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import dsum, ratio
from real_time_streaming_system_with_apache_kafka_spark.generator import TRADES_FIXTURE, trades

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
        .select(
            "trade_id",
            "instrument",
            "counterparty",
            "status",
            # double, not decimal: DuckDB's Python DECIMAL values strip
            # trailing zeros and hash-mismatch Spark's fixed-scale ones.
            F.col("notional_value").cast("double").alias("notional_value"),
            "timestamp",
        )
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
# DuckDB twins over the pinned generator fixture (module docstring).
# `_T` is the 20k-trade table; dsum twins follow functions/exact.py.
_T = f"read_parquet('{TRADES_FIXTURE}')"
# NOTE: DuckDB's decimal->double cast rounds twice (int128 -> double,
# then /10^scale) and drifts 1 ulp above ~2^53 scaled units; casting
# the exact decimal through varchar parses it with a single correct
# rounding, matching Spark's BigDecimal.doubleValue exactly.
_DSUM_NOTIONAL = (
    "cast(cast(sum(cast(cast(notional_value AS double) AS decimal(38,6)))"
    " AS varchar) AS double)"
)

ORACLES: dict[str, str] = {
    "dash_kpis": f"""
        SELECT count(*) AS total_trades,
               cast(cast(sum(cast(notional_value AS decimal(38,2)))
                   AS varchar) AS double) AS total_notional,
               cast(cast(sum(cast(total_fees AS decimal(38,2)))
                   AS varchar) AS double) AS total_fees,
               cast(sum(CASE WHEN status = 'Settled' THEN 1 ELSE 0 END)
                   AS bigint) AS settled_count,
               cast(sum(CASE WHEN status LIKE '%Pending%' THEN 1 ELSE 0 END)
                   AS bigint) AS pending_count,
               cast(sum(CASE WHEN status LIKE '%Break%' THEN 1 ELSE 0 END)
                   AS bigint) AS break_count,
               CASE WHEN count(*) = 0 THEN 0.0
                    ELSE cast(sum(cast(stp_eligible AS int)) AS double)
                         / cast(count(*) AS double) * 100 END
                   AS stp_rate_pct,
               CASE WHEN count(*) = 0 THEN 0.0
                    ELSE cast(sum(CASE WHEN status = 'Settled'
                                       THEN 1 ELSE 0 END) AS double)
                         / cast(count(*) AS double) * 100 END
                   AS settlement_rate_pct,
               CASE WHEN count(*) = 0 THEN 0.0
                    ELSE cast(sum(CASE WHEN status LIKE '%Break%'
                                       THEN 1 ELSE 0 END) AS double)
                         / cast(count(*) AS double) * 100 END
                   AS break_rate_pct,
               CASE WHEN sum(cast(notional_value AS decimal(38,2))) = 0
                    THEN 0.0
                    ELSE cast(sum(cast(total_fees AS decimal(38,2)))
                              AS double)
                         / cast(sum(cast(notional_value AS decimal(38,2)))
                                AS double) * 10000 END
                   AS avg_fee_bps,
               CASE WHEN count(*) = 0 THEN 0.0
                    ELSE cast(sum(cast(notional_value AS decimal(38,2)))
                              AS double)
                         / cast(count(*) AS double) * 1 END
                   AS avg_trade_size
        FROM {_T}
    """,
    "dash_status_distribution": f"""
        SELECT status, count(*) AS n
        FROM {_T}
        GROUP BY status
        ORDER BY n DESC, status
    """,
    "dash_asset_class_exposure": f"""
        SELECT asset_class, {_DSUM_NOTIONAL} AS notional
        FROM {_T}
        GROUP BY asset_class
        ORDER BY notional DESC, asset_class
    """,
    "dash_counterparty_top10": f"""
        SELECT counterparty, {_DSUM_NOTIONAL} AS notional
        FROM {_T}
        GROUP BY counterparty
        ORDER BY notional DESC, counterparty
        LIMIT 10
    """,
    "dash_venue_distribution": f"""
        SELECT settlement_venue, count(*) AS n
        FROM {_T}
        GROUP BY settlement_venue
        ORDER BY n DESC, settlement_venue
    """,
    "dash_fee_mix": f"""
        WITH agged AS (
            SELECT
                cast(cast(sum(cast(cast(brokerage_fee AS double)
                    AS decimal(38,6))) AS varchar) AS double) AS b,
                cast(cast(sum(cast(cast(clearing_fee AS double)
                    AS decimal(38,6))) AS varchar) AS double) AS c,
                cast(cast(sum(cast(cast(exchange_fee AS double)
                    AS decimal(38,6))) AS varchar) AS double) AS e
            FROM {_T}
        )
        SELECT 'Brokerage' AS fee_type, b AS amount FROM agged
        UNION ALL SELECT 'Clearing', c FROM agged
        UNION ALL SELECT 'Exchange', e FROM agged
    """,
    "dash_side_split": f"""
        SELECT side, {_DSUM_NOTIONAL} AS notional
        FROM {_T}
        GROUP BY side
        ORDER BY side
    """,
    "dash_minute_activity": f"""
        SELECT date_trunc('minute', timestamp) AS minute_ts,
               count(*) AS n_trades,
               {_DSUM_NOTIONAL} AS notional
        FROM {_T}
        GROUP BY 1
        ORDER BY minute_ts
    """,
    "dash_breaks_table": f"""
        SELECT trade_id, instrument, counterparty, status,
               cast(notional_value AS double) AS notional_value, timestamp
        FROM {_T}
        WHERE status LIKE '%Break%'
        ORDER BY timestamp DESC, trade_id
        LIMIT 10
    """,
    "dash_recent_trades": f"""
        SELECT trade_id, timestamp, asset_class, instrument, side,
               cast(quantity AS double) AS quantity,
               printf('%.4f', cast(price AS double)) AS price_fmt,
               printf('$%.2f', cast(notional_value AS double))
                   AS notional_fmt,
               counterparty, status, priority
        FROM {_T}
        ORDER BY timestamp DESC, trade_id
        LIMIT 20
    """,
}
