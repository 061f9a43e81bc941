"""Stream-static enrichment join (SURVEY.md §2.9 W7 gap-fill).

The canonical streaming enrichment: each micro-batch of the trade
stream joins a static (slowly-changing) dimension — here an instrument
reference table — with the small side broadcast, so the stream never
shuffles. The same plan at 100 TB/day: static dim cached on executors,
per-batch broadcast hash join, zero stream-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.generator import INSTRUMENTS


def instrument_dim(spark) -> DataFrame:
    """Static instrument reference dimension derived from the
    generator's ticker map (producer.py:42-48): one row per
    (asset_class, instrument) with a synthetic risk weight."""
    rows = [
        (cls, tick, i, round(0.5 + 0.1 * (i % 5), 1))
        for cls, ticks in INSTRUMENTS.items()
        for i, tick in enumerate(ticks)
    ]
    return spark.createDataFrame(
        rows, "asset_class string, instrument string, instrument_rank int, risk_weight double"
    )


def enrich_trades(trades: DataFrame, dim: DataFrame) -> DataFrame:
    """W7: stream-static broadcast join + derived risk exposure."""
    return (
        trades.join(F.broadcast(dim), ["asset_class", "instrument"], "left")
        .withColumn(
            "risk_exposure",
            F.round(F.col("notional_value").cast("double") * F.col("risk_weight"), 2),
        )
    )


def join_breaks_to_settlements(
    trades: DataFrame,
    max_lag: str = "10 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """W7 stream-stream interval join: each break event matched to
    settled trades of the same counterparty within ``max_lag`` after
    it — the "did the break clear quickly" correlation.

    Both sides carry watermarks and the join predicate bounds the time
    range, so Spark can expire buffered state on both sides — the
    requirement for an unbounded stream-stream join to run with finite
    memory.

    State sizing (the r8 envelope investigation): Spark keeps ONE
    global watermark per query — with the default
    ``spark.sql.streaming.multipleWatermarkPolicy=min`` the two sides'
    delays collapse to the minimum, so ASYMMETRIC per-side watermark
    delays do NOT shrink join state (and policy=max trades correctness
    for it). The state knobs that actually work are (a) the range
    predicate — break-side buffers hold ``max_lag + delay`` of event
    time, settle-side ``delay`` — and (b) the watermark delay itself.

    The per-batch join cost is STATE-DEPENDENT (probe + eviction scale
    with buffered rows), so the range predicate is a THROUGHPUT knob,
    not just a memory knob — the r8 join-lag A/B measured it directly:
    with max_lag=10m the 10k rows/s run death-spirals (state ramps
    16.6k -> 67.5k rows while batch durations climb 8 -> 114 s);
    cutting the event-time horizon 12 -> 4 min (max_lag=2m) bounds the
    SAME load with a 6.5-6.8k-row plateau and batches that recover
    from transients (STREAM_SOAK_r8_ctl/_tightlag.json). Sizing rule:
    budget the per-box rate against (max_lag + delay) x match-key
    cardinality, and tighten the business predicate before adding
    boxes.
    """
    breaks = (
        trades.filter(F.col("status").contains("Break"))
        .select(
            F.col("trade_id").alias("break_trade_id"),
            F.col("counterparty").alias("break_cpty"),
            F.col("timestamp").alias("break_ts"),
        )
        .withWatermark("break_ts", watermark)
    )
    settled = (
        trades.filter(F.col("status") == "Settled")
        .select(
            F.col("trade_id").alias("settle_trade_id"),
            F.col("counterparty").alias("settle_cpty"),
            F.col("timestamp").alias("settle_ts"),
        )
        .withWatermark("settle_ts", watermark)
    )
    return breaks.join(
        settled,
        (F.col("break_cpty") == F.col("settle_cpty"))
        & (F.col("settle_ts") >= F.col("break_ts"))
        & (F.col("settle_ts") <= F.col("break_ts") + F.expr(f"INTERVAL {max_lag}")),
    ).select("break_trade_id", "break_cpty", "break_ts", "settle_trade_id", "settle_ts")
