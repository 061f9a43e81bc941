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
