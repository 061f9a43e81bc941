"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark 4 arbitrary-state API (state store v2) that supersedes
``applyInPandasWithState`` for new work: typed named state handles,
timers, and TTL live on a ``StatefulProcessor`` object instead of a
closure signature.

Same operator class as ``stateful.exposure_tracker`` (per-key running
totals across micro-batches) so the two APIs are directly comparable
in this repo; the equivalence test asserts both reach the batch-mode
totals. State is one small tuple per key in the state store, rows
arrive as Arrow batches, and nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("venue", T.StringType()),
        T.StructField("batch_trades", T.LongType()),
        T.StructField("cum_trades", T.LongType()),
        T.StructField("cum_quantity", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum_trades", T.LongType()),
        T.StructField("cum_quantity", T.DoubleType()),
    ]
)


class VenueTotalsProcessor(StatefulProcessor):
    """Running per-venue totals: the minimal value-state processor."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        batch_trades = 0
        batch_qty = 0.0
        for pdf in rows:
            batch_trades += len(pdf)
            batch_qty += float(pdf["quantity"].astype(float).sum())
        if self._totals.exists():
            cum_trades, cum_qty = self._totals.get()
        else:
            cum_trades, cum_qty = 0, 0.0
        cum_trades += batch_trades
        cum_qty += batch_qty
        self._totals.update((cum_trades, cum_qty))
        yield pd.DataFrame(
            {
                "venue": [key[0]],
                "batch_trades": [batch_trades],
                "cum_trades": [cum_trades],
                "cum_quantity": [cum_qty],
            }
        )

    def close(self) -> None:
        pass


def venue_totals(trades: DataFrame) -> DataFrame:
    """Per-venue running trade count + quantity across micro-batches,
    on the state-v2 API."""
    return (
        trades.select(
            F.col("settlement_venue").alias("venue"),
            F.col("quantity").cast("double"),
        )
        .groupBy("venue")
        .transformWithStateInPandas(
            VenueTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
