"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 gap-fill; pyspark guide "Stateful" pattern).

Running per-counterparty exposure tracking: state = (cumulative
notional, cumulative trade count) per counterparty, carried across
micro-batches by the state store; each batch emits the updated running
totals plus a breach flag. This is the operator class the built-in
windowed aggregates can't express — arbitrary per-key state machines
(lifecycle tracking, CUSUM alerting, enrichment caches).

Scale notes: state is keyed by counterparty (bounded domain), Arrow
batches carry the rows, and the kernel is a self-contained closure
(pickled by value — no package needed on worker PYTHONPATH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("counterparty", T.StringType()),
        T.StructField("batch_notional", T.DoubleType()),
        T.StructField("cum_notional", T.DoubleType()),
        T.StructField("cum_trades", T.LongType()),
        T.StructField("breach", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum_notional", T.DoubleType()),
        T.StructField("cum_trades", T.LongType()),
    ]
)


def make_exposure_tracker(limit: float):
    """Build the per-key state kernel as a self-contained closure."""

    def track(key, pdf_iter, state):
        batch_notional = 0.0
        batch_trades = 0
        for pdf in pdf_iter:
            batch_notional += float(pdf["notional_value"].astype(float).sum())
            batch_trades += len(pdf)
        cum_notional, cum_trades = (
            state.get if state.exists else (0.0, 0)
        )
        cum_notional += batch_notional
        cum_trades += batch_trades
        state.update((cum_notional, cum_trades))
        import pandas as _pd

        yield _pd.DataFrame(
            {
                "counterparty": [key[0]],
                "batch_notional": [batch_notional],
                "cum_notional": [cum_notional],
                "cum_trades": [cum_trades],
                "breach": [cum_notional > limit],
            }
        )

    return track


def exposure_tracker(trades: DataFrame, limit: float = 1e9) -> DataFrame:
    """Per-counterparty running exposure with breach flag — a custom
    per-key state machine the windowed aggregates can't express."""
    return (
        trades.select("counterparty", F.col("notional_value").cast("double"))
        .groupBy("counterparty")
        .applyInPandasWithState(
            make_exposure_tracker(limit),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            "NoTimeout",
        )
    )
