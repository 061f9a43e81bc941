"""applyInPandasWithState contract: state carries across micro-batches
and final cumulative totals equal the batch recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark import generator
from real_time_streaming_system_with_apache_kafka_spark.streaming import (
    ingest,
    sinks,
    stateful,
)


def test_exposure_tracker_state_across_batches(spark, tmp_path):
    wire = tmp_path / "wire"
    base = generator.trades(spark, 1_000)
    # Two files -> two micro-batches (maxFilesPerTrigger=1).
    ingest.to_wire_json(base).coalesce(2).write.mode("overwrite").text(str(wire))

    stream = ingest.read_trade_stream_from_json_dir(
        spark, str(wire), max_files_per_trigger=1
    )
    tracked = stateful.exposure_tracker(stream, limit=5e8)
    q = sinks.start_memory_sink(tracked, "exposure", output_mode="append")
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM exposure").collect()
    assert len(out) > 0
    # Per counterparty: the max cum_notional must equal the batch-mode
    # total, and cum_trades must reach the batch-mode count.
    want = {
        r["counterparty"]: (float(r["total"]), r["n"])
        for r in base.groupBy("counterparty")
        .agg(
            F.sum(F.col("notional_value").cast("double")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    got: dict[str, tuple[float, int]] = {}
    emissions: dict[str, int] = {}
    for r in out:
        cp = r["counterparty"]
        emissions[cp] = emissions.get(cp, 0) + 1
        prev = got.get(cp, (0.0, 0))
        got[cp] = (max(prev[0], r["cum_notional"]), max(prev[1], r["cum_trades"]))
    assert set(got) == set(want)
    for cp in want:
        assert got[cp][1] == want[cp][1]
        assert got[cp][0] == pytest.approx(want[cp][0], rel=1e-9)
    # State actually persisted across batches: at least one counterparty
    # emitted more than once (8 counterparties, 2 batches of 500).
    assert max(emissions.values()) == 2
