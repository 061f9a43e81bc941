"""W7 stream-static join: every streamed trade is enriched from the
broadcast dimension, and stream output equals the batch join."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark import generator
from real_time_streaming_system_with_apache_kafka_spark.streaming import enrich, ingest, sinks


def test_stream_static_join_matches_batch(spark, tmp_path):
    wire = tmp_path / "wire"
    base = generator.trades(spark, 1_000)
    ingest.to_wire_json(base).coalesce(2).write.mode("overwrite").text(str(wire))
    dim = enrich.instrument_dim(spark)

    stream = ingest.read_trade_stream_from_json_dir(spark, str(wire))
    enriched = enrich.enrich_trades(stream, dim)
    q = sinks.start_memory_sink(enriched, "enriched")
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT trade_id, instrument_rank, risk_weight, risk_exposure FROM enriched"
    ).collect()

    batch = enrich.enrich_trades(
        ingest.parse_wire(spark.read.text(str(wire))), dim
    ).select("trade_id", "instrument_rank", "risk_weight", "risk_exposure")
    want = batch.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # Every trade matched the dimension (left join found all keys).
    assert all(r["risk_weight"] is not None for r in got)
    assert len(got) == 1_000


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """W7 stream-stream: the watermarked interval join must produce the
    same pairs as the batch-mode join over the same data."""
    from pyspark.sql import functions as F

    wire = tmp_path / "wire2"
    base = generator.trades(spark, 3_000)
    ingest.to_wire_json(base).coalesce(2).write.mode("overwrite").text(str(wire))

    stream = ingest.read_trade_stream_from_json_dir(spark, str(wire))
    joined = enrich.join_breaks_to_settlements(stream)
    q = sinks.start_memory_sink(joined, "bs_join")
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, spark.sql(
            "SELECT break_trade_id, settle_trade_id FROM bs_join"
        ).collect())
    )

    batch = ingest.parse_wire(spark.read.text(str(wire)))
    want = sorted(
        map(
            tuple,
            enrich.join_breaks_to_settlements(batch)
            .select("break_trade_id", "settle_trade_id")
            .collect(),
        )
    )
    assert got == want
    assert len(got) > 0  # ~2% breaks over 3000 trades with a 10m window
