"""End-to-end demo of the engine: the reference pipeline, Spark-first.

    python examples/pipeline_demo.py [n_trades]

Generates a seeded trade stream, serializes it through the JSON wire
format, streams it back in (file source standing in for Kafka —
swap in streaming/kafka_io.py builders when a broker is available),
deduplicates with a watermark, runs the dashboard analytics + break
alerting, and prints the result frames the reference renders as charts
(dashboard.py:74-288).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_streaming_system_with_apache_kafka_spark import get_session
from real_time_streaming_system_with_apache_kafka_spark.generator import trades, with_duplicates
from real_time_streaming_system_with_apache_kafka_spark.streaming import (
    enrich,
    ingest,
    sinks,
    windowed,
)


def main(n_trades: int = 20_000) -> None:
    spark = get_session("pipeline_demo")
    wire_dir = tempfile.mkdtemp(prefix="trades_wire_")

    # Producer path (SRC1/SRC2): seeded generator -> JSON wire, with
    # duplicate deliveries injected to exercise idempotent ingest.
    duplicated = with_duplicates(trades(spark, n_trades), every_n=25)
    ingest.to_wire_json(duplicated).coalesce(8).write.mode("overwrite").text(wire_dir)
    print(f"produced {duplicated.count()} wire messages (incl. duplicates) -> {wire_dir}")

    # Consumer path (SRC4/SRC5/W4): decode + watermark-scoped dedup.
    stream = ingest.read_trade_stream_from_json_dir(spark, wire_dir)
    deduped = ingest.dedup_trades(stream)
    enriched = enrich.enrich_trades(deduped, enrich.instrument_dim(spark))

    q = sinks.start_memory_sink(enriched, "trades_live")
    alerts = sinks.start_memory_sink(
        windowed.break_alerts(stream), "break_alerts"
    )
    q.processAllAvailable()
    alerts.processAllAvailable()
    q.stop()
    alerts.stop()

    live = spark.sql("SELECT * FROM trades_live")
    print(f"\ningested {live.count()} unique trades (duplicates dropped)")

    print("\n== Status distribution (dashboard.py:131) ==")
    live.groupBy("status").count().orderBy("count", ascending=False).show(truncate=False)

    print("== Per-minute activity (dashboard.py:236) ==")
    live.createOrReplaceTempView("trades_v")
    spark.sql(
        """
        SELECT date_trunc('minute', timestamp) AS minute, count(*) AS n,
               cast(sum(cast(notional_value AS decimal(38,2))) AS double) AS notional
        FROM trades_v GROUP BY 1 ORDER BY 1 LIMIT 10
        """
    ).show(truncate=False)

    print("== Break alerts (dashboard.py:117) ==")
    spark.sql(
        "SELECT trade_id, instrument, status, notional_value "
        "FROM break_alerts ORDER BY timestamp DESC LIMIT 10"
    ).show(truncate=False)

    print("== Top counterparty risk exposure (enriched stream-static join) ==")
    live.groupBy("counterparty").agg(
        {"risk_exposure": "sum"}
    ).withColumnRenamed("sum(risk_exposure)", "exposure").orderBy(
        "exposure", ascending=False
    ).show(5, truncate=False)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000)
