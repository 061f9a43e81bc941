"""Kafka source/sink builders (SURVEY.md SRC2/SRC4).

Reference: kafka-python producer with per-message synchronous ack
(producer.py:134-168) and a single consumer in one group
(consumer.py:12-19). Spark equivalents below; partition->task mapping,
offset tracking (checkpoint, not group commit), and batched writes come
free.

The Kafka connector jar (``spark-sql-kafka-0-10``) and a broker are not
present in this environment, so these builders are exercised only for
plan construction; ``start()`` requires the package on the classpath
(``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
The file-based source in ``ingest.py`` produces the identical schema,
keeping every downstream operator source-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from real_time_streaming_system_with_apache_kafka_spark.streaming.ingest import (
    parse_wire,
    to_wire_json,
)


@dataclass
class KafkaConfig:
    bootstrap_servers: str = "localhost:9092"
    topic: str = "trades"
    starting_offsets: str = "earliest"  # consumer.py:15 auto_offset_reset


def read_trades_kafka(spark: SparkSession, cfg: KafkaConfig) -> DataFrame:
    """SRC4: Kafka -> typed trade rows (decode shared with file path)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("subscribe", cfg.topic)
        .option("startingOffsets", cfg.starting_offsets)
        .load()
    )
    return parse_wire(raw, value_col="value")


def write_trades_kafka(trades: DataFrame, cfg: KafkaConfig, checkpoint: str):
    """SRC2: JSON-encode and publish; returns the unstarted writer so
    callers control the trigger. Batched + async by design, vs the
    reference's flush-per-message (producer.py:166-168)."""
    return (
        to_wire_json(trades)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("topic", cfg.topic)
        .option("checkpointLocation", checkpoint)
    )
