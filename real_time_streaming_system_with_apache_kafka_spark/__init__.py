"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference real-time trade pipeline
(XueXinping18/Real-Time-Streaming-System-with-Apache-Kafka).

The reference is producer.py -> Kafka -> consumer.py -> PostgreSQL ->
dashboard.py (pandas). This engine re-expresses that surface Spark-first:

- batch analytics as lazy DataFrame plans optimized by Catalyst
  (``operators/``),
- the synthetic trade stream as seeded column expressions
  (``generator.py``, reference producer.py:11-128),
- ingest + dedup + windowed aggregation as Structured Streaming
  (``streaming/``, reference consumer.py + dashboard.py:236-243),
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal column plumbing) sized for large clusters.

Everything here uses only the public PySpark API.
"""

from real_time_streaming_system_with_apache_kafka_spark.session import get_session

__all__ = ["get_session"]
