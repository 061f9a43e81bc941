from real_time_streaming_system_with_apache_kafka_spark.functions.exact import (
    davg,
    dsum,
    ratio,
)

__all__ = ["dsum", "davg", "ratio"]
