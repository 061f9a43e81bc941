"""Central query registry.

Each operator module exports ``QUERIES`` (name -> callable(spark, sf_dir)
-> DataFrame) and ``ORACLES`` (name -> DuckDB SQL twin, omitted for
non-SQL-expressible operators). ``__spark_entry__.py`` re-exports the
merged registry; the names are the SURVEY.md §2 operator IDs.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES: list[str] = [
    "real_time_streaming_system_with_apache_kafka_spark.operators.windows",
    "real_time_streaming_system_with_apache_kafka_spark.operators.relational",
    "real_time_streaming_system_with_apache_kafka_spark.operators.aggregates",
    "real_time_streaming_system_with_apache_kafka_spark.operators.joins",
    "real_time_streaming_system_with_apache_kafka_spark.operators.scalars",
    "real_time_streaming_system_with_apache_kafka_spark.generator",
    "real_time_streaming_system_with_apache_kafka_spark.operators.dedup",
    "real_time_streaming_system_with_apache_kafka_spark.operators.text",
    "real_time_streaming_system_with_apache_kafka_spark.operators.similarity",
    "real_time_streaming_system_with_apache_kafka_spark.operators.multimodal",
    "real_time_streaming_system_with_apache_kafka_spark.operators.analytics",
    "real_time_streaming_system_with_apache_kafka_spark.operators.tpch",
    "real_time_streaming_system_with_apache_kafka_spark.operators.tpch_full",
    "real_time_streaming_system_with_apache_kafka_spark.operators.dashboard",
    "real_time_streaming_system_with_apache_kafka_spark.operators.extras",
    "real_time_streaming_system_with_apache_kafka_spark.operators.timeseries",
    "real_time_streaming_system_with_apache_kafka_spark.operators.sampling",
    "real_time_streaming_system_with_apache_kafka_spark.operators.pipeline_analytics",
    "real_time_streaming_system_with_apache_kafka_spark.operators.curation",
]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(mod_name)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query id {name!r} in {mod_name}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name in oracles:
                raise ValueError(f"duplicate oracle id {name!r} in {mod_name}")
            oracles[name] = textwrap.dedent(sql).strip()
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
