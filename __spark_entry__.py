"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-minute windowed aggregation
(SURVEY.md §7.1 step 2, reference dashboard.py:236-243) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``real_time_streaming_system_with_apache_kafka_spark.registry`` — one
entry per SURVEY.md §2 operator ID, each with a DuckDB SQL twin where
the semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_streaming_system_with_apache_kafka_spark import registry
from real_time_streaming_system_with_apache_kafka_spark.operators.windows import minute_activity

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return minute_activity(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible entry in ``queries()``."""
    return registry.all_oracles()
