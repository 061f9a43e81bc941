"""Storage layout for scale: partitioned and bucketed tables.

The two layout levers the task's optimization checklist calls for:

- **Partitioning** (``partitionBy`` on a low-cardinality column, e.g.
  trade_date): queries filtering on the partition column prune whole
  directories at planning time — the scan never touches excluded days.
- **Bucketing** (``bucketBy`` on a join/agg key): both sides of a join
  bucketed on the same key with the same bucket count co-locate, so
  the join runs with NO shuffle exchange on the bucketed sides — the
  difference between O(data) network and zero at 100 TB.

Bucketed tables need a session catalog (``saveAsTable``); partitioned
parquet works against plain paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Directory-partitioned parquet: one subdirectory per value."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Hash-bucketed catalog table, sorted within buckets on the key so
    joins can run sort-merge without exchange or sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
