"""Time-window aggregation (SURVEY.md W1/A8, reference dashboard.py:236-243).

The reference floors timestamps to the minute with pandas
(``df.timestamp.dt.floor("1min")``) and recomputes a groupby over the
last <=5000 rows on every 5 s poll. Here the same computation is a
declarative plan over the full table: ``date_trunc`` + hash aggregation,
which Catalyst executes as partial (map-side) + final aggregation — one
shuffle keyed by minute, no working-set cap. The streaming twin (same
expressions over ``F.window`` with a watermark) lives in
``streaming/windowed.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import dsum, oracle_dsum
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def minute_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute event count + value sum — the flagship query (W1/A8).

    Mirrors dashboard.py:236-243 (`{trade_id: count, notional_value:
    sum}` per minute) on the ``events`` stream table.
    """
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .orderBy("minute_ts")
    )


def tumbling_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation via Spark's native ``window()`` (struct start/end
    flattened to plain columns so the schema stays oracle-comparable)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window(F.col("ts"), "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


def sliding_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute window, 5-minute slide (SURVEY.md W6 gap-fill)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window(F.col("ts"), "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


def cascaded_rollup_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascaded continuous aggregate: raw events →
    minute rollup → hour rollup → day rollup, where each level
    aggregates the PREVIOUS level's partials, never the raw rows.

    This is the mergeability contract that makes streaming rollups and
    incremental materialized views work at 100 TB: counts and exact
    decimal sums re-sum, min/max re-min/re-max, and the average is
    derived once at the end from (sum, count) — so a day is computable
    from 24 hourly rows instead of billions of events. The oracle
    aggregates the raw table directly in one pass; parity proves the
    cascade is lossless, which holds ONLY because the sums are exact
    decimals (cascading float sums would re-associate and drift)."""
    ev = load(spark, "events", sf_dir)
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )

    def up(df: DataFrame, unit: str) -> DataFrame:
        return df.groupBy(
            F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sv").alias("sv"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )

    day = up(up(minute, "hour"), "day")
    return day.select(
        F.col("bucket_ts").alias("day_ts"),
        "n_events",
        F.col("sv").cast("double").alias("total_value"),
        (F.col("sv").cast("double") / F.col("n_events")).alias("avg_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
    ).orderBy("day_ts")


def minute_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute DISTINCT active users — the batch twin of
    ``streaming/windowed.py::minute_distinct_stream`` (which realizes
    the same semantics online via chained dedup -> count, since
    streaming aggs cannot COUNT(DISTINCT) directly). Catalyst expands
    this to the same two-phase plan: dedup on (minute, user) with
    map-side combine, then count per minute."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute_ts"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("minute_ts")
    )


QUERIES = {
    "w1_minute_activity": minute_activity,
    "w11_minute_distinct_users": minute_distinct_users,
    "w9_cascaded_rollup": cascaded_rollup_day,
    "w1_tumbling_window": tumbling_window_activity,
    "w6_sliding_window": sliding_window_activity,
}

ORACLES = {
    "w11_minute_distinct_users": """
        SELECT date_trunc('minute', ts) AS minute_ts,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    # One-pass aggregation of the raw table: the cascaded
    # minute→hour→day plan must be indistinguishable from it.
    "w9_cascaded_rollup": """
        SELECT cast(date_trunc('day', ts) AS timestamp) AS day_ts,
               count(*) AS n_events,
               cast(sum(cast(value AS decimal(38,6))) AS double)
                   AS total_value,
               cast(sum(cast(value AS decimal(38,6))) AS double) / count(*)
                   AS avg_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "w1_minute_activity": f"""
        SELECT date_trunc('minute', ts) AS minute_ts,
               count(*) AS n_events,
               {oracle_dsum('value', 'sum_value')}
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "w1_tumbling_window": f"""
        SELECT date_trunc('minute', ts) AS window_start,
               date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
               count(*) AS n_events,
               {oracle_dsum('value', 'sum_value')}
        FROM events
        GROUP BY 1, 2
        ORDER BY 1
    """,
    # Each event lands in two 10-min/5-min-slide windows: the one starting
    # at floor(ts,10min) and the one 5 minutes before/after depending on
    # the half. Expressed by duplicating rows over the two window starts.
    # make_timestamp(us), NOT to_timestamp: to_timestamp returns
    # TIMESTAMPTZ and the cast back shifts by the DuckDB host timezone.
    "w6_sliding_window": f"""
        WITH placed AS (
            SELECT make_timestamp(cast((floor(epoch(ts) / 300) * 300 - offs.o)
                                       * 1000000 AS bigint)) AS window_start,
                   value
            FROM events
            CROSS JOIN (SELECT unnest([0, 300]) AS o) offs
        )
        SELECT window_start,
               count(*) AS n_events,
               {oracle_dsum('value', 'sum_value')}
        FROM placed
        GROUP BY 1
        ORDER BY 1
    """,
}
