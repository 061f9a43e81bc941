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


QUERIES = {
    "w1_minute_activity": minute_activity,
    "w1_tumbling_window": tumbling_window_activity,
    "w6_sliding_window": sliding_window_activity,
}

ORACLES = {
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
