"""Time-series operators beyond plain windowed aggregation: regular-
grid resampling with gap fill (the hypertable "rollup + locf" shape)
and value-range window frames.

The reference's dashboard recomputes per-minute aggregates over a
rolling snapshot (dashboard.py:236-243) but has no concept of an
explicit time spine or carried-forward values; these are the standard
time-series primitives a monitoring/feature pipeline adds on top.

Scale notes:
- The spine is generated per group with ``sequence`` + ``explode`` —
  O(groups x grid) narrow rows, no cross join against the fact table.
- LOCF is ``last(value, ignorenulls=True)`` over an ordered window —
  one shuffle on the group key, already required by the daily agg.
- The range frame is value-based (``rangeBetween`` on exact epoch
  micros), so tied timestamps land in the same frame on every engine
  and run order — no tie-break needed, unlike row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

HOUR_US = 3_600_000_000


def ts_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample per user with last-observation-carried-forward:
    one row per (user, day) over each user's own active span; days with
    no events carry the previous day's close and n_events = 0.

    The daily close picks the row with max (ts, event_id) — a total
    order, so the survivor is engine-deterministic even on tied
    timestamps. The key is a fixed-width string (epoch_us and ids are
    non-negative) because DuckDB's arg_max can't take a composite."""
    ev = load(spark, "events", sf_dir)
    ordkey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.max_by("value", ordkey).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )
    spine = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("d0"),
            F.date_trunc("day", F.max("ts")).alias("d1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("close", ignorenulls=True).over(w).alias("close_locf"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


def wf_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour sliding aggregate per event via a value-based
    RANGE frame (not a row frame): every event row carries the exact
    count and decimal-exact sum of that user's events in (ts - 1h, ts].
    """
    ev = load(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-(HOUR_US - 1), 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


QUERIES = {
    "ts_resample_locf": ts_resample_locf,
    "wf_range_frame": wf_range_frame,
}

ORACLES = {
    "ts_resample_locf": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   arg_max(value, lpad(cast(epoch_us(ts) AS varchar), 20, '0')
                                  || '|' ||
                                  lpad(cast(event_id AS varchar), 20, '0')) AS close,
                   count(*) AS n_events
            FROM events
            GROUP BY 1, 2
        ),
        spine AS (
            SELECT user_id,
                   unnest(generate_series(date_trunc('day', mn),
                                          date_trunc('day', mx),
                                          interval 1 day)) AS day
            FROM (SELECT user_id, min(ts) AS mn, max(ts) AS mx
                  FROM events GROUP BY user_id)
        )
        SELECT s.user_id, s.day,
               last_value(d.close IGNORE NULLS)
                   OVER (PARTITION BY s.user_id ORDER BY s.day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS close_locf,
               coalesce(d.n_events, 0) AS n_events
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    "wf_range_frame": """
        SELECT user_id, event_id, ts, value,
               count(*) OVER w AS n_trailing_1h,
               cast(sum(cast(value AS decimal(38,6))) OVER w AS double)
                   AS sum_trailing_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
    """,
}
