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

# Bias added to signed longs before fixed-width string encoding so the
# lexicographic order equals the numeric order for NEGATIVE values too
# (a bare lpad would sort "-5" after "0"). 2^62 covers every timestamp
# from roughly year -144000 to +148000 and any id in [-2^62, 2^62).
_ORD_BIAS = 2**62  # 4611686018427387904


def _ordkey() -> "F.Column":
    """Total order over (ts, event_id) as a fixed-width string — the
    composite arg-min/arg-max key shared by ts_resample_locf and
    ts_ohlc_bars (DuckDB's arg_max can't take a composite). Values are
    bias-shifted by 2^62 before lpad so the string order is correct for
    all longs in [-2^62, 2^62), including pre-1970 timestamps and
    negative ids; the biased value is < 2^63, at most 19 digits, so
    lpad-20 keeps it fixed-width."""
    return F.concat(
        F.lpad((F.unix_micros("ts") + _ORD_BIAS).cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad((F.col("event_id") + _ORD_BIAS).cast("string"), 20, "0"),
    )


def ts_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample per user with last-observation-carried-forward:
    one row per (user, day) over each user's own active span; days with
    no events carry the previous day's close and n_events = 0.

    The daily close picks the row with max (ts, event_id) — a total
    order, so the survivor is engine-deterministic even on tied
    timestamps."""
    ev = load(spark, "events", sf_dir)
    ordkey = _ordkey()
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


def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlestick bars per event_type — the canonical
    market-data rollup the reference's dashboard approximates with its
    per-minute aggregates (dashboard.py:236-243). Open/close pick the
    rows with min/max (ts, event_id), a total order, so the bar is
    engine-deterministic on tied timestamps; the volume sum is
    decimal-exact then cast to double (single conversion, identical in
    both engines). One hash aggregation, map-side partial combine."""
    ev = load(spark, "events", sf_dir)
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bar_hour")
    ).agg(
        F.min_by("value", _ordkey()).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", _ordkey()).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("volume"),
    )


def ts_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap profile: count, exact total/max gap in
    microseconds, and how many gaps exceed one hour — the monitoring
    query behind heartbeat/liveness alerting. All outputs are exact
    64-bit integers; the lag window and the aggregation share the
    user_id partitioning, so the plan is one shuffle."""
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        (F.count(F.lit(1))).alias("n_events"),
        F.sum("gap_us").alias("sum_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.count_if(F.col("gap_us") > HOUR_US).alias("n_gaps_over_1h"),
    )


def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier counts per event_type without any
    cross-engine float math: |x - mean| > 2*stddev is rewritten as
    (x*n - S)^2 > 4*(n*S2 - S^2) over exact integer sums of the
    2-dp-quantized value (x scaled by 100), with n/S/S2 held in
    decimal(38,0) to match the oracle's 128-bit hugeint. Exact bound:
    the largest term is (x*n - S)^2 <= (|x|max * n)^2, which stays
    under 10^38 for |value| <= 10^5 up to ~10^14 rows per group —
    comfortably past 100 TB. Beyond that, divide by n first. Two
    passes over the same grouped shuffle — Catalyst reuses the
    exchange."""
    ev = load(spark, "events", sf_dir).select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(19,0)")
        .alias("x"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2"),
    )
    flagged = ev.join(F.broadcast(stats), "event_type").withColumn(
        "is_anomaly",
        (F.col("x") * F.col("n") - F.col("s1"))
        * (F.col("x") * F.col("n") - F.col("s1"))
        > F.lit(4)
        * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if("is_anomaly").alias("n_anomalies_2sigma"),
    )


def ts_ewma_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average as a custom
    stateful operator — the genuinely non-SQL-window shape (each output
    depends on the full prefix) implemented with Arrow-batched
    ``applyInPandas`` over the user partition.

    The recurrence runs on integer cents with floor division,
    s_t = (x_t + 3*s_{t-1}) div 4 (alpha = 1/4), so every engine that
    follows the recurrence gets bit-identical output — the DuckDB
    oracle is a recursive CTE, and matching it exactly is the point:
    iterative operators usually get a weaker rows-only check, this one
    doesn't have to.

    Scale: one shuffle on user_id; the Python loop is O(rows per user)
    per group with int64 locals — per-entity history lengths are
    bounded in practice (and the groups parallelize across executors).
    """
    import pandas as pd

    ev = load(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("x"),
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"]).reset_index(drop=True)
        xs = pdf["x"].to_numpy()
        out = xs.copy()
        for i in range(1, len(out)):
            out[i] = (xs[i] + 3 * out[i - 1]) // 4
        pdf["ewma_cents"] = out
        return pdf[["user_id", "event_id", "ewma_cents"]]

    return ev.groupBy("user_id").applyInPandas(
        ewma, "user_id long, event_id long, ewma_cents long"
    )


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: collapse each user's
    event_type stream into validity intervals [valid_from, valid_to)
    with a version number — the standard dimension-history shape a
    warehouse derives from a change stream. Change detection is
    lag() != current over the (ts, event_id) total order; interval
    close is lead() over the change rows. Both windows share the
    user_id partitioning: one shuffle."""
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    changes = (
        ev.withColumn("prev_state", F.lag("event_type").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
    )
    wc = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wc).alias("valid_to"),
        F.row_number().over(wc).alias("version"),
    )


def ts_vwap_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly VWAP bars per event_type — the volume-weighted average
    price every execution-quality dashboard plots next to the OHLC
    candles (the reference's dashboard keeps per-minute mean price,
    dashboard.py:236-243; VWAP is the size-aware version). Price is
    ``value`` quantized to exact integer cents (the proven
    ``anomaly_zscore`` 2dp shape); size is the ``props`` JSON ``k``
    field (the proven ``f_json_extract`` pairing). Every output is an
    exact integer: the notional/size sums accumulate in decimal(38,0)
    (hugeint in the oracle) and vwap_cents is one truncating integer
    division, guarded with greatest(size, 1) because k = 0 rows exist
    and an all-zero-size bar would divide by zero (null in Spark,
    error in DuckDB).

    Scale shape: one hash aggregation with map-side partial combine —
    the same single-shuffle plan as ``ts_ohlc_bars``; group count is
    bounded by event_types x hours, not row count."""
    ev = load(spark, "events", sf_dir).select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar_hour"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(19,0)")
        .alias("px"),
        F.get_json_object("props", "$.k").cast("bigint").alias("sz"),
    )
    return ev.groupBy("event_type", "bar_hour").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("sz").cast("bigint").alias("total_size"),
        F.expr(
            "cast(cast(sum(px * sz) AS decimal(38,0))"
            " div greatest(cast(sum(sz) AS decimal(38,0)), 1) AS bigint)"
        ).alias("vwap_cents"),
        F.expr(
            "cast(cast(sum(px * sz) AS decimal(38,0)) div 100 AS bigint)"
        ).alias("notional_whole"),
    )


QUERIES = {
    "ts_resample_locf": ts_resample_locf,
    "wf_range_frame": wf_range_frame,
    "ts_ohlc_bars": ts_ohlc_bars,
    "ts_gap_stats": ts_gap_stats,
    "anomaly_zscore": anomaly_zscore,
    "ts_ewma_exact": ts_ewma_exact,
    "scd2_user_state": scd2_user_state,
    "ts_vwap_bars": ts_vwap_bars,
}

ORACLES = {
    "ts_resample_locf": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   arg_max(value,
                           lpad(cast(epoch_us(ts) + 4611686018427387904
                                     AS varchar), 20, '0')
                           || '|' ||
                           lpad(cast(event_id + 4611686018427387904
                                     AS varchar), 20, '0')) AS close,
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
    "ts_ohlc_bars": """
        SELECT event_type, date_trunc('hour', ts) AS bar_hour,
               arg_min(value,
                       lpad(cast(epoch_us(ts) + 4611686018427387904
                                 AS varchar), 20, '0')
                       || '|' ||
                       lpad(cast(event_id + 4611686018427387904
                                 AS varchar), 20, '0')) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value,
                       lpad(cast(epoch_us(ts) + 4611686018427387904
                                 AS varchar), 20, '0')
                       || '|' ||
                       lpad(cast(event_id + 4611686018427387904
                                 AS varchar), 20, '0')) AS close,
               count(*) AS n_trades,
               cast(sum(cast(value AS decimal(38,6))) AS double) AS volume
        FROM events
        GROUP BY 1, 2
    """,
    "ts_gap_stats": """
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id) AS gap_us
            FROM events
        )
        SELECT user_id, count(*) AS n_events,
               cast(sum(gap_us) AS bigint) AS sum_gap_us,
               max(gap_us) AS max_gap_us,
               count(*) FILTER (WHERE gap_us > 3600000000)
                   AS n_gaps_over_1h
        FROM g GROUP BY user_id
    """,
    "anomaly_zscore": """
        WITH q AS (
            SELECT event_type,
                   cast(cast(value AS decimal(18,2)) * 100 AS hugeint) AS x
            FROM events
        ),
        s AS (
            SELECT event_type, cast(count(*) AS hugeint) AS n,
                   cast(sum(x) AS hugeint) AS s1,
                   cast(sum(x * x) AS hugeint) AS s2
            FROM q GROUP BY 1
        )
        SELECT q.event_type, count(*) AS n_events,
               count(*) FILTER (WHERE (x*n - s1)*(x*n - s1)
                                      > 4*(n*s2 - s1*s1))
                   AS n_anomalies_2sigma
        FROM q JOIN s USING (event_type)
        GROUP BY q.event_type
    """,
    "ts_ewma_exact": """
        WITH RECURSIVE src AS (
            SELECT user_id, event_id,
                   cast(cast(value AS decimal(18,2)) * 100 AS bigint) AS x,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
                       AS rn
            FROM events
        ),
        rec AS (
            SELECT user_id, event_id, rn, x AS s FROM src WHERE rn = 1
            UNION ALL
            SELECT n.user_id, n.event_id, n.rn, (n.x + 3 * r.s) // 4
            FROM rec r
            JOIN src n ON n.user_id = r.user_id AND n.rn = r.rn + 1
        )
        SELECT user_id, event_id, s AS ewma_cents FROM rec
    """,
    "ts_vwap_bars": """
        WITH q AS (
            SELECT event_type, date_trunc('hour', ts) AS bar_hour,
                   cast(cast(value AS decimal(18,2)) * 100 AS hugeint)
                       AS px,
                   cast(json_extract_string(props, '$.k') AS hugeint)
                       AS sz
            FROM events
        )
        SELECT event_type, bar_hour,
               cast(count(*) AS bigint) AS n_trades,
               cast(sum(sz) AS bigint) AS total_size,
               cast(sum(px * sz) // greatest(sum(sz), 1) AS bigint)
                   AS vwap_cents,
               cast(sum(px * sz) // 100 AS bigint) AS notional_whole
        FROM q GROUP BY 1, 2
    """,
    "scd2_user_state": """
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER w AS prev_state
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id)
        ),
        changes AS (
            SELECT * FROM ordered
            WHERE prev_state IS NULL OR prev_state <> event_type
        )
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               cast(row_number() OVER w AS int) AS version
        FROM changes
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id)
    """,
}
