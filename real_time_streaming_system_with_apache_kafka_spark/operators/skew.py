"""Skew-resilient aggregation and join shapes (scale extension).

The reference computes every aggregate over a ≤5000-row snapshot
(dashboard.py:236-243) where skew cannot matter; at 100 TB the events
table's 5-value ``event_type`` key is the textbook pathological case —
a plain hash aggregation or shuffle join on it lands each hot key on
ONE reducer regardless of cluster size.

Two mitigations, each proven result-identical to the naive plan by its
DuckDB oracle:

- **Salted two-phase aggregation**: partial-aggregate on
  (key, salt = id mod S) so every hot key fans out over S reducers,
  then merge the S partials per key. The second shuffle moves only
  keys x S rows — nothing at corpus scale. (Spark's own map-side
  partial aggregation already gives this fan-out for algebraic
  aggregates; the explicit salt stage is the form that also covers
  high-cardinality state like exact distinct counts per hot key, and
  is the shape AQE cannot synthesize for hash aggregations.)

- **Salted replicate join**: when the probe side is skewed and the
  build side is too big to broadcast whole but small per-key, the
  build side is exploded S ways (one copy per salt) and the join key
  becomes (key, salt) — every hot key's probe rows spread over S
  tasks. AQE's skew-join split handles sort-merge spills at runtime;
  the explicit salt is the deterministic plan-level form that also
  works for hash joins and streaming micro-batches.

S = 16 here; at 1000 executors you size S to the observed hot-key row
share (or derive it from a count-min sketch pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

N_SALT = 16


def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type totals via salted two-phase aggregation.

    Phase 1 groups on (event_type, event_id mod {N_SALT}) — the hot
    keys spread over {N_SALT} reducers; phase 2 merges the partials
    (keys x {N_SALT} rows, trivially small). The oracle is the plain
    one-phase GROUP BY: salting must be invisible in the result.
    Distinct counts are the case that NEEDS this shape: count(distinct)
    per hot key keeps per-group state, so map-side partial aggregation
    alone does not spread it."""
    ev = load(spark, "events", sf_dir)
    partial = (
        ev.withColumn("salt", F.pmod("event_id", F.lit(N_SALT)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sv"),
        )
    )
    # Distinct users cannot be merged by summing per-salt distincts
    # (users appear under many salts), so the salt phase for the
    # distinct metric keys on (event_type, user_id mod S) instead:
    # each user lands under exactly one salt and per-salt distincts
    # add up exactly.
    dpartial = (
        ev.withColumn("usalt", F.pmod("user_id", F.lit(N_SALT)))
        .groupBy("event_type", "usalt")
        .agg(F.count_distinct("user_id").alias("du"))
    )
    merged = partial.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.sum("sv").cast("double").alias("total_value"),
    )
    dmerged = dpartial.groupBy("event_type").agg(
        F.sum("du").alias("n_users")
    )
    return (
        merged.join(dmerged, "event_type")
        .select("event_type", "n_events", "n_users", "total_value")
        .orderBy("event_type")
    )


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to a per-user attribute table with an explicit
    salted replicate join, aggregated to per-tier totals.

    The build side (distinct user -> tier) is exploded {N_SALT} ways;
    the probe side computes salt = event_id mod {N_SALT}; the join key
    is (user_id, salt). Row count and totals must equal the plain
    join's — the oracle joins without salt. The broadcast hint is
    deliberately absent: the shape under test is the shuffle join a
    too-big-to-broadcast build side forces at 100 TB."""
    ev = load(spark, "events", sf_dir)
    # Deterministic per-user attribute derived from the data itself
    # (stand-in for a big user-profile dim).
    users = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") >= 20, "heavy")
            .when(F.col("n") >= 10, "mid")
            .otherwise("light")
            .alias("tier"),
        )
    )
    replicated = users.select(
        "user_id",
        "tier",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt"),
    )
    salted = ev.select(
        "user_id",
        "value",
        F.pmod("event_id", F.lit(N_SALT)).alias("salt"),
    )
    joined = salted.join(replicated, ["user_id", "salt"])
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("tier")
    )


QUERIES = {
    "agg_salted_skew": agg_salted_skew,
    "join_salted_skew": join_salted_skew,
}

ORACLES = {
    # The oracles are the UNSALTED plans: the mitigation must be
    # invisible in the result.
    "agg_salted_skew": """
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               cast(sum(cast(value AS decimal(38,6))) AS double) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "join_salted_skew": """
        WITH users AS (
            SELECT user_id,
                   CASE WHEN count(*) >= 20 THEN 'heavy'
                        WHEN count(*) >= 10 THEN 'mid'
                        ELSE 'light' END AS tier
            FROM events GROUP BY user_id
        )
        SELECT tier,
               count(*) AS n_events,
               count(DISTINCT e.user_id) AS n_users,
               cast(sum(cast(value AS decimal(38,6))) AS double) AS total_value
        FROM events e JOIN users u ON e.user_id = u.user_id
        GROUP BY tier
        ORDER BY tier
    """,
}
