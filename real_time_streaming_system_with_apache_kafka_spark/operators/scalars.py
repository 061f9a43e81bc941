"""Scalar function surface (SURVEY.md §2.8, F1-F14).

The reference's scalar usage: substring checks (dashboard.py:80-81),
string slicing for ids (producer.py:108), strftime formatting
(producer.py:118-119), date arithmetic for settlement T+N
(producer.py:87-97), timestamp truncation (dashboard.py:237), rounding
(producer.py:64-84), JSON encode/decode on the wire (producer.py:136,
consumer.py:17), conditional expressions (producer.py:100-102).

All of it maps to built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, zero Python in the row loop. The random/UUID/
faker generation functions (F10/F11/F14) are exercised by the seeded
generator (``generator.py``) and its statistical tests rather than
oracle queries, since their reference semantics are non-deterministic.

The extension tables add the nested surface the reference lacks:
JSON path extraction over ``events.props`` (F12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def f_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: contains, LIKE, substring/slice, case, concat, length."""
    ev = load(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.col("event_type").contains("rr").alias("has_rr"),
        F.col("event_type").like("s%").alias("starts_s"),
        F.substring("event_type", 1, 3).alias("type3"),
        F.upper("event_type").alias("type_upper"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("type_user"),
        F.length("event_type").alias("type_len"),
    )


def f_hash_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F11: deterministic 12-char id — the seeded replacement for the
    reference's ``str(uuid4())[:12]`` (producer.py:108): md5 of the
    natural key, sliced. Reproducible across engines and runs."""
    ev = load(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.substring(F.md5(F.concat_ws("#", "event_id", "event_type")), 1, 12).alias(
            "synthetic_id"
        ),
    )


def f_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: date add/sub/diff — the settlement-date T+N computation
    (producer.py:89-97) over order dates, with a per-status offset."""
    orders = load(spark, "orders", sf_dir)
    odate = F.col("o_orderdate").cast("date")
    settle_days = F.when(F.col("o_orderstatus") == "O", 2).otherwise(1)
    return orders.select(
        "o_orderkey",
        odate.alias("order_date"),
        F.date_add(odate, settle_days).alias("settlement_date"),
        F.date_sub(odate, 3).alias("lookback_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), odate).alias("days_to_2002"),
    )


def f_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: strftime-style formatting (producer.py:118-119 ``%Y-%m-%d``)."""
    orders = load(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_ymd"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    )


def f_timestamp_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6/F7: truncation (dashboard.py:237 ``dt.floor``) + part
    extraction."""
    ev = load(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
    )


def f_rounding_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9: round/floor/ceil/abs and arithmetic chains
    (producer.py:78-84 fee-bps pipeline). Round runs on an exact
    decimal cast so both engines agree at halfway points."""
    ev = load(spark, "events", sf_dir)
    vdec = F.col("value").cast("decimal(12,4)")
    return ev.select(
        "event_id",
        F.round(vdec, 1).cast("double").alias("value_1dp"),
        F.floor("value").alias("value_floor"),
        F.ceil("value").alias("value_ceil"),
        F.abs(F.col("value") - 250).alias("dist_from_250"),
        (vdec * 100).cast("double").alias("value_bps"),
        F.pmod(F.col("event_id"), F.lit(7)).alias("id_mod7"),
    )


def f_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: CASE/WHEN ladder — the priority classification
    (producer.py:100-102) generalized to a value-tier bucketing."""
    ev = load(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 400, "high")
        .when(F.col("value") >= 100, "mid")
        .otherwise("low")
        .alias("value_tier"),
        F.when(F.col("event_type") == "error", "High")
        .otherwise("Normal")
        .alias("priority"),
    )


def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: JSON path extraction over ``events.props`` — the nested
    surface the reference handles with ``json.loads`` (consumer.py:17),
    as a codegen'd path expression with a typed cast."""
    ev = load(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("prop_k_mod10"),
    )


def f_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4 native): ``parse_json``
    shreds ``events.props`` into the binary VARIANT encoding once, and
    typed ``variant_get`` path extractions drive an aggregation — the
    open-schema analytics pattern (ingest JSON without a declared
    schema, pay the parse once, query typed thereafter). At 100 TB
    VARIANT beats per-query ``get_json_object`` re-parsing and keeps
    shredded columns prunable. The VARIANT itself never crosses the
    output boundary (engines disagree on its client surface); only
    typed scalars exit."""
    ev = load(spark, "events", sf_dir)
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .orderBy("k_bucket")
    )


def f_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface (extension — SURVEY §2.8 notes the reference
    has none): build a map<string,string> per event, then keys/values/
    lookup/cardinality/membership. Output columns are map-DERIVED
    SCALAR types only: engines disagree on how a raw map column
    surfaces to clients (DuckDB returns a key/value struct-of-lists),
    and array columns are unsortable/unhashable in a pandas-based
    result canonicalizer — so the map AND the keys/values arrays stay
    inside the plan, flattened to '|'-joined strings at the output
    boundary (key order is the literal insertion order in both
    engines)."""
    ev = load(spark, "events", sf_dir)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
        F.lit("bucket"), F.when(F.col("value") > 500, "hi").otherwise("lo"),
    )
    return ev.select(
        "event_id",
        F.concat_ws("|", F.map_keys(m)).alias("mk"),
        F.concat_ws("|", F.map_values(m)).alias("mv"),
        F.element_at(m, F.lit("bucket")).alias("bucket"),
        F.size(m).alias("n_entries"),
        F.map_contains_key(m, F.lit("k")).alias("has_k"),
    )


QUERIES = {
    "f_string_funcs": f_string_funcs,
    "f_hash_id": f_hash_id,
    "f_date_arithmetic": f_date_arithmetic,
    "f_date_format": f_date_format,
    "f_timestamp_parts": f_timestamp_parts,
    "f_rounding_math": f_rounding_math,
    "f_conditional": f_conditional,
    "f_json_extract": f_json_extract,
    "f_variant_funcs": f_variant_funcs,
    "f_map_funcs": f_map_funcs,
}

ORACLES = {
    "f_variant_funcs": """
        SELECT cast(json_extract_string(props, '$.k') AS int) % 10
                   AS k_bucket,
               count(*) AS n_events,
               cast(sum(cast(json_extract_string(props, '$.k') AS int))
                    AS bigint) AS sum_k,
               cast(sum(cast(value AS decimal(38,6))) AS double) AS sum_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "f_string_funcs": """
        SELECT event_id,
               contains(event_type, 'rr') AS has_rr,
               event_type LIKE 's%' AS starts_s,
               substr(event_type, 1, 3) AS type3,
               upper(event_type) AS type_upper,
               event_type || '-' || cast(user_id AS varchar) AS type_user,
               cast(length(event_type) AS int) AS type_len
        FROM events
    """,
    "f_hash_id": """
        SELECT event_id,
               substr(md5(cast(event_id AS varchar) || '#' || event_type), 1, 12)
                   AS synthetic_id
        FROM events
    """,
    "f_date_arithmetic": """
        SELECT o_orderkey,
               cast(o_orderdate AS date) AS order_date,
               cast(cast(o_orderdate AS date)
                    + to_days(CASE WHEN o_orderstatus = 'O' THEN 2 ELSE 1 END)
                    AS date) AS settlement_date,
               cast(cast(o_orderdate AS date) - to_days(3) AS date) AS lookback_date,
               cast(datediff('day', cast(o_orderdate AS date), date '2002-01-01')
                    AS int) AS days_to_2002
        FROM orders
    """,
    "f_date_format": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_ymd,
               strftime(o_orderdate, '%Y-%m') AS order_month
        FROM orders
    """,
    "f_timestamp_parts": """
        SELECT event_id,
               date_trunc('hour', ts) AS ts_hour,
               cast(year(ts) AS int) AS y,
               cast(month(ts) AS int) AS m,
               cast(day(ts) AS int) AS d,
               cast(hour(ts) AS int) AS h,
               cast(minute(ts) AS int) AS mi
        FROM events
    """,
    "f_rounding_math": """
        SELECT event_id,
               cast(round(cast(value AS decimal(12,4)), 1) AS double) AS value_1dp,
               cast(floor(value) AS bigint) AS value_floor,
               cast(ceil(value) AS bigint) AS value_ceil,
               abs(value - 250) AS dist_from_250,
               cast(cast(value AS decimal(12,4)) * 100 AS double) AS value_bps,
               event_id % 7 AS id_mod7,
        FROM events
    """,
    "f_conditional": """
        SELECT event_id,
               CASE WHEN value >= 400 THEN 'high'
                    WHEN value >= 100 THEN 'mid'
                    ELSE 'low' END AS value_tier,
               CASE WHEN event_type = 'error' THEN 'High' ELSE 'Normal' END AS priority
        FROM events
    """,
    "f_json_extract": """
        SELECT event_id,
               cast(json_extract_string(props, '$.k') AS int) AS prop_k,
               cast(json_extract_string(props, '$.k') AS int) % 10 AS prop_k_mod10
        FROM events
    """,
    "f_map_funcs": """
        WITH mapped AS (
            SELECT event_id,
                   map(['type', 'k', 'bucket'],
                       [event_type,
                        json_extract_string(props, '$.k'),
                        CASE WHEN value > 500 THEN 'hi' ELSE 'lo' END]) AS m
            FROM events
        )
        SELECT event_id,
               array_to_string(map_keys(m), '|') AS mk,
               array_to_string(map_values(m), '|') AS mv,
               m['bucket'][1] AS bucket,  -- map extraction yields a 1-elem list
               cast(cardinality(m) AS int) AS n_entries,
               list_contains(map_keys(m), 'k') AS has_k
        FROM mapped
    """,
}
