"""Product/corpus analytics shapes a warehouse user runs daily: staged
funnel conversion, cohort retention, explode-based term frequencies,
and Gopher-style repetition signals for corpus quality gating.

These complement the reference's dashboard aggregates (dashboard.py:
236-303 computes per-minute activity and distribution tables with
pandas) with the event-log analytics that only make sense at warehouse
scale — all pure DataFrame ops, one shuffle each on the natural key:

- Funnel: the three correlated "first event after previous stage"
  probes share ONE window partition on user_id — Spark plans a single
  exchange + sort reused by all three window frames, then a per-user
  reduce and a single-row summary. No self-joins, no N passes over the
  fact.
- Cohort retention: first-activity week via the same window partition,
  then a distinct (cohort, offset, user) reduce and a count — two
  shuffles total, both on keys that shrink the data.
- Term frequency: explode(split(text)) is the canonical corpus scan;
  the per-token count combines map-side before the single shuffle, and
  the top-K is TakeOrderedAndProject (no global sort).
- Repetition signals: per-document ratios are pure array expressions
  (codegen, zero shuffle); the per-source rollup is exact-decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import davg, oracle_davg
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence funnel over the events log: first view, first
    click strictly after that view, first purchase strictly after that
    click — per user, then one summary row with stage counts and
    conversion rates. All three stage timestamps are conditional
    window-mins over the SAME partition (user_id), so the plan carries
    one exchange; NULL stage times propagate 'never reached' through
    the > comparisons on both engines identically."""
    ev = load(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("fv", fv)
    fc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("fv")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("fc", fc)
    fp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fc")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("fp", fp)
    per_user = staged.groupBy("user_id").agg(
        F.min("fv").alias("fv"), F.min("fc").alias("fc"), F.min("fp").alias("fp")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("fv").alias("n_viewed"),
        F.count("fc").alias("n_clicked_after_view"),
        F.count("fp").alias("n_purchased_after_click"),
        (F.count("fc").cast("double") / F.count("fv")).alias("view_to_click"),
        (F.count("fp").cast("double") / F.count("fc")).alias("click_to_purchase"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by their
    first-activity week, counted in each later week they return.
    cohort week via a window-min on the user partition; the activity
    matrix is a distinct (cohort, offset, user) reduce then a count —
    the classic two-shuffle retention plan. Week offsets are exact
    (both weeks are Monday truncations, so the day diff is always a
    multiple of 7)."""
    ev = load(spark, "events", sf_dir).select("user_id", "ts")
    w = Window.partitionBy("user_id")
    marked = ev.select(
        "user_id",
        F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
        F.date_trunc("week", F.col("ts")).alias("activity_week"),
    )
    return (
        marked.select(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


def tokens_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequency: explode the whitespace tokens of
    every document and keep the top 25 terms (count desc, term asc for
    a deterministic set). The per-token partial count combines
    map-side, so the shuffle carries one row per distinct term per
    partition — vocabulary-bounded, not corpus-bounded — and the top-K
    is TakeOrderedAndProject."""
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(25)
    )


def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates rolled up per source: average
    duplicate-word fraction (1 - distinct/total), average word length,
    and the count of documents breaching a 60% repetition threshold.
    The per-document signals are pure array expressions — size/
    array_distinct/length run inside codegen on the scan, no shuffle
    until the tiny per-source rollup."""
    docs = load(spark, "documents", sf_dir)
    words = F.split("text", " ")
    n_words = F.size(words)
    n_distinct = F.array_size(F.array_distinct(words))
    dup_frac = F.lit(1.0) - n_distinct.cast("double") / n_words
    # text is single-space joined, so chars - (n-1) spaces = letter count
    mean_word_len = (
        (F.length("text") - n_words + F.lit(1)).cast("double") / n_words
    )
    sig = docs.select(
        "source",
        dup_frac.alias("dup_frac"),
        mean_word_len.alias("mean_word_len"),
        (dup_frac > 0.6).cast("int").alias("flagged"),
    )
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.col("dup_frac"), "avg_dup_frac"),
            davg(F.col("mean_word_len"), "avg_word_len"),
            F.sum("flagged").alias("n_flagged"),
        )
        .orderBy("source")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (previous event_type -> event_type) pair, the
    transition count and its share of all transitions — the behavioral
    fingerprint used for bot detection and session modeling.

    Scale shape: one lag window per user (one exchange on user_id,
    within-partition sort), one hash-agg over the 5x5 pair space, and
    a broadcast of the single-row grand total for the share — the
    share is one IEEE division of two exact counts, engine-identical."""
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            "event_type",
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = pairs.agg(F.sum("n_transitions").alias("total"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "prev_type",
            "event_type",
            "n_transitions",
            (F.col("n_transitions").cast("double") / F.col("total")).alias(
                "share"
            ),
        )
    )


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "tokens_top_terms": tokens_top_terms,
    "text_repetition_signals": text_repetition_signals,
    "event_transition_matrix": event_transition_matrix,
}

ORACLES = {
    "funnel_conversion": """
        WITH staged AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id) AS fv,
                   event_type, ts
            FROM events
        ),
        staged2 AS (
            SELECT user_id, fv,
                   min(CASE WHEN event_type = 'click' AND ts > fv THEN ts END)
                       OVER (PARTITION BY user_id) AS fc,
                   event_type, ts
            FROM staged
        ),
        staged3 AS (
            SELECT user_id, fv, fc,
                   min(CASE WHEN event_type = 'purchase' AND ts > fc THEN ts END)
                       OVER (PARTITION BY user_id) AS fp
            FROM staged2
        ),
        per_user AS (
            SELECT user_id, min(fv) AS fv, min(fc) AS fc, min(fp) AS fp
            FROM staged3 GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               count(fv) AS n_viewed,
               count(fc) AS n_clicked_after_view,
               count(fp) AS n_purchased_after_click,
               cast(count(fc) AS double) / count(fv) AS view_to_click,
               cast(count(fp) AS double) / count(fc) AS click_to_purchase
        FROM per_user
    """,
    "cohort_retention": """
        WITH marked AS (
            SELECT DISTINCT
                   cast(date_trunc('week', min(ts) OVER (PARTITION BY user_id))
                        AS timestamp) AS cohort_week,
                   cast(datediff('day',
                        date_trunc('week', min(ts) OVER (PARTITION BY user_id)),
                        date_trunc('week', ts)) / 7 AS int) AS week_offset,
                   user_id
            FROM events
        )
        SELECT cohort_week, week_offset, count(*) AS n_active
        FROM marked
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    "tokens_top_terms": """
        SELECT term, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        WHERE term <> ''
        GROUP BY term
        ORDER BY n DESC, term
        LIMIT 25
    """,
    "event_transition_matrix": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                       AS prev_type,
                   event_type
            FROM events
        ),
        t AS (
            SELECT prev_type, event_type, count(*) AS n_transitions
            FROM pairs WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        )
        SELECT prev_type, event_type, n_transitions,
               cast(n_transitions AS double)
                   / (SELECT sum(n_transitions) FROM t) AS share
        FROM t
    """,
    "text_repetition_signals": f"""
        WITH sig AS (
            SELECT source,
                   1.0 - cast(len(list_distinct(string_split(text, ' ')))
                              AS double)
                         / len(string_split(text, ' ')) AS dup_frac,
                   cast(length(text) - len(string_split(text, ' ')) + 1
                        AS double)
                       / len(string_split(text, ' ')) AS mean_word_len
            FROM documents
        )
        SELECT source, count(*) AS n_docs,
               {oracle_davg('dup_frac', 'avg_dup_frac')},
               {oracle_davg('mean_word_len', 'avg_word_len')},
               cast(sum(CASE WHEN dup_frac > 0.6 THEN 1 ELSE 0 END) AS bigint) AS n_flagged
        FROM sig
        GROUP BY source
        ORDER BY source
    """,
}
