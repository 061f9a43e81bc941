"""Dataset-mixing and incremental-ingest operators — the corpus
assembly layer of a training-data pipeline: what gets ADDED to an
existing corpus, which copy survives across sources, how much of each
language/domain enters the mix, and at what sampling weight.

All deterministic (md5 orderings, exact integer token counts) so the
assembled mix is reproducible across engines, runs, and cluster sizes.

Scale shapes:
- Incremental dedup is one hash anti-join of the new batch against the
  historical digest store — the historical TEXT never moves, only its
  digests; at 100 TB the store is a bucketed digest table and the join
  is shuffle-free on the bucket key.
- Cross-source survivor choice is one min_by hash aggregation keyed on
  content digest (priority rides in the arg-min key).
- Token-budget selection is a per-language window cumsum in hash
  order: one shuffle on the language key, same shard-cumsum shape as
  ``pack_sequences``.
- Mix weights are a language-count aggregate (tiny) joined broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

# The synthetic corpus has no batch column; split on doc_id so the
# "historical corpus" and "incoming batch" are disjoint, deterministic,
# and reproducible in the oracle.
INGEST_MOD = 5  # doc_id % 5 == 0 -> incoming batch, else historical

TOKEN_BUDGET = 2_500  # per-language token budget for the mix

# Source priority for cross-source survivor choice (position = rank;
# unlisted sources rank last). The fixture's sources are src0..src19;
# a real recipe would list e.g. wiki > books > web here.
SOURCE_PRIORITY = ["src7", "src3", "src11", "src0"]


def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup of an incoming batch against the
    historical corpus: a new document is admitted iff its content
    digest is unseen in history AND it is the first (lowest doc_id)
    copy within its own batch.

    The anti-join touches only digests — at 100 TB the history side is
    a digest store, not the corpus — and the within-batch survivor is
    the same min-per-group window as every other dedup here. The
    digest is the word-order-insensitive fingerprint (sorted distinct
    words, as in ``text_fingerprint``): the fixture's duplicate
    structure lives at that level, so the gate genuinely rejects
    batch docs whose fingerprint is already in history."""
    docs = load(spark, "documents", sf_dir)
    digest = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split("text", " ")))
        )
    ).alias("content_hash")
    history = docs.filter(
        F.col("doc_id") % INGEST_MOD != 0
    ).select(digest)
    batch = docs.filter(F.col("doc_id") % INGEST_MOD == 0).select(
        "doc_id", "lang", digest
    )
    w = Window.partitionBy("content_hash")
    return (
        batch.join(history.distinct(), "content_hash", "left_anti")
        .withColumn("keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep"))
        .select("doc_id", "lang", "content_hash")
    )


def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact dedup with a quality-preference survivor:
    among copies of the same content, keep the one from the
    highest-priority source ({SOURCE_PRIORITY}), tie-broken by lowest
    doc_id — the "prefer the curated copy" rule pipelines apply when
    the same text arrives from multiple feeds.

    One min_by hash aggregation; the priority is an integer that rides
    inside the fixed-width arg-min key, so survivor choice is a single
    shuffle and engine-deterministic. Keyed on the word-order-
    insensitive fingerprint (the fixture's dup groups span up to 17
    sources at that level)."""
    docs = load(spark, "documents", sf_dir)
    prio = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(i))
            for i, s in enumerate(SOURCE_PRIORITY)
        ],
        F.lit(len(SOURCE_PRIORITY)),
    )
    # (priority, doc_id) fixed-width arg-min key; both non-negative.
    ordkey = F.concat(
        F.lpad(prio.cast("string"), 2, "0"),
        F.lit("|"),
        F.lpad(F.col("doc_id").cast("string"), 20, "0"),
    )
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    return (
        docs.groupBy(fp.alias("content_hash"))
        .agg(
            F.min_by("doc_id", ordkey).alias("keep_doc_id"),
            F.min_by("source", ordkey).alias("keep_source"),
            F.count(F.lit(1)).alias("n_copies"),
            F.count_distinct("source").alias("n_sources"),
        )
        .select(
            "content_hash", "keep_doc_id", "keep_source", "n_copies", "n_sources"
        )
    )


def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget selection: admit documents in
    deterministic md5 order until each language's running token total
    reaches {TOKEN_BUDGET} (the document that crosses the line is
    admitted — budgets are floors, matching greedy mix assembly).

    One shuffle on lang for the window cumsum; the hash order makes
    the selected subset a reproducible uniform sample of each
    language, not a doc_id-prefix artifact."""
    docs = load(spark, "documents", sf_dir)
    n_tok = F.size(F.split("text", " "))
    h = F.md5(F.concat_ws("#", F.lit("budget_v1"), F.col("doc_id")))
    w = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = docs.select(
        "doc_id", "lang", n_tok.alias("n_tokens"), h.alias("h")
    )
    return (
        scored.withColumn(
            "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .filter(F.col("tokens_before") < TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "tokens_before")
    )


def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weight table: per (source) token share and the
    integer per-million sampling weight that reshapes the corpus to a
    UNIFORM target mix across sources — the epochs-per-domain knob of
    a pretraining data recipe.

    weight_ppm = floor(target_share / actual_share * 1e6) with the
    shares as exact integer token counts: weight_ppm = floor(
    total_tokens * 1e6 / (n_sources * source_tokens)) — all integer
    arithmetic, engine-identical. Tiny aggregate; the weight table is
    what a sampler broadcast-joins back against the corpus."""
    docs = load(spark, "documents", sf_dir)
    n_tok = F.size(F.split("text", " "))
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("bigint")).alias("source_tokens"),
    )
    totals = per_source.agg(
        F.sum("source_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "source_tokens",
            # Integral `div` on decimal(38,0) (not `/` + cast): decimal
            # `/` rounds to the result scale BEFORE any floor, which
            # could flip a boundary value; `div` truncates exactly like
            # the oracle's hugeint `//`, and decimal(38,0) holds
            # total_tokens * 1e6 far past bigint's 9.2e12-token limit.
            F.expr(
                "(cast(total_tokens AS decimal(38,0)) * 1000000)"
                " div (n_sources * source_tokens)"
            ).alias("weight_ppm"),
        )
        .orderBy("source")
    )


def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed sampling weights per language (the
    multilingual-pretraining standard: p_i ∝ n_i^α flattens head
    languages and boosts the tail; α = 0.5 here).

    Cross-engine exactness without giving up the non-integral power:
    IEEE sqrt is correctly rounded on every conforming engine, so
    q_i = floor(sqrt(n_i) * 1e9) is a deterministic integer; the
    smoothed share is then a single division of two exact integers —
    bit-identical to the oracle in any summation order. Tiny aggregate
    (one row per language), broadcast back by a sampler at use time."""
    docs = load(spark, "documents", sf_dir)
    n_tok = F.size(F.split("text", " "))
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("bigint")).alias("lang_tokens"),
    )
    q = F.floor(F.sqrt(F.col("lang_tokens")) * F.lit(1000000000.0)).cast("bigint")
    smoothed = per_lang.select("lang", "n_docs", "lang_tokens", q.alias("q"))
    totals = smoothed.agg(
        F.sum("lang_tokens").alias("total_tokens"), F.sum("q").alias("total_q")
    )
    return (
        smoothed.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            "lang_tokens",
            (
                F.col("lang_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("raw_share"),
            (F.col("q").cast("double") / F.col("total_q").cast("double")).alias(
                "smoothed_share"
            ),
        )
        .orderBy("lang")
    )


BUDGET_MULT = 2  # training budget = BUDGET_MULT x corpus tokens


def mix_epoch_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/repetition plan per source: given a total training-token
    budget (BUDGET_MULT x the corpus) split uniformly across sources,
    how many FULL passes each source contributes plus the exact
    fractional-pass remainder — the "repeat high-value sources ~4
    epochs, downsample bulk crawl to ~0.3" recipe of a pretraining
    mixture, as data.

    full_epochs = target div source_tokens and remainder_ppm =
    (target mod source_tokens) * 1e6 div source_tokens are all exact
    integer arithmetic (engine-identical); a sampler realizes the
    fractional pass as an md5 slice of remainder_ppm. Tiny aggregate,
    broadcast back against the corpus at use time."""
    docs = load(spark, "documents", sf_dir)
    n_tok = F.size(F.split("text", " "))
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("bigint")).alias("source_tokens"),
    )
    totals = per_source.agg(
        F.sum("source_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "source_tokens",
            F.expr(
                f"(cast(total_tokens AS decimal(38,0)) * {BUDGET_MULT})"
                " div n_sources"
            ).cast("bigint").alias("target_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "source_tokens",
            "target_tokens",
            # greatest(1, ...) guards a source whose documents are all
            # empty (source_tokens = 0): Spark's div would yield NULL
            # while DuckDB's // raises — the guard keeps both engines on
            # the same exact-integer path (0 epochs, 0 remainder).
            F.expr(
                "target_tokens div greatest(source_tokens, 1L)"
            ).alias("full_epochs"),
            F.expr(
                "(cast(target_tokens % greatest(source_tokens, 1L)"
                " AS decimal(38,0))"
                " * 1000000) div greatest(source_tokens, 1L)"
            ).cast("bigint").alias("remainder_ppm"),
        )
        .orderBy("source")
    )


ANNEAL_PCT = 10  # final 10% of the budget: high-quality anneal phase


def mix_anneal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase training mixture with an end-of-run anneal — the
    now-standard recipe (e.g. FineWeb/Llama-style midtraining): the
    MAIN phase (first {100-ANNEAL_PCT}% of the token budget) samples
    sources by natural token share; the ANNEAL phase (final
    {ANNEAL_PCT}%) re-weights to each source's GOPHER-PASSING tokens
    only, front-loading the cleanest data into the last steps. Emits
    one row per (phase, source) with the exact integer token target.

    Exactness: every target is integer arithmetic over exact token
    counts — budget = BUDGET_MULT x corpus, phase split by integer
    div, per-source target = phase_budget * metric div total_metric
    (truncation loses < n_sources tokens per phase, documented).
    Quality tokens reuse the SAME Gopher keep expression as the gates
    (curation.gopher_rule_columns), so the anneal pool is
    definitionally the gated corpus.

    Scale shape: one corpus scan (gate flags are per-row codegen) into
    a per-source aggregate; totals broadcast back; the two phase rows
    explode from a literal array — no second scan, no shuffle beyond
    the tiny rollup."""
    from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
        gopher_rule_columns,
    )

    docs = load(spark, "documents", sf_dir)
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    keep = gopher_rule_columns()["keep"]
    per_source = docs.groupBy("source").agg(
        F.sum(n_tok).alias("source_tokens"),
        F.sum(F.when(keep, n_tok).otherwise(F.lit(0))).alias("quality_tokens"),
    )
    totals = per_source.agg(
        F.sum("source_tokens").alias("tt"), F.sum("quality_tokens").alias("tq")
    )
    main_b = (
        f"((cast(tt AS decimal(38,0)) * {BUDGET_MULT} * {100 - ANNEAL_PCT})"
        " div 100)"
    )
    anneal_b = f"(cast(tt AS decimal(38,0)) * {BUDGET_MULT} - {main_b})"
    j = (
        per_source.crossJoin(F.broadcast(totals))
        .withColumn(
            "main_target",
            F.expr(
                f"cast(({main_b} * source_tokens) div greatest(tt, 1L)"
                " AS bigint)"
            ),
        )
        .withColumn(
            "anneal_target",
            F.expr(
                f"cast(({anneal_b} * quality_tokens) div greatest(tq, 1L)"
                " AS bigint)"
            ),
        )
    )
    return (
        j.select(
            "source",
            "source_tokens",
            "quality_tokens",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("anneal").alias("phase"),
                        F.col("anneal_target").alias("target_tokens"),
                    ),
                    F.struct(
                        F.lit("main").alias("phase"),
                        F.col("main_target").alias("target_tokens"),
                    ),
                )
            ).alias("p"),
        )
        .select(
            F.col("p.phase").alias("phase"),
            "source",
            "source_tokens",
            "quality_tokens",
            F.col("p.target_tokens").alias("target_tokens"),
        )
        .orderBy("phase", "source")
    )


DRIFT_TAG = "drift_v1"


def mix_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-drift audit: draw the deterministic sample the
    mix_domain_weights recipe induces (md5 ppm-bucket vs the per-source
    weight), then measure how far the REALIZED token mix drifted from
    the uniform target with a per-source chi-square contribution — the
    post-sampling check a data-recipe pipeline runs before training,
    since hash sampling only approximates its target in expectation
    and capped weights (weight_ppm > 1e6 cannot oversample) shift the
    realized shares of every other source.

    Exactness: the sample membership is a pure function of doc_id
    (md5 ppm bucket, the sampling.py convention at ppm granularity);
    observed token counts are exact integers; with T total sampled
    tokens over S sources, the per-source contribution
    (obs - T/S)^2 / (T/S) is emitted as the exact integer
    chi2_contrib_ppm = 1e6 * (S*obs - T)^2 div (S^2 * T/S = S*T) —
    hugeint/decimal(38,0) arithmetic with truncating division, no
    float crossing engines. Sources sampled to zero stay in the
    result via the weights-side left join.

    Scale shape: the weight table is a tiny per-source aggregate
    (broadcast); the sampling filter is a per-row codegen predicate on
    the corpus scan; the observed counts are one O(docs) aggregation
    to S rows; the chi-square sweep runs on the S-row table against a
    broadcast 1-row total. One corpus shuffle end to end."""
    docs = load(spark, "documents", sf_dir)
    weights = mix_domain_weights(spark, sf_dir).select(
        "source", F.col("weight_ppm").cast("bigint").alias("weight_ppm")
    )
    h6 = F.substring(
        F.md5(F.concat_ws("#", F.lit(DRIFT_TAG), F.col("doc_id"))), 1, 6
    )
    bucket = F.pmod(F.conv(h6, 16, 10).cast("bigint"), F.lit(1_000_000))
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    sampled = (
        docs.select("doc_id", "source", n_tok.alias("n_tok"))
        .join(F.broadcast(weights), "source")
        .filter(bucket < F.least(F.col("weight_ppm"), F.lit(1_000_000)))
    )
    obs = (
        weights.join(
            F.broadcast(
                sampled.groupBy("source").agg(
                    F.count(F.lit(1)).alias("sampled_docs"),
                    F.sum("n_tok").alias("obs_tokens"),
                )
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "weight_ppm",
            F.coalesce("sampled_docs", F.lit(0)).alias("sampled_docs"),
            F.coalesce("obs_tokens", F.lit(0)).alias("obs_tokens"),
        )
    )
    totals = obs.agg(
        F.sum("obs_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        obs.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "weight_ppm",
            "sampled_docs",
            "obs_tokens",
            F.expr("1000000 div n_sources").alias("target_ppm"),
            F.expr(
                "obs_tokens * 1000000 div greatest(total_tokens, 1)"
            ).alias("realized_ppm"),
            F.expr(
                "(cast(n_sources * obs_tokens - total_tokens"
                "      AS decimal(38,0))"
                " * (n_sources * obs_tokens - total_tokens) * 1000000)"
                " div greatest(n_sources * total_tokens, 1)"
            ).alias("chi2_contrib_ppm"),
        )
        .orderBy("source")
    )


VIEW_CUTOFF = "1998-01-01"  # base/delta split for the incremental view


def view_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-customer
    order summary is kept as MERGEABLE partial aggregates — the
    historical base (orders before VIEW_CUTOFF) and the new delta
    batch are aggregated SEPARATELY and then merged with the aggregate
    merge functions (sum of counts, sum of sums, min of mins, max of
    maxs; avg derived from merged sums) — the exact contract every
    incremental pipeline (streaming state stores, Delta/iceberg MERGE,
    cube refresh) relies on. The DuckDB oracle is the FULL recompute
    over all orders, so the parity check IS the algebraic statement
    merge(partial(base), partial(delta)) == full — run fresh every
    round, not assumed. (Distinct counts are deliberately absent: they
    don't merge; sketch_hll_distinct's register-max is their mergeable
    form.)

    Scale shape: the base partials are aggregate-sized (one row per
    customer), so refresh cost is one scan of the DELTA plus a shuffle
    of partials — never a rescan of history; exactly how the streaming
    upsert sink (streaming/sinks.py) maintains its keyed state, here
    in certifiable batch form. Money is summed in exact integer cents.

    Reference parity: consumer.py:69-105 upserts per-trade rows; this
    is the aggregate-level upsert the dashboard's rollups would need
    at scale."""
    orders = load(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < VIEW_CUTOFF))
    delta = partial(orders.filter(F.col("o_orderdate") >= VIEW_CUTOFF))
    merged = (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr("sum_cents div n_orders").alias("avg_cents_floor"),
    ).orderBy("o_custkey")


SEQ_LEN = 2_048  # tokens per packed training sequence (context length)
PACK_BUCKET = 1_024  # doc_ids per prefix-sum bucket (two-phase cumsum)


def pack_sequences_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan (concat-and-chunk): lay the corpus out in
    deterministic doc_id order, concatenate token streams, and cut at
    every SEQ_LEN boundary — the step between curation and a
    pretraining dataloader. Per document: its token offset in the
    packed stream, the first/last sequence it lands in, and how many
    context boundaries cut through it (the attention-fragmentation
    signal packing recipes monitor; concat-and-chunk has ZERO padding
    by construction, so cuts are the only quality cost).

    Scale shape: the global running token offset is a TWO-PHASE prefix
    sum (the stats_ks_drift machinery) — per-bucket totals (bucket =
    doc_id div {PACK_BUCKET}) prefix-summed in a tiny window, then
    within-bucket cumulative windows PARTITIONED by bucket with the
    bucket offset broadcast back — no single reducer ever sees the
    corpus. All integer arithmetic (token counts, floor div), so the
    DuckDB twin's single naive running-sum window proves the two-phase
    rewrite exactly."""
    docs = load(spark, "documents", sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id div {PACK_BUCKET}").alias("bucket"),
    )
    btot = docs.groupBy("bucket").agg(F.sum("n_tokens").alias("s"))
    wpre = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bpre = btot.select(
        "bucket", F.coalesce(F.sum("s").over(wpre), F.lit(0)).alias("p")
    )
    win = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        docs.join(F.broadcast(bpre), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("p")
                + F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
            ).alias("tokens_before"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "tokens_before",
            F.expr(f"tokens_before div {SEQ_LEN}").alias("first_seq"),
            F.expr(
                f"(tokens_before + n_tokens - 1) div {SEQ_LEN}"
            ).alias("last_seq"),
            F.expr(
                f"(tokens_before + n_tokens - 1) div {SEQ_LEN}"
                f" - tokens_before div {SEQ_LEN}"
            ).alias("n_boundary_cuts"),
        )
        .orderBy("doc_id")
    )


N_SHARDS = 16  # export shards (files) for the packed corpus


def export_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced export sharding: assign every document to one of
    {N_SHARDS} output files so shard token totals stay near-equal —
    the plan for writing a curated corpus as balanced training shards
    (unbalanced shards starve data-parallel readers). Deterministic
    SNAKE (boustrophedon) assignment over docs ranked by token count
    descending: positions 0..2N-1 map to shards 0..N-1..0, so each
    pass hands every shard one large and one small document —
    guaranteed within max-doc-tokens of ideal, no greedy state.

    Scale shape: the global rank is the shuffle_global_order two-phase
    form — the primary sort key IS the bucket (n_tokens, a few hundred
    distinct values), so per-bucket counts prefix-sum in a tiny window
    and ranking runs bucket-parallel; no single-reducer global sort.
    Output is the per-shard audit: doc/token totals and the ppm
    deviation from the ideal equal split."""
    docs = load(spark, "documents", sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    offsets = (
        docs.groupBy("n_tokens")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "n_tokens",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy(F.col("n_tokens").desc()).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("offset"),
        )
    )
    wb = Window.partitionBy("n_tokens").orderBy("doc_id")
    pos = F.col("offset") + F.row_number().over(wb) - 1
    period = F.pmod(pos, F.lit(2 * N_SHARDS))
    shard = F.when(period < N_SHARDS, period).otherwise(
        2 * N_SHARDS - 1 - period
    )
    per_shard = (
        docs.join(F.broadcast(offsets), "n_tokens")
        .select(
            shard.cast("int").alias("shard_id"),
            "n_tokens",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
    )
    totals = per_shard.agg(F.sum("shard_tokens").alias("tt"))
    return (
        per_shard.crossJoin(F.broadcast(totals))
        .select(
            "shard_id",
            "n_docs",
            "shard_tokens",
            # ppm deviation from the ideal split, floor on exact ints:
            # (tokens * N - total) * 1e6 div total, sign-split so floor
            # == truncation on both engines (operands kept >= 0).
            F.expr(
                f"CASE WHEN shard_tokens * {N_SHARDS} >= tt THEN "
                f"(shard_tokens * {N_SHARDS} - tt) * 1000000 div tt "
                f"ELSE -((tt - shard_tokens * {N_SHARDS}) * 1000000"
                f" div tt) END"
            ).alias("dev_ppm"),
        )
        .orderBy("shard_id")
    )


QUERIES = {
    "mix_epoch_repeats": mix_epoch_repeats,
    "mix_drift_chi2": mix_drift_chi2,
    "dedup_incremental_ingest": dedup_incremental_ingest,
    "mix_temperature_weights": mix_temperature_weights,
    "dedup_cross_source": dedup_cross_source,
    "sample_token_budget": sample_token_budget,
    "mix_domain_weights": mix_domain_weights,
    "mix_anneal_schedule": mix_anneal_schedule,
    "view_incremental_merge": view_incremental_merge,
    "pack_sequences_plan": pack_sequences_plan,
    "export_shard_plan": export_shard_plan,
}

def _anneal_oracle() -> str:
    # Shares the Gopher CTEs so the anneal pool is definitionally the
    # gated corpus (imported here, at the one point of use).
    from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
        GOPHER_KEEP_SQL,
        GOPHER_M_CTES,
    )

    main_b = (
        f"((cast(tt AS hugeint) * {BUDGET_MULT} * {100 - ANNEAL_PCT}) // 100)"
    )
    anneal_b = f"(cast(tt AS hugeint) * {BUDGET_MULT} - {main_b})"
    return f"""
        WITH {GOPHER_M_CTES},
        per AS (
            SELECT source,
                   cast(sum(n_words) AS bigint) AS source_tokens,
                   cast(sum(CASE WHEN {GOPHER_KEEP_SQL} THEN n_words
                                 ELSE 0 END) AS bigint) AS quality_tokens
            FROM gm GROUP BY source
        ),
        tot AS (
            SELECT sum(source_tokens) AS tt, sum(quality_tokens) AS tq
            FROM per
        ),
        j AS (SELECT per.*, tt, tq FROM per CROSS JOIN tot)
        SELECT 'anneal' AS phase, source, source_tokens, quality_tokens,
               cast(({anneal_b} * quality_tokens) // greatest(tq, 1)
                    AS bigint) AS target_tokens
        FROM j
        UNION ALL
        SELECT 'main' AS phase, source, source_tokens, quality_tokens,
               cast(({main_b} * source_tokens) // greatest(tt, 1)
                    AS bigint) AS target_tokens
        FROM j
        ORDER BY phase, source
    """


ORACLES = {
    # Single naive running-sum window — proves the two-phase bucketed
    # prefix-sum rewrite exactly (all-integer arithmetic).
    "pack_sequences_plan": f"""
        WITH t AS (
            SELECT doc_id,
                   cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   cast(coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS bigint) AS tokens_before
            FROM t
        )
        SELECT doc_id, n_tokens, tokens_before,
               tokens_before // {SEQ_LEN} AS first_seq,
               (tokens_before + n_tokens - 1) // {SEQ_LEN} AS last_seq,
               (tokens_before + n_tokens - 1) // {SEQ_LEN}
                   - tokens_before // {SEQ_LEN} AS n_boundary_cuts
        FROM c
        ORDER BY doc_id
    """,
    # Naive single-window rank + the same snake formula — proves the
    # two-phase bucketed rank rewrite exactly.
    "export_shard_plan": f"""
        WITH t AS (
            SELECT doc_id,
                   cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
            FROM documents
        ),
        ranked AS (
            SELECT n_tokens,
                   row_number() OVER (
                       ORDER BY n_tokens DESC, doc_id
                   ) - 1 AS pos
            FROM t
        ),
        assigned AS (
            SELECT n_tokens,
                   CASE WHEN pos % {2 * N_SHARDS} < {N_SHARDS}
                        THEN pos % {2 * N_SHARDS}
                        ELSE {2 * N_SHARDS} - 1 - pos % {2 * N_SHARDS}
                   END AS shard_id
            FROM ranked
        ),
        per AS (
            SELECT cast(shard_id AS int) AS shard_id,
                   count(*) AS n_docs,
                   cast(sum(n_tokens) AS bigint) AS shard_tokens
            FROM assigned GROUP BY 1
        ),
        tot AS (SELECT sum(shard_tokens) AS tt FROM per)
        SELECT shard_id, n_docs, shard_tokens,
               cast(CASE WHEN shard_tokens * {N_SHARDS} >= tt THEN
                    (shard_tokens * {N_SHARDS} - tt) * 1000000 // tt
               ELSE -((tt - shard_tokens * {N_SHARDS}) * 1000000 // tt)
               END AS bigint) AS dev_ppm
        FROM per CROSS JOIN tot
        ORDER BY shard_id
    """,
    # Full recompute — parity with the engine's base+delta partial
    # merge IS the incremental-maintenance correctness statement.
    "view_incremental_merge": """
        SELECT o_custkey,
               cast(count(*) AS bigint) AS n_orders,
               cast(sum(cast(cast(o_totalprice AS decimal(18,2)) * 100
                             AS bigint)) AS bigint) AS sum_cents,
               min(cast(cast(o_totalprice AS decimal(18,2)) * 100
                        AS bigint)) AS min_cents,
               max(cast(cast(o_totalprice AS decimal(18,2)) * 100
                        AS bigint)) AS max_cents,
               cast(sum(cast(cast(o_totalprice AS decimal(18,2)) * 100
                             AS bigint))
                    // count(*) AS bigint) AS avg_cents_floor
        FROM orders
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
    "mix_anneal_schedule": _anneal_oracle(),
    "mix_drift_chi2": f"""
        WITH per_source AS (
            SELECT source,
                   sum(len(string_split(text, ' '))) AS source_tokens
            FROM documents GROUP BY source
        ),
        wtotals AS (
            SELECT sum(source_tokens) AS wt, count(*) AS ws FROM per_source
        ),
        weights AS (
            SELECT source,
                   cast((cast(wt AS hugeint) * 1000000)
                        // (ws * source_tokens) AS bigint) AS weight_ppm
            FROM per_source CROSS JOIN wtotals
        ),
        sampled AS (
            SELECT d.source,
                   cast(len(string_split(d.text, ' ')) AS bigint) AS n_tok
            FROM documents d JOIN weights w ON d.source = w.source
            WHERE (cast(concat('0x', substr(md5('{DRIFT_TAG}' || '#' ||
                       cast(d.doc_id AS varchar)), 1, 6)) AS bigint)
                   % 1000000) < least(w.weight_ppm, 1000000)
        ),
        obs AS (
            SELECT w.source, w.weight_ppm,
                   cast(coalesce(s.sampled_docs, 0) AS bigint)
                       AS sampled_docs,
                   cast(coalesce(s.obs_tokens, 0) AS bigint) AS obs_tokens
            FROM weights w
            LEFT JOIN (SELECT source, count(*) AS sampled_docs,
                              sum(n_tok) AS obs_tokens
                       FROM sampled GROUP BY source) s
              ON w.source = s.source
        ),
        totals AS (
            SELECT cast(sum(obs_tokens) AS bigint) AS total_tokens,
                   cast(count(*) AS bigint) AS n_sources
            FROM obs
        )
        SELECT source, weight_ppm, sampled_docs, obs_tokens,
               cast(1000000 // n_sources AS bigint) AS target_ppm,
               cast(obs_tokens * 1000000 // greatest(total_tokens, 1)
                    AS bigint) AS realized_ppm,
               cast((cast(n_sources * obs_tokens - total_tokens AS hugeint)
                     * (n_sources * obs_tokens - total_tokens) * 1000000)
                    // greatest(n_sources * total_tokens, 1)
                    AS bigint) AS chi2_contrib_ppm
        FROM obs CROSS JOIN totals
        ORDER BY source
    """,
    "mix_epoch_repeats": f"""
        WITH per_source AS (
            SELECT source,
                   count(*) AS n_docs,
                   sum(len(string_split(text, ' '))) AS source_tokens
            FROM documents GROUP BY source
        ),
        totals AS (
            SELECT sum(source_tokens) AS total_tokens,
                   count(*) AS n_sources
            FROM per_source
        )
        SELECT source, n_docs,
               cast(source_tokens AS bigint) AS source_tokens,
               cast(total_tokens * {BUDGET_MULT} // n_sources AS bigint)
                   AS target_tokens,
               cast((total_tokens * {BUDGET_MULT} // n_sources)
                    // greatest(source_tokens, 1) AS bigint)
                   AS full_epochs,
               cast(((total_tokens * {BUDGET_MULT} // n_sources)
                     % greatest(source_tokens, 1)) * 1000000
                    // greatest(source_tokens, 1)
                    AS bigint) AS remainder_ppm
        FROM per_source CROSS JOIN totals
        ORDER BY source
    """,
    "mix_temperature_weights": """
        WITH per AS (
            SELECT lang, count(*) AS n_docs,
                   cast(sum(len(string_split(text, ' '))) AS bigint)
                       AS lang_tokens
            FROM documents GROUP BY lang
        ),
        q AS (
            SELECT lang, n_docs, lang_tokens,
                   cast(floor(sqrt(lang_tokens) * 1000000000.0) AS bigint)
                       AS qv
            FROM per
        )
        SELECT lang, n_docs, lang_tokens,
               cast(lang_tokens AS double)
                   / cast(sum(lang_tokens) OVER () AS double) AS raw_share,
               cast(qv AS double) / cast(sum(qv) OVER () AS double)
                   AS smoothed_share
        FROM q
        ORDER BY lang
    """,
    "dedup_incremental_ingest": f"""
        WITH fp AS (
            SELECT doc_id, lang,
                   md5(list_aggregate(list_sort(list_distinct(
                       string_split(text, ' '))), 'string_agg', ' '))
                       AS content_hash
            FROM documents
        ),
        history AS (
            SELECT DISTINCT content_hash
            FROM fp WHERE doc_id % {INGEST_MOD} <> 0
        ),
        batch AS (
            SELECT doc_id, lang, content_hash
            FROM fp WHERE doc_id % {INGEST_MOD} = 0
        )
        SELECT doc_id, lang, content_hash
        FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM history h
                          WHERE h.content_hash = b.content_hash)
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY content_hash)
    """,
    "dedup_cross_source": f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   md5(list_aggregate(list_sort(list_distinct(
                       string_split(text, ' '))), 'string_agg', ' '))
                       AS content_hash,
                   lpad(cast(CASE
                       {' '.join(f"WHEN source = '{s}' THEN {i}" for i, s in enumerate(SOURCE_PRIORITY))}
                       ELSE {len(SOURCE_PRIORITY)} END AS varchar), 2, '0')
                   || '|' || lpad(cast(doc_id AS varchar), 20, '0') AS ordkey
            FROM documents
        )
        SELECT content_hash,
               min_by(doc_id, ordkey) AS keep_doc_id,
               min_by(source, ordkey) AS keep_source,
               count(*) AS n_copies,
               count(DISTINCT source) AS n_sources
        FROM keyed
        GROUP BY content_hash
    """,
    "sample_token_budget": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   cast(len(string_split(text, ' ')) AS int) AS n_tokens,
                   md5('budget_v1' || '#' || cast(doc_id AS varchar)) AS h
            FROM documents
        )
        SELECT doc_id, lang, n_tokens, tokens_before
        FROM (
            SELECT doc_id, lang, n_tokens,
                   cast(coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS bigint) AS tokens_before
            FROM scored
        )
        WHERE tokens_before < {TOKEN_BUDGET}
    """,
    "mix_domain_weights": """
        WITH per_source AS (
            SELECT source, count(*) AS n_docs,
                   cast(sum(len(string_split(text, ' '))) AS bigint)
                       AS source_tokens
            FROM documents GROUP BY source
        ),
        totals AS (
            SELECT cast(sum(source_tokens) AS bigint) AS total_tokens,
                   count(*) AS n_sources
            FROM per_source
        )
        SELECT source, n_docs, source_tokens,
               cast(cast(total_tokens AS hugeint) * 1000000
                    // (n_sources * source_tokens) AS bigint) AS weight_ppm
        FROM per_source CROSS JOIN totals
        ORDER BY source
    """,
}
