"""Text analysis operators (north-star extension; BASELINE.json):
language-ID heuristic, quality scoring, token counting, document
fingerprinting — the per-document scoring pass of a training-data
pipeline.

All pure column expressions: per-row string/array kernels inside
whole-stage codegen, embarrassingly parallel — the 100 TB cost is one
scan, no shuffle (except the fingerprint group-by, keyed on a 32-char
digest with near-uniform distribution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.checkpoints import (
    release_checkpoint,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
    load,
    load_rebalanced,
)

# Small per-language stopword lists for the n-gram/stopword-overlap
# language heuristic (public common-word lists, truncated).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ist"],
    "fr": ["le", "la", "et", "les", "des", "en", "du", "une", "que", "pour"],
    "zh": ["de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"],
}
LANG_ORDER = ["en", "es", "de", "fr", "zh"]  # deterministic tie order
# Flat union for corpus-wide gates (curation.quality_gopher_gates).
ALL_STOPWORDS = sorted({w for sw in STOPWORDS.values() for w in sw})

# Token pattern: word runs, digit runs, or single non-alphanumerics —
# the BPE-ish pre-tokenization split (simple char classes so Java and
# RE2 regex engines agree).
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _words() -> Column:
    return F.split(F.col("text"), " ")


def text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats + a quality score: length, token counts,
    mean word length, uppercase/punct-free ratios — the standard cheap
    quality gates (length bounds, word-shape sanity) before expensive
    model scoring."""
    docs = load(spark, "documents", sf_dir)
    words = _words()
    tokens = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)
    n_words = F.size(words)
    n_chars = F.length("text")
    mean_word_len = F.when(
        n_words > 0, (n_chars - (n_words - 1)).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    quality = (
        F.when((n_chars >= 100) & (n_chars <= 500), 0.5).otherwise(0.0)
        + F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0), 0.3).otherwise(0.0)
        + F.when(n_words >= 20, 0.2).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_computed"),
        n_words.alias("n_words"),
        F.size(tokens).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_unique_words"),
        mean_word_len.alias("mean_word_len"),
        quality.alias("quality_score"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language heuristic: score = distinct stopword
    hits per language, argmax with a fixed tie order. (On this
    synthetic corpus scores are mostly 0 — ``is_reliable`` carries
    that signal; the mechanism is the real one.) Rebalanced load: the
    per-language array-intersect scoring is per-row CPU that must not
    serialize onto a single-rowgroup file's one scan task."""
    docs = load_rebalanced(spark, "documents", sf_dir)
    words = F.array_distinct(_words())
    scores = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }
    best = F.lit(LANG_ORDER[0])
    best_score = scores[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return docs.select(
        "doc_id",
        "lang",
        best.alias("predicted_lang"),
        best_score.alias("lang_score"),
        (best_score > 0).alias("is_reliable"),
        (best == F.col("lang")).alias("matches_label"),
    )


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-vs-prediction confusion matrix for the language-ID
    heuristic — the eval-harness view a pipeline watches for drift.
    Composes the text_langid operator (same expressions, zero copy)
    into one grouped count; at scale it is a single hash aggregation
    over scan-side projections."""
    pred = text_langid(spark, sf_dir)
    return pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("is_reliable").alias("n_reliable"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint clustering key (sorted distinct words -> digest):
    word-order- and duplication-insensitive exact dedup key."""
    docs = load(spark, "documents", sf_dir)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_words()))))
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )


def text_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token accounting per language — the "how many
    tokens do we have" question, one scan + tiny shuffle."""
    docs = load(spark, "documents", sf_dir)
    tokens = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)
    return (
        docs.select("lang", F.size(tokens).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
        )
        .orderBy("lang")
    )


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: quality gates -> fingerprint dedup ->
    curated manifest. This is the composition a training-data job
    actually runs, wired from the same expressions as the individual
    operators above so the pieces and the pipeline agree by definition.

    Scale shape: the quality gates are scan-side filters, so the only
    shuffle (the fingerprint survivor window) sees the *gated* corpus,
    not the raw one — filter-before-shuffle, the ordering that matters
    at 100 TB. Survivor choice is min(doc_id) per fingerprint:
    deterministic under any partitioning or executor count.
    """
    from pyspark.sql import Window

    docs = load(spark, "documents", sf_dir)
    words = _words()
    tokens = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)
    n_words = F.size(words)
    n_chars = F.length("text")
    mean_word_len = F.when(
        n_words > 0, (n_chars - (n_words - 1)).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    quality = (
        F.when((n_chars >= 100) & (n_chars <= 500), 0.5).otherwise(0.0)
        + F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0), 0.3).otherwise(0.0)
        + F.when(n_words >= 20, 0.2).otherwise(0.0)
    )
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words))))
    # Gate threshold 0.65 sits between the score levels (0.5 vs 0.7/0.8)
    # so float representation of the sums can never flip a decision.
    gated = docs.select(
        "doc_id",
        "lang",
        F.size(tokens).alias("n_tokens"),
        quality.alias("quality_score"),
        fp.alias("fp"),
    ).filter(F.col("quality_score") >= 0.65)
    w = Window.partitionBy("fp")
    return (
        gated.withColumn("keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep"))
        .select("doc_id", "lang", "n_tokens", "quality_score")
        .orderBy("doc_id")
    )


def text_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language n-gram diversity (the distinct-n memorization /
    templating signal): distinct word-trigram count over total
    trigram occurrences. A language slice dominated by boilerplate
    shows a collapsing ratio long before per-document gates fire.

    Scale shape: one generator projection (trigram explode preserving
    the multiplicity the metric is defined over), one hash aggregate
    keyed (lang, trigram) for the distinct side riding the same
    shuffle as the total — expressed as a two-level aggregate:
    count per (lang, trigram), then per-lang sum/count. Both levels
    get map-side partial combines; no joins, no second scan.
    Diversity is a ratio of exact integers -> engine-identical
    doubles.

    Trigram generation is a single codegen'd regex pass
    (``functions.ngrams.regex_word_ngrams``) — the higher-order
    ``transform``+``try_element_at`` form is interpreted per element
    and measured 5x slower at sf0.1. <3-word docs contribute their
    whole text as one trigram, same clamp as dedup's shingles."""
    from real_time_streaming_system_with_apache_kafka_spark.functions.ngrams import (
        regex_word_ngrams,
    )

    docs = load(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    tris = regex_word_ngrams(F.col("text"), 3)
    per_tri = (
        docs.select("lang", F.explode(tris).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return (
        per_tri.groupBy("lang")
        .agg(
            F.sum("n_occ").alias("n_trigrams"),
            F.count(F.lit(1)).alias("n_distinct_trigrams"),
        )
        .withColumn(
            "diversity", F.col("n_distinct_trigrams") / F.col("n_trigrams")
        )
    )


BPE_TOP_PAIRS = 30


def vocab_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, first iteration: rank adjacent
    character-pair merge candidates by corpus-weighted frequency — the
    statistic byte-pair-encoding greedily merges on. Emits the top
    candidates with their weight (sum over word occurrences of each
    pair position) and vocabulary support (distinct words containing
    the pair). Full BPE training iterates exactly this plan on a
    re-segmented symbol vocabulary; the per-iteration shape — and the
    scale argument — are identical.

    Scale shape: the corpus-sized work is ONE token explode feeding a
    map-side-combining count, so the first shuffle carries one row per
    distinct word per partition (vocabulary-bounded). Everything after
    — pair explosion, pair aggregation, top-K — runs on the VOCABULARY,
    which grows sublinearly with corpus size; the final top-K is
    TakeOrderedAndProject. At 100 TB the plan's cost is the scan, as it
    must be.
    """
    docs = load(spark, "documents", sf_dir)
    # checkpoint=False: one-shot consumer — keep the scan visible to
    # the plan audit instead of materializing the vocabulary.
    pairs = _adjacent_pairs(_corpus_vocab(docs, checkpoint=False))
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("weight"),
            F.count_distinct("word").alias("n_vocab_words"),
        )
        .orderBy(F.desc("weight"), "pair")
        .limit(BPE_TOP_PAIRS)
    )


BPE_MERGE_ROUNDS = 3
# Merged symbols ride as Unicode private-use chars (U+E000 + round)
# between rounds; they can never collide with corpus characters and
# expand back to plain strings in the output.


def vocab_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL BPE merge learning, {BPE_MERGE_ROUNDS} rounds with
    re-segmentation: each round ranks adjacent symbol pairs by
    corpus-weighted frequency, merges the winner everywhere (greedy
    left-to-right, the BPE convention), and re-ranks over the merged
    vocabulary — emitting the merge table (rank, left, right, weight)
    a BPE tokenizer ships as merges.txt. Iteration 1 alone is
    ``vocab_bpe_pair_stats``; this operator is the training loop.

    Scale shape: the corpus is touched ONCE (token explode with
    map-side combine into word frequencies, localCheckpointed);
    every round after runs on the VOCABULARY (sublinear in corpus
    size) and returns exactly one (pair, weight) row to the driver —
    O(1) model state per round, the same driver-traffic contract as
    learn_centroids/PQ. Merged symbols ride as private-use sentinel
    chars so re-segmentation is a codegen ``replace``, not a
    re-tokenization.

    Exactness: weights are integer sums; the winner ties-break on the
    pair string, and greedy left-to-right non-overlapping replace is
    the same algorithm in the JVM and DuckDB — the oracle unrolls the
    rounds as chained CTEs (scalar-subquery winners feeding the next
    round's replace) and matches exactly. The trained table is memoized
    per corpus fingerprint (``_MERGE_CACHE``) so the apply entry in the
    same session reuses it instead of retraining."""
    docs = load(spark, "documents", sf_dir)
    raw = _learn_merges_for_docs(docs, BPE_MERGE_ROUNDS)
    return spark.createDataFrame(
        [(rank, left, right, weight) for rank, _p, _s, left, right, weight in raw],
        "merge_rank int, merge_left string, merge_right string, weight bigint",
    )


def _corpus_vocab(docs: DataFrame, checkpoint: bool = True) -> DataFrame:
    """(word, freq) vocabulary — the ONE corpus-sized pass of the BPE
    lifecycle (pair stats, merge training, tokenize-apply all build on
    this single definition). ``checkpoint`` materializes it so the
    training rounds scan the vocabulary, not the corpus lineage;
    one-shot consumers pass False to keep the pruned scan visible."""
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return vocab.localCheckpoint(eager=True) if checkpoint else vocab


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """Explode each vocabulary word into its adjacent 2-symbol pairs,
    carrying the other columns — the single engine-side definition of
    the BPE pair statistic (mirrored by ``_bpe_pair_cte`` in SQL)."""
    return vocab.filter(F.length("word") >= 2).select(
        *vocab.columns,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )


def learn_merges(vocab: DataFrame, rounds: int) -> DataFrame:
    """The BPE training loop over a (word, freq) vocabulary DataFrame —
    factored out so tests can drive it with crafted vocabularies that
    force merged symbols into later winners (exercising the sentinel
    expansion path the natural corpus may not hit in few rounds)."""
    spark = vocab.sparkSession
    merges = [
        (rank, left, right, weight)
        for rank, _pair, _sent, left, right, weight in _learn_merges_raw(
            vocab, rounds
        )
    ]
    return spark.createDataFrame(
        merges, "merge_rank int, merge_left string, merge_right string, weight bigint"
    )


# Merge-table memo (same pattern as the quantizer memo in
# functions/blocks.py): a BPE merge table is TRAINED ONCE per corpus
# and shipped to every consumer — within one session,
# vocab_bpe_learn_merges and tokenize_with_learned_bpe must not
# retrain on the same bytes. The key is CONTENT-derived (doc count +
# commutative xxhash64 sum over (doc_id, text)), so a rewritten corpus
# at the same path retrains and two paths with identical content share.
# The fingerprint costs one corpus scan with no shuffle — strictly
# cheaper than the vocabulary build it lets a memo hit skip.
_MERGE_CACHE: dict[
    tuple[int, int, int], list[tuple[int, str, str, str, str, int]]
] = {}


def _docs_fingerprint(docs: DataFrame) -> tuple[int, int]:
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: a long sum of ±2^63 hashes overflows
        # (and THROWS under Spark 4's default ANSI mode).
        F.sum(F.xxhash64("doc_id", "text").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def _learn_merges_for_docs(
    docs: DataFrame, rounds: int
) -> list[tuple[int, str, str, str, str, int]]:
    key = (*_docs_fingerprint(docs), rounds)
    if key not in _MERGE_CACHE:
        if len(_MERGE_CACHE) >= 8:  # bench/test sessions touch <=3 SFs
            _MERGE_CACHE.clear()
        vocab = _corpus_vocab(docs)
        try:
            _MERGE_CACHE[key] = _learn_merges_raw(vocab, rounds)
        finally:
            release_checkpoint(vocab)  # release the localCheckpoint blocks
    return _MERGE_CACHE[key]


def _learn_merges_raw(
    vocab: DataFrame, rounds: int
) -> list[tuple[int, str, str, str, str, int]]:
    """Training core returning (rank, pair, sentinel, left, right,
    weight) — pair/sentinel are the sentinel-space forms the APPLY
    step replays as a replace chain; left/right are the expanded
    plain strings the merge table publishes."""
    expand: dict[str, str] = {}
    merges: list[tuple[int, str, str, str, str, int]] = []
    cur = vocab
    for r in range(rounds):
        pairs = _adjacent_pairs(cur).select("freq", "pair")
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("weight"))
            .orderBy(F.desc("weight"), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, weight = top[0]["pair"], int(top[0]["weight"])
        left = expand.get(pair[0], pair[0])
        right = expand.get(pair[1], pair[1])
        sentinel = chr(0xE000 + r)  # private-use, one per round
        expand[sentinel] = left + right
        merges.append((r + 1, pair, sentinel, left, right, weight))
        cur = cur.select(
            F.replace(F.col("word"), F.lit(pair), F.lit(sentinel)).alias("word"),
            "freq",
        )
    return merges


def tokenize_with_learned_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the tokenizer lifecycle: train the
    {BPE_MERGE_ROUNDS}-round merge table (above), then segment every
    document with it and report per-doc symbol counts before/after —
    the fertility/compression audit run after every tokenizer change.

    Scale shape: training as in ``vocab_bpe_learn_merges`` (one corpus
    pass + vocabulary-sized rounds); application is a SECOND corpus
    scan where the learned merges replay as a literal codegen
    ``replace`` chain inside a higher-order sum over the words array —
    zero shuffle, no explode, embarrassingly parallel. The oracle
    reruns the training CTEs and applies the same replaces via scalar
    subqueries, so train and apply stay one definition. Training goes
    through the corpus-fingerprint memo: when vocab_bpe_learn_merges
    already trained in this session, apply pays one no-shuffle
    fingerprint scan instead of the vocabulary build + rounds."""
    docs = load(spark, "documents", sf_dir)
    raw = _learn_merges_for_docs(docs, BPE_MERGE_ROUNDS)

    def merged_len(w):  # noqa: ANN001 — lambda-var Column
        x = w
        for _rank, pair, sentinel, _l, _r, _w in raw:
            x = F.replace(x, F.lit(pair), F.lit(sentinel))
        return F.length(x)

    words = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    total = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0), lambda acc, x: acc + x
    )
    lb = total(F.transform(words, lambda w: F.length(w)))
    la = total(F.transform(words, merged_len))
    return (
        docs.select(
            "doc_id",
            lb.cast("long").alias("n_symbols_before"),
            la.cast("long").alias("n_symbols_after"),
        )
        .filter(F.col("n_symbols_before") > 0)
        .withColumn(
            "compression",
            F.col("n_symbols_after").cast("double") / F.col("n_symbols_before"),
        )
    )


def _bpe_merges_oracle() -> str:
    """Unrolled {BPE_MERGE_ROUNDS}-round BPE oracle: tN picks round
    N's winner, wN is the re-segmented vocabulary, eN the sentinel's
    plain-string expansion; the final UNION expands each winner's two
    symbols back to strings."""
    s1, s2 = _BPE_S1, _BPE_S2

    def exp(x: str) -> str:
        return (
            f"replace(replace({x}, {s2}, (SELECT exp FROM e2)), "
            f"{s1}, (SELECT exp FROM e1))"
        )

    rows = []
    for r in (1, 2, 3):
        p = f"(SELECT pair FROM t{r})"
        rows.append(
            f"""SELECT {r} AS merge_rank,
               {exp(f"substr({p}, 1, 1)")} AS merge_left,
               {exp(f"substr({p}, 2, 1)")} AS merge_right,
               cast((SELECT weight FROM t{r}) AS bigint) AS weight"""
        )
    union = "\n        UNION ALL\n        ".join(rows)
    return f"""
        WITH {_bpe_training_ctes()},
        e1 AS (SELECT pair AS exp FROM t1),
        e2 AS (SELECT replace(pair, {s1}, (SELECT exp FROM e1)) AS exp FROM t2)
        {union}
    """


_BPE_S1, _BPE_S2, _BPE_S3 = "chr(57344)", "chr(57345)", "chr(57346)"


# Shared SQL twins of _corpus_vocab / _adjacent_pairs — the one
# definition every BPE oracle (pair stats, merge table, tokenize
# apply) builds from.
_BPE_W0_SQL = """(
            SELECT word, count(*) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> ''
            GROUP BY word
        )"""


def _bpe_pair_cte(src: str) -> str:
    return f"""(
            SELECT substr(word, cast(i AS int), 2) AS pair,
                   sum(freq) AS weight
            FROM {src}, unnest(range(1, length(word))) AS t(i)
            WHERE length(word) >= 2
            GROUP BY 1
        )"""


def _bpe_training_ctes() -> str:
    """The shared unrolled-training CTE chain (w0 vocabulary, pN pair
    stats, tN winners, wN re-segmented vocabularies) — one SQL
    definition for the merge-table oracle AND the tokenize-apply
    oracle, mirroring the one ``_learn_merges_raw`` on the engine
    side."""
    pair_cte = _bpe_pair_cte

    return f"""w0 AS {_BPE_W0_SQL},
        p1 AS {pair_cte('w0')},
        t1 AS (SELECT pair, weight FROM p1 ORDER BY weight DESC, pair LIMIT 1),
        w1 AS (SELECT replace(word, (SELECT pair FROM t1), {_BPE_S1}) AS word,
                      freq
               FROM w0),
        p2 AS {pair_cte('w1')},
        t2 AS (SELECT pair, weight FROM p2 ORDER BY weight DESC, pair LIMIT 1),
        w2 AS (SELECT replace(word, (SELECT pair FROM t2), {_BPE_S2}) AS word,
                      freq
               FROM w1),
        p3 AS {pair_cte('w2')},
        t3 AS (SELECT pair, weight FROM p3 ORDER BY weight DESC, pair LIMIT 1)"""


def _bpe_tokenize_oracle() -> str:
    """Apply oracle: rerun the training CTEs, then segment every word
    of every document with the three winners (scalar subqueries) and
    aggregate per-doc symbol counts."""
    merged = (
        f"replace(replace(replace(w, (SELECT pair FROM t1), {_BPE_S1}), "
        f"(SELECT pair FROM t2), {_BPE_S2}), "
        f"(SELECT pair FROM t3), {_BPE_S3})"
    )
    return f"""
        WITH {_bpe_training_ctes()},
        dw AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        m AS (
            SELECT doc_id, length(w) AS lb, length({merged}) AS la
            FROM dw WHERE w <> ''
        )
        SELECT doc_id,
               cast(sum(lb) AS bigint) AS n_symbols_before,
               cast(sum(la) AS bigint) AS n_symbols_after,
               cast(sum(la) AS double) / sum(lb) AS compression
        FROM m
        GROUP BY doc_id
        HAVING sum(lb) > 0
    """


QUERIES = {
    "corpus_curation_pipeline": corpus_curation_pipeline,
    "text_stats_quality": text_stats_quality,
    "text_langid": text_langid,
    "text_langid_confusion": text_langid_confusion,
    "text_fingerprint": text_fingerprint,
    "text_token_stats_by_lang": text_token_stats_by_lang,
    "text_ngram_diversity": text_ngram_diversity,
    "vocab_bpe_pair_stats": vocab_bpe_pair_stats,
    "vocab_bpe_learn_merges": vocab_bpe_learn_merges,
    "tokenize_with_learned_bpe": tokenize_with_learned_bpe,
}

def _sw_literal(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_SW_SQL = {lang: _sw_literal(sw) for lang, sw in STOPWORDS.items()}
# DuckDB literal of the flat union — the single quoting implementation
# shared with curation's Gopher-gate oracle.
ALL_SW_SQL = _sw_literal(ALL_STOPWORDS)

_LANGID_SCORES = ", ".join(
    f"len(list_intersect(words, {_SW_SQL[lang]})) AS score_{lang}"
    for lang in LANG_ORDER
)

# argmax with fixed tie order en > es > de > fr > zh, mirroring the
# Spark when-ladder exactly (strict > comparisons in the same order).
_LANGID_CASE = """
    CASE
      WHEN score_zh > greatest(score_en, score_es, score_de, score_fr) THEN 'zh'
      WHEN score_fr > greatest(score_en, score_es, score_de) THEN 'fr'
      WHEN score_de > greatest(score_en, score_es) THEN 'de'
      WHEN score_es > score_en THEN 'es'
      ELSE 'en'
    END
"""

_LANGID_SQL = f"""
    WITH scored AS (
        SELECT doc_id, lang, {_LANGID_SCORES}
        FROM (SELECT doc_id, lang,
                     list_distinct(string_split(text, ' ')) AS words
              FROM documents)
    )
    SELECT doc_id, lang,
           {_LANGID_CASE} AS predicted_lang,
           cast(greatest(score_en, score_es, score_de, score_fr, score_zh) AS int)
               AS lang_score,
           greatest(score_en, score_es, score_de, score_fr, score_zh) > 0
               AS is_reliable,
           {_LANGID_CASE} = lang AS matches_label
    FROM scored
"""

ORACLES = {
    # w0 is the shared vocabulary CTE; the pair explode here carries
    # the word column (for the DISTINCT support count), so it uses the
    # row form rather than the aggregated _bpe_pair_cte.
    "vocab_bpe_pair_stats": f"""
        WITH w0 AS {_BPE_W0_SQL},
        p AS (
            SELECT word, freq, substr(word, cast(i AS int), 2) AS pair
            FROM w0, unnest(range(1, length(word))) AS t(i)
            WHERE length(word) >= 2
        )
        SELECT pair,
               cast(sum(freq) AS bigint) AS weight,
               count(DISTINCT word) AS n_vocab_words
        FROM p
        GROUP BY pair
        ORDER BY weight DESC, pair
        LIMIT {BPE_TOP_PAIRS}
    """,
    "vocab_bpe_learn_merges": _bpe_merges_oracle(),
    "tokenize_with_learned_bpe": _bpe_tokenize_oracle(),
    "corpus_curation_pipeline": f"""
        WITH base AS (
            SELECT doc_id, lang, text,
                   string_split(text, ' ') AS words,
                   cast(length(text) AS int) AS nc
            FROM documents
        ),
        scored AS (
            SELECT doc_id, lang,
                   cast(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS int)
                       AS n_tokens,
                   (CASE WHEN nc BETWEEN 100 AND 500 THEN cast(0.5 AS double) ELSE 0.0 END
                    + CASE WHEN (CASE WHEN len(words) > 0
                                      THEN cast(nc - (len(words) - 1) AS double) / len(words)
                                      ELSE 0.0 END) BETWEEN 3.0 AND 10.0
                           THEN cast(0.3 AS double) ELSE 0.0 END
                    + CASE WHEN len(words) >= 20 THEN cast(0.2 AS double) ELSE 0.0 END)
                       AS quality_score,
                   md5(list_aggregate(list_sort(list_distinct(words)),
                                      'string_agg', ' ')) AS fp
            FROM base
        )
        SELECT doc_id, lang, n_tokens, quality_score
        FROM scored
        WHERE quality_score >= 0.65
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)
        ORDER BY doc_id
    """,
    "text_stats_quality": f"""
        WITH base AS (
            SELECT doc_id, lang, text,
                   string_split(text, ' ') AS words,
                   regexp_extract_all(text, '{TOKEN_PATTERN}') AS tokens,
                   cast(length(text) AS int) AS nc
            FROM documents
        ),
        stats AS (
            SELECT doc_id, lang, nc,
                   cast(len(words) AS int) AS nw,
                   cast(len(tokens) AS int) AS nt,
                   cast(len(list_distinct(words)) AS int) AS nu,
                   CASE WHEN len(words) > 0
                        THEN cast(nc - (len(words) - 1) AS double) / len(words)
                        ELSE 0.0 END AS mwl
            FROM base
        )
        SELECT doc_id, lang,
               nc AS n_chars_computed,
               nw AS n_words,
               nt AS n_tokens,
               nu AS n_unique_words,
               mwl AS mean_word_len,
               (CASE WHEN nc BETWEEN 100 AND 500 THEN cast(0.5 AS double) ELSE 0.0 END
                + CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN cast(0.3 AS double) ELSE 0.0 END
                + CASE WHEN nw >= 20 THEN cast(0.2 AS double) ELSE 0.0 END) AS quality_score
        FROM stats
    """,
    "text_langid": _LANGID_SQL,
    "text_langid_confusion": f"""
        SELECT lang, predicted_lang, count(*) AS n_docs,
               count(*) FILTER (WHERE is_reliable) AS n_reliable
        FROM ({_LANGID_SQL})
        GROUP BY lang, predicted_lang
    """,
    "text_fingerprint": """
        SELECT md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                                  'string_agg', ' ')) AS fingerprint,
               count(*) AS n_docs,
               min(doc_id) AS keep_doc_id
        FROM documents
        GROUP BY 1
    """,
    "text_token_stats_by_lang": f"""
        SELECT lang,
               count(*) AS n_docs,
               cast(sum(cast(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS bigint))
                    AS bigint) AS total_tokens,
               cast(sum(cast(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS bigint))
                    AS double) / count(*) AS mean_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    # Trigrams with multiplicity, same <3-word clamp as the dedup
    # shingle oracles (the whole text counts as one trigram).
    "text_ngram_diversity": """
        WITH tris AS (
            SELECT lang,
                   unnest(CASE WHEN len(words) < 3
                               THEN [array_to_string(words, ' ')]
                               ELSE [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                     for i in range(1, len(words) - 1)]
                          END) AS tri
            FROM (SELECT lang, string_split(text, ' ') AS words
                  FROM documents)
        )
        SELECT lang,
               cast(count(*) AS bigint) AS n_trigrams,
               cast(count(DISTINCT tri) AS bigint) AS n_distinct_trigrams,
               cast(count(DISTINCT tri) AS bigint) / count(*) AS diversity
        FROM tris
        GROUP BY lang
    """,
}
