"""Probabilistic sketch operators with measured-error audits: a
count-min sketch over the corpus term stream and a Bloom-filter
pre-filter for incremental dedup — the two fixed-size summaries a
100 TB pipeline leans on when exact state no longer fits.

The reference engine keeps exact pandas state over <=5,000 rows
(dashboard.py:236-303); at cluster scale the same questions ("how hot
is this term?", "have we ingested this document before?") are answered
with mergeable sketches. Both operators here follow the repo's
"measure, don't guess" audit shape (``dedup_lsh_calibration``,
``sim_ann_recall_eval``): they publish the sketch's answer NEXT TO the
exact answer so the error is a measured column, not an assumption.

Exactness discipline: the sketches themselves are deterministic —
bucket/bit positions come from the md5-hex-prefix hash the sampling
suite already uses (cross-engine identical) — so sketch contents,
estimates, and error columns are exact integers on both engines.

Scale shapes:
- CMS: per-term frequencies aggregate once (the only corpus-sized
  shuffle, map-side combined); the sketch is then built from the
  VOCABULARY-sized tf table, and the sketch itself is WIDTH x DEPTH
  cells regardless of corpus size. Cells combine associatively
  (integer sums), i.e. per-partition partial sketches merge — the
  property that makes CMS streamable and why Spark can fold it
  map-side. WIDTH=16 is a demo setting sized to the fixture's 31-term
  vocabulary so collisions actually exercise the min; production uses
  2**20+ buckets — same plan, still O(1) state.
- Bloom: the member side (history digests) collapses to <=NBITS set
  bits — broadcast to every probe partition, exactly how a production
  incremental-dedup run ships a bloom of 100 TB of history instead of
  anti-joining it (``dedup_incremental_ingest`` is the exact-join
  twin; the bloom is its candidate pre-filter — only bloom-positives
  pay the exact join). False positives are the price, and this
  operator MEASURES them per source against exact membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.ngrams import (
    regex_word_ngrams,
)
from real_time_streaming_system_with_apache_kafka_spark.operators.curation import (
    _ORACLE_NGRAMS,
    BENCH_MOD,
    DECON_N,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
    load,
    load_rebalanced,
)

# ---------------------------------------------------------------------------
# Count-min sketch

CMS_WIDTH = 16  # buckets per hash row (demo-sized; see module docstring)
CMS_DEPTH = 4  # independent hash rows
CMS_TOP_N = 15  # heavy hitters audited
CMS_TAG = "cms_v1"


def _md5_mod(expr: str, mod: int) -> F.Column:
    """First 8 md5 hex digits of ``expr`` (a SQL string expression) as
    a bigint mod ``mod`` — the cross-engine-deterministic hash the
    sampling and DSIR suites already use (< 2**32, so pmod == %)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.expr(expr)), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(mod),
    )


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch audit: build a {CMS_DEPTH}x{CMS_WIDTH} CMS over
    the corpus term stream, then publish, for the {CMS_TOP_N} exact
    heavy hitters, the exact count next to the sketch estimate and the
    collision overcount (>= 0 by the CMS one-sided guarantee — pinned
    in tests).

    Plan: one corpus-sized explode+aggregate produces per-term
    frequencies; everything after (sketch cells, top-N window, probe
    join) is vocabulary- or sketch-sized. The two consumers of the tf
    aggregate share a canonical subtree, so Spark's ReuseExchange
    serves both from one shuffle."""
    docs = load_rebalanced(spark, "documents", sf_dir)
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(CMS_DEPTH)])
    ).alias("r")
    bucket = _md5_mod(
        f"concat('{CMS_TAG}', cast(r AS string), '#', term)", CMS_WIDTH
    ).alias("bucket")
    cells = (
        tf.select("term", "c", rows)
        .select("c", "r", bucket)
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("cell_cnt"))
    )
    # Distributed top-N (TakeOrderedAndProject) FIRST — a global rank
    # window over tf would drag the whole vocabulary to one partition,
    # which a web-scale corpus does not forgive. The rank window then
    # runs over only the N survivors.
    top = (
        tf.orderBy(F.desc("c"), F.asc("term"))
        .limit(CMS_TOP_N)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("c"), F.asc("term"))
            ),
        )
        .withColumnRenamed("c", "exact_cnt")
    )
    probes = top.select("rk", "term", "exact_cnt", rows).select(
        "rk", "term", "exact_cnt", "r", bucket
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("rk", "term", "exact_cnt")
        .agg(F.min("cell_cnt").alias("est_cnt"))
        .select(
            "rk",
            "term",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination pre-filter

BLOOM_BITS = 8192
BLOOM_HASHES = 3
BLOOM_TAG = "bloom_v1"
# Benchmark slice and gram size are IMPORTED from
# curation.decontaminate_holdout so the exact pass and its bloom
# pre-filter can never disagree about what "contaminated" means.
BLOOM_MOD = BENCH_MOD
BLOOM_N = DECON_N


def sketch_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured false-positive audit of Bloom-filter decontamination
    (the Dolma-style production shape): the held-out benchmark slice
    (doc_id % {BLOOM_MOD} == 0, the same split as
    ``decontaminate_holdout``) collapses to a {BLOOM_BITS}-bit /
    {BLOOM_HASHES}-hash Bloom filter of its distinct word
    {BLOOM_N}-grams; every training document probes its own distinct
    grams against it. Per bloom-flagged doc: distinct grams, grams the
    bloom flags, grams ACTUALLY in the benchmark set (exact), and the
    bloom's false-positive grams.

    No-false-negative law — every exact contaminated gram is
    bloom-positive, so every ``decontaminate_holdout`` doc appears
    here with n_true_hit_grams intact — is pinned in tests. That is
    what makes the bloom a safe pre-filter: bloom-negative docs (the
    overwhelming majority at a well-sized BLOOM_BITS) skip the exact
    gram join entirely; only flagged docs pay it, and this audit
    measures exactly how many of those payments were collision waste.

    Scale shape: the filter is <= {BLOOM_BITS} set-bit rows no matter
    how big the benchmark suite is — broadcast; training grams hash
    map-side ({BLOOM_HASHES} integer hashes per distinct gram); the
    only corpus-sized shuffle is the per-(doc, gram) rollup the exact
    decontamination pass needs anyway."""
    docs = load(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    grams = docs.select(
        "doc_id",
        (F.col("doc_id") % BLOOM_MOD == 0).alias("is_bench"),
        F.explode(
            F.array_distinct(regex_word_ngrams(F.col("text"), BLOOM_N))
        ).alias("gram"),
    )
    bench_grams = (
        grams.filter("is_bench")
        .select("gram")
        .distinct()
        .withColumn("in_bench", F.lit(1))
    )
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(BLOOM_HASHES)])
    ).alias("i")
    bitpos = _md5_mod(
        f"concat('{BLOOM_TAG}', cast(i AS string), '#', gram)",
        BLOOM_BITS,
    ).alias("bitpos")
    set_bits = (
        bench_grams.select("gram", hashes)
        .select(bitpos)
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(~F.col("is_bench"))
    per_gram = (
        train.select("doc_id", "gram", hashes)
        .select("doc_id", "gram", bitpos)
        .join(F.broadcast(set_bits), "bitpos", "left")
        .groupBy("doc_id", "gram")
        .agg((F.count("hit") == BLOOM_HASHES).alias("bloom_pos"))
    )
    flagged = per_gram.join(F.broadcast(bench_grams), "gram", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if("bloom_pos").alias("n_bloom_hit_grams"),
            F.count("in_bench").alias("n_true_hit_grams"),
            F.count_if(
                F.col("bloom_pos") & F.col("in_bench").isNull()
            ).alias("n_false_pos_grams"),
        )
        .filter(F.col("n_bloom_hit_grams") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hit_grams",
            "n_true_hit_grams",
            "n_false_pos_grams",
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "sketch_cms_heavy_hitters": sketch_cms_heavy_hitters,
    "sketch_bloom_decontaminate": sketch_bloom_decontaminate,
}

ORACLES = {
    "sketch_cms_heavy_hitters": f"""
        WITH tf AS (
            SELECT term, cast(count(*) AS bigint) AS c
            FROM (SELECT unnest(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY term
        ),
        hrows AS (SELECT unnest(range({CMS_DEPTH})) AS r),
        cells AS (
            SELECT r,
                   (cast(concat('0x', substr(md5(
                        '{CMS_TAG}' || cast(r AS varchar) || '#' || term),
                        1, 8)) AS bigint) % {CMS_WIDTH}) AS bucket,
                   cast(sum(c) AS bigint) AS cell_cnt
            FROM tf CROSS JOIN hrows
            GROUP BY 1, 2
        ),
        top AS (
            SELECT rk, term, exact_cnt FROM (
                SELECT term, c AS exact_cnt,
                       cast(row_number() OVER (ORDER BY c DESC, term)
                            AS int) AS rk
                FROM tf)
            WHERE rk <= {CMS_TOP_N}
        ),
        probes AS (
            SELECT rk, term, exact_cnt, r,
                   (cast(concat('0x', substr(md5(
                        '{CMS_TAG}' || cast(r AS varchar) || '#' || term),
                        1, 8)) AS bigint) % {CMS_WIDTH}) AS bucket
            FROM top CROSS JOIN hrows
        )
        SELECT rk, term, exact_cnt,
               cast(min(cell_cnt) AS bigint) AS est_cnt,
               cast(min(cell_cnt) - exact_cnt AS bigint) AS overcount
        FROM probes JOIN cells USING (r, bucket)
        GROUP BY rk, term, exact_cnt
        ORDER BY rk
    """,
    "sketch_bloom_decontaminate": f"""
        WITH grams AS ({_ORACLE_NGRAMS}),
        bench AS (SELECT DISTINCT gram FROM grams WHERE is_bench),
        hashes AS (SELECT unnest(range({BLOOM_HASHES})) AS i),
        set_bits AS (
            SELECT DISTINCT
                   (cast(concat('0x', substr(md5(
                        '{BLOOM_TAG}' || cast(i AS varchar) || '#'
                        || gram), 1, 8)) AS bigint) % {BLOOM_BITS})
                       AS bitpos
            FROM bench CROSS JOIN hashes
        ),
        per_gram AS (
            SELECT doc_id, gram,
                   count(s.bitpos) = {BLOOM_HASHES} AS bloom_pos
            FROM (SELECT doc_id, gram,
                         (cast(concat('0x', substr(md5(
                              '{BLOOM_TAG}' || cast(i AS varchar) || '#'
                              || gram), 1, 8)) AS bigint) % {BLOOM_BITS})
                             AS bitpos
                  FROM grams CROSS JOIN hashes
                  WHERE NOT is_bench) p
            LEFT JOIN set_bits s USING (bitpos)
            GROUP BY doc_id, gram
        ),
        flagged AS (
            SELECT g.doc_id, g.bloom_pos, b.gram IS NOT NULL AS in_bench
            FROM per_gram g LEFT JOIN bench b USING (gram)
        )
        SELECT doc_id,
               cast(count(*) AS bigint) AS n_grams,
               cast(count(*) FILTER (WHERE bloom_pos) AS bigint)
                   AS n_bloom_hit_grams,
               cast(count(*) FILTER (WHERE in_bench) AS bigint)
                   AS n_true_hit_grams,
               cast(count(*) FILTER (WHERE bloom_pos AND NOT in_bench)
                    AS bigint) AS n_false_pos_grams
        FROM flagged GROUP BY doc_id
        HAVING count(*) FILTER (WHERE bloom_pos) > 0
        ORDER BY doc_id
    """,
}
