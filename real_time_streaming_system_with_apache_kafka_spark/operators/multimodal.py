"""Multimodal column plumbing (north-star extension).

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column with typed metadata beside it; decode / feature
extraction / frame sampling run as Arrow-batched pandas UDFs
(``mapInPandas`` / ``pandas_udf``) so bytes cross the JVM<->Python
boundary in columnar batches, never row-at-a-time.

The actual media codecs are NOT in this container, so the decode step
is a clearly-marked deterministic stub (``_decode_stub``) — everything
around it (schema, binary encoding, Arrow batch iteration, partition-
parallel UDF execution, metadata extraction) is the real production
plumbing and is oracle-checked: the stub's outputs are pure functions
of the bytes (length, sha256, derived pseudo-dimensions) that DuckDB
can recompute in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, sha256_prefix string, "
    "pseudo_width long, pseudo_height long, n_frames long"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a media table: utf-8 bytes of the text stand in for the
    image/audio payload; real pipelines read the bytes from object
    storage with exactly this schema."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("image/fake").alias("mime_type"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB for the media decoder (no codec libs in this container).

    A real implementation would ``PIL.Image.open``/``av.open`` here and
    raise NotImplementedError on unsupported codecs. The stub derives
    deterministic metadata from the bytes so the full pipeline is
    testable end-to-end.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "sha256_prefix": hashlib.sha256(payload).hexdigest()[:16],
        "pseudo_width": n % 640,
        "pseudo_height": (n * 7) % 480,
        "n_frames": n % 24 + 1,
    }


def make_decode_batches():
    """Build the mapInPandas kernel as a self-contained closure.

    Python UDF workers unpickle the kernel by value; referencing
    module-level names would require this package on every worker's
    PYTHONPATH (not true when an external driver hosts the session), so
    the kernel closes over only stdlib/pandas.
    """

    def decode_stub(payload: bytes) -> dict:
        import hashlib as _hashlib

        n = len(payload)
        return {
            "n_bytes": n,
            "sha256_prefix": _hashlib.sha256(payload).hexdigest()[:16],
            "pseudo_width": n % 640,
            "pseudo_height": (n * 7) % 480,
            "n_frames": n % 24 + 1,
        }

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            meta = pdf["payload"].map(decode_stub)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": meta.map(lambda m: m["n_bytes"]),
                    "sha256_prefix": meta.map(lambda m: m["sha256_prefix"]),
                    "pseudo_width": meta.map(lambda m: m["pseudo_width"]),
                    "pseudo_height": meta.map(lambda m: m["pseudo_height"]),
                    "n_frames": meta.map(lambda m: m["n_frames"]),
                }
            )

    return decode_batches


def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads -> decoded metadata via Arrow-batched
    ``mapInPandas`` (the decode itself is the stub above; the plumbing
    — binary column, batch iterator, schema, parallelism — is real)."""
    # Spread Arrow batches across workers regardless of file layout —
    # decode is the expensive step, not the scan.
    docs = load(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return with_binary_payload(docs).mapInPandas(make_decode_batches(), DECODE_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per sampled frame index (every 6th frame
    of ``n_frames``) — the explode pattern a video pipeline uses to fan
    decoded frames out to per-frame feature extraction."""
    meta = mm_decode_metadata(spark, sf_dir)
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(6))
        ).alias("frame_idx"),
    )


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload feature vector via a scalar pandas UDF (Arrow
    vectorized): deterministic byte statistics standing in for a model
    embedding — same signature a real encoder UDF would have."""
    docs = load(spark, "documents", sf_dir)

    @F.pandas_udf("array<double>")
    def byte_features(payload: pd.Series) -> pd.Series:
        def feats(b: bytes) -> list[float]:
            n = len(b) or 1
            return [
                float(len(b)),
                float(sum(b) % 997) / 997.0,
                float(b[0] if b else 0) / 255.0,
                float(b[-1] if b else 0) / 255.0,
                float(len(set(b))) / n,
            ]

        return payload.map(feats)

    return with_binary_payload(docs).select(
        "doc_id", byte_features(F.col("payload")).alias("features")
    )


PH_BITS = 32  # perceptual-hash width (stub; real pHash is 64)
PH_BANDS = 2  # pigeonhole bands: full recall for hamming <= PH_BANDS-1
PH_HAMMING = 1  # near-duplicate threshold (radius; bands = radius+1)


def make_phash_batches():
    """Arrow-batched perceptual-hash kernel (self-contained closure,
    same worker-pickling rule as make_decode_batches). The STUB hash is
    a 32-bit simhash over byte 3-grams of the payload — a pure,
    similarity-preserving function of the bytes that DuckDB can
    recompute; a real implementation would DCT the decoded pixels
    here. Bit b of the hash = sign of the +-1 vote sum over grams,
    where gram g votes by bit b of int(md5(g)[:8], 16). Width
    matters at scale: a 16-bit variant saturates its band-key
    space as the corpus grows (buckets of thousands at 500k docs
    -> quadratic candidates, measured in the scale soak); 32 bits
    keeps 16-bit band keys sparse through multi-million-doc
    corpora, exactly why production pHash is 64."""

    def phash(payload: bytes) -> int:
        import hashlib as _hashlib

        import numpy as _np

        n = len(payload)
        grams = (
            [payload]
            if n < 3
            else [payload[i : i + 3] for i in range(n - 2)]
        )
        # Vectorized +-1 vote accumulation (bit-identical to the
        # per-bit loop, ~4x faster — the kernel dominates the sf10
        # soak otherwise): unpack each gram's 32 md5 bits at once.
        v = _np.array(
            [int(_hashlib.md5(g).hexdigest()[:8], 16) for g in grams],
            dtype=_np.uint32,
        )
        bits = (v[:, None] >> _np.arange(32, dtype=_np.uint32)) & 1
        acc = bits.astype(_np.int64).sum(axis=0) * 2 - len(grams)
        return int(
            ((acc > 0).astype(_np.uint64) << _np.arange(32, dtype=_np.uint64)).sum()
        )

    def phash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pdf["payload"].map(phash),
                }
            )

    return phash_batches


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the binary media
    column — the production image-dedup plan end to end: (1) hash each
    payload with an Arrow-batched kernel, (2) generate candidates by
    MULTI-INDEX HAMMING blocking — split the hash into PH_BANDS bands;
    by pigeonhole, any pair within hamming PH_BANDS-1 agrees exactly on
    at least one band, so band-equality joins give FULL recall at
    threshold PH_HAMMING — and (3) verify candidates with the exact
    bit_count(xor) distance. No all-pairs comparison anywhere.

    Cross-engine exactness: the kernel is a pure function of the bytes
    (md5-vote simhash), so the DuckDB oracle rebuilds the identical
    hash from character 3-grams (the fixture payload is the utf-8 text
    — ASCII, so byte grams == character grams), proving the Arrow
    kernel against its SQL specification — the same UDF-vs-SQL parity
    discipline as mm_decode_metadata.

    Scale shape: hashing is embarrassingly parallel over Arrow
    batches; the band join shuffles (band, key) pairs (4 rows per doc);
    verification touches only colliding pairs. This is dedup_simhash's
    multimodal cousin with the hamming-RADIUS (not identical-bucket)
    semantics real pHash dedup needs."""
    docs = load(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    ph = with_binary_payload(docs).mapInPandas(
        make_phash_batches(), "doc_id long, phash long"
    )
    band_width = PH_BITS // PH_BANDS
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(phash div {1 << (b * band_width)})"
                            f" % {1 << band_width}"
                        ).alias("key"),
                    )
                    for b in range(PH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(ph_a ^ ph_b)").alias("hamming"),
        )
        .filter(F.col("hamming") <= PH_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


QUERIES = {
    "mm_decode_metadata": mm_decode_metadata,
    "mm_frame_sample": mm_frame_sample,
    "mm_feature_extract": mm_feature_extract,
    "mm_phash_dedup": mm_phash_dedup,
}

ORACLES = {
    # The stub's metadata is a pure function of the payload bytes, so
    # the oracle recomputes it in SQL from the same utf-8 encoding.
    "mm_decode_metadata": """
        SELECT doc_id,
               cast(octet_length(encode(text)) AS bigint) AS n_bytes,
               substr(sha256(text), 1, 16) AS sha256_prefix,
               octet_length(encode(text)) % 640 AS pseudo_width,
               (octet_length(encode(text)) * 7) % 480 AS pseudo_height,
               octet_length(encode(text)) % 24 + 1 AS n_frames
        FROM documents
    """,
    "mm_frame_sample": """
        SELECT doc_id,
               octet_length(encode(text)) % 24 + 1 AS n_frames,
               unnest(range(0, octet_length(encode(text)) % 24 + 1, 6)) AS frame_idx
        FROM documents
    """,
    # mm_feature_extract: rows-only (float list built in Python; the
    # features are asserted deterministic in tests/test_multimodal.py).
    #
    # mm_phash_dedup: the fixture payload is the utf-8 text and the
    # corpus is ASCII, so byte 3-grams == character 3-grams and the
    # SQL twin rebuilds the kernel's hash exactly.
    "mm_phash_dedup": f"""
        WITH w AS (
            SELECT doc_id, text,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        ch AS (
            SELECT doc_id, text, n,
                   unnest(range(CASE WHEN n < 3 THEN 1
                                     ELSE n - 2 END)) AS i
            FROM w
        ),
        v AS (
            SELECT doc_id,
                   cast(concat('0x', substr(md5(
                       CASE WHEN n < 3 THEN text
                            ELSE substr(text, cast(i AS int) + 1, 3) END
                   ), 1, 8)) AS bigint) AS val
            FROM ch
        ),
        bits AS (
            SELECT doc_id, b,
                   sum(CASE WHEN (val // (1 << b)) % 2 = 1
                            THEN 1 ELSE -1 END) AS acc
            FROM v, (SELECT unnest(range({PH_BITS})) AS b)
            GROUP BY doc_id, b
        ),
        ph AS (
            SELECT doc_id,
                   cast(sum(CASE WHEN acc > 0 THEN (1 << b)
                                 ELSE 0 END) AS bigint) AS phash
            FROM bits GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, phash, band,
                   (phash // (1 << (band * {PH_BITS // PH_BANDS})))
                       % {1 << (PH_BITS // PH_BANDS)} AS key
            FROM ph, (SELECT unnest(range({PH_BANDS})) AS band)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                            a.phash AS ph_a, b.phash AS ph_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key
                 AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               cast(bit_count(xor(ph_a, ph_b)) AS int) AS hamming
        FROM cand
        WHERE bit_count(xor(ph_a, ph_b)) <= {PH_HAMMING}
        ORDER BY doc_a, doc_b
    """,
}
