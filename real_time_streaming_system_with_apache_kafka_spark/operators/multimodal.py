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


QUERIES = {
    "mm_decode_metadata": mm_decode_metadata,
    "mm_frame_sample": mm_frame_sample,
    "mm_feature_extract": mm_feature_extract,
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
}
