"""Multimodal plumbing contracts: Arrow batch shape, determinism of the
stubbed decode, frame-sample fan-out arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import multimodal
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def test_decode_metadata_matches_direct_python(spark, sf_dir):
    rows = multimodal.mm_decode_metadata(spark, sf_dir).collect()
    docs = {r["doc_id"]: r["text"] for r in load(spark, "documents", sf_dir).collect()}
    assert len(rows) == len(docs)
    for r in rows[:25]:
        want = multimodal._decode_stub(docs[r["doc_id"]].encode("utf-8"))
        assert r["n_bytes"] == want["n_bytes"]
        assert r["sha256_prefix"] == want["sha256_prefix"]
        assert r["pseudo_width"] == want["pseudo_width"]


def test_frame_sample_counts(spark, sf_dir):
    rows = multimodal.mm_frame_sample(spark, sf_dir).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in list(by_doc.items())[:25]:
        assert sorted(idxs) == list(range(0, max(idxs) + 1, 6))


FEATURE_COLS = [
    "n_bytes",
    "byte_sum_997",
    "first_byte",
    "last_byte",
    "distinct_ratio",
]


def test_feature_extract_deterministic_and_shaped(spark, sf_dir):
    def run():
        return {
            r["doc_id"]: tuple(r[c] for c in FEATURE_COLS)
            for r in multimodal.mm_feature_extract(spark, sf_dir).collect()
        }

    a, b = run(), run()
    assert a == b
    # The r8 driver-contract shape: five named scalar double columns,
    # no complex types (an array column crashed the r7 harness canon).
    schema = multimodal.mm_feature_extract(spark, sf_dir).schema
    assert [f.name for f in schema.fields] == ["doc_id"] + FEATURE_COLS
    assert all(
        f.dataType.simpleString() == "double"
        for f in schema.fields
        if f.name != "doc_id"
    )
    n_chars = {
        r["doc_id"]: r["n_chars"] for r in load(spark, "documents", sf_dir).collect()
    }
    for doc_id, feats in list(a.items())[:25]:
        assert feats[0] == float(n_chars[doc_id])  # ascii text: bytes == chars
        assert 0.0 < feats[4] <= 1.0  # distinct_ratio bounded


def test_feature_extract_oracle_agrees_on_empty_doc(spark, sf_dir, tmp_path):
    """r9 ADVICE regression: the DuckDB twin's per-character CTE emits
    no row for an empty text, so a plain inner join dropped that doc
    and the old distinct_ratio divided by octet_length = 0. The twin is
    now LEFT JOIN + COALESCE with a greatest(n, 1) denominator,
    mirroring the kernel's ``len(b) or 1`` guard — both engines must
    emit the all-zero feature row for an empty payload. Current
    fixtures have no empty doc, so this builds a corpus that does."""
    import shutil

    from real_time_streaming_system_with_apache_kafka_spark.schemas import STAR_TABLES
    from tests.parity import assert_parity

    aug = tmp_path / "sf_empty_doc"
    aug.mkdir()
    for t in STAR_TABLES:
        shutil.copyfile(f"{sf_dir}/{t}.parquet", aug / f"{t}.parquet")
    docs = load(spark, "documents", sf_dir).limit(5)
    extra = spark.createDataFrame(
        [(10_000_001, "", "en", "synthetic", 0)], schema=docs.schema
    )
    docs.unionByName(extra).coalesce(1).toPandas().to_parquet(
        aug / "documents.parquet", index=False
    )
    df = multimodal.mm_feature_extract(spark, str(aug))
    feats = {r["doc_id"]: r for r in df.collect()}
    empty = feats[10_000_001]
    assert empty["n_bytes"] == 0.0
    assert empty["distinct_ratio"] == 0.0  # 0 / max(0, 1), not NULL
    assert_parity(
        df,
        multimodal.ORACLES["mm_feature_extract"],
        str(aug),
        name="mm_feature_extract[empty-doc]",
    )
