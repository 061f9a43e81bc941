"""JSONL/CSV source tests: per-record error capture (the batch form of
the reference's skip-and-continue consumer loop, SURVEY.md SNK3) —
poison lines become quarantine rows, never job failures or silent
drops."""

from __future__ import annotations

from pyspark.sql import types as T

from real_time_streaming_system_with_apache_kafka_spark.sources import files

SCHEMA = T.StructType(
    [
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType()),
    ]
)


def test_jsonl_corrupt_capture(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"a": 1, "b": "x"}\n'
        "not json at all\n"
        '{"a": 2, "b": "y"}\n'
        '{"a": 3, "b":\n'  # truncated object
    )
    df = files.read_jsonl(spark, str(p), SCHEMA)
    clean, bad = files.split_quarantine(df)
    assert sorted(r["a"] for r in clean.collect()) == [1, 2]
    assert clean.columns == ["a", "b"]
    raws = [r[files.CORRUPT_COL] for r in bad.collect()]
    assert len(raws) == 2 and all(r is not None for r in raws)


def test_csv_corrupt_capture(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\nnotanint,y\n3,z\n")
    df = files.read_csv(spark, str(p), SCHEMA)
    clean, bad = files.split_quarantine(df)
    assert sorted(r["a"] for r in clean.collect()) == [1, 3]
    # The poison line is preserved verbatim for audit.
    assert [r[files.CORRUPT_COL] for r in bad.collect()] == ["notanint,y"]


def test_quarantine_is_two_filters_one_scan(spark, tmp_path):
    """Both sides stay lazy filters over the file scan — no shuffle."""
    p = tmp_path / "in2.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n')
    clean, bad = files.split_quarantine(files.read_jsonl(spark, str(p), SCHEMA))
    for df in (clean, bad):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan


def test_orc_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    """ORC is the other columnar format Spark ships natively; the
    engine's tables must survive a parquet -> ORC -> read roundtrip
    bit-for-bit (schema and values), so an ORC-based lake is a drop-in
    source."""
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

    src = load(spark, "customer", sf_dir)
    out = str(tmp_path / "customer_orc")
    src.write.format("orc").mode("overwrite").save(out)
    back = spark.read.format("orc").load(out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
