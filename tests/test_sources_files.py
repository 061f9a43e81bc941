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


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A 100 TB dataset accretes columns over time; mergeSchema reads
    old and new files as one table — old files surface the new column
    as NULL, values and counts intact."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id").alias("a"), F.lit("v1").alias("b")
    ).write.parquet(base + "/batch=1")
    spark.range(3, 5).select(
        F.col("id").alias("a"),
        F.lit("v2").alias("b"),
        F.lit(9.5).alias("c_new"),
    ).write.parquet(base + "/batch=2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"a", "b", "c_new", "batch"}
    assert df.count() == 5
    assert df.filter(F.col("c_new").isNull()).count() == 3  # old files
    assert df.filter(F.col("c_new") == 9.5).count() == 2


def test_ignore_corrupt_files_skips_garbage(spark, tmp_path):
    """Operational tolerance: a torn/garbage file inside a 100 TB
    directory must not fail the scan when ignoreCorruptFiles is on —
    the valid files' rows all survive."""
    from pyspark.sql import functions as F

    d = tmp_path / "mixed"
    d.mkdir()
    spark.range(4).select(F.col("id").alias("a")).write.parquet(
        str(d / "good")
    )
    (d / "good" / "garbage.parquet").write_bytes(b"this is not parquet at all")

    old = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        # Explicit schema: inference itself footer-reads every file and
        # can trip on the garbage one before the conf applies — at
        # scale production readers declare the schema anyway.
        got = spark.read.schema("a bigint").parquet(str(d / "good")).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", old)
    assert got == 4
