"""File sources beyond parquet: JSONL and CSV with explicit schemas
and per-record error capture.

The reference ingests JSON records one at a time and silently skips
malformed ones (consumer.py poll loop, json.loads try/except — SNK3 in
SURVEY.md §2). The batch equivalent is PERMISSIVE parsing with a
corrupt-record column: bad lines become quarantine rows instead of
killing the job OR silently vanishing — at 100 TB both failure modes
are unacceptable (one poison line must not fail a 1000-executor stage;
silent drops must not skew training data).

Scale notes: both readers are plain DataSource scans — splittable
(JSONL and CSV split on line boundaries), predicate/column pruning
apply to the parsed columns, and the quarantine split is two lazy
filters over one scan, not two reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """The user schema plus the corrupt-record capture column."""
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """One JSON object per line, PERMISSIVE: rows that fail to parse
    (or fail type coercion on every field) surface with the raw line in
    ``_corrupt_record`` and nulls elsewhere."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV with explicit schema, PERMISSIVE: malformed lines (wrong
    arity, uncoercible values) carry the raw line in
    ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_capture_col, quarantined_raw_rows).

    Two lazy filters over the same scan; callers write the quarantine
    side to a dead-letter location and continue with the clean side —
    the reference's skip-and-continue semantics, but with the skipped
    records preserved for audit. The quarantine side keeps the full
    row (raw line plus whatever fields did parse): partial context for
    triage, and Spark disallows plans that reference ONLY the internal
    corrupt-record column.
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
