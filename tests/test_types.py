"""Cross-engine schema audit: every oracle-checked query must emit the
same logical column types in Spark and DuckDB (int-width drift like
DuckDB's sum(int)->HUGEINT or row_number->BIGINT is a silent hash-gate
risk)."""

from __future__ import annotations

import duckdb
import pytest

from real_time_streaming_system_with_apache_kafka_spark import registry
from real_time_streaming_system_with_apache_kafka_spark.schemas import STAR_TABLES

_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    # DuckDB TIMESTAMP is timezone-naive; the engine surfaces session-TZ
    # timestamps with the session pinned to UTC, so wall clocks align.
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "FLOAT": "float",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.all_oracles()))
def test_column_types_align(spark, sf_dir, duck, name):
    dtypes = {
        r[0]: r[1] for r in duck.execute(
            f"DESCRIBE ({registry.all_oracles()[name]})"
        ).fetchall()
    }
    stypes = {
        f.name: f.dataType.simpleString()
        for f in registry.all_queries()[name](spark, sf_dir).schema.fields
    }
    def duck_to_spark(dt: str) -> str:
        if dt.endswith("[]"):  # list types: FLOAT[] -> array<float>
            return f"array<{duck_to_spark(dt[:-2])}>"
        return _DUCK_TO_SPARK.get(dt, dt.lower())

    mismatches = {
        c: (stypes.get(c), dt)
        for c, dt in dtypes.items()
        if stypes.get(c) != duck_to_spark(dt)
    }
    assert not mismatches, mismatches
