"""Golden-fixture pin for the dash_* / src1 oracles.

The dashboard oracles (operators/dashboard.py) and the src1 oracle
(generator.py) recompute their frames in DuckDB from
``tests/fixtures/trades_seed42_n20000.parquet``. That design is only
sound while the fixture equals the LIVE generator bit-for-bit — this
test is the pin. If the generator's semantics ever change, regenerate
with ``python tools/make_trades_fixture.py`` (and expect every golden
test to be re-reviewed).
"""

from __future__ import annotations

import duckdb
import pytest

from real_time_streaming_system_with_apache_kafka_spark.generator import trades
from real_time_streaming_system_with_apache_kafka_spark.operators.dashboard import (
    TRADES_FIXTURE,
)


@pytest.fixture(scope="module")
def fixture_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT * FROM read_parquet('{TRADES_FIXTURE}') ORDER BY timestamp"
    ).fetchall()
    con.close()
    return rows


def test_fixture_pins_generator_exactly(spark, fixture_rows):
    """Every value of trades(seed=42, n=20000) equals the committed
    fixture — full bit-for-bit pin across all 20 columns."""
    live = sorted(
        trades(spark, 20_000).collect(), key=lambda r: r["timestamp"]
    )
    assert len(live) == len(fixture_rows) == 20_000
    for i, (lr, fr) in enumerate(zip(live, fixture_rows)):
        lt = tuple(lr)
        # DuckDB Decimals strip trailing zeros; compare numerically.
        for a, b in zip(lt, fr):
            assert a == b, f"row {i}: {a!r} != {b!r} (live vs fixture)"


def test_fixture_timestamps_strictly_increasing(fixture_rows):
    """src1's oracle selects the first 10k rows via ORDER BY timestamp
    LIMIT 10000 — valid only while timestamps are strictly increasing
    in row id (jitter < pacing interval, generator.py)."""
    ts = [r[18] for r in fixture_rows]
    assert all(a < b for a, b in zip(ts, ts[1:]))
