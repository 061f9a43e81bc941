"""Regenerate the golden trades fixture used by the dash_*/src1
oracles (operators/dashboard.py module docstring).

Only needed when the generator's SEMANTICS deliberately change — the
fixture is otherwise immutable, and tests/test_dashboard_oracles.py
fails on any drift.

Usage: python tools/make_trades_fixture.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from real_time_streaming_system_with_apache_kafka_spark.generator import trades  # noqa: E402
from real_time_streaming_system_with_apache_kafka_spark.session import get_session  # noqa: E402

DST = os.path.join(REPO, "tests", "fixtures", "trades_seed42_n20000.parquet")


def main() -> None:
    spark = get_session("make_trades_fixture")
    tmp = tempfile.mkdtemp(prefix="trades_fixture_")
    out = os.path.join(tmp, "out")
    trades(spark, 20_000).coalesce(1).write.mode("overwrite").parquet(out)
    part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
    shutil.copy(part, DST)
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"wrote {DST} ({os.path.getsize(DST)} bytes)")


if __name__ == "__main__":
    main()
