"""Dashboard-surface queries over generated trades: shape + invariant
checks (values are covered by oracle twins on the star schema and the
generator's statistical tests), plus the partition-independence
determinism guarantee the whole engine rests on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import dashboard


def test_kpis_consistent(spark):
    r = dashboard.dash_kpis(spark, "").collect()[0]
    assert r["total_trades"] == dashboard.N_TRADES
    assert r["settled_count"] + r["pending_count"] >= 0
    assert 0 < r["break_rate_pct"] < 5
    assert math.isclose(
        r["stp_rate_pct"], 100 - r["break_rate_pct"], abs_tol=1e-9
    )  # stp_eligible == not Break, producer.py:105
    assert 1 <= r["avg_fee_bps"] <= 20  # fees are 1.8-20 bps by construction


def test_distributions_cover_domains(spark):
    status = {r["status"] for r in dashboard.dash_status_distribution(spark, "").collect()}
    assert len(status) == 6
    venues = dashboard.dash_venue_distribution(spark, "").collect()
    assert sum(r["n"] for r in venues) == dashboard.N_TRADES
    fee_mix = {r["fee_type"]: r["amount"] for r in dashboard.dash_fee_mix(spark, "").collect()}
    assert set(fee_mix) == {"Brokerage", "Clearing", "Exchange"}
    assert fee_mix["Brokerage"] > fee_mix["Clearing"] > fee_mix["Exchange"]


def test_tables_shape(spark):
    breaks = dashboard.dash_breaks_table(spark, "").collect()
    assert 0 < len(breaks) <= 10
    assert all("Break" in r["status"] for r in breaks)
    recent = dashboard.dash_recent_trades(spark, "").collect()
    assert len(recent) == 20
    assert all(r["notional_fmt"].startswith("$") for r in recent)


@pytest.mark.parametrize("query", ["dash_kpis", "dash_minute_activity", "dash_counterparty_top10"])
def test_partition_independence(spark, query):
    """The determinism claim: identical results under wildly different
    shuffle parallelism (decimal-exact sums + hash-derived generation
    make every plan re-shuffle-safe)."""
    fn = dashboard.QUERIES[query]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, "").collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "97")
        b = sorted(map(tuple, fn(spark, "").collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b
