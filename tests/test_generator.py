"""Statistical + invariant validation of the seeded trade generator
(SURVEY.md §7.1 step 5: status frequencies ~ weights, fee bps within
bounds, derived-column rules exact, determinism across runs and
partitionings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark import generator
from real_time_streaming_system_with_apache_kafka_spark.schemas import TRADE_SCHEMA

N = 20_000


@pytest.fixture(scope="module")
def gen(spark):
    df = generator.trades(spark, N)
    df.cache()
    yield df
    df.unpersist()


def test_schema_matches_canonical(gen):
    # Names and types must match the single canonical declaration;
    # nullability flags differ (when-ladder expressions are nullable).
    got = [(f.name, f.dataType) for f in gen.schema.fields]
    want = [(f.name, f.dataType) for f in TRADE_SCHEMA.fields]
    assert got == want
    assert gen.filter(
        " OR ".join(f"{f.name} IS NULL" for f in gen.schema.fields)
    ).count() == 0


def test_row_count_and_unique_ids(gen):
    assert gen.count() == N
    assert gen.select("trade_id").distinct().count() == N


def test_status_weights(gen):
    freqs = {
        r["status"]: r["n"] / N
        for r in gen.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for status, w in zip(generator.STATUSES, generator.STATUS_WEIGHTS):
        assert abs(freqs.get(status, 0.0) - w) < 0.02, (status, freqs.get(status), w)


def test_break_rate_near_two_pct(gen):
    rate = gen.filter(F.col("status").contains("Break")).count() / N
    assert 0.01 < rate < 0.03  # reference claims 1-2%, code 2.0%


def test_quantity_price_ranges_per_class(gen):
    rows = (
        gen.groupBy("asset_class")
        .agg(
            F.min("quantity").alias("qlo"), F.max("quantity").alias("qhi"),
            F.min("price").alias("plo"), F.max("price").alias("phi"),
        )
        .collect()
    )
    for r in rows:
        qlo, qhi, plo, phi, _ = generator.RANGES[r["asset_class"]]
        assert qlo <= float(r["qlo"]) and float(r["qhi"]) <= qhi
        assert plo <= float(r["plo"]) and float(r["phi"]) <= phi


def test_derived_columns_exact(gen):
    bad = gen.filter(
        (F.abs(F.col("notional_value") - F.round(F.col("quantity") * F.col("price"), 2)) > 0.01)
        | (
            F.abs(
                F.col("total_fees")
                - (F.col("brokerage_fee") + F.col("clearing_fee") + F.col("exchange_fee"))
            )
            > 0.02
        )
    ).count()
    assert bad == 0


def test_fee_bps_bounds(gen):
    # brokerage in [1,15] bps of notional (producer.py:81), +/- rounding slop
    bad = gen.filter(
        (F.col("brokerage_fee") < F.col("notional_value") * 0.0001 - 0.01)
        | (F.col("brokerage_fee") > F.col("notional_value") * 0.0015 + 0.01)
    ).count()
    assert bad == 0


def test_priority_and_stp_rules(gen):
    bad = gen.filter(
        (
            (F.col("status").contains("Break") | (F.col("notional_value") > 1_000_000))
            != (F.col("priority") == "High")
        )
        | (F.col("stp_eligible") == F.col("status").contains("Break"))
    ).count()
    assert bad == 0


def test_settlement_t_plus_n(gen):
    expected = F.when(F.col("asset_class").isin("Equity", "FX"), 2).otherwise(1)
    bad = gen.filter(
        F.datediff("settlement_date", "trade_date") != expected
    ).count()
    assert bad == 0


def test_instruments_belong_to_class(gen):
    rows = gen.select("asset_class", "instrument").distinct().collect()
    for r in rows:
        assert r["instrument"] in generator.INSTRUMENTS[r["asset_class"]]


def test_deterministic_across_partitionings(spark):
    a = generator.trades(spark, 2_000, num_partitions=1).orderBy("trade_id").collect()
    b = generator.trades(spark, 2_000, num_partitions=16).orderBy("trade_id").collect()
    assert a == b


def test_duplicate_injection(spark):
    base = generator.trades(spark, 2_000)
    dup = generator.with_duplicates(base, every_n=10)
    n_base, n_dup = base.count(), dup.count()
    assert n_dup > n_base
    assert dup.select("trade_id").distinct().count() == n_base


def test_event_time_monotonic_pacing(gen):
    row = gen.agg(
        F.min("timestamp").alias("lo"), F.max("timestamp").alias("hi")
    ).collect()[0]
    span_s = (row["hi"] - row["lo"]).total_seconds()
    # ~0.9 s/trade mean pacing (reference U(0.3, 1.5) s, producer.py:172)
    assert 0.8 * N * 0.9 < span_s < 1.2 * N * 0.9
