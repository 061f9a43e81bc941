"""Engine-independent exact aggregation helpers.

Summing IEEE doubles is order-dependent, and a distributed Spark sum
visits rows in a different order than the single-threaded DuckDB oracle
(and than itself across runs once partitioning changes). Casting each
addend to a wide decimal first makes the sum exact and therefore
order-independent — the same answer on 32 local threads or 1000
executors, and bit-identical to any other engine using the same decimal
scale. The final cast back to double keeps result schemas simple.

The per-row cast is still whole-stage-codegen'd JVM arithmetic; Spark's
partial (map-side) + final decimal aggregation applies as usual, so this
costs almost nothing at scale while buying run-to-run determinism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 digits total / 6 fractional is enough for any sum over the test
# tables (values < 1e6, row counts < 1e9 leave >20 integer digits).
_DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / non-null count, as
    double. Divides by ``count(col)`` (not ``count(*)``) to match SQL
    AVG semantics on nullable inputs — e.g. wire-decoded trades where
    ``try_cast`` can null out fields."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.sum(c.cast(_DEC)).cast("double") / F.count(c))
        .alias(alias)
    )


def ratio(num: Column, den: Column, alias: str, scale: int = 100) -> Column:
    """Guarded ratio (reference guards div-by-zero with Python ternaries,
    dashboard.py:83-87): NULL-safe, 0 when the denominator is 0."""
    return (
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double") * scale)
        .alias(alias)
    )


def dec4(col: Column | str, precision: int = 12) -> Column:
    """Cast a double whose intrinsic precision is <=2-3 decimal digits to
    an exact decimal at scale 4.

    Rounding a raw double with ``F.round`` is engine-dependent at
    halfway points (Java rounds the shortest decimal representation,
    C/DuckDB round the true binary value). Casting to scale 4 first is
    safe — binary error ~1e-13 can't cross a 5e-5 boundary — and all
    downstream arithmetic/rounding happens in exact decimal, identical
    on every engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},4)")


def round2(col: Column, alias: str) -> Column:
    """HALF_UP round of an exact decimal expression to 2 digits,
    returned as double."""
    return F.round(col, 2).cast("double").alias(alias)


def revenue_dec() -> Column:
    """TPC-H discounted-price expression in exact decimal:
    l_extendedprice * (1 - l_discount). The single definition shared by
    every revenue query (j1/q1/q3/pr2) — decimal widths changed here
    change everywhere, in lockstep with :data:`ORACLE_REVENUE`."""
    return dec4("l_extendedprice") * dec4(1 - F.col("l_discount"), 6)


# DuckDB twin of revenue_dec(), exactly summed and cast to double.
ORACLE_REVENUE_SUM = (
    "cast(sum(cast(cast(l_extendedprice AS decimal(12,4)) "
    "* cast(1 - l_discount AS decimal(6,4)) AS decimal(38,6))) AS double)"
)


def oracle_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum` for oracle SQL strings."""
    return f"cast(sum(cast(({expr}) as decimal(38,6))) as double) as {alias}"


def oracle_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg` (divides by the non-null count)."""
    return (
        f"cast(sum(cast(({expr}) as decimal(38,6))) as double) "
        f"/ count({expr}) as {alias}"
    )
