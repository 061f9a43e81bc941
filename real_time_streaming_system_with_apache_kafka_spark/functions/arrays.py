"""Vector/array kernels for the similarity and dedup extensions.

All pure Catalyst higher-order functions (``zip_with``/``aggregate``/
``transform``) — per-row array math inside whole-stage codegen, no
shuffle, no Python. Accumulation is decimal-exact so dot products and
norms are bit-identical across engines and run orders (same rationale
as ``functions/exact.py``); the final sqrt/divide are single IEEE
double ops, deterministic everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precision <=18 stays in long-backed decimal arithmetic (both Spark and
# DuckDB), ~2x faster than int128/BigDecimal. Bounds: |element| < 1 =>
# |product| < 1 and |sum over 64 dims| < 64 << 10^3 integer digits.
_DEC = "decimal(18,15)"


def _dec_sum(arr: Column) -> Column:
    return F.aggregate(
        arr,
        F.lit(0).cast(_DEC),
        lambda acc, v: (acc + v).cast(_DEC),
    )


def _dec_to_double(c: Column) -> Column:
    # decimal -> string -> double: the string parse is correctly rounded
    # in every engine, whereas direct decimal->double conversion at
    # scale 15 double-rounds in some (observed: DuckDB off by 1 ulp).
    return c.cast("string").cast("double")


def dot(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two float arrays, as double."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC))
    return _dec_to_double(_dec_sum(prods))


# Note: an unrolled fixed-width sum-of-products was tried and measured
# ~2x SLOWER than the zip_with/aggregate form (the 64-term codegen
# method exceeds JIT-friendly size); the lambda form is the fast path.


def norm(a: Column) -> Column:
    """Euclidean norm with exact-decimal sum of squares, as double."""
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC))
    return F.sqrt(_dec_to_double(_dec_sum(sq)))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, rounded to 9 decimals.

    dot and norm² are decimal-exact, but sqrt forces one float step and
    engines disagree on the double->decimal(18,15) element rounding in
    ~1-ulp cases (Spark rounds the shortest decimal repr, DuckDB the
    binary value). Rounding the final ratio to 9 digits absorbs that
    ulp noise, and ranking on the rounded value keeps top-k sets
    engine-identical (verified bit-for-bit against DuckDB on the test
    corpus)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), 9)


# DuckDB twins (oracle SQL fragments). `{a}`/`{b}` are list expressions.
def oracle_dot(a: str, b: str) -> str:
    return (
        f"cast(cast(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> cast(cast(p[1] AS double) * cast(p[2] AS double) AS decimal(18,15)))) "
        f"AS varchar) AS double)"
    )


def oracle_norm(a: str) -> str:
    return (
        f"sqrt(cast(cast(list_sum(list_transform({a}, "
        f"x -> cast(cast(x AS double) * cast(x AS double) AS decimal(18,15)))) "
        f"AS varchar) AS double))"
    )


def oracle_cosine(a: str, b: str) -> str:
    return f"round({oracle_dot(a, b)} / ({oracle_norm(a)} * {oracle_norm(b)}), 9)"
