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
    sqrt((sumsq - sum^2/n) / (n-1)), final math in double on both
    engines. NULL for n <= 1 in BOTH dialects (Spark ANSI throws on
    the /0, DuckDB would emit NaN — the guard makes the degenerate
    group identical instead of divergent)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = F.sum(_d(c)).cast("double")
    # square first (rounded to 6), then exact-sum the squares
    sq = F.sum(_d(F.round(c, 6) * F.round(c, 6))).cast("double")
    # second guard: the 6-rounded squares can make the radicand a tiny
    # NEGATIVE on near-constant groups — Spark sqrt(neg) is NaN while
    # DuckDB SQRT(neg) ERRORS, so both dialects NULL it instead
    rad = sq - s * s / n
    return F.when(
        F.count(c) > 1,
        F.when(rad >= 0.0, F.sqrt(rad / (n - F.lit(1.0)))),
    ).alias(alias)


def exact_corr(x: Column | str, y: Column | str, alias: str) -> Column:
    """Order-independent Pearson correlation via exact decimal moments:
    (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)), final math in
    double on both engines. NULL when either variance is zero."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(_d(cx)).cast("double")
    sy = F.sum(_d(cy)).cast("double")
    sxx = F.sum(_d(F.round(cx, 6) * F.round(cx, 6))).cast("double")
    syy = F.sum(_d(F.round(cy, 6) * F.round(cy, 6))).cast("double")
    sxy = F.sum(_d(F.round(cx, 6) * F.round(cy, 6))).cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return F.when(
        (varx > 0) & (vary > 0),
        (n * sxy - sx * sy) / F.sqrt(varx * vary),
    ).alias(alias)


def exact_regr(
    x: Column | str, y: Column | str, slope_alias: str, icept_alias: str
) -> tuple[Column, Column]:
    """Order-independent simple linear regression (y on x) via the same
    exact decimal moments as `exact_corr`: slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2), intercept = (Sy - slope*Sx) / n. NULL when x has no
    variance. Returns (slope, intercept) columns."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(_d(cx)).cast("double")
    sy = F.sum(_d(cy)).cast("double")
    sxx = F.sum(_d(F.round(cx, 6) * F.round(cx, 6))).cast("double")
    sxy = F.sum(_d(F.round(cx, 6) * F.round(cy, 6))).cast("double")
    varx = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / varx
    icept = (sy - slope * sx) / n
    return (
        F.when(varx > 0, slope).alias(slope_alias),
        F.when(varx > 0, icept).alias(icept_alias),
    )


# --- SQL twins --------------------------------------------------------------


def _sql_s(e: str) -> str:
    """Exact decimal sum of a 6-rounded expression, cast back to double —
    the single source of the moment-string shape every sql_* twin uses
    (a precision change here is a precision change everywhere)."""
    return f"CAST(SUM(CAST(ROUND({e}, 6) AS DECIMAL(28,6))) AS DOUBLE)"


def _sql_sp(a: str, b: str) -> str:
    """Exact decimal sum of a 6-rounded product of 6-rounded factors."""
    return (
        f"CAST(SUM(CAST(ROUND(ROUND({a}, 6) * ROUND({b}, 6), 6)"
        f" AS DECIMAL(28,6))) AS DOUBLE)"
    )


def sql_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_avg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def sql_corr(x: str, y: str, alias: str) -> str:
    s, sp = _sql_s, _sql_sp
    n = "CAST(COUNT(1) AS DOUBLE)"
    varx = f"({n} * {sp(x, x)} - {s(x)} * {s(x)})"
    vary = f"({n} * {sp(y, y)} - {s(y)} * {s(y)})"
    return (
        f"CASE WHEN {varx} > 0 AND {vary} > 0 THEN"
        f" ({n} * {sp(x, y)} - {s(x)} * {s(y)}) / SQRT({varx} * {vary})"
        f" END AS {alias}"
    )


def sql_regr(x: str, y: str, slope_alias: str, icept_alias: str) -> str:
    """SQL twin of `exact_regr`: two aliased projections, term-for-term
    identical to the Spark expressions."""
    s, sp = _sql_s, _sql_sp
    n = "CAST(COUNT(1) AS DOUBLE)"
    varx = f"({n} * {sp(x, x)} - {s(x)} * {s(x)})"
    slope = f"(({n} * {sp(x, y)} - {s(x)} * {s(y)}) / {varx})"
    return (
        f"CASE WHEN {varx} > 0 THEN {slope} END AS {slope_alias},\n"
        f"       CASE WHEN {varx} > 0 THEN"
        f" ({s(y)} - {slope} * {s(x)}) / {n} END AS {icept_alias}"
    )


def sql_std(expr: str, alias: str) -> str:
    s = _sql_s(expr)
    sq = _sql_sp(expr, expr)
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return (
        f"CASE WHEN COUNT({expr}) > 1 "
        f"THEN CASE WHEN {sq} - {s} * {s} / {n} >= 0.0 "
        f"THEN SQRT(({sq} - {s} * {s} / {n}) / ({n} - 1.0)) END END "
        f"AS {alias}"
    )


def exact_regr2(
    x1: Column | str,
    x2: Column | str,
    y: Column | str,
    b1_alias: str,
    b2_alias: str,
    icept_alias: str,
) -> tuple[Column, Column, Column]:
    """Order-independent TWO-feature linear regression (y on x1, x2) by
    the normal equations over exact decimal moments — closed-form Cramer
    solve of the centered 2x2 system, every term double math identical
    across engines. NULL when the features are (near-)collinear
    (determinant <= 0)."""
    c1 = F.col(x1) if isinstance(x1, str) else x1
    c2 = F.col(x2) if isinstance(x2, str) else x2
    cy = F.col(y) if isinstance(y, str) else y
    n = F.count(F.lit(1)).cast("double")

    def s(c: Column) -> Column:
        return F.sum(_d(c)).cast("double")

    def sp(a: Column, b: Column) -> Column:
        return F.sum(_d(F.round(a, 6) * F.round(b, 6))).cast("double")

    s1, s2, sy = s(c1), s(c2), s(cy)
    c11 = sp(c1, c1) - s1 * s1 / n
    c12 = sp(c1, c2) - s1 * s2 / n
    c22 = sp(c2, c2) - s2 * s2 / n
    c1y = sp(c1, cy) - s1 * sy / n
    c2y = sp(c2, cy) - s2 * sy / n
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c2y * c11 - c1y * c12) / det
    icept = (sy - b1 * s1 - b2 * s2) / n
    ok = det > 0
    return (
        F.when(ok, b1).alias(b1_alias),
        F.when(ok, b2).alias(b2_alias),
        F.when(ok, icept).alias(icept_alias),
    )


def sql_regr2(
    x1: str, x2: str, y: str, b1_alias: str, b2_alias: str, icept_alias: str
) -> str:
    """DuckDB twin of exact_regr2 — MUST stay term-for-term identical."""
    s, sp = _sql_s, _sql_sp
    n = "CAST(COUNT(*) AS DOUBLE)"
    s1, s2, sy = s(x1), s(x2), s(y)
    c11 = f"({sp(x1, x1)} - {s1} * {s1} / {n})"
    c12 = f"({sp(x1, x2)} - {s1} * {s2} / {n})"
    c22 = f"({sp(x2, x2)} - {s2} * {s2} / {n})"
    c1y = f"({sp(x1, y)} - {s1} * {sy} / {n})"
    c2y = f"({sp(x2, y)} - {s2} * {sy} / {n})"
    det = f"({c11} * {c22} - {c12} * {c12})"
    b1 = f"(({c1y} * {c22} - {c2y} * {c12}) / {det})"
    b2 = f"(({c2y} * {c11} - {c1y} * {c12}) / {det})"
    icept = f"(({sy} - {b1} * {s1} - {b2} * {s2}) / {n})"
    return (
        f"CASE WHEN {det} > 0 THEN {b1} END AS {b1_alias}, "
        f"CASE WHEN {det} > 0 THEN {b2} END AS {b2_alias}, "
        f"CASE WHEN {det} > 0 THEN {icept} END AS {icept_alias}"
    )
