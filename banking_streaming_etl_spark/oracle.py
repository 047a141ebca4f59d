"""Local mirror of the driver's DuckDB correctness gate.

The driver runs each `queries()[name]` Spark DataFrame and the matching
`oracle_sql()[name]` DuckDB query side-by-side and compares row-count +
schema + order-insensitive value-hash. This module reproduces that check
locally so `pytest` catches drift before the driver does.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from banking_streaming_etl_spark.datamodel import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's table views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: Any) -> Any:
    """Normalize a scalar for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: catches real bugs, tolerates last-ulp
        # drift from different summation orders.
        return float(f"{v:.12g}")
    if isinstance(v, int):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return str(v)


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Run both sides; return a report dict with `match` bool."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [c[0].lower() for c in rel.description]
    d_rows = rel.fetchall()

    report: dict[str, Any] = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    report["cols_match"] = sorted(s_cols) == sorted(d_cols)
    report["count_match"] = len(s_rows) == len(d_rows)
    if report["cols_match"] and report["count_match"]:
        sc = _canon(s_rows, s_cols)
        dc = _canon(d_rows, d_cols)
        report["values_match"] = sc == dc
        if not report["values_match"]:
            diffs = [
                (a, b) for a, b in zip(sc, dc) if a != b
            ][:5]
            report["first_diffs"] = diffs
    else:
        report["values_match"] = False
    report["match"] = (
        report["cols_match"] and report["count_match"] and report["values_match"]
    )
    return report
