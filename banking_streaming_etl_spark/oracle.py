"""Local mirror of the driver's DuckDB correctness gate.

The driver runs each `queries()[name]` Spark DataFrame and the matching
`oracle_sql()[name]` DuckDB query side-by-side and compares row-count +
schema + order-insensitive value-hash. Its canonicalization is
pandas-based: sort columns by name, `sort_values` over all columns, then
hash the values dtype-sensitively. That has three consequences a looser
mirror missed in round 1 (four hash misses + one hard error):

- **dtype kinds matter**: DuckDB exports `SUM(CASE ...)` as HUGEINT ->
  float64 while Spark emits int64; identical values, different hash.
- **timestamp values keep their source precision**: DuckDB reads the
  driver's TIMESTAMP_NS parquet at nanosecond precision while the Spark
  side truncates to micros, so a raw-timestamp output column differs in
  VALUE, not just resolution.
- **list-valued columns are unsortable**: pandas `sort_values` raises
  `TypeError: unhashable type: 'list'` — the driver records a hard err.

This module reproduces those exact semantics locally so `pytest` catches
drift before a driver round is burned.
"""

from __future__ import annotations

from typing import Any

import duckdb
import numpy as np
import pandas as pd

from banking_streaming_etl_spark.datamodel import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's table views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


#: numpy dtype-kind -> comparison class. The driver's value hash keys on
#: the pandas dtype, so int64 vs float64 is a MISMATCH even when every
#: value is numerically equal (round-1 HUGEINT failures).
_KIND_CLASS = {
    "b": "bool",
    "i": "int",
    "u": "int",
    "f": "float",
    "M": "datetime",
    "m": "timedelta",
    "O": "object",
}


def _kind(dtype: Any) -> str:
    return _KIND_CLASS.get(dtype.kind, dtype.kind)


def _unsortable_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns the driver's pandas sort_values would crash on."""
    bad = []
    for c in pdf.columns:
        if pdf[c].dtype.kind == "O" and any(
            isinstance(v, (list, set, dict, np.ndarray)) for v in pdf[c].head(100)
        ):
            bad.append(c)
    return bad


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Run both sides; return a report dict with `match` bool.

    Mirrors the driver: lowercase column names, columns sorted by name,
    rows sorted by all columns, dtype-kind-sensitive exact value compare
    (bit-identical floats — the repo invariant — with NaN == NaN)."""
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()
    s_pdf.columns = [c.lower() for c in s_pdf.columns]
    d_pdf.columns = [c.lower() for c in d_pdf.columns]

    report: dict[str, Any] = {
        "spark_rows": len(s_pdf),
        "duck_rows": len(d_pdf),
        "spark_cols": sorted(s_pdf.columns),
        "duck_cols": sorted(d_pdf.columns),
        "err": None,
    }
    report["cols_match"] = sorted(s_pdf.columns) == sorted(d_pdf.columns)
    report["count_match"] = len(s_pdf) == len(d_pdf)
    report["values_match"] = False
    if not (report["cols_match"] and report["count_match"]):
        report["match"] = False
        return report

    cols = sorted(s_pdf.columns)
    s_pdf = s_pdf[cols]
    d_pdf = d_pdf[cols]

    # the driver hard-errs on list-valued columns (pandas can't sort them)
    unsortable = sorted(set(_unsortable_cols(s_pdf) + _unsortable_cols(d_pdf)))
    if unsortable:
        report["err"] = (
            "driver-unsortable list/array column(s) "
            f"{unsortable}: pandas sort_values raises TypeError "
            "(emit a joined-string or exploded encoding instead)"
        )
        report["match"] = False
        return report

    # dtype-kind parity (HUGEINT->float64 vs int64 class of bugs)
    kind_mismatch = {
        c: (str(s_pdf[c].dtype), str(d_pdf[c].dtype))
        for c in cols
        if _kind(s_pdf[c].dtype) != _kind(d_pdf[c].dtype)
    }
    if kind_mismatch:
        report["kind_mismatch"] = kind_mismatch
        report["match"] = False
        return report

    # normalize datetime resolution metadata (us vs ns STORAGE) without
    # masking VALUE differences: converting us->ns is lossless, so a real
    # nanosecond component on one side still fails the exact compare.
    # tz-aware columns are first brought to UTC-naive (a tz-aware vs naive
    # astype raises; both engines run UTC sessions so the instant is what
    # matters) — any failure is reported, never raised.
    try:
        for c in cols:
            if s_pdf[c].dtype.kind == "M":
                for pdf in (s_pdf, d_pdf):
                    if getattr(pdf[c].dtype, "tz", None) is not None:
                        pdf[c] = pdf[c].dt.tz_convert("UTC").dt.tz_localize(
                            None
                        )
                    pdf[c] = pdf[c].astype("datetime64[ns]")
        s_canon = s_pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
        d_canon = d_pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    except TypeError as e:  # same failure class the driver would record
        report["err"] = f"driver-canon normalization/sort failed: {e}"
        report["match"] = False
        return report

    try:
        pd.testing.assert_frame_equal(
            s_canon,
            d_canon,
            check_dtype=False,  # kind parity already enforced above
            check_exact=True,  # bit-identical doubles is the invariant
        )
        report["values_match"] = True
    except AssertionError as e:
        report["values_match"] = False
        report["first_diff"] = str(e).splitlines()[:12]

    # BIT-level float parity (round-9): numpy/pandas equality treats
    # -0.0 == 0.0, but the driver hashes canonicalized VALUES, where the
    # sign of zero differs. Real case: Spark normalizes -0.0 -> +0.0 in
    # groupBy/sort KEYS (SPARK-32110) while DuckDB's GROUP BY preserves
    # the sign — conformal_by_modality's alpha=100 threshold (a score of
    # -0.0) was rows+schema green and hash RED at the driver while every
    # float-equality gate here stayed green. Compare raw float64 bits so
    # the local gate catches the class.
    if report["values_match"]:
        bitbad = [
            c
            for c in cols
            if s_canon[c].dtype.kind == "f"
            and np.ascontiguousarray(
                s_canon[c].to_numpy(dtype="float64")
            ).tobytes()
            != np.ascontiguousarray(
                d_canon[c].to_numpy(dtype="float64")
            ).tobytes()
        ]
        if bitbad:
            report["values_match"] = False
            report["float_bit_mismatch"] = bitbad
            # Caveat (kept deliberately strict): this compare is
            # order-sensitive WITHIN sort-tied rows — a -0.0 row and a
            # +0.0 row otherwise identical can legitimately land in
            # different stable-sort positions per engine even when the
            # value multisets' bits agree. The driver's value hash is
            # row-based after the same canonical sort, so it shares the
            # sensitivity; a local false positive here is cheaper than
            # a driver-only red row, so we flag rather than forgive.
            report["first_diff"] = [
                f"float bit mismatch (likely -0.0 vs +0.0) in {bitbad}; "
                "note: can also fire on sign-mixed SORT-TIED rows whose "
                "bit multisets agree — normalize the sign at the source "
                "(+ 0.0 in both dialects) either way"
            ]

    report["match"] = (
        report["cols_match"] and report["count_match"] and report["values_match"]
    )
    return report
