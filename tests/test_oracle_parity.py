"""Differential test: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (row-count + schema + order-
insensitive values) at sf0.001 so drift is caught locally and fast.
"""

from __future__ import annotations

import pytest

from banking_streaming_etl_spark import registry
from banking_streaming_etl_spark.oracle import compare

QUERIES = registry.all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = QUERIES[name]
    report = compare(q.fn(spark, sf_dir), duck, q.oracle)
    assert report["match"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
