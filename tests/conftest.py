from __future__ import annotations

import os

import pytest

#: tests run at the smallest sf for speed; the driver's gate (and the
#: driver-mimic recipe in .claude/skills/verify) re-checks at sf0.01.
#: Override with SPARK_GRAFT_TEST_SF=sf0.1 for the full-decade parity
#: sweep (round 8 ran it and caught two sf0.1-only divergences: a
#: DuckDB DECIMAL(18) multiply overflow and a decimal->double 1-ulp
#: conversion split above 2^53 — ~11 min for the oracle gate alone).
SF_SMOKE = (
    f"/root/testdata/{os.environ['SPARK_GRAFT_TEST_SF']}"
    if os.environ.get("SPARK_GRAFT_TEST_SF")
    else "/root/testdata/sf0.001"
)


@pytest.fixture(scope="session")
def spark():
    from banking_streaming_etl_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from banking_streaming_etl_spark.oracle import duckdb_connect

    con = duckdb_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
