from __future__ import annotations

import pytest

#: tests run at the smallest sf for speed; the driver's gate (and the
#: driver-mimic recipe in .claude/skills/verify) re-checks at sf0.01.
SF_SMOKE = "/root/testdata/sf0.001"


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
