"""Property-based tests (hypothesis): the score/flag column expressions
agree with a plain-Python reference implementation on arbitrary inputs —
independent of the DuckDB oracle AND of the test fixtures."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from banking_streaming_etl_spark.datamodel import (
    LIMIT_WEIGHTS,
    SCORE_THRESHOLD,
    T6_VALUE_THRESHOLD,
)
from banking_streaming_etl_spark.functions import scores

ROW_SCHEMA = T.StructType(
    [
        T.StructField("valor_transacao", T.DoubleType()),
        T.StructField("modalidade_pagamento", T.StringType()),
        T.StructField("saldo", T.DoubleType()),
        T.StructField("latitude_t", T.DoubleType()),
        T.StructField("longitude_t", T.DoubleType()),
        T.StructField("latitude_u", T.DoubleType()),
        T.StructField("longitude_u", T.DoubleType()),
    ]
    + [T.StructField(f"limite_{m}", T.DoubleType()) for m in LIMIT_WEIGHTS]
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
modality = st.sampled_from(sorted(LIMIT_WEIGHTS))


def _expected(row: dict) -> dict:
    t5 = math.sqrt(
        (row["latitude_t"] - row["latitude_u"]) ** 2
        + (row["longitude_t"] - row["longitude_u"]) ** 2
    )
    t6 = 1.0 if row["valor_transacao"] > T6_VALUE_THRESHOLD else 0.0
    saldo_ok = row["saldo"] > row["valor_transacao"]
    limite = row[f"limite_{row['modalidade_pagamento']}"]
    limite_ok = row["valor_transacao"] < limite
    return {
        "t5": t5,
        "t6": t6,
        "saldo_ok": saldo_ok,
        "limite_ok": limite_ok,
    }


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "valor_transacao": finite,
                "modalidade_pagamento": modality,
                "saldo": finite,
                "latitude_t": finite,
                "longitude_t": finite,
                "latitude_u": finite,
                "longitude_u": finite,
                **{f"limite_{m}": finite for m in LIMIT_WEIGHTS},
            }
        ),
        min_size=1,
        max_size=8,
    )
)
def test_score_expressions_match_python(spark_session_holder, rows):
    spark = spark_session_holder
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in ROW_SCHEMA.fields) for r in rows], ROW_SCHEMA
    )
    got = df.select(
        scores.t5_distance_score().alias("t5"),
        scores.t6_value_score("valor_transacao").alias("t6"),
        scores.saldo_aprovado().alias("saldo_ok"),
        scores.limite_aprovado().alias("limite_ok"),
    ).collect()
    for r, g in zip(rows, got):
        e = _expected(r)
        assert math.isclose(g.t5, e["t5"], rel_tol=1e-12)
        assert g.t6 == e["t6"]
        assert g.saldo_ok == e["saldo_ok"]
        assert g.limite_ok == e["limite_ok"]


# hypothesis needs a non-function-scoped fixture alias
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_session_holder(spark):
    return spark
