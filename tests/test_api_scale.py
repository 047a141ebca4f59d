"""SQL API surface, partition-pruned history layout, skew utilities."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from banking_streaming_etl_spark import api, datamodel
from banking_streaming_etl_spark.operators import skew
from banking_streaming_etl_spark.streaming import sinks

SF = "/root/testdata/sf0.001"


def test_sql_views_match_dataframe_api(spark):
    api.register_views(spark, SF)
    n_sql = spark.sql(
        "SELECT count(*) AS n FROM transacoes_aprovadas WHERE transacao_aprovada"
    ).first().n
    from banking_streaming_etl_spark.plans.approval import approval_pipeline

    n_df = (
        approval_pipeline(spark, SF).filter(F.col("transacao_aprovada")).count()
    )
    assert n_sql == n_df
    # the analytic views exist and aggregate correctly
    total = spark.sql(
        "SELECT sum(total_transacoes) AS n FROM vw_performance_stats"
    ).first().n
    assert total == 1000


def test_partitioned_history_prunes(spark, tmp_path):
    """The scale-out history layout: date-partitioned parquet, and a dated
    query's scan touches only the matching partition."""
    t = datamodel.transactions(spark, SF).withColumn(
        "data", F.to_date("data_horario")
    )
    out = str(tmp_path / "hist")
    sinks.write_partitioned_parquet(t, out, ["data"])

    back = spark.read.parquet(out)
    q = back.filter(F.col("data") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    # partition filter reaches the scan (partition pruning)
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    n_all = back.count()
    n_day = q.count()
    assert 0 < n_day < n_all


def test_salted_agg_matches_plain(spark):
    t = datamodel.transactions(spark, SF)
    plain = {
        (r.modalidade_pagamento, r.total): r
        for r in t.groupBy("modalidade_pagamento")
        .agg(F.count("*").alias("total"))
        .collect()
    }
    salted = {
        (r.modalidade_pagamento, r.total): r
        for r in skew.salted_agg(
            t, "modalidade_pagamento", "valor_transacao"
        ).collect()
    }
    assert set(plain) == set(salted)


def test_salted_join_matches_plain(spark):
    t = datamodel.transactions(spark, SF)
    u = datamodel.users(spark, SF)
    plain = (
        t.join(u, t.id_usuario_pagador == u.id_usuario, "left")
        .filter(F.col("saldo").isNotNull())
        .count()
    )
    salted = (
        skew.salted_join(t, u, "id_usuario_pagador", "id_usuario")
        .filter(F.col("saldo").isNotNull())
        .count()
    )
    assert plain == salted
