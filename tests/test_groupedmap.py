"""Differential test: applyInPandas (slow path) vs JVM windows (fast path)
compute the identical per-group normalization."""

from __future__ import annotations

from banking_streaming_etl_spark.operators import groupedmap

SF = "/root/testdata/sf0.001"


def test_pandas_and_window_paths_agree(spark):
    a = {
        (r.id_transacao, r.valor_normalizado)
        for r in groupedmap.minmax_normalize_pandas(spark, SF).collect()
    }
    b = {
        (r.id_transacao, r.valor_normalizado)
        for r in groupedmap.minmax_normalize_window(spark, SF).collect()
    }
    assert a == b
    assert len(a) == 1000
