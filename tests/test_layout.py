"""Z-order layout: the 2-D file-skipping promise, measured from parquet
footer stats (no Spark internals, no data pages read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.operators import layout

SF = "/root/testdata/sf0.001"


def _tx(spark):
    return datamodel.transactions(spark, SF).select(
        "id_transacao", "id_usuario_pagador", "valor_transacao"
    )


def test_zvalue_is_deterministic_and_total(spark):
    df = layout.with_zvalue(_tx(spark), "id_usuario_pagador", "valor_transacao")
    a = df.orderBy("id_transacao").select("_z").limit(50).collect()
    b = df.orderBy("id_transacao").select("_z").limit(50).collect()
    assert a == b
    assert all(r._z >= 0 for r in a)


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """The z-order trade: a single-column sort prunes perfectly on its
    sort key and not at all on the other column; z-order must skip a
    substantial file fraction on EITHER single-dimension slice. (On the
    sorted dimension itself the linear layout legitimately wins — the
    claim is worst-dimension behavior, which is what an ad-hoc dashboard
    mix hits.)"""
    tx = _tx(spark)
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    layout.write_zordered(
        tx, zpath, "id_usuario_pagador", "valor_transacao", n_files=16
    )
    (
        tx.repartitionByRange(16, "id_usuario_pagador")
        .sortWithinPartitions("id_usuario_pagador")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    stats = tx.agg(
        F.max("id_usuario_pagador").alias("u"),
        F.max("valor_transacao").alias("v"),
    ).collect()[0]
    big = float(10**18)
    user_slice = (stats.u * 0.40, stats.u * 0.52, -big, big)
    value_slice = (-big, big, stats.v * 0.40, stats.v * 0.52)

    def frac(path, box):
        return layout.file_overlap_fraction(
            path, "id_usuario_pagador", "valor_transacao", box
        )

    # single-column layout: zero skipping on the unsorted dimension
    assert frac(lpath, value_slice) == 1.0
    # z-order: real skipping on BOTH dimensions...
    assert frac(zpath, user_slice) <= 0.5
    assert frac(zpath, value_slice) <= 0.5
    # ...so its worst dimension beats the linear layout's worst dimension
    z_worst = max(frac(zpath, user_slice), frac(zpath, value_slice))
    l_worst = max(frac(lpath, user_slice), frac(lpath, value_slice))
    assert z_worst < 0.5 * l_worst, (z_worst, l_worst)


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    tx = _tx(spark)
    path = str(tmp_path / "z2")
    layout.write_zordered(
        tx, path, "id_usuario_pagador", "valor_transacao", n_files=8
    )
    back = spark.read.parquet(path)
    assert back.count() == tx.count()
    assert set(back.columns) == set(tx.columns)
