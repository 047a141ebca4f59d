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


def test_chunk_tokens_udtf_matches_builtin_path(spark):
    """The Python UDTF (lateral table function) must reproduce the
    JVM array-expression chunker exactly — chunk grid and md5s."""
    from banking_streaming_etl_spark.operators import groupedmap
    from banking_streaming_etl_spark.plans import text
    from banking_streaming_etl_spark import datamodel

    groupedmap.register_chunk_tokens_udtf(spark)
    datamodel.load_table(spark, SF, "documents").createOrReplaceTempView(
        "docs_udtf"
    )
    got = {
        (r.doc_id, r.chunk_id, r.chunk_md5)
        for r in spark.sql(
            f"""
            SELECT d.doc_id, c.chunk_id, md5(c.chunk_text) AS chunk_md5
            FROM docs_udtf d,
                 LATERAL chunk_tokens(d.text, {text.CHUNK_SIZE},
                                      {text.CHUNK_STRIDE}) c
            """
        ).collect()
    }
    want = {
        (r.doc_id, r.chunk_id, r.chunk_md5)
        for r in text.chunk_documents(spark, SF).collect()
    }
    assert got == want
