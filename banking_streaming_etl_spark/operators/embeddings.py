"""Embedding-statistics operators over the `embeddings` table.

Mean-pooled per-label centroids and nearest-centroid assignment — the
building blocks of embedding-space corpus curation (cluster-balanced
sampling, label auditing, semantic dedup triage). Complements the ANN
family in operators/similarity.py: centroids are the "coarse" structure
(same role as IVF cells) expressed as an oracle-checkable aggregate.

Scale shape: `label_centroids` is one shuffle keyed (label, dim) over the
pos-exploded vectors — D-way fan-out of the scan, partial aggregation
map-side, output is labels x dims rows (tiny at any corpus size).
`nearest_centroid_confusion` broadcasts that centroid table and the
per-label norms; the dot products re-aggregate on (vec_id, label) — at
production scale you would fuse the dot product as a zip_with over a
broadcast array literal (narrow map, no explode); the exploded shape here
keeps every float accumulation in exact DECIMAL so the oracle comparison
is bit-identical (see functions/exact.py).

No reference equivalent (the reference has no vector ops); this extends
the similarity family required of a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.functions import exact


def _exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = datamodel.load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector, one row per (label, dimension)."""
    ex = _exploded(spark, sf_dir)
    return (
        ex.groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            exact.exact_avg(F.col("v").cast("double"), "centroide"),
        )
        .select(
            "label", F.col("pos").cast("bigint").alias("pos"),
            "n_vecs", "centroide",
        )
    )


LABEL_CENTROIDS_SQL = f"""
SELECT label, pos, COUNT(*) AS n_vecs,
       {exact.sql_avg("CAST(v AS DOUBLE)", "centroide")}
FROM (
    SELECT label,
           unnest(range(0, len(embedding))) AS pos,
           unnest(embedding) AS v
    FROM embeddings
)
GROUP BY label, pos
"""


def nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each vector to its nearest label centroid by cosine and
    emit the (true label, predicted label, count) confusion table.

    Since ||v|| is constant per vector, ranking by dot(v, c)/||c|| is
    ranking by cosine — one division fewer to keep term-identical across
    engines. Ties broken by ascending centroid label."""
    ex = _exploded(spark, sf_dir)
    cen = label_centroids(spark, sf_dir).select(
        F.col("label").alias("label_c"), "pos", "centroide"
    )
    norms = (
        cen.groupBy("label_c")
        .agg(
            exact.exact_sum(
                F.round("centroide", 6) * F.round("centroide", 6), "nsq"
            )
        )
        .select("label_c", F.sqrt("nsq").alias("norm_c"))
    )
    dots = (
        ex.join(F.broadcast(cen), "pos")
        .groupBy("vec_id", "label", "label_c")
        .agg(
            exact.exact_sum(
                F.round(F.col("v").cast("double"), 6)
                * F.round("centroide", 6),
                "dot",
            )
        )
    )
    scored = dots.join(F.broadcast(norms), "label_c").withColumn(
        "score", F.col("dot") / F.col("norm_c")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("label_c"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("label", F.col("label_c").alias("label_previsto"))
        .agg(F.count("*").alias("n_vecs"))
    )


NEAREST_CENTROID_SQL = f"""
WITH cen AS ({LABEL_CENTROIDS_SQL}),
ex AS (
    SELECT vec_id, label,
           unnest(range(0, len(embedding))) AS pos,
           unnest(embedding) AS v
    FROM embeddings
),
norms AS (
    SELECT label_c, SQRT(nsq) AS norm_c
    FROM (
        SELECT label AS label_c,
               {exact.sql_sum("ROUND(centroide, 6) * ROUND(centroide, 6)",
                              "nsq")}
        FROM cen
        GROUP BY label
    )
),
dots AS (
    SELECT ex.vec_id, ex.label, cen.label AS label_c,
           {exact.sql_sum(
               "ROUND(CAST(ex.v AS DOUBLE), 6) * ROUND(cen.centroide, 6)",
               "dot")}
    FROM ex JOIN cen ON ex.pos = cen.pos
    GROUP BY 1, 2, 3
),
scored AS (
    SELECT dots.vec_id, dots.label, dots.label_c,
           ROW_NUMBER() OVER (
               PARTITION BY dots.vec_id
               ORDER BY dots.dot / norms.norm_c DESC, dots.label_c ASC
           ) AS rn
    FROM dots JOIN norms USING (label_c)
)
SELECT label, label_c AS label_previsto, COUNT(*) AS n_vecs
FROM scored
WHERE rn = 1
GROUP BY 1, 2
"""
