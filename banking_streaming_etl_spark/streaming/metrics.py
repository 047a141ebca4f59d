"""Streaming observability: progress metrics as a queryable DataFrame.

The reference watches throughput/latency in the Spark UI and a console
metrics stream (streaming_etl.py:266-278; PDF pp. 14-18 screenshots).
This module captures StreamingQueryProgress programmatically so the same
numbers are a table: per-batch input rate, processed rate, duration, and
state-store metrics — the data behind BASELINE-style reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def progress_dataframe(spark: SparkSession, query: StreamingQuery) -> DataFrame:
    """Snapshot of the query's recentProgress as a typed DataFrame."""
    rows = []
    for p in query.recentProgress:
        rows.append(
            {
                "batch_id": int(p.get("batchId", -1)),
                "timestamp": p.get("timestamp", ""),
                "num_input_rows": int(p.get("numInputRows", 0) or 0),
                "input_rows_per_second": float(
                    p.get("inputRowsPerSecond", 0.0) or 0.0
                ),
                "processed_rows_per_second": float(
                    p.get("processedRowsPerSecond", 0.0) or 0.0
                ),
                "batch_duration_ms": int(
                    (p.get("durationMs") or {}).get("triggerExecution", 0) or 0
                ),
            }
        )
    schema = (
        "batch_id long, timestamp string, num_input_rows long, "
        "input_rows_per_second double, processed_rows_per_second double, "
        "batch_duration_ms long"
    )
    return spark.createDataFrame(rows, schema=schema)


def throughput_summary(progress: DataFrame) -> DataFrame:
    """Micro-batch throughput/duration summary — the numbers BASELINE.md
    quotes from the reference's UI screenshots, as one row."""
    from pyspark.sql import functions as F

    return progress.filter(F.col("num_input_rows") > 0).agg(
        F.count("*").alias("batches"),
        F.sum("num_input_rows").alias("total_rows"),
        F.avg("batch_duration_ms").alias("avg_batch_ms"),
        F.max("batch_duration_ms").alias("max_batch_ms"),
        F.avg("processed_rows_per_second").alias("avg_rows_per_s"),
    )


def quality_observation(df: DataFrame, name: str = "qualidade"):
    """Attach free data-quality counters to a batch plan via
    `df.observe` — computed inline during the action that materializes
    the frame, with NO extra pass over the data (the production way to
    count nulls/volume on a 100 TB job; a separate `.count()` audit scan
    would double the read).

    Returns (observed_df, Observation). After any action on observed_df,
    `observation.get` yields {total, valor_nulos, valor_total,
    pagadores_nulos}. The streaming twin is the same `observe` call
    surfaced through StreamingQueryProgress['observedMetrics'] — see
    progress_dataframe."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.col("valor_transacao").isNull().cast("long")
        ).alias("valor_nulos"),
        F.sum(
            F.col("id_usuario_pagador").isNull().cast("long")
        ).alias("pagadores_nulos"),
        F.sum(F.round(F.col("valor_transacao"), 6)).alias("valor_total"),
    )
    return observed, obs
