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
