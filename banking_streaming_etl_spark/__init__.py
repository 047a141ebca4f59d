"""banking_streaming_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `pedrotokar/banking-streaming-ETL` (a real-time banking
fraud-screening ETL: Structured Streaming pipeline + Postgres analytic views
+ 10 dashboard analyses), re-expressed Spark-first:

- batch relational layer over parquet (DataFrame/SQL, Catalyst-optimized)
- streaming approval pipeline (Structured Streaming, stream-static broadcast
  joins, watermark, foreachBatch multi-sink)
- analytics layer (the dashboard analyses + SQL views as Spark queries)
- scale extensions: dedup (exact/MinHash-LSH/SimHash/Jaccard), vector
  similarity search, text analysis, multimodal column plumbing

Every operator maps to public DataFrame/SQL API; no custom Catalyst rules
(see SURVEY.md §4). Correctness is differential-tested against DuckDB
oracles (SURVEY.md §5).
"""

__version__ = "0.1.0"
