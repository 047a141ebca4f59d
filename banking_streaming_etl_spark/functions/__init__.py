from banking_streaming_etl_spark.functions import geo, scores  # noqa: F401
