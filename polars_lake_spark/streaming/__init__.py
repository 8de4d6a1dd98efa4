from polars_lake_spark.streaming.ingest import MicroBatchIngestor, stream_upsert

__all__ = ["MicroBatchIngestor", "stream_upsert"]
