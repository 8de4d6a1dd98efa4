from polars_lake_spark.functions import text

__all__ = ["text"]
