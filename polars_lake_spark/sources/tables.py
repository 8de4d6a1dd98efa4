"""Canonical readers for the driver test tables (TESTDATA.md).

Mirrors the reference's scan surface (SURVEY.md §2.a): lazy Parquet scans
(`/root/reference/src/dataset.rs:395-399`) become ``spark.read.parquet`` —
already lazy, with Catalyst predicate/projection pushdown and hive
partition discovery subsuming the reference's per-part plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS); Spark's Parquet reader has
    no nanos type, so read nanos as int64 (legacy conf) and truncate to a
    microsecond TIMESTAMP_NTZ — the same truncation DuckDB applies, so
    oracle comparisons line up.
    """
    path = f"{sf_dir}/events.parquet"
    try:
        df = _read_parquet(spark, path)
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet(spark, path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Integer division — ns epoch values (~1.7e18) exceed double's
        # exact range, so `/ 1000` would be off by ±1µs.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a DataFrame (lazy scan)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")


def register_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register every driver table as a temp view for spark.sql queries."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
