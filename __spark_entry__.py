"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship star-join + aggregate on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2,
backed by polars_lake_spark.queries.REGISTRY.
``oracle_sql()`` — DuckDB-runnable ANSI SQL for every SQL-expressible
query (non-expressible ops — engine-hash-dependent LSH variants, approx
sketches, mapInPandas plumbing — are intentionally omitted → rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from polars_lake_spark.queries import all_queries
    from polars_lake_spark.session import configure_session

    configure_session(spark)
    return all_queries()["star_join_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from polars_lake_spark.queries import all_queries
    from polars_lake_spark.session import configure_session

    out = {}
    for name, q in all_queries().items():
        def wrapped(spark, sf_dir, _fn=q.fn):
            configure_session(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → driver rows-only check)."""
    from polars_lake_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
