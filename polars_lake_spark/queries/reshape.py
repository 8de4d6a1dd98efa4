"""Reshaping queries: UNNEST/explode (polars-sql ARRAY row) and PIVOT
(Spark-native extension; oracled via conditional aggregation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table


@register(
    "unnest_explode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS val
    FROM embeddings WHERE vec_id < 20
    """,
)
def unnest_explode(spark, sf_dir):
    """UNNEST → posexplode (0-indexed position)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "x")).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("x").cast("double"), 6).alias("val"),
    )


@register(
    "pivot_status",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'O'), 0), 2) AS open_total,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'F'), 0), 2) AS finished_total,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'P'), 0), 2) AS partial_total
    FROM orders GROUP BY 1
    """,
)
def pivot_status(spark, sf_dir):
    """PIVOT on order status — wide conditional aggregation."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return wide.select(
        "order_year",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("open_total"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("finished_total"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("partial_total"),
    )
