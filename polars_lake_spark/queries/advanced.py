"""Advanced relational shapes: correlated subqueries, explicit GROUPING
SETS, and a composed end-to-end corpus pipeline (quality filter → exact
dedup survivor → token accounting) showing operator composition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.queries import register
from polars_lake_spark.queries.pipeline import _NORM_SQL
from polars_lake_spark.sources import load_table, register_tables


@register(
    "correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 1.5 * AVG(o_totalprice) FROM orders i
        WHERE i.o_custkey = o.o_custkey)
    """,
)
def correlated_subquery(spark, sf_dir):
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders o
        WHERE o_totalprice > (
            SELECT 1.5 * AVG(o_totalprice) FROM orders i
            WHERE i.o_custkey = o.o_custkey)
        """
    )


@register(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets(spark, sf_dir):
    register_tables(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "corpus_pipeline",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, text, {_NORM_SQL} AS norm FROM documents
    ), survivors AS (
        SELECT MIN(doc_id) AS doc_id
        FROM t GROUP BY md5(norm)
    ), kept AS (
        SELECT t.doc_id, t.lang,
               len(string_split(t.norm, ' ')) AS n_words
        FROM t JOIN survivors USING (doc_id)
        WHERE len(string_split(t.norm, ' ')) >= 20
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           ROUND(SUM(n_words) * 1.0 / COUNT(*), 8) AS avg_tokens
    FROM kept GROUP BY lang
    """,
)
def corpus_pipeline(spark, sf_dir):
    """Composed training-data pipeline: exact-dedup survivors → length
    filter → per-language token accounting. Each stage is the operator
    from operators/ / functions/, chained as one declarative plan."""
    from polars_lake_spark.functions import text as TX
    from polars_lake_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    survivors = D.exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("keeper_id").alias("doc_id")
    )
    kept = (
        docs.join(survivors, "doc_id")
        .withColumn("n_words", TX.word_count(F.col("text")))
        .filter(F.col("n_words") >= 20)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_words") * F.lit(1.0) / F.count(F.lit(1)), 8
        ).alias("avg_tokens"),
    )
