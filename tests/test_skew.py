"""Salted aggregation equals the direct aggregation (skew-safe variants)."""

import pyspark.sql.functions as F

from polars_lake_spark.operators.skew import salted_collect_set, salted_count_distinct
from polars_lake_spark.sources import load_table


def test_salted_collect_set_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r.l_suppkey: set(r.vals)
        for r in li.groupBy("l_suppkey")
        .agg(F.collect_set("l_partkey").alias("vals"))
        .collect()
    }
    salted = {
        r.l_suppkey: set(r.values)
        for r in salted_collect_set(li, ["l_suppkey"], "l_partkey", 8).collect()
    }
    assert salted == direct


def test_salted_count_distinct_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r.l_suppkey: r.n
        for r in li.groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    salted = {
        r.l_suppkey: r.n_distinct
        for r in salted_count_distinct(li, ["l_suppkey"], "l_orderkey", 8).collect()
    }
    assert salted == direct


def test_salted_join_matches_plain_join(spark, sf_dir):
    from polars_lake_spark.operators.skew import salted_join
    from polars_lake_spark.sources import load_table
    import pyspark.sql.functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand").withColumnRenamed("p_partkey", "l_partkey")
    plain = li.join(part, "l_partkey").groupBy("p_brand").count()
    salted = salted_join(li, part, ["l_partkey"], n_salts=8).groupBy("p_brand").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_splits_key_across_salts(spark, sf_dir):
    from polars_lake_spark.operators.skew import SALT_COL, salted_join
    from polars_lake_spark.sources import load_table
    import pyspark.sql.functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    # inspect pre-drop salt spread: replicate internals
    n = 8
    salt = F.pmod(
        F.xxhash64(F.col("l_partkey"), F.monotonically_increasing_id()), F.lit(n)
    )
    spread = (
        li.withColumn(SALT_COL, salt)
        .groupBy("l_partkey")
        .agg(F.countDistinct(SALT_COL).alias("n_salts_used"))
        .agg(F.max("n_salts_used").alias("mx"))
        .first()
        .mx
    )
    assert spread > 1  # hot keys actually fan out over salts
