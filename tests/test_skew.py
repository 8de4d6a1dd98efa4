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
