"""Compaction + type-widening schema evolution."""

import os

import pyspark.sql.functions as F

from polars_lake_spark import Engine
from polars_lake_spark.operators import merge as M
from polars_lake_spark.sources import load_table


def _parquet_files(root, name):
    out = []
    for dirpath, _, files in os.walk(os.path.join(root, name)):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


def test_compact_unpartitioned(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").repartition(8)
    engine = Engine(spark, str(tmp_path))
    engine.create_table("li", li, keys=["l_orderkey", "l_linenumber"])
    engine.insert("li", li.limit(100).repartition(4))
    n_before = len(_parquet_files(str(tmp_path), "li"))
    assert n_before >= 10
    total = engine.table("li").count()
    engine.compact("li")
    assert len(_parquet_files(str(tmp_path), "li")) == 1
    assert engine.table("li").count() == total


def test_compact_partitioned_one_file_per_dir(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").repartition(6)
    engine = Engine(spark, str(tmp_path))
    engine.create_table("li", li, partition_by=["l_returnflag"], keys=["l_orderkey"])
    total = engine.table("li").count()
    engine.compact("li")
    files = _parquet_files(str(tmp_path), "li")
    dirs = {os.path.dirname(f) for f in files}
    assert len(files) == len(dirs)  # exactly one file per partition dir
    assert engine.table("li").count() == total


def test_evolve_schema_type_widening(spark):
    old = spark.createDataFrame([(1, 10, 1.5)], "k int, v int, f float")
    new = spark.createDataFrame([(2, 20, 2.5, "x")], "k int, v bigint, f double, extra string")
    evolved = M.evolve_schema(old, new)
    types = dict(evolved.dtypes)
    assert types["v"] == "bigint" and types["f"] == "double"
    assert "extra" in types

    merged = M.upsert(old, new, ["k"], evolve=True)
    got = {r.k: (r.v, r.f, r.extra) for r in merged.collect()}
    assert got[1] == (10, 1.5, None) and got[2] == (20, 2.5, "x")
    assert dict(merged.dtypes)["v"] == "bigint"


def test_widening_long_float_promotes_double():
    assert M._widened("bigint", "float") == "double"
    assert M._widened("int", "bigint") == "bigint"
    assert M._widened("string", "int") is None
