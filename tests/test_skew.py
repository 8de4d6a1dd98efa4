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


def test_bloom_semi_join_equals_plain_and_prunes(spark):
    """No false negatives (result == plain semi-join on adversarial
    keys) and real pruning (the prefiltered slice is far smaller than
    the fact table when the dim is selective)."""
    import pyspark.sql.functions as F

    from polars_lake_spark.operators.bloom import (
        bloom_bitmap,
        bloom_prefilter,
        bloom_semi_join,
    )

    fact = spark.range(0, 5000).select(
        F.col("id").alias("rid"), (F.col("id") % 997).alias("k")
    )
    dim = spark.range(0, 10).select((F.col("id") * 101).alias("dk"))
    got = {r.rid for r in bloom_semi_join(fact, dim, "k", "dk").collect()}
    want = {
        r.rid
        for r in fact.join(
            dim, fact.k == dim.dk, "left_semi"
        ).collect()
    }
    assert got == want and len(want) > 0
    pre = bloom_prefilter(fact, bloom_bitmap(dim, "dk"), "k")
    n_pre = pre.count()
    assert len(want) <= n_pre < 5000 // 4, n_pre


def test_bloom_empty_dim_yields_empty(spark):
    import pyspark.sql.functions as F

    from polars_lake_spark.operators.bloom import bloom_semi_join

    fact = spark.range(0, 100).select(F.col("id").alias("k"))
    dim = spark.range(0, 10).select(F.col("id").alias("dk")).filter("dk < 0")
    assert bloom_semi_join(fact, dim, "k", "dk").count() == 0


def test_topk_per_group_matches_window(spark):
    """Two-stage top-k == plain window on a skewed distribution (one
    group holds 90% of rows), under an adversarial repartition too."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from polars_lake_spark.operators.skew import topk_per_group

    df = spark.range(0, 4000).select(
        F.when(F.col("id") < 3600, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 7).cast("string")))
        .alias("g"),
        (F.col("id") * 37 % 1001).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("rid").asc())
    want = {
        (r.g, r.rid)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .collect()
    }
    got = {
        (r.g, r.rid)
        for r in topk_per_group(df, ["g"], "v", "rid", 5).collect()
    }
    rep = {
        (r.g, r.rid)
        for r in topk_per_group(df.repartition(13), ["g"], "v", "rid", 5).collect()
    }
    assert got == want == rep and len(want) > 5


def test_topk_per_group_null_group_kept(spark):
    """Spark windows treat NULL as a normal group; stage 1's pandas
    groupby must not silently drop those rows (dropna=False)."""
    import pyspark.sql.functions as F

    from polars_lake_spark.operators.skew import topk_per_group

    df = spark.createDataFrame(
        [(1, None, 5.0), (2, None, 7.0), (3, "g", 1.0)],
        "rid bigint, g string, v double",
    )
    got = {(r.g, r.rid) for r in topk_per_group(df, ["g"], "v", "rid", 1).collect()}
    assert got == {(None, 2), ("g", 3)}


def test_bloom_semi_join_mixed_key_types(spark):
    """Build int key vs probe bigint key: xxhash64 is type-sensitive, so
    positions hash the CAST-to-string key — a type mismatch must never
    produce a false negative."""
    import pyspark.sql.functions as F

    from polars_lake_spark.operators.bloom import bloom_semi_join

    fact = spark.range(0, 100).select(F.col("id").alias("k"))  # bigint
    dim = spark.createDataFrame([(3,), (7,)], "dk int")        # int
    got = {r.k for r in bloom_semi_join(fact, dim, "k", "dk").collect()}
    assert got == {3, 7}


def test_topk_per_group_nan_ranks_first_like_spark(spark):
    """Spark's desc ordering puts NaN above every double; stage 1 must
    not let pandas (NaN-last) drop it from the candidates."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from polars_lake_spark.operators.skew import topk_per_group

    df = spark.createDataFrame(
        [(1, "g", float("nan")), (2, "g", 5.0), (3, "g", None), (4, "g", 7.0)],
        "rid bigint, g string, v double",
    )
    got = [
        r.rid
        for r in topk_per_group(df, ["g"], "v", "rid", 2)
        .orderBy("rid")
        .collect()
    ]
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("rid").asc())
    want = [
        r.rid
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 2")
        .orderBy("rid")
        .collect()
    ]
    assert got == want == [1, 4]


def test_bloom_semi_join_rejects_incompatible_key_types(spark):
    """int-vs-double keys stringify differently ('3' vs '3.0') — the
    operator must refuse rather than silently drop matches."""
    import pyspark.sql.functions as F
    import pytest

    from polars_lake_spark.operators.bloom import bloom_semi_join

    fact = spark.range(0, 10).select(F.col("id").alias("k"))
    dim = spark.createDataFrame([(3.0,)], "dk double")
    with pytest.raises(ValueError, match="common type"):
        bloom_semi_join(fact, dim, "k", "dk")
