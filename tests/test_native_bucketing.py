"""Native bucketBy tables: equi-joins between co-bucketed tables run
without a shuffle exchange (the 100 TB co-located-join path)."""

import pyspark.sql.functions as F

from polars_lake_spark import Engine
from polars_lake_spark.plans import executed_plan
from polars_lake_spark.sources import load_table


def test_cobucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    engine = Engine(spark, str(tmp_path))
    engine.create_table(
        "orders_b",
        orders.withColumnRenamed("o_custkey", "custkey"),
        bucket_by=["custkey"],
        n_buckets=4,
        native_bucketing=True,
    )
    engine.create_table(
        "customer_b",
        customer.withColumnRenamed("c_custkey", "custkey"),
        bucket_by=["custkey"],
        n_buckets=4,
        native_bucketing=True,
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = engine.sql(
            """
            SELECT c.custkey, COUNT(*) AS n, ROUND(SUM(o.o_totalprice), 2) AS total
            FROM orders_b o JOIN customer_b c USING (custkey)
            GROUP BY c.custkey
            """
        )
        rows = j.collect()
        plan = executed_plan(j)
        assert "SortMergeJoin" in plan
        # co-located: no hash-partitioning exchange on either join side
        assert "Exchange hashpartitioning(custkey" not in plan
        # sanity vs plain join
        want = (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_custkey")
            .count()
            .count()
        )
        assert len(rows) == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_native_bucketed_reload_from_manifest(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    e1 = Engine(spark, str(tmp_path))
    e1.create_table(
        "ob", orders, bucket_by=["o_custkey"], n_buckets=4, native_bucketing=True
    )
    spark.sql("DROP TABLE IF EXISTS ob")  # simulate a fresh session's catalog
    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    got = e2.table("ob")
    assert got.count() == orders.count()
    # bucketing metadata restored in the catalog
    desc = spark.sql("DESCRIBE TABLE EXTENDED ob").collect()
    txt = "\n".join(str(r) for r in desc)
    assert "o_custkey" in txt and "4" in txt
    spark.sql("DROP TABLE IF EXISTS ob")


def test_native_bucketed_tables_refuse_mutation(spark, sf_dir, tmp_path):
    """In-place mutation would break the bucketBy file invariant (ADVICE
    r1): the engine must refuse, not silently corrupt the layout."""
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    engine = Engine(spark, str(tmp_path))
    engine.create_table(
        "ob",
        orders,
        bucket_by=["o_orderkey"],
        n_buckets=4,
        keys=["o_orderkey"],
        native_bucketing=True,
    )
    batch = orders.limit(1)
    for op in (
        lambda: engine.insert("ob", batch),
        lambda: engine.upsert("ob", batch),
        lambda: engine.delete("ob", batch),
        lambda: engine.drop_duplicates("ob"),
        lambda: engine.compact("ob"),
    ):
        with pytest.raises(ValueError, match="native_bucketing"):
            op()


def test_offload_native_bucketed_rebinds_catalog(spark, sf_dir, tmp_path, tmp_path_factory):
    """Offloading a bucketBy/saveAsTable table must re-point the catalog
    entry's LOCATION at the new root (a stale location would read the
    emptied old dir)."""
    from polars_lake_spark import Engine
    from polars_lake_spark.sources import load_table

    cust = load_table(spark, sf_dir, "customer")
    engine = Engine(spark, str(tmp_path))
    engine.create_table(
        "cust_nb", cust, bucket_by=["c_custkey"], n_buckets=4, native_bucketing=True
    )
    n = engine.table("cust_nb").count()
    cold = str(tmp_path_factory.mktemp("cold_nb"))
    engine.offload_table("cust_nb", cold)
    assert engine.table("cust_nb").count() == n == cust.count()
    # bucket metadata survives the move (still a bucketed catalog table)
    desc = spark.sql("DESCRIBE TABLE EXTENDED cust_nb").collect()
    text = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
    assert "Num Buckets 4" in text or "4 buckets" in text.lower(), text
    spark.sql("DROP TABLE IF EXISTS cust_nb")
