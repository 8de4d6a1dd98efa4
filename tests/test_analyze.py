"""analyze_table / table_stats / table_hinted: one-pass stats, manifest
persistence across engine restarts, and the stats-driven broadcast hint."""

import pytest
from pyspark.sql import functions as F

from polars_lake_spark import Engine
from polars_lake_spark.sources import load_table


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def test_analyze_table_basic_stats(engine, spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    engine.create_table("orders", orders, keys=["o_orderkey"])
    stats = engine.analyze_table("orders")
    n = orders.count()
    assert stats["rows"] == n
    cs = stats["columns"]
    assert cs["o_orderkey"]["non_null"] == n
    # HLL++ at rsd=0.02; allow 3 sigma
    assert abs(cs["o_orderkey"]["approx_ndv"] - n) <= max(3, 0.06 * n)
    exact_min, exact_max = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")).first()
    assert cs["o_totalprice"]["min"] == pytest.approx(exact_min)
    assert cs["o_totalprice"]["max"] == pytest.approx(exact_max)
    # timestamps/dates serialize to strings (manifest stays plain JSON)
    datecol = cs.get("o_orderdate")
    if datecol is not None and "min" in datecol:
        assert isinstance(datecol["min"], str)


def test_analyze_persists_across_engine_restart(engine, spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("nation", nation, keys=["n_nationkey"])
    engine.analyze_table("nation", columns=["n_nationkey", "n_name"])
    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    stats = e2.table_stats("nation")
    assert stats is not None and stats["rows"] == 25
    assert set(stats["columns"]) == {"n_nationkey", "n_name"}


def test_analyze_unknown_column_rejected(engine, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("nation", nation, keys=["n_nationkey"])
    with pytest.raises(ValueError, match="unknown columns"):
        engine.analyze_table("nation", columns=["nope"])


def test_table_hinted_broadcasts_small_analyzed_table(engine, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    engine.create_table("nation", nation, keys=["n_nationkey"], save=False)
    engine.analyze_table("nation")
    joined = supplier.join(
        engine.table_hinted("nation"),
        supplier.s_nationkey == F.col("n_nationkey"),
    )
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()
    # above the bound → no forced hint
    plain = engine.table_hinted("nation", broadcast_max_rows=10)
    assert plain is not None  # returns the raw table, no error


def test_table_hinted_without_stats_is_plain(engine, spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    engine.create_table("region", region, keys=["r_regionkey"], save=False)
    assert engine.table_stats("region") is None
    assert engine.table_hinted("region").count() == 5


def test_sql_auto_broadcast_from_stats(engine, spark, sf_dir):
    """VERDICT r5 item 6: after ANALYZE, an engine.sql star join against
    the small analyzed dimension picks BroadcastHashJoin with NO manual
    hint; a mutation clears freshness and disarms the hint until the
    next ANALYZE."""
    from polars_lake_spark.plans import executed_plan

    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    engine.create_table("nat", nation, keys=["n_nationkey"])
    engine.create_table("supp", supplier, keys=["s_suppkey"])

    sql = (
        "SELECT n.n_name, count(*) AS n FROM supp s "
        "JOIN nat n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name"
    )
    engine.analyze_table("nat")
    assert engine.table_stats("nat")["fresh"] is True
    hinted = engine.sql(sql)
    assert "BroadcastHashJoin" in executed_plan(hinted)
    assert hinted.count() > 0

    # mutation → stale stats → hint disarmed (stats stay advisory)
    engine.insert(
        "nat",
        engine.table("nat")
        .limit(1)
        .withColumn(
            "n_nationkey",
            F.lit(99).cast(dict(engine.table("nat").dtypes)["n_nationkey"]),
        ),
    )
    assert engine.table_stats("nat")["fresh"] is False
    # re-ANALYZE re-arms
    engine.analyze_table("nat")
    assert "BroadcastHashJoin" in executed_plan(engine.sql(sql))


def test_analyze_versioned_table_records_version(engine, spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    engine.create_table("region", region, keys=["r_regionkey"], versioned=True)
    stats = engine.analyze_table("region")
    assert stats["analyzed_version"] == engine.table_info("region")["version"]


def test_auto_broadcast_bounded_by_bytes(engine, spark):
    """A small ROW COUNT must not arm the auto-broadcast hint when the
    estimated bytes are large (ADVICE r6): an explicit broadcast() hint
    bypasses autoBroadcastJoinThreshold, so a wide embedding table would
    otherwise force a multi-GB broadcast.  Narrow table → hint; same
    rows with a fat array column → no hint."""
    from polars_lake_spark.plans import executed_plan

    n = 200
    wide = spark.range(n).select(
        F.col("id").alias("k"),
        F.expr("transform(sequence(1, 64), x -> cast(x AS double))").alias(
            "emb"
        ),
    )
    engine.create_table("wide_dim", wide, keys=["k"])
    engine.create_table(
        "facts2",
        spark.range(5000).select(F.col("id"), (F.col("id") % n).alias("k")),
        keys=["id"],
    )
    stats = engine.analyze_table("wide_dim")
    assert stats["est_row_bytes"] is not None
    assert stats["est_row_bytes"] >= 64 * 8  # the array alone is 512 B
    sql = (
        "SELECT count(*) AS c FROM facts2 f "
        "JOIN wide_dim d ON f.k = d.k"
    )
    # Disable Spark's OWN broadcast picks so BroadcastHashJoin in the
    # executed plan can only come from the engine's view hint.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # byte bound below the table's estimated size → no hint
        engine.auto_broadcast_max_bytes = (
            int(stats["rows"] * stats["est_row_bytes"]) - 1
        )
        engine.analyze_table("wide_dim")  # re-register under the new bound
        assert "BroadcastHashJoin" not in executed_plan(engine.sql(sql))
        # raise the bound back above → hint arms
        engine.auto_broadcast_max_bytes = 128 << 20
        engine.analyze_table("wide_dim")
        assert "BroadcastHashJoin" in executed_plan(engine.sql(sql))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_auto_broadcast_unestimable_schema_never_hints(engine, spark):
    """Nested types defeat the byte estimate → est_row_bytes is None and
    the automatic hint must stay off however small the table is."""
    df = spark.range(3).select(
        F.col("id"), F.create_map(F.lit("a"), F.col("id")).alias("m")
    )
    engine.create_table("mapped", df, keys=["id"])
    stats = engine.analyze_table("mapped", columns=["id"])
    assert stats["est_row_bytes"] is None
