"""Engine create/load/sql/insert/upsert/delete semantics.

Mirrors the reference's integration tests (SURVEY.md §5:
``/root/reference/src/dataset.rs:413-456``,
``/root/reference/src/database.rs:66-85``) but with actual assertions on
data, which the reference never had.
"""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark import Engine
from polars_lake_spark.layout import BUCKET_COL
from polars_lake_spark.sources import load_table


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def _lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_create_save_load_roundtrip(engine, spark, sf_dir, tmp_path):
    li = _lineitem(spark, sf_dir)
    engine.create_table(
        "lineitem",
        li,
        partition_by=["l_returnflag"],
        bucket_by=["l_partkey"],
        n_buckets=4,
        keys=["l_orderkey", "l_linenumber"],
    )
    # fresh engine: load from manifest, hive partition columns recovered
    e2 = Engine(spark, str(tmp_path))
    names = e2.load_all()
    assert names == ["lineitem"]
    df = e2.table("lineitem")
    assert df.count() == li.count()
    assert BUCKET_COL in df.columns
    assert set(r[0] for r in df.select("l_returnflag").distinct().collect()) == {
        "A",
        "N",
        "R",
    }
    info = e2.table_info("lineitem")
    assert info["rows"] == li.count()
    assert info["parts"] >= 3  # at least one file per returnflag partition


def test_sql_point_query_and_agg(engine, spark, sf_dir):
    li = _lineitem(spark, sf_dir)
    engine.create_table("lineitem", li, keys=["l_orderkey", "l_linenumber"])
    # analog of SELECT * FROM t WHERE store_key = 101 (reference database.rs:80)
    got = engine.sql("SELECT * FROM lineitem WHERE l_suppkey = 5").count()
    want = li.filter("l_suppkey = 5").count()
    assert got == want > 0
    # analog of taxi.py:57 COUNT + SUM
    row = engine.sql(
        "SELECT COUNT(*) AS cnt, ROUND(SUM(l_extendedprice), 2) AS total FROM lineitem"
    ).collect()[0]
    assert row.cnt == li.count()


def test_insert_append(engine, spark, sf_dir):
    li = _lineitem(spark, sf_dir).limit(100)
    engine.create_table("t", li, partition_by=["l_returnflag"], keys=["l_orderkey"])
    n0 = engine.table("t").count()
    engine.insert("t", li.limit(10))
    assert engine.table("t").count() == n0 + 10


def test_upsert_semantics(engine, spark):
    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k int, v int, s string"
    )
    new = spark.createDataFrame(
        [(2, None, "B"), (4, 40, "d")], "k int, v int, s string"
    )
    engine.create_table("u", old, keys=["k"])
    engine.upsert("u", new)
    got = {r.k: (r.v, r.s) for r in engine.table("u").collect()}
    # matched row: non-null incoming wins, NULL does NOT clobber (dataset.rs:115)
    assert got[2] == (20, "B")
    # unmatched old kept, new row inserted
    assert got[1] == (10, "a") and got[3] == (30, "c") and got[4] == (40, "d")
    assert len(got) == 4


def test_upsert_partitioned_touches_only_affected(engine, spark):
    old = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 2, 30)], "k int, p int, v int"
    )
    engine.create_table("pt", old, partition_by=["p"], keys=["k"])
    new = spark.createDataFrame([(1, 1, 11), (9, 1, 90)], "k int, p int, v int")
    engine.upsert("pt", new)
    got = {r.k: r.v for r in engine.table("pt").collect()}
    assert got == {1: 11, 2: 20, 3: 30, 9: 90}


def test_upsert_drops_extra_columns_and_evolve(engine, spark):
    old = spark.createDataFrame([(1, 10)], "k int, v int")
    new = spark.createDataFrame([(1, 11, "x")], "k int, v int, extra string")
    engine.create_table("e1", old, keys=["k"])
    engine.upsert("e1", new)
    assert engine.table("e1").columns == ["k", "v"]  # extras dropped (ref default)
    engine2 = Engine(spark, None)
    engine2.create_table("e2", old, keys=["k"], save=False)
    engine2.upsert("e2", new, evolve=True)
    row = engine2.table("e2").collect()[0]
    assert row.extra == "x"


def test_delete_and_drop_duplicates(engine, spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b"), (3, "c")], "k int, s string")
    engine.create_table("d", df, keys=["k"])
    engine.drop_duplicates("d")
    assert engine.table("d").count() == 3
    engine.delete("d", spark.createDataFrame([(2,)], "k int"))
    assert sorted(r.k for r in engine.table("d").collect()) == [1, 3]


def test_in_memory_tier_and_materialize(engine, spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(50)], "k int, v int")
    engine.create_table("m", df, keys=["k"], save=False)
    for i in range(10):  # > max_lazy_merges chained upserts
        upd = spark.createDataFrame([(i, i * 100)], "k int, v int")
        engine.upsert("m", upd, save=False)
    assert engine.table("m").count() == 50
    got = {r.k: r.v for r in engine.table("m").collect()}
    assert got[3] == 300 and got[40] == 400
    engine.root = None  # flush not used here; in-memory only


def test_two_level_namespace(engine, spark, sf_dir, tmp_path):
    """Reference TableName(schema, name) (database.rs:10-25): the engine
    accepts 'schema.table' names; same-named tables in different schemas
    never collide; SQL addresses them as schema__table."""
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("a.t", nation.filter(F.col("n_regionkey") == 0))
    engine.create_table("b.t", nation.filter(F.col("n_regionkey") <= 1))
    na = engine.table("a.t").count()
    nb = engine.table("b.t").count()
    assert na == nation.filter(F.col("n_regionkey") == 0).count()
    assert nb == nation.filter(F.col("n_regionkey") <= 1).count()
    assert na != nb  # genuinely distinct tables
    # SQL surface: one-level views keyed schema__table (bijective mapping)
    assert engine.sql("SELECT COUNT(*) c FROM a__t").first().c == na
    assert engine.sql("SELECT COUNT(*) c FROM b__t").first().c == nb
    assert engine.tables("a") == ["a.t"]
    # reload from storage in a fresh engine
    e2 = Engine(spark, str(tmp_path))
    names = e2.load_all()
    assert "a.t" in names and "b.t" in names
    assert e2.table("a.t").count() == na
    # invalid names rejected (>2 levels, '__' breaks bijectivity, bad chars)
    for bad in ("a.b.c", "a__x.t", "1a.t", "a.t-x"):
        with pytest.raises(ValueError):
            engine.create_table(bad, nation)
    # drop removes the view
    engine.drop_table("a.t", delete_files=True)
    assert "a.t" not in engine.tables()


def test_offload_table_and_recall(engine, spark, sf_dir, tmp_path_factory):
    """S3-offload TODO (reference main.rs:35) done for real: a table's
    storage relocates to another root (cold tier); every operator keeps
    working through the manifest's root_override; a _pointer.json
    breadcrumb keeps it discoverable; recall moves it home again."""
    import os

    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("nation", nation, partition_by=["n_regionkey"], keys=["n_nationkey"])
    cold = str(tmp_path_factory.mktemp("cold_tier"))

    engine.offload_table("nation", cold)
    assert os.path.isfile(os.path.join(cold, "nation", "_manifest.json"))
    assert os.path.isfile(os.path.join(engine.root, "nation", "_pointer.json"))
    assert engine.table("nation").count() == nation.count()

    # mutations work against the offloaded location
    upd = nation.limit(3).withColumn("n_name", F.lit("OFFLOADED"))
    engine.upsert("nation", upd)
    assert (
        engine.table("nation").filter(F.col("n_name") == "OFFLOADED").count() == 3
    )

    # a fresh engine discovers the offloaded table via the breadcrumb
    e2 = Engine(spark, engine.root)
    assert "nation" in e2.load_all()
    assert e2.specs["nation"].root_override == cold
    assert e2.table("nation").count() == nation.count()

    # recall home: breadcrumb gone, data back under the engine root
    engine.offload_table("nation", None)
    assert engine.specs["nation"].root_override is None
    assert not os.path.exists(os.path.join(engine.root, "nation", "_pointer.json"))
    assert os.path.isfile(os.path.join(engine.root, "nation", "_manifest.json"))
    assert engine.table("nation").count() == nation.count()

    # drop removes an offloaded table's real dir AND the breadcrumb
    engine.offload_table("nation", cold)
    engine.drop_table("nation", delete_files=True)
    assert not os.path.exists(os.path.join(cold, "nation"))
    assert not os.path.exists(os.path.join(engine.root, "nation"))


def test_offload_versioned_table_keeps_snapshots(engine, spark, sf_dir, tmp_path_factory):
    """Offloading a VERSIONED table moves the snapshot chain + write dirs
    together; time travel still works from the cold tier and new commits
    land there."""
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("vn", nation, keys=["n_nationkey"], versioned=True)
    engine.upsert("vn", nation.limit(2).withColumn("n_name", F.lit("V2")))
    cold = str(tmp_path_factory.mktemp("cold_v"))

    engine.offload_table("vn", cold)
    assert engine.table("vn", version=1).filter(F.col("n_name") == "V2").count() == 0
    assert engine.table("vn").filter(F.col("n_name") == "V2").count() == 2
    engine.upsert("vn", nation.limit(1).withColumn("n_name", F.lit("V3")))
    assert engine._snapstore("vn").latest_version() == 3
    import os

    assert os.path.isdir(os.path.join(cold, "vn", "_snapshots"))


def test_offload_refuses_shallow_clone(engine, spark, sf_dir, tmp_path_factory):
    """A shallow clone's snapshot mapping references the source's write
    dirs relatively - relocating it would break them; offload refuses."""
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("vsrc", nation, keys=["n_nationkey"], versioned=True)
    engine.clone("vsrc", "vshallow")
    cold = str(tmp_path_factory.mktemp("cold_s"))
    with pytest.raises(ValueError, match="shallow clone"):
        engine.offload_table("vshallow", cold)
    # a deep clone offloads fine
    engine.clone("vsrc", "vdeep2", shallow=False)
    engine.offload_table("vdeep2", cold)
    assert engine.table("vdeep2").count() == nation.count()


def test_offload_refuses_shallow_clone_source(engine, spark, sf_dir, tmp_path_factory):
    """Moving the SOURCE of a shallow clone would break the clone's
    relative write-dir references - offload must refuse until the
    dependents are deep-cloned or dropped."""
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("vsrc2", nation, keys=["n_nationkey"], versioned=True)
    engine.clone("vsrc2", "vdep")
    cold = str(tmp_path_factory.mktemp("cold_src"))
    with pytest.raises(ValueError, match="shallow-clone source"):
        engine.offload_table("vsrc2", cold)
    # dropping the dependent unblocks the offload
    engine.drop_table("vdep", delete_files=True)
    engine.offload_table("vsrc2", cold)
    assert engine.table("vsrc2").count() == nation.count()


def test_offload_refuses_clone_with_foreign_refs_in_history(
    engine, spark, sf_dir, tmp_path_factory
):
    """A shallow clone whose LATEST snapshot is all-local still carries
    foreign refs in older snapshots (time travel) - the guard scans every
    retained version, not just the newest."""
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("vsrc3", nation, keys=["n_nationkey"], versioned=True)
    engine.clone("vsrc3", "vdep3")
    # rewrite every partition of the clone: latest mapping becomes local
    engine.upsert("vdep3", nation.withColumn("n_name", F.upper(F.col("n_name"))))
    latest = engine._snapstore("vdep3").load()
    assert not any(".." in w for ws in latest.mapping.values() for w in ws)
    cold = str(tmp_path_factory.mktemp("cold_hist"))
    with pytest.raises(ValueError, match="shallow clone"):
        engine.offload_table("vdep3", cold)


def test_offload_rejects_object_store_uri(engine, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("nat2", nation)
    with pytest.raises(NotImplementedError, match="object-store"):
        engine.offload_table("nat2", "s3a://bucket/cold")


def test_drop_never_loaded_offloaded_table_removes_data(
    engine, spark, sf_dir, tmp_path_factory
):
    """drop_table(delete_files=True) on a fresh engine (table never
    loaded) must follow the breadcrumb and delete the offloaded data,
    not orphan it."""
    import os

    nation = load_table(spark, sf_dir, "nation")
    engine.create_table("nat3", nation)
    cold = str(tmp_path_factory.mktemp("cold_drop"))
    engine.offload_table("nat3", cold)
    e2 = Engine(spark, engine.root)  # fresh: nat3 not in specs
    e2.drop_table("nat3", delete_files=True)
    assert not os.path.exists(os.path.join(cold, "nat3"))
    assert not os.path.exists(os.path.join(engine.root, "nat3"))


def test_create_table_validates_params_before_constraint_scan(engine, spark, sf_dir):
    """Configuration errors surface immediately - no aggregation job (and
    no constraint-violation masking) before the cheap parameter check."""
    nation = load_table(spark, sf_dir, "nation")
    with pytest.raises(ValueError, match="versioned tables require"):
        engine.create_table(
            "bad1",
            nation,
            bucket_by=["n_nationkey"],
            versioned=True,
            native_bucketing=True,
            constraints={"never": "n_nationkey < 0"},  # all rows violate
        )
