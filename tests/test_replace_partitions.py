"""replace_partitions: dynamic partition overwrite + partition tombstones.

The surgical-write primitive must (a) rewrite exactly the partitions
present in df, (b) DROP whole partitions it writes no rows into — the case
dynamic overwrite cannot express — as a metadata-only snapshot edit for
versioned tables and a directory delete for plain ones, and (c) never read
or rewrite untouched partitions (the 100 TB contract).
"""

import os

import pytest
from pyspark.sql import functions as F

from polars_lake_spark import Engine
from polars_lake_spark.layout import hive_relpath


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "p int, id bigint, v double")


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def _seed(spark, eng, name, **kw):
    df = _mkdf(
        spark, [(p, p * 100 + i, float(i)) for p in range(4) for i in range(5)]
    )
    eng.create_table(name, df, partition_by=["p"], **kw)
    return df


def _files_of(root, rel):
    d = os.path.join(root, rel)
    return sorted(
        (f, os.stat(os.path.join(d, f)).st_mtime_ns)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def test_hive_relpath_matches_spark_naming(spark, tmp_path):
    """hive_relpath must reproduce the exact directory names Spark writes
    — special characters, bools, and NULL included — or tombstones would
    silently miss their target partitions."""
    vals = ["plain", "a b", "x:y", "p%q", "c=d", "it's", "s/ash", None]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "k string, id int"
    )
    out = str(tmp_path / "hive")
    df.write.partitionBy("k").parquet(out)
    on_disk = {d for d in os.listdir(out) if d.startswith("k=")}
    computed = {hive_relpath(["k"], [v]) for v in vals}
    assert computed == on_disk

    bdf = spark.createDataFrame([(True, 1), (False, 2)], "b boolean, id int")
    bout = str(tmp_path / "hiveb")
    bdf.write.partitionBy("b").parquet(bout)
    assert {hive_relpath(["b"], [True]), hive_relpath(["b"], [False])} == {
        d for d in os.listdir(bout) if d.startswith("b=")
    }


def test_hive_relpath_numeric_temporal_naming(spark, tmp_path):
    """Extend the naming pin to float/double/decimal/date/timestamp
    partition values (ADVICE r7): Java's Double.toString uses scientific
    notation where Python's str() does not — a divergence here makes a
    tombstone/drop a silent no-op and the partition's rows resurrect."""
    import datetime
    import decimal

    def pinned(sch, rows, dtypes):
        df = spark.createDataFrame(rows, sch)
        out = str(tmp_path / sch.split()[1].replace("(", "_").replace(",", "_").replace(")", ""))
        df.write.partitionBy("k").parquet(out)
        on_disk = {d for d in os.listdir(out) if d.startswith("k=")}
        computed = {hive_relpath(["k"], [r[0]], dtypes) for r in rows}
        assert computed == on_disk, f"{sch}: {computed} != {on_disk}"

    pinned(
        "k double, id int",
        [(1.5, 1), (2.0, 2), (0.000781, 3), (1e-7, 4),
         (1234567890.123, 5), (float("nan"), 6), (-0.25, 7), (1e7, 8),
         (9999999.5, 9), (0.001, 10)],
        ["double"],
    )
    pinned("k float, id int", [(1.5, 1), (0.1, 2), (7.81e-4, 3)], ["float"])
    pinned(
        "k decimal(10,3), id int",
        [(decimal.Decimal("1.500"), 1), (decimal.Decimal("0.001"), 2)],
        ["decimal(10,3)"],
    )
    pinned("k date, id int", [(datetime.date(2024, 1, 5), 1)], ["date"])
    pinned(
        "k timestamp, id int",
        [(datetime.datetime(2024, 1, 5, 10, 30, 0), 1),
         (datetime.datetime(2024, 1, 5, 10, 30, 0, 123456), 2)],
        ["timestamp"],
    )


def test_drop_float_partition_and_noop_warning(spark, eng):
    """A drop on a DOUBLE-partitioned plain table must hit the real
    directory (Java-style dir name), and a drop naming a nonexistent
    partition warns instead of silently no-opping."""
    import warnings

    df = spark.createDataFrame(
        [(0.000781, 1), (1.5, 2)], "k double, id int"
    )
    eng.create_table("fp", df, partition_by=["k"])
    root = eng._path("fp")
    assert os.path.isdir(os.path.join(root, "k=7.81E-4"))
    empty = spark.createDataFrame([], "k double, id int")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the real drop must NOT warn
        eng.replace_partitions("fp", empty, drop=[{"k": 0.000781}])
    assert not os.path.exists(os.path.join(root, "k=7.81E-4"))
    assert {r.k for r in eng.table("fp").collect()} == {1.5}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng.replace_partitions("fp", empty, drop=[{"k": 123.25}])
    assert any("names no existing directory" in str(x.message) for x in w)


def test_replace_and_drop_plain_table(spark, eng, tmp_path):
    _seed(spark, eng, "t")
    root = eng._path("t")
    untouched_before = _files_of(root, "p=0")

    repl = _mkdf(spark, [(1, 999, 9.9)])
    eng.replace_partitions("t", repl, drop=[{"p": 2}])

    got = {(r.p, r.id) for r in eng.table("t").collect()}
    assert {p for p, _ in got} == {0, 1, 3}
    assert (1, 999) in got and sum(1 for p, _ in got if p == 1) == 1
    # dropped partition dir is gone; untouched partition files untouched
    assert not os.path.exists(os.path.join(root, "p=2"))
    assert _files_of(root, "p=0") == untouched_before
    # idempotent replay: dropping a missing partition is a no-op
    eng.replace_partitions("t", repl, drop=[{"p": 2}])
    assert {p for p, _ in {(r.p, r.id) for r in eng.table("t").collect()}} == {
        0, 1, 3,
    }


def test_drop_only_no_rows_plain(spark, eng):
    _seed(spark, eng, "t2")
    empty = _mkdf(spark, []).limit(0)
    eng.replace_partitions("t2", empty, drop=[{"p": 0}, {"p": 3}])
    assert {r.p for r in eng.table("t2").select("p").distinct().collect()} == {
        1, 2,
    }


def test_replace_and_drop_versioned_is_metadata_only(spark, eng):
    """Versioned path: the drop is a mapping edit in the same commit —
    untouched partitions keep referencing their ORIGINAL write dirs
    (nothing rewritten), and time travel still sees the dropped data."""
    _seed(spark, eng, "vt", versioned=True)
    store = eng._snapstore("vt")
    v1 = store.load()
    repl = _mkdf(spark, [(1, 999, 9.9)])
    eng.replace_partitions("vt", repl, drop=[{"p": 2}])

    v2 = store.load()
    assert "p=2" in v1.mapping and "p=2" not in v2.mapping
    assert v2.mapping["p=0"] == v1.mapping["p=0"]  # carried by reference
    assert v2.mapping["p=1"] != v1.mapping["p=1"]  # replaced
    assert {r.p for r in eng.table("vt").select("p").distinct().collect()} == {
        0, 1, 3,
    }
    # snapshot isolation: the pre-drop version still reads partition 2
    old = eng.table("vt", version=v1.version)
    assert old.filter(F.col("p") == 2).count() == 5

    # metadata-only drop (no rows at all in df)
    empty = _mkdf(spark, []).limit(0)
    eng.replace_partitions("vt", empty, drop=[{"p": 3}])
    v3 = store.load()
    assert "p=3" not in v3.mapping and v3.mapping["p=0"] == v1.mapping["p=0"]


def test_write_drop_conflict_rejected(spark, eng):
    _seed(spark, eng, "t3")
    repl = _mkdf(spark, [(1, 999, 9.9)])
    with pytest.raises(ValueError, match="both written and dropped"):
        eng.replace_partitions("t3", repl, drop=[{"p": 1}])
    _seed(spark, eng, "vt3", versioned=True)
    with pytest.raises(ValueError, match="both written and dropped"):
        eng.replace_partitions("vt3", repl, drop=[{"p": 1}])


def test_drop_requires_exact_partition_columns(spark, eng):
    _seed(spark, eng, "t4")
    empty = _mkdf(spark, []).limit(0)
    with pytest.raises(ValueError, match="partition columns"):
        eng.replace_partitions("t4", empty, drop=[{"id": 1}])


def test_replace_and_drop_in_memory(spark, eng):
    df = _mkdf(
        spark, [(p, p * 100 + i, float(i)) for p in range(3) for i in range(2)]
    )
    eng.create_table("mem", df, partition_by=["p"], save=False)
    repl = _mkdf(spark, [(0, 7, 7.0)])
    eng.replace_partitions("mem", repl, drop=[{"p": 2}])
    got = {(r.p, r.id) for r in eng.table("mem").collect()}
    assert got == {(0, 7), (1, 100), (1, 101)}


# --- partition-scoped DML (replace_where) -----------------------------------


def test_sql_delete_partitioned_rewrites_only_touched(spark, eng):
    """DELETE on a partitioned table rewrites only the partitions holding
    matched rows: untouched partition files are byte-for-byte untouched,
    a fully-deleted partition's directory is tombstoned away, and the
    surviving rows are row-exact."""
    _seed(spark, eng, "sd")
    root = eng._path("sd")
    before = _files_of(root, "p=3")

    # p=2 fully deleted; p=1 partially; p=0 and p=3 untouched
    st = eng.sql("DELETE FROM sd WHERE p = 2 OR (p = 1 AND id < 103)").head()
    assert (st["operation"], st["n_affected"]) == ("delete", 8)
    got = {(r.p, r.id) for r in eng.table("sd").collect()}
    assert {p for p, _ in got} == {0, 1, 3}
    assert sum(1 for p, _ in got if p == 1) == 2
    assert not os.path.exists(os.path.join(root, "p=2"))
    assert _files_of(root, "p=3") == before


def test_sql_delete_partitioned_versioned_carries_untouched(spark, eng):
    _seed(spark, eng, "sdv", versioned=True)
    store = eng._snapstore("sdv")
    v1 = store.load()
    st = eng.sql("DELETE FROM sdv WHERE p = 2 OR (p = 1 AND id < 103)").head()
    assert st["n_affected"] == 8
    v2 = store.load()
    assert v2.mapping["p=0"] == v1.mapping["p=0"]  # by reference
    assert v2.mapping["p=3"] == v1.mapping["p=3"]
    assert v2.mapping["p=1"] != v1.mapping["p=1"]  # rewritten
    assert "p=2" not in v2.mapping  # tombstoned
    # pre-delete version still reads everything
    assert eng.table("sdv", version=v1.version).count() == 20
    assert eng.table("sdv").count() == 12


def test_sql_update_partitioned_rewrites_only_touched(spark, eng):
    _seed(spark, eng, "su")
    root = eng._path("su")
    before = _files_of(root, "p=0")
    st = eng.sql("UPDATE su SET v = v + 100 WHERE p = 2").head()
    assert (st["operation"], st["n_affected"]) == ("update", 5)
    rows = {(r.p, r.id): r.v for r in eng.table("su").collect()}
    assert rows[(2, 200)] == 100.0 and rows[(2, 204)] == 104.0
    assert rows[(0, 0)] == 0.0  # untouched values
    assert len(rows) == 20
    assert _files_of(root, "p=0") == before  # untouched files


def test_sql_update_on_partition_column_migrates_rows(spark, eng):
    """SET on a partition column falls back to the full overwrite — the
    row must actually MOVE to its new partition directory."""
    _seed(spark, eng, "sm")
    st = eng.sql("UPDATE sm SET p = 9 WHERE p = 1").head()
    assert st["n_affected"] == 5
    got = {r.p for r in eng.table("sm").select("p").distinct().collect()}
    assert got == {0, 2, 3, 9}
    assert eng.table("sm").filter("p = 9").count() == 5
    root = eng._path("sm")
    assert not os.path.exists(os.path.join(root, "p=1"))


def test_engine_delete_keyed_partitioned_scoped(spark, eng):
    _seed(spark, eng, "kd")
    eng.specs["kd"].keys = ["id"]
    root = eng._path("kd")
    before = _files_of(root, "p=0")
    # delete every row of p=2 plus two rows of p=3, by key
    doomed = spark.createDataFrame(
        [(i,) for i in (200, 201, 202, 203, 204, 300, 301)], "id bigint"
    )
    eng.delete("kd", doomed)
    got = {(r.p, r.id) for r in eng.table("kd").collect()}
    assert {p for p, _ in got} == {0, 1, 3}
    assert sum(1 for p, _ in got if p == 3) == 3
    assert not os.path.exists(os.path.join(root, "p=2"))
    assert _files_of(root, "p=0") == before


def test_replace_where_null_partition_in_memory(spark, eng):
    """NULL partition values must match themselves (eqNullSafe) in the
    in-memory replace path — a plain equi-join would keep the old
    NULL-partition rows and duplicate them."""
    df = spark.createDataFrame(
        [(None, 1, 1.0), (None, 2, 2.0), (5, 3, 3.0)],
        "p int, id bigint, v double",
    )
    eng.create_table("nm", df, partition_by=["p"], save=False)
    repl = spark.createDataFrame([(None, 9, 9.0)], "p int, id bigint, v double")
    eng.replace_partitions("nm", repl)
    got = {(r.p, r.id) for r in eng.table("nm").collect()}
    assert got == {(None, 9), (5, 3)}


def test_sql_delete_partitioned_nondeterministic_predicate(spark, eng):
    """The rand() pin still holds on the partition-scoped path: count,
    touched partitions, and the rewrite all see ONE evaluation."""
    _seed(spark, eng, "nd")
    st = eng.sql("DELETE FROM nd WHERE rand() < 0.5").head()
    n = st["n_affected"]
    assert eng.table("nd").count() == 20 - n


def test_vacuum_reclaims_tombstoned_write_dirs(spark, eng):
    """A write dir referenced ONLY by pre-tombstone versions must be
    reclaimed by vacuum once those versions expire — dropped partitions
    age out of storage, they don't leak forever."""
    _seed(spark, eng, "vv", versioned=True)
    store = eng._snapstore("vv")
    w1 = set(os.listdir(store.data_path))
    empty = _mkdf(spark, []).limit(0)
    # tombstone two partitions, then land a real write so vacuum has a
    # newer version to keep
    eng.replace_partitions("vv", empty, drop=[{"p": 0}, {"p": 1}])
    eng.replace_partitions("vv", _mkdf(spark, [(2, 999, 9.9)]))
    res = eng.vacuum("vv", keep_last=1)
    # v1's write dir held p=0..3; after the drops+replace only p=3 still
    # references it... it must survive; nothing the latest version maps
    # is deleted, and reads still work
    latest = store.load()
    referenced = {w for ws in latest.mapping.values() for w in ws}
    for d in referenced:
        assert os.path.isdir(os.path.join(store.data_path, d))
    assert eng.table("vv").count() > 0
    assert {r.p for r in eng.table("vv").select("p").distinct().collect()} == {2, 3}
    # and the tombstoned partitions' data is gone from the LIVE mapping
    assert "p=0" not in latest.mapping and "p=1" not in latest.mapping
    assert isinstance(res.get("removed_dirs", []), list)
