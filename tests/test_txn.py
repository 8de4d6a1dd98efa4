"""Idempotent-writer transaction watermarks (Delta txnAppId/txnVersion
analog): replayed batches must be no-ops, watermarks ride atomically in
the snapshot commit and carry across unrelated writes, and restore rolls
them back with the data they describe."""

import pytest

from polars_lake_spark import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    e.create_table("t", df, keys=["id"], versioned=True)
    return e


def _b(spark, rows):
    return spark.createDataFrame(rows, "id bigint, s string")


def test_insert_replay_is_noop(spark, eng):
    eng.insert("t", _b(spark, [(3, "c")]), txn=("app", 1))
    assert eng.txn_version("t", "app") == 1
    v = eng._snapstore("t").latest_version()
    # exact replay: no new rows, no new snapshot
    eng.insert("t", _b(spark, [(3, "c")]), txn=("app", 1))
    assert eng.table("t").count() == 3
    assert eng._snapstore("t").latest_version() == v
    # lower version: also skipped
    eng.insert("t", _b(spark, [(9, "x")]), txn=("app", 0))
    assert eng.table("t").count() == 3
    # higher version applies and advances the watermark
    eng.insert("t", _b(spark, [(4, "d")]), txn=("app", 2))
    assert eng.table("t").count() == 4
    assert eng.txn_version("t", "app") == 2


def test_watermark_carries_across_unrelated_commits(spark, eng):
    eng.insert("t", _b(spark, [(3, "c")]), txn=("app", 5))
    # untracked writes in between (another writer, no txn)
    eng.upsert("t", _b(spark, [(1, "A")]))
    eng.insert("t", _b(spark, [(7, "g")]))
    # the watermark still holds in the LATEST snapshot — replay skipped
    assert eng.txn_version("t", "app") == 5
    n = eng.table("t").count()
    eng.insert("t", _b(spark, [(3, "c")]), txn=("app", 5))
    assert eng.table("t").count() == n


def test_independent_apps_do_not_interfere(spark, eng):
    eng.insert("t", _b(spark, [(3, "c")]), txn=("app_a", 3))
    eng.insert("t", _b(spark, [(4, "d")]), txn=("app_b", 1))
    assert eng.txn_version("t", "app_a") == 3
    assert eng.txn_version("t", "app_b") == 1
    assert eng.txn_version("t", "app_c") is None


def test_upsert_and_overwrite_txn(spark, eng):
    eng.upsert("t", _b(spark, [(1, "A")]), txn=("m", 1))
    assert {r.s for r in eng.table("t").filter("id = 1").collect()} == {"A"}
    eng.upsert("t", _b(spark, [(1, "B")]), txn=("m", 1))  # replay skipped
    assert {r.s for r in eng.table("t").filter("id = 1").collect()} == {"A"}
    eng.overwrite("t", _b(spark, [(9, "z")]), txn=("m", 2))
    assert eng.table("t").count() == 1
    eng.overwrite("t", _b(spark, [(8, "y")]), txn=("m", 2))  # skipped
    assert {r.id for r in eng.table("t").collect()} == {9}


def test_txn_requires_versioned_table(spark, eng):
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    eng.create_table("plain", df, keys=["id"])
    with pytest.raises(ValueError, match="versioned"):
        eng.insert("plain", df, txn=("app", 1))


def test_restore_rolls_watermark_back(spark, eng):
    store = eng._snapstore("t")
    v_before = store.latest_version()
    eng.insert("t", _b(spark, [(3, "c")]), txn=("app", 1))
    eng.restore("t", v_before)
    # the restored state predates batch 1 → its watermark is gone and the
    # batch legitimately re-applies
    assert eng.txn_version("t", "app") is None
    eng.insert("t", _b(spark, [(3, "c")]), txn=("app", 1))
    assert eng.table("t").filter("id = 3").count() == 1


def test_stream_append_exactly_once(spark, eng, tmp_path):
    """The foreachBatch append sink: run the same bounded stream TWICE
    against two different checkpoint dirs — Spark replays every epoch the
    second time, and the engine-side watermark must make each a no-op."""
    from polars_lake_spark.streaming.ingest import stream_append

    staging = str(tmp_path / "stream_src")
    _b(spark, [(10, "j"), (11, "k")]).repartition(1).write.parquet(staging)
    stream = spark.readStream.schema("id bigint, s string").parquet(staging)
    q = stream_append(
        eng, "t", stream,
        checkpoint_dir=str(tmp_path / "ck1"), txn_app="loader",
    )
    q.awaitTermination(120)
    assert eng.table("t").count() == 4
    # fresh checkpoint → epoch ids restart at 0 → full replay
    stream2 = spark.readStream.schema("id bigint, s string").parquet(staging)
    q2 = stream_append(
        eng, "t", stream2,
        checkpoint_dir=str(tmp_path / "ck2"), txn_app="loader",
    )
    q2.awaitTermination(120)
    assert eng.table("t").count() == 4  # no duplicates


def test_drop_only_commit_preserves_watermark(spark, eng, tmp_path):
    """A metadata-only partition-drop commit must carry the txn map
    forward (r7 review finding): otherwise a drained-partition DELETE
    right before a crash would let the replayed ingest batch re-apply."""
    e2 = Engine(spark, str(tmp_path / "wm"))
    df = spark.createDataFrame(
        [(0, 1, "a"), (1, 2, "b")], "p int, id bigint, s string"
    )
    e2.create_table("pt", df, partition_by=["p"], keys=["id"], versioned=True)
    batch = spark.createDataFrame([(0, 3, "c")], "p int, id bigint, s string")
    e2.insert("pt", batch, txn=("loader", 7))
    assert e2.txn_version("pt", "loader") == 7
    # drop-only commit (no rows written)
    empty = spark.createDataFrame([], "p int, id bigint, s string")
    e2.replace_partitions("pt", empty, drop=[{"p": 1}])
    assert e2.txn_version("pt", "loader") == 7
    n = e2.table("pt").count()
    e2.insert("pt", batch, txn=("loader", 7))  # replay: still skipped
    assert e2.table("pt").count() == n
