"""Per-version change feed (Delta CDF readChangeFeed analog, r14):
engine.table_changes emits one row per changed row per COMMIT with
_change_type + _commit_version; append commits read only their new
write dirs (plan-gated), replace commits diff only changed partitions,
metadata-only commits emit nothing, and the whole feed speaks the end
version's logical schema across metadata renames."""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark import Engine


def _mk(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "t",
        spark.createDataFrame(
            [(1, "a", "p0"), (2, "b", "p1")], "k bigint, s string, p string"
        ),
        keys=["k"],
        versioned=True,
        partition_by=["p"],
    )
    return eng


def test_feed_per_commit_granularity(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    eng.insert(
        "t", spark.createDataFrame([(3, "c", "p0")], "k bigint, s string, p string")
    )  # v2
    eng.upsert(
        "t", spark.createDataFrame([(1, "a2", "p0")], "k bigint, s string, p string")
    )  # v3
    eng.delete("t", spark.createDataFrame([(2,)], "k bigint"), ["k"])  # v4
    rows = sorted(
        (r._commit_version, r.k, r._change_type, r.s)
        for r in eng.table_changes("t", 1).collect()
    )
    assert rows == [
        (2, 3, "insert", "c"),
        (3, 1, "update", "a2"),
        (4, 2, "delete", "b"),
    ], rows
    # a net-zero insert+delete pair collapses in changes() but is
    # PRESERVED per commit in the feed
    eng.upsert(
        "t", spark.createDataFrame([(9, "x", "p1")], "k bigint, s string, p string")
    )
    eng.delete("t", spark.createDataFrame([(9,)], "k bigint"), ["k"])
    assert eng.changes("t", 4).count() == 0
    assert eng.table_changes("t", 4).count() == 2
    # empty range gives a typed empty frame
    empty = eng.table_changes("t", eng.history("t")[-1]["version"])
    assert empty.count() == 0
    assert {"_change_type", "_commit_version"} <= set(empty.columns)


def test_append_fast_path_scans_only_new_dirs(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    eng.insert(
        "t", spark.createDataFrame([(3, "c", "p0")], "k bigint, s string, p string")
    )  # v2: append
    v2 = eng.table_changes("t", 1, 2)
    dirs = {f.split("/data/")[1].split("/")[0] for f in v2.inputFiles()}
    assert dirs == {"w000002"}, dirs  # v1's dir is never opened
    assert [(r.k, r._change_type) for r in v2.collect()] == [(3, "insert")]


def test_replace_diff_scoped_to_changed_partitions(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    eng.upsert(
        "t", spark.createDataFrame([(1, "a2", "p0")], "k bigint, s string, p string")
    )  # v2: replace of p0 only
    v2 = eng.table_changes("t", 1, 2)
    files = v2.inputFiles()
    assert files and all("/p=p0/" in f for f in files), files
    assert [(r.k, r._change_type, r.s) for r in v2.collect()] == [
        (1, "update", "a2")
    ]


def test_feed_speaks_end_schema_across_rename(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    eng.insert(
        "t", spark.createDataFrame([(3, "c", "p0")], "k bigint, s string, p string")
    )  # v2
    eng.rename_column("t", "s", "txt")  # v3: alter, emits nothing
    eng.delete("t", spark.createDataFrame([(2,)], "k bigint"), ["k"])  # v4
    feed = eng.table_changes("t", 1)
    assert "txt" in feed.columns and "s" not in feed.columns
    rows = sorted(
        (r._commit_version, r.k, r._change_type, r.txt) for r in feed.collect()
    )
    assert rows == [(2, 3, "insert", "c"), (4, 2, "delete", "b")], rows
    # a range ending BEFORE the rename speaks the old name
    old_range = eng.table_changes("t", 1, 2)
    assert "s" in old_range.columns and "txt" not in old_range.columns


def test_preimages_feed(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    eng.upsert(
        "t", spark.createDataFrame([(1, "a2", "p0")], "k bigint, s string, p string")
    )
    rows = sorted(
        (r._change_type, r.s)
        for r in eng.table_changes("t", 1, preimages=True).collect()
    )
    assert rows == [
        ("update_postimage", "a2"),
        ("update_preimage", "a"),
    ], rows


def test_dv_delete_and_restore_fall_back_to_diff(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "d",
        spark.createDataFrame(
            [(i, f"s{i}") for i in range(10)], "k bigint, s string"
        ),
        keys=["k"],
        versioned=True,
        deletion_vectors=True,
    )
    eng.sql("DELETE FROM d WHERE k = 3")  # v2: DV delete (mapping unchanged)
    rows = [(r.k, r._change_type) for r in eng.table_changes("d", 1).collect()]
    assert rows == [(3, "delete")], rows
    eng.restore("d", 1)  # v3: the row comes back
    rows = [(r.k, r._change_type) for r in eng.table_changes("d", 2).collect()]
    assert rows == [(3, "insert")], rows


def test_stream_table_changes_cursor(spark, tmp_path):
    from polars_lake_spark.streaming.ingest import stream_table_changes

    eng = _mk(spark, tmp_path)
    eng.insert(
        "t", spark.createDataFrame([(3, "c", "p0")], "k bigint, s string, p string")
    )
    got = []
    cur = stream_table_changes(
        eng, "t", lambda b, f, t: got.append((f, t, b.count()))
    )
    assert cur == 2 and got == [(1, 2, 1)], (cur, got)
    # nothing new: callback not invoked, cursor unchanged
    cur = stream_table_changes(
        eng, "t", lambda b, f, t: got.append((f, t, b.count())),
        from_version=cur,
    )
    assert cur == 2 and len(got) == 1
    # exactly-once downstream via txn watermarks
    eng.create_table(
        "sink",
        spark.createDataFrame([], "k bigint, s string, p string"),
        keys=["k"],
        versioned=True,
    )

    def apply(batch, f, t):
        eng.insert(
            "sink",
            batch.filter("_change_type = 'insert'").drop(
                "_change_type", "_commit_version"
            ),
            txn=("feed", t),
        )

    # from_version=0 includes the INITIAL snapshot as version-1 inserts
    stream_table_changes(eng, "t", apply, from_version=0)
    stream_table_changes(eng, "t", apply, from_version=0)  # replay: txn skips
    assert eng.table("sink").count() == 3  # v1 create inserts + v2 insert


def test_feed_after_post_range_key_rename(spark, tmp_path):
    """r14 review #3: spec.keys speak CURRENT names; a feed over a range
    from BEFORE a key rename must join on the era's key name."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "t",
        spark.createDataFrame([(1, "a")], "k bigint, s string"),
        keys=["k"],
        versioned=True,
    )
    eng.upsert("t", spark.createDataFrame([(1, "a2")], "k bigint, s string"))
    eng.rename_column("t", "k", "kk")  # v3
    rows = [(r.k, r._change_type) for r in eng.table_changes("t", 1, 2).collect()]
    assert rows == [(1, "update")], rows
    # changes() over the same old range works too
    assert eng.changes("t", 1, 2).count() == 1


def test_feed_across_restore_rewind_raises(spark, tmp_path):
    """r14 review #4: a range crossing a RESTORE that rewound column DDL
    is a schema change — raise, never emit a mixed-schema feed."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "t",
        spark.createDataFrame([(1, "a")], "k bigint, s string"),
        keys=["k"],
        versioned=True,
    )
    eng.rename_column("t", "s", "txt")  # v2
    eng.restore("t", 1)  # v3: event log rewinds
    with pytest.raises(ValueError, match="RESTORE"):
        eng.table_changes("t", 0).count()
    # splitting the range at the restore works
    assert eng.table_changes("t", 3).count() == 0
