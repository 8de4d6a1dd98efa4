"""Versioned (snapshot) tables: time travel, snapshot isolation during
rewrite, append/replace mapping semantics, restore, vacuum.

The capability the unversioned layout explicitly documents as missing
(engine.py: "no snapshot isolation for read-during-rewrite — Delta/Iceberg
territory") — implemented in snapshots.py with no lake-format dependency.
"""

import os

import pyspark.sql.functions as F
import pytest

from polars_lake_spark import Engine
from polars_lake_spark.sources import load_table


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def _make(engine, spark, sf_dir, **kw):
    o = _orders(spark, sf_dir)
    engine.create_table(
        "vorders",
        o,
        partition_by=["o_orderstatus"],
        keys=["o_orderkey"],
        versioned=True,
        **kw,
    )
    return o


def test_create_and_read_latest(engine, spark, sf_dir):
    o = _make(engine, spark, sf_dir)
    got = engine.table("vorders")
    assert got.count() == o.count()
    assert set(got.columns) == set(o.columns)
    assert engine.table_info("vorders")["version"] == 1


def test_upsert_creates_version_and_time_travel(engine, spark, sf_dir):
    o = _make(engine, spark, sf_dir)
    n0 = o.count()
    batch = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    engine.upsert("vorders", batch)

    v1 = engine.table("vorders", version=1)
    v2 = engine.table("vorders")
    assert v1.count() == n0 and v2.count() == n0
    # v1 is the pre-upsert table; v2 has doubled prices on the batch keys
    s1 = v1.filter(F.col("o_orderkey") % 10 == 0).agg(F.sum("o_totalprice")).first()[0]
    s2 = v2.filter(F.col("o_orderkey") % 10 == 0).agg(F.sum("o_totalprice")).first()[0]
    assert abs(s2 - 2 * s1) < 1e-6 * abs(s2)
    # untouched keys identical across versions
    u1 = v1.filter(F.col("o_orderkey") % 10 != 0).agg(F.sum("o_totalprice")).first()[0]
    u2 = v2.filter(F.col("o_orderkey") % 10 != 0).agg(F.sum("o_totalprice")).first()[0]
    assert u1 == u2

    hist = engine.history("vorders")
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["op"] == "create" and hist[1]["op"] == "replace"


def test_reader_isolated_from_concurrent_rewrite(engine, spark, sf_dir):
    """A DataFrame pinned to a version keeps returning the same answer
    while later writes commit — the read-during-rewrite hazard of the
    in-place layout cannot occur (old dirs are immutable)."""
    o = _make(engine, spark, sf_dir)
    reader = engine.table("vorders", version=1)
    before = reader.agg(F.sum("o_totalprice")).first()[0]
    for i in range(2):
        batch = o.filter(F.col("o_orderkey") % 5 == i).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1000.0
        )
        engine.upsert("vorders", batch)
    # same plan, re-executed AFTER two rewrites of its partitions
    after = reader.agg(F.sum("o_totalprice")).first()[0]
    assert before == after
    assert engine.table_info("vorders")["version"] == 3


def test_insert_appends_dirs(engine, spark, sf_dir):
    o = _make(engine, spark, sf_dir)
    n0 = o.count()
    extra = o.limit(100).withColumn(
        "o_orderkey", F.col("o_orderkey") + 50_000_000
    )
    engine.insert("vorders", extra)
    assert engine.table("vorders").count() == n0 + 100
    assert engine.table("vorders", version=1).count() == n0
    assert engine.history("vorders")[-1]["op"] == "append"


def test_delete_rewrites_and_preserves_history(engine, spark, sf_dir):
    o = _make(engine, spark, sf_dir)
    n0 = o.count()
    doomed = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    nf = doomed.count()
    engine.delete("vorders", doomed)
    now = engine.table("vorders")
    assert now.count() == n0 - nf
    assert now.filter(F.col("o_orderstatus") == "F").count() == 0
    # the pre-delete snapshot still has every row
    assert engine.table("vorders", version=1).count() == n0


def test_restore_rolls_back_as_new_version(engine, spark, sf_dir):
    o = _make(engine, spark, sf_dir)
    batch = o.limit(50).withColumn("o_totalprice", F.lit(0.0))
    engine.upsert("vorders", batch)
    engine.restore("vorders", 1)
    assert engine.table_info("vorders")["version"] == 3
    s_now = engine.table("vorders").agg(F.sum("o_totalprice")).first()[0]
    s_v1 = engine.table("vorders", version=1).agg(F.sum("o_totalprice")).first()[0]
    assert s_now == s_v1


def test_vacuum_drops_unreferenced_dirs_keeps_current(engine, spark, sf_dir, tmp_path):
    o = _make(engine, spark, sf_dir)
    n0 = o.count()
    for i in range(2):
        batch = o.filter(F.col("o_orderkey") % 3 == i).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1.0
        )
        engine.upsert("vorders", batch)
    engine.compact("vorders")  # folds all partitions into one new dir
    data_dir = os.path.join(str(tmp_path), "vorders", "data")
    n_dirs_before = len(os.listdir(data_dir))
    report = engine.vacuum("vorders", keep_last=1)
    assert report["removed_dirs"], "vacuum should drop pre-compaction dirs"
    assert len(os.listdir(data_dir)) < n_dirs_before
    # current version unaffected
    assert engine.table("vorders").count() == n0
    # expired versions are gone
    with pytest.raises(ValueError):
        engine.table("vorders", version=1)


def test_schema_evolution_across_versions(engine, spark, sf_dir):
    o = _make(engine, spark, sf_dir)
    evolved = (
        o.limit(20)
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
        .withColumn("o_channel", F.lit("web"))
    )
    engine.upsert("vorders", evolved, evolve=True)
    now = engine.table("vorders")
    assert "o_channel" in now.columns
    # rows from untouched (pre-evolution) dirs read as NULL
    assert now.filter(F.col("o_channel").isNull()).count() > 0
    # time travel to v1 yields the pre-evolution schema
    assert "o_channel" not in engine.table("vorders", version=1).columns


def test_fresh_engine_loads_versioned_table(engine, spark, sf_dir, tmp_path):
    o = _make(engine, spark, sf_dir)
    engine.upsert(
        "vorders", o.limit(10).withColumn("o_totalprice", F.lit(1.0))
    )
    e2 = Engine(spark, str(tmp_path))
    assert e2.load_all() == ["vorders"]
    assert e2.specs["vorders"].versioned
    assert e2.table("vorders").count() == o.count()
    assert e2.table("vorders", version=1).count() == o.count()


def test_versioned_rejects_bad_combos(engine, spark, sf_dir):
    o = _orders(spark, sf_dir)
    with pytest.raises(ValueError):
        engine.create_table("v1", o, versioned=True, save=False)
    with pytest.raises(ValueError):
        engine.create_table("v2", o, versioned=True, format="csv")
    engine.create_table("plain", o, keys=["o_orderkey"])
    with pytest.raises(ValueError):
        engine.table("plain", version=1)


def test_concurrent_commit_conflict_detected(engine, spark, sf_dir, tmp_path):
    """Two Engine instances over the same root: the writer whose
    transaction read a stale base must get ConcurrentCommitError, never a
    silent lost update."""
    from polars_lake_spark.snapshots import ConcurrentCommitError, SnapshotStore

    o = _make(engine, spark, sf_dir)
    store = SnapshotStore(os.path.join(str(tmp_path), "vorders"))
    stale_base = store.load()  # v1

    # another writer lands v2
    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    e2.upsert("vorders", o.limit(5).withColumn("o_totalprice", F.lit(9.0)))
    assert store.latest_version() == 2

    # replaying a write against the stale base must fail
    wname, wpath = store.new_write_dir()
    os.makedirs(os.path.join(wpath, "o_orderstatus=F"), exist_ok=True)
    with open(os.path.join(wpath, "o_orderstatus=F", "x.parquet"), "wb") as f:
        f.write(b"")
    with pytest.raises(ConcurrentCommitError):
        store.commit_write(wname, "replace", None, base=stale_base)

    # and a direct same-version race (rename would silently replace;
    # link must refuse)
    with pytest.raises(ConcurrentCommitError):
        store.commit(stale_base.mapping, "replace", None, expected_base=1)


def test_change_feed_between_versions(engine, spark, sf_dir):
    """CDC: changes(from, to) tags exactly the inserted / updated /
    deleted keys between two snapshots, with deleted rows carrying their
    old values."""
    o = _make(engine, spark, sf_dir)
    # v2: update 10 keys, insert 5 new ones
    upd = o.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 7.0
    )
    ins = o.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + 90_000_000)
    engine.upsert("vorders", upd.unionByName(ins))
    # v3: delete the F partition
    engine.delete("vorders", o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"))

    n_upd = upd.count()
    cdc12 = engine.changes("vorders", 1, 2).cache()
    assert cdc12.filter(F.col("_change_type") == "update").count() == n_upd
    assert cdc12.filter(F.col("_change_type") == "insert").count() == 5
    assert cdc12.filter(F.col("_change_type") == "delete").count() == 0

    cdc13 = engine.changes("vorders", 1, 3)
    dels = cdc13.filter(F.col("_change_type") == "delete")
    n_f = o.filter(F.col("o_orderstatus") == "F").count()
    # updates that landed in F then got deleted count as deletes vs v1
    assert dels.count() == n_f
    # deleted rows surface old values (status F preserved)
    assert dels.filter(F.col("o_orderstatus") != "F").count() == 0
    cdc12.unpersist()


def test_stream_upsert_into_versioned_table(engine, spark, sf_dir, tmp_path):
    """Structured Streaming foreachBatch merging into a VERSIONED table:
    each micro-batch commits one snapshot, so the ingest history is
    time-travelable and a concurrent reader never sees a half-applied
    batch."""
    from polars_lake_spark.streaming import stream_upsert

    o = _make(engine, spark, sf_dir)
    updates = o.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 500.0
    )
    staging = str(tmp_path / "stream_staging")
    updates.repartition(3).write.parquet(staging)

    stream = spark.readStream.schema(updates.schema).parquet(staging)
    q = stream_upsert(
        engine,
        "vorders",
        stream,
        keys=["o_orderkey"],
        checkpoint_dir=str(tmp_path / "ckpt_vup"),
    )
    q.awaitTermination(120)

    hist = engine.history("vorders")
    assert hist[0]["op"] == "create"
    assert all(h["op"] == "replace" for h in hist[1:])
    assert len(hist) >= 2
    # final state == batch upsert result; v1 is untouched
    n0 = o.count()
    assert engine.table("vorders").count() == n0
    got = (
        engine.table("vorders")
        .filter(F.col("o_orderkey") % 4 == 0)
        .agg(F.round(F.sum("o_totalprice"), 2))
        .first()[0]
    )
    want = updates.agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    assert got == want
    v1_sum = (
        engine.table("vorders", version=1)
        .filter(F.col("o_orderkey") % 4 == 0)
        .agg(F.round(F.sum("o_totalprice"), 2))
        .first()[0]
    )
    assert abs(want - v1_sum - 500.0 * updates.count()) < 1.0


def test_engine_merge_versioned_conditional_delete(engine, spark, sf_dir):
    """engine.merge drives MERGE INTO conditional actions through the
    snapshot write path: each merge is one new version, time travel sees
    the pre-merge rows, and a delete-capable merge takes the full-rewrite
    op (emptied partitions cannot linger)."""
    o = _make(engine, spark, sf_dir)
    n0 = o.count()
    src = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    ns = src.count()

    # matched rows with price over the threshold are deleted, rest updated
    engine.merge(
        "vorders",
        src,
        when_matched_delete=F.col("n.o_totalprice") > 100_000.0,
        when_not_matched_insert=False,
    )
    deleted = src.filter(F.col("o_totalprice") > 100_000.0).count()
    assert 0 < deleted < ns
    assert engine.table("vorders").count() == n0 - deleted
    # pre-merge snapshot is intact; merge committed exactly one version
    assert engine.table("vorders", version=1).count() == n0
    assert engine.table_info("vorders")["version"] == 2
    assert engine.history("vorders")[-1]["op"] == "rewrite"


def test_engine_merge_versioned_prunes_without_delete(engine, spark, sf_dir):
    """A delete-free engine.merge takes the partition-pruned 'replace'
    path: only touched partitions land in the new write dir."""
    o = _make(engine, spark, sf_dir)
    src = (
        o.filter(F.col("o_orderstatus") == "F")
        .limit(50)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    engine.merge("vorders", src)
    assert engine.history("vorders")[-1]["op"] == "replace"
    got = engine.table("vorders")
    assert got.count() == o.count()
    # doubled prices visible at latest, not at v1
    k = src.select("o_orderkey").limit(1).first()[0]
    p_new = got.filter(F.col("o_orderkey") == k).first()["o_totalprice"]
    p_old = (
        engine.table("vorders", version=1)
        .filter(F.col("o_orderkey") == k)
        .first()["o_totalprice"]
    )
    assert abs(p_new - 2 * p_old) < 1e-6


def test_shallow_clone_zero_copy_and_divergence(engine, spark, sf_dir):
    """engine.clone(shallow): v1 references the source's write dirs (no
    data copied), then the clone diverges through its own write dirs;
    vacuuming the clone never deletes source files."""
    import glob
    import os

    o = _make(engine, spark, sf_dir)
    n0 = o.count()
    engine.clone("vorders", "vclone")

    # zero copy: the clone's data dir holds no local parquet at v1
    clone_data = os.path.join(engine.root, "vclone", "data")
    assert glob.glob(os.path.join(clone_data, "w*")) == []
    assert engine.table("vclone").count() == n0
    assert engine.history("vclone")[-1]["op"] == "clone"

    # clone diverges; source untouched
    batch = o.limit(20).withColumn("o_totalprice", F.lit(1.0))
    engine.upsert("vclone", batch)
    assert engine.table("vclone").filter(F.col("o_totalprice") == 1.0).count() == 20
    assert engine.table("vorders").filter(F.col("o_totalprice") == 1.0).count() == 0

    # vacuum on the clone removes nothing foreign
    src_files = set(glob.glob(os.path.join(engine.root, "vorders", "data", "**", "*.parquet"), recursive=True))
    engine.vacuum("vclone", keep_last=1)
    still = set(glob.glob(os.path.join(engine.root, "vorders", "data", "**", "*.parquet"), recursive=True))
    assert still == src_files
    assert engine.table("vclone").count() == n0


def test_deep_clone_independent_copy(engine, spark, sf_dir):
    o = _make(engine, spark, sf_dir)
    engine.clone("vorders", "vdeep", shallow=False)
    assert engine.table("vdeep").count() == o.count()
    # deep clone has its own write dirs
    import glob
    import os

    assert glob.glob(os.path.join(engine.root, "vdeep", "data", "w*"))


def test_cdf_preimages_four_types(engine, spark, sf_dir):
    """changes(preimages=True) emits the Delta-CDF four-type feed: updates
    appear twice (pre+post), and signed sums reconcile the two versions."""
    o = _make(engine, spark, sf_dir)
    upd = o.limit(30).withColumn("o_totalprice", F.col("o_totalprice") + 7.0)
    engine.upsert("vorders", upd)
    cdc = engine.changes("vorders", 1, 2, preimages=True)
    by_type = {r["_change_type"]: r["n"] for r in
               cdc.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_type.get("update_preimage", 0) == by_type.get("update_postimage", 0) == 30
    assert "insert" not in by_type and "delete" not in by_type
    # signed price delta == 30 * 7
    sign = F.when(F.col("_change_type").isin("insert", "update_postimage"), 1).otherwise(-1)
    d = cdc.agg(F.round(F.sum(sign * F.col("o_totalprice")), 2)).first()[0]
    assert abs(d - 210.0) < 1e-6


def test_incremental_aggregate_matches_recompute(engine, spark, sf_dir):
    """create_aggregate + refresh_aggregate: after updates, inserts with
    NEW group keys, and deletes, the incrementally-maintained aggregate
    equals a from-scratch recompute (2dp)."""
    o = _make(engine, spark, sf_dir)
    engine.create_aggregate(
        "orders_agg", "vorders", ["o_orderstatus"], {"revenue": "o_totalprice"}
    )

    # mutate: reprice some, insert a new status group, delete some
    upd = o.filter(F.col("o_orderkey") % 9 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.5
    )
    engine.upsert("vorders", upd)
    newg = (
        o.limit(10)
        .withColumn("o_orderkey", F.col("o_orderkey") + 77_000_000)
        .withColumn("o_orderstatus", F.lit("X"))
    )
    engine.upsert("vorders", newg)
    engine.delete("vorders", o.filter(F.col("o_orderkey") % 31 == 0).select("o_orderkey"))

    out = engine.refresh_aggregate("orders_agg")
    assert out["refreshed"]
    got = {
        r.o_orderstatus: (round(r.revenue, 2), r.n_rows)
        for r in engine.table("orders_agg").collect()
    }
    expect = {
        r.o_orderstatus: (round(r.revenue, 2), r.n_rows)
        for r in engine.table("vorders")
        .groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][1] == expect[k][1], k
        assert abs(got[k][0] - expect[k][0]) < 0.05, (k, got[k], expect[k])
    # second refresh is a no-op
    assert engine.refresh_aggregate("orders_agg")["refreshed"] is False


def test_refresh_aggregate_crash_safe_no_double_apply(engine, spark, sf_dir):
    """r4 VERDICT item 1: applied_version is recorded INSIDE the
    aggregate's snapshot commit, so a crash after commit but before any
    sidecar write cannot re-apply the same signed delta.  Simulated by
    rewinding the sidecar to its create-time value after a successful
    refresh — the next refresh must be a no-op, not a double-count."""
    import json
    import os

    o = _make(engine, spark, sf_dir)
    engine.create_aggregate(
        "orders_agg2", "vorders", ["o_orderstatus"], {"revenue": "o_totalprice"}
    )
    upd = o.limit(40).withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
    engine.upsert("vorders", upd)
    assert engine.refresh_aggregate("orders_agg2")["refreshed"] is True
    before = {
        r.o_orderstatus: (round(r.revenue, 2), r.n_rows)
        for r in engine.table("orders_agg2").collect()
    }

    # Crash simulation: the sidecar never advanced past create-time.
    sidecar = os.path.join(engine.root, "orders_agg2", engine.AGGDEF)
    with open(sidecar) as f:
        d = json.load(f)
    d["applied_version"] = 1
    with open(sidecar, "w") as f:
        json.dump(d, f)

    out = engine.refresh_aggregate("orders_agg2")
    assert out["refreshed"] is False  # snapshot meta, not sidecar, is truth
    after = {
        r.o_orderstatus: (round(r.revenue, 2), r.n_rows)
        for r in engine.table("orders_agg2").collect()
    }
    assert after == before  # no double-applied delta


def test_deep_clone_keeps_constraints(engine, spark, sf_dir):
    """r4 VERDICT item 6: both clone modes must enforce the same
    invariants — a deep clone carries the source's CHECK constraints and
    rejects a violating insert just like the source would."""
    from polars_lake_spark.engine import ConstraintViolationError

    o = _make(engine, spark, sf_dir)
    engine.add_constraint("vorders", "pos_price", "o_totalprice > 0")
    engine.clone("vorders", "vdeepc", shallow=False)
    assert engine.specs["vdeepc"].constraints == {"pos_price": "o_totalprice > 0"}
    bad = o.limit(1).withColumn("o_totalprice", F.lit(-5.0)).withColumn(
        "o_orderkey", F.lit(999_999_999)
    )
    with pytest.raises(ConstraintViolationError):
        engine.insert("vdeepc", bad)
    # survives a manifest reload too
    e2 = type(engine)(spark, engine.root)
    e2.load_table("vdeepc")
    assert e2.specs["vdeepc"].constraints == {"pos_price": "o_totalprice > 0"}


def test_clone_spec_containers_are_independent(engine, spark, sf_dir):
    """A shallow clone must not share mutable spec state: constraints
    added to the clone never appear on (or get enforced against) the
    source."""
    _make(engine, spark, sf_dir)
    engine.clone("vorders", "vc2")
    engine.add_constraint("vc2", "pos", "o_totalprice > 0")
    assert "pos" not in engine.specs["vorders"].constraints
    engine.drop_constraint("vc2", "pos")
    assert "pos" not in engine.specs["vc2"].constraints


def test_refresh_aggregate_after_restore_reapplies(engine, spark, sf_dir):
    """restore() on an aggregate carries the restored commit's meta, so
    the next refresh re-applies the FULL delta from the rolled-back state
    instead of trusting the newer pre-restore marker (r5 review)."""
    o = _make(engine, spark, sf_dir)
    engine.create_aggregate(
        "orders_agg4", "vorders", ["o_orderstatus"], {"revenue": "o_totalprice"}
    )
    upd = o.limit(25).withColumn("o_totalprice", F.col("o_totalprice") + 50.0)
    engine.upsert("vorders", upd)
    assert engine.refresh_aggregate("orders_agg4")["refreshed"] is True

    # roll the aggregate back to its create-time state (v1)
    engine.restore("orders_agg4", 1)
    # the marker must have rolled back too: refresh re-applies the delta
    out = engine.refresh_aggregate("orders_agg4")
    assert out["refreshed"] is True
    got = {
        r.o_orderstatus: (round(r.revenue, 2), r.n_rows)
        for r in engine.table("orders_agg4").collect()
    }
    expect = {
        r.o_orderstatus: (round(r.revenue, 2), r.n_rows)
        for r in engine.table("vorders")
        .groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][1] == expect[k][1], k
        assert abs(got[k][0] - expect[k][0]) < 0.05, (k, got[k], expect[k])
    # and it converges: another refresh is a no-op
    assert engine.refresh_aggregate("orders_agg4")["refreshed"] is False
