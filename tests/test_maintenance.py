"""Compaction + type-widening schema evolution."""

import os

import pytest

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


def test_zorder_compact_narrows_file_ranges(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER BY analog: after compact(zorder_by=[a, b]) every
    output file must carry narrow min/max ranges on BOTH columns (checked
    via parquet footer stats) — plain compaction only ever clusters the
    incidental input order."""
    import glob

    import pyarrow.parquet as pq

    from polars_lake_spark import Engine
    from polars_lake_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    engine = Engine(spark, str(tmp_path))
    engine.create_table("zli", li)
    engine.compact("zli", n_files=8, zorder_by=["l_orderkey", "l_partkey"])

    def spans(path_glob, col):
        out = []
        for f in glob.glob(path_glob):
            md = pq.read_metadata(f)
            lo = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            out.append(hi - lo)
        return out

    files = str(tmp_path / "zli" / "*.parquet")
    full_ok = li.agg(F.max("l_orderkey") - F.min("l_orderkey")).first()[0]
    full_pk = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    span_ok = spans(files, "l_orderkey")
    span_pk = spans(files, "l_partkey")
    assert len(span_ok) >= 4  # actually produced multiple files
    # Files are clustered in both dimensions at once. (A z-curve segment
    # that crosses a major quadrant boundary legitimately spans wide in
    # one dim — same artifact as Delta ZORDER — so assert the
    # distribution, not the max.)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    assert med(span_ok) <= 0.55 * full_ok, (span_ok, full_ok)
    assert med(span_pk) <= 0.55 * full_pk, (span_pk, full_pk)
    frac_narrow_ok = sum(s <= 0.7 * full_ok for s in span_ok) / len(span_ok)
    frac_narrow_pk = sum(s <= 0.7 * full_pk for s in span_pk) / len(span_pk)
    assert frac_narrow_ok >= 0.75 and frac_narrow_pk >= 0.75
    # and the table still reads back complete
    assert engine.table("zli").count() == li.count()


def test_merge_into_clause_flags(spark, sf_dir):
    """merge_into: delete/update/insert clauses toggle independently."""
    from polars_lake_spark.operators.merge import merge_into
    from polars_lake_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    n0, ns = o.count(), src.count()

    # update-only (no insert): count unchanged even with alien keys
    alien = src.withColumn("o_orderkey", F.col("o_orderkey") + 123_456_789)
    m = merge_into(o, alien, ["o_orderkey"], when_not_matched_insert=False)
    assert m.count() == n0

    # matched-delete removes exactly the matches
    m2 = merge_into(
        o, src, ["o_orderkey"], when_matched_delete=F.lit(True),
        when_not_matched_insert=False,
    )
    assert m2.count() == n0 - ns

    # suppressed update keeps old values
    m3 = merge_into(o, src, ["o_orderkey"], when_matched_update=False)
    s_old = o.agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    s_m3 = m3.agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    assert s_old == s_m3


def test_engine_merge_unversioned_persisted(spark, sf_dir, tmp_path):
    """engine.merge on a plain persisted table: conditional delete + update
    land via a static overwrite; alien keys stay out when insert is off."""
    o = load_table(spark, sf_dir, "orders")
    engine = Engine(spark, str(tmp_path))
    engine.create_table(
        "orders_m", o, partition_by=["o_orderstatus"], keys=["o_orderkey"]
    )
    n0 = o.count()
    src = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    alien = src.withColumn("o_orderkey", F.col("o_orderkey") + 987_654_321)
    engine.merge(
        "orders_m",
        src.union(alien),
        when_matched_delete=F.col("n.o_totalprice") > 200_000.0,
        when_not_matched_insert=False,
    )
    deleted = src.filter(F.col("o_totalprice") > 200_000.0).count()
    got = engine.table("orders_m")
    assert got.count() == n0 - deleted
    assert got.filter(F.col("o_orderkey") > 900_000_000).count() == 0


def test_engine_merge_inmem_partitioned_keeps_untouched_partitions(
    spark, sf_dir, tmp_path
):
    """A delete-free merge on an in-memory partitioned table (save=False)
    must NOT prune to touched partitions: the result is assigned as the
    whole table, so pruning would silently drop every untouched partition
    (regression test for the r3 advice finding)."""
    o = load_table(spark, sf_dir, "orders")
    engine = Engine(spark, str(tmp_path))
    engine.create_table(
        "orders_im",
        o,
        partition_by=["o_orderstatus"],
        keys=["o_orderkey"],
        save=False,
    )
    n0 = o.count()
    statuses0 = {r[0] for r in o.select("o_orderstatus").distinct().collect()}
    assert len(statuses0) > 1  # the test needs untouched partitions to lose
    # source batch touches exactly one partition
    one = next(iter(sorted(statuses0)))
    src = (
        o.filter(F.col("o_orderstatus") == one)
        .limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    )
    engine.merge("orders_im", src)
    got = engine.table("orders_im")
    assert got.count() == n0
    statuses1 = {r[0] for r in got.select("o_orderstatus").distinct().collect()}
    assert statuses1 == statuses0


def test_check_constraints_enforced_on_writes(spark, sf_dir, tmp_path):
    """ALTER TABLE ADD CONSTRAINT analog: existing data is validated when
    the constraint is added; violating inserts/upserts are rejected before
    anything lands; clean writes pass; constraints survive manifest
    reload."""
    import pytest as _pt

    from polars_lake_spark.engine import ConstraintViolationError

    o = load_table(spark, sf_dir, "orders")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("oc", o, partition_by=["o_orderstatus"], keys=["o_orderkey"])
    engine.add_constraint("oc", "price_positive", "o_totalprice > 0")

    # a constraint existing data violates is refused
    with _pt.raises(ConstraintViolationError):
        engine.add_constraint("oc", "impossible", "o_totalprice > 1e12")

    n0 = engine.table("oc").count()
    bad = o.limit(5).withColumn("o_totalprice", F.lit(-1.0)).withColumn(
        "o_orderkey", F.col("o_orderkey") + 55_000_000
    )
    with _pt.raises(ConstraintViolationError):
        engine.insert("oc", bad)
    with _pt.raises(ConstraintViolationError):
        engine.upsert("oc", bad)
    assert engine.table("oc").count() == n0  # nothing landed

    ok = o.limit(5).withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    engine.upsert("oc", ok)
    assert engine.table("oc").count() == n0

    # constraint round-trips through the manifest
    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    with _pt.raises(ConstraintViolationError):
        e2.insert("oc", bad)


def test_check_constraint_null_passes(spark, tmp_path):
    """SQL CHECK semantics: a NULL-evaluating constraint expression
    PASSES — on add_constraint's existing-data scan AND on writes (they
    must agree, else a table accepted at add time becomes unwritable)."""
    from polars_lake_spark.engine import ConstraintViolationError  # noqa: F401

    df = spark.createDataFrame([(1, 10.0), (2, None)], "k int, amount double")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("nc", df, keys=["k"])
    engine.add_constraint("nc", "pos", "amount > 0")  # NULL row passes
    # upserting the same NULL row back must also pass
    engine.upsert("nc", df.filter(F.col("amount").isNull()))
    assert engine.table("nc").count() == 2


def test_meta_count_fast_path(spark, tmp_path):
    """SELECT COUNT(*) FROM t answers from parquet footers (DV-aware) —
    name and value identical to the vanilla plan, no table scan."""
    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(100)], "id bigint, p bigint"
    )
    eng.create_table("mc", df, keys=["id"], versioned=True,
                     deletion_vectors=True)
    out = eng.sql("SELECT COUNT(*) FROM mc")
    assert out.columns == ["count(1)"] and out.head()[0] == 100
    # Spark's own plan would name it the same way
    assert spark.sql("SELECT COUNT(*) FROM mc").columns == out.columns
    assert eng.sql("SELECT count(1) AS n FROM mc").head().n == 100
    # DV-aware: sparse delete changes the metadata count
    eng.delete_where_dv("mc", "id < 10")
    assert eng.sql("SELECT COUNT(*) FROM mc").head()[0] == 90
    # the fast path never launched a scan stage: plan is a LocalTableScan
    plan = (
        eng.sql("SELECT COUNT(*) FROM mc")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FileScan" not in plan
    # WHERE and other shapes fall through to vanilla (and stay correct)
    assert eng.sql("SELECT COUNT(*) FROM mc WHERE id >= 50").head()[0] == 50
    # in-memory tables fall through
    eng.create_table("mem", df, save=False)
    assert eng.sql("SELECT COUNT(*) FROM mem").head()[0] == 100


def test_fragmentation_report(spark, tmp_path):
    """Metadata-only maintenance advisor: small-file and DV-sidecar
    accumulation is visible without a scan, and the recommendation
    clears after the suggested maintenance."""
    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id bigint, v double"
    )
    eng.create_table("fr", df, keys=["id"], versioned=True,
                     deletion_vectors=True)
    r0 = eng.fragmentation_report("fr")
    assert r0["files"] > 0 and r0["bytes_total"] > 0
    assert r0["small_files"] == r0["files"]  # tiny test files
    assert r0["recommend"] == "compact"
    # 5 sparse deletes -> 5 sidecars -> compact_dvs takes priority
    for i in range(5):
        eng.delete_where_dv("fr", f"id = {i}")
    r1 = eng.fragmentation_report("fr")
    assert r1["dv_sidecars"] == 5 and r1["dv_rows"] == 5
    assert r1["recommend"] == "compact_dvs"
    eng.compact_dvs("fr")
    r2 = eng.fragmentation_report("fr")
    assert r2["dv_sidecars"] == 1 and r2["recommend"] == "compact"
    # unversioned tables report files only
    eng.create_table("fr2", df)
    r3 = eng.fragmentation_report("fr2")
    assert r3["write_dirs"] is None and r3["dv_sidecars"] == 0


def test_convert_to_versioned_in_place(spark, tmp_path):
    """CONVERT TO VERSIONED adopts a plain parquet table into the
    snapshot layer by MOVING files (no rewrite): same bytes on disk,
    version 1 time-travels, zone maps collected for the adopted dir,
    and the converted table takes snapshot DML + deletion vectors."""
    import glob
    import os

    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    df = spark.range(0, 1000).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 3 AS BIGINT) AS p"
    )
    eng.create_table(
        "ct",
        df.repartitionByRange(4, "id"),
        partition_by=["p"],
        keys=["id"],
    )
    before = {
        os.path.relpath(f, eng._path("ct")): os.path.getmtime(f)
        for f in glob.glob(eng._path("ct") + "/**/*.parquet", recursive=True)
    }
    eng.sql("CONVERT TO VERSIONED ct")
    spec = eng.specs["ct"]
    assert spec.versioned
    assert eng.table_info("ct")["version"] == 1
    assert eng.table("ct").count() == 1000
    # files moved under data/w000001, byte-identical (mtimes preserved)
    after = {
        os.path.relpath(f, eng._path("ct") + "/data/w000001"):
            os.path.getmtime(f)
        for f in glob.glob(
            eng._path("ct") + "/data/w000001/**/*.parquet", recursive=True
        )
    }
    assert after == before and len(after) > 0
    # zone maps were collected for the adopted dir
    assert os.path.isfile(
        eng._path("ct") + "/data/w000001/_zonemap.json"
    )
    out = eng.scan_where("ct", "id = 500")
    assert [r.v for r in out.collect()] == [1000]
    assert eng.last_scan_report["files_kept"] < eng.last_scan_report["files_total"]
    # snapshot DML + time travel from here on
    eng.sql("UPDATE ct SET v = -1 WHERE id = 500")
    assert eng.table("ct", version=1).filter("id = 500").head().v == 1000
    eng.sql("ALTER TABLE ct SET TBLPROPERTIES ('deletion_vectors'='true')")
    assert eng.delete_where_dv("ct", "id < 10") == 10
    assert eng.table("ct").count() == 990
    # a fresh engine loads the converted table
    eng2 = Engine(spark, str(tmp_path))
    eng2.load_all()
    assert eng2.specs["ct"].versioned and eng2.table("ct").count() == 990
    with pytest.raises(ValueError, match="already versioned"):
        eng.convert_to_versioned("ct")
    eng.create_table("mem", df, save=False)
    with pytest.raises(ValueError, match="on-disk"):
        eng.convert_to_versioned("mem")


def test_alter_table_cluster_by(spark, tmp_path):
    """ALTER TABLE ... CLUSTER BY re-declares the clustering key: the
    NEXT write range-clusters on it (tight zone maps from ingest);
    CLUSTER BY NONE resets; layout overlap and unknown columns refuse."""
    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce_key, "false")
    try:
        df = spark.range(0, 2000).selectExpr("id", "id * 2 AS v")
        eng.create_table("cl", df.repartition(8), keys=["id"], versioned=True)
        eng.sql("ALTER TABLE cl CLUSTER BY (v)")
        assert eng.specs["cl"].cluster_by == ["v"]
        eng.insert(
            "cl",
            spark.range(2000, 4000).selectExpr("id", "id * 2 AS v")
            .repartition(8),
        )
        # the clustered second write prunes on v; the hash-scattered
        # first write keeps all its files (conservative)
        eng.scan_where("cl", "v BETWEEN 4000 AND 4100").collect()
        rep = dict(eng.last_scan_report)
        assert rep["files_kept"] < rep["files_total"]
        eng.sql("ALTER TABLE cl CLUSTER BY NONE")
        assert eng.specs["cl"].cluster_by == []
        with pytest.raises(ValueError, match="not in data"):
            eng.sql("ALTER TABLE cl CLUSTER BY (nope)")
        eng.create_table("plain", df)
        with pytest.raises(ValueError, match="versioned"):
            eng.sql("ALTER TABLE plain CLUSTER BY (v)")
    finally:
        spark.conf.set(coalesce_key, "true")


def test_vacuum_dry_run(spark, tmp_path):
    """VACUUM ... DRY RUN reports removable dirs/versions without
    touching disk; the real vacuum then removes exactly those."""
    import glob

    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    eng.create_table("vd", df, keys=["id"], versioned=True)
    eng.overwrite("vd", df.selectExpr("id", "v + 1 AS v"))
    eng.overwrite("vd", df.selectExpr("id", "v + 2 AS v"))
    dirs_before = sorted(glob.glob(eng._path("vd") + "/data/w*"))
    st = eng.sql("VACUUM vd RETAIN 1 DRY RUN").head()
    assert st.operation == "vacuum_dry_run" and st.n_affected == 2
    # nothing was deleted; time travel still works
    assert sorted(glob.glob(eng._path("vd") + "/data/w*")) == dirs_before
    assert eng.table("vd", version=1).filter("id = 0").head().v == 0
    # the real vacuum removes exactly what the dry run reported
    st2 = eng.sql("VACUUM vd RETAIN 1").head()
    assert st2.operation == "vacuum" and st2.n_affected == 2
    assert len(glob.glob(eng._path("vd") + "/data/w*")) == 1


def test_minmax_meta_fast_path(spark, tmp_path):
    """SELECT MIN(c), MAX(c) FROM t answers from sidecar metadata when
    exactness is provable — and falls back (correctly) on strings,
    NaN-poisoned floats, and live deletion vectors."""
    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    rows = [(i, float(i) * 1.5, f"s{i:04d}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, v double, s string")
    eng.create_table(
        "mm", df.repartitionByRange(4, "id"), keys=["id"], versioned=True,
        deletion_vectors=True,
    )
    assert eng.minmax_meta("mm", "id") == (0, 999)
    assert eng.minmax_meta("mm", "v") == (0.0, 1498.5)
    assert eng.minmax_meta("mm", "s") is None  # strings never metadata
    out = eng.sql("SELECT MIN(id), MAX(id) FROM mm")
    assert out.columns == ["min(id)", "max(id)"]
    assert tuple(out.head()) == (0, 999)
    assert out.columns == spark.sql("SELECT MIN(id), MAX(id) FROM mm").columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert eng.sql("SELECT MAX(v) AS hi FROM mm").head().hi == 1498.5
    # mixed columns in one statement
    r = eng.sql("SELECT MIN(v), MAX(id) FROM mm").head()
    assert (r[0], r[1]) == (0.0, 999)
    # strings fall back to the vanilla plan, still correct
    assert eng.sql("SELECT MIN(s) FROM mm").head()[0] == "s0000"
    # a NaN row poisons that file's float stats -> metadata refuses
    eng.insert(
        "mm",
        spark.createDataFrame(
            [(5000, float("nan"), "x")], "id bigint, v double, s string"
        ),
    )
    assert eng.minmax_meta("mm", "v") is None
    assert eng.minmax_meta("mm", "id") == (0, 5000)  # id stats intact
    # live DVs disable the metadata path (the extreme may be deleted)
    eng.delete_where_dv("mm", "id = 5000")
    assert eng.minmax_meta("mm", "id") is None
    assert eng.sql("SELECT MAX(id) FROM mm").head()[0] == 999  # vanilla


def test_describe_detail(spark, tmp_path):
    """DESCRIBE DETAIL: one metadata-only row of physical-layout facts
    (Delta parity) wired to fragmentation_report."""
    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    df = spark.range(0, 200).selectExpr("id", "id * 2 AS v")
    eng.create_table(
        "dd", df, keys=["id"], versioned=True, deletion_vectors=True,
        cluster_by=["v"],
    )
    eng.delete_where_dv("dd", "id < 5")
    r = eng.sql("DESCRIBE DETAIL dd").head()
    assert r.name == "dd" and r.versioned and r.format == "parquet"
    assert r.num_files > 0 and r.size_bytes > 0
    assert r.dv_sidecars == 1 and r.dv_rows == 5
    assert r.cluster_by == "v" and r.partition_by is None
    assert r.recommend in ("ok", "compact", "compact_dvs")
    # unknown tables fall through to spark.sql's error
    import pytest as _pt
    with _pt.raises(Exception):
        eng.sql("DESCRIBE DETAIL nope").collect()


def test_convert_to_versioned_rolls_back_late_failures(spark, tmp_path):
    """A failure AFTER the file moves (snapshot commit, manifest write)
    must also roll the adoption back: the files return to the plain
    path, no snapshot survives, the in-memory spec is un-flipped, and a
    FRESH engine still reads the full plain table (ADVICE r10 — the
    half-converted state read back EMPTY after a restart)."""
    import glob
    import os

    from polars_lake_spark import Engine
    from polars_lake_spark.snapshots import SnapshotStore

    eng = Engine(spark, str(tmp_path))
    df = spark.range(0, 500).selectExpr("id", "id * 2 AS v")
    eng.create_table("cv", df.repartition(3), keys=["id"])
    files_before = sorted(
        os.path.relpath(f, eng._path("cv"))
        for f in glob.glob(eng._path("cv") + "/*.parquet")
    )
    for fail_at in ("commit_write", "_write_manifest"):
        if fail_at == "commit_write":
            orig = SnapshotStore.commit_write

            def boom(self, *a, **k):
                raise RuntimeError("injected commit failure")

            SnapshotStore.commit_write = boom
        else:
            orig = Engine._write_manifest

            def boom(self, spec):
                raise RuntimeError("injected manifest failure")

            Engine._write_manifest = boom
        try:
            with pytest.raises(RuntimeError, match="injected"):
                eng.convert_to_versioned("cv")
        finally:
            if fail_at == "commit_write":
                SnapshotStore.commit_write = orig
            else:
                Engine._write_manifest = orig
        spec = eng.specs["cv"]
        assert not spec.versioned
        assert sorted(
            os.path.relpath(f, eng._path("cv"))
            for f in glob.glob(eng._path("cv") + "/*.parquet")
        ) == files_before
        assert eng._snapstore("cv").versions() == []
        assert eng.table("cv").count() == 500
        # the restart view: a fresh engine reads the intact plain table
        eng2 = Engine(spark, str(tmp_path))
        eng2.load_all()
        assert not eng2.specs["cv"].versioned
        assert eng2.table("cv").count() == 500
    # the rolled-back table is still convertible, and the retry works
    eng.convert_to_versioned("cv")
    assert eng.specs["cv"].versioned
    assert eng.table_info("cv")["version"] == 1
    assert eng.table("cv").count() == 500


def _dv_state(eng, name):
    snap = eng._snapstore(name).load()
    return (
        len((snap.meta or {}).get("dv") or []),
        int((snap.meta or {}).get("dv_rows", 0)),
    )


def test_auto_optimize_dv_threshold(spark, tmp_path):
    """VERDICT r10 #5: N sparse DV deletes -> auto-compact fires ONCE at
    the threshold and folds the sidecar union back to one; results and
    row counts unchanged; the policy persists across an engine reopen."""
    eng = Engine(spark, str(tmp_path))
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    eng.create_table(
        "t", df, keys=["k"], versioned=True, deletion_vectors=True
    )
    eng.set_auto_optimize("t", dv_sidecars=4)
    for i in range(3):
        eng.delete_keys_dv(
            "t", spark.createDataFrame([(i,)], "k bigint"), ["k"]
        )
    assert _dv_state(eng, "t")[0] == 3  # below threshold: untouched
    assert eng.last_auto_optimize is None
    eng.delete_keys_dv(
        "t", spark.createDataFrame([(3,)], "k bigint"), ["k"]
    )
    # the 4th sidecar crossed the line: folded to ONE, refs intact
    n_dv, n_refs = _dv_state(eng, "t")
    assert (n_dv, n_refs) == (1, 4)
    assert eng.last_auto_optimize["action"] == "compact_dvs"
    assert eng.last_auto_optimize["trigger"] == "dv_sidecars"
    info = eng.table_info("t")
    assert info["auto_optimize"] == {"dv_sidecars": 4}
    assert info["last_auto_optimize"]["action"] == "compact_dvs"
    assert eng.table("t").count() == 196
    assert eng.table("t").filter("k < 4").count() == 0
    # policy survives a fresh engine (manifest round-trip)
    eng2 = Engine(spark, str(tmp_path))
    eng2.load_table("t")
    assert eng2.specs["t"].auto_optimize == {"dv_sidecars": 4}
    # disable clears and persists
    eng2.set_auto_optimize("t", None)
    eng3 = Engine(spark, str(tmp_path))
    eng3.load_table("t")
    assert eng3.specs["t"].auto_optimize is None


def test_auto_optimize_write_dirs_threshold(spark, tmp_path):
    """Micro-batch append buildup: when the write-dir fan-out reaches
    the threshold, a FULL compact runs once (also folding DVs) and the
    fan-out collapses; rows unchanged."""
    eng = Engine(spark, str(tmp_path))
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    eng.create_table("t", df, keys=["k"], versioned=True)
    eng.set_auto_optimize("t", write_dirs=5)
    for i in range(4):
        eng.insert(
            "t",
            spark.range(100 + 10 * i, 110 + 10 * i).select(
                F.col("id").alias("k")
            ),
        )
    snap = eng._snapstore("t").load()
    dirs = {w for ws in snap.mapping.values() for w in ws}
    assert len(dirs) == 1  # 5th dir triggered the compaction
    assert eng.last_auto_optimize["action"] == "compact"
    assert eng.table("t").count() == 90
    # a policy on an unversioned table is rejected
    eng.create_table("p", df, keys=["k"])
    with pytest.raises(ValueError, match="versioned"):
        eng.set_auto_optimize("p", dv_sidecars=4)


def test_auto_optimize_via_tblproperties(spark, tmp_path):
    """SQL surface: ALTER TABLE SET TBLPROPERTIES wires the same policy
    (integer thresholds, 'none' clears), and SHOW-style status rows
    come back."""
    eng = Engine(spark, str(tmp_path))
    df = spark.range(0, 20).select(F.col("id").alias("k"))
    eng.create_table(
        "t", df, keys=["k"], versioned=True, deletion_vectors=True
    )
    eng.sql(
        "ALTER TABLE t SET TBLPROPERTIES ('auto_optimize.dv_sidecars'='2')"
    )
    assert eng.specs["t"].auto_optimize == {"dv_sidecars": 2}
    eng.sql(
        "ALTER TABLE t SET TBLPROPERTIES ('auto_optimize.write_dirs'='6')"
    )
    assert eng.specs["t"].auto_optimize == {"dv_sidecars": 2, "write_dirs": 6}
    eng.sql(
        "ALTER TABLE t SET TBLPROPERTIES ('auto_optimize.dv_sidecars'='none')"
    )
    assert eng.specs["t"].auto_optimize == {"write_dirs": 6}
    with pytest.raises(ValueError, match="integer threshold"):
        eng.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('auto_optimize.dv_sidecars'='maybe')"
        )
    # the DV path triggers through the SQL-configured policy too
    eng.sql(
        "ALTER TABLE t SET TBLPROPERTIES ('auto_optimize.write_dirs'='none')"
    )
    eng.sql(
        "ALTER TABLE t SET TBLPROPERTIES ('auto_optimize.dv_sidecars'='2')"
    )
    eng.sql("DELETE FROM t WHERE k = 1")
    eng.sql("DELETE FROM t WHERE k = 2")
    n_dv, _ = _dv_state(eng, "t")
    assert n_dv == 1 and eng.last_auto_optimize["action"] == "compact_dvs"
    assert eng.table("t").count() == 18


def test_meta_counts_uri_escaped_partition_dirs(spark, tmp_path):
    """Regression (r11): DV sidecar refs store _metadata.file_path as a
    URI (%20 for spaces), so matching them against raw os paths MISSES
    every ref under an escaped partition dir — metadata counts then
    silently over-count the DV-deleted rows there. The decode-side fix
    must make meta_row_count, the COUNT(*) fast path, and
    partition_counts agree with real scans on space-carrying partition
    values."""
    eng = Engine(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, "NOT SPECIFIED" if i % 2 else "A B C", i * 2) for i in range(40)],
        "k bigint, p string, v bigint",
    )
    eng.create_table(
        "t", df, keys=["k"], partition_by=["p"],
        versioned=True, deletion_vectors=True,
    )
    eng.delete_where_dv("t", "k < 10")
    real = eng.table("t").count()
    assert real == 30
    assert eng.meta_row_count("t") == real
    assert eng.sql("SELECT COUNT(*) FROM t").head()[0] == real
    pc = eng.partition_counts("t")
    assert sum(pc.values()) == real
    want = {
        r.p: r.n
        for r in eng.table("t")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    from polars_lake_spark.layout import parse_hive_relpath

    got = {}
    for rel, n in pc.items():
        got[parse_hive_relpath(rel)["p"]] = got.get(
            parse_hive_relpath(rel)["p"], 0
        ) + n
    assert got == want


def test_partition_grouped_count_fast_path(spark, tmp_path, sf_dir):
    """VERDICT r10 #6: SELECT <partition cols>, COUNT(*) GROUP BY them
    answers from partition_counts — no FileScan, values and dtypes
    identical to the vanilla plan, DV-aware; non-partition groupings
    and WHERE shapes fall through."""
    eng = Engine(spark, str(tmp_path))
    orders = load_table(spark, sf_dir, "orders")
    eng.create_table(
        "o", orders, keys=["o_orderkey"], partition_by=["o_orderpriority"],
        versioned=True, deletion_vectors=True,
    )
    eng.sql("DELETE FROM o WHERE o_orderkey % 10 = 3")
    fast = eng.sql(
        "SELECT o_orderpriority, COUNT(*) AS cnt FROM o "
        "GROUP BY o_orderpriority"
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Exchange" not in plan
    want = (
        eng.table("o")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, want.collect())
    )
    # names + types match the vanilla plan (nullability flags differ on
    # driver-local frames, as with the other metadata fast paths)
    assert [(f.name, f.dataType) for f in fast.schema] == [
        (f.name, f.dataType) for f in want.schema
    ]
    # default output column matches Spark's own naming
    f2 = eng.sql(
        "select O_ORDERPRIORITY, count(1) from o group by o_orderpriority"
    )
    assert f2.columns == ["o_orderpriority", "count(1)"]
    # fall-throughs: non-partition column, WHERE, extra select item
    for q in (
        "SELECT o_orderstatus, COUNT(*) AS c FROM o GROUP BY o_orderstatus",
        "SELECT o_orderpriority, COUNT(*) AS c FROM o WHERE o_orderkey > 5 "
        "GROUP BY o_orderpriority",
    ):
        p = eng.sql(q)._jdf.queryExecution().executedPlan().toString()
        assert "FileScan" in p, q
    # SHOW PARTITIONS carries the same metadata rows
    sp = {r.partition: r.rows for r in eng.sql("SHOW PARTITIONS o").collect()}
    assert sum(sp.values()) == eng.table("o").count()


def test_partition_predicate_count_fast_path(spark, tmp_path, sf_dir):
    """r11: COUNT(*) WHERE <partition-only pred> and partition-grouped
    counts WITH a partition-only WHERE answer from the metadata rollup —
    no FileScan, no Exchange, no Join in the returned plan; predicates
    touching data columns, subqueries, or nondeterministic expressions
    fall through; string literals containing keywords don't break the
    slicing (the r10 masked-span lesson, pinned here for these
    matchers)."""
    eng = Engine(spark, str(tmp_path))
    orders = load_table(spark, sf_dir, "orders")
    eng.create_table(
        "o", orders, keys=["o_orderkey"], partition_by=["o_orderpriority"],
        versioned=True, deletion_vectors=True,
    )
    eng.sql("DELETE FROM o WHERE o_orderkey % 10 = 3")
    eng.table("o").createOrReplaceTempView("vo_pred")

    def run(q):
        df = eng.sql(q)
        p = df._jdf.queryExecution().executedPlan().toString()
        local = (
            "FileScan" not in p and "Exchange" not in p and "Join" not in p
        )
        got = sorted(tuple(r) for r in df.collect())
        want = sorted(
            tuple(r)
            for r in spark.sql(q.replace("FROM o", "FROM vo_pred")).collect()
        )
        assert got == want, q
        return local

    assert run("SELECT COUNT(*) FROM o WHERE o_orderpriority = '1-URGENT'")
    assert run(
        "SELECT COUNT(*) AS n FROM o "
        "WHERE o_orderpriority IN ('2-HIGH', '5-LOW')"
    )
    # trailing literal + keyword inside a literal (masked-span slicing)
    assert run(
        "SELECT COUNT(*) AS n FROM o WHERE o_orderpriority LIKE 'GROUP BY%'"
    )
    # zero matches -> 0, not NULL
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM o WHERE o_orderpriority = 'absent'"
    ).head().n == 0
    # grouped + WHERE
    assert run(
        "SELECT o_orderpriority, COUNT(*) AS c FROM o "
        "WHERE o_orderpriority <> '2-HIGH' GROUP BY o_orderpriority"
    )
    # fall-throughs stay correct on the vanilla/zone-map paths
    assert not run(
        "SELECT o_orderpriority, COUNT(*) AS c FROM o "
        "WHERE o_orderkey > 5 GROUP BY o_orderpriority"
    )
    assert not run(
        "SELECT COUNT(*) AS n FROM o WHERE o_orderpriority IN "
        "(SELECT o_orderpriority FROM vo_pred)"
    )


def test_partition_rollup_typed_and_null_partitions(spark, tmp_path):
    """The rollup's relpath->typed-value round-trip must survive what
    hive naming throws at it: NULL partitions (__HIVE_DEFAULT_PARTITION__),
    values hive percent-escapes (':', '#'), spaces and quotes, and
    non-string partition dtypes (int, date) that come back through
    casts."""
    import datetime

    eng = Engine(spark, str(tmp_path))
    rows = [
        (1, "has space", 7, datetime.date(2024, 1, 2)),
        (2, "colon:hash#", 7, datetime.date(2024, 1, 2)),
        (3, None, 8, datetime.date(2024, 3, 4)),
        (4, "quo'te", 8, datetime.date(2024, 3, 4)),
        (5, "has space", 9, None),
    ]
    df = spark.createDataFrame(
        rows, "k bigint, p string, q int, d date"
    )
    eng.create_table(
        "t", df, keys=["k"], partition_by=["p", "q", "d"],
        versioned=True, deletion_vectors=True,
    )
    eng.table("t").createOrReplaceTempView("vt_typed")

    def run(q):
        key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
        got = sorted((tuple(r) for r in eng.sql(q).collect()), key=key)
        want = sorted(
            (
                tuple(r)
                for r in spark.sql(
                    q.replace("FROM t", "FROM vt_typed")
                ).collect()
            ),
            key=key,
        )
        assert got == want, q
        p = eng.sql(q)._jdf.queryExecution().executedPlan().toString()
        assert "FileScan" not in p, q

    run("SELECT p, q, d, COUNT(*) AS c FROM t GROUP BY p, q, d")
    run("SELECT COUNT(*) FROM t WHERE p = 'has space'")
    run("SELECT COUNT(*) FROM t WHERE p IS NULL")
    run("SELECT COUNT(*) FROM t WHERE q > 7 AND d = DATE'2024-03-04'")
    run("SELECT COUNT(*) FROM t WHERE p = 'quo''te'")
    run("SELECT COUNT(*) FROM t WHERE d IS NULL")
    # DV delete inside an escaped partition still reconciles (the
    # comparison view is snapshot-pinned — re-register post-delete)
    eng.delete_where_dv("t", "k = 1")
    eng.table("t").createOrReplaceTempView("vt_typed")
    run("SELECT COUNT(*) FROM t WHERE p = 'has space'")
    run("SELECT p, q, d, COUNT(*) AS c FROM t GROUP BY p, q, d")
    sp = eng.sql("SHOW PARTITIONS t").collect()
    assert sum(r.rows for r in sp) == eng.table("t").count()


def test_minmax_meta_partition_predicate(spark, tmp_path, sf_dir):
    """r11: MIN/MAX WHERE <partition-only pred> answers from the sidecar
    walk restricted to the satisfying partitions' files — no FileScan,
    values identical to the vanilla plan; empty partition sets, data
    columns, and DV-carrying tables fall through."""
    eng = Engine(spark, str(tmp_path))
    orders = load_table(spark, sf_dir, "orders")
    eng.create_table(
        "o", orders, keys=["o_orderkey"], partition_by=["o_orderpriority"],
        versioned=True, deletion_vectors=True,
    )
    eng.table("o").createOrReplaceTempView("vo_mmp")

    def run(q, expect_local):
        df = eng.sql(q)
        local = (
            "FileScan"
            not in df._jdf.queryExecution().executedPlan().toString()
        )
        a = [tuple(r) for r in df.collect()]
        b = [
            tuple(r)
            for r in spark.sql(q.replace("FROM o", "FROM vo_mmp")).collect()
        ]
        assert a == b, q
        assert local == expect_local, q

    run(
        "SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM o "
        "WHERE o_orderpriority = '1-URGENT'",
        True,
    )
    run(
        "SELECT MAX(o_totalprice) AS hi FROM o "
        "WHERE o_orderpriority IN ('2-HIGH', '5-LOW')",
        True,
    )
    # empty partition set and data-column predicates fall through
    run(
        "SELECT MIN(o_orderkey) AS lo FROM o "
        "WHERE o_orderpriority = 'absent'",
        False,
    )
    run(
        "SELECT MIN(o_orderkey) AS lo FROM o WHERE o_totalprice > 0",
        False,
    )
    # live DVs disqualify the exact-extreme path entirely
    eng.sql("DELETE FROM o WHERE o_orderkey % 10 = 3")
    eng.table("o").createOrReplaceTempView("vo_mmp")
    run(
        "SELECT MIN(o_orderkey) AS lo FROM o "
        "WHERE o_orderpriority = '1-URGENT'",
        False,
    )
