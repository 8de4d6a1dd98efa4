"""NULL-keyed change rows through the CDC tier (VERDICT r14 item #5:
NULL keys are allowed END-TO-END under the engine's null-safe key
identity).

The merge/upsert layer matches NULL=NULL (eqNullSafe, documented in
operators/merge.py); the CDC stale-filter and SCD2 watermark joins must
therefore be null-safe too — an ANSI join would silently re-apply stale
NULL-keyed changes or strand NULL-keyed tombstones — and the key-range
probe conjuncts must treat a NULL batch key as un-boundable (stats
ignore NULLs, so pruning on them could hide the NULL-keyed watermark).
"""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark import Engine
from polars_lake_spark.streaming.ingest import (
    apply_changes_batch,
    apply_changes_scd2_batch,
    scd2_current,
    scd2_init,
)


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "w"))


def _t1(eng, spark):
    eng.create_table(
        "t1",
        spark.createDataFrame(
            [(None, "seed-null"), (1, "seed-one")], "k int, v string"
        ),
        keys=["k"],
    )


def test_type1_null_key_upsert_and_stale_filter(eng, spark):
    _t1(eng, spark)
    b1 = spark.createDataFrame(
        [(None, "v@10", "upsert", 10)], "k int, v string, _op string, s int"
    )
    apply_changes_batch(eng, "t1", b1, sequence_by="s")
    got = {r.k: r.v for r in eng.table("t1").select("k", "v").collect()}
    assert got[None] == "v@10" and got[1] == "seed-one"
    # a LATE NULL-keyed change (seq 5 < applied 10) must drop — the
    # stale filter's watermark join has to MATCH the NULL key
    late = spark.createDataFrame(
        [(None, "stale@5", "upsert", 5)], "k int, v string, _op string, s int"
    )
    apply_changes_batch(eng, "t1", late, sequence_by="s")
    got = {r.k: r.v for r in eng.table("t1").select("k", "v").collect()}
    assert got[None] == "v@10", "stale NULL-keyed change re-applied"


def test_type1_null_key_delete_and_tombstone(eng, spark):
    _t1(eng, spark)
    dele = spark.createDataFrame(
        [(None, None, "delete", 20)], "k int, v string, _op string, s int"
    )
    apply_changes_batch(eng, "t1", dele, sequence_by="s")
    got = {r.k: r.v for r in eng.table("t1").select("k", "v").collect()}
    assert None not in got and got[1] == "seed-one"
    # the tombstone must carry the NULL key and block a LATE upsert
    tombs = {r.k for r in eng.table("t1_cdc_tombstones").collect()}
    assert None in tombs
    late = spark.createDataFrame(
        [(None, "zombie@15", "upsert", 15)], "k int, v string, _op string, s int"
    )
    apply_changes_batch(eng, "t1", late, sequence_by="s")
    got = {r.k: r.v for r in eng.table("t1").select("k", "v").collect()}
    assert None not in got, "tombstoned NULL key resurrected"


def test_engine_delete_null_key_is_null_safe(eng, spark):
    eng.create_table(
        "d",
        spark.createDataFrame(
            [(None, "a"), (2, "b"), (3, "c")], "k int, v string"
        ),
        keys=["k"],
    )
    eng.delete("d", spark.createDataFrame([(None,), (3,)], "k int"))
    got = {r.k for r in eng.table("d").collect()}
    assert got == {2}


def test_delete_keys_dv_null_safe(eng, spark):
    eng.create_table(
        "ddv",
        spark.createDataFrame(
            [(None, "a"), (2, "b")], "k int, v string"
        ),
        keys=["k"],
        versioned=True,
        deletion_vectors=True,
    )
    n = eng.delete_keys_dv(
        "ddv", spark.createDataFrame([(None,)], "k int"), ["k"]
    )
    assert n == 1
    assert {r.k for r in eng.table("ddv").collect()} == {2}


def test_scd2_null_key_versions_chain(eng, spark):
    scd2_init(
        eng,
        "h",
        spark.createDataFrame([(None, "v0"), (1, "one")], "k int, v string"),
        keys=["k"],
        versioned=True,
    )
    b = spark.createDataFrame(
        [(None, "v1", "upsert", 10), (None, "v2", "upsert", 20)],
        "k int, v string, _op string, s int",
    )
    apply_changes_scd2_batch(eng, "h", b, "s")
    cur = {r.k: r.v for r in scd2_current(eng, "h").collect()}
    assert cur[None] == "v2" and cur[1] == "one"
    hist = [
        (r["v"], r["__start_seq"], r["__end_seq"])
        for r in eng.table("h")
        .filter("k IS NULL")
        .orderBy(F.asc_nulls_first("__start_seq"))
        .collect()
    ]
    assert hist == [("v0", None, 10), ("v1", 10, 20), ("v2", 20, None)]
    # a late change below the NULL key's watermark drops
    late = spark.createDataFrame(
        [(None, "stale", "upsert", 15)], "k int, v string, _op string, s int"
    )
    apply_changes_scd2_batch(eng, "h", late, "s")
    assert scd2_current(eng, "h").filter("k IS NULL").head().v == "v2"
    assert eng.table("h").filter("k IS NULL").count() == 3
