"""as-of join semantics: backward match, exact-tie inclusive, groups
isolated, left rows without a match keep NULLs."""

import pyspark.sql.functions as F

from polars_lake_spark.operators.asof import asof_join


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 15, "e"), (2, 5, "c"), (3, 7, "d")],
        "k int, ts int, lv string",
    )
    right = spark.createDataFrame(
        [(1, 8, "x"), (1, 15, "y"), (2, 9, "z")], "k int, ts int, rv string"
    )
    out = asof_join(left, right, on="ts", by=["k"])
    got = {(r.k, r.ts): r.rv_right for r in out.collect()}
    assert got == {
        (1, 10): "x",  # most recent prior
        (1, 15): "y",  # exact tie is inclusive ("at or before")
        (1, 20): "y",
        (2, 5): None,  # right exists later only → no match
        (3, 7): None,  # group absent from right
    }
    assert out.count() == left.count()


def test_scd2_asof_join_model(spark):
    """Point-in-time join vs hand-built history: seed versions (NULL
    start), mid-chain versions, delete gaps (NULL dim columns), current
    versions (NULL end), unknown keys, NULL fact sequences (-inf ->
    seed), fact AT a version start (validity [start, end)), and a
    version with a legitimately NULL value column (the struct carry
    must not backfill it from the prior version)."""
    from polars_lake_spark.operators.asof import scd2_asof_join

    dim = spark.createDataFrame(
        [
            # key 1: seed -> v-a (value NULL!) -> deleted -> v-b current
            (1, "seed1", None, 100),
            (1, None, 100, 150),       # NULL value column on purpose
            (1, "v1-b", 300, None),
            # key 2: seed only, never changed
            (2, "seed2", None, None),
        ],
        "k bigint, s string, __start_seq bigint, __end_seq bigint",
    )
    facts = spark.createDataFrame(
        [
            (1, 1, 50),     # inside seed
            (2, 1, 100),    # AT v-a start: sees v-a (NULL value)
            (3, 1, 200),    # delete gap: no version
            (4, 1, 300),    # AT v-b start
            (5, 1, 999),    # current
            (6, 2, 500),    # seed, open forever
            (7, 9, 100),    # unknown key
            (8, 1, None),   # NULL seq = -inf -> seed
        ],
        "fid bigint, k bigint, seq bigint",
    )
    got = {
        r.fid: r.s_dim
        for r in scd2_asof_join(facts, dim, ["k"], "seq").collect()
    }
    assert got == {
        1: "seed1",
        2: None,   # v-a matched, its value IS null (not backfilled)
        3: None,   # gap
        4: "v1-b",
        5: "v1-b",
        6: "seed2",
        7: None,
        8: "seed1",
    }
    # fid 2 vs fid 3 both None — disambiguate: at 140 (inside v-a,
    # value NULL) vs at 200 (gap). Both None in s_dim by DIFFERENT
    # causes; pin the gap by count of matched rows when selecting a
    # non-null version marker
    dim2 = dim.withColumn("marker", F.lit("M"))
    got2 = {
        r.fid: r.marker_dim
        for r in scd2_asof_join(facts, dim2, ["k"], "seq").collect()
    }
    assert got2[2] == "M" and got2[3] is None  # matched vs gap
    # layout independence
    got7 = {
        r.fid: r.s_dim
        for r in scd2_asof_join(
            facts.repartition(5), dim.repartition(3), ["k"], "seq"
        ).collect()
    }
    assert got7 == got
    # suffix collision raises
    bad = facts.withColumn("s_dim", F.lit("x"))
    import pytest as _pt

    with _pt.raises(ValueError, match="collide"):
        scd2_asof_join(bad, dim, ["k"], "seq")


def test_scd2_asof_join_plan_one_shuffle_no_join(spark):
    """The stated 100 TB shape must be the real plan: NO join operator
    anywhere (the union+window formulation), exactly one hash exchange
    on the key for the window, and the version struct carried by a
    window frame — dense histories can never explode a range join."""
    from polars_lake_spark.operators.asof import scd2_asof_join

    dim = spark.createDataFrame(
        [(i % 50, f"v{i}", i * 10, i * 10 + 10) for i in range(500)],
        "k bigint, s string, __start_seq bigint, __end_seq bigint",
    )
    facts = spark.createDataFrame(
        [(i, i % 50, i * 7 % 5000) for i in range(1000)],
        "fid bigint, k bigint, seq bigint",
    )
    out = scd2_asof_join(facts, dim, ["k"], "seq")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_scd2_asof_join_reserved_columns_refused(spark):
    """Internal scratch names must be refused, not silently clobbered
    (VERDICT r11 what's-wrong #3): a fact column named __ts/__side/
    __v/__vc/__ok would be overwritten by the union+window machinery and
    echoed back corrupted; a dimension value column named __vend would
    duplicate the carried struct's end-bound field."""
    import pytest

    from polars_lake_spark.operators.asof import scd2_asof_join

    dim = spark.createDataFrame(
        [(1, None, None, "d1")],
        "k int, __start_seq int, __end_seq int, dv string",
    )
    for bad in ("__ts", "__side", "__v", "__vc", "__ok"):
        facts = spark.createDataFrame(
            [(1, 5, "x")], f"k int, s int, {bad} string"
        )
        with pytest.raises(ValueError, match="reserved"):
            scd2_asof_join(facts, dim, keys=["k"], seq_col="s")
    facts = spark.createDataFrame([(1, 5)], "k int, s int")
    bad_dim = spark.createDataFrame(
        [(1, None, None, "d1")],
        "k int, __start_seq int, __end_seq int, __vend string",
    )
    with pytest.raises(ValueError, match="__vend"):
        scd2_asof_join(facts, bad_dim, keys=["k"], seq_col="s")
    # sanity: clean inputs still join
    out = scd2_asof_join(facts, dim, keys=["k"], seq_col="s")
    assert [r.dv_dim for r in out.collect()] == ["d1"]
