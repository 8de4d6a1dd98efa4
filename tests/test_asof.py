"""as-of join semantics: backward match, exact-tie inclusive, groups
isolated, left rows without a match keep NULLs."""

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
