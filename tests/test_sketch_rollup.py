"""Engine-level HLL sketch rollup: per-segment sketches maintained from
the change feed; distinct-over-any-segment-subset answered from sketch
rows only."""

import pytest
from pyspark.sql import functions as F

from polars_lake_spark import Engine


@pytest.fixture
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def _rows(spark, pairs):
    # (segment, user) rows with an id so upsert/delete can target them
    return spark.createDataFrame(
        [(i, s, u) for i, (s, u) in enumerate(pairs)],
        "id long, seg string, user long",
    )


def _exact(df, pred=None):
    if pred:
        df = df.filter(pred)
    return df.select("user").distinct().count()


def test_rollup_matches_exact_and_append_refresh(engine, spark):
    base = [("a", u) for u in range(50)] + [("b", u) for u in range(30, 80)]
    src = _rows(spark, base)
    engine.create_table("ev", src, keys=["id"], versioned=True)
    engine.create_sketch_rollup("ev_sk", "ev", ["seg"], "user")
    # estimates from sketch rows only, per segment and overall
    for pred, want in (
        ("seg = 'a'", 50),
        ("seg = 'b'", 50),
        (None, _exact(engine.table("ev"))),
    ):
        row = engine.approx_distinct_over("ev_sk", pred).head()
        assert abs(row.approx_distinct - want) <= max(3, 0.07 * want)
    assert engine.approx_distinct_over("ev_sk", "seg = 'a'").head().rows == 50

    # append-only refresh: new segment + growth of an old one
    extra = spark.createDataFrame(
        [(1000 + i, s, u) for i, (s, u) in enumerate(
            [("a", u) for u in range(200, 240)] + [("c", u) for u in range(5)]
        )],
        "id long, seg string, user long",
    )
    engine.insert("ev", extra)
    out = engine.refresh_sketch_rollup("ev_sk")
    assert out["refreshed"]
    row = engine.approx_distinct_over("ev_sk", "seg = 'a'").head()
    assert abs(row.approx_distinct - 90) <= 7 and row.rows == 90
    assert engine.approx_distinct_over("ev_sk", "seg = 'c'").head().rows == 5
    # idempotent when current
    assert engine.refresh_sketch_rollup("ev_sk")["refreshed"] is False


def test_rollup_rebuilds_destructive_segments(engine, spark):
    src = _rows(spark, [("a", u) for u in range(40)] + [("b", u) for u in range(20)])
    engine.create_table("ev", src, keys=["id"], versioned=True)
    engine.create_sketch_rollup("ev_sk", "ev", ["seg"], "user")
    # delete 30 of segment a's rows; b untouched
    engine.delete("ev", spark.createDataFrame([(i,) for i in range(30)], "id long"))
    out = engine.refresh_sketch_rollup("ev_sk")
    assert out["refreshed"]
    row = engine.approx_distinct_over("ev_sk", "seg = 'a'").head()
    assert row.rows == 10 and abs(row.approx_distinct - 10) <= 2
    assert engine.approx_distinct_over("ev_sk", "seg = 'b'").head().rows == 20

    # a segment deleted entirely disappears from the rollup
    engine.delete(
        "ev", spark.createDataFrame([(i,) for i in range(30, 40)], "id long")
    )
    engine.refresh_sketch_rollup("ev_sk")
    segs = {r.seg for r in engine.table("ev_sk").collect()}
    assert segs == {"b"}


def test_rollup_segment_moving_update_rebuilds_both(engine, spark):
    """An upsert that moves rows from segment a to segment b must rebuild
    BOTH segments (the old one lost rows HLL cannot forget)."""
    src = _rows(spark, [("a", u) for u in range(30)] + [("b", 100 + u) for u in range(10)])
    engine.create_table("ev", src, keys=["id"], versioned=True)
    engine.create_sketch_rollup("ev_sk", "ev", ["seg"], "user")
    moved = spark.createDataFrame(
        [(i, "b", i) for i in range(20)], "id long, seg string, user long"
    )
    engine.upsert("ev", moved)
    engine.refresh_sketch_rollup("ev_sk")
    a = engine.approx_distinct_over("ev_sk", "seg = 'a'").head()
    b = engine.approx_distinct_over("ev_sk", "seg = 'b'").head()
    assert a.rows == 10 and abs(a.approx_distinct - 10) <= 2
    assert b.rows == 30 and abs(b.approx_distinct - 30) <= 3


def test_rollup_null_segment_is_first_class(engine, spark):
    """NULL is a legal segment value: its sketch row exists, appends fold
    into it, and a delete in the NULL segment rebuilds it (null-safe
    joins throughout)."""
    rows = [(0, None, 1), (1, None, 2), (2, "a", 3)]
    src = spark.createDataFrame(rows, "id long, seg string, user long")
    engine.create_table("ev", src, keys=["id"], versioned=True)
    engine.create_sketch_rollup("ev_sk", "ev", ["seg"], "user")
    row = engine.approx_distinct_over("ev_sk", "seg IS NULL").head()
    assert row.rows == 2 and row.approx_distinct == 2
    # append into the NULL segment (non-destructive path)
    engine.insert(
        "ev", spark.createDataFrame([(10, None, 9)], "id long, seg string, user long")
    )
    engine.refresh_sketch_rollup("ev_sk")
    row = engine.approx_distinct_over("ev_sk", "seg IS NULL").head()
    assert row.rows == 3 and row.approx_distinct == 3
    assert engine.table("ev_sk").filter("seg IS NULL").count() == 1  # no dup row
    # delete from the NULL segment (destructive rebuild path)
    engine.delete("ev", spark.createDataFrame([(0,), (1,)], "id long"))
    engine.refresh_sketch_rollup("ev_sk")
    row = engine.approx_distinct_over("ev_sk", "seg IS NULL").head()
    assert row.rows == 1 and row.approx_distinct == 1
