"""Misra-Gries heavy hitters: sketch guarantees against an exact Python
model, with capacities small enough that trimming actually fires, and
layout independence under repartitioning."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_lake_spark.operators.heavy import (
    heavy_hitters,
    heavy_hitters_exact_topk,
    mg_sketch_partitions,
)


def _docs(spark, parts=4):
    # Zipf-ish vocabulary: token t{i} appears ~ 400/i times, spread
    # across documents so partition streams interleave tokens.
    rows = []
    toks = []
    for i in range(1, 120):
        toks.extend([f"t{i:03d}"] * (400 // i))
    for d in range(40):
        rows.append((d, " ".join(toks[d::40])))
    return (
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(parts)
    ), Counter(toks)


def test_sketch_guarantees_small_capacity(spark):
    df, true = _docs(spark)
    n = sum(true.values())
    m = 16  # far below the 119-token vocab: trims must fire
    est = {
        r.token: r.est_count for r in heavy_hitters(df, "text", m).collect()
    }
    # marker rows prove trimming happened and bound the subtraction
    sk = mg_sketch_partitions(df, "text", m)
    markers = sk.filter(F.col("token").isNull()).collect()
    assert sum(r.ntok for r in markers) == n
    assert sum(r.cnt for r in markers) > 0  # trims fired
    for tok, e in est.items():
        assert e <= true[tok], f"overcount {tok}"
        assert e >= true[tok] - n / m, f"undercount beyond bound {tok}"
    for tok, c in true.items():
        if c > n / m:
            assert tok in est, f"guaranteed token missing: {tok}"


def test_exact_topk_matches_model(spark):
    df, true = _docs(spark)
    got = [
        (r.token, r.cnt)
        for r in heavy_hitters_exact_topk(df, "text", k=10, capacity=64).collect()
    ]
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_exact_topk_layout_independent(spark):
    df, _ = _docs(spark, parts=3)
    a = heavy_hitters_exact_topk(df, "text", k=10, capacity=64).collect()
    b = heavy_hitters_exact_topk(
        df.repartition(7), "text", k=10, capacity=64
    ).collect()
    assert [(r.token, r.cnt) for r in a] == [(r.token, r.cnt) for r in b]


def _batches(spark, n_batches=3):
    """Split the synthetic corpus into disjoint batches."""
    df, true = _docs(spark)
    return [
        df.filter(F.col("doc_id") % n_batches == i) for i in range(n_batches)
    ], true


def test_incremental_index_guarantees(spark, tmp_path):
    """Folding batches into the persisted index one at a time must keep
    the MG guarantees vs exact counts over EVERYTHING ingested, and the
    observable subtracted total must stay within the theoretical bound."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.heavy import HeavyHittersIndex

    eng = Engine(spark, str(tmp_path))
    idx = HeavyHittersIndex(eng, "vocab", capacity=16)
    idx.create()
    batches, true = _batches(spark)
    n = sum(true.values())
    for i, b in enumerate(batches):
        out = idx.add_batch(b, "text", batch_id=i)
        assert not out["replayed"]
    mk = idx._marker()
    assert mk["ntok"] == n
    assert 0 < mk["cnt"] <= n / (16 + 1)
    est = {r.token: r.est_count for r in idx.estimates().collect()}
    assert len(est) <= 16
    for tok, e in est.items():
        assert e <= true[tok]
        assert e >= true[tok] - mk["cnt"]
    for tok, c in true.items():
        if c > mk["cnt"]:
            assert tok in est, f"guaranteed token missing: {tok}"


def test_incremental_index_replay_and_reopen(spark, tmp_path):
    """Redelivering the last batch_id is a no-op (no new snapshot);
    a reopened index carries its capacity and state."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.heavy import HeavyHittersIndex

    eng = Engine(spark, str(tmp_path))
    idx = HeavyHittersIndex(eng, "vocab", capacity=16)
    idx.create()
    batches, _ = _batches(spark)
    idx.add_batch(batches[0], "text", batch_id=0)
    before = len(eng.history("vocab_hh_state"))
    out = idx.add_batch(batches[0], "text", batch_id=0)  # redelivery
    assert out["replayed"]
    assert len(eng.history("vocab_hh_state")) == before
    idx2 = HeavyHittersIndex.open(eng, "vocab")
    assert idx2.capacity == 16
    assert idx2.estimates().count() > 0


def test_engine_overwrite_replaces_contents(spark, tmp_path):
    """engine.overwrite fully replaces a table: rows absent from the new
    frame are gone (upsert can't do that); versioned tables get one
    'rewrite' snapshot and keep time travel."""
    from polars_lake_spark import Engine

    eng = Engine(spark, str(tmp_path))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    eng.create_table("plain", df1, keys=["id"])
    eng.overwrite("plain", df2)
    assert [(r.id, r.v) for r in eng.table("plain").collect()] == [(3, "c")]
    eng.create_table("vers", df1, keys=["id"], versioned=True)
    eng.overwrite("vers", df2)
    assert [(r.id, r.v) for r in eng.table("vers").collect()] == [(3, "c")]
    assert eng.history("vers")[-1]["op"] == "rewrite"
    assert {(r.id, r.v) for r in eng.table("vers", version=1).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_stream_vocab_ingest(spark, tmp_path):
    """Micro-batches fold into the persisted sketch via foreachBatch;
    the final state matches a one-shot batch fold's guarantees."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.heavy import HeavyHittersIndex
    from polars_lake_spark.streaming.ingest import stream_vocab_ingest

    eng = Engine(spark, str(tmp_path / "eng"))
    idx = HeavyHittersIndex(eng, "svocab", capacity=16)
    idx.create()
    df, true = _docs(spark)
    staging = str(tmp_path / "doc_stream")
    df.repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(df.schema).parquet(staging)
    q = stream_vocab_ingest(
        idx, stream, "text", checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    mk = idx._marker()
    n = sum(true.values())
    assert mk["ntok"] == n
    est = {r.token: r.est_count for r in idx.estimates().collect()}
    for tok, c in true.items():
        if c > mk["cnt"]:
            assert tok in est
        if tok in est:
            assert est[tok] <= c


def test_hot_keys_exact_topk_matches_model(spark):
    """Skewed key column (Zipf-ish): the two-pass hot-key probe must
    equal the exact groupBy top-k, including tie order, and the sketch
    pass must honor its bounds at a capacity small enough to trim."""
    from polars_lake_spark.operators.heavy import (
        hot_keys_exact_topk,
        mg_sketch_keys,
    )

    rows = []
    for i in range(1, 200):
        rows.extend([(f"k{i:03d}",)] * (2000 // i))
    df = spark.createDataFrame(rows, "key string").repartition(5)
    true = Counter(r[0] for r in rows)
    got = [
        (r.key, r.cnt)
        for r in hot_keys_exact_topk(df, "key", k=15, capacity=256).collect()
    ]
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert got == want
    # force trims at capacity 16 and check the MG bounds
    sk = mg_sketch_keys(df, "key", 16)
    items = sk.filter(F.col("token").isNotNull()).groupBy("token").agg(
        F.sum("cnt").alias("est")
    )
    markers = sk.filter(F.col("token").isNull()).collect()
    n = sum(true.values())
    assert sum(r.ntok for r in markers) == n
    sub = sum(r.cnt for r in markers)
    assert 0 < sub <= n / 17
    est = {r.token: r.est for r in items.collect()}
    for tok, e in est.items():
        assert true[tok] - sub <= e <= true[tok]


@pytest.mark.usefixtures("spark")
@given(
    vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=200),
    parts=st.integers(min_value=1, max_value=5),
    cap=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mg_sketch_keys_properties(spark, vals, parts, cap):
    """Random streams, partitionings, and capacities: no estimate above
    its true count; undercount bounded by the observable subtraction
    total; every value with true count > subtracted is present."""
    from polars_lake_spark.operators.heavy import mg_sketch_keys

    df = spark.createDataFrame([(v,) for v in vals], "key int").repartition(parts)
    true = Counter(str(v) for v in vals)
    sk = mg_sketch_keys(df, "key", cap).collect()
    sub = sum(r.cnt for r in sk if r.token is None)
    est = Counter()
    for r in sk:
        if r.token is not None:
            est[r.token] += r.cnt
    assert sum(r.ntok for r in sk if r.token is None) == len(vals)
    for tok, e in est.items():
        assert e <= true[tok]
        assert e >= true[tok] - sub
    for tok, c in true.items():
        if c > sub:
            assert tok in est


def test_null_text_rows_are_skipped(spark):
    """A NULL text row must not crash the sketch fold (words(NULL) is
    NULL); it simply contributes no tokens — both passes of the exact
    top-k then agree on input tolerance."""
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, None), (3, "alpha")],
        "doc_id long, text string",
    )
    est = {r.token: r.est_count for r in heavy_hitters(df, "text", 8).collect()}
    assert est == {"alpha": 3, "beta": 1}
    got = [(r.token, r.cnt) for r in heavy_hitters_exact_topk(df, "text", k=2, capacity=8).collect()]
    assert got == [("alpha", 3), ("beta", 1)]
