"""Misra-Gries heavy hitters: sketch guarantees against an exact Python
model, with capacities small enough that trimming actually fires, and
layout independence under repartitioning."""

from collections import Counter

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
