"""Equality witnesses for the Arrow-vectorized UDF paths
(operators/_arrow_udfs.py): every vectorized rewrite must stay
BIT-IDENTICAL to the pure-column-expression twin kept in its caller's
module, so a Spark hash-implementation change (or a numpy porting bug)
can never silently diverge the optimized path.
"""

import pyspark.sql.functions as F

from polars_lake_spark.operators.dedup import (
    _minhash_signatures_expr,
    minhash_signatures,
    word_shingles,
)


def _diff_count(a, b):
    return (
        a.alias("a")
        .join(b.alias("b"), "id", "full")
        .filter(
            ~F.col("a.sig").eqNullSafe(F.col("b.sig"))
        )
        .count()
    )


def test_minhash_arrow_matches_expr_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = word_shingles(docs, "doc_id", "text", 3).localCheckpoint()
    a = _minhash_signatures_expr(sh, 128).select("id", "sig")
    b = minhash_signatures(sh, 128).select("id", "sig")
    assert a.count() == b.count() > 0
    assert _diff_count(a, b) == 0


def test_minhash_arrow_matches_expr_edge_cases(spark):
    # empty shingle set (NULL signature), unicode, negative-hash-prone
    # strings, single-element arrays, and a large array in one row
    rows = [
        (1, []),
        (2, ["a"]),
        (3, ["héllo", "wörld", "héllo"]),
        (4, [chr(0x1F600), ""]),
        (5, [f"tok{i}" for i in range(500)]),
        (6, ["\x00nul", "tab\tsep"]),
    ]
    df = spark.createDataFrame(rows, "id long, shingles array<string>")
    for num_perm in (1, 7, 128):
        a = _minhash_signatures_expr(df, num_perm).select("id", "sig")
        b = minhash_signatures(df, num_perm).select("id", "sig")
        assert _diff_count(a, b) == 0
