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


def _ivf_inputs(spark, rows):
    from polars_lake_spark.operators.similarity import as_double, norm

    df = spark.createDataFrame(rows, "id long, v array<double>")
    return df.select("id", as_double(F.col("v")).alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )


def _assign_diff(vecs, cent_rows):
    from polars_lake_spark.operators._arrow_udfs import make_ivf_assign_udf
    from polars_lake_spark.operators.ivf import _assign_expr

    class R:
        def __init__(self, c, cv, cn):
            self.cell_id, self.cv, self.cnrm = c, cv, cn

    rows = [R(*t) for t in cent_rows]
    a = _assign_expr(vecs, rows).select("id", "cell_id")
    udf = make_ivf_assign_udf(cent_rows)
    b = vecs.withColumn("cell_id", udf(F.col("v"), F.col("nrm"))).select(
        "id", "cell_id"
    )
    return (
        a.alias("a")
        .join(b.alias("b"), "id", "full")
        .filter(~F.col("a.cell_id").eqNullSafe(F.col("b.cell_id")))
        .count()
    )


def test_ivf_assign_arrow_matches_expr_on_corpus(spark, sf_dir):
    from polars_lake_spark.operators.ivf import train_ivf
    from polars_lake_spark.operators.similarity import as_double, norm

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf(emb, k=8, iters=2)
    cent_rows = sorted(
        [(r.cell_id, list(r.cv), float(r.cnrm)) for r in cents.collect()]
    )
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        as_double(F.col("embedding")).alias("v"),
    ).withColumn("nrm", norm(F.col("v")))
    assert vecs.count() > 0
    assert _assign_diff(vecs, cent_rows) == 0


def test_ivf_assign_arrow_matches_expr_edge_cases(spark):
    # ties (duplicate centroids), NULL vector, wrong-length vector,
    # null elements, negative components, overflow-to-inf magnitudes
    cent_rows = [
        (0, [1.0, 0.0, 0.0], 1.0),
        (1, [1.0, 0.0, 0.0], 1.0),  # duplicate of cell 0 -> ties to 0
        (3, [-1.0, 2.0, 0.5], 2.29128784747792),
    ]
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (3, None),                  # NULL vector
        (4, [1.0, 2.0]),            # wrong length
        (5, [None, 1.0, 0.5]),      # null element
        (6, [-1.0, 2.0, 0.5]),
        (7, [0.3, -0.7, 1e300]),    # overflow-prone magnitudes
    ]
    vecs = _ivf_inputs(spark, rows)
    assert _assign_diff(vecs, cent_rows) == 0


def test_ivf_assign_arrow_raises_on_zero_norm_like_expr(spark):
    """ANSI parity: a zero-norm vector makes the expression twin's
    division throw (Spark 4 default); the Arrow path must refuse the
    same input, not silently assign."""
    import pytest

    from polars_lake_spark.operators._arrow_udfs import make_ivf_assign_udf
    from polars_lake_spark.operators.ivf import _assign_expr

    cent_rows = [(0, [1.0, 0.0], 1.0), (1, [0.0, 1.0], 1.0)]
    vecs = _ivf_inputs(spark, [(1, [0.0, 0.0])])  # zero vector, nrm 0

    class R:
        def __init__(self, c, cv, cn):
            self.cell_id, self.cv, self.cnrm = c, cv, cn

    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        _assign_expr(vecs, [R(*t) for t in cent_rows]).collect()
    udf = make_ivf_assign_udf(cent_rows)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        vecs.withColumn("cell_id", udf(F.col("v"), F.col("nrm"))).collect()


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
