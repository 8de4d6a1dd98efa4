"""Unit tests for the round-3 curation operators: sliding-window chunking
and int8 embedding quantization (edge cases the oracle-parity sweep's real
data doesn't exercise: short/empty docs, zero vectors, exact reconstruction
bounds).
"""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark.operators.sampling import chunk_words
from polars_lake_spark.operators.similarity import quantize_int8


@pytest.fixture(scope="module")
def worded(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(100))),  # 100 words -> 4 chunks
        (2, " ".join(f"w{i}" for i in range(32))),  # exactly one window
        (3, "a b c"),  # shorter than window
        (4, "solo"),  # single word
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_counts_and_coverage(worded):
    ws = F.split(F.col("text"), " ")
    out = chunk_words(worded, "doc_id", ws, window=32, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # ceil((100-8)/24) = 4 chunks; ceil((32-8)/24) = 1; minimum is 1.
    assert {d: len(v) for d, v in by_doc.items()} == {1: 4, 2: 1, 3: 1, 4: 1}
    # chunk i starts at word i*stride: overlap region repeats across chunks
    c = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert c[0].chunk_text.split(" ")[24:32] == c[1].chunk_text.split(" ")[0:8]
    # last chunk is the (possibly short) tail, never empty
    assert c[3].n_chunk_words == 100 - 3 * 24
    assert by_doc[4][0].chunk_text == "solo"


def test_chunks_reassemble_document(worded):
    """Stride-aligned prefixes of each chunk reconstruct the document."""
    ws = F.split(F.col("text"), " ")
    out = chunk_words(worded, "doc_id", ws, window=32, overlap=8)
    doc1 = sorted(
        out.filter(F.col("doc_id") == 1).collect(), key=lambda r: r.chunk_id
    )
    rebuilt = []
    for r in doc1[:-1]:
        rebuilt.extend(r.chunk_text.split(" ")[:24])
    rebuilt.extend(doc1[-1].chunk_text.split(" "))
    assert rebuilt == [f"w{i}" for i in range(100)]


def test_chunk_rejects_bad_window():
    with pytest.raises(ValueError):
        chunk_words(None, "doc_id", F.col("x"), window=8, overlap=8)


def test_quantize_roundtrip_error_bound(spark):
    rows = [
        (1, [1.0, -2.5, 0.25, 127.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 1, all-zero codes
        (3, [-1e-3, 2e-3, 3e-3, -4e-3]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
    # zero vector: guard scale, exact reconstruction
    assert out[2].q8 == "0,0,0,0" and out[2].scale == 1.0 and out[2].max_err == 0.0
    # codes stay in int8 range; max element maps to ±127
    for r in out.values():
        codes = [int(c) for c in r.q8.split(",")]
        assert all(-127 <= c <= 127 for c in codes)
    assert int(out[1].q8.split(",")[3]) == 127
    # symmetric quantization error is bounded by scale/2 per element
    for r in out.values():
        assert r.max_err <= r.scale / 2 + 1e-12


def test_chunk_null_words_yields_one_empty_chunk(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, None)], "doc_id int, text string")
    ws = F.split(F.col("text"), " ")
    out = chunk_words(df, "doc_id", ws, window=32, overlap=8).collect()
    by_doc = {r.doc_id: r for r in out}
    assert set(by_doc) == {1, 2}  # the NULL-text doc is not dropped
    assert by_doc[2].chunk_text == "" and by_doc[2].chunk_id == 0

