"""Distributed BPE training/encoding vs a pure-Python reference model.

The Spark trainer's per-round fold must be bit-identical to the classic
single-pass python loop (same argmax tie-breaks, same leftmost-greedy
merge), and the Arrow-batched encoder must replay training exactly.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_lake_spark.operators import bpe as B

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

word_counts_st = st.dictionaries(
    st.text(alphabet="ab", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=8,
)


def _merge_pass(syms, a, b):
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def model_train(word_counts, n_merges, min_frequency=1):
    """Classic driver-side BPE with the trainer's exact tie-breaks."""
    state = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_frequency:
            break
        merges.append((rank, a, b, c))
        state = {w: _merge_pass(s, a, b) for w, s in state.items()}
    return merges, state


@given(wc=word_counts_st)
@settings(**_SETTINGS)
def test_train_matches_python_model(spark, wc):
    df = spark.createDataFrame(list(wc.items()), "word string, n bigint")
    merges, sym = B.train_bpe(df, n_merges=4, min_frequency=1)
    want_merges, want_state = model_train(wc, 4, 1)
    assert merges == want_merges
    got_state = {r.word: list(r.syms) for r in sym.collect()}
    assert got_state == want_state


def test_train_layout_independent(spark, sf_dir):
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    wc = B.word_counts(docs, "text")
    m1, _ = B.train_bpe(wc, 12)
    m2, _ = B.train_bpe(wc.repartition(7), 12)
    assert m1 == m2 and len(m1) == 12


def test_driver_path_equals_distributed_path(spark, sf_dir):
    """The driver-side merge loop (vocab under DRIVER_VOCAB_THRESHOLD)
    must replay the distributed rounds bit-identically: same merges,
    same final segmentation table — for exact BPE and batched rounds."""
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    wc = B.word_counts(docs, "text")
    exact_merges = None
    for mpr in (1, 8):
        m_drv, s_drv = B.train_bpe(wc, 12, merges_per_round=mpr)
        m_dst, s_dst = B.train_bpe(
            wc, 12, merges_per_round=mpr, driver_vocab_threshold=0
        )
        assert m_drv == m_dst
        rows_drv = {r.word: (r.n, list(r.syms)) for r in s_drv.collect()}
        rows_dst = {r.word: (r.n, list(r.syms)) for r in s_dst.collect()}
        assert rows_drv == rows_dst
        if mpr == 1:
            exact_merges = m_drv
    # threshold smaller than the vocab falls back to the distributed path
    m_fb, _ = B.train_bpe(wc, 4, driver_vocab_threshold=2)
    assert m_fb == exact_merges[:4]


def test_min_frequency_stops_training(spark):
    df = spark.createDataFrame([("abc", 1), ("xyz", 1)], "word string, n bigint")
    merges, _ = B.train_bpe(df, n_merges=10, min_frequency=2)
    assert merges == []


def test_batched_training_invariants(spark, sf_dir):
    """merges_per_round > 1: still lossless, still encoder-replayable,
    and counts within the whole list stay >= min_frequency."""
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    wc = B.word_counts(docs, "text")
    merges, sym = B.train_bpe(wc, 24, min_frequency=2, merges_per_round=8)
    assert len(merges) == 24
    assert [m[0] for m in merges] == list(range(24))
    assert all(m[3] >= 2 for m in merges)
    rows = sym.collect()
    for r in rows:
        assert "".join(r.syms) == r.word
        assert B.encode_word(r.word, merges) == list(r.syms)


def test_encode_docs_lossless(spark, sf_dir):
    """bpe_encode over the raw documents table: concatenating a doc's
    tokens reproduces its normalized text with spaces removed, and the
    token count never exceeds the char count."""
    from polars_lake_spark.operators.dedup import normalized_text
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    wc = B.word_counts(docs, "text")
    merges, _ = B.train_bpe(wc, 16)
    enc = B.bpe_encode(docs, "text", merges)
    bad = enc.filter(
        (
            F.concat_ws("", F.col("tokens"))
            != F.regexp_replace(normalized_text(F.col("text")), " ", "")
        )
        | (F.size("tokens") > F.length(normalized_text(F.col("text"))))
    ).count()
    assert bad == 0


def test_encode_null_text_yields_empty(spark):
    df = spark.createDataFrame([(1, None)], "id bigint, text string")
    out = B.bpe_encode(df, "text", [(0, "a", "b", 2)]).collect()
    assert out[0].tokens == []


def test_merge_table_roundtrip(spark, sf_dir, tmp_path):
    """Train → persist as engine table → reopen → encode must equal
    encoding with the in-memory merges."""
    from polars_lake_spark import Engine
    from polars_lake_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    wc = B.word_counts(docs, "text")
    merges, _ = B.train_bpe(wc, 12)
    eng = Engine(spark, str(tmp_path))
    B.save_merges(eng, "tok", merges)
    eng2 = Engine(spark, str(tmp_path))
    eng2.load_all()
    reloaded = B.load_merges(eng2, "tok")
    assert reloaded == merges
    a = {r.doc_id: r.tokens for r in B.bpe_encode(docs, "text", merges).select("doc_id", "tokens").collect()}
    b = {r.doc_id: r.tokens for r in B.bpe_encode(docs, "text", reloaded).select("doc_id", "tokens").collect()}
    assert a == b


def test_encode_unicode_whitespace_matches_spark_norm(spark):
    """Java's \\s is ASCII-only; the python encoder must NOT split on
    unicode whitespace (\\xa0) or the two consistency-check paths
    diverge. The \\xa0 stays inside the word, chars it joins stay one
    word."""
    from polars_lake_spark.operators.dedup import normalized_text

    df = spark.createDataFrame([(1, "foo\xa0bar baz")], "id bigint, text string")
    spark_words = df.select(
        F.split(normalized_text(F.col("text")), " ").alias("w")
    ).head()["w"]
    assert spark_words == ["foo\xa0bar", "baz"]
    out = B.bpe_encode(df, "text", []).head()["tokens"]
    assert "".join(out) == "foo\xa0barbaz"
    # the unicode-space word stayed intact: chars of foo\xa0bar are
    # contiguous (no token boundary inserted by a python-side split)
    assert out == list("foo\xa0bar") + list("baz")
