"""Property-based checks of the incremental MinHash path against direct
Python models: incremental pairs must equal exact Jaccard restricted to
batch-touching pairs, and batch_survivors must follow the component
contamination rule exactly."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_lake_spark.operators import incremental as INC

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny vocabulary → real shingle collisions; doc = 3..8 words
_VOCAB = ["red", "blue", "green", "fox", "dog", "runs", "fast", "slow"]
docs_st = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=10,
)


def _model_jaccard_pairs(texts, threshold=0.8):
    shingles = {}
    for i, t in enumerate(texts):
        ws = t.split()
        if len(ws) >= 3:
            shingles[i] = {
                " ".join(ws[j : j + 3]) for j in range(len(ws) - 2)
            }
    out = {}
    ids = sorted(shingles)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            inter = len(shingles[i] & shingles[j])
            jac = inter / (len(shingles[i]) + len(shingles[j]) - inter)
            if jac >= threshold:
                out[(i, j)] = jac
    return out


@pytest.mark.usefixtures("spark")
@given(docs=docs_st, split_mod=st.integers(min_value=2, max_value=4))
@settings(**_SETTINGS)
def test_incremental_pairs_match_model(spark, docs, split_mod):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.filter(df.doc_id % split_mod != 0)
    batch = df.filter(df.doc_id % split_mod == 0)
    ish, ient = INC.prepare_docs(corpus, "doc_id", "text")
    bsh, bent = INC.prepare_docs(batch, "doc_id", "text")
    got = {
        (min(r.d1, r.d2), max(r.d1, r.d2)): round(r.jaccard, 8)
        for r in INC.incremental_minhash_pairs(bsh, bent, ient, ish).collect()
    }
    want = {
        p: round(j, 8)
        for p, j in _model_jaccard_pairs(docs).items()
        if p[0] % split_mod == 0 or p[1] % split_mod == 0
    }
    assert got == want


def _model_survivors(pairs, batch_ids):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    comps = {}
    for x in parent:
        comps.setdefault(find(x), set()).add(x)
    drop = set()
    for members in comps.values():
        batch_m = members & batch_ids
        if members - batch_ids:
            drop |= batch_m  # contaminated: an indexed doc is reachable
        elif batch_m:
            drop |= batch_m - {min(batch_m)}
    return batch_ids - drop


pairs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10),
        st.integers(min_value=0, max_value=10),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@given(pairs=pairs_st, batch=st.sets(st.integers(min_value=0, max_value=12), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_batch_survivors_match_model(spark, pairs, batch):
    pdf = spark.createDataFrame(
        [(a, b, 0.9) for a, b in pairs], "d1 long, d2 long, jaccard double"
    )
    bdf = spark.createDataFrame([(i,) for i in sorted(batch)], "id long")
    got = {r.id for r in INC.batch_survivors(pdf, bdf).collect()}
    assert got == _model_survivors(pairs, set(batch))


def _model_winnow_fps(text, k, w):
    """Python model of winnowing: per-window minima over md5-free...
    the Spark path hashes with xxhash64, so the model works on HASH SETS
    per doc computed the same structural way but compared only via the
    pair rule — instead we model at the GRAM level: doc -> set of
    winnowed gram positions isn't engine-comparable, so model on exact
    substrings: two docs pair iff they share >= min_shared distinct
    winnow fingerprints. To stay engine-independent, the model recomputes
    fingerprints using the same algorithm over python's hash of grams
    mirrored via a dict of gram->stable id (gram text equality is what
    determines hash equality; collisions of xxhash64 are negligible and
    identical grams always collide identically)."""
    import re

    s = re.sub(r"\s+", " ", text.lower()).strip()
    if len(s) < k:
        return None, s
    grams = [s[i : i + k] for i in range(len(s) - k + 1)]
    return grams, s


def _model_winnow_pairs(texts, k, w, min_shared, max_bucket):
    """Gram-level reference model using the SAME md5-derived gram hash as
    the Spark path (gram_hash='md5') — winnowing selects window MINIMA by
    hash VALUE, so the model must order grams identically, not merely
    injectively (an insertion-order id model diverges below the k+w-1
    guarantee, where which gram wins the window decides the pair)."""
    import hashlib

    def gid(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)

    fps = {}
    for i, t in enumerate(texts):
        grams, _ = _model_winnow_fps(t, k, w)
        if grams is None:
            continue
        hs = [gid(g) for g in grams]
        if len(hs) >= w:
            f = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
        else:
            f = {min(hs)}
        fps[i] = f
    buckets = {}
    for i, f in fps.items():
        for x in f:
            buckets.setdefault(x, set()).add(i)
    pairs = {}
    for x, ids in buckets.items():
        if 1 < len(ids) <= max_bucket:
            ids = sorted(ids)
            for a in range(len(ids)):
                for b in range(a + 1, len(ids)):
                    pairs[(ids[a], ids[b])] = pairs.get((ids[a], ids[b]), 0) + 1
    return {p: n for p, n in pairs.items() if n >= min_shared}


@pytest.mark.usefixtures("spark")
@given(docs=docs_st, split_mod=st.integers(min_value=2, max_value=4))
@settings(**_SETTINGS)
def test_incremental_winnow_matches_model(spark, docs, split_mod):
    """Incremental winnow pairs == gram-level Python model restricted to
    batch-touching pairs, with the md5-derived gram hash computed
    bit-identically on both sides."""
    from pyspark.sql import functions as F

    from polars_lake_spark.operators import winnow as W

    k, w, min_shared, max_bucket = 8, 4, 1, 10
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.filter(df.doc_id % split_mod != 0)
    batch = df.filter(df.doc_id % split_mod == 0)

    def entries(d):
        return W.winnow_fingerprints(
            d, "doc_id", "text", k, w, gram_hash="md5"
        ).select("id", F.explode("fps").alias("fp"))

    got = {
        (min(r.d1, r.d2), max(r.d1, r.d2)): r.n_shared
        for r in INC.incremental_winnow_pairs(
            entries(batch), entries(corpus), min_shared, max_bucket
        ).collect()
    }
    want = {
        p: n
        for p, n in _model_winnow_pairs(docs, k, w, min_shared, max_bucket).items()
        if p[0] % split_mod == 0 or p[1] % split_mod == 0
    }
    assert got == want
