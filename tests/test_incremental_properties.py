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
