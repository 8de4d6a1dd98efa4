"""Cross-validation of the extension operators against each other:
the approximate/scale-path variants must agree with their exact
counterparts on the planted near-duplicates.
"""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark.operators import dedup as D
from polars_lake_spark.operators import multimodal as MM
from polars_lake_spark.operators import similarity as S
from polars_lake_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_minhash_equals_exact_jaccard(docs):
    exact = {
        (r.d1, r.d2) for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    lsh = {
        (r.d1, r.d2)
        for r in D.minhash_lsh_pairs(docs, "doc_id", "text", 3, 128, 32, 0.8).collect()
    }
    assert lsh == exact and len(exact) > 0


def test_simhash_finds_planted_near_dups(docs):
    """SimHash (hamming ≤ 3 of 48 bits) should recover most ≥0.9-jaccard
    pairs — different signal, same planted duplicates."""
    exact = {
        (r.d1, r.d2) for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.9).collect()
    }
    sim = {
        (r.d1, r.d2)
        for r in D.simhash_pairs(docs, "doc_id", "text", 48, 12, 3).collect()
    }
    assert len(exact) > 0
    recall = len(exact & sim) / len(exact)
    assert recall >= 0.7, f"simhash recall too low: {recall} ({len(sim)} pairs)"


def test_lsh_topk_subset_of_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    brute = {
        (r.qid, r.cid): r.cos_sim
        for r in S.brute_force_topk(emb, queries, k=50).collect()
    }
    approx = S.lsh_topk(emb, queries, k=5, n_planes=8, dim=64).collect()
    assert len(approx) > 0
    # every ANN hit must carry the exact cosine score (re-ranked exactly)
    for r in approx:
        if (r.qid, r.cid) in brute:
            assert abs(brute[(r.qid, r.cid)] - r.cos_sim) < 1e-6


def test_exact_dedup_groups_cover_all_docs(docs):
    total = docs.count()
    groups = D.exact_dedup_groups(docs, "doc_id", "text")
    assert groups.agg(F.sum("n_docs")).collect()[0][0] == total


def test_multimodal_decode_batch_shape(docs):
    with_media = MM.attach_media_column(docs.limit(50), "text")
    feats = MM.decode_images(with_media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0 and 16 <= r.width < 80 and r.channels == 3
        assert 0.0 <= r.mean_intensity <= 1.0


def test_multimodal_real_decoder_contract(docs):
    """r5: PNG decodes for REAL (see test_multimodal_codec); non-PNG
    payloads yield NULL features by default and raise only under
    on_undecodable='error' (JPEG entropy decoding stays lib-gated)."""
    with_media = MM.attach_media_column(docs.limit(1), "text")  # raw text bytes
    row = MM.decode_images_real(with_media).collect()[0]
    assert row.width is None and row.mean_intensity is None
    with pytest.raises(Exception) as ei:
        MM.decode_images_real(with_media, on_undecodable="error").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_stub_fanout(docs):
    with_media = MM.attach_media_column(docs.limit(5), "text")
    frames = MM.frame_sample_stub(with_media, every_n=50)
    per_doc = {r[0]: 0 for r in frames.collect()}
    assert len(per_doc) == 5
    assert frames.count() >= 5


def test_image_header_parsers_pure():
    """Header parsing against hand-built and malformed byte strings."""
    from polars_lake_spark.operators.multimodal import (
        parse_image_header,
        synthesize_jpeg,
        synthesize_png,
    )

    assert parse_image_header(synthesize_png(640, 480, 3, b"x" * 10)) == (
        "png", 640, 480, 3,
    )
    assert parse_image_header(synthesize_png(17, 21, 1, b"")) == ("png", 17, 21, 1)
    assert parse_image_header(synthesize_jpeg(320, 200, 3, b"pay")) == (
        "jpeg", 320, 200, 3,
    )
    assert parse_image_header(synthesize_jpeg(65535, 1, 1, b"")) == (
        "jpeg", 65535, 1, 1,
    )
    # malformed inputs degrade to None, never raise
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\nXXXXIDAT") is None
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") is None
    assert parse_image_header(b"GIF89a") is None


def test_connected_components_chain(spark):
    """Chains longer than one hop must converge to the min label; disjoint
    clusters stay disjoint."""
    from polars_lake_spark.operators.graph import connected_components

    # components: {1,2,3,4,5} (a chain), {10,11}, {20,21,22} (a star)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (21, 20), (21, 22)],
        "d1 long, d2 long",
    )
    got = {
        (r.id, r.component) for r in connected_components(edges).collect()
    }
    want = {(i, 1) for i in (1, 2, 3, 4, 5)} | {(10, 10), (11, 10)} | {
        (i, 20) for i in (20, 21, 22)
    }
    assert got == want


def test_two_star_long_chain_distributed(spark):
    """two_star on a 60-hop path, FORCED onto the distributed path
    (local_threshold=0): must find the single component in O(log^2 n)
    rounds — well under a max_iter that would starve O(diameter)
    label propagation."""
    from polars_lake_spark.operators.graph import connected_components

    n = 60
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "d1 long, d2 long"
    )
    got = {
        (r.id, r.component)
        for r in connected_components(
            edges, local_threshold=0, max_iter=14, algorithm="two_star"
        ).collect()
    }
    assert got == {(i, 0) for i in range(n + 1)}


def test_label_prop_raises_on_nonconvergence(spark):
    """Running out of rounds mid-propagation must raise, not hand back
    plausible-but-wrong components (labels at round k < diameter are a
    valid-looking partial answer)."""
    import pytest

    from polars_lake_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "d1 long, d2 long"
    )
    with pytest.raises(RuntimeError, match="two_star"):
        connected_components(edges, local_threshold=0, max_iter=3)


def test_two_star_matches_label_prop_distributed(spark):
    """Both distributed algorithms agree on a multi-component graph with
    mixed shapes (chain + star + triangle + isolated pair)."""
    from polars_lake_spark.operators.graph import connected_components

    raw = (
        [(i, i + 1) for i in range(5)]            # chain 0..5
        + [(20, j) for j in (21, 22, 23)]          # star
        + [(30, 31), (31, 32), (32, 30)]           # triangle
        + [(40, 41)]
    )
    edges = spark.createDataFrame(raw, "d1 long, d2 long")
    kw = dict(local_threshold=0, max_iter=20)
    a = {
        (r.id, r.component)
        for r in connected_components(edges, algorithm="two_star", **kw).collect()
    }
    b = {
        (r.id, r.component)
        for r in connected_components(edges, algorithm="label_prop", **kw).collect()
    }
    assert a == b
    assert {(40, 40), (41, 40), (32, 30)} <= a


def test_two_star_keeps_self_loop_only_vertices(spark):
    """A vertex whose only pair is a self-loop must appear as its own
    singleton component under EVERY strategy (they all agree)."""
    from polars_lake_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(7, 7), (1, 2)], "d1 long, d2 long"
    )
    want = {(7, 7), (1, 1), (2, 1)}
    for kw in (
        dict(),  # local union-find path
        dict(local_threshold=0, algorithm="label_prop"),
        dict(local_threshold=0, algorithm="two_star"),
    ):
        got = {
            (r.id, r.component)
            for r in connected_components(edges, **kw).collect()
        }
        assert got == want, kw


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_filter_equals_exact_jaccard(docs, threshold):
    """Prefix filtering is exact by THEOREM — the full (d1, d2, jaccard)
    output must be identical to the brute-force self-join at any
    threshold (0.5 stresses long prefixes, 0.8 short ones)."""
    exact = {
        (r.d1, r.d2, round(r.jaccard, 8))
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", 3, threshold
        ).collect()
    }
    pf = {
        (r.d1, r.d2, round(r.jaccard, 8))
        for r in D.prefix_filter_pairs(
            docs, "doc_id", "text", 3, threshold
        ).collect()
    }
    assert pf == exact and len(exact) > 0


def test_prefix_filter_layout_independent(docs):
    """Same pairs under an adversarial repartition of the input."""
    base = {
        (r.d1, r.d2)
        for r in D.prefix_filter_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    rep = {
        (r.d1, r.d2)
        for r in D.prefix_filter_pairs(
            docs.repartition(7), "doc_id", "text", 3, 0.8
        ).collect()
    }
    assert base == rep


def test_global_rank_is_dense_total_order(spark):
    """global_rank == the single-task window row_number, without one:
    dense 0..n-1, ordered by the keys, stable under repartition."""
    from polars_lake_spark.operators.dedup import global_rank

    rows = [(i, "k%03d" % ((i * 7) % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    got = {
        (r["id"], r["__rank"])
        for r in global_rank(df, ["k", "id"], partitions=7).collect()
    }
    want = {
        (i, rk)
        for rk, (i, _k) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want
    rep = {
        (r["id"], r["__rank"])
        for r in global_rank(df.repartition(11), ["k", "id"], partitions=3).collect()
    }
    assert rep == want


def test_snm_subset_of_exact_and_finds_planted(docs):
    """SNM pairs are exact-verified, so they're a SUBSET of brute-force
    Jaccard at the same threshold — and on the fixtures (near-dups share
    sort prefixes) it finds a real fraction of them."""
    # SNM emits (lower-rank, higher-rank); normalize to unordered pairs
    snm = {
        frozenset((r.d1, r.d2))
        for r in D.sorted_neighborhood_pairs(
            docs, "doc_id", "text", window=10, threshold=0.8
        ).collect()
    }
    exact = {
        frozenset((r.d1, r.d2))
        for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    assert snm <= exact
    assert len(snm) >= len(exact) * 0.5 > 0
