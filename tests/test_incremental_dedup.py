"""Incremental MinHash-LSH dedup index (operators/incremental.py) and
winnowing substring fingerprints (operators/winnow.py)."""

import pytest
from pyspark.sql import functions as F

from polars_lake_spark.engine import Engine
from polars_lake_spark.operators import incremental as INC
from polars_lake_spark.operators import winnow as W
from polars_lake_spark.operators.dedup import minhash_lsh_pairs
from polars_lake_spark.sources import load_table


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different content about spark execution engines and shuffles"),
    (3, "a third document with its own unrelated words entirely here now"),
]
DUP_OF_1 = (10, "the quick brown fox jumps over the lazy dog near the river bank")
NOVEL = (11, "fresh never seen before text with many original words in it")
DUP_OF_11 = (12, "fresh never seen before text with many original words in it")


def test_incremental_pairs_match_full_recompute(spark, sf_dir):
    """Operator equivalence on real data: incremental(corpus, batch) must
    emit exactly the full-corpus LSH pairs that touch the batch."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    ish, ient = INC.prepare_docs(corpus, "doc_id", "text")
    bsh, bent = INC.prepare_docs(batch, "doc_id", "text")
    got = {
        (min(r.d1, r.d2), max(r.d1, r.d2))
        for r in INC.incremental_minhash_pairs(bsh, bent, ient, ish).collect()
    }
    full = {
        (r.d1, r.d2)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
        if r.d1 % 5 == 0 or r.d2 % 5 == 0
    }
    assert got == full


def test_minhash_index_add_batch(engine, spark):
    idx = INC.MinHashIndex(engine, "corpus_idx", threshold=0.8)
    idx.create(_docs(spark, BASE))
    out = idx.add_batch(_docs(spark, [DUP_OF_1, NOVEL, DUP_OF_11]))
    pairs = {(r.d1, r.d2) for r in out["pairs"].collect()}
    assert (1, 10) in pairs  # batch dup of an indexed doc
    assert (11, 12) in pairs  # batch-internal dup
    novel = {r.id for r in out["novel"].collect()}
    # 10 drops (dup of corpus); 11 keeps (min of internal cluster); 12 drops
    assert novel == {11}
    idx_ids = {r.id for r in engine.table("corpus_idx_mh_shingles").collect()}
    assert idx_ids == {1, 2, 3, 11}


def test_minhash_index_second_batch_sees_first(engine, spark):
    idx = INC.MinHashIndex(engine, "idx2")
    idx.create(_docs(spark, BASE))
    idx.add_batch(_docs(spark, [NOVEL]))
    # reopen from persisted meta — parameters recovered
    idx2 = INC.MinHashIndex.open(engine, "idx2")
    assert (idx2.n, idx2.num_perm, idx2.bands) == (3, 128, 32)
    out = idx2.add_batch(_docs(spark, [DUP_OF_11]))
    pairs = {(r.d1, r.d2) for r in out["pairs"].collect()}
    assert (11, 12) in pairs  # dup of a doc indexed by the FIRST batch
    assert out["novel"].count() == 0


def test_batch_survivors_transitive_contamination(spark):
    """B pairs only with batch doc A, but A is a dup of indexed doc → the
    whole component is contaminated and both drop."""
    pairs = spark.createDataFrame(
        [(1, 10, 0.9), (10, 11, 0.9)], "d1 long, d2 long, jaccard double"
    )
    batch_ids = spark.createDataFrame([(10,), (11,), (12,)], "id long")
    surv = {r.id for r in INC.batch_survivors(pairs, batch_ids).collect()}
    assert surv == {12}


def test_winnow_detects_long_verbatim_run(spark):
    # k=8, w=4 → guaranteed detection of any shared run ≥ 11 chars
    shared = "this exact sentence was copied verbatim into both documents"
    docs = _docs(
        spark,
        [
            (1, f"prefix one {shared} and a unique suffix alpha"),
            (2, f"other opening words {shared} closing differently beta"),
            (3, "nothing in common with the others at all whatsoever"),
        ],
    )
    pairs = W.winnow_match_pairs(docs, "doc_id", "text", k=8, w=4, min_shared=2)
    got = {(r.d1, r.d2) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_winnow_guarantee_property(spark):
    """Any two docs sharing a normalized substring of ≥ k+w-1 chars share
    ≥ 1 fingerprint (the winnowing theorem) — checked on generated docs."""
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    run = "xyzzy plugh quux corge grault"  # 29 chars ≥ k+w-1=13
    rows = []
    for i in range(8):
        pre = " ".join(rng.choices(words, k=6))
        post = " ".join(rng.choices(words, k=6))
        rows.append((i, f"{pre} {run} {post}"))
    fps = W.winnow_fingerprints(_docs(spark, rows), "doc_id", "text", k=8, w=6)
    sets = {r.id: set(r.fps) for r in fps.collect()}
    for i in range(8):
        for j in range(i + 1, 8):
            assert sets[i] & sets[j], f"docs {i},{j} share no fingerprint"


def test_winnow_boilerplate_guard(spark):
    """A fingerprint present in > max_bucket docs is excluded from pair
    expansion."""
    shared = "common boilerplate header sentence repeated everywhere"
    # identical docs ⇒ every fingerprint bucket holds all 6 docs
    docs = _docs(spark, [(i, shared) for i in range(6)])
    none = W.winnow_match_pairs(
        docs, "doc_id", "text", k=8, w=4, min_shared=1, max_bucket=3
    )
    assert none.count() == 0
    some = W.winnow_match_pairs(
        docs, "doc_id", "text", k=8, w=4, min_shared=1, max_bucket=10
    )
    assert some.count() == 15  # all C(6,2) pairs share the header


def test_stream_dedup_ingest(engine, spark, tmp_path):
    """Dedup-on-ingest: a doc stream lands micro-batches against the
    persisted index; only novel docs reach the target table."""
    from polars_lake_spark.streaming.ingest import stream_dedup_ingest

    idx = INC.MinHashIndex(engine, "stream_idx")
    idx.create(_docs(spark, BASE))
    engine.create_table(
        "clean_docs", _docs(spark, BASE), keys=["doc_id"]
    )

    staging = str(tmp_path / "doc_stream")
    incoming = _docs(
        spark, [DUP_OF_1, NOVEL, DUP_OF_11, (13, "tiny doc")]
    )
    incoming.repartition(2).write.parquet(staging)
    stream = spark.readStream.schema(incoming.schema).parquet(staging)

    q = stream_dedup_ingest(
        engine, idx, stream, "clean_docs",
        checkpoint_dir=str(tmp_path / "ckpt_dedup"),
    )
    q.awaitTermination(180)

    got = {r.doc_id for r in engine.table("clean_docs").collect()}
    # 10 (dup of indexed 1) and 12 (dup of batch-kept 11) never land;
    # 11 is novel; 13 is too short to shingle and passes through.
    assert got == {1, 2, 3, 11, 13}
    idx_ids = {r.id for r in engine.table("stream_idx_mh_shingles").collect()}
    assert idx_ids == {1, 2, 3, 11}


def test_contamination_matches_broadcast_plan(spark):
    """A train doc quoting ≥ k+w-1 chars of a benchmark doc is flagged;
    unrelated docs are not — and the benchmark side joins broadcast."""
    quote = "what is the capital of france the answer is paris"
    train = _docs(
        spark,
        [
            (1, f"some page that happens to quote {quote} inside prose"),
            (2, "a perfectly clean document about completely other topics"),
        ],
    )
    bench = _docs(spark, [(100, f"q and a pair {quote}")])
    m = W.contamination_matches(train, bench, "doc_id", "text", k=20, w=10)
    rows = {r.id: r.n_bench_matches for r in m.collect()}
    assert rows == {1: 1}
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_incremental_probe_broadcasts_batch(engine, spark):
    """The index side must never shuffle: the (small) batch entries are
    the broadcast build side of the probe join."""
    idx = INC.MinHashIndex(engine, "plan_idx")
    idx.create(_docs(spark, BASE))
    from polars_lake_spark.operators.incremental import (
        incremental_minhash_pairs,
        prepare_docs,
    )

    bsh, bent = prepare_docs(_docs(spark, [NOVEL]), "doc_id", "text")
    pairs = incremental_minhash_pairs(
        bsh, bent, engine.table("plan_idx_mh_entries"),
        engine.table("plan_idx_mh_shingles"),
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_index_compact_and_stats(engine, spark):
    import glob

    idx = INC.MinHashIndex(engine, "cidx")
    idx.create(_docs(spark, BASE))
    idx.add_batch(_docs(spark, [NOVEL]))
    idx.add_batch(_docs(spark, [(20, "another entirely novel body of words to index today")]))
    st = idx.stats()
    assert st["docs"] == 5 and st["entries"] == 5 * 32
    assert 1 <= st["max_bucket"] <= 5

    before = len(glob.glob(f"{engine.root}/cidx_mh_entries/**/*.parquet", recursive=True))
    idx.compact()
    after = len(glob.glob(f"{engine.root}/cidx_mh_entries/**/*.parquet", recursive=True))
    assert after < before  # one file per band dir now
    assert idx.stats() == st  # contents unchanged


def test_crawl_refresh_pipeline(engine, spark, sf_dir, tmp_path):
    """End-to-end composition on real data: seed index from the corpus
    slice, stream the 'crawl' slice through dedup-on-ingest, then verify
    the target equals seed + exactly the novel crawl survivors computed
    by the batch operator path."""
    from polars_lake_spark.streaming.ingest import stream_dedup_ingest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    crawl = docs.filter(F.col("doc_id") % 5 == 0)

    idx = INC.MinHashIndex(engine, "refresh_idx")
    idx.create(corpus)
    engine.create_table("refresh_target", corpus, keys=["doc_id"])

    staging = str(tmp_path / "crawl")
    crawl.repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(crawl.schema).parquet(staging)
    q = stream_dedup_ingest(
        engine, idx, stream, "refresh_target",
        checkpoint_dir=str(tmp_path / "ckpt_refresh"),
    )
    q.awaitTermination(300)

    got = {r.doc_id for r in engine.table("refresh_target").select("doc_id").collect()}
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    # batch-path ground truth (streaming arrival order may keep a
    # different representative inside a crawl-internal dup cluster, but
    # corpus-matched dups must never land and the CLEAN crawl docs always
    # do)
    ish, ient = INC.prepare_docs(corpus, "doc_id", "text")
    bsh, bent = INC.prepare_docs(crawl, "doc_id", "text")
    pairs = INC.incremental_minhash_pairs(bsh, bent, ient, ish).collect()
    crawl_ids = {r.doc_id for r in crawl.select("doc_id").collect()}
    dup_any = {r.d2 for r in pairs} | {r.d1 for r in pairs if r.d1 in crawl_ids}
    clean = crawl_ids - dup_any
    assert clean <= got - corpus_ids  # every clean crawl doc landed
    corpus_matched = {r.d2 for r in pairs if r.d1 in corpus_ids}
    assert not (corpus_matched & got)  # no corpus dup ever lands


def test_max_bucket_guard_drops_flooded_buckets(engine, spark):
    """With a flood of near-identical indexed docs, max_bucket suppresses
    the hot buckets: a probing dup of the flood finds nothing (all its
    buckets are over-cap) while normal dups still surface."""
    flood_text = "repeated boilerplate spam page with the same words again and again"
    flood = [(100 + i, flood_text) for i in range(6)]
    idx = INC.MinHashIndex(engine, "guard_idx", max_bucket=3)
    idx.create(_docs(spark, BASE + flood))
    out = idx.add_batch(_docs(spark, [(200, flood_text), DUP_OF_1]))
    pairs = {(r.d1, r.d2) for r in out["pairs"].collect()}
    assert (1, 10) in pairs  # normal dup unaffected
    assert not any(d2 == 200 for _, d2 in pairs)  # flood bucket suppressed
    # reopen keeps the guard
    assert INC.MinHashIndex.open(engine, "guard_idx").max_bucket == 3


def test_add_batch_replay_and_dup_ids(engine, spark):
    """At-least-once hygiene: intra-batch duplicate ids collapse to one
    row, and a full clean replay of a committed batch re-inserts nothing
    and emits no self-pairs."""
    idx = INC.MinHashIndex(engine, "replay_idx")
    idx.create(_docs(spark, BASE))
    batch = _docs(spark, [NOVEL, NOVEL])  # duplicate id in one batch
    out1 = idx.add_batch(batch)
    assert {r.id for r in out1["novel"].collect()} == {11}
    assert engine.table("replay_idx_mh_shingles").filter("id = 11").count() == 1
    assert engine.table("replay_idx_mh_entries").filter("id = 11").count() == 32

    out2 = idx.add_batch(_docs(spark, [NOVEL]))  # clean replay
    assert out2["novel"].count() == 0
    assert out2["pairs"].count() == 0  # no self-pair against its own rows
    assert engine.table("replay_idx_mh_shingles").filter("id = 11").count() == 1
    assert engine.table("replay_idx_mh_entries").filter("id = 11").count() == 32


def test_repair_restores_missing_entries(engine, spark):
    """Crash between the shingle and entry inserts: repair() re-derives
    the missing entries from the stored shingles."""
    idx = INC.MinHashIndex(engine, "repair_idx")
    idx.create(_docs(spark, BASE))
    idx.add_batch(_docs(spark, [NOVEL]))
    # simulate the crash window: doc 11's entries vanish
    engine.delete(
        "repair_idx_mh_entries",
        spark.createDataFrame([(11,)], "id long"),
        keys=["id"],
    )
    assert engine.table("repair_idx_mh_entries").filter("id = 11").count() == 0
    assert idx.repair() == 1
    assert engine.table("repair_idx_mh_entries").filter("id = 11").count() == 32
    # the repaired doc is probe-matchable again
    out = idx.add_batch(_docs(spark, [DUP_OF_11]))
    assert {(r.d1, r.d2) for r in out["pairs"].collect()} == {(11, 12)}
    assert idx.repair() == 0


# --- WinnowIndex: incremental exact-substring dedup -------------------

_Q = "what is the capital of france the answer is paris obviously"
WBASE = [
    (1, f"document one happens to contain the sentence {_Q} in the middle"),
    (2, "a clean document about spark shuffles with no quoted material"),
    (3, "another unrelated text concerning winnowing fingerprints and moss"),
]
W_DUP_OF_1 = (10, f"a later crawl page quoting {_Q} word for word")
W_NOVEL = (11, "entirely fresh content that quotes nothing from anywhere")
W_DUP_OF_11 = (12, "entirely fresh content that quotes nothing from anywhere")
W_SHORT = (13, "tiny")


def test_incremental_winnow_matches_full_recompute(spark, sf_dir):
    """Operator equivalence on real data: incremental winnow pairs must
    equal the full-corpus winnow_match_pairs restricted to batch-touching
    pairs — including n_shared (bucket totals and cut are identical)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    def entries(d):
        return W.winnow_fingerprints(d, "doc_id", "text", 20, 10).select(
            "id", F.explode("fps").alias("fp")
        )

    got = {
        (min(r.d1, r.d2), max(r.d1, r.d2), r.n_shared)
        for r in INC.incremental_winnow_pairs(
            entries(batch), entries(corpus), min_shared=2, max_bucket=50
        ).collect()
    }
    full = {
        (r.d1, r.d2, r.n_shared)
        for r in W.winnow_match_pairs(
            docs, "doc_id", "text", 20, 10, min_shared=2, max_bucket=50
        ).collect()
        if r.d1 % 5 == 0 or r.d2 % 5 == 0
    }
    assert got == full


def test_winnow_index_add_batch(engine, spark):
    idx = INC.WinnowIndex(engine, "wn_idx", k=8, w=6, min_shared=2)
    idx.create(_docs(spark, WBASE))
    out = idx.add_batch(
        _docs(spark, [W_DUP_OF_1, W_NOVEL, W_DUP_OF_11, W_SHORT])
    )
    pairs = {(min(r.d1, r.d2), max(r.d1, r.d2)) for r in out["pairs"].collect()}
    assert (1, 10) in pairs   # batch doc quoting an indexed doc verbatim
    assert (11, 12) in pairs  # batch-internal verbatim dup
    novel = {r.id for r in out["novel"].collect()}
    # 10 drops (dup of indexed 1); 12 drops (dup of batch-kept 11);
    # 11 novel; 13 too short to fingerprint but passes through
    assert novel == {11, 13}
    idx_ids = {r.id for r in engine.table("wn_idx_wn_fps").collect()}
    assert idx_ids == {1, 2, 3, 11}


def test_winnow_index_replay_and_reopen(engine, spark):
    idx = INC.WinnowIndex(engine, "wn_idx", k=8, w=6)
    idx.create(_docs(spark, WBASE))
    idx.add_batch(_docs(spark, [W_DUP_OF_1, W_NOVEL]))
    n_before = engine.table("wn_idx_wn_fps").count()
    # clean replay of the same batch: nothing re-inserts, no self-pairs
    out = idx.add_batch(_docs(spark, [W_DUP_OF_1, W_NOVEL]))
    assert engine.table("wn_idx_wn_fps").count() == n_before
    assert {r.id for r in out["novel"].collect()} == set()
    pairs = {(r.d1, r.d2) for r in out["pairs"].collect()}
    assert not any(a == b for a, b in pairs)
    # reopen carries parameters
    idx2 = INC.WinnowIndex.open(engine, "wn_idx")
    assert (idx2.k, idx2.w, idx2.gram_hash) == (8, 6, "xxhash64")


def test_stream_dedup_ingest_winnow(engine, spark, tmp_path):
    """stream_dedup_ingest is generic over the index: a WinnowIndex
    behind foreachBatch keeps verbatim-quoting docs out of the target."""
    from polars_lake_spark.streaming.ingest import stream_dedup_ingest

    idx = INC.WinnowIndex(engine, "wstream_idx", k=8, w=6, min_shared=2)
    idx.create(_docs(spark, WBASE))
    engine.create_table("wclean_docs", _docs(spark, WBASE), keys=["doc_id"])
    staging = str(tmp_path / "wdoc_stream")
    incoming = _docs(spark, [W_DUP_OF_1, W_NOVEL, W_DUP_OF_11, W_SHORT])
    incoming.repartition(2).write.parquet(staging)
    stream = spark.readStream.schema(incoming.schema).parquet(staging)
    q = stream_dedup_ingest(
        engine, idx, stream, "wclean_docs",
        checkpoint_dir=str(tmp_path / "ckpt_wn"),
    )
    q.awaitTermination(180)
    got = {r.doc_id for r in engine.table("wclean_docs").collect()}
    assert got == {1, 2, 3, 11, 13}
    idx_ids = {r.id for r in engine.table("wstream_idx_wn_fps").collect()}
    assert idx_ids == {1, 2, 3, 11}


def test_winnow_index_compact_and_stats(engine, spark):
    idx = INC.WinnowIndex(engine, "wn_ls", k=8, w=6)
    idx.create(_docs(spark, WBASE))
    idx.add_batch(_docs(spark, [W_NOVEL]))
    s = idx.stats()
    assert s["docs"] == 4 and s["entries"] > 0 and s["max_bucket"] >= 1
    before = {r.id for r in engine.table("wn_ls_wn_fps").collect()}
    idx.compact()
    after = {r.id for r in engine.table("wn_ls_wn_fps").collect()}
    assert before == after
