"""BM25 / cosine ranking / reciprocal-rank fusion (operators/retrieval.py):
Python-model equivalence, determinism under re-partitioning, and the
map-side-filter plan shape (the token stream must never shuffle)."""

import math

import pytest
from pyspark.sql import functions as F

from polars_lake_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "merge sort merge join merge"),
        (2, "vector stream vector"),
        (3, "filter scan filter stream filter merge"),
        (4, "hash join group agg"),
        (5, "stream stream stream stream stream"),
        (6, "merge"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bm25_model(rows, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in rows}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {
        t: sum(1 for w in toks.values() if t in w) for t in terms
    }
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if not tf or not dfreq[t]:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(w) / avgdl)
            )
        if s:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_python_model(spark, docs):
    terms = ["merge", "stream", "filter"]
    got = {
        r.doc_id: r.bm25
        for r in R.bm25_topk(docs, "doc_id", "text", terms, k=10).collect()
    }
    want = _bm25_model(
        [(r.doc_id, r.text) for r in docs.collect()], terms
    )
    assert got == pytest.approx(want, abs=1e-4)
    # layout independence
    got7 = {
        r.doc_id: r.bm25
        for r in R.bm25_topk(
            docs.repartition(7), "doc_id", "text", terms, k=10
        ).collect()
    }
    assert got7 == got
    with pytest.raises(ValueError, match="empty query"):
        R.bm25_topk(docs, "doc_id", "text", [])


def test_bm25_filter_below_first_exchange(spark, docs):
    """The 100 TB shape: the query-term filter must sit BELOW the first
    Exchange — the full token stream never shuffles."""
    plan = R.bm25_topk(
        docs, "doc_id", "text", ["merge", "stream"], k=5
    )._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    filt = plan.find("merge")  # the isin literal appears in the Filter
    assert first_exchange != -1 and filt != -1
    # the literal filter must appear deeper in the tree (later in the
    # printout) than the first exchange above it
    assert filt > first_exchange


def test_cosine_rank_matches_model(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.8, 0.6, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    q = [1.0, 0.0, 0.0]
    got = [
        (r.doc_id, r.cos_sim, r.rank)
        for r in R.cosine_rank(emb, "vec_id", "embedding", q, k=3).collect()
    ]
    assert got == [(1, 1.0, 1), (2, 0.8, 2), (3, 0.0, 3)]


def test_rrf_fuse_integer_exact(spark):
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id bigint, rank bigint"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id bigint, rank bigint"
    )
    got = {
        r.doc_id: (r.rrf_score, r.n_lists, r.fused_rank)
        for r in R.rrf_fuse([a, b], k=60).collect()
    }
    s = lambda rk: 1_000_000_000 // (60 + rk)
    assert got[20] == (s(2) + s(1), 2, 1)
    assert got[10] == (s(1), 1, 2)
    assert got[40] == (s(2), 1, 3)
    assert got[30] == (s(3), 1, 4)
    # topk cut
    top2 = R.rrf_fuse([a, b], k=60, topk=2)
    assert [r.doc_id for r in top2.collect()] == [20, 10]


def test_topk_is_take_ordered_not_global_window(spark, docs):
    """The global top-k must compile to TakeOrderedAndProject (per-
    partition partial top-k), never an unpartitioned row_number window
    over every scored row."""
    plan = R.bm25_topk(
        docs, "doc_id", "text", ["merge"], k=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_best_snippet_model(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c merge d e f g h i j k l m n o p q r s t u v w "
                "x y z merge merge stream a b c d"),
            (2, "nothing here at all"),
            (3, "merge"),
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: (r.start, r.hits, r.snippet)
        for r in R.best_snippet(
            docs, "doc_id", "text", ["merge", "stream"], window=8, stride=4
        ).collect()
    }
    # doc 1: windows at 0,4,...,32; the window at 24 covers words 25-32
    # ("x y z merge merge stream a b") with 3 hits — the max
    assert rows[1] == (24, 3, "x y z merge merge stream a b")
    assert rows[3] == (0, 1, "merge")
    assert 2 not in rows  # zero hits filtered
    # earliest window wins ties: two equal single-hit windows
    tie = spark.createDataFrame(
        [(9, "merge a b c d e f g h i j k l m n o merge")],
        "doc_id bigint, text string",
    )
    r = R.best_snippet(
        tie, "doc_id", "text", ["merge"], window=4, stride=16
    ).head()
    assert (r.start, r.hits) == (0, 1)


def test_bm25_batch_equals_per_query(spark, docs):
    """bm25_batch_topk must score each query exactly like a standalone
    bm25_topk call (shared stats, same idf/saturation/rounding)."""
    queries = spark.createDataFrame(
        [(1, ["merge", "stream"]), (2, ["filter"]), (3, ["zzz_absent"])],
        "qid bigint, terms array<string>",
    )
    batch = R.bm25_batch_topk(
        docs, "doc_id", "text", queries, "qid", "terms", k=10
    )
    got = {
        (r.qid, r.doc_id): (r.bm25, r.rank) for r in batch.collect()
    }
    for qid, terms in [(1, ["merge", "stream"]), (2, ["filter"])]:
        solo = {
            (qid, r.doc_id): (r.bm25, r.rank)
            for r in R.bm25_topk(docs, "doc_id", "text", terms, k=10).collect()
        }
        assert {k: v for k, v in got.items() if k[0] == qid} == solo
    assert not any(q == 3 for q, _ in got)  # absent term → no rows


def test_bm25_index_probe_matches_scan(spark, docs, tmp_path):
    """The persisted-index probe must score exactly like the corpus-scan
    bm25_topk, and a replayed add_batch must index nothing."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    eng = Engine(spark, str(tmp_path))
    idx = BM25Index(eng, "d")
    idx.create(docs)
    terms = ["merge", "stream", "filter"]
    got = [tuple(r) for r in idx.topk(terms, k=10).collect()]
    want = [
        tuple(r)
        for r in R.bm25_topk(docs, "doc_id", "text", terms, k=10).collect()
    ]
    assert got == want
    # add_batch: new ids index once; replays and known ids are dropped
    more = spark.createDataFrame(
        [(100, "merge merge stream"), (1, "already indexed")],
        "doc_id bigint, text string",
    )
    assert idx.add_batch(more) == 1
    assert idx.add_batch(more) == 0
    got2 = {r.doc_id: r.bm25 for r in idx.topk(terms, k=10).collect()}
    assert 100 in got2
    # reopen from storage
    idx2 = BM25Index.open(eng, "d")
    assert [tuple(r) for r in idx2.topk(terms, k=10).collect()] == [
        tuple(r) for r in idx.topk(terms, k=10).collect()
    ]
    with pytest.raises(ValueError, match="empty query"):
        idx.topk([])


def test_bm25_index_probe_skips_files(spark, docs, tmp_path):
    """The probe goes through scan_where: with several term-clustered
    postings files, a one-term query keeps a strict subset."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    eng = Engine(spark, str(tmp_path))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        idx = BM25Index(eng, "d")
        idx.create(docs)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    idx.topk(["merge"], k=3).collect()
    rep = dict(eng.last_scan_report)
    assert 0 < rep["files_kept"] < rep["files_total"]


def test_bm25_add_batch_plan_never_shuffles_corpus(spark, docs, tmp_path):
    """VERDICT r9: add_batch's dedup probe must stream the corpus
    (postings) scan MAP-SIDE against the broadcast batch ids — no
    sort-merge/shuffled join anywhere, no exchange between the semi-join
    and the corpus scan, and column pruning down to doc_id alone.  The
    only hash exchange allowed is the distinct over the ≤batch hit set
    ABOVE the semi-join."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    eng = Engine(spark, str(tmp_path))
    idx = BM25Index(eng, "d")
    idx.create(docs)
    batch = spark.createDataFrame(
        [(500, "merge x"), (1, "known")], "doc_id bigint, text string"
    )
    fresh = idx._fresh_batch(batch)
    assert fresh.count() == 1  # known id dropped, new id kept
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    lines = plan.splitlines()
    i_semi = next(i for i, l in enumerate(lines) if "LeftSemi" in l)
    # the first scan below the semi-join is its STREAMED child — the
    # postings corpus (the broadcast build side prints after it)
    i_scan = next(
        i for i, l in enumerate(lines) if i > i_semi and "FileScan" in l
    )
    # ... with nothing but the null filter between them (no exchange)
    between = lines[i_semi + 1 : i_scan]
    assert not any("Exchange" in l for l in between), between
    # column pruning reached the footer: only doc_id is read
    assert "FileScan parquet [doc_id" in lines[i_scan]
    # the anti-join also builds on the (small) broadcast side
    assert any("LeftAnti, BuildRight" in l for l in lines)


def test_bm25_add_batch_repairs_crash_window(spark, docs, tmp_path):
    """ADVICE r9: a crash between the doclens insert and the postings
    insert must not make the batch permanently unsearchable — the next
    add_batch of the same ids re-lands the postings WITHOUT duplicating
    the doclens rows, and the repaired index scores exactly like one
    built from scratch."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    eng = Engine(spark, str(tmp_path / "a"))
    idx = BM25Index(eng, "d")
    idx.create(docs)
    batch = spark.createDataFrame(
        [(200, "merge crashdoc crashdoc")], "doc_id bigint, text string"
    )
    orig_insert, state = eng.insert, {"crashed": False}

    def crashing(name, df, **kw):
        if name == "d_bm25_postings" and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("crash before postings insert")
        return orig_insert(name, df, **kw)

    eng.insert = crashing
    with pytest.raises(RuntimeError, match="crash before postings"):
        idx.add_batch(batch)
    eng.insert = orig_insert
    # the crash window: doclens landed, postings didn't
    assert eng.table("d_bm25_doclens").filter("doc_id = 200").count() == 1
    assert eng.table("d_bm25_postings").filter("doc_id = 200").count() == 0
    # replay repairs — counted as (re)indexed, doclens not duplicated
    assert idx.add_batch(batch) == 1
    assert eng.table("d_bm25_doclens").filter("doc_id = 200").count() == 1
    assert eng.table("d_bm25_postings").filter("doc_id = 200").count() == 2
    assert 200 in {r.doc_id for r in idx.topk(["crashdoc"], k=3).collect()}
    # a second replay is a clean no-op
    assert idx.add_batch(batch) == 0
    # repaired index ≡ from-scratch index over the same corpus
    eng2 = Engine(spark, str(tmp_path / "b"))
    idx2 = BM25Index(eng2, "d2")
    idx2.create(docs.unionByName(batch))
    terms = ["merge", "crashdoc", "stream"]
    assert [tuple(r) for r in idx.topk(terms, k=10).collect()] == [
        tuple(r) for r in idx2.topk(terms, k=10).collect()
    ]


def test_bm25_sync_cdc_matches_fresh_index(spark, docs, tmp_path):
    """VERDICT r9: the index must track corpus deletes/updates/inserts
    through the change feed — probe after sync ≡ a from-scratch index
    over the mutated corpus (n_docs/df corrected, stale postings gone),
    O(changed docs) sidecars only, and a replayed sync is a no-op in
    effect."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    eng = Engine(spark, str(tmp_path / "a"))
    eng.create_table("corpus", docs, keys=["doc_id"], versioned=True)
    idx = BM25Index(eng, "d")
    idx.create(eng.table("corpus"))
    v0 = eng.table_info("corpus")["version"]
    # mutate the corpus: delete 5, update 1 (new terms), insert 7
    eng.sql("DELETE FROM corpus WHERE doc_id = 5")
    eng.upsert(
        "corpus",
        spark.createDataFrame(
            [(1, "vector vector stream"), (7, "merge filter merge")],
            "doc_id bigint, text string",
        ),
    )
    stats = idx.sync_cdc("corpus", v0)
    assert stats["changed"] == 3 and stats["reindexed"] == 2
    assert stats["deleted_postings"] > 0 and stats["deleted_doclens"] == 2
    # doclens tracks the corpus exactly (n_docs/avgdl correct)
    assert (
        eng.table("d_bm25_doclens").count()
        == eng.table("corpus").count()
    )
    terms = ["merge", "stream", "vector", "filter"]
    got = [tuple(r) for r in idx.topk(terms, k=10).collect()]
    assert 5 not in {t[0] for t in got}  # deleted doc gone
    assert 7 in {t[0] for t in got}      # inserted doc searchable
    # ≡ from-scratch index over the mutated corpus (scores exact)
    eng2 = Engine(spark, str(tmp_path / "b"))
    idx2 = BM25Index(eng2, "d2")
    idx2.create(eng.table("corpus"))
    want = [tuple(r) for r in idx2.topk(terms, k=10).collect()]
    assert got == want
    # replayed sync: same feed, same final state, probe unchanged
    stats2 = idx.sync_cdc("corpus", v0)
    assert stats2["changed"] == 3
    assert [tuple(r) for r in idx.topk(terms, k=10).collect()] == want
    # empty feed (nothing changed since HEAD) is a true no-op
    v_now = eng.table_info("corpus")["version"]
    assert idx.sync_cdc("corpus", v_now)["changed"] == 0


def test_stream_bm25_ingest_and_optimize(spark, docs, tmp_path):
    """Streaming composition: a document stream upserts into the
    versioned corpus and the BM25 index syncs per micro-batch — probes
    equal a from-scratch index over the final corpus; optimize() then
    folds the accumulated DVs and re-clusters the postings without
    changing any probe."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index
    from polars_lake_spark.streaming.ingest import stream_bm25_ingest

    eng = Engine(spark, str(tmp_path / "a"))
    eng.create_table("corpus", docs, keys=["doc_id"], versioned=True)
    idx = BM25Index(eng, "d")
    idx.create(eng.table("corpus"))
    # stream = 1 update (doc 1 gets new terms) + 2 inserts
    batch = spark.createDataFrame(
        [
            (1, "vector vector stream"),
            (20, "merge filter merge"),
            (21, "stream stream filter"),
        ],
        "doc_id bigint, text string",
    )
    staging = str(tmp_path / "doc_stream")
    batch.repartition(2).write.parquet(staging)
    stream = spark.readStream.schema(batch.schema).parquet(staging)
    q = stream_bm25_ingest(
        eng, "d", stream, "corpus",
        checkpoint_dir=str(tmp_path / "ckpt_bm25"),
    )
    q.awaitTermination(180)
    assert eng.table("corpus").count() == 8
    terms = ["merge", "stream", "vector", "filter"]
    eng2 = Engine(spark, str(tmp_path / "b"))
    fresh = BM25Index(eng2, "d2")
    fresh.create(eng.table("corpus"))
    want = [tuple(r) for r in fresh.topk(terms, k=10).collect()]
    assert [tuple(r) for r in idx.topk(terms, k=10).collect()] == want
    # maintenance: DVs fold away, probes unchanged
    store = eng._snapstore("d_bm25_postings")
    assert (store.load().meta or {}).get("dv")  # sync left DVs behind
    idx.optimize()
    assert not (store.load().meta or {}).get("dv")
    assert [tuple(r) for r in idx.topk(terms, k=10).collect()] == want


def test_retrieval_metrics_model(spark):
    """retrieval_metrics vs a hand-computed model: exact-integer RR and
    recall, graded nDCG@k with log2 discount and ideal from qrels."""
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3), (2, 40, 1), (2, 50, 2)],
        "qid bigint, doc_id bigint, rank bigint",
    )
    qrels = spark.createDataFrame(
        [(1, 20, 2), (1, 30, 1), (1, 99, 3), (2, 77, 1)],
        "qid bigint, doc_id bigint, rel bigint",
    )
    got = {
        r.qid: (r.rr_e9, r.n_rel_ret, r.n_rel, r.recall_e6, r.ndcg)
        for r in R.retrieval_metrics(run, qrels, k=3).collect()
    }
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert got[1] == (
        500_000_000, 2, 3, 666_666, round(dcg / idcg, 6)
    )
    assert got[2] == (0, 0, 1, 0, 0.0)
    # layout independence
    got7 = {
        r.qid: (r.rr_e9, r.n_rel_ret, r.n_rel, r.recall_e6, r.ndcg)
        for r in R.retrieval_metrics(
            run.repartition(7), qrels.repartition(5), k=3
        ).collect()
    }
    assert got7 == got


def test_retrieval_metrics_unjudged_qid_kept(spark):
    """ADVICE r10: a qid present in the run but with ZERO judged-
    relevant docs must still come back — rr_e9=0, n_rel_ret=0, n_rel=0,
    recall_e6/ndcg NULL (undefined denominators surfaced, not rows
    silently dropped from the caller's average)."""
    run = spark.createDataFrame(
        [(1, 10, 1), (9, 70, 1), (9, 71, 2)],
        "qid bigint, doc_id bigint, rank bigint",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1)], "qid bigint, doc_id bigint, rel bigint"
    )
    got = {
        r.qid: (r.rr_e9, r.n_rel_ret, r.n_rel, r.recall_e6, r.ndcg)
        for r in R.retrieval_metrics(run, qrels, k=3).collect()
    }
    assert set(got) == {1, 9}
    assert got[1] == (1_000_000_000, 1, 1, 1_000_000, 1.0)
    assert got[9] == (0, 0, 0, None, None)


def test_retrieval_metrics_broadcasts_qrels_not_run(spark):
    """VERDICT r10 #2: the stated plan must be the real one.  qrels —
    the bounded human-judgment side — is the broadcast build of the
    rel join; the run (k·|Q| rows, |Q| can be millions) streams through
    with NO exchange between its source and the join.  BHJ LeftOuter
    only supports BuildRight, so broadcasting the preserved run side is
    impossible by construction — the docstring now says so."""
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 40, 1)],
        "qid bigint, doc_id bigint, rank bigint",
    )
    qrels = spark.createDataFrame(
        [(1, 20, 2), (2, 77, 1)], "qid bigint, doc_id bigint, rel bigint"
    )
    plan = (
        R.retrieval_metrics(run, qrels, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    i_join = next(
        i
        for i, l in enumerate(lines)
        if "BroadcastHashJoin" in l and "LeftOuter" in l
    )
    assert "BuildRight" in lines[i_join]
    # the streamed (run) child prints first under the join; nothing but
    # narrow ops may sit between it and its scan — no Exchange
    i_build = next(
        i
        for i, l in enumerate(lines)
        if i > i_join and "BroadcastExchange" in l
    )
    streamed = lines[i_join + 1 : i_build]
    assert not any("Exchange" in l for l in streamed), streamed


def _phrase_model(rows, phrase, k1=1.2, b=0.75):
    """Naive phrase-BM25: phrase tf = consecutive-occurrence count
    (overlaps allowed), phrase df = docs with >=1 occurrence, Lucene
    idf x saturation — the model phrase_topk must reproduce."""
    toks = {i: t.split() for i, t in rows}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    m = len(phrase)
    tfq = {}
    for i, w in toks.items():
        c = sum(
            1
            for s in range(len(w) - m + 1)
            if w[s : s + m] == phrase
        )
        if c:
            tfq[i] = c
    dfq = len(tfq)
    out = {}
    for i, tf in tfq.items():
        idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
        dl = len(toks[i])
        out[i] = round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 4
        )
    return out


def test_bm25_phrase_matches_python_model(spark, docs, tmp_path):
    """phrase_topk vs a naive scan model: exact consecutive matches
    only (docs with the words apart or reversed must NOT rank),
    overlapping occurrences counted, duplicate-word phrases handled."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    rows = [(r.doc_id, r.text) for r in docs.collect()]
    eng = Engine(spark, str(tmp_path))
    idx = BM25Index(eng, "d")
    idx.create(docs)
    for phrase in (
        ["merge", "join"],       # doc 1 only (has "merge join")
        ["stream", "stream"],    # overlapping: doc 5 has tf=4, doc 2 tf=0
        ["filter", "scan"],      # doc 3; doc 3 also has "scan filter"
        ["vector", "stream", "vector"],
        ["absent", "merge"],     # no match anywhere
    ):
        want = _phrase_model(rows, phrase)
        got = {
            r.doc_id: r.bm25 for r in idx.phrase_topk(phrase, k=10).collect()
        }
        assert got == want, phrase
    # single-word phrase degrades to that word with phrase-df scoring
    assert {
        r.doc_id for r in idx.phrase_topk(["vector"], k=10).collect()
    } == {2}
    with pytest.raises(ValueError, match="empty phrase"):
        idx.phrase_topk([])


def test_bm25_phrase_survives_add_batch_and_skips_files(spark, docs, tmp_path):
    """Positions written through add_batch must match create()'s, and
    the phrase probe goes through the SAME zone-map pruned scan as
    topk: a phrase over one term range keeps a strict file subset."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    eng = Engine(spark, str(tmp_path))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        idx = BM25Index(eng, "d")
        idx.create(docs)
        more = spark.createDataFrame(
            [(100, "merge join merge join"), (101, "join merge")],
            "doc_id bigint, text string",
        )
        assert idx.add_batch(more) == 2
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    rows = [(r.doc_id, r.text) for r in docs.collect()] + [
        (100, "merge join merge join"),
        (101, "join merge"),
    ]
    got = {
        r.doc_id: r.bm25
        for r in idx.phrase_topk(["merge", "join"], k=10).collect()
    }
    assert got == _phrase_model(rows, ["merge", "join"])
    rep = dict(eng.last_scan_report)
    assert 0 < rep["files_kept"] < rep["files_total"]


def test_bm25_index_positions_opt_out(spark, docs, tmp_path):
    """positions=False builds a positions-free index (Lucene
    DOCS_AND_FREQS): identical bag-of-words scores, no pos column,
    phrase_topk refuses with a clear error; open() re-detects the mode
    from the stored schema."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    eng = Engine(spark, str(tmp_path))
    idx = BM25Index(eng, "d", positions=False)
    idx.create(docs)
    assert "pos" not in eng.table("d_bm25_postings").columns
    got = [tuple(r) for r in idx.topk(["merge", "stream"], k=10).collect()]
    want = [
        tuple(r)
        for r in R.bm25_topk(
            docs, "doc_id", "text", ["merge", "stream"], k=10
        ).collect()
    ]
    assert got == want
    with pytest.raises(ValueError, match="positions=False"):
        idx.phrase_topk(["merge", "stream"])
    # add_batch writes the same positions-free schema
    more = spark.createDataFrame(
        [(100, "merge stream")], "doc_id bigint, text string"
    )
    assert idx.add_batch(more) == 1
    assert "pos" not in eng.table("d_bm25_postings").columns
    # open() detects the mode
    assert BM25Index.open(eng, "d").positions is False


def _sloppy_model(rows, phrase, slop, k1=1.2, b=0.75):
    """Ordered proximity model: tf = distinct starts p_0 admitting
    p_0 < p_1 < ... < p_{m-1} (p_i a position of phrase[i]) with
    (p_last - p_0) - (m-1) <= slop; scored as one pseudo-term."""
    import itertools

    toks = {i: t.split() for i, t in rows}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    m = len(phrase)
    tfq = {}
    for d, w in toks.items():
        pos = {
            i: [j + 1 for j, t in enumerate(w) if t == phrase[i]]
            for i in range(m)
        }
        starts = set()
        for combo in itertools.product(*[pos[i] for i in range(m)]):
            if all(combo[i] < combo[i + 1] for i in range(m - 1)) and (
                combo[-1] - combo[0]
            ) - (m - 1) <= slop:
                starts.add(combo[0])
        if starts:
            tfq[d] = len(starts)
    dfq = len(tfq)
    out = {}
    for d, tf in tfq.items():
        idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
        dl = len(toks[d])
        out[d] = round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 4
        )
    return out


def test_bm25_phrase_slop_matches_python_model(spark, docs, tmp_path):
    """Sloppy ordered phrase: gaps up to slop allowed, order enforced,
    tf = distinct valid starts (a start reachable through two different
    end positions counts ONCE); slop=0 via the join path's semantics
    must equal the exact intersection path."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.bm25_index import BM25Index

    rows = [(r.doc_id, r.text) for r in docs.collect()]
    eng = Engine(spark, str(tmp_path))
    idx = BM25Index(eng, "d")
    idx.create(docs)
    cases = [
        (["merge", "join"], 1),   # doc 1: only start 3 fits
        (["merge", "join"], 2),   # doc 1: starts 1 and 3 -> tf=2
        (["sort", "merge"], 2),   # two ends, ONE start -> tf=1
        (["join", "sort"], 3),    # reversed: order enforced, no match
        (["vector", "vector"], 1),  # duplicate word with a gap
        (["filter", "stream", "merge"], 2),  # 3-term with gaps (doc 3)
    ]
    for phrase, slop in cases:
        want = _sloppy_model(rows, phrase, slop)
        got = {
            r.doc_id: r.bm25
            for r in idx.phrase_topk(phrase, k=10, slop=slop).collect()
        }
        assert got == want, (phrase, slop)
    # slop=0 ordered-join semantics == the exact intersection fast path
    for phrase in (["merge", "join"], ["stream", "stream"]):
        want = _sloppy_model(rows, phrase, 0)
        got = {
            r.doc_id: r.bm25
            for r in idx.phrase_topk(phrase, k=10, slop=0).collect()
        }
        assert got == want, phrase
    with pytest.raises(ValueError, match="slop"):
        idx.phrase_topk(["merge"], slop=-1)
