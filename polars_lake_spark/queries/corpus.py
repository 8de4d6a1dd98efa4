"""Corpus-curation queries: dedup clustering (connected components),
deterministic sampling, and sequence packing — the steps between pairwise
dedup output and an actual training set.

All oracled: the operators are built on engine-independent determinism
(md5 hashes, explicit total orders), so DuckDB can replay them exactly —
the connected-components oracle is a recursive CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.functions import text as TX
from polars_lake_spark.operators import dedup as D
from polars_lake_spark.operators.graph import connected_components
from polars_lake_spark.operators.sampling import (
    chunk_words,
    hash_sample,
    md5_bucket,
    pack_sequences,
    stratified_sample,
)
from polars_lake_spark.queries import register
from polars_lake_spark.queries.pipeline import _JACCARD_ORACLE, _NORM_SQL
from polars_lake_spark.sources import load_table


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ({_JACCARD_ORACLE}) jp),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a)
    SELECT cluster_id, COUNT(*) AS n_docs,
           ARRAY_TO_STRING(LIST_SORT(ARRAY_AGG(doc_id)), ',') AS member_ids
    FROM comp GROUP BY cluster_id
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-dup pairs (MinHash-LSH @ 0.8, exact-verified) → transitive
    clusters via min-label propagation; oracle replays the closure with a
    recursive CTE. Members serialized to a sorted string (hashable)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_perm=128, bands=32, threshold=0.8
    )
    comps = connected_components(pairs, "d1", "d2")
    return comps.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.array_sort(F.collect_list("id")), ",").alias("member_ids"),
    )


@register(
    "dedup_clusters_twostar",
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ({_JACCARD_ORACLE}) jp),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a)
    SELECT cluster_id, COUNT(*) AS n_docs,
           ARRAY_TO_STRING(LIST_SORT(ARRAY_AGG(doc_id)), ',') AS member_ids
    FROM comp GROUP BY cluster_id
    """,
)
def dedup_clusters_twostar(spark, sf_dir):
    """Same clusters as ``dedup_clusters`` via the large-star/small-star
    algorithm, FORCED onto the distributed path (local_threshold=0) so
    the gate exercises the O(log^2 n)-round strategy a long-chain graph
    needs at 100 TB. Shares the recursive-CTE closure oracle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_perm=128, bands=32, threshold=0.8
    )
    comps = connected_components(
        pairs, "d1", "d2", local_threshold=0, algorithm="two_star"
    )
    return comps.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.array_sort(F.collect_list("id")), ",").alias("member_ids"),
    )


@register(
    "sample_hash",
    oracle="""
    SELECT doc_id,
           CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 100 AS bucket
    FROM documents
    WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 100 < 20
    """,
)
def sample_hash(spark, sf_dir):
    """~20% reproducible split by content hash — stable under reruns,
    appends, and repartitioning (df.sample is not)."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = hash_sample(docs, "text", pct=20)
    return sampled.select("doc_id", md5_bucket(F.col("text")).alias("bucket"))


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang FROM documents
    QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) <= 10
    """,
)
def sample_stratified(spark, sf_dir):
    """Deterministic 10-per-language draw (hash-ordered within stratum)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "text", "doc_id", 10).select(
        "doc_id", "lang"
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
                      len(string_split({_NORM_SQL}, ' ')) AS tokens
               FROM documents)
    SELECT doc_id, shard, CAST(tokens AS BIGINT) AS tokens,
           CAST((SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
                // 512 AS BIGINT) AS pack_id
    FROM t
    """,
)
def pack_sequences_query(spark, sf_dir):
    """Concat-then-chunk sequence packing: which 512-token window each
    document starts in, per shard (deterministic id order)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, "doc_id", TX.ws_token_count(F.col("text")), budget=512, n_shards=4
    )
    return packed.select(
        "doc_id", "shard", F.col("tokens").cast("bigint").alias("tokens"), "pack_id"
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM t),
    tf AS (SELECT doc_id, w, COUNT(*) AS c FROM toks WHERE w <> ''
           GROUP BY doc_id, w),
    dfreq AS (SELECT w, COUNT(*) AS dfreq FROM tf GROUP BY w),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf)
    SELECT doc_id, w AS term,
           ROUND(c * (LN((n_docs + 1.0) / (dfreq + 1.0)) + 1), 6) AS tfidf
    FROM tf JOIN dfreq USING (w) CROSS JOIN n
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY doc_id
        ORDER BY ROUND(c * (LN((n_docs + 1.0) / (dfreq + 1.0)) + 1), 6) DESC, w
    ) <= 3
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    """Per-doc top-3 TF-IDF terms (functions/text.py:tfidf_top_terms):
    the canonical corpus-weighting operator — scores rounded before
    ranking so the order is engine-independent."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.tfidf_top_terms(docs, "doc_id", "text", k=3)


@register(
    "text_pmi_bigrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws
               FROM documents),
    uni AS (SELECT w, COUNT(*) AS cw
            FROM (SELECT unnest(ws) AS w FROM t) WHERE w <> '' GROUP BY w),
    bi AS (SELECT b, COUNT(*) AS cb
           FROM (SELECT unnest(list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i+1])) AS b FROM t)
           GROUP BY b HAVING COUNT(*) >= 5),
    nu AS (SELECT SUM(cw) AS n_uni FROM uni),
    nb AS (SELECT SUM(cb) AS n_bi FROM bi)
    SELECT b AS bigram, cb,
           ROUND(LN((cb / n_bi) /
                 ((u1.cw / n_uni) * (u2.cw / n_uni))), 6) AS pmi
    FROM bi
    JOIN uni u1 ON u1.w = string_split(b, ' ')[1]
    JOIN uni u2 ON u2.w = string_split(b, ' ')[2]
    CROSS JOIN nu CROSS JOIN nb
    ORDER BY pmi DESC, bigram
    LIMIT 25
    """,
)
def text_pmi_bigrams(spark, sf_dir):
    """Top collocations by pointwise mutual information
    (functions/text.py:pmi_bigrams) — adjacent-pair counts vs unigram
    marginals, rare-bigram noise guard, fully distributed."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.pmi_bigrams(docs, "doc_id", "text", min_count=5, top=25)


@register(
    "decontaminate_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws
               FROM documents),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, len(ws) - 3),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                           || ws[i+3] || ' ' || ws[i+4]))) AS g
        FROM t WHERE len(ws) >= 5
    ),
    bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0),
    contaminated AS (
        SELECT DISTINCT doc_id FROM sh
        WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench)
    )
    SELECT doc_id FROM t
    WHERE doc_id % 50 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ORDER BY doc_id
    """,
)
def decontaminate_overlap(spark, sf_dir):
    """Benchmark decontamination: drop training documents sharing any
    5-gram with the held-out set (here: doc_id%50=0 plays the benchmark).
    The benchmark shingle set is orders smaller than the corpus →
    broadcast semi/anti join against the exploded training shingles; at
    100 TB the training side stays map-side streaming.  The standard
    train/test-overlap removal step of LLM data pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", n=5)
    exploded = sh.select("id", F.explode("shingles").alias("g"))
    bench_g = exploded.filter(F.col("id") % 50 == 0).select("g").distinct()
    train = exploded.filter(F.col("id") % 50 != 0)
    contaminated = train.join(F.broadcast(bench_g), "g", "left_semi").select("id").distinct()
    train_ids = (
        docs.filter(F.col("doc_id") % 50 != 0)
        .filter(F.size(F.split(TX.normalized(F.col("text")), " ")) >= 5)
        .select(F.col("doc_id"))
    )
    short_ids = docs.filter(F.col("doc_id") % 50 != 0).filter(
        F.size(F.split(TX.normalized(F.col("text")), " ")) < 5
    ).select("doc_id")
    clean = train_ids.join(
        contaminated.withColumnRenamed("id", "doc_id"), "doc_id", "left_anti"
    ).unionByName(short_ids)
    return clean.orderBy("doc_id")


@register(
    "text_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws
               FROM documents),
    g AS (SELECT doc_id,
                 list_transform(range(1, len(ws) - 1),
                                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                 AS gs
          FROM t WHERE len(ws) >= 3)
    SELECT doc_id,
           CAST(len(gs) AS BIGINT) AS n_grams,
           ROUND(1.0 - len(list_distinct(gs)) * 1.0 / len(gs), 8) AS dup_frac
    FROM g
    """,
)
def text_repetition(spark, sf_dir):
    """Intra-document repetition signal (the Gopher/C4-style quality
    rule): fraction of duplicated word 3-grams per doc — high values mark
    boilerplate/spam. Pure map-side array expressions."""
    from polars_lake_spark.operators.dedup import let_bound

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(TX.normalized(F.col("text")), " ")

    # ws and grams are let-bound: the per-gram lambda would otherwise
    # re-split the document per element, and the three grams references
    # would rebuild the gram array (see dedup.let_bound).
    def _stats(words_arr):
        def _of_grams(grams):
            return F.struct(
                F.size(grams).cast("bigint").alias("n_grams"),
                F.round(
                    1.0 - F.size(F.array_distinct(grams)) / F.size(grams), 8
                ).alias("dup_frac"),
            )

        grams = F.transform(
            F.sequence(F.lit(1), F.size(words_arr) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words_arr, i),
                F.element_at(words_arr, i + 1),
                F.element_at(words_arr, i + 2),
            ),
        )
        return let_bound(grams, _of_grams)

    return (
        docs.filter(F.size(ws) >= 3)
        .select("doc_id", let_bound(ws, _stats).alias("_r"))
        .select("doc_id", "_r.n_grams", "_r.dup_frac")
    )


@register(
    "chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({{norm}}, ' ') AS ws FROM documents),
    n AS (SELECT doc_id, ws,
            GREATEST(1, CAST(ceil((len(ws) - 8) / 24.0) AS INTEGER)) AS n_chunks
          FROM t),
    c AS (SELECT doc_id, ws, UNNEST(range(0, n_chunks)) AS chunk_id FROM n),
    s AS (SELECT doc_id, chunk_id,
            list_slice(ws, chunk_id * 24 + 1, chunk_id * 24 + 32) AS chunk
          FROM c)
    SELECT doc_id, chunk_id,
           len(chunk) AS n_chunk_words,
           ARRAY_TO_STRING(chunk, ' ') AS chunk_text
    FROM s
    """.replace("{norm}", _NORM_SQL),
)
def chunk_documents(spark, sf_dir):
    """Sliding-window chunking (window=32 words, overlap=8): the
    context-window prep step before embedding / packing. Map-side only
    (sequence + explode + slice) — output scales linearly with corpus
    tokens, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(TX.normalized(F.col("text")), " ")
    return chunk_words(docs, "doc_id", ws, window=32, overlap=8)


@register(
    "domain_mix_weights",
    oracle=f"""
    WITH s AS (SELECT source, COUNT(*) AS n_docs,
                      CAST(SUM(len(string_split({_NORM_SQL}, ' '))) AS BIGINT)
                          AS n_tokens
               FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 COUNT(*) AS n_sources
          FROM s)
    SELECT source, n_docs, n_tokens,
           ROUND(n_docs * 1.0 / total_docs, 8) AS doc_share,
           ROUND(n_tokens * 1.0 / total_tokens, 8) AS token_share,
           ROUND(total_docs * 1.0 / (n_sources * n_docs), 8) AS uniform_weight
    FROM s CROSS JOIN t
    """,
)
def domain_mix_weights(spark, sf_dir):
    """Data-mixture rebalancing table (the domain-weighting step of corpus
    assembly): per-source doc/token counts, corpus shares, and the
    resampling weight that would equalize source shares. One groupBy on
    source + a 1-row broadcast of the totals — the per-source table stays
    tiny however big the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.word_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    t = s.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.col("total_docs"), 8).alias("doc_share"),
        F.round(F.col("n_tokens") / F.col("total_tokens"), 8).alias("token_share"),
        F.round(
            F.col("total_docs") / (F.col("n_sources") * F.col("n_docs")), 8
        ).alias("uniform_weight"),
    )


@register(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ({_JACCARD_ORACLE}) jp),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a),
    dropped AS (SELECT doc_id FROM comp WHERE cluster_id <> doc_id)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split({_NORM_SQL}, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    GROUP BY lang
    """,
)
def dedup_survivors(spark, sf_dir):
    """End of the dedup pipeline: keep the canonical (min-id) doc per
    near-dup cluster plus all singletons, then account the surviving
    corpus per language. The dropped set is tiny relative to the corpus,
    so the anti-join broadcasts; the only big-data shuffle is the final
    per-lang aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_perm=128, bands=32, threshold=0.8
    )
    comps = connected_components(pairs, "d1", "d2")
    dropped = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    surv = docs.join(F.broadcast(dropped), "doc_id", "left_anti")
    return surv.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.word_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )


@register(
    "boilerplate_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({{norm}}, ' ') AS ws FROM documents),
    n AS (SELECT doc_id, ws,
            GREATEST(1, CAST(ceil(len(ws) / 16.0) AS INTEGER)) AS n_chunks
          FROM t),
    c AS (SELECT doc_id, ws, UNNEST(range(0, n_chunks)) AS chunk_id FROM n),
    s AS (SELECT doc_id,
            md5(ARRAY_TO_STRING(list_slice(ws, chunk_id * 16 + 1,
                                           chunk_id * 16 + 16), ' ')) AS fp
          FROM c)
    SELECT fp, COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences,
           MIN(doc_id) AS example_doc
    FROM s GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
    """.replace("{norm}", _NORM_SQL),
)
def boilerplate_chunks(spark, sf_dir):
    """Cross-document repeated spans (the C4/RefinedWeb boilerplate-removal
    signal): non-overlapping 16-word chunks that recur in >= 2 distinct
    documents, keyed by md5 fingerprint. Chunking is map-side; the only
    shuffle is the groupBy on the fingerprint — at 100 TB that shuffle
    carries 16-byte hashes, not text."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(TX.normalized(F.col("text")), " ")
    chunks = chunk_words(docs, "doc_id", ws, window=16, overlap=0)
    return (
        chunks.select("doc_id", F.md5(F.col("chunk_text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      unnest(string_split({_NORM_SQL}, ' ')) AS w
               FROM documents),
    tk AS (SELECT doc_id, w FROM t WHERE w <> ''),
    uni AS (SELECT w, COUNT(*) AS cw FROM tk GROUP BY w),
    tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS total FROM uni)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(ROUND(SUM(LN(cw * 1.0 / total)) * 10000) AS BIGINT)
               AS sum_lp_e4
    FROM tk JOIN uni USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Corpus-fitted unigram LM score per document (the CCNet-style
    fluency/quality signal): avg token log-probability under the corpus
    unigram distribution. Two shuffles (vocab count, per-doc aggregate);
    the vocab join broadcasts when small, hash-joins otherwise. Output
    is the midpoint-free scaled-integer sum (sum_lp_e4 = round(sum*1e4)
    as BIGINT, divide by n_tokens for the average) — an 8dp-rounded
    quotient landed exactly on 5e-9 midpoints at sf0.1."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(TX.normalized(F.col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot = uni.agg(F.sum("cw").cast("bigint").alias("total"))
    lp = (
        toks.join(uni, "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log(F.col("cw") / F.col("total")).alias("lp"))
    )
    # scaled-INTEGER sum, same midpoint-free form as text_bigram_logprob
    return lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("lp") * 10000)
        .cast("bigint")
        .alias("sum_lp_e4"),
    )


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    bg AS (SELECT doc_id,
                  unnest(w[1:len(w)-1]) AS w1,
                  unnest(w[2:len(w)]) AS w2
           FROM t WHERE len(w) >= 2),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT x) AS nv FROM
              (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS x
               FROM documents) q WHERE x <> '')
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(ROUND(SUM(LN((c12 + 1.0) / (c1 + nv))) * 10000) AS BIGINT)
               AS sum_lp_e4
    FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Corpus-fitted BIGRAM LM score per document with add-one smoothing
    (one order up from text_unigram_logprob — the n-gram-LM fluency
    signal CCNet-style pipelines use; word salad scores near the
    smoothing floor, coherent prose above it):
    P(w2|w1) = (c12 + 1) / (c1_ctx + |V|), c1_ctx = occurrences of w1 as
    a bigram context (proper normalization: the smoothed row sums to 1).

    Shuffles: bigram count, context roll-up (tiny), per-doc aggregate;
    the model joins broadcast when small, hash-join otherwise.  Count
    arithmetic is all-integer; the output is the midpoint-free
    scaled-integer sum (sum_lp_e4, divide by n_bigrams for the average)
    — same discipline as text_unigram_logprob."""
    words = F.split(TX.normalized(F.col("text")), " ")
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", words.alias("w"))
    # let_bound: the pair builder references the split THREE times
    # (sequence bound + two element_at) — CollapseProject would inline
    # the normalize+split into each reference (the HOF-recompute class).
    bigrams_of = lambda w: F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.struct(
            F.element_at(w, i).alias("w1"),
            F.element_at(w, i + 1).alias("w2"),
        ),
    )
    bg = (
        base.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(D.let_bound(F.col("w"), bigrams_of)).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    vocab = (
        base.select(F.explode("w").alias("x"))
        .filter(F.col("x") != "")
        .agg(F.countDistinct("x").alias("nv"))
    )
    lp = (
        bg.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("nv"))).alias(
                "lp"
            ),
        )
    )
    # scaled-INTEGER sum (gotcha: a 4dp-rounded sum divided by a small
    # count lands exactly on 8dp rounding midpoints — sf0.1 flipped one
    # doc's last digit between engines; consumers divide by n_bigrams)
    return lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("lp") * 10000)
        .cast("bigint")
        .alias("sum_lp_e4"),
    )


# Deterministic synthetic PII (the fixture corpus is word salad with no
# real PII), same synth→operate→verify pattern as the multimodal image
# roundtrip: the scrub operators are real, the planted PII is derived
# from doc_id so the oracle can replay it.
_PII_SYNTH_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com "
    "or call 555-' || CAST(doc_id % 1000 AS VARCHAR) || ' now'"
)


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_PII_SYNTH_SQL} AS synth FROM documents),
    r AS (SELECT doc_id,
                 len(regexp_extract_all(synth, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+'))
                     AS n_emails,
                 len(regexp_extract_all(synth, '555-[0-9]+')) AS n_phones,
                 regexp_replace(
                     regexp_replace(synth, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+',
                                    '<EMAIL>', 'g'),
                     '555-[0-9]+', '<PHONE>', 'g') AS scrubbed
          FROM s)
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_phones AS BIGINT) AS n_phones,
           md5(scrubbed) AS scrubbed_md5
    FROM r
    """,
)
def text_pii_scrub(spark, sf_dir):
    """PII redaction (emails, phone numbers) with per-doc redaction
    counts — pure map-side regexp chain, the pre-training scrub pass.
    PII is planted deterministically from doc_id (see _PII_SYNTH_SQL);
    output carries the md5 of the scrubbed text so the oracle verifies
    the exact redacted string, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        (F.col("doc_id") % 1000).cast("string"),
        F.lit(" now"),
    )
    email_re = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    phone_re = "555-[0-9]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace(synth, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(synth, F.lit(email_re)).cast("bigint").alias("n_emails"),
        F.regexp_count(synth, F.lit(phone_re)).cast("bigint").alias("n_phones"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
    )


@register(
    "domain_resample",
    oracle="""
    WITH s AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT MIN(n) AS mn FROM s)
    SELECT doc_id, lang FROM documents
    JOIN s USING (lang) CROSS JOIN m
    WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1000000
          < CAST(floor(mn * 1000000.0 / n) AS BIGINT)
    """,
)
def domain_resample(spark, sf_dir):
    """Apply the mixture weights: deterministically downsample every
    language toward the smallest language's share (content-hash
    thresholds, so the draw is reproducible under reruns/appends/
    partitioning — the same property as sample_hash; en is ~3x
    over-represented in the fixtures, so this actually subsamples).
    The per-group rate table is tiny and broadcast; the filter itself
    is map-side."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    m = s.agg(F.min("n").alias("mn"))
    rates = s.crossJoin(F.broadcast(m)).select(
        "lang",
        F.floor(F.col("mn") * 1_000_000.0 / F.col("n")).cast("bigint").alias("thr"),
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(md5_bucket(F.col("text"), 1_000_000) < F.col("thr"))
        .select("doc_id", "lang")
    )


@register(
    "token_heavy_hitters",
    oracle=f"""
    WITH toks AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w
                  FROM documents),
    t AS (SELECT w AS token, COUNT(*) AS cnt FROM toks
          WHERE w <> '' GROUP BY w)
    SELECT token, cnt FROM t ORDER BY cnt DESC, token LIMIT 50
    """,
)
def token_heavy_hitters(spark, sf_dir):
    """Exact corpus top-50 tokens via the two-pass Misra-Gries pattern:
    sketch pass (tokens never shuffle — only <= capacity+1 summary rows
    per partition do) proposes candidates, second pass counts ONLY the
    candidates (broadcast semi join). Provably equal to the global top-k
    because the 50th token's count >> n/capacity; the oracle replays the
    naive full groupBy, which is affordable at gate SF."""
    from polars_lake_spark.operators.heavy import heavy_hitters_exact_topk

    docs = load_table(spark, sf_dir, "documents")
    return heavy_hitters_exact_topk(docs, "text", k=50, capacity=4096)


def _mg_guarantee_summary(docs, sk, capacity):
    """Shared MG-contract check (ONE definition — both oracled gates
    below must enforce the identical bound): given a merged sketch
    ``sk`` (token, est_count), emit the one-row
    (tokens_checked, violations) summary vs exact counts. Violations:
    a token with true count > n/m missing; any overcount; any
    undercount beyond n/m. Integer thresholds (c*m > n) — no float
    boundary to flap."""
    toks = docs.select(
        F.explode(F.filter(TX.words(F.col("text")), lambda w: w != "")).alias(
            "token"
        )
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = exact.agg(F.sum("c").alias("n"))
    j = exact.join(sk, "token", "left").crossJoin(F.broadcast(tot))
    guaranteed = F.col("c") * capacity > F.col("n")
    viol = (
        F.when(guaranteed & F.col("est_count").isNull(), 1)
        .when(F.col("est_count") > F.col("c"), 1)
        .when(
            F.col("est_count").isNotNull()
            & ((F.col("c") - F.col("est_count")) * capacity > F.col("n")),
            1,
        )
        .otherwise(0)
    )
    return j.agg(
        F.coalesce(
            F.sum(F.when(guaranteed, 1).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("tokens_checked"),
        F.coalesce(F.sum(viol), F.lit(0)).cast("bigint").alias("violations"),
    )


@register(
    "heavy_hitters_check",
    oracle=f"""
    WITH toks AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w
                  FROM documents),
    t AS (SELECT w, COUNT(*) AS c FROM toks WHERE w <> '' GROUP BY w),
    tot AS (SELECT SUM(c) AS n FROM t)
    SELECT (SELECT COUNT(*) FROM t, tot WHERE c * 64 > n) AS tokens_checked,
           CAST(0 AS BIGINT) AS violations
    """,
)
def heavy_hitters_check(spark, sf_dir):
    """Misra-Gries guarantee companion (same pattern as
    approx_distinct_check): with capacity m=64 — small enough that trims
    actually fire at gate SF — the one-row MG-contract summary
    (_mg_guarantee_summary) over the one-shot merged sketch."""
    from polars_lake_spark.operators.heavy import heavy_hitters

    capacity = 64
    docs = load_table(spark, sf_dir, "documents")
    sk = heavy_hitters(docs, "text", capacity=capacity)
    return _mg_guarantee_summary(docs, sk, capacity)


@register(
    "heavy_hitters_incremental_check",
    oracle=f"""
    WITH toks AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w
                  FROM documents),
    t AS (SELECT w, COUNT(*) AS c FROM toks WHERE w <> '' GROUP BY w),
    tot AS (SELECT SUM(c) AS n FROM t)
    SELECT (SELECT COUNT(*) FROM t, tot WHERE c * 64 > n) AS tokens_checked,
           CAST(0 AS BIGINT) AS violations
    """,
)
def heavy_hitters_incremental_check(spark, sf_dir):
    """Incremental variant of heavy_hitters_check: the corpus arrives as
    two disjoint batches, each folded into its own partition sketches,
    merged and globally trimmed (the HeavyHittersIndex.add_batch path,
    run operator-level). The MG guarantee must survive the merge: any
    token with true corpus count > n/m present, no overcount, undercount
    ≤ n/m. Identical oracle to heavy_hitters_check — the whole point of
    mergeable summaries is that batching must not change the contract."""
    from polars_lake_spark.operators.heavy import (
        mg_global_trim,
        mg_sketch_partitions,
    )

    capacity = 64
    docs = load_table(spark, sf_dir, "documents")
    merged_items = None
    for i in range(2):
        sk = mg_sketch_partitions(
            docs.filter(F.col("doc_id") % 2 == i), "text", capacity
        ).filter(F.col("token").isNotNull()).select("token", "cnt")
        merged_items = sk if merged_items is None else (
            merged_items.unionByName(sk)
        )
    merged = merged_items.groupBy("token").agg(F.sum("cnt").alias("cnt"))
    trimmed, _ = mg_global_trim(merged, capacity)
    sk = trimmed.withColumnRenamed("cnt", "est_count")
    return _mg_guarantee_summary(docs, sk, capacity)


@register(
    "pack_sequences_ffd_check",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS docs_packed,
           CAST(0 AS BIGINT) AS violations
    FROM documents
    """,
)
def pack_sequences_ffd_check(spark, sf_dir):
    """First-fit-decreasing packing contract (rows-only assignments are
    engine-replayable but not SQL-replayable, so the gate checks the
    GUARANTEES): every document packed exactly once, no multi-doc pack
    over budget, and per shard AT MOST ONE pack at or below half
    capacity — the classic first-fit invariant (two half-empty packs
    p < q contradict FFD: q's opening item, itself <= budget/2, would
    have fit p). Unlike a bound against an OPT *lower bound* — which a
    provably-optimal packing can exceed — this holds for every FFD run.
    One summary row; the oracle derives docs_packed and pins
    violations=0."""
    from polars_lake_spark.operators.sampling import pack_sequences_ffd

    budget = 512
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences_ffd(
        docs, "doc_id", TX.ws_token_count(F.col("text")), budget=budget,
        n_shards=4,
    ).localCheckpoint()  # consumed by four actions below — pack once
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tokens").alias("total")
    ).localCheckpoint()
    over = per_pack.filter(
        (F.col("n_docs") > 1) & (F.col("total") > budget)
    ).count()
    half_empty = per_pack.filter(F.col("total") * 2 <= budget).groupBy(
        "shard"
    ).count()
    bound = half_empty.filter(F.col("count") > 1).count()
    dup = packed.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    return packed.agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_packed"),
        (F.lit(over) + F.lit(bound) + F.lit(dup)).cast("bigint").alias(
            "violations"
        ),
    )


@register(
    "domain_resample_temperature",
    oracle="""
    WITH s AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT MIN(n) AS mn FROM s)
    SELECT doc_id, lang FROM documents
    JOIN s USING (lang) CROSS JOIN m
    WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1000000
          < CAST(floor(1000000.0 * pow(mn * 1.0 / n, 0.7)) AS BIGINT)
    """,
)
def domain_resample_temperature(spark, sf_dir):
    """Temperature-scaled mixture resampling (XLM-R-style alpha
    smoothing, alpha=0.3): acceptance rate (n_min/n_l)^(1-alpha) per
    language — interpolates between no resampling (alpha=1) and the
    uniform `domain_resample` (alpha=0), keeping head domains dominant
    but boosting the tail's relative share.  Same deterministic
    content-hash draw (rerun/append/partitioning-stable), broadcast rate
    table, map-side filter."""
    alpha = 0.3
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    m = s.agg(F.min("n").alias("mn"))
    rates = s.crossJoin(F.broadcast(m)).select(
        "lang",
        F.floor(
            1_000_000.0 * F.pow(F.col("mn") / F.col("n"), F.lit(1 - alpha))
        )
        .cast("bigint")
        .alias("thr"),
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(md5_bucket(F.col("text"), 1_000_000) < F.col("thr"))
        .select("doc_id", "lang")
    )


@register(
    "scrub_repeated_spans",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    ch AS (SELECT doc_id,
                  unnest(list_transform(range(0, (len(w) + 7) // 8),
                      i -> struct_pack(idx := i,
                          chunk := array_to_string(w[i*8+1 : i*8+8], ' '))))
                      AS c
           FROM t),
    f AS (SELECT doc_id, c.idx AS idx, c.chunk AS chunk,
                 MIN(c.idx) OVER (PARTITION BY doc_id, c.chunk) AS first_idx
          FROM ch),
    kept AS (SELECT doc_id, idx, chunk FROM f WHERE idx = first_idx)
    SELECT doc_id,
           COUNT(*) AS n_kept,
           md5(string_agg(chunk, ' ' ORDER BY idx)) AS scrubbed_md5
    FROM kept GROUP BY doc_id
    """,
)
def scrub_repeated_spans(spark, sf_dir):
    """Intra-document repeated-span REMOVAL (the scrub counterpart of
    text_repetition's measurement — boilerplate paragraphs repeated
    inside one page are a classic crawl artifact): split each doc into
    non-overlapping 8-word chunks, keep only each chunk's FIRST
    occurrence, reassemble in order.  Deterministic (first-occurrence
    rule over the chunk index), so DuckDB replays it exactly; the
    output hashes the scrubbed text so the full reassembly is
    value-checked.  Shape: map-side chunking, one shuffle on
    (doc, chunk) for the first-occurrence window, order restored by
    chunk index."""
    docs = D.parallelize_for_cpu(load_table(spark, sf_dir, "documents"))
    words = F.split(TX.normalized(F.col("text")), " ")
    chunks_of = lambda w: F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(w) / 8).cast("int") - 1),
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)).alias("chunk"),
        ),
    )
    ch = docs.select(
        "doc_id", F.explode(D.let_bound(words, chunks_of)).alias("c")
    ).select("doc_id", F.col("c.idx").alias("idx"), F.col("c.chunk").alias("chunk"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id", "chunk")
    kept = (
        ch.withColumn("first_idx", F.min("idx").over(w))
        .filter(F.col("idx") == F.col("first_idx"))
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("idx", "chunk"))).chunk
            ).cast("binary")
        ).alias("scrubbed_md5"),
    )
