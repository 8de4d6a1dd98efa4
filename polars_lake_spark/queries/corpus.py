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
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(TX.normalized(F.col("text")), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + 1), F.element_at(ws, i + 2)
        ),
    )
    return (
        docs.filter(F.size(ws) >= 3)
        .select(
            "doc_id",
            F.size(grams).cast("bigint").alias("n_grams"),
            F.round(
                1.0 - F.size(F.array_distinct(grams)) / F.size(grams), 8
            ).alias("dup_frac"),
        )
    )
