"""Text-analysis column functions for training-data pipelines.

All pure built-in expressions (whole-stage codegen, no Python UDFs):
language-ID heuristic, quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# n-gram-marker language heuristic: surface markers per language checked in
# a fixed order (deterministic CASE).
LANG_MARKERS = [
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " la ", " et "]),
    ("es", [" el ", " los ", " y "]),
    ("en", [" the ", " and ", " is "]),
]

# BPE-ish token pattern: letter runs, digit runs, single other non-space.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_CLASS = r"[^.,!?;:]"


def normalized(col) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(col) -> Column:
    return F.split(normalized(col), " ")


def word_count(col) -> Column:
    return F.size(words(col))


def avg_word_len(col) -> Column:
    w = words(col)
    # characters excluding separators / word count
    return F.length(F.regexp_replace(normalized(col), " ", "")) / F.size(w)


def stopword_ratio(col) -> Column:
    w = words(col)
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return hits / F.size(w)


def punct_ratio(col) -> Column:
    return F.length(F.regexp_replace(col, PUNCT_CLASS, "")) / F.greatest(
        F.length(col), F.lit(1)
    )


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: longer docs up to ~100 words are
    better, punctuation-noise is penalized, stopword presence rewarded."""
    return (
        F.least(F.lit(1.0), word_count(col) / F.lit(100.0))
        * (1 - punct_ratio(col))
        * (0.5 + 0.5 * F.least(F.lit(1.0), stopword_ratio(col) * 5))
    )


def lang_id(col) -> Column:
    """Marker-word language guess; 'und' (undetermined) when nothing hits."""
    padded = F.concat(F.lit(" "), normalized(col), F.lit(" "))
    expr = None
    guess = F.lit("und")
    for lang, markers in reversed(LANG_MARKERS):
        cond = None
        for m in markers:
            c = padded.contains(m)
            cond = c if cond is None else (cond | c)
        guess = F.when(cond, lang).otherwise(guess)
        expr = guess
    return expr


def ws_token_count(col) -> Column:
    return F.size(words(col))


def bpe_token_count(col) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def subword_estimate(col) -> Column:
    """The classic chars/4 token estimate."""
    return F.ceil(F.length(col) / F.lit(4.0)).cast("bigint")


def fingerprint_md5(col) -> Column:
    return F.md5(normalized(col).cast("binary"))


def fingerprint_sha256(col) -> Column:
    return F.sha2(normalized(col).cast("binary"), 256)


def fingerprint_prefix(col, n: int = 12) -> Column:
    """Short fingerprint for bucketing/joining at scale."""
    return F.substring(fingerprint_md5(col), 1, n)


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Per-document top-k terms by smoothed TF-IDF.

    tfidf = tf · (ln((N+1)/(df+1)) + 1), tf = raw in-doc term count,
    df = #docs containing the term, N = #docs with ≥1 term.  All
    distributed built-ins: explode → two grouped aggregates sharing the
    term shuffle key → window top-k per doc.  The corpus size N rides a
    broadcast 1-row cross join (no driver round-trip).  Scores are
    rounded (6dp) BEFORE the ranking so the order — and therefore the
    result — is reproducible across engines (ln differs by ≤1 ulp
    between libm and the JVM).
    """
    from pyspark.sql.window import Window

    from polars_lake_spark.operators.dedup import parallelize_for_cpu

    toks = (
        parallelize_for_cpu(df)
        .select(F.col(id_col).alias("doc_id"), F.explode(words(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = tf.select("doc_id").distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("c")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("dfreq") + 1.0))
                    + 1.0
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", F.col("w").alias("term"), "tfidf")
    )


def pmi_bigrams(df, id_col: str, text_col: str, min_count: int = 5, top: int = 25):
    """Corpus collocations: top bigrams by pointwise mutual information.

    PMI = ln(p(xy) / (p(x)·p(y))) over adjacent word pairs; rare bigrams
    (< min_count) are dropped before ranking (the classic noise guard).
    One explode for unigrams, one for bigrams; counts are map-side
    partial aggregates.
    """
    from polars_lake_spark.operators.dedup import let_bound, parallelize_for_cpu

    df = parallelize_for_cpu(df)

    # Guard size<2: F.sequence(1, 0) would DESCEND ([1,0]) and index 0.
    # The split is let-bound — referencing it from the per-bigram lambda
    # would re-split the document per element (see dedup.let_bound).
    def _bigrams(ws):
        return F.when(F.size(ws) >= 2, F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                ),
            ),
            lambda s: s != " ",
        )).otherwise(F.array().cast("array<string>"))

    ws = words(F.col(text_col))
    bigrams = let_bound(ws, _bigrams)
    uni = (
        df.select(F.explode(ws).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    bi = (
        df.select(F.explode(bigrams).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cb"))
        .filter(F.col("cb") >= min_count)
    )
    n_uni = uni.agg(F.sum("cw").alias("n_uni"))
    n_bi = bi.agg(F.sum("cb").alias("n_bi"))
    x = F.split(F.col("b"), " ").getItem(0)
    y = F.split(F.col("b"), " ").getItem(1)
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    return (
        bi.withColumn("w1", x)
        .withColumn("w2", y)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("cb") / F.col("n_bi"))
                    / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
                ),
                6,
            ),
        )
        .orderBy(F.desc("pmi"), F.asc("b"))
        .limit(top)
        .select(F.col("b").alias("bigram"), "cb", "pmi")
    )


def readability_flesch(col) -> Column:
    """Flesch reading-ease approximation — the classic document-quality
    signal (gibberish and boilerplate score far outside prose's 0-100
    band): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/word).
    Sentences = non-empty [.!?]-separated runs of the RAW lowercased
    text (normalization keeps punctuation); syllables ≈ vowel groups
    per word, the standard heuristic. Everything is regex/HOF column
    expressions chosen to evaluate identically under Java regex and
    RE2, so the score is oracle-checkable."""
    lower = F.lower(col)
    sentences = F.greatest(
        F.lit(1),
        F.size(
            F.filter(
                F.split(lower, "[.!?]+"), lambda s: F.trim(s) != ""
            )
        ),
    )
    ws = F.filter(words(col), lambda w: w != "")
    n_words = F.greatest(F.lit(1), F.size(ws))
    syllables = F.aggregate(
        ws,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1),
            F.size(
                F.filter(
                    F.split(w, "[^aeiouy]+"), lambda g: g != ""
                )
            ),
        ),
    )
    return (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / sentences)
        - F.lit(84.6) * (syllables / n_words)
    )
