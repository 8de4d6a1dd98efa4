"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm): EXACT-substring near-dup detection,
the complement to shingle-Jaccard (which measures bag-of-ngram overlap
and misses a long verbatim quote inside otherwise-different documents).

Guarantee: any two documents sharing a verbatim normalized substring of
at least ``k + w - 1`` characters share at least one fingerprint — so
grouping by fingerprint finds every long-enough exact overlap while
storing only ~1/w of the gram hashes.

Pipeline (all map-side column expressions, no Python UDFs):
char k-grams → 64-bit gram hashes → per-window minimum (window = w
consecutive grams) → distinct fingerprints → explode + bucket join.
Per-doc cost is O(len × w) expression ops — embarrassingly parallel, no
shuffle until the final fingerprint groupBy, whose fan-out is capped by
``max_bucket`` (fingerprints shared by more docs than that are boilerplate
and are dropped, the standard MOSS noise guard).

``gram_hash='md5'`` derives the hash from md5's first 15 hex chars —
bit-identical in any engine with md5, which is what makes the operator
oracle-checkable; ``'xxhash64'`` (default) is the fast JVM path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_lake_spark.operators.dedup import (
    let_bound,
    normalized_text,
    parallelize_for_cpu,
)


def _gram_hash(gram: Column, gram_hash: str) -> Column:
    if gram_hash == "md5":
        return F.conv(
            F.substring(F.md5(gram.cast("binary")), 1, 15), 16, 10
        ).cast("long")
    return F.xxhash64(gram)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 6,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """(id, fps) — distinct winnowing fingerprints per document.

    Documents shorter than k normalized chars have no gram and are
    excluded; documents with fewer than w grams contribute their single
    global-minimum hash (the whole doc is one window)."""
    df = parallelize_for_cpu(df)
    norm = normalized_text(F.col(text_col))
    d = df.select(F.col(id_col).alias("id"), norm.alias("s")).filter(
        F.length("s") >= k
    )

    def grams(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(s) - (k - 1)),
            lambda i: _gram_hash(s.substr(i, F.lit(k)), gram_hash),
        )

    def fps(hs: Column) -> Column:
        return F.when(
            F.size(hs) >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(hs) - (w - 1)),
                    lambda j: F.array_min(F.slice(hs, j, w)),
                )
            ),
        ).otherwise(F.array(F.array_min(hs)))

    return d.select(
        "id", let_bound(grams(F.col("s")), fps).alias("fps")
    )


def winnow_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 6,
    min_shared: int = 2,
    max_bucket: int = 100,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """(d1, d2, n_shared) — document pairs sharing ≥ ``min_shared``
    winnowing fingerprints, i.e. containing (at least ``min_shared``
    distinct) verbatim runs of ≥ k+w-1 normalized chars.

    Fingerprints present in more than ``max_bucket`` documents are
    boilerplate (headers, licenses) and are excluded BEFORE the pair
    expansion — the guard that keeps bucket fan-out, and thus the shuffle,
    linear in the corpus rather than quadratic in a hot bucket."""
    from pyspark.storagelevel import StorageLevel

    # The fingerprint arrays are materialized BEFORE the explode: Catalyst
    # collapses a single-reference projection into Generate's input, where
    # the (expensive, HOF-heavy) expression gets re-evaluated per emitted
    # element — measured 25× on sf0.1 (the same persisted-intermediate
    # pattern minhash_lsh_pairs uses for its shingles).
    fps_df = winnow_fingerprints(df, id_col, text_col, k, w, gram_hash).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    exploded = fps_df.select("id", F.explode("fps").alias("fp"))
    buckets = (
        exploded.groupBy("fp")
        .agg(F.collect_set("id").alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs = (
        buckets.select(F.explode("ids").alias("d1"), F.col("ids"))
        .select("d1", F.explode("ids").alias("d2"))
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return pairs.filter(F.col("n_shared") >= min_shared)


def contamination_matches(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    w: int = 10,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """(id, n_bench_matches) — training documents sharing a verbatim
    normalized run of ≥ k+w-1 chars with ≥ 1 benchmark document, with the
    count of distinct benchmark docs matched.

    The substring complement to n-gram-overlap decontamination
    (queries/corpus.py decontaminate_*): a benchmark answer quoted inside
    an otherwise-different page is caught even when the page's shingle
    Jaccard is negligible.  Plan shape for 100 TB: the benchmark side is
    small by definition, so its fingerprints BROADCAST; the training side
    is one map-side fingerprint pass + a broadcast-hash semi-join — no
    shuffle of the corpus.  No max_bucket guard here: every benchmark
    fingerprint counts, however common."""
    from pyspark.storagelevel import StorageLevel

    # fps is array_distinct per doc, so the exploded (bid, fp) rows are
    # already unique — no distinct needed.
    bfp = (
        winnow_fingerprints(bench, id_col, text_col, k, w, gram_hash)
        .persist(StorageLevel.MEMORY_AND_DISK)
        .select(F.col("id").alias("bid"), F.explode("fps").alias("fp"))
    )
    tfp_src = winnow_fingerprints(
        train, id_col, text_col, k, w, gram_hash
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tfp = tfp_src.select("id", F.explode("fps").alias("fp"))
    return (
        tfp.join(F.broadcast(bfp), "fp")
        .groupBy("id")
        .agg(F.count_distinct("bid").alias("n_bench_matches"))
    )
