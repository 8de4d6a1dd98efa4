"""Deterministic sampling + sequence packing for training-data pipelines.

All three operators use ENGINE-INDEPENDENT determinism (md5-derived
hashes, explicit orderings) so results are reproducible across runs,
partitionings, and engines — the property that makes a training-data
split auditable. Everything is pure column expressions / window
functions: map-side, codegen, at most one shuffle on the window key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def md5_bucket(col, modulus: int = 100):
    """Deterministic [0, modulus) bucket from md5's first 8 hex chars —
    identical in any engine with md5 (32-bit value, no sign issues)."""
    return (
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")
        % modulus
    )


def hash_sample(
    df: DataFrame, content_col: str, pct: int, modulus: int = 100
) -> DataFrame:
    """Keep ~pct% of rows by content hash: stable under reruns, appends,
    and repartitioning (unlike df.sample, which is seed+partition
    dependent) — the reproducible train/held-out split primitive."""
    return df.filter(md5_bucket(F.col(content_col), modulus) < pct)


def weighted_hash_sample(
    df: DataFrame, content_col: str, weight, modulus: int = 10000
) -> DataFrame:
    """Per-row acceptance with probability ``weight`` (a [0,1] Column
    expression, e.g. a quality score): keep iff
    ``md5_bucket(content) < weight * modulus``. The md5 bucket plays the
    uniform draw, so acceptance is deterministic per content — rerun- and
    partitioning-stable, and exact duplicates get the same verdict. This
    is the curriculum/quality-weighted sampling primitive: higher-quality
    rows survive proportionally more often, with zero RNG state. Pure
    map-side filter, no shuffle."""
    return df.filter(
        md5_bucket(F.col(content_col), modulus) < weight * F.lit(float(modulus))
    )


def stratified_sample(
    df: DataFrame, strata_col: str, content_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Deterministic top-N per stratum, ordered by content hash (i.e. a
    reproducible uniform draw within each stratum); unique id breaks
    exact-duplicate-content ties. One shuffle on the stratum key; skewed
    strata are bounded by the per-stratum limit."""
    h = F.md5(F.col(content_col).cast("binary"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def chunk_words(
    df: DataFrame,
    id_col: str,
    words_col,
    window: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window document chunking (the context-window prep step for
    embedding / training pipelines): chunk ``i`` covers words
    ``[i*stride, i*stride + window)`` with ``stride = window - overlap``;
    every document yields at least one chunk.

    Pure map-side (sequence + explode + slice — no shuffle, no UDF);
    chunk count per row is ``max(1, ceil((n_words - overlap) / stride))``
    so output size is linear in corpus token count. Deterministic chunk
    ids make downstream dedup/joins stable across reruns."""
    stride = window - overlap
    if stride <= 0:
        raise ValueError("window must exceed overlap")
    # NULL words (e.g. NULL text upstream) would make size/sequence NULL
    # and the explode drop the document — coalesce to a single empty word
    # so the every-doc-yields-a-chunk invariant holds.
    words = F.coalesce(words_col, F.array(F.lit(""))).alias("__words")
    n = F.size(F.col("__words"))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    out = (
        df.select(id_col, words)
        .select(
            id_col,
            "__words",
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("__words"), F.col("chunk_id") * stride + 1, window
            ).alias("__chunk"),
        )
    )
    return out.select(
        id_col,
        "chunk_id",
        F.size("__chunk").alias("n_chunk_words"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col,
    budget: int,
    n_shards: int = 4,
) -> DataFrame:
    """Assign each document a (shard, pack_id): concat-then-chunk sequence
    packing for LM training. Documents are laid out in deterministic id
    order within ``id % n_shards`` shards; pack_id = which ``budget``-token
    window the document STARTS in (documents may straddle packs — the
    standard concatenate-and-chunk regime).

    One shuffle on shard; the cumulative sum is a per-shard ordered window
    — shard count is the parallelism dial at 100 TB."""
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(id_col, shard, token_col.alias("tokens"))
    return out.select(
        id_col,
        "shard",
        "tokens",
        F.floor((F.sum("tokens").over(w) - F.col("tokens")) / budget)
        .cast("bigint")
        .alias("pack_id"),
    )


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str,
    token_col,
    budget: int,
    n_shards: int = 4,
) -> DataFrame:
    """First-fit-decreasing bin packing per shard: every document lands
    WHOLE in exactly one pack of capacity ``budget`` — the no-straddle
    regime that minimizes pad waste when examples must not cross pack
    boundaries (instruction tuning, short-context evals). Documents
    longer than ``budget`` get a pack of their own (truncation is the
    caller's policy).

    Guarantees: no multi-doc pack exceeds budget; FFD uses at most
    11/9·OPT + 1 packs per shard (Dosa's tight bound). Deterministic:
    docs sort (tokens DESC, id ASC) within their ``id % n_shards`` shard,
    so the assignment is identical across reruns and layouts.

    Scale shape: one shuffle on shard; packing is sequential WITHIN a
    shard (applyInPandas), so shard count is the parallelism dial and
    per-shard size the memory bound — shard by (day, source, hash) at
    100 TB so each group stays executor-sized."""
    shard = (F.col(id_col) % n_shards).alias("shard")
    # NULL/negative token counts (NULL text upstream: size(NULL) = -1)
    # are clamped to 0 — the doc still packs (zero-width), and the pandas
    # fold never sees NaN (nullable long would arrive as float64).
    base = df.select(
        F.col(id_col).alias("id"),
        shard,
        F.greatest(
            F.coalesce(token_col.cast("long"), F.lit(0)), F.lit(0)
        ).alias("tokens"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list = []  # per-pack remaining capacity
        assignment = []
        for t in pdf["tokens"]:
            t = int(t)
            placed = -1
            if t < budget:
                for bi, room in enumerate(remaining):
                    if room >= t:
                        placed = bi
                        break
            if placed < 0:
                remaining.append(max(budget - t, 0))
                placed = len(remaining) - 1
            else:
                remaining[placed] -= t
            assignment.append(placed)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "shard": pdf["shard"],
                "tokens": pdf["tokens"],
                "pack_id": assignment,
            }
        )

    return base.groupBy("shard").applyInPandas(
        pack, "id long, shard long, tokens long, pack_id long"
    ).withColumnRenamed("id", id_col)


def weighted_sample_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: k rows per group, each
    row's inclusion probability proportional to its weight (Efraimidis &
    Spirtakis 2006, A-ES): rank by ``u^(1/w)`` descending and keep the
    top k — provably equivalent to sequential weighted draws without
    replacement.

    The uniform draw ``u`` is deterministic — md5(id) scaled to (0, 1) —
    so the sample is rerun-, append-, and partitioning-stable, and any
    engine with md5 replays it exactly (the comparison happens on
    ``ln(u)/w``, a monotone transform that avoids overflow for tiny u).
    One shuffle on the group key; per-group cost is the top-k window.
    Weights must be > 0."""
    v = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("bigint")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(group_col).orderBy(
        key.desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
