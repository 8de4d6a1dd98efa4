"""Heavy hitters (frequent tokens) via a mergeable Misra-Gries sketch —
the vocab/stopword/top-terms pass a 100 TB corpus needs without a full
groupBy over billions of distinct tokens.

Scale shape: tokens never shuffle. Each input partition folds its token
stream into a bounded Misra-Gries summary (``capacity`` counters) inside
one ``mapInPandas`` pass; the only shuffle carries the per-partition
summaries — at most ``capacity + 1`` rows per partition — which a single
small groupBy merges. Compare: a naive ``explode → groupBy(token)`` at
100 TB shuffles the entire token stream.

Guarantees (Misra-Gries + mergeability, Agarwal et al., "Mergeable
Summaries", PODS'12): with n total tokens and per-sketch capacity m,
every trim subtracts its cut from ≥ m+1 positive counters, so the total
subtraction across all partitions is ≤ n/(m+1) < n/m. Hence for every
token x: est(x) ∈ [true(x) - n/m, true(x)], and any token with
true(x) > n/m is guaranteed present in the merged sketch. That makes the
two-pass exact top-k sound: pass 1 sketches a candidate set, pass 2
counts ONLY the candidates exactly (broadcast semi join — the second
shuffle is again bounded by the candidate set); if the k-th true count
exceeds n/m the result provably equals the global top-k.

No counterpart in the reference (pure batch OLAP); this is one of the
training-data-pipeline extensions (SURVEY.md §6 tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_lake_spark.functions.text import words


def _token_arrays(df: DataFrame, text_col: str) -> DataFrame:
    """One array column of normalized non-empty tokens — tokenization
    stays JVM-side (shared with every other text operator) so the pandas
    stage only counts. NULL text yields no row (words(NULL) is NULL,
    which the pandas fold would choke on).

    The input is spread across the cluster when it arrives
    under-partitioned (guide §2.5 input skew — a small parquet file
    reads as ONE task, serializing the tokenize AND the sketch fold on
    a single core); the MG merge bound est ∈ [true − n/m, true] holds
    under any partition count, and exact-top-k candidacy only widens."""
    from polars_lake_spark.operators.dedup import parallelize_for_cpu

    return parallelize_for_cpu(df.filter(F.col(text_col).isNotNull())).select(
        F.filter(words(F.col(text_col)), lambda w: w != "").alias("toks")
    )


def _mg_fold(capacity: int, value_lists):
    """Shared per-partition Misra-Gries fold over an iterator of value
    lists; yields one pandas frame: surviving (token, cnt, NULL) rows +
    one (NULL, subtracted, ntok) marker."""
    import pandas as pd

    counts: dict = {}
    subtracted = 0
    ntok = 0
    # Lazy trimming: let the dict grow to 8x capacity, then subtract
    # the (capacity+1)-th largest value from everything and keep the
    # strictly-positive survivors (<= capacity of them). The error
    # bound is unchanged — every trim still removes its cut from
    # >= capacity+1 positive counters.
    trim_at = capacity * 8

    def trim():
        nonlocal counts, subtracted
        if len(counts) <= capacity:
            return
        vals = sorted(counts.values(), reverse=True)
        cut = vals[capacity]
        counts = {t: c - cut for t, c in counts.items() if c > cut}
        subtracted += cut

    from collections import Counter

    acc = Counter()
    for lst in value_lists:
        ntok += len(lst)
        acc.update(lst)
        if len(acc) > trim_at:
            counts = dict(acc)
            trim()
            acc = Counter(counts)
    counts = dict(acc)
    trim()
    if ntok:
        yield pd.DataFrame(
            {
                "token": list(counts.keys()) + [None],
                "cnt": list(counts.values()) + [subtracted],
                "ntok": [None] * len(counts) + [ntok],
            }
        )


def mg_sketch_partitions(
    df: DataFrame, text_col: str, capacity: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries summaries over document TOKENS.

    Output rows: ``(token, cnt, ntok)`` — surviving counters as
    ``(token, est, NULL)`` plus exactly one marker row per non-empty
    partition ``(NULL, subtracted_total, tokens_seen)`` so callers can
    reconstruct both the error bound actually incurred and n without a
    second scan of the text.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def fold(batches):
        yield from _mg_fold(
            capacity,
            (list(toks) for pdf in batches for toks in pdf["toks"]),
        )

    return _token_arrays(df, text_col).mapInPandas(
        fold, "token string, cnt long, ntok long"
    )


def mg_sketch_keys(
    df: DataFrame, key_col: str, capacity: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries summaries over a KEY COLUMN's values
    (cast to string) — hot-key detection for skewed joins/aggregations:
    find the keys worth salting (operators/skew.py) in one cheap
    shuffle-free pass instead of a full groupBy over every key."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def fold(batches):
        yield from _mg_fold(
            capacity, (pdf["k"].tolist() for pdf in batches)
        )

    keyed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("k")
    )
    return keyed.mapInPandas(fold, "token string, cnt long, ntok long")


def heavy_hitters(
    df: DataFrame, text_col: str, capacity: int = 4096
) -> DataFrame:
    """Merged sketch: ``(token, est_count)`` for every surviving token.
    est_count ∈ [true - n/capacity, true]; every token with true count
    > n/capacity is present."""
    sk = mg_sketch_partitions(df, text_col, capacity)
    return (
        sk.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("cnt").alias("est_count"))
    )


def heavy_hitters_exact_topk(
    df: DataFrame, text_col: str, k: int = 50, capacity: int = 4096
) -> DataFrame:
    """Two-pass EXACT top-k: sketch candidates, then count only the
    candidates (broadcast semi join on the exploded token stream — the
    groupBy key set is bounded by the candidate list, not the vocab).
    Equals the global top-k whenever the k-th true count > n/capacity;
    size ``capacity`` so that holds for the workload (top-k tokens are
    stopword-frequency, orders of magnitude above n/capacity at any
    realistic capacity >= ~50k per TB-scale shard).
    Deterministic order: (cnt DESC, token ASC)."""
    from polars_lake_spark.operators.dedup import parallelize_for_cpu

    cands = heavy_hitters(df, text_col, capacity).select("token")
    toks = parallelize_for_cpu(df).select(
        F.explode(F.filter(words(F.col(text_col)), lambda w: w != "")).alias(
            "token"
        )
    )
    exact = (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    )


def mg_global_trim(items: DataFrame, capacity: int) -> tuple[DataFrame, int]:
    """Trim a merged (token, cnt) frame to ≤ ``capacity`` rows by
    subtracting the (capacity+1)-th largest count from everything and
    keeping the strictly-positive rest. Returns (trimmed, cut).

    The only driver materialization is the top capacity+1 COUNTS — the
    same bounded-collect class as k-means centroids; token strings never
    leave the executors."""
    cuts = [
        r.cnt
        for r in items.select("cnt")
        .orderBy(F.desc("cnt"))
        .limit(capacity + 1)
        .collect()
    ]
    if len(cuts) <= capacity:
        return items, 0
    cut = cuts[-1]
    trimmed = items.select(
        "token", (F.col("cnt") - cut).alias("cnt")
    ).filter(F.col("cnt") > 0)
    return trimmed, int(cut)


class HeavyHittersIndex:
    """Engine-persisted INCREMENTAL Misra-Gries sketch: track a growing
    corpus's frequent tokens across arbitrarily many ingest batches
    without ever rescanning it.

    One versioned engine table ``{name}_hh_state`` holds the whole state:
    item rows ``(token, cnt, NULL, NULL, NULL)`` plus exactly one marker
    row ``(NULL, subtracted, ntok, last_batch_id, capacity)``. Every
    ``add_batch`` folds the batch's per-partition sketches
    (``mg_sketch_partitions`` — the batch's tokens never shuffle) into
    the stored state and atomically REPLACES the table via
    ``engine.overwrite`` (one 'rewrite' snapshot commit): counts, error
    accounting, and the replay marker publish together, so there is no
    crash window that can split them. Snapshot versioning additionally
    gives vocabulary time travel for free.

    Guarantees after any number of batches (mergeable summaries): for
    every token, est ∈ [true − subtracted, true], with
    subtracted ≤ ntok/(capacity+1); any token whose true corpus count
    exceeds ``subtracted`` is present in the state.

    Exactly-once under Structured Streaming: pass foreachBatch's epoch id
    as ``batch_id`` — a redelivery of the last committed batch is a
    no-op (the marker carries ``last_batch_id``)."""

    SCHEMA = (
        "token string, cnt long, ntok long, batch_id long, capacity int"
    )

    def __init__(self, engine, name: str, capacity: int = 4096):
        self.engine = engine
        self.name = name
        self.capacity = capacity

    @property
    def _t(self) -> str:
        return f"{self.name}_hh_state"

    def create(self) -> None:
        eng = self.engine
        marker = eng.spark.createDataFrame(
            [(None, 0, 0, -1, self.capacity)], self.SCHEMA
        )
        eng.create_table(self._t, marker, versioned=True)

    @classmethod
    def open(cls, engine, name: str) -> "HeavyHittersIndex":
        row = (
            engine.table(f"{name}_hh_state")
            .filter(F.col("token").isNull())
            .head()
        )
        return cls(engine, name, capacity=int(row["capacity"]))

    def _marker(self):
        return self.engine.table(self._t).filter(F.col("token").isNull()).head()

    def add_batch(
        self, batch: DataFrame, text_col: str = "text", batch_id: int | None = None
    ) -> dict:
        """Fold one batch in; returns {"ntok", "subtracted", "replayed"}."""
        eng = self.engine
        mk = self._marker()
        if batch_id is not None and mk["batch_id"] == batch_id:
            return {
                "ntok": mk["ntok"],
                "subtracted": mk["cnt"],
                "replayed": True,
            }
        # One evaluation of the (dominant-cost) batch fold: the sketch is
        # read three times below — marker aggregate, trim collect, and the
        # final overwrite — and the trim's cut must describe the SAME
        # counts that get written.
        sk = mg_sketch_partitions(batch, text_col, self.capacity).localCheckpoint()
        b_items = sk.filter(F.col("token").isNotNull()).select("token", "cnt")
        b_meta = (
            sk.filter(F.col("token").isNull())
            .agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("sub"),
                F.coalesce(F.sum("ntok"), F.lit(0)).alias("nt"),
            )
            .head()
        )
        state_items = (
            eng.table(self._t)
            .filter(F.col("token").isNotNull())
            .select("token", "cnt")
        )
        merged = (
            state_items.unionByName(b_items)
            .groupBy("token")
            .agg(F.sum("cnt").alias("cnt"))
        )
        trimmed, cut = mg_global_trim(merged, self.capacity)
        subtracted = int(mk["cnt"]) + int(b_meta["sub"]) + cut
        ntok = int(mk["ntok"]) + int(b_meta["nt"])
        items = trimmed.select(
            "token",
            "cnt",
            F.lit(None).cast("long").alias("ntok"),
            F.lit(None).cast("long").alias("batch_id"),
            F.lit(None).cast("int").alias("capacity"),
        )
        marker = eng.spark.createDataFrame(
            [
                (
                    None,
                    subtracted,
                    ntok,
                    -1 if batch_id is None else int(batch_id),
                    self.capacity,
                )
            ],
            self.SCHEMA,
        )
        eng.overwrite(self._t, items.unionByName(marker))
        return {"ntok": ntok, "subtracted": subtracted, "replayed": False}

    def estimates(self) -> DataFrame:
        """(token, est_count) current merged sketch."""
        return (
            self.engine.table(self._t)
            .filter(F.col("token").isNotNull())
            .select("token", F.col("cnt").alias("est_count"))
        )


def hot_keys_exact_topk(
    df: DataFrame, key_col: str, k: int = 20, capacity: int = 16384
) -> DataFrame:
    """Two-pass EXACT top-k keys by row count — the skew probe: sketch
    pass proposes candidates (one shuffle-free mapInPandas + a tiny
    summary shuffle), second pass counts only the candidates (broadcast
    semi join). Sound whenever the k-th hottest key's count > n/capacity;
    output (key string, cnt), ordered (cnt DESC, key ASC)."""
    sk = mg_sketch_keys(df, key_col, capacity)
    cands = (
        sk.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("cnt").alias("est"))
        .select(F.col("token").alias("k"))
    )
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("k")
    )
    exact = (
        keyed.join(F.broadcast(cands), "k", "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.select(F.col("k").alias("key"), "cnt")
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )
