"""Distributed byte-pair-encoding (BPE) vocabulary training and encoding.

The training-data-pipeline tokenizer step the reference never had: learn a
subword merge table from a corpus (Sennrich et al. ACL'16), then encode
text with it.  Spark-first shape:

* the corpus is collapsed ONCE to a distinct-word frequency table (one
  shuffle) — Zipf's law makes this table orders of magnitude smaller than
  the corpus, and it is the only relation training ever touches again;
* each merge round is one pair-count aggregation over the word table plus
  a map-side fold applying the chosen merge(s) — no per-round corpus
  scan, no driver-side token stream;
* only the argmax pair row(s) are ever collected (bounded by
  ``merges_per_round``); the word table itself stays distributed and is
  ``localCheckpoint``-ed per round so the iterative plan never deepens
  (a persist alone leaves an exponentially growing analyzed plan — same
  lesson as two-star connected components);
* encoding is an Arrow-batched pandas UDF with the merge list in the task
  closure (vocab-bounded, broadcast-sized) and per-worker word
  memoization — at 100 TB the encode pass is embarrassingly parallel and
  the memo hit-rate is the corpus' type/token ratio.

``merges_per_round > 1`` is the scale knob: one aggregation pass selects
up to k NON-INTERACTING pairs (no shared or produced symbol strings), cuts
passes over the word table by ~k×.  Within a batch the counts of
later-selected pairs are the pre-batch counts (the standard scalable-BPE
approximation); ``merges_per_round=1`` is exact classic BPE.
"""

# NB: no `from __future__ import annotations` here — it stringifies the
# pandas_udf type hints and Spark's signature parser rejects them.
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_lake_spark.operators.dedup import normalized_text, parallelize_for_cpu

# Above this many distinct words the merge loop stays distributed; at or
# below it the loop runs driver-side on the collected (word, n) table
# (see train_bpe).  256k words × ~1 KB of python symbol-list state ≈
# 250 MB — comfortably inside the driver's headroom; real web corpora
# with open-ended vocab (typo/URL tokens) fall back to the distributed
# path automatically.
DRIVER_VOCAB_THRESHOLD = int(
    os.environ.get("SPARK_GRAFT_BPE_DRIVER_VOCAB", str(1 << 18))
)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) distinct-word frequency table — the Zipf-compressed
    training relation. One shuffle on the word."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    return (
        parallelize_for_cpu(df)
        .select(F.explode(words).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _initial_symbols(word_col: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: word_col.substr(i, F.lit(1)),
    )


def _apply_merges(sym_col: Column, batch: list[tuple[str, str]]) -> Column:
    """One leftmost-greedy fold pass applying every (a, b) in ``batch``.

    Pairs in a batch are guaranteed non-interacting (disjoint symbol
    strings, produced strings distinct from all batch symbols), so one
    combined pass equals applying them sequentially.  The fold never
    re-uses a just-merged token as a left element (a+b is strictly longer
    than a), which makes it bit-identical to the classic single-pass
    python loop — the encoder and the property-test model rely on that.
    """
    def step(acc, s):
        out = F.concat(acc, F.array(s))
        for a, b in reversed(batch):
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b))
            )
            out = F.when(
                hit,
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(out)
        return out

    return F.aggregate(sym_col, F.array().cast("array<string>"), step)


def _select_batch(rows, merges_per_round: int, min_frequency: int):
    """Greedy prefix of the (cnt desc, a, b) order keeping pairs mutually
    non-interacting: no symbol shared between pairs, and no produced
    string colliding with any batch symbol or other produced string."""
    batch = []
    used: set[str] = set()
    produced: set[str] = set()
    for r in rows:
        if int(r["cnt"]) < min_frequency:
            break
        a, b, m = r["a"], r["b"], r["a"] + r["b"]
        if {a, b, m} & used or m in produced or a in produced or b in produced:
            continue
        batch.append((a, b, int(r["cnt"])))
        used |= {a, b, m}
        produced.add(m)
        if len(batch) >= merges_per_round:
            break
    return batch


def _apply_merges_py(syms: list, batch: list) -> list:
    """Driver-side replay of :func:`_apply_merges`'s one-pass fold for a
    non-interacting batch: merged tokens are never re-used as a left
    element of the SAME pair (a+b is strictly longer than a) and cannot
    match another batch pair's left symbol (produced strings are
    disjoint from all batch symbols), so the simple accumulate-and-check
    loop is exactly the fold."""
    pairset = {(a, b) for a, b in batch}
    out: list = []
    for s in syms:
        if out and (out[-1], s) in pairset:
            out[-1] = out[-1] + s
        else:
            out.append(s)
    return out


def _train_bpe_driver(
    wc: DataFrame,
    rows,
    n_merges: int,
    min_frequency: int,
    merges_per_round: int,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The merge loop of :func:`train_bpe` on a COLLECTED (word, n)
    table — bit-identical selection to the distributed rounds (same
    (cnt desc, a asc, b asc) total order, same top-``4·mpr`` candidate
    truncation, same :func:`_select_batch`, same one-pass merge
    application), with zero per-round Spark jobs.

    Python string comparison (code points) equals Spark's UTF8 binary
    ordering because UTF-8 byte order preserves code-point order."""
    words = [(r["word"], r["n"]) for r in rows]
    syms = {w: list(w) for w, _ in words}
    merges: list[tuple[int, str, str, int]] = []
    top_n = max(4 * merges_per_round, 8)
    while len(merges) < n_merges:
        cnt: dict = {}
        for w, n in words:
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                cnt[p] = cnt.get(p, 0) + n
        if not cnt:
            break
        top = sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:top_n]
        cand = [{"a": a, "b": b, "cnt": c} for (a, b), c in top]
        room = n_merges - len(merges)
        batch = _select_batch(cand, min(merges_per_round, room), min_frequency)
        if not batch:
            break
        for a, b, c in batch:
            merges.append((len(merges), a, b, c))
        pairs = [(a, b) for a, b, _ in batch]
        for w, s in syms.items():
            if len(s) >= 2:
                syms[w] = _apply_merges_py(s, pairs)
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(
        [
            wc.schema["word"],
            wc.schema["n"],
            StructField("syms", ArrayType(StringType()), True),
        ]
    )
    sym_df = wc.sparkSession.createDataFrame(
        [(w, n, syms[w]) for w, n in words], schema
    )
    return merges, sym_df


def train_bpe(
    wc: DataFrame,
    n_merges: int,
    min_frequency: int = 2,
    merges_per_round: int = 1,
    driver_vocab_threshold: int | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from a (word, n) table.

    Returns ``(merges, sym_table)`` where merges is
    ``[(rank, a, b, count), ...]`` in application order and ``sym_table``
    is (word, n, syms) with the final trained segmentation of every
    distinct word.

    Deterministic and layout-independent: pair counts are exact integer
    sums; the argmax tie-break is (count desc, a asc, b asc); only the
    top ``4·merges_per_round`` candidate rows are collected per round.

    Execution is adaptive in the VOCABULARY size (guide §1.2 — the
    distributed algorithm first): the (word, n) relation is the only
    state the merge loop touches, and Zipf's law keeps it bounded, so at
    or below ``driver_vocab_threshold`` distinct words (default
    ``DRIVER_VOCAB_THRESHOLD``, env ``SPARK_GRAFT_BPE_DRIVER_VOCAB``)
    the table is collected ONCE and the rounds run driver-side —
    removing ``n_merges`` per-round aggregate jobs plus their Catalyst
    re-analysis (measured ~5 s of driver-side planning for 24 rounds at
    sf0.1, where only 2 s was Spark jobs).  Larger vocabularies keep the
    distributed rounds below, whose selection order this path replays
    bit-identically (pinned by tests/test_bpe.py's cross-path equality).
    Pass ``driver_vocab_threshold=0`` to force the distributed path.
    """
    thr = (
        DRIVER_VOCAB_THRESHOLD
        if driver_vocab_threshold is None
        else driver_vocab_threshold
    )
    if thr > 0:
        head = wc.select("word", "n").limit(thr + 1).collect()
        if len(head) <= thr:
            return _train_bpe_driver(
                wc, head, n_merges, min_frequency, merges_per_round
            )
    # Lazy checkpoints (eager=False): the plan is truncated exactly the
    # same (the checkpoint still materializes and caches on FIRST use),
    # but the materialization happens INSIDE the next round's pair-count
    # job instead of as a separate eager job — one Spark job per merge
    # round instead of two (guide §1.2: fewer passes; measured 2× fewer
    # jobs at identical results, the fold is applied once either way).
    sym = wc.select(
        "word", "n", _initial_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pair_struct = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        )
        pairs = (
            sym.filter(F.size("syms") >= 2)
            .select("n", F.explode(pair_struct).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(max(4 * merges_per_round, 8))
            .collect()
        )
        room = n_merges - len(merges)
        batch = _select_batch(top, min(merges_per_round, room), min_frequency)
        if not batch:
            break
        for a, b, cnt in batch:
            merges.append((len(merges), a, b, cnt))
        sym = sym.withColumn(
            "syms", _apply_merges(F.col("syms"), [(a, b) for a, b, _ in batch])
        ).localCheckpoint(eager=False)
    return merges, sym


def encode_word(word: str, merges: list, memo: dict | None = None) -> list[str]:
    """Apply the learned merges to one word, in rank order, one
    leftmost-greedy pass per merge — the exact replay of training's fold
    (so for every word seen in training, encode == trained segmentation).
    """
    if memo is not None and word in memo:
        return memo[word]
    syms = list(word)
    for m in merges:
        a, b = m[1], m[2]
        if len(syms) < 2:
            break
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    if memo is not None:
        memo[word] = syms
    return syms


def bpe_encode(
    df: DataFrame, text_col: str, merges: list, out_col: str = "tokens"
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: normalize, split
    to words, encode each word (worker-local memo across the Arrow batch
    stream), concatenate.  Map-side only — the merge list rides the task
    closure (bounded by vocab size); no shuffle, no driver round-trip."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    frozen = [(int(m[0]), m[1], m[2]) for m in merges]

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        import re

        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            # re.ASCII: Java's \s is ASCII-only, Python's is unicode —
            # without the flag a \xa0 would split here but not in the
            # Spark-side normalized_text, and the two tokenization
            # paths (bpe_token_consistency_check) would diverge.
            # .strip(" "): F.trim strips ASCII spaces only — bare
            # .strip() would also eat unicode whitespace and diverge
            # from the Spark-side word (review finding, \xa0 prefixes).
            norm = re.sub(r"\s+", " ", t.lower(), flags=re.ASCII).strip(" ")
            toks: list[str] = []
            for w in norm.split(" "):
                if w:
                    toks.extend(encode_word(w, frozen, memo))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))


def save_merges(engine, name: str, merges: list) -> None:
    """Persist a trained merge list as the engine table ``{name}_bpe`` —
    the tokenizer artifact: train once (expensive corpus passes), encode
    forever (every later job loads the table and runs the map-side
    encoder). Rank order IS the application order, so the table is the
    complete tokenizer state."""
    df = engine.spark.createDataFrame(
        [(int(r), a, b, int(c)) for (r, a, b, c) in merges],
        "rank int, a string, b string, cnt bigint",
    )
    engine.create_table(f"{name}_bpe", df)


def load_merges(engine, name: str) -> list:
    """Reload a persisted merge list in rank order (driver-side — the
    merge table is vocab-bounded, thousands of rows at most)."""
    rows = engine.table(f"{name}_bpe").orderBy("rank").collect()
    return [(r["rank"], r["a"], r["b"], r["cnt"]) for r in rows]


def bpe_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list,
    budget: int,
    n_shards: int = 4,
) -> DataFrame:
    """Tokenizer-aware sequence packing: encode with a trained merge list
    and first-fit-decreasing pack on the REAL BPE token lengths — the
    last-mile composition an LLM pipeline ships (whitespace-count packing
    over- or under-fills packs by exactly the corpus' tokens-per-word
    variance).  Returns ``(id, shard, tokens, pack_id)`` where ``tokens``
    is the document's BPE token count.

    Scale shape: the encode pass is map-side (merge list in the task
    closure), packing adds one shuffle on ``id % n_shards`` — identical
    cost to whitespace packing, so the tokenizer fidelity is free."""
    enc = bpe_encode(df, text_col, merges, out_col="__bpe_toks")
    lens = enc.select(
        F.col(id_col), F.size("__bpe_toks").alias("bpe_tokens")
    )
    from polars_lake_spark.operators.sampling import pack_sequences_ffd

    return pack_sequences_ffd(
        lens, id_col, F.col("bpe_tokens"), budget=budget, n_shards=n_shards
    )
