"""Bloom-filter semi-join pruning — the manual runtime filter.

At 100 TB the dominant cost of ``fact JOIN dim`` is shuffling fact rows
that will never match.  Catalyst's injected runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default in
our sessions) only fires above size thresholds and cannot be asserted
from the API, so this operator states the pattern explicitly:

* build — k deterministic probe positions per dim key
  (``pmod(xxhash64(key, i), m)``), OR-folded into an m-bit bitmap held as
  ONE map row (word index → 64-bit word; ≤ m/64 entries);
* probe — the bitmap broadcasts (a single row), and every fact row
  checks its k positions MAP-SIDE; rows failing any bit are dropped
  before any shuffle;
* exact — the surviving slice takes the real semi-join.

Bloom filters have NO false negatives, so the final result provably
equals the plain semi-join — which is exactly what the registry oracle
checks.  False positives only cost extra rows in the exact phase
(fraction ~``(1-e^{-kn/m})^k``); size ``m_bits`` to the dim cardinality.

Everything is deterministic integer hashing — no JVM sketch object, no
driver round-trip, layout-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probe_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # cast to string first: xxhash64 is input-TYPE-sensitive (int 5 and
    # bigint 5 hash differently), and build/probe sides may carry
    # different numeric types for the same key values — which would be
    # silent false negatives, the one failure mode a bloom filter must
    # never have.
    key = key.cast("string")
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_bitmap(dim: DataFrame, dim_key: str, m_bits: int = 1 << 16, k: int = 3) -> DataFrame:
    """One-row (bm: map<long, long>) bitmap of the dim keys' probe bits.
    Two tiny aggregations: bit-OR per 64-bit word, then map_from_entries
    over ≤ m_bits/64 rows."""
    pos = F.explode(F.array(*_probe_positions(F.col(dim_key), m_bits, k)))
    words = (
        dim.select(pos.alias("p"))
        .select(
            F.expr("p DIV 64").alias("wi"),
            F.expr("shiftleft(1L, cast(p % 64 AS int))").alias("mask"),
        )
        .groupBy("wi")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("wi", "bits"))).alias("bm")
    )


def bloom_prefilter(
    fact: DataFrame,
    bitmap: DataFrame,
    fact_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Map-side bloom filter of ``fact`` against a built bitmap: the
    single bitmap row broadcasts, every fact row tests its k probe bits
    in-place — no shuffle, no UDF."""
    pre = fact.crossJoin(F.broadcast(bitmap))
    pcols = []
    for i, p in enumerate(_probe_positions(F.col(fact_key), m_bits, k)):
        pre = pre.withColumn(f"__bf_p{i}", p)
        pcols.append(f"__bf_p{i}")
    cond = None
    for c in pcols:
        hit = (
            F.coalesce(
                F.element_at(F.col("bm"), F.shiftright(F.col(c), 6)), F.lit(0)
            ).bitwiseAND(F.expr(f"shiftleft(1L, cast({c} % 64 AS int))"))
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    return pre.filter(cond).drop("bm", *pcols)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """``fact LEFT SEMI JOIN dim`` with a bloom prefilter ahead of the
    shuffle.  Result is provably identical to the plain semi-join (no
    false negatives); the shuffle only carries the pre-filtered slice."""
    # cast('string') unifies integer WIDTHS, but int-vs-double or
    # decimal keys stringify differently ('3' vs '3.0') — that would be
    # a silent false negative, so heterogeneous key type FAMILIES are
    # rejected here: pre-cast both sides to a common type instead.
    integral = {"tinyint", "smallint", "int", "bigint"}
    ft = dict(fact.dtypes)[fact_key]
    dt = dict(dim.dtypes)[dim_key]
    if ft != dt and not (ft in integral and dt in integral):
        raise ValueError(
            f"bloom_semi_join: key types {ft!r} vs {dt!r} stringify "
            "differently and would yield bloom false negatives; cast "
            "both keys to a common type first"
        )
    bm = bloom_bitmap(dim, dim_key, m_bits, k)
    pre = bloom_prefilter(fact, bm, fact_key, m_bits, k)
    return pre.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
