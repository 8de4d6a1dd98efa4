"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in session.py) covers joins; these
helpers cover skewed AGGREGATIONS whose per-key state is non-algebraic
(collect_list/set, exact distinct) — for algebraic aggs Spark's map-side
partial aggregation already neutralizes skew.

Pattern: salt the hot key into n sub-keys, aggregate partially per
(key, salt), then merge the n partials per key — two small shuffles whose
largest partition is 1/n of the hot key instead of all of it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SALT_COL = "salt_id"


def with_salt(df: DataFrame, n_salts: int, *, deterministic_by: str | None = None) -> Column | DataFrame:
    """Add a salt column in [0, n_salts).

    deterministic_by: derive the salt from an existing column (stable
    across retries — required when the downstream merge must be
    reproducible); default uses a uniform random salt.
    """
    if deterministic_by is not None:
        salt = F.pmod(F.hash(F.col(deterministic_by)), F.lit(n_salts))
    else:
        salt = (F.rand(seed=42) * n_salts).cast("int")
    return df.withColumn(SALT_COL, salt)


def salted_collect_set(
    df: DataFrame, keys: Sequence[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """collect_set per key, skew-safe: per-(key,salt) partial sets, then a
    flatten+distinct merge per key. Output column: ``values``."""
    partial = (
        with_salt(df, n_salts, deterministic_by=value_col)
        .groupBy(*keys, SALT_COL)
        .agg(F.collect_set(value_col).alias("vs"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.array_distinct(F.flatten(F.collect_list("vs"))).alias("values"))
    )


def salted_count_distinct(
    df: DataFrame, keys: Sequence[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without a single-reducer hot
    key: dedup on (key, value) is salted by value hash, then counted.
    Output column: ``n_distinct``."""
    dedup = (
        with_salt(df, n_salts, deterministic_by=value_col)
        .groupBy(*keys, SALT_COL, value_col)
        .agg(F.lit(1).alias("one"))
    )
    return dedup.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_distinct"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by key salting: the (large, skewed) left side
    gets a deterministic salt in [0, n_salts); the right side is
    replicated n_salts× with an exploded salt column; the join runs on
    (keys..., salt), splitting each hot key's row group across n_salts
    reducers.

    Use when AQE's skew-join split cannot apply (e.g. the skewed relation
    feeds a co-grouped downstream op, or stats hide the skew) and the
    right side is too big to broadcast but cheap to replicate n× .
    Deterministic: the salt is a hash of the left row's whole key tuple
    plus a uniformizer column when provided.
    """
    keys = list(on)
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(n_salts))
    # monotonically_increasing_id is partition-dependent → NOT reproducible
    # across retries of a failed stage; a uniform spread matters more than
    # stability for an inner join (each left row joins the same right rows
    # whatever its salt). For restart-deterministic pipelines pass a
    # high-cardinality column into the hash instead.
    l = left.withColumn(SALT_COL, salt)
    r = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, keys + [SALT_COL], how).drop(SALT_COL)


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k rows per group under the total order
    ``(order_col DESC, id_col ASC)`` via two stages:

    1. per-PARTITION top-k candidates (mapInPandas, bounded state of
       groups-per-partition × k rows, NO shuffle) — any row in the
       global top-k is necessarily in its partition's top-k;
    2. the standard window over candidates only.

    The plain window formulation shuffles and SORTS every row of every
    group; at 100 TB a hot group's full history lands on one task.  Here
    the shuffle carries at most k rows per (partition, group) — skew in
    the raw data never reaches the exchange.  Output columns:
    ``group_cols + [order_col, id_col]``.
    """
    import pandas as pd

    cols = [*group_cols, order_col, id_col]
    gl = list(group_cols)
    # NaN vs NULL: Spark ranks NaN ABOVE every double under desc but
    # NULL last; pandas conflates both to NaN (sorted last). Compute
    # the distinction Spark-side as a sort prefix both stages share —
    # stage 1 sorts [__nan desc, order desc, id], and the final window
    # uses the same keys (for non-floating order columns __nan is
    # constant false and changes nothing).
    dt = dict(df.dtypes)[order_col]
    isnan = (
        F.isnan(F.col(order_col)) if dt in ("double", "float") else F.lit(False)
    )
    slim = df.select(*gl, F.coalesce(isnan, F.lit(False)).alias("__nan"),
                     order_col, id_col)

    def partition_topk(batches):
        cand = None
        for pdf in batches:
            cand = pdf if cand is None else pd.concat([cand, pdf])
            cand = (
                cand.sort_values(
                    ["__nan", order_col, id_col],
                    ascending=[False, False, True],
                )
                # dropna=False: Spark windows treat NULL as a normal
                # group; pandas' default would silently drop those rows
                .groupby(gl, sort=False, dropna=False)
                .head(k)
            )
        if cand is not None:
            yield cand

    candidates = slim.mapInPandas(partition_topk, slim.schema)
    w = Window.partitionBy(*gl).orderBy(
        F.col("__nan").desc(),
        F.col(order_col).desc(),
        F.col(id_col).asc(),
    )
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__nan")
    )
