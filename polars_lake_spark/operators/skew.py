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
