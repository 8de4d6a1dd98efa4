"""Physical layout conventions: hive partitions + hash buckets.

The reference lays tables out as hive-style ``k=v`` partition dirs with
``{bucket:06}_file.parquet`` files, bucket = ``value % 5`` for numerics and
a string hash for strings (``/root/reference/src/dataset.rs:149-168``,
``/root/reference/src/buckets.rs:8-30``).  Two reference quirks we fix
rather than copy (SURVEY.md §1.2): the bucket count is hardcoded to 5, and
the string path returns the raw 64-bit hash without the modulo
(``/root/reference/src/buckets.rs:21-26``), so string bucket pruning never
worked there.

Spark-first design: the bucket is a **derived partition column**
``bucket_id = pmod(hash(cols...), n)`` — uniform across all types,
configurable n — so bucket pruning is ordinary hive partition pruning that
Catalyst performs natively (no custom rule), and an equality predicate on
the bucket column's source key prunes file listings at 100 TB scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "bucket_id"
DEFAULT_BUCKETS = 5  # the reference's constant (/root/reference/src/dataset.rs:200)


def bucket_expr(cols: Sequence[str], n_buckets: int) -> Column:
    """``pmod(hash(cols...), n)`` — works uniformly for every data type,
    unlike the reference's per-dtype match (/root/reference/src/buckets.rs:8-30).
    """
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_buckets)).cast("int")


def with_bucket_column(
    df: DataFrame, cols: Sequence[str], n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Add the derived bucket partition column
    (analog of /root/reference/src/dataset.rs:199-204)."""
    return df.withColumn(BUCKET_COL, bucket_expr(cols, n_buckets))


def layout_columns(partition_cols: Sequence[str], bucket_cols: Sequence[str]) -> list[str]:
    """The physical partitioning column list for a table spec."""
    out = list(partition_cols)
    if bucket_cols:
        out.append(BUCKET_COL)
    return out
