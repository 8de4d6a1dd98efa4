"""As-of (most-recent-prior) join — the timeseries join the reference
lacks, added as a pipeline extension.

Implementation is the scalable union+window formulation: tag both sides,
union on (by_keys, ts), carry the right side's values forward with
``last(ignorenulls)`` over an ordered window, then keep left rows.  One
shuffle + sort on (by_keys, ts) — no range-explosion cross join, so it
survives arbitrarily dense right sides at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` ≤ left's ``on`` within the same ``by`` group (backward as-of).

    right_cols: right columns to carry (default: all non-key, non-time).
    The right side must be unique per (by, on) — pre-aggregate if not
    (ties would make the result order-dependent).
    """
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]

    l_tag = left.withColumn("__is_left", F.lit(1))
    r_tag = right.select(
        *by, F.col(on).alias(on), *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("__is_left", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # Right rows sort BEFORE left rows at the same timestamp, so an exact
    # tie (right.ts == left.ts) is visible to the left row ("at or before").
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .drop("__is_left", *[f"{c}{suffix}" for c in right_cols])
        .select(
            *left.columns,
            *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )
