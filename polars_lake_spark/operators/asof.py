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


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    tolerance_us: int,
    suffix: str = "_right",
) -> DataFrame:
    """Interval join: all (left, right) pairs in the same ``by`` group
    with |left.on - right.on| ≤ tolerance (timestamps, µs granularity).

    Scalable formulation: both sides are bucketed by tolerance-sized time
    bins; each left row probes its own and the two adjacent bins (any
    in-tolerance pair shares or neighbors a bin), so the join is keyed on
    (by, bin) — bounded fan-out instead of a per-group cross product.
    """
    by = list(by)
    l_us = F.unix_micros(F.col(on).cast("timestamp"))
    r_us = F.unix_micros(F.col(on).cast("timestamp"))

    bin_of = lambda c: F.floor(c / F.lit(tolerance_us)).cast("long")
    l = left.withColumn("__us", l_us).withColumn(
        "__bin",
        F.explode(
            F.array(bin_of(F.col("__us")) - 1, bin_of(F.col("__us")), bin_of(F.col("__us")) + 1)
        ),
    )
    r = (
        right.withColumn("__rus", r_us)
        .withColumn("__bin", bin_of(F.col("__rus")))
        .select(
            *by,
            "__rus",
            "__bin",
            F.col(on).alias(f"{on}{suffix}"),
            *[
                F.col(c).alias(f"{c}{suffix}")
                for c in right.columns
                if c not in by and c != on
            ],
        )
    )
    # Each right row has ONE bin and the left's three probe bins are
    # distinct, so every qualifying pair joins exactly once — no dedup.
    joined = l.join(r, on=by + ["__bin"]).filter(
        F.abs(F.col("__us") - F.col("__rus")) <= tolerance_us
    )
    return joined.drop("__bin", "__us", "__rus")


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
    # All right columns ride in ONE struct carried by a single
    # last(ignorenulls): every carried value then comes from the SAME
    # matched right row — per-column carries would mix rows whenever a
    # right column holds NULL (ASOF semantics violation).
    r_tag = right.select(
        *by,
        F.col(on).alias(on),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rv"),
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
        "*", F.last("__rv", ignorenulls=True).over(w).alias("__carry")
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *left.columns,
            *[F.col(f"__carry.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )
