"""Exact grouped percentiles via windowed rank interpolation.

Spark's builtin ``percentile`` aggregate buffers every group's values in
executor memory (OpenHashMap of value→count) — exact but a per-group
memory cliff at 100 TB group sizes.  This formulation is the
sort-spill-friendly alternative: one window sort per group (external
sort, spills), then PERCENTILE_CONT's linear interpolation picked off the
ranked rows with conditional aggregates.  Identical results (both
implement the 1-based ``(n-1)·p`` interpolation of SQL
PERCENTILE_CONT / DuckDB quantile_cont) — the registry query shares the
same DuckDB oracle as the buffer-based variant to prove it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_percentiles_windowed(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float],
    *,
    round_to: int = 4,
    prefix: str = "p",
) -> DataFrame:
    """One output row per group with a column per requested percentile.

    Column names: ``{prefix}{int(p*100)}`` (e.g. p25, p50, p90).
    """
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(F.col("x"))
    wn = Window.partitionBy(*gcols)
    d = (
        df.select(*gcols, F.col(value_col).cast("double").alias("x"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    aggs = []
    for p in ps:
        tgt = (F.col("n") - 1) * F.lit(float(p)) + 1  # 1-based rank target
        lo, hi = F.floor(tgt), F.ceil(tgt)
        x_lo = F.max(F.when(F.col("rn") == lo, F.col("x")))
        x_hi = F.max(F.when(F.col("rn") == hi, F.col("x")))
        frac = F.max(F.when(F.col("rn") == 1, tgt - F.floor(tgt)))  # const/group
        aggs.append(
            F.round(x_lo + frac * (x_hi - x_lo), round_to).alias(
                f"{prefix}{int(round(p * 100))}"
            )
        )
    return d.groupBy(*gcols).agg(*aggs)
