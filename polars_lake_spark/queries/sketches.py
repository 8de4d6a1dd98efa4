"""Sketch invariants: oracled one-row ``violations=0`` companions (the
approx_distinct_check pattern) for the two remaining sketch families —
approximate quantiles and mergeable HLL rollups.

Why these matter at 100 TB: exact quantiles buffer per-group values and
exact distinct counts shuffle every key; sketches bound both in constant
memory. The HLL check specifically exercises the ROLLUP pattern — build
per-month sketches once, union them for any ad-hoc window — which is how
distinct-user questions get answered over petabyte event logs without
rescanning (one sketch row per segment, union is associative and
map-side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table


@register(
    "approx_percentile_check",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_returnflag) * 3 AS BIGINT) AS checks,
           CAST(0 AS BIGINT) AS violations
    FROM lineitem
    """,
    doc="Oracled companion for approximate quantiles: per-group "
    "approx_percentile at accuracy A carries a rank-error guarantee of "
    "n/A; each estimate's TRUE rank must land within 4·n/A of q·n. "
    "One summary row; the oracle derives the check count and pins "
    "violations=0.",
)
def approx_percentile_check(spark, sf_dir):
    """For each l_returnflag group and q ∈ {0.25, 0.5, 0.9}: compute
    approx_percentile(l_extendedprice, q, A) and verify its true rank
    (#rows ≤ estimate) is within 4·n/A of q·n. The estimates themselves
    can drift with partition merge order — the RANK BOUND cannot, which
    is what makes this oracle-stable under any cluster layout."""
    A = 1000
    qs = [0.25, 0.5, 0.9]
    li = load_table(spark, sf_dir, "lineitem")
    est = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.array(*[F.lit(q) for q in qs]), F.lit(A)
            ).alias("aps"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "n",
            F.posexplode("aps").alias("qi", "estimate"),
        )
    )
    # true rank of each estimate: one conditional aggregate over the
    # group-keyed join (15 sketch rows broadcast against the scan)
    ranked = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag", "qi", "n")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("estimate"), 1).otherwise(0)
            ).alias("rank")
        )
        .withColumn(
            "q", F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("qi") + 1)
        )
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("checks"),
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("rank") - F.col("q") * F.col("n"))
                    > 4.0 * F.col("n") / A,
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("violations"),
    )


@register(
    "hll_union_check",
    oracle="""
    SELECT CAST(COUNT(DISTINCT date_trunc('month', o_orderdate)) + 1 AS BIGINT)
               AS checks,
           CAST(0 AS BIGINT) AS violations
    FROM orders
    """,
    doc="Oracled companion for the mergeable-HLL rollup pattern: "
    "per-month customer sketches individually within 4 sigma of the exact "
    "per-month distinct count, AND their union within 4 sigma of the "
    "whole-range exact count. checks = #months + 1 (the union row); "
    "violations pinned to 0.",
)
def hll_union_check(spark, sf_dir):
    """Build one Datasketches-HLL sketch of o_custkey per order month
    (the rollup table a 100 TB event log would persist), then answer the
    whole-range distinct-customers question by UNIONING the sketch rows —
    never rescanning orders. Both the per-month estimates and the union
    estimate must sit within 4 sigma of their exact counterparts
    (lgConfigK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%, so the gate is ~6.5%
    relative error — far above HLL's real drift, far below a broken
    sketch)."""
    lgk = 12
    tol = 4 * 1.04 / (2 ** (lgk / 2.0))
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"), "o_custkey"
    )
    monthly = orders.groupBy("month").agg(
        F.hll_sketch_agg("o_custkey", F.lit(lgk)).alias("sk"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    per_month = monthly.select(
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact"))
            > tol * F.col("exact")
        ).alias("bad")
    )
    total_exact = orders.agg(
        F.countDistinct("o_custkey").alias("exact")
    )
    union_row = (
        monthly.agg(F.hll_union_agg("sk").alias("u"))
        .crossJoin(F.broadcast(total_exact))
        .select(
            (
                F.abs(F.hll_sketch_estimate("u") - F.col("exact"))
                > tol * F.col("exact")
            ).alias("bad")
        )
    )
    both = per_month.unionByName(union_row)
    return both.agg(
        F.count(F.lit(1)).cast("bigint").alias("checks"),
        F.coalesce(
            F.sum(F.when(F.col("bad"), 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("violations"),
    )
