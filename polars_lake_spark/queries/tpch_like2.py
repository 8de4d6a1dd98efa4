"""TPC-H-shaped queries, part 2 — the remaining query shapes adapted to
the driver's star schema (which lacks partsupp, l_commitdate/receiptdate,
l_shipmode, c_phone): scalar-subquery thresholds, EXISTS/NOT EXISTS,
CASE-aggregation, outer-join distributions, min-cost lookups.

Scale notes (100 TB): nation/region/supplier are broadcast (bounded
dims); part and customer are shuffle-joined (they scale with SF);
scalar thresholds are computed distributed and attached via a broadcast
cross-join — no driver-side collect in any query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH mp AS (
        SELECT l_partkey, MIN(l_extendedprice) AS min_price
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 5 AND p_type = 'SMALL'
        GROUP BY l_partkey
    ), best AS (
        SELECT mp.l_partkey AS partkey, MIN(l_suppkey) AS suppkey,
               MIN(mp.min_price) AS min_price
        FROM lineitem
        JOIN mp ON lineitem.l_partkey = mp.l_partkey
              AND l_extendedprice = mp.min_price
        GROUP BY mp.l_partkey
    )
    SELECT p_partkey, p_brand, s_name, n_name AS supp_nation, min_price
    FROM best
    JOIN part ON p_partkey = partkey
    JOIN supplier ON s_suppkey = suppkey
    JOIN nation ON n_nationkey = s_nationkey
    ORDER BY min_price DESC, p_partkey
    LIMIT 25
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 analog (no partsupp table): per qualifying part, the
    supplier offering the minimum observed line price, ties broken by
    smallest suppkey.  min_price is emitted RAW (MIN is bit-preserving,
    no cross-engine rounding needed).  Reference SQL surface:
    /root/reference/src/tables.rs (DataFusion dialect)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "SMALL")
    )
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    mp = qualifying.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = (
        qualifying.join(
            mp.withColumnRenamed("l_partkey", "mp_partkey"),
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .groupBy("l_partkey")
        .agg(F.min("l_suppkey").alias("suppkey"), F.min("min_price").alias("min_price"))
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    p = load_table(spark, sf_dir, "part")
    return (
        best.join(p, p.p_partkey == best.l_partkey)
        .join(s, F.col("s_suppkey") == F.col("suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            "min_price",
        )
        .orderBy(F.desc("min_price"), F.asc("p_partkey"))
        .limit(25)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) >
              CAST(o_orderdate AS DATE) + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 analog: 'late' = shipped >60 days after order date (the
    schema has no commit/receipt dates).  EXISTS compiles to a left-semi
    hash join on l_orderkey — one shuffle, no fan-out."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (F.to_date(li.l_shipdate) > F.date_add(F.to_date(o.o_orderdate), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate — the canonical predicate-
    pushdown query.  All four predicates reach the parquet scan
    (PushedFilters); the aggregate is a map-side partial + 1-row final."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           ROUND(ROUND(SUM(CASE WHEN supp_nation = 'NATION_7'
                                THEN volume ELSE 0 END), 2)
                 / ROUND(SUM(volume), 2), 8) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share inside a region.  Both sums are
    rounded to the money grain BEFORE the ratio so the division operates
    on bit-identical doubles in both engines (memory: rounding rules)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n1 = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n1")
    n2 = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n2")
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    vol = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n1.n_regionkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n2, F.col("n2.n_nationkey") == F.col("s_nationkey"))
        .select(
            F.year(F.to_date("o_orderdate")).cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.round(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_7", F.col("volume"))
                        .otherwise(0.0)
                    ),
                    2,
                )
                / F.round(F.sum("volume"), 2),
                8,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH nv AS (
        SELECT l_partkey, SUM(l_extendedprice) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, ROUND(val, 2) AS value
    FROM nv
    WHERE val > (SELECT SUM(val) * 0.002 FROM nv)
    ORDER BY value DESC, partkey
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 analog (lineitem value instead of partsupp stock): parts
    whose traded value from one nation's suppliers exceeds a fraction of
    that nation's total.  The scalar threshold is a 1-row aggregate
    attached via broadcast cross-join — stays one distributed plan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    nv = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("val"))
    )
    thr = nv.agg((F.sum("val") * 0.002).alias("thr"))
    return (
        nv.crossJoin(F.broadcast(thr))
        .filter(F.col("val") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("partkey"), F.round("val", 2).alias("value")
        )
        .orderBy(F.desc("value"), F.asc("partkey"))
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_class(spark, sf_dir):
    """TPC-H Q12 analog (return flag instead of the absent l_shipmode):
    CASE-aggregation splitting line counts by order priority class."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) ch
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of order counts per customer, with the
    join-condition filter (not WHERE) so zero-order customers survive the
    left join.  Two shuffles: join+count on custkey, then the tiny
    distribution regroup."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.  The
    revenue is rounded at the money grain BEFORE the max-equality so the
    comparison is on identical doubles in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_counts(spark, sf_dir):
    """TPC-H Q16 analog (suppliers observed in lineitem instead of
    partsupp): distinct-supplier counts per part attribute bucket.
    COUNT DISTINCT expands to a two-stage partial dedup — no driver-side
    distinct."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(ROUND(SUM(l_extendedprice), 2) / 7.0, 6) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT ROUND(0.2 * AVG(l2.l_quantity), 6)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from small-quantity lines of one brand, with a
    per-part correlated average threshold.  The DataFrame form computes
    the per-part average as a grouped aggregate and joins it back — same
    single shuffle key (partkey) for both sides.  The threshold is
    rounded (6dp) to kill float-sum ulp noise at the comparison boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_thr")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part_avg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 6).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 100
    )
    ORDER BY s_suppkey
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 analog: suppliers who moved >100 units of any 'red' part
    in a year.  IN-subquery compiles to a left-semi join; quantities are
    integral-valued doubles so the HAVING boundary is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    movers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_latest_shipper",
    oracle="""
    WITH os AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CAST(l_shipdate AS DATE)) AS supp_last
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ), agg AS (
        SELECT l_orderkey, MAX(supp_last) AS order_last,
               COUNT(*) AS nsupp
        FROM os GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM os
    JOIN agg USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE nsupp >= 2 AND supp_last = order_last
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_latest_shipper(spark, sf_dir):
    """TPC-H Q21 analog (no receipt/commit dates): in multi-supplier
    orders, count per supplier how often they were the last to ship —
    the EXISTS/NOT-EXISTS pair re-expressed as one grouped pass plus a
    per-order max, both shuffling on the same l_orderkey key."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.to_date("l_shipdate")).alias("supp_last")
    )
    agg = os_.groupBy("l_orderkey").agg(
        F.max("supp_last").alias("order_last"), F.count("*").alias("nsupp")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        os_.join(agg, "l_orderkey")
        .filter((F.col("nsupp") >= 2) & (F.col("supp_last") == F.col("order_last")))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH thr AS (
        SELECT ROUND(AVG(c_acctbal), 6) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM thr)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 analog (every customer has orders, so 'idle' = no URGENT
    orders): above-average-balance customers with no urgent activity.
    NOT EXISTS = left-anti join; the average threshold is rounded (6dp)
    before the comparison and attached via broadcast cross-join."""
    c = load_table(spark, sf_dir, "customer")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("a")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
