"""Extended function-surface queries (SURVEY §2.c scalar math / strings /
aggregates rows, plus polars-sql's SELECT EXCLUDE).

Determinism: irrational math outputs (exp/ln/trig/sqrt) are rounded at
6dp — the values are non-terminating decimals, so engine libm last-ulp
differences can't sit on a rounding boundary.  ARRAY_AGG is made
order-insensitive by sorting the aggregated array.  min_by/max_by use a
unique ordering key (acctbal + custkey·1e-9) so ties can't occur.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table


@register(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           ABS(p_size - 25) AS abs_off,
           CAST(CEIL(p_retailprice / 100) AS BIGINT) AS price_ceil,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_floor,
           ROUND(EXP(p_size / 25.0), 6) AS e_sz,
           ROUND(LN(p_retailprice + 1), 6) AS ln_price,
           ROUND(LOG10(p_retailprice + 1), 6) AS log10_price,
           ROUND(LOG2(p_size + 1), 6) AS log2_sz,
           ROUND(POW(p_size, 2), 1) AS sz_sq,
           ROUND(SQRT(p_retailprice), 6) AS sqrt_price,
           ROUND(CBRT(p_retailprice), 6) AS cbrt_price,
           p_size % 7 AS sz_mod,
           ROUND(SIN(p_size), 6) AS sin_sz,
           ROUND(COS(p_size), 6) AS cos_sz,
           ROUND(ATAN(p_size / 10.0), 6) AS atan_sz,
           CAST(SIGN(p_size - 25) AS INT) AS sz_sign
    FROM part
    """,
)
def math_functions(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    sz = F.col("p_size")
    pr = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(sz - 25).alias("abs_off"),
        F.ceil(pr / 100).cast("bigint").alias("price_ceil"),
        F.floor(pr / 100).cast("bigint").alias("price_floor"),
        F.round(F.exp(sz / 25.0), 6).alias("e_sz"),
        F.round(F.log(pr + 1), 6).alias("ln_price"),
        F.round(F.log10(pr + 1), 6).alias("log10_price"),
        F.round(F.log2(sz + 1), 6).alias("log2_sz"),
        F.round(F.pow(sz, 2), 1).alias("sz_sq"),
        F.round(F.sqrt(pr), 6).alias("sqrt_price"),
        F.round(F.cbrt(pr), 6).alias("cbrt_price"),
        (sz % 7).alias("sz_mod"),
        F.round(F.sin(sz), 6).alias("sin_sz"),
        F.round(F.cos(sz), 6).alias("cos_sz"),
        F.round(F.atan(sz / 10.0), 6).alias("atan_sz"),
        F.signum(sz - 25).cast("int").alias("sz_sign"),
    )


@register(
    "string_functions2",
    oracle="""
    SELECT p_partkey,
           LPAD(p_brand, 12, '*') AS brand_lpad,
           RPAD(p_brand, 12, '*') AS brand_rpad,
           REPEAT(p_brand, 2) AS brand_x2,
           REVERSE(p_name) AS name_rev,
           LEFT(p_name, 4) AS name_left,
           RIGHT(p_name, 4) AS name_right,
           SPLIT_PART(p_name, ' ', 1) AS name_word1,
           SPLIT_PART(p_name, ' ', 2) AS name_word2,
           INSTR(p_name, 'a') AS first_a,
           TRANSLATE(p_brand, '#', '-') AS brand_dash,
           REGEXP_EXTRACT(p_brand, '[0-9]+', 0) AS brand_num,
           (REGEXP_MATCHES(p_name, '^[a-z]+ [a-z]+$')) AS two_words
    FROM part
    """,
)
def string_functions2(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, "*").alias("brand_rpad"),
        F.repeat(F.col("p_brand"), 2).alias("brand_x2"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.expr("LEFT(p_name, 4)").alias("name_left"),
        F.expr("RIGHT(p_name, 4)").alias("name_right"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("name_word1"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("name_word2"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
        F.regexp_extract(F.col("p_brand"), "[0-9]+", 0).alias("brand_num"),
        F.col("p_name").rlike("^[a-z]+ [a-z]+$").alias("two_words"),
    )


@register(
    "temporal_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_95,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
           CAST(EXTRACT(isodow FROM o_orderdate) - 1 AS INT) AS weekday_mon0,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(EXTRACT(doy FROM o_orderdate) AS INT) AS day_of_year,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def temporal_arithmetic(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias(
            "days_since_95"
        ),
        F.date_add(d, 30).cast("timestamp_ntz").alias("due_ts"),
        F.weekday(d).cast("int").alias("weekday_mon0"),
        F.quarter(d).cast("int").alias("qtr"),
        F.dayofyear(d).cast("int").alias("day_of_year"),
        F.last_day(d).alias("month_end"),
    )


@register(
    "minmax_by",
    oracle="""
    SELECT n_name,
           ARG_MAX(c_name, c_acctbal + c_custkey * 1e-9) AS richest,
           ARG_MIN(c_name, c_acctbal + c_custkey * 1e-9) AS poorest,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(MIN(c_acctbal), 2) AS min_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def minmax_by(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    ordkey = F.col("c_acctbal") + F.col("c_custkey") * 1e-9  # unique → no ties
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", ordkey).alias("richest"),
            F.min_by("c_name", ordkey).alias("poorest"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
    )


@register(
    "select_exclude",
    oracle="""
    SELECT * EXCLUDE (o_orderpriority, o_orderdate) FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def select_exclude(spark, sf_dir):
    """polars-sql's SELECT EXCLUDE (SURVEY §2.c core clauses) = df.drop."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.drop("o_orderpriority", "o_orderdate")


@register(
    "array_agg_sorted",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           ARRAY_TO_STRING(LIST_SORT(ARRAY_AGG(o_orderkey)), ',') AS orderkeys
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
)
def array_agg_sorted(spark, sf_dir):
    """ARRAY_AGG made order-insensitive via array_sort (collect_list order
    is a shuffle artifact in any distributed engine).  The sorted array is
    serialized to a comma-joined string in both dialects so the result is
    hashable by the driver's value-comparison harness (r1 VERDICT fix #2)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.array_join(F.array_sort(F.collect_list("o_orderkey")), ",").alias(
                "orderkeys"
            ),
        )
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "histogram_totals",
    oracle="""
    -- width_bucket(x, 0, 600000, 12) spelled out (DuckDB lacks the fn):
    -- 0 underflow, 13 overflow, else floor(x / 50000) + 1
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 13
                ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1
           END AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY bucket
    """,
)
def histogram_totals(spark, sf_dir):
    """Equi-width histogram via width_bucket — one partial-aggregated
    groupBy on a 14-value key (n buckets + under/overflow), the
    fixed-size-output profiling scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )
