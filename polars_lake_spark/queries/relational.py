"""Relational / SQL-surface queries (SURVEY.md §2.c).

Covers every category of the polars-sql 0.34 dialect the reference links
(`/root/reference/Cargo.toml:14`, exposed verbatim at
`/root/reference/src/database.rs:50-56`) plus the Spark-native extensions
SURVEY.md §2.c calls out (windows, rollup/cube, approx sketches).

Implementations are DataFrame-API-first so the plan is declarative and
Catalyst does pushdown/pruning/join-selection; dimension tables get
explicit broadcast hints (they are tiny at every SF — region 5 rows,
nation 25 — while lineitem is the 100 TB fact side).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Full-scan aggregate — analog of the reference's taxi aggregate
# (`/root/reference/taxi.py:57`) widened to TPC-H Q1 shape.
@register(
    "q1_pricing_summary",
    oracle="""
    WITH t AS (SELECT l_returnflag, l_linestatus,
                      CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                      CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
                      CAST(l_discount AS DECIMAL(4,2)) AS disc,
                      CAST(l_tax AS DECIMAL(4,2)) AS tax
               FROM lineitem
               WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02')
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty) AS DOUBLE)                       AS sum_qty,
           CAST(SUM(price) AS DOUBLE)                     AS sum_base_price,
           CAST(SUM(price * (1 - disc)) AS DOUBLE)        AS sum_disc_price,
           CAST(SUM(price * (1 - disc) * (1 + tax)) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 8)   AS avg_qty,
           ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(*), 8) AS avg_price,
           ROUND(CAST(SUM(disc) AS DOUBLE) / COUNT(*), 8)  AS avg_disc,
           COUNT(*)                         AS count_order
    FROM t
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """DECIMAL arithmetic throughout (r5): the source monetary columns
    are 2dp values, so casting to DECIMAL makes every sum EXACT — the
    double formulation hit 6dp rounding boundaries at sf0.1 (partial-agg
    order shifted sum_charge by 1e-6 between engines). Exact decimals
    cast to DOUBLE at the end are bit-identical at any scale and
    partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias(
                "sum_disc_price"
            ),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / cnt, 8).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / cnt, 8).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / cnt, 8).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# Point filter — the reference's flagship serving query
# (`/root/reference/src/database.rs:80`: WHERE store_key = 101).
@register(
    "point_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM lineitem WHERE l_suppkey = 5
    """,
)
def point_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_suppkey") == 5).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )


# Star join across the whole schema; dims broadcast.
@register(
    "star_join_revenue",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def star_join_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    # nation/region are broadcast (bounded at 25/5 rows at ANY scale);
    # customer is NOT hinted — it grows with SF, so AQE picks broadcast vs
    # shuffle join from runtime sizes.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ORDER BY + LIMIT with total tie-break (deterministic top-k).
@register(
    "top_customers",
    oracle="""
    SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS total_spend,
           COUNT(*) AS n_orders
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # no broadcast hint on customer — it scales with SF; AQE decides.
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


# Semi join (polars `semi_anti_join` feature, /root/reference/Cargo.toml:12).
@register(
    "semi_join_suppliers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity > 45)
    """,
)
def semi_join_suppliers(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return s.join(
        li, s.s_suppkey == li.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# Anti join — the delete-as-anti-join the reference planned
# (`/root/reference/src/main.rs:31`).
@register(
    "anti_join_parts",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
)
def anti_join_parts(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


# Set operations: UNION / INTERSECT / EXCEPT (SURVEY §2.c set ops row).
@register(
    "set_operations",
    oracle="""
    SELECT 'union' AS op, x FROM (
        SELECT DISTINCT c_nationkey AS x FROM customer
        UNION SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, x FROM (
        SELECT DISTINCT c_nationkey AS x FROM customer
        INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, x FROM (
        SELECT DISTINCT c_nationkey AS x FROM customer
        EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    """,
)
def set_operations(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("x")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x")).distinct()
    u = c.union(s).distinct().withColumn("op", F.lit("union"))
    i = c.intersect(s).withColumn("op", F.lit("intersect"))
    e = c.exceptAll(s).withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e).select("op", "x")


# Aggregate function battery (SURVEY §2.c aggregates row).
@register(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           ROUND(SUM(c_acctbal), 2) AS sum_bal,
           ROUND(ROUND(SUM(c_acctbal), 2) / COUNT(*), 8) AS avg_bal,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS std_bal,
           ROUND(VAR_SAMP(c_acctbal), 4) AS var_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.round(F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1)), 8).alias(
            "avg_bal"
        ),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
    )


# String function battery (SURVEY §2.c strings row).
@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_type, 1, 5) AS type_prefix,
           CONCAT(p_brand, '-', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           LTRIM(RTRIM(CONCAT(' ', p_name, ' '))) AS name_trimmed,
           (p_name LIKE '%a%') AS has_a,
           (LOWER(p_type) LIKE 'econ%') AS is_economy
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.ltrim(F.rtrim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" ")))).alias(
            "name_trimmed"
        ),
        F.col("p_name").like("%a%").alias("has_a"),
        F.lower("p_type").like("econ%").alias("is_economy"),
    )


# Conditional / null handling (SURVEY §2.c conditional row).
@register(
    "case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'partial' END AS status_word,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'top') AS prio_or_top,
           IFNULL(NULLIF(o_orderstatus, o_orderstatus), 'same') AS always_same,
           (CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS is_big
    FROM orders
    """,
)
def case_coalesce(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("partial")
        .alias("status_word"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("top")
        ).alias("prio_or_top"),
        F.ifnull(
            F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")), F.lit("same")
        ).alias("always_same"),
        F.when(F.col("o_totalprice") > 100000, 1).otherwise(0).alias("is_big"),
    )


# CAST / TRY_CAST (SURVEY §2.c casts row). Avoids double→int casts whose
# rounding direction differs across engines.
@register(
    "cast_try_cast",
    oracle="""
    SELECT p_partkey,
           CAST(p_size AS VARCHAR) AS size_str,
           CAST(p_size AS DOUBLE) AS size_dbl,
           CAST(CAST(p_size AS VARCHAR) AS INT) AS size_roundtrip,
           TRY_CAST(p_brand AS INT) AS brand_int,
           TRY_CAST(p_type AS DOUBLE) AS type_dbl
    FROM part
    """,
)
def cast_try_cast(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("string").alias("size_str"),
        F.col("p_size").cast("double").alias("size_dbl"),
        F.col("p_size").cast("string").cast("int").alias("size_roundtrip"),
        F.expr("TRY_CAST(p_brand AS INT)").alias("brand_int"),
        F.expr("TRY_CAST(p_type AS DOUBLE)").alias("type_dbl"),
    )


# Array functions (SURVEY §2.c arrays row) over split word lists.
@register(
    "array_functions",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           list_contains(string_split(p_name, ' '), 'green') AS has_green,
           array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',')
               AS sorted_uniq,
           list_reverse(string_split(p_name, ' '))[1] AS last_word
    FROM part
    """,
)
def array_functions(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "green").alias("has_green"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("sorted_uniq"),
        F.element_at(F.reverse(words), 1).alias("last_word"),
    )


# Array numeric ops over the embeddings fixture (element_at / size /
# aggregate — SURVEY §2.c ARRAY_SUM/ARRAY_MEAN analogs).
@register(
    "array_numeric",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vec_sum,
           ROUND(list_avg(CAST(embedding AS DOUBLE[])), 6) AS vec_mean
    FROM embeddings WHERE vec_id < 100
    """,
)
def array_numeric(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vsum = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 6).alias("first_val"),
        F.round(vsum, 4).alias("vec_sum"),
        F.round(vsum / F.size("embedding"), 6).alias("vec_mean"),
    )


# Temporal functions (SURVEY §2.c temporal row — the reference only had
# client-side `.dt.date()`, /root/reference/taxi.py:15).
@register(
    "temporal_functions",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def temporal_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# Window functions — absent from polars-sql 0.34, included per SURVEY
# §2.c ("capability parity is a floor, not a ceiling").
@register(
    "window_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
           CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                             o_orderkey) AS BIGINT) AS price_rank,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey), 2) AS cust_total,
           ROUND(LAG(o_totalprice) OVER w, 2) AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wtot = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("order_seq"),
        F.rank().over(wr).cast("bigint").alias("price_rank"),
        F.round(F.sum("o_totalprice").over(wtot), 2).alias("cust_total"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
    )


# ROLLUP with GROUPING (SURVEY §2.c grouping sets row — free extra).
@register(
    "rollup_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select(
            "r_name", "n_name", "g_region", "g_nation", "n_customers", "total_bal"
        )
    )


@register(
    "cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_flags(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select("l_returnflag", "l_linestatus", "n", "qty")
    )


# CTE + scalar & IN subqueries (SURVEY §2.c CTEs row).
@register(
    "cte_subquery",
    oracle="""
    WITH rich AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    )
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM rich
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def cte_subquery(spark, sf_dir):
    register_sql_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        WITH rich AS (
            SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        )
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
        FROM rich
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """
    )


def register_sql_views(spark, sf_dir, names):
    from polars_lake_spark.sources import register_tables

    register_tables(spark, sf_dir, names)


# JSON-in-string extraction — the reference's abandoned experiment
# (`/root/reference/src/misc:1-12`) done properly.
@register(
    "json_extraction",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int
    FROM events WHERE event_id < 500
    """,
)
def json_extraction(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


# DISTINCT + ORDER BY + LIMIT/OFFSET (SURVEY §2.c core clauses row).
@register(
    "distinct_orderby_offset",
    oracle="""
    SELECT DISTINCT c_mktsegment FROM customer
    ORDER BY c_mktsegment LIMIT 3 OFFSET 1
    """,
)
def distinct_orderby_offset(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.select("c_mktsegment").distinct().orderBy("c_mktsegment").offset(1).limit(3)
    )


# Predicates battery + HAVING (SURVEY §2.c predicates row).
@register(
    "predicates_having",
    oracle="""
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events
    WHERE value BETWEEN 5 AND 500
      AND event_type IN ('click', 'view', 'purchase')
      AND event_id IS NOT NULL
      AND NOT (user_id = 0)
    GROUP BY event_type
    HAVING COUNT(*) > 2
    """,
)
def predicates_having(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("value").between(5, 500)
            & F.col("event_type").isin("click", "view", "purchase")
            & F.col("event_id").isNotNull()
            & ~(F.col("user_id") == 0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .filter(F.col("n") > 2)
    )


# Event-time tumbling rollup — the windowed-agg extension SURVEY §2.e
# anticipates for the events fixture.
@register(
    "events_hourly_rollup",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# Sessionization — gap-based stateful semantics expressed with windows
# (batch analog of the streaming sessionizer in streaming/).
@register(
    "events_sessionize",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM seq
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def events_sessionize(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | F.expr("ts - prev_ts > INTERVAL 30 MINUTE"),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# Approx sketch (no oracle: estimator implementations differ by engine;
# driver records rows-only; approx_distinct_check below is the oracled
# companion that pins the estimator's error bound).
@register("approx_distinct", doc="approx_count_distinct sketch — rows-only check")
def approx_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@register(
    "approx_distinct_check",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS groups_checked,
           CAST(0 AS BIGINT) AS violations
    FROM lineitem
    """,
    doc="Oracled companion for approx_distinct (one-row violations=0 "
    "invariant, same pattern as similarity_*_recall): per-group HLL++ "
    "estimate vs exact COUNT(DISTINCT), violation when relative error "
    "exceeds 4x the configured rsd.",
)
def approx_distinct_check(spark, sf_dir):
    """|approx_count_distinct − exact| ≤ 4·rsd·exact per l_returnflag
    group. HLL++ at rsd=0.05 is a 1-sigma bound; 4 sigma makes the
    invariant deterministic for a fixed dataset while still catching a
    broken sketch (which errs by orders of magnitude, not percent)."""
    rsd = 0.05
    li = _t(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    return per_group.agg(
        F.count(F.lit(1)).cast("bigint").alias("groups_checked"),
        # coalesce: SUM over zero rows is NULL, the oracle's literal is 0
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("approx") - F.col("exact"))
                    > 4 * rsd * F.col("exact"),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("violations"),
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
           ROUND(quantile_cont(l_quantity, 0.50), 4) AS qty_median
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def exact_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (SQL PERCENTILE_CONT semantics in
    both engines). The approx sketch variant stays rows-only
    (approx_distinct); this is the oracled exact path."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.90)), 4).alias("p90"),
            F.round(F.percentile("l_quantity", F.lit(0.50)), 4).alias("qty_median"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_range_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
               AS rolling_30d,
           NTILE(4) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
               AS quartile,
           ROUND(PERCENT_RANK() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 8)
               AS pct_rank,
           ROUND(LAG(o_totalprice, 1, 0.0) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS prev_price
    FROM orders WHERE o_custkey % 20 = 0
    """,
)
def window_range_frames(spark, sf_dir):
    """Value-RANGE window frames (30-day rolling sum via epoch-second
    range bounds — peers included identically in both engines), plus
    ntile/percent_rank/lag on fully-deterministic orders."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    ts = F.to_date("o_orderdate").cast("timestamp").cast("long")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(ts)
        .rangeBetween(-30 * 86400, 0)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("rolling_30d"),
        F.ntile(4).over(w_rank).alias("quartile"),
        F.round(F.percent_rank().over(w_rank), 8).alias("pct_rank"),
        F.round(F.lag("o_totalprice", 1, 0.0).over(w_seq), 2).alias("prev_price"),
    )


@register(
    "exact_percentiles_windowed",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def exact_percentiles_windowed(spark, sf_dir):
    """Same PERCENTILE_CONT results as exact_percentiles, via the
    sort-spill windowed formulation (operators/quantiles.py) — the
    100 TB-group-size path; sharing the oracle proves the two
    formulations equal."""
    from polars_lake_spark.operators.quantiles import grouped_percentiles_windowed

    li = _t(spark, sf_dir, "lineitem")
    return grouped_percentiles_windowed(
        li, ["l_returnflag"], "l_extendedprice", [0.25, 0.50, 0.90]
    ).orderBy("l_returnflag")
