"""Mutation/maintenance operators (SURVEY.md §2.b) expressed as pure
queries over derived inputs, so the driver's DuckDB oracle can check the
exact merge semantics:

* upsert  — full outer join + per-column coalesce(new, old); incoming NULL
  does not clobber (``/root/reference/src/dataset.rs:108-147,115``)
* insert  — append = union all (``/root/reference/src/dataset.rs:271-295``)
* delete  — left anti join (reference TODO ``/root/reference/src/main.rs:31``)
* dedup   — keyed drop-duplicates, deterministic survivor (TODO ``main.rs:32``)
* schema evolution — union-by-name with missing columns (TODO ``main.rs:33``)
* audit columns — CREATED_AT/CHANGED_AT stamps (TODO ``main.rs:34``)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.operators import merge as M
from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table

ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _updates(orders):
    """Deterministic update batch: repriced rows (status nulled — must NOT
    clobber) + brand-new keys."""
    upd = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 1.1, 3).alias("o_totalprice"),
        "o_orderdate",
        F.lit("RE-PRICED").alias("o_orderpriority"),
    )
    new = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(100.0).alias("o_totalprice"),
        "o_orderdate",
        F.lit("NEW").alias("o_orderpriority"),
    )
    return upd.unionByName(new)


_UPDATES_SQL = """
    SELECT o_orderkey, o_custkey, CAST(NULL AS VARCHAR) AS o_orderstatus,
           ROUND(o_totalprice * 1.1, 3) AS o_totalprice, o_orderdate,
           'RE-PRICED' AS o_orderpriority
    FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, 'N', 100.0, o_orderdate, 'NEW'
    FROM orders WHERE o_orderkey % 97 = 0
"""


@register(
    "upsert_merge",
    oracle=f"""
    WITH updates AS ({_UPDATES_SQL})
    SELECT COALESCE(o.o_orderkey, u.o_orderkey) AS o_orderkey,
           COALESCE(u.o_custkey, o.o_custkey) AS o_custkey,
           COALESCE(u.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
           ROUND(COALESCE(u.o_totalprice, o.o_totalprice), 3) AS o_totalprice,
           COALESCE(u.o_orderdate, o.o_orderdate) AS o_orderdate,
           COALESCE(u.o_orderpriority, o.o_orderpriority) AS o_orderpriority
    FROM orders o FULL OUTER JOIN updates u ON o.o_orderkey = u.o_orderkey
    """,
)
def upsert_merge(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    merged = M.upsert(orders, _updates(orders), keys=["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 3).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )


@register(
    "insert_append",
    oracle="""
    WITH appended AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        UNION ALL
        SELECT o_orderkey + 20000000, 'P', ROUND(o_totalprice / 2, 3)
        FROM orders WHERE o_orderkey % 53 = 0
    )
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 3) AS total
    FROM appended GROUP BY o_orderstatus
    """,
)
def insert_append(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    batch = orders.filter(F.col("o_orderkey") % 53 == 0).select(
        (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
        F.lit("P").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") / 2, 3).alias("o_totalprice"),
    )
    appended = base.unionByName(batch)
    return appended.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 3).alias("total"),
    )


@register(
    "delete_anti",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
    GROUP BY l_returnflag
    """,
)
def delete_anti(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    deletes = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    remaining = M.delete_keys(li, deletes, ["l_orderkey"])
    return remaining.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "dedup_keyed",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, ROUND(l_quantity, 2) AS l_quantity
    FROM lineitem
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber, l_partkey, l_quantity) = 1
    """,
)
def dedup_keyed(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    kept = M.drop_duplicates_keyed(li, ["l_orderkey"], order_by=["l_linenumber", "l_partkey", "l_quantity"])
    return kept.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.round("l_quantity", 2).alias("l_quantity"),
    )


@register(
    "schema_evolution_union",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey,
           CAST(NULL AS DOUBLE) AS o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def schema_evolution_union(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus"
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "audit_columns",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           TIMESTAMP '2026-01-01 00:00:00' AS created_at,
           TIMESTAMP '2026-01-01 00:00:00' AS changed_at
    FROM orders WHERE o_custkey % 25 = 0
    """,
)
def audit_columns(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 0)
    stamped = M.with_audit_columns(
        orders.select("o_orderkey", "o_orderstatus"), ts="2026-01-01 00:00:00"
    )
    return stamped


@register(
    "time_travel_upsert",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
    v1 AS (
        SELECT 'v1' AS snapshot, o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM base GROUP BY o_orderstatus
    ),
    v2 AS (
        SELECT 'v2' AS snapshot, o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                              ELSE o_totalprice END), 2) AS total
        FROM base GROUP BY o_orderstatus
    )
    SELECT * FROM v1 UNION ALL SELECT * FROM v2
    """,
)
def time_travel_upsert(spark, sf_dir):
    """End-to-end snapshot-layer roundtrip (snapshots.py): create a
    versioned table, upsert a repricing batch, then aggregate BOTH the
    pre-upsert snapshot (time travel to v1) and the current one.  The
    oracle replays v1 as the raw subset and v2 as the CASE-repriced
    subset — matching both proves the snapshot mapping replaces exactly
    the touched partitions and old dirs stay intact.

    The result is collected (bounded: #status × 2 rows) so the temp
    store can be removed eagerly; everything before the final aggregate
    is distributed."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="pls_tt_")
    try:
        eng = Engine(spark, root)
        base = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 3 == 0
        )
        eng.create_table(
            "tt_orders",
            base,
            partition_by=["o_orderstatus"],
            keys=["o_orderkey"],
            versioned=True,
        )
        batch = base.filter(F.col("o_orderkey") % 6 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        eng.upsert("tt_orders", batch)

        def snap_agg(df, label):
            return df.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            ).select(
                F.lit(label).alias("snapshot"),
                "o_orderstatus",
                "n_orders",
                "total",
            )

        out = snap_agg(eng.table("tt_orders", version=1), "v1").unionByName(
            snap_agg(eng.table("tt_orders"), "v2")
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "cdc_changes",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0)
    SELECT o_orderkey, o_orderstatus,
           ROUND(o_totalprice + 10, 2) AS o_totalprice,
           'update' AS _change_type
    FROM base WHERE o_orderkey % 6 = 0
    UNION ALL
    SELECT o_orderkey + 90000000, o_orderstatus,
           ROUND(o_totalprice + 10, 2), 'insert'
    FROM base WHERE o_orderkey % 97 = 0
    """,
)
def cdc_changes(spark, sf_dir):
    """Change-data-feed roundtrip (engine.changes, snapshots.py): create a
    versioned table, upsert updates + brand-new keys, then diff snapshot
    v1 → v2.  The oracle states the expected feed directly: the repriced
    keys as updates, the new keys as inserts, nothing else.  Collected
    (bounded: the change set) so the temp store can be removed eagerly."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="pls_cdc_")
    try:
        eng = Engine(spark, root)
        base = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 3 == 0
        )
        eng.create_table(
            "cdc_orders",
            base,
            partition_by=["o_orderstatus"],
            keys=["o_orderkey"],
            versioned=True,
        )
        upd = base.filter(F.col("o_orderkey") % 6 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 10.0
        )
        ins = (
            base.filter(F.col("o_orderkey") % 97 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 90_000_000)
            .withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
        )
        eng.upsert("cdc_orders", upd.unionByName(ins))
        out = eng.changes("cdc_orders", 1, 2).select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "_change_type",
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "merge_into_conditional",
    oracle="""
    WITH res AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice + 100
        FROM orders WHERE o_orderkey % 5 = 0 AND o_custkey % 3 <> 0
        UNION ALL
        SELECT o_orderkey + 70000000, o_orderstatus, o_totalprice + 100
        FROM orders WHERE o_orderkey % 89 = 0
    )
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM res GROUP BY o_orderstatus
    """,
)
def merge_into_conditional(spark, sf_dir):
    """MERGE INTO with all three actions (operators/merge.py:merge_into):
    matched rows with o_custkey%3=0 are DELETED, other matches are
    UPDATED (+100), source-only keys INSERTED.  The oracle states the
    closed-form result of the three clauses."""
    orders = load_table(spark, sf_dir, "orders")
    src = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .unionByName(
            orders.filter(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 70_000_000
            )
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
    )
    merged = M.merge_into(
        orders,
        src,
        keys=["o_orderkey"],
        when_matched_delete=(F.col("n.o_custkey") % 3 == 0),
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "data_quality_report",
    oracle="""
    SELECT 'null_violations' AS check_name,
           CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL OR l_quantity IS NULL)
                AS BIGINT) AS n_bad
    FROM lineitem
    UNION ALL
    SELECT 'pk_duplicates',
           CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS c FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'range_violations',
           CAST(COUNT(*) FILTER (WHERE l_quantity < 0 OR l_quantity > 100
                                 OR l_discount < 0 OR l_discount > 1)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'enum_violations',
           CAST(COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R'))
                AS BIGINT)
    FROM lineitem
    """,
)
def data_quality_report(spark, sf_dir):
    """Constraint-check report (the Delta CHECK-constraint / expectations
    analog): NOT NULL, primary-key uniqueness, numeric range, and enum
    membership violations in one pass — three scans collapse to
    conditional aggregates plus one keyed groupBy for the PK check; at
    100 TB each check is a map-side partial aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    nulls = li.agg(
        F.lit("null_violations").alias("check_name"),
        F.count_if(
            F.col("l_orderkey").isNull() | F.col("l_quantity").isNull()
        ).cast("bigint").alias("n_bad"),
    )
    dups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.lit("pk_duplicates").alias("check_name"),
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("bigint").alias("n_bad"),
        )
    )
    ranges = li.agg(
        F.lit("range_violations").alias("check_name"),
        F.count_if(
            (F.col("l_quantity") < 0)
            | (F.col("l_quantity") > 100)
            | (F.col("l_discount") < 0)
            | (F.col("l_discount") > 1)
        ).cast("bigint").alias("n_bad"),
    )
    enums = li.agg(
        F.lit("enum_violations").alias("check_name"),
        F.count_if(~F.col("l_returnflag").isin("A", "N", "R"))
        .cast("bigint")
        .alias("n_bad"),
    )
    return nulls.union(dups).union(ranges).union(enums)


@register(
    "sketch_rollup_lifecycle",
    oracle="""
    WITH whole AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
                          COUNT(*) AS rows
                   FROM events GROUP BY event_type)
    SELECT event_type, rows, CAST(0 AS BIGINT) AS violations
    FROM whole ORDER BY event_type
    """,
)
def sketch_rollup_lifecycle(spark, sf_dir):
    """End-to-end engine sketch-rollup lifecycle: create a versioned
    events table from HALF the fixture, roll up per-event-type HLL
    sketches of user_id, append the other half, refresh incrementally
    (append-only path — only the new rows are sketched), then compare
    every segment's estimate from SKETCH ROWS ONLY against the exact
    distinct count. Exact row counts and the 4-sigma estimate invariant
    (lgK=12 => ~6.5% gate) are the oracle-checkable outputs; the oracle
    replays rows/violations over the whole fixture."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    lgk = 12
    tol = 4 * 1.04 / (2 ** (lgk / 2.0))
    root = tempfile.mkdtemp(prefix="pls_skr_")
    try:
        eng = Engine(spark, root)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id"
        )
        eng.create_table(
            "ev", ev.filter(F.col("event_id") % 2 == 0),
            keys=["event_id"], versioned=True,
        )
        eng.create_sketch_rollup("ev_sk", "ev", ["event_type"], "user_id", lgk=lgk)
        eng.insert("ev", ev.filter(F.col("event_id") % 2 == 1))
        eng.refresh_sketch_rollup("ev_sk")
        est = eng.table("ev_sk").select(
            "event_type",
            F.hll_sketch_estimate("sketch").cast("bigint").alias("approx"),
            "n_rows",
        )
        exact = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("exact_distinct"),
            F.count(F.lit(1)).alias("rows"),
        )
        out = (
            exact.join(est, "event_type")
            .select(
                "event_type",
                "rows",
                (
                    (F.col("n_rows") != F.col("rows"))
                    | (
                        F.abs(F.col("approx") - F.col("exact_distinct"))
                        > tol * F.col("exact_distinct")
                    )
                )
                .cast("bigint")
                .alias("violations"),
            )
            .orderBy("event_type")
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "sql_dml_lifecycle",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    upd AS (SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 10 = 0
                        THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1.05
                                  AS DOUBLE)
                        ELSE o_totalprice END AS o_totalprice
            FROM base),
    del AS (SELECT * FROM upd
            WHERE NOT coalesce(o_orderstatus = 'F' AND o_totalprice < 50000,
                               FALSE)),
    ins AS (SELECT * FROM del
            UNION ALL
            SELECT CAST(99999901 AS BIGINT), 'N', CAST(1.5 AS DOUBLE))
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM ins
    """,
)
def sql_dml_lifecycle(spark, sf_dir):
    """The SQL statement surface end to end through ``engine.sql``:
    UPDATE (row-exact, DECIMAL-exact arithmetic so the repriced doubles
    are bit-identical in any engine), DELETE (predicate-scoped, NULL
    predicate keeps), INSERT INTO ... SELECT (positional, cast to table
    types) — then the surviving contents, which DuckDB replays as pure
    relational algebra.  This is the driver-gate evidence for the DML
    path the 24 pytest cases cover structurally."""
    from polars_lake_spark import Engine

    eng = Engine(spark, None)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    eng.create_table("dml_orders", orders, keys=["o_orderkey"], save=False)
    eng.sql(
        "UPDATE dml_orders SET o_totalprice = "
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1.05 AS DOUBLE) "
        "WHERE o_orderkey % 10 = 0"
    )
    eng.sql(
        "DELETE FROM dml_orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice < 50000"
    )
    eng.sql(
        "INSERT INTO dml_orders "
        "SELECT CAST(99999901 AS BIGINT), 'N', CAST(1.5 AS DOUBLE)"
    )
    return eng.table("dml_orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "sql_timetravel_lifecycle",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_orderkey % 5 = 0),
    upd AS (SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1.10
                                  AS DOUBLE)
                        ELSE o_totalprice END AS o_totalprice
            FROM base)
    SELECT u.o_orderkey,
           b.o_totalprice AS price_v1,
           u.o_totalprice AS price_now,
           CAST(NULL AS VARCHAR) AS flag
    FROM upd u JOIN base b USING (o_orderkey)
    """,
    doc="SQL time-travel + ALTER TABLE statement surface (VERDICT r5 "
    "item 7): ADD CONSTRAINT gates the UPDATE, ADD COLUMN lands as one "
    "snapshot, and a single SELECT self-joins the current state against "
    "FOR VERSION AS OF 1 — DuckDB replays both states relationally.",
)
def sql_timetravel_lifecycle(spark, sf_dir):
    """Versioned-table statement lifecycle end to end through
    ``engine.sql``: ALTER TABLE ADD CONSTRAINT (validated against the
    data, enforced by the UPDATE's rewrite), DECIMAL-exact UPDATE,
    ALTER TABLE ADD COLUMN (NULL-filled, snapshot-committed), then one
    SELECT joining the live table to ``FOR VERSION AS OF 1`` — proving
    the AS OF rewrite composes inside arbitrary query text and the
    pre-ALTER snapshot retains its original schema/prices."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_ttl_")
    try:
        eng = Engine(spark, root)
        orders = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .filter(F.col("o_orderkey") % 5 == 0)
        )
        eng.create_table("tt_orders", orders, keys=["o_orderkey"], versioned=True)
        eng.sql(
            "ALTER TABLE tt_orders ADD CONSTRAINT price_pos "
            "CHECK (o_totalprice >= 0)"
        )
        eng.sql(
            "UPDATE tt_orders SET o_totalprice = "
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1.10 AS DOUBLE) "
            "WHERE o_orderkey % 7 = 0"
        )
        eng.sql("ALTER TABLE tt_orders ADD COLUMN flag string")
        out = eng.sql(
            "SELECT c.o_orderkey, o.o_totalprice AS price_v1, "
            "c.o_totalprice AS price_now, c.flag "
            "FROM tt_orders c JOIN tt_orders FOR VERSION AS OF 1 o "
            "ON c.o_orderkey = o.o_orderkey"
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "sql_ddl_lifecycle",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
                  FROM orders WHERE o_orderkey % 4 = 0),
    ow AS (SELECT o_orderkey, o_orderstatus,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DOUBLE)
                  AS price
           FROM base WHERE o_orderkey % 3 = 0)
    SELECT c.o_orderkey,
           c.price,
           b.o_totalprice AS price_v1,
           CAST(length(b.o_orderpriority) AS BIGINT) AS priority_len,
           CAST(3 AS BIGINT) AS n_cols,
           CAST(1 AS BIGINT) AS n_catalog
    FROM ow c JOIN base b USING (o_orderkey)
    """,
    doc="Column-DDL + INSERT OVERWRITE statement surface (VERDICT r6 "
    "item 4): DROP COLUMN and RENAME COLUMN rewrite as snapshots, "
    "INSERT OVERWRITE atomically replaces from a self-referential "
    "SELECT, DESCRIBE/SHOW TABLES report the post-DDL catalog, and one "
    "SELECT joins the current state to FOR VERSION AS OF 1 (which still "
    "carries the dropped column and the old name).",
)
def sql_ddl_lifecycle(spark, sf_dir):
    """Statement lifecycle for the r7 column-DDL surface through
    ``engine.sql``: ALTER TABLE DROP COLUMN (rewrite without the column;
    the pre-DDL snapshot keeps its data), ALTER TABLE RENAME COLUMN
    (upsert keys follow), INSERT OVERWRITE ... SELECT reading the
    table's own pre-statement state, SHOW TABLES / DESCRIBE as the
    catalog evidence (their outputs land as oracled literals), then one
    SELECT joining the live table to ``FOR VERSION AS OF 1`` — DuckDB
    replays the whole chain relationally."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_ddl_")
    try:
        eng = Engine(spark, root)
        orders = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
            .filter(F.col("o_orderkey") % 4 == 0)
        )
        eng.create_table(
            "ddl_orders", orders, keys=["o_orderkey"], versioned=True
        )
        eng.sql("ALTER TABLE ddl_orders DROP COLUMN o_orderpriority")
        eng.sql("ALTER TABLE ddl_orders RENAME COLUMN o_totalprice TO price")
        eng.sql(
            "INSERT OVERWRITE TABLE ddl_orders "
            "SELECT o_orderkey, o_orderstatus, "
            "CAST(CAST(price AS DECIMAL(12,2)) * 2 AS DOUBLE) "
            "FROM ddl_orders WHERE o_orderkey % 3 = 0"
        )
        n_cols = len(eng.sql("DESCRIBE ddl_orders").collect())
        n_catalog = (
            eng.sql("SHOW TABLES")
            .filter(F.col("tableName") == "ddl_orders")
            .count()
        )
        out = eng.sql(
            "SELECT c.o_orderkey, c.price, v.o_totalprice AS price_v1, "
            "CAST(length(v.o_orderpriority) AS BIGINT) AS priority_len, "
            f"CAST({n_cols} AS BIGINT) AS n_cols, "
            f"CAST({n_catalog} AS BIGINT) AS n_catalog "
            "FROM ddl_orders c JOIN ddl_orders FOR VERSION AS OF 1 v "
            "ON c.o_orderkey = v.o_orderkey"
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "sql_dml_partitioned_lifecycle",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                  WHERE o_orderkey % 3 = 0),
    del AS (SELECT * FROM base
            WHERE NOT coalesce(o_orderstatus = 'P'
                               OR (o_orderstatus = 'F' AND o_orderkey % 7 = 0),
                               FALSE)),
    upd AS (SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderstatus = 'O' AND o_orderkey % 5 = 0
                        THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1.02
                                  AS DOUBLE)
                        ELSE o_totalprice END AS o_totalprice
            FROM del)
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
    """,
    doc="Partition-scoped DML gate (r7): DELETE that empties one "
    "partition (tombstoned, untouched partitions carried by reference) "
    "and a partition-scoped UPDATE on a status-partitioned versioned "
    "table, replayed relationally by DuckDB.",
)
def sql_dml_partitioned_lifecycle(spark, sf_dir):
    """DML statements against a PARTITIONED versioned table take the
    replace_where path: the DELETE empties the o_orderstatus='P'
    partition entirely (partition tombstone — the snapshot mapping drops
    the key, untouched partitions carry by reference) and trims the 'F'
    partition; the UPDATE touches only the 'O' partition.  The final
    per-partition summary must match DuckDB's pure-relational replay —
    proving the scoped writes lose and duplicate nothing."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_pdml_")
    try:
        eng = Engine(spark, root)
        orders = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .filter(F.col("o_orderkey") % 3 == 0)
        )
        eng.create_table(
            "p_orders",
            orders,
            partition_by=["o_orderstatus"],
            keys=["o_orderkey"],
            versioned=True,
        )
        eng.sql(
            "DELETE FROM p_orders WHERE o_orderstatus = 'P' "
            "OR (o_orderstatus = 'F' AND o_orderkey % 7 = 0)"
        )
        eng.sql(
            "UPDATE p_orders SET o_totalprice = "
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1.02 AS DOUBLE) "
            "WHERE o_orderstatus = 'O' AND o_orderkey % 5 = 0"
        )
        # the emptied partition must be tombstoned out of the snapshot
        # mapping, not rewritten empty (tested structurally in
        # tests/test_replace_partitions.py; here it shows as zero 'P'
        # rows in the oracled summary)
        # Per-row output with RAW doubles (sql_dml_lifecycle's pattern):
        # the update's cast chain produces bit-identical doubles in both
        # engines, but re-aggregating money through a DECIMAL cast hits
        # engine-specific rounding at scale (caught at sf0.1).
        out = eng.sql(
            "SELECT o_orderkey, o_orderstatus, o_totalprice FROM p_orders"
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "exactly_once_ingest_check",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_orderkey % 11 = 0),
    b1 AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice
           FROM base WHERE o_orderkey % 2 = 0),
    b2 AS (SELECT o_orderkey + 200000000 AS o_orderkey, o_totalprice
           FROM base WHERE o_orderkey % 2 = 1)
    SELECT o_orderkey, o_totalprice FROM base
    UNION ALL SELECT * FROM b1
    UNION ALL SELECT * FROM b2
    """,
    doc="Exactly-once ingest gate (r7): idempotent-writer transaction "
    "watermarks (Delta txnAppId/txnVersion analog) — batch 1, an "
    "unrelated write, batch 2, then FULL REPLAYS of both batches, which "
    "the engine skips off the watermark riding in the latest snapshot. "
    "DuckDB replays the exactly-once application relationally.",
)
def exactly_once_ingest_check(spark, sf_dir):
    """Appends are the ingest mode foreachBatch replay genuinely
    corrupts (a re-run epoch duplicates rows). Apply two append batches
    with ``txn=('loader', n)``, interleave an untracked upsert (the
    watermark must carry across unrelated commits), then replay BOTH
    batches — each must be a no-op, leaving exactly base ∪ b1 ∪ b2 for
    DuckDB to pin value-exactly."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_txn_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .filter(F.col("o_orderkey") % 11 == 0)
            .localCheckpoint(eager=True)
        )
        b1 = base.filter(F.col("o_orderkey") % 2 == 0).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_totalprice",
        )
        b2 = base.filter(F.col("o_orderkey") % 2 == 1).select(
            (F.col("o_orderkey") + 200000000).alias("o_orderkey"),
            "o_totalprice",
        )
        eng.create_table("eo", base, keys=["o_orderkey"], versioned=True)
        eng.insert("eo", b1, txn=("loader", 1))
        # unrelated writer commits in between; watermark must survive it
        eng.upsert("eo", base.limit(1))
        eng.insert("eo", b2, txn=("loader", 2))
        # crash-replay of both epochs: skipped via the snapshot watermark
        eng.insert("eo", b1, txn=("loader", 1))
        eng.insert("eo", b2, txn=("loader", 2))
        out = eng.table("eo").select("o_orderkey", "o_totalprice")
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "sparse_delete_dv_check",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS month,
               o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0),
    d1 AS (SELECT * FROM base WHERE NOT (o_custkey % 10 = 3)),
    u AS (SELECT o_orderkey, o_custkey, month,
                 CASE WHEN o_custkey % 10 = 4 THEN o_totalprice + 5.0
                      ELSE o_totalprice END AS o_totalprice
          FROM d1),
    d2 AS (SELECT * FROM u WHERE NOT (o_orderkey % 1000 = 1)),
    app AS (SELECT o_orderkey + 500000000 AS o_orderkey, o_custkey, month,
                   o_totalprice
            FROM base WHERE o_orderkey % 3 = 0)
    SELECT o_orderkey, o_custkey, month, o_totalprice FROM d2
    UNION ALL SELECT * FROM app
    """,
    doc="Deletion-vector gate (r8): merge-on-read DELETE/UPDATE on a "
    "month-partitioned versioned table — sparse predicate DML commits "
    "O(mutated rows) sidecars instead of rewriting every touched "
    "partition (data files asserted byte-identical in "
    "tests/test_deletion_vectors.py; the broadcast anti-join + intact "
    "partition pruning is plan-gated there). DuckDB replays the "
    "delete→update→delete→append lifecycle relationally.",
)
def sparse_delete_dv_check(spark, sf_dir):
    """The r7 verdict's #1 scale gap: ``DELETE WHERE user_id = k`` on a
    date-partitioned table rewrote every partition holding a match.
    With deletion vectors the same statement commits an O(deleted-rows)
    (file, row_index) sidecar; reads anti-join it out below intact
    partition pruning. The lifecycle here composes two sparse DELETEs, a
    merge-on-read UPDATE (DV old rows + append new, one atomic commit),
    and a plain append — the final state is value-exact vs DuckDB
    (``+ 5.0`` is the same IEEE double op in both engines)."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_dv_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 7 == 0)
            .select(
                "o_orderkey",
                "o_custkey",
                F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
                    "month"
                ),
                "o_totalprice",
            )
            .localCheckpoint(eager=True)
        )
        eng.create_table(
            "dvt",
            base,
            partition_by=["month"],
            keys=["o_orderkey"],
            versioned=True,
            deletion_vectors=True,
        )
        eng.sql("DELETE FROM dvt WHERE o_custkey % 10 = 3")
        eng.sql(
            "UPDATE dvt SET o_totalprice = o_totalprice + 5.0 "
            "WHERE o_custkey % 10 = 4"
        )
        eng.sql("DELETE FROM dvt WHERE o_orderkey % 1000 = 1")
        eng.insert(
            "dvt",
            base.filter(F.col("o_orderkey") % 3 == 0).select(
                (F.col("o_orderkey") + 500000000).alias("o_orderkey"),
                "o_custkey",
                "month",
                "o_totalprice",
            ),
        )
        out = eng.table("dvt").select(
            "o_orderkey", "o_custkey", "month", "o_totalprice"
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "merge_dv_check",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_custkey,
               substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS month,
               o_totalprice
        FROM orders WHERE o_orderkey % 17 = 0),
    d1 AS (SELECT * FROM base WHERE NOT (o_custkey % 10 = 6)),
    src AS (
        SELECT k, o_custkey, month,
               CASE WHEN k % 5 = 0 THEN -1.0
                    ELSE o_totalprice + 7.0 END AS o_totalprice
        FROM base WHERE k % 3 = 0 OR k % 5 = 0
        UNION ALL
        SELECT k + 600000000, o_custkey, month, o_totalprice
        FROM base WHERE k % 2 = 0),
    kept AS (SELECT t.* FROM d1 t LEFT JOIN src s ON t.k = s.k
             WHERE s.k IS NULL),
    upd AS (SELECT s.* FROM src s JOIN d1 t ON s.k = t.k
            WHERE s.o_totalprice >= 0),
    ins AS (SELECT s.* FROM src s LEFT JOIN d1 t ON s.k = t.k
            WHERE t.k IS NULL)
    SELECT k AS o_orderkey, o_custkey, month, o_totalprice FROM kept
    UNION ALL SELECT k, o_custkey, month, o_totalprice FROM upd
    UNION ALL SELECT k, o_custkey, month, o_totalprice FROM ins
    """,
    doc="Merge-on-read MERGE INTO gate (r8): on a deletion-vector table "
    "the statement's matched delete/update rows leave by REF and the "
    "updated+inserted rows append, in ONE commit — no partition "
    "rewrite. Composes on top of a prior DV DELETE, so keys that DV "
    "removed earlier legitimately RE-INSERT through WHEN NOT MATCHED "
    "(the re-inserted-key story). DuckDB replays kept/updated/inserted "
    "relationally.",
)
def merge_dv_check(spark, sf_dir):
    """SQL MERGE with all three clause kinds (conditional DELETE,
    UPDATE SET * last-write-wins, INSERT *) against a month-partitioned
    deletion-vector table that already carries a DV delete: matched
    negative-priced source rows delete by ref, the rest update by
    ref+append, unmatched source rows insert — including keys the
    earlier DV delete removed, which MERGE sees as NOT MATCHED and
    re-inserts. Arithmetic is ``+ 7.0`` / literal ``-1.0`` so both
    engines produce bit-identical doubles."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_mdv_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 17 == 0)
            .select(
                F.col("o_orderkey"),
                "o_custkey",
                F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
                    "month"
                ),
                "o_totalprice",
            )
            .localCheckpoint(eager=True)
        )
        eng.create_table(
            "dvt",
            base,
            partition_by=["month"],
            keys=["o_orderkey"],
            versioned=True,
            deletion_vectors=True,
        )
        eng.sql("DELETE FROM dvt WHERE o_custkey % 10 = 6")
        k = F.col("o_orderkey")
        src = (
            base.filter((k % 3 == 0) | (k % 5 == 0))
            .select(
                "o_orderkey",
                "o_custkey",
                "month",
                F.when(k % 5 == 0, F.lit(-1.0))
                .otherwise(F.col("o_totalprice") + 7.0)
                .alias("o_totalprice"),
            )
            .unionByName(
                base.filter(k % 2 == 0).select(
                    (k + 600000000).alias("o_orderkey"),
                    "o_custkey",
                    "month",
                    "o_totalprice",
                )
            )
        )
        eng.create_table("msrc", src.localCheckpoint(eager=True), save=False)
        eng.sql(
            "MERGE INTO dvt USING msrc AS s ON o_orderkey = o_orderkey "
            "WHEN MATCHED AND s.o_totalprice < 0 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        out = eng.table("dvt").select(
            "o_orderkey", "o_custkey", "month", "o_totalprice"
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "copy_into_idempotence_check",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_orderkey % 13 = 0),
    b1 AS (SELECT o_orderkey + 300000000 AS o_orderkey, o_totalprice
           FROM base WHERE o_orderkey % 2 = 0),
    b2 AS (SELECT o_orderkey + 400000000 AS o_orderkey, o_totalprice
           FROM base WHERE o_orderkey % 2 = 1)
    SELECT o_orderkey, o_totalprice FROM base
    UNION ALL SELECT * FROM b1
    UNION ALL SELECT * FROM b2
    """,
    doc="COPY INTO exactly-once gate (r8): loaded source files are "
    "logged (path+size+mtime digest) in the snapshot commit meta, so a "
    "REPLAYED COPY INTO loads nothing and a directory that gained new "
    "files since the last load loads ONLY those. DuckDB replays the "
    "exactly-once application relationally: each file batch lands once.",
)
def copy_into_idempotence_check(spark, sf_dir):
    """The single most common ingest failure mode is a RETRIED loader
    script re-running ``COPY INTO t FROM dir``: without a loaded-file
    log it duplicates every row. Load batch 1, replay it (must no-op),
    append batch 2's files to the SAME directory, copy again (must load
    only batch 2), replay once more (no-op) — the final table is exactly
    base ∪ b1 ∪ b2."""
    import os
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_ci_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .filter(F.col("o_orderkey") % 13 == 0)
            .localCheckpoint(eager=True)
        )
        b1 = base.filter(F.col("o_orderkey") % 2 == 0).select(
            (F.col("o_orderkey") + 300000000).alias("o_orderkey"),
            "o_totalprice",
        )
        b2 = base.filter(F.col("o_orderkey") % 2 == 1).select(
            (F.col("o_orderkey") + 400000000).alias("o_orderkey"),
            "o_totalprice",
        )
        eng.create_table("ct", base, keys=["o_orderkey"], versioned=True)
        src = os.path.join(root, "landing")
        b1.write.parquet(src)
        eng.sql(f"COPY INTO ct FROM '{src}'")
        # loader crash-retry: the replay must load NOTHING
        eng.sql(f"COPY INTO ct FROM '{src}'")
        # the landing dir gains batch 2's files; only those load
        b2.write.mode("append").parquet(src)
        eng.sql(f"COPY INTO ct FROM '{src}'")
        eng.sql(f"COPY INTO ct FROM '{src}'")
        out = eng.table("ct").select("o_orderkey", "o_totalprice")
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "scan_file_skipping_check",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_quantity, l_extendedprice, l_returnflag
        FROM lineitem),
    t AS (
        SELECT * FROM base
        UNION ALL
        SELECT l_orderkey + 500000000, l_quantity, l_extendedprice,
               l_returnflag
        FROM base WHERE l_orderkey % 2 = 0),
    hit AS (SELECT * FROM t WHERE l_orderkey BETWEEN 100 AND 3000)
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
           CAST(0 AS BIGINT) AS violations
    FROM hit GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="File-level data skipping gate (r9): a range predicate on a "
    "NON-layout column scans only the files whose zone-map (parquet "
    "footer min/max, _zonemap.json per write dir) can satisfy it — "
    "violations pins BOTH that the pruned result equals the plain "
    "filter row-for-row AND that pruning actually dropped files. "
    "DuckDB replays the filtered aggregate relationally.",
)
def scan_file_skipping_check(spark, sf_dir):
    """Zone-map data skipping end-to-end (the Delta data-skipping
    analog, zonemaps.py): a versioned table is built from two
    range-clustered writes (16 files with tight l_orderkey ranges; the
    second batch's keys are shifted far outside the probe range), then
    ``scan_where`` answers a BETWEEN on the non-layout key.  The gate
    aggregates the PRUNED scan and folds two invariants into
    ``violations``: pruned ≡ unpruned filter (correctness never depends
    on stats) and files_kept < files_total (the skipping actually
    happened — on this layout the shifted batch's files must all
    prune)."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_zm_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
            )
            .localCheckpoint(eager=True)
        )
        eng.create_table(
            "lz", base.repartitionByRange(8, "l_orderkey"), versioned=True
        )
        eng.insert(
            "lz",
            base.filter(F.col("l_orderkey") % 2 == 0)
            .select(
                (F.col("l_orderkey") + 500000000).alias("l_orderkey"),
                "l_quantity",
                "l_extendedprice",
                "l_returnflag",
            )
            .repartitionByRange(8, "l_orderkey"),
        )
        pred = "l_orderkey BETWEEN 100 AND 3000"

        def agg(df):
            return df.groupBy("l_returnflag").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )

        pruned = agg(eng.scan_where("lz", pred))
        rep = dict(eng.last_scan_report)
        prows = sorted(tuple(r) for r in pruned.collect())
        frows = sorted(
            tuple(r) for r in agg(eng.table("lz").filter(pred)).collect()
        )
        viol = 0
        if prows != frows:
            viol += 1
        if not (0 < rep.get("files_kept", 0) < rep.get("files_total", 0)):
            viol += 1
        out = pruned.withColumn(
            "violations", F.lit(viol).cast("bigint")
        ).orderBy("l_returnflag")
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "sql_timetravel_skipping_check",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_quantity, l_extendedprice, l_returnflag
        FROM lineitem),
    t AS (
        SELECT * FROM base
        UNION ALL
        SELECT l_orderkey + 500000000, l_quantity, l_extendedprice,
               l_returnflag
        FROM base WHERE l_orderkey % 2 = 0),
    hit AS (SELECT * FROM t
            WHERE l_orderkey BETWEEN
                  (SELECT MAX(l_orderkey) // 20 FROM base) AND
                  (SELECT MAX(l_orderkey) // 10 FROM base))
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
           CAST(0 AS BIGINT) AS violations
    FROM hit GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Time-travel + data-skipping composition gate (VERDICT r9 item "
    "5): SELECT ... FROM t VERSION AS OF n WHERE ... routes through the "
    "zone-map fast path against the PINNED version's sidecars. The "
    "head is mutated AFTER the pin, so DuckDB's replay of the v2 state "
    "is right only if the pinned read excluded the mutation; violations "
    "additionally pins files-skipped at BOTH pinned versions and that "
    "the head diverged.",
)
def sql_timetravel_skipping_check(spark, sf_dir):
    """Zone-map file skipping under time-travel SQL: v1 = one
    range-clustered write, v2 = a shifted second write, v3 = an UPDATE
    inside the probe range.  Pinned SELECTs at v1 and v2 go through
    ``engine.sql`` (dml rewrites AS OF to a pinned view; the fast path
    prunes with that version's sidecars — engine.py
    _try_zonemap_select(asof=)).  The returned aggregate is the PINNED
    v2 state; the oracle recomputes it from the raw table, which the
    post-pin UPDATE would corrupt if the pin leaked."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_ttz_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
            )
            .localCheckpoint(eager=True)
        )
        eng.create_table(
            "ttz", base.repartitionByRange(8, "l_orderkey"), versioned=True
        )
        eng.insert(
            "ttz",
            base.filter(F.col("l_orderkey") % 2 == 0)
            .select(
                (F.col("l_orderkey") + 500000000).alias("l_orderkey"),
                "l_quantity",
                "l_extendedprice",
                "l_returnflag",
            )
            .repartitionByRange(8, "l_orderkey"),
        )
        # probe a ~1/20 key slice at ANY scale (a fixed literal range
        # covers every file at small SF and nothing prunes)
        mx = base.agg(F.max("l_orderkey")).head()[0]
        sel = "l_orderkey, l_quantity, l_extendedprice, l_returnflag"
        pred = f"l_orderkey BETWEEN {mx // 20} AND {mx // 10}"
        # v3: mutate INSIDE the probe range — pinned reads must not see it
        eng.sql(f"UPDATE ttz SET l_quantity = l_quantity + 100 WHERE {pred}")
        eng.last_scan_report = {}
        v1 = eng.sql(
            f"SELECT {sel} FROM ttz VERSION AS OF 1 WHERE {pred}"
        ).localCheckpoint(eager=True)
        rep1 = dict(eng.last_scan_report)
        eng.last_scan_report = {}
        v2 = eng.sql(
            f"SELECT {sel} FROM ttz VERSION AS OF 2 WHERE {pred}"
        ).localCheckpoint(eager=True)
        rep2 = dict(eng.last_scan_report)

        def agg(df):
            return df.groupBy("l_returnflag").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )

        viol = 0
        # both pinned reads actually skipped files
        for rep in (rep1, rep2):
            if not (0 < rep.get("files_kept", 0) < rep.get("files_total", 1)):
                viol += 1
        # both pinned reads see exactly the unshifted in-range rows (the
        # shifted batch sits outside the probe range BY DESIGN — that is
        # what makes its files skippable at v2)
        n_base = base.filter(pred).count()
        if v1.count() != n_base or v2.count() != n_base:
            viol += 1
        # the head UPDATE diverged from the pinned state
        head_qty = (
            eng.sql(f"SELECT {sel} FROM ttz WHERE {pred}")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
            .head()[0]
        )
        v2_qty = v2.agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        ).head()[0]
        if not (head_qty > v2_qty):
            viol += 1
        out = (
            agg(v2)
            .withColumn("violations", F.lit(viol).cast("bigint"))
            .orderBy("l_returnflag")
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "count_where_skipping_check",
    oracle="""
    WITH base AS (SELECT l_orderkey FROM lineitem),
    t AS (
        SELECT l_orderkey FROM base
        UNION ALL
        SELECT l_orderkey + 500000000 FROM base WHERE l_orderkey % 2 = 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS violations
    FROM t
    WHERE l_orderkey BETWEEN
          (SELECT MAX(l_orderkey) // 20 FROM base) AND
          (SELECT MAX(l_orderkey) // 2 FROM base)
    """,
    doc="Metadata COUNT gate (r10): SELECT COUNT(*) WHERE over a "
    "clustered versioned table answers FULL-MATCH files from parquet "
    "footer row counts (zonemaps.file_all_match — range fully inside "
    "the predicate, zero nulls) and scans only the boundary files. "
    "violations pins the count ≡ a plain filter count AND that "
    "full-match files actually fired AND that the boundary scan kept "
    "fewer files than survived pruning. DuckDB replays the count "
    "relationally.",
)
def count_where_skipping_check(spark, sf_dir):
    """The 100 TB dashboard shape: a selective range COUNT on a
    clustered key reads a handful of edge files — interior files
    contribute their footer row counts without a single task
    (Engine.count_where; SQL fast path inside engine.sql)."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_cw_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey")
            .localCheckpoint(eager=True)
        )
        eng.create_table(
            "cwz", base.repartitionByRange(8, "l_orderkey"), versioned=True
        )
        eng.insert(
            "cwz",
            base.filter(F.col("l_orderkey") % 2 == 0)
            .select((F.col("l_orderkey") + 500000000).alias("l_orderkey"))
            .repartitionByRange(8, "l_orderkey"),
        )
        mx = base.agg(F.max("l_orderkey")).head()[0]
        pred = f"l_orderkey BETWEEN {mx // 20} AND {mx // 2}"
        eng.last_scan_report = {}
        n = eng.sql(f"SELECT COUNT(*) FROM cwz WHERE {pred}").head()[0]
        rep = dict(eng.last_scan_report)
        viol = 0
        if n != eng.table("cwz").filter(pred).count():
            viol += 1  # the metadata count must be EXACT
        if rep.get("full_match_files", 0) < 1:
            viol += 1  # interior files must come from footers
        scanned = rep.get("files_kept", 0) - rep.get("full_match_files", 0)
        if not (0 <= scanned < rep.get("files_kept", 1)):
            viol += 1  # the boundary scan is a strict subset
        return spark.createDataFrame(
            [(int(n), viol)], "n_rows bigint, violations bigint"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "minmax_meta_check",
    oracle="""
    WITH base AS (SELECT l_orderkey, l_extendedprice FROM lineitem),
    t AS (
        SELECT * FROM base
        UNION ALL
        SELECT l_orderkey + 500000000, l_extendedprice
        FROM base WHERE l_orderkey % 2 = 0)
    SELECT CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_key,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(0 AS BIGINT) AS violations
    FROM t
    """,
    doc="Metadata MIN/MAX gate (r10): SELECT MIN(c), MAX(c) FROM t "
    "answers from the zone-map sidecars when every live file carries "
    "stats (no DVs, never strings — truncated bounds are outer). "
    "violations pins that the plan contains NO FileScan (pure "
    "LocalTableScan) and that the values equal a real aggregate. "
    "DuckDB replays the aggregate relationally.",
)
def minmax_meta_check(spark, sf_dir):
    """The second-most common dashboard query as a driver-side sidecar
    walk (Engine.minmax_meta; SQL fast path inside engine.sql)."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_mm_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .localCheckpoint(eager=True)
        )
        eng.create_table(
            "mmz", base.repartitionByRange(8, "l_orderkey"), versioned=True
        )
        eng.insert(
            "mmz",
            base.filter(F.col("l_orderkey") % 2 == 0)
            .select(
                (F.col("l_orderkey") + 500000000).alias("l_orderkey"),
                "l_extendedprice",
            )
            .repartitionByRange(8, "l_orderkey"),
        )
        out = eng.sql(
            "SELECT MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key "
            "FROM mmz"
        )
        out2 = eng.sql(
            "SELECT MIN(l_extendedprice) AS min_price, "
            "MAX(l_extendedprice) AS max_price FROM mmz"
        )
        viol = 0
        for df in (out, out2):
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "FileScan" in plan:
                viol += 1  # must be answered from metadata alone
        r1, r2 = out.head(), out2.head()
        real = eng.table("mmz").agg(
            F.min("l_orderkey"), F.max("l_orderkey"),
            F.min("l_extendedprice"), F.max("l_extendedprice"),
        ).head()
        if (r1.min_key, r1.max_key, r2.min_price, r2.max_price) != tuple(real):
            viol += 1
        return spark.createDataFrame(
            [
                (
                    int(r1.min_key),
                    int(r1.max_key),
                    float(r2.min_price),
                    float(r2.max_price),
                    viol,
                )
            ],
            "min_key bigint, max_key bigint, min_price double, "
            "max_price double, violations bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "partition_meta_rollup_check",
    oracle="""
    WITH live AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 3)
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(0 AS BIGINT) AS violations
    FROM live GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Partition metadata rollup gate (VERDICT r10 #6): SELECT "
    "<partition cols>, COUNT(*) GROUP BY them answers from "
    "Engine.partition_counts — per-partition footer row sums minus the "
    "per-file DV deletions (one tiny grouped job over the O(dv_rows) "
    "refs, URI-decoded: %20-escaped partition dirs were silently missed "
    "before r11). violations pins NO FileScan in the plan AND that SHOW "
    "PARTITIONS' rows column sums to the same live total. DuckDB "
    "replays the grouped count over the post-delete state.",
)
def partition_meta_rollup_check(spark, sf_dir):
    """Per-partition row counts as driver-side metadata: the ops
    question 'how are rows spread across partitions?' without a scan —
    at 100 TB a partition-grouped COUNT is a cluster-wide job; this is
    O(files) footer stats plus an O(dv_rows) sidecar rollup."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_pmr_")
    try:
        eng = Engine(spark, root)
        orders = load_table(spark, sf_dir, "orders").localCheckpoint(
            eager=True
        )
        eng.create_table(
            "po",
            orders,
            keys=["o_orderkey"],
            partition_by=["o_orderpriority"],
            versioned=True,
            deletion_vectors=True,
        )
        viol = 0
        # partition-filtered MIN/MAX (r11), BEFORE the DV delete (live
        # DVs disqualify the exact-extreme path — a deleted row could BE
        # the extreme, so it must fall back to the scan afterwards):
        # the sidecar walk restricted to the satisfying partitions'
        # files — no FileScan, exact
        fast3 = eng.sql(
            "SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM po "
            "WHERE o_orderpriority = '1-URGENT'"
        )
        if "FileScan" in fast3._jdf.queryExecution().executedPlan().toString():
            viol += 1
        real3 = (
            eng.table("po")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .agg(F.min("o_orderkey"), F.max("o_orderkey"))
            .head()
        )
        if tuple(fast3.head()) != tuple(real3):
            viol += 1
        eng.sql("DELETE FROM po WHERE o_orderkey % 10 = 3")
        fast = eng.sql(
            "SELECT o_orderpriority, COUNT(*) AS cnt FROM po "
            "GROUP BY o_orderpriority"
        )
        plan = fast._jdf.queryExecution().executedPlan().toString()
        if "FileScan" in plan:
            viol += 1  # must be answered from metadata alone
        sp = eng.sql("SHOW PARTITIONS po").collect()
        if sum(r.rows for r in sp) != eng.table("po").count():
            viol += 1
        # partition-PREDICATE counts (r11): zone maps cannot certify
        # partition columns (they never appear in footers) — these must
        # answer from the partition rollup, still no FileScan, and agree
        # with a real scan
        fast2 = eng.sql(
            "SELECT COUNT(*) AS cnt FROM po "
            "WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
        )
        if "FileScan" in fast2._jdf.queryExecution().executedPlan().toString():
            viol += 1
        real2 = (
            eng.table("po")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
            .count()
        )
        if fast2.head().cnt != real2:
            viol += 1
        out = fast.withColumn(
            "violations", F.lit(viol).cast("bigint")
        ).orderBy("o_orderpriority")
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "expectations_lifecycle_check",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_returnflag, l_quantity, l_discount
        FROM lineitem),
    batch AS (
        SELECT l_orderkey + 500000000 AS l_orderkey, l_returnflag,
               l_quantity, l_discount
        FROM base WHERE l_orderkey % 3 = 0),
    landed AS (
        SELECT * FROM base WHERE l_quantity <= 45
        UNION ALL
        SELECT * FROM batch WHERE l_quantity <= 45)
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(0 AS BIGINT) AS violations
    FROM landed GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Quality-expectations gate (r10, DLT expect_or_drop analog): a "
    "versioned table created with a 'drop' rule (l_quantity <= 45) and "
    "a 'track' rule (l_discount <= 0.05) quarantines violating rows on "
    "CREATE and on INSERT — DuckDB replays the landed state (wrong if "
    "a dirty row slipped in OR a clean row was over-dropped); "
    "violations pins the per-write counts against independently "
    "recomputed filter counts.",
)
def expectations_lifecycle_check(spark, sf_dir):
    """Quarantine-on-ingest (engine._enforce expectations tier): drop
    rules filter violating rows out of every write path, track rules
    count them — one aggregation job per write, no extra passes."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_exp_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey", "l_returnflag", "l_quantity", "l_discount"
            )
            .localCheckpoint(eager=True)
        )
        rules = {
            "qty_cap": {"expr": "l_quantity <= 45", "action": "drop"},
            "disc_low": {"expr": "l_discount <= 0.05", "action": "track"},
        }
        eng.create_table(
            "exz", base, keys=["l_orderkey"], versioned=True,
            expectations=rules,
        )
        rep0 = dict(eng.last_expectation_report)
        batch = base.filter(F.col("l_orderkey") % 3 == 0).select(
            (F.col("l_orderkey") + 500000000).alias("l_orderkey"),
            "l_returnflag",
            "l_quantity",
            "l_discount",
        ).localCheckpoint(eager=True)
        eng.insert("exz", batch)
        rep1 = dict(eng.last_expectation_report)
        viol = 0
        if rep0.get("violations", {}).get("qty_cap") != base.filter(
            "l_quantity > 45"
        ).count():
            viol += 1
        if rep1.get("violations", {}).get("qty_cap") != batch.filter(
            "l_quantity > 45"
        ).count():
            viol += 1
        if rep1.get("violations", {}).get("disc_low") != batch.filter(
            "l_discount > 0.05"
        ).count():
            viol += 1
        if rep1.get("dropped") != rep1.get("violations", {}).get("qty_cap"):
            viol += 1
        out = (
            eng.table("exz")
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .withColumn("violations", F.lit(viol).cast("bigint"))
            .orderBy("l_returnflag")
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "merge_update_set_check",
    oracle="""
    WITH res AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               (o_totalprice + 50) * 2 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0 AND o_custkey % 10 <> 3
        UNION ALL
        SELECT o_orderkey + 70000000, o_orderstatus, o_totalprice + 50
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM res GROUP BY o_orderstatus
    """,
    doc="Explicit MERGE assignments + BY SOURCE deletes "
    "(operators/merge.py:merge_into set_exprs / "
    "when_not_matched_by_source_delete — Delta's UPDATE SET c = e and "
    "WHEN NOT MATCHED BY SOURCE THEN DELETE): matched rows take exactly "
    "the assignments (unassigned columns keep old values), target rows "
    "the source lacks delete under a target-side condition, source-only "
    "keys insert. The oracle states the closed form of all four row "
    "classes.",
)
def merge_update_set_check(spark, sf_dir):
    """The two post-r11 MERGE clauses as one pure transform: same single
    full-outer-join shuffle as upsert — the BY SOURCE delete is a filter
    on the join's target-only rows, never a second scan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .unionByName(
            orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 70_000_000
            )
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 50.0)
    )
    merged = M.merge_into(
        orders,
        src,
        keys=["o_orderkey"],
        set_exprs={
            "o_totalprice": F.col("n.o_totalprice") * 2,
            "o_orderstatus": F.lit("U"),
        },
        when_not_matched_by_source_delete=(F.col("o.o_custkey") % 10 == 3),
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "merge_conditional_update_check",
    oracle="""
    WITH res AS (
        SELECT o_orderkey, o_totalprice + 10 AS o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0 AND o_totalprice < 150000
        UNION ALL
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 0 OR o_totalprice >= 150000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM res
    """,
    doc="Condition-gated MERGE update (operators/merge.py:merge_into "
    "when_matched_update_condition — Delta's WHEN MATCHED AND c THEN "
    "UPDATE): matched rows failing the target-side condition keep old "
    "values; nothing deletes or inserts. The oracle states the closed "
    "form over both row classes.",
)
def merge_conditional_update_check(spark, sf_dir):
    """The update-clause condition as a pure transform: same single
    full-outer join; the gate is one boolean column over the joined row,
    never a second pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    src = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 10.0
    )
    merged = M.merge_into(
        orders,
        src,
        keys=["o_orderkey"],
        when_matched_update_condition=(F.col("o.o_totalprice") < 150000),
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "merge_multi_clause_check",
    oracle="""
    WITH res AS (
        SELECT o_orderkey, 'M' AS o_orderstatus,
               o_totalprice + 1 AS o_totalprice
        FROM orders
        WHERE o_orderkey % 5 = 0
          AND o_totalprice >= 50000 AND o_totalprice < 150000
        UNION ALL
        SELECT o_orderkey, 'S' AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 5 = 0 AND o_totalprice >= 150000
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
        UNION ALL
        SELECT o_orderkey + 90000000, 'S' AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 53 = 0
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM res GROUP BY o_orderstatus
    """,
    doc="Ordered multi-clause MERGE (operators/merge.py:merge_into "
    "matched_clauses — Delta's 'WHEN MATCHED AND c1 THEN DELETE WHEN "
    "MATCHED AND c2 THEN UPDATE SET ... WHEN MATCHED THEN UPDATE SET *' "
    "first-match-wins stack): a gated delete, a gated explicit-SET "
    "update, and an unconditioned SET * catch-all evaluate in order on "
    "each matched row; unmatched targets keep, source-only keys insert. "
    "The oracle states the closed form of every row class.",
)
def merge_multi_clause_check(spark, sf_dir):
    """N ordered matched clauses stay ONE full-outer join — each clause
    adds a boolean gate column (first-match-wins when-chain), never a
    second shuffle or target pass, so the clause count is free at
    100 TB."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .unionByName(
            orders.filter(F.col("o_orderkey") % 53 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 90_000_000
            )
        )
        .withColumn("o_orderstatus", F.lit("S"))
    )
    merged = M.merge_into(
        orders,
        src,
        keys=["o_orderkey"],
        matched_clauses=[
            {
                "action": "delete",
                "condition": F.col("n.o_totalprice") < 50000,
            },
            {
                "action": "update",
                "condition": F.col("n.o_totalprice") < 150000,
                "set": {
                    "o_totalprice": F.col("n.o_totalprice") + 1,
                    "o_orderstatus": F.lit("M"),
                },
            },
            {"action": "update", "condition": None, "set": None},
        ],
        null_clobbers=True,
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "merge_insert_values_check",
    oracle="""
    WITH res AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        UNION ALL
        SELECT o_orderkey + 90000000, NULL AS o_orderstatus,
               o_totalprice * 2 AS o_totalprice
        FROM orders
        WHERE o_orderkey % 31 = 0 AND o_totalprice < 100000
        UNION ALL
        SELECT o_orderkey + 90000000, 'I' AS o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 31 = 0
          AND o_totalprice >= 100000 AND o_totalprice < 200000
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM res GROUP BY o_orderstatus
    """,
    doc="Ordered conditioned NOT MATCHED inserts (operators/merge.py:"
    "merge_into not_matched_clauses — Delta's 'WHEN NOT MATCHED AND c "
    "THEN INSERT (cols) VALUES (exprs)'): the first firing clause "
    "inserts its VALUES (unassigned columns land NULL), the second "
    "takes INSERT *, and source rows firing no clause are dropped. "
    "The oracle states the closed form of all three insert classes "
    "over the untouched target.",
)
def merge_insert_values_check(spark, sf_dir):
    """Conditioned/explicit inserts stay inside the single full-outer
    join: each clause is a gate column plus a when-chain value — no
    second scan, no union of insert batches."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src = (
        orders.filter(F.col("o_orderkey") % 31 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 90_000_000)
        .withColumn("o_orderstatus", F.lit("I"))
    )
    merged = M.merge_into(
        orders,
        src,
        keys=["o_orderkey"],
        matched_clauses=[],
        not_matched_clauses=[
            {
                "condition": F.col("n.o_totalprice") < 100_000,
                "values": {
                    "o_orderkey": F.col("n.o_orderkey"),
                    "o_totalprice": F.col("n.o_totalprice") * 2,
                },
            },
            {
                "condition": F.col("n.o_totalprice") < 200_000,
                "values": None,  # INSERT *
            },
        ],
        null_clobbers=True,
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "merge_by_source_update_check",
    oracle="""
    WITH res AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 5 AS o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, 'Z' AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 0 AND o_totalprice <= 200000
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM res GROUP BY o_orderstatus
    """,
    doc="Ordered WHEN NOT MATCHED BY SOURCE clauses (operators/merge.py:"
    "merge_into by_source_clauses — Delta's BY SOURCE DELETE/UPDATE "
    "stack): target rows the source lacks hit the first firing clause — "
    "an expensive-order DELETE, else an UPDATE stamping them stale; "
    "matched rows update from the source. The oracle states the closed "
    "form of every row class.",
)
def merge_by_source_update_check(spark, sf_dir):
    """BY SOURCE UPDATE rides the same full-outer join as the rest of
    the merge (a gate over the target-only rows) — no extra target
    pass, no rewrite beyond the merge's own."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 5.0
    )
    merged = M.merge_into(
        orders,
        src,
        keys=["o_orderkey"],
        matched_clauses=[{"action": "update", "condition": None, "set": None}],
        not_matched_clauses=[],
        by_source_clauses=[
            {
                "action": "delete",
                "condition": F.col("o.o_totalprice") > 200_000,
                "set": None,
            },
            {
                "action": "update",
                "condition": None,
                "set": {"o_orderstatus": F.lit("Z")},
            },
        ],
        null_clobbers=True,
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "merge_schema_evolution_check",
    oracle="""
    WITH res AS (
        SELECT o_orderkey, o_totalprice + 1 AS o_totalprice,
               'from_src' AS note
        FROM orders WHERE o_orderkey % 11 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, NULL AS note
        FROM orders WHERE o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_orderkey + 80000000, o_totalprice + 1, 'from_src'
        FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(note) AS BIGINT) AS with_note,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM res
    """,
    doc="MERGE WITH SCHEMA EVOLUTION (engine.merge evolve_schema=True — "
    "Delta autoMerge): a source-only column widens the versioned target "
    "as NULLs before the merge, so UPDATE SET * and INSERT * carry it; "
    "untouched rows read back NULL. The oracle states the closed form "
    "of all three row classes over the evolved schema.",
)
def merge_schema_evolution_check(spark, sf_dir):
    """Schema evolution composes with the single-join merge: the widen
    is a metadata-side withColumn over the target scan, then the same
    full-outer join — no extra pass, one rewrite commit."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_msev_")
    try:
        eng = Engine(spark, root)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        eng.create_table("msev", orders, keys=["o_orderkey"], versioned=True)
        src = (
            orders.filter(F.col("o_orderkey") % 11 == 0)
            .unionByName(
                orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
                    "o_orderkey", F.col("o_orderkey") + 80_000_000
                )
            )
            .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
            .withColumn("note", F.lit("from_src"))
        )
        eng.merge(
            "msev",
            src,
            ["o_orderkey"],
            null_clobbers=True,
            evolve_schema=True,
        )
        out = eng.table("msev").agg(
            F.count(F.lit(1)).alias("n"),
            F.count("note").alias("with_note"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "generated_columns_check",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY month
    """,
    doc="GENERATED columns (Delta GENERATED ALWAYS AS analog, "
    "engine.py TableSpec.generated): a month column derived from "
    "o_orderdate defines the PARTITION layout; the seed write computes "
    "it, a later insert omits it and the write path computes it from "
    "the formula (one map-side expression inside _with_layout). The "
    "oracle recomputes the formula over the raw table.",
)
def generated_columns_check(spark, sf_dir):
    """Generated columns cost one withColumn per write — no shuffle, no
    extra pass; the derived partition column keeps partition pruning
    available without trusting any writer to compute it."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_genc_")
    try:
        eng = Engine(spark, root)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_totalprice"
        )
        eng.create_table(
            "genc",
            orders.filter(F.col("o_orderkey") % 2 == 0),
            keys=["o_orderkey"],
            partition_by=["month"],
            versioned=True,
            generated={"month": "date_format(o_orderdate, 'yyyy-MM')"},
        )
        eng.insert("genc", orders.filter(F.col("o_orderkey") % 2 == 1))
        out = eng.table("genc").groupBy("month").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "expectations_quarantine_check",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_returnflag, l_quantity
        FROM lineitem),
    batch AS (
        SELECT l_orderkey + 500000000 AS l_orderkey, l_returnflag,
               l_quantity
        FROM base WHERE l_orderkey % 3 = 0),
    quarantined AS (
        SELECT * FROM base WHERE l_quantity > 45
        UNION ALL
        SELECT * FROM batch WHERE l_quantity > 45)
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_quar,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
           CAST(0 AS BIGINT) AS violations
    FROM quarantined GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Quarantine-expectation gate (r12, the DLT quarantine pattern): "
    "a 'quarantine' rule removes violating rows from every write — like "
    "'drop' — AND lands them in {table}_quarantine tagged with the "
    "violated rule names. DuckDB replays the quarantine table's "
    "expected contents across CREATE + INSERT (wrong if a dirty row "
    "slipped into the target, a clean row was over-quarantined, or the "
    "side table missed/duplicated a row); violations pins the target's "
    "landed count and the rule tags.",
)
def expectations_quarantine_check(spark, sf_dir):
    """Bad records stay inspectable instead of vanishing: the
    quarantined copy appends in the SAME write that filtered it (one
    extra append of O(violations) rows, no second scan of the batch)."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_quar_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_returnflag", "l_quantity")
            .localCheckpoint(eager=True)
        )
        eng.create_table(
            "qz", base, keys=["l_orderkey"], versioned=True,
            expectations={
                "qty_cap": {"expr": "l_quantity <= 45", "action": "quarantine"}
            },
        )
        batch = base.filter(F.col("l_orderkey") % 3 == 0).select(
            (F.col("l_orderkey") + 500000000).alias("l_orderkey"),
            "l_returnflag",
            "l_quantity",
        ).localCheckpoint(eager=True)
        eng.insert("qz", batch)
        viol = 0
        # target landed exactly the clean rows
        n_clean = base.filter("l_quantity <= 45").count() + batch.filter(
            "l_quantity <= 45"
        ).count()
        if eng.table("qz").count() != n_clean:
            viol += 1
        # every quarantined row carries the violated rule's tag
        quar = eng.table("qz_quarantine")
        if quar.filter(
            ~F.array_contains(F.col("__rules"), "qty_cap")
        ).count():
            viol += 1
        out = (
            quar.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_quar"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .withColumn("violations", F.lit(viol).cast("bigint"))
            .orderBy("l_returnflag")
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "create_or_replace_check",
    oracle="""
    SELECT o_orderkey, o_totalprice * 2 AS price2,
           CAST(0 AS BIGINT) AS violations
    FROM orders WHERE o_orderkey % 13 = 0
    ORDER BY o_orderkey
    """,
    doc="CREATE OR REPLACE TABLE gate (r12): a same-layout VERSIONED "
    "replace lands as ONE rewrite snapshot — the pre-replace contents "
    "stay time-travelable — and a self-referencing REPLACE (SELECT FROM "
    "the table being replaced) reads the old state. DuckDB states the "
    "final contents; violations pins the time-travel read of the "
    "pre-replace state and the single-snapshot history arithmetic.",
)
def create_or_replace_check(spark, sf_dir):
    """Delta's CREATE OR REPLACE semantics on the snapshot layer: the
    replace is a rewrite commit like any other, so history, RESTORE,
    and CDC all compose with it."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_corr_")
    try:
        eng = Engine(spark, root)
        base = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .filter(F.col("o_orderkey") % 13 == 0)
            .localCheckpoint(eager=True)
        )
        eng.create_table("corr", base, versioned=True)
        base.createOrReplaceTempView("corr_base")
        v_before = eng._snapstore("corr").latest_version()
        # self-referencing replace: reads the OLD state, lands doubled
        eng.sql(
            "CREATE OR REPLACE VERSIONED TABLE corr AS "
            "SELECT o_orderkey, o_totalprice * 2 AS price2 FROM corr"
        )
        viol = 0
        # one rewrite snapshot, pre-replace state time-travelable
        if eng._snapstore("corr").latest_version() != v_before + 1:
            viol += 1
        old = eng.table("corr", version=v_before)
        if old.count() != base.count() or "o_totalprice" not in old.columns:
            viol += 1
        out = (
            eng.table("corr")
            .withColumn("violations", F.lit(viol).cast("bigint"))
            .orderBy("o_orderkey")
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        spark.catalog.dropTempView("corr_base")
        shutil.rmtree(root, ignore_errors=True)


@register(
    "merge_null_keys_check",
    oracle="""
    WITH tgt AS (
        SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL
                    ELSE o_orderkey END AS k1,
               o_orderkey % 3 AS k2,
               o_orderkey, o_orderstatus, o_totalprice, 1 AS t_mark
        FROM orders),
    src AS (
        SELECT o_orderkey AS k1, o_orderkey % 3 AS k2,
               o_totalprice + 100 AS o_totalprice, 1 AS s_mark
        FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        UNION ALL
        SELECT NULL, 0, 123.45, 1
        UNION ALL
        SELECT o_orderkey + 50000000, o_orderkey % 3, 77.0, 1
        FROM orders WHERE o_orderkey % 97 = 0),
    res AS (
        SELECT CASE WHEN t.t_mark IS NOT NULL THEN t.k1 ELSE s.k1 END AS k1,
               CASE WHEN t.t_mark IS NOT NULL AND s.s_mark IS NOT NULL
                    THEN 'M'
                    WHEN t.t_mark IS NOT NULL THEN t.o_orderstatus
                    ELSE NULL END AS o_orderstatus,
               CASE WHEN t.t_mark IS NOT NULL AND s.s_mark IS NOT NULL
                    THEN s.o_totalprice
                    WHEN t.t_mark IS NOT NULL THEN t.o_totalprice
                    ELSE s.o_totalprice END AS o_totalprice,
               CASE WHEN t.t_mark IS NOT NULL THEN t.o_orderkey
                    ELSE NULL END AS o_orderkey
        FROM tgt t FULL OUTER JOIN src s
          ON t.k1 IS NOT DISTINCT FROM s.k1
         AND t.k2 IS NOT DISTINCT FROM s.k2)
    SELECT CAST(k1 IS NULL AS INT) AS null_key,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM res GROUP BY 1, 2
    """,
    doc="NULL merge-key semantics gate (VERDICT r13 wrong-answer #1/#2): "
    "merge keys may legitimately be NULL; the join is NULL-SAFE "
    "(eqNullSafe — NULL matches NULL, the documented divergence from "
    "ANSI MERGE), and row presence comes from literal markers, never "
    "key null-ness. The target NULLs k1 on every 13th key; the source "
    "matches one NULL class null-safely ((NULL,0)), leaves the others "
    "((NULL,1),(NULL,2)) untouched — the r13 bug destroyed exactly "
    "those — updates matched non-null keys, and inserts fresh ones. "
    "The oracle replays the merge as a full-outer join with IS NOT "
    "DISTINCT FROM and explicit presence markers.",
)
def merge_null_keys_check(spark, sf_dir):
    """One full-outer join on (k1, k2) — NULL-keyed rows shuffle like
    any other key value (eqNullSafe hashes NULL deterministically), so
    the plan shape is identical to every other merge: no skew beyond
    whatever the NULL population itself is."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tgt = orders.select(
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey"))
        .alias("k1"),
        (F.col("o_orderkey") % 3).alias("k2"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
    )
    src = (
        orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0)
        )
        .select(
            F.col("o_orderkey").alias("k1"),
            (F.col("o_orderkey") % 3).alias("k2"),
            (F.col("o_totalprice") + 100).alias("o_totalprice"),
        )
        .unionByName(
            spark.range(1).select(
                F.lit(None).cast("bigint").alias("k1"),
                F.lit(0).cast("bigint").alias("k2"),
                F.lit(123.45).alias("o_totalprice"),
            )
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 50_000_000).alias("k1"),
                (F.col("o_orderkey") % 3).alias("k2"),
                F.lit(77.0).alias("o_totalprice"),
            )
        )
    )
    merged = M.merge_into(
        tgt,
        src,
        keys=["k1", "k2"],
        set_exprs={
            "o_totalprice": F.col("n.o_totalprice"),
            "o_orderstatus": F.lit("M"),
        },
    )
    return merged.groupBy(
        F.col("k1").isNull().cast("int").alias("null_key"),
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@register(
    "merge_generated_partition_check",
    oracle="""
    WITH res AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0
                    THEN o_orderdate + INTERVAL 40 DAY
                    ELSE o_orderdate END AS o_orderdate,
               o_totalprice
        FROM orders)
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM res GROUP BY 1
    """,
    doc="Partition-migration soundness gate (ADVICE r14 high): a MERGE "
    "whose SET touches the SOURCE column of a generated PARTITION "
    "column moves rows across partitions at the post-merge recompute; "
    "touched-partition pruning must disable (full rewrite), or the "
    "'replace' commit remaps the migrated-into partition and silently "
    "drops its pre-existing rows. The oracle replays the closed form: "
    "every 11th key shifts 40 days; every other row — including rows "
    "already living in the migrated-into months — survives untouched.",
)
def merge_generated_partition_check(spark, sf_dir):
    """Engine round-trip: versioned table partitioned by a GENERATED
    month column, MERGE SETs the formula's source column. The merge
    takes the full-rewrite path by design here — that is the point of
    the gate (a pruned replace would be silently wrong)."""
    import shutil
    import tempfile

    from polars_lake_spark import Engine

    root = tempfile.mkdtemp(prefix="plsq_genp_")
    try:
        eng = Engine(spark, root)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_totalprice"
        )
        eng.create_table(
            "genp",
            orders,
            keys=["o_orderkey"],
            partition_by=["month"],
            versioned=True,
            generated={"month": "date_format(o_orderdate, 'yyyy-MM')"},
        )
        src = orders.filter(F.col("o_orderkey") % 11 == 0).select(
            "o_orderkey", "o_orderdate"
        )
        eng.merge(
            "genp",
            src,
            keys=["o_orderkey"],
            set_exprs={"o_orderdate": F.date_add(F.col("n.o_orderdate"), 40)},
            when_not_matched_insert=False,
        )
        out = eng.table("genp").groupBy("month").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
