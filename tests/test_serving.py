"""Query-serving semantics (SURVEY §2.d): batched multi-query execution,
concurrent point queries from a thread pool, error surfacing, DDL surface.

The reference swallows failed queries silently
(``/root/reference/src/server.rs:299``) — we assert errors RAISE instead.
"""

from concurrent.futures import ThreadPoolExecutor

import pytest

from polars_lake_spark import Engine
from polars_lake_spark.sources import load_table


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    e = Engine(spark, None)
    e.create_table(
        "li",
        load_table(spark, sf_dir, "lineitem"),
        keys=["l_orderkey", "l_linenumber"],
        save=False,
    )
    e.create_table("sup", load_table(spark, sf_dir, "supplier"), save=False)
    return e


def test_batched_sqls_share_session(engine):
    """execute_sqls analog (/root/reference/src/database.rs:58-63)."""
    dfs = engine.sqls(
        [
            "SELECT COUNT(*) AS n FROM li",
            "SELECT COUNT(DISTINCT l_suppkey) AS n FROM li",
            "SELECT s_suppkey FROM sup ORDER BY s_suppkey LIMIT 3",
        ]
    )
    assert dfs[0].collect()[0].n > 0
    assert dfs[1].collect()[0].n > 0
    assert len(dfs[2].collect()) == 3


def test_concurrent_point_queries(engine):
    """20-thread client pool (/root/reference/call.py:73-79)."""
    keys = [r.l_suppkey for r in engine.sql("SELECT DISTINCT l_suppkey FROM li").collect()]

    def point(k):
        return engine.sql(f"SELECT COUNT(*) AS n FROM li WHERE l_suppkey = {k}").collect()[0].n

    with ThreadPoolExecutor(max_workers=20) as pool:
        counts = list(pool.map(point, keys))
    assert sum(counts) == engine.sql("SELECT COUNT(*) AS n FROM li").collect()[0].n


def test_errors_are_raised_not_swallowed(engine):
    with pytest.raises(Exception):
        engine.sql("SELECT nonexistent_column FROM li").collect()
    with pytest.raises(Exception):
        engine.sql("SELECT * FROM never_registered_table").collect()


def test_ddl_surface(engine, spark):
    assert "li" in engine.tables() and "sup" in engine.tables()
    engine.create_table_as(
        "big_items", "SELECT * FROM li WHERE l_quantity > 45", save=False
    )
    assert engine.table("big_items").count() == engine.sql(
        "SELECT COUNT(*) AS n FROM li WHERE l_quantity > 45"
    ).collect()[0].n
    engine.drop_table("big_items")
    assert "big_items" not in engine.tables()
    with pytest.raises(Exception):
        spark.sql("SELECT * FROM big_items").collect()
