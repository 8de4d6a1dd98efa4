"""Local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB on row count + columns + order-insensitive values.
"""

import pytest

from polars_lake_spark.queries import all_queries
from polars_lake_spark.testing import compare, duckdb_con

QUERIES = all_queries()
ORACLED = [name for name, q in QUERIES.items() if q.oracle]
ROWS_ONLY = [name for name, q in QUERIES.items() if not q.oracle]


def test_check_priority_names_valid():
    """The verification-rotation list must reference only registered
    queries and cover every registered query exactly once or not at all
    (replaces the former runtime assert in all_queries())."""
    from polars_lake_spark.queries import CHECK_PRIORITY, REGISTRY

    missing = [n for n in CHECK_PRIORITY if n not in REGISTRY]
    assert not missing, f"CHECK_PRIORITY names not in REGISTRY: {missing}"
    assert len(set(CHECK_PRIORITY)) == len(CHECK_PRIORITY), "duplicates"
    # all_queries() must emit every registered query exactly once
    assert set(QUERIES) == set(REGISTRY)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, sf_dir, con, name):
    q = QUERIES[name]
    report = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert report["ok"], f"{name}: {report}"


def test_oracle_no_hugeint_projection(con):
    """Registry-wide lint: no oracle may project a HUGEINT (int128)
    column. DuckDB widens a raw SUM/AVG over BIGINT to HUGEINT, which the
    driver's harness canonicalizes differently from Spark's BIGINT — the
    single root cause of the only two r5 gate fails (split_train_val_test,
    shard_manifest). Binding the relation (no execution) exposes the
    output types; any HUGEINT projection needs an explicit
    CAST(... AS BIGINT) in the oracle SQL."""
    bad = {}
    for name in ORACLED:
        rel = con.sql(QUERIES[name].oracle)
        hits = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"oracles projecting HUGEINT (cast to BIGINT): {bad}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0  # runs, stable schema
    assert len(df.columns) > 0


def test_compare_builds_oracle_rows_positionally(spark):
    """Duplicate column names in an oracle SELECT must keep BOTH values
    (ADVICE r6: to_pylist() dicts collapsed them to the last, silently
    comparing the wrong column). Spark side carries the same duplicate
    names via two same-aliased columns."""
    import duckdb

    con2 = duckdb.connect()
    sdf = spark.createDataFrame([(1, 2)], "a int, b int").selectExpr(
        "a AS x", "b AS x"
    )
    ok = compare(sdf, con2, "SELECT 1 AS x, 2 AS x")
    assert ok["ok"], ok
    # and a genuine value flip in the duplicated column is CAUGHT
    bad = compare(sdf, con2, "SELECT 2 AS x, 2 AS x")
    assert not bad["ok"]
