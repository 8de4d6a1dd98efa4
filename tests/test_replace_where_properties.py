"""Property-based check of partition-scoped DML (``replace_where``)
against the naive filter-and-overwrite semantics it replaces.

For ANY generated predicate over a partitioned table — including NULL
partition values and predicates that empty partitions entirely (which
the scoped path must tombstone, not rewrite empty) — a SQL DELETE via
the replace_where path must leave exactly the rows a full
filter-and-overwrite would, on plain AND versioned tables."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_lake_spark import Engine

# rows: (id, p, v) — p is the partition value, None included (hive
# __HIVE_DEFAULT_PARTITION__); small domains force partition overlap,
# emptied partitions, and no-match predicates to all show up
row_st = st.tuples(
    st.integers(min_value=0, max_value=40),
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    st.integers(min_value=-5, max_value=5),
)

# predicate grammar: each case can match none/some/all of a partition,
# cross partitions, or key on the partition column itself
pred_st = st.one_of(
    st.integers(min_value=0, max_value=3).map(lambda k: f"p = {k}"),
    st.just("p IS NULL"),
    st.tuples(
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=3),
    ).map(lambda t: f"id % {t[0]} = {t[1]}"),
    st.integers(min_value=-5, max_value=5).map(lambda x: f"v > {x}"),
    st.just("id >= 0"),  # deletes EVERYTHING (all partitions tombstoned)
    st.just("v > 100"),  # deletes nothing
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=-5, max_value=5),
    ).map(lambda t: f"p = {t[0]} AND v <= {t[1]}"),
)


def _model_delete(rows, pred_sql):
    """Python replay of the predicate over the row tuples."""
    def hit(r):
        i, p, v = r
        if pred_sql.startswith("p = ") and " AND " not in pred_sql:
            return p == int(pred_sql.split("= ")[1])
        if pred_sql == "p IS NULL":
            return p is None
        if pred_sql.startswith("id % "):
            m, rst = pred_sql[5:].split(" = ")
            return i % int(m) == int(rst)
        if pred_sql.startswith("v > "):
            return v > int(pred_sql.split("> ")[1])
        if pred_sql == "id >= 0":
            return True
        if " AND " in pred_sql:
            pp, vv = pred_sql.split(" AND ")
            return p == int(pp.split("= ")[1]) and v <= int(vv.split("<= ")[1])
        raise AssertionError(pred_sql)

    return {r for r in rows if not hit(r)}


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@pytest.mark.parametrize("versioned", [False, True])
def test_all_null_partition_delete(spark, tmp_path, versioned):
    """Deterministic pin of the hypothesis find: a table whose ONLY
    partition value is NULL reads back with the partition column
    inferred as VOID (every dir is __HIVE_DEFAULT_PARTITION__), and the
    scoped-delete rewrite then failed with
    INVALID_PARTITION_COLUMN_DATA_TYPE. Reads now pin partition column
    types from the recorded schema."""
    eng = Engine(spark, str(tmp_path))
    df = spark.createDataFrame([(0, None, 0), (1, None, 0)], "id int, p int, v int")
    eng.create_table("t", df, partition_by=["p"], keys=["id"], versioned=versioned)
    assert dict(eng.table("t").dtypes)["p"] == "int"  # not void
    st = eng.sql("DELETE FROM t WHERE id % 2 = 0").head()
    assert st["n_affected"] == 1
    assert {(r.id, r.p) for r in eng.table("t").collect()} == {(1, None)}
    eng.insert("t", spark.createDataFrame([(9, 1, 1)], "id int, p int, v int"))
    assert eng.table("t").count() == 2


@given(
    rows=st.lists(row_st, min_size=0, max_size=14, unique_by=lambda r: r[0]),
    pred=pred_st,
    versioned=st.booleans(),
)
@settings(
    max_examples=14,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scoped_delete_equals_filter_overwrite(sess, tmp_path_factory, rows, pred, versioned):
    root = str(tmp_path_factory.mktemp("rw"))
    eng = Engine(sess, root)
    schema = "id int, p int, v int"
    df = (
        sess.createDataFrame(rows, schema)
        if rows
        else sess.createDataFrame([], schema)
    )
    eng.create_table(
        "t", df, partition_by=["p"], keys=["id"], versioned=versioned
    )
    st_row = eng.sql(f"DELETE FROM t WHERE {pred}").head()
    expect = _model_delete(rows, pred)
    assert st_row["n_affected"] == len(rows) - len(expect)
    got = {(r.id, r.p, r.v) for r in eng.table("t").collect()}
    assert got == expect
    # the table stays writable after ANY delete, including a total one
    eng.insert("t", sess.createDataFrame([(99, 1, 1)], schema))
    assert (99, 1, 1) in {(r.id, r.p, r.v) for r in eng.table("t").collect()}
