"""Property-based check of zone-map file skipping: for ANY generated
data layout and prunable/unprunable predicate, ``scan_where`` must
return exactly ``table().filter(pred)`` — including NULL values, NaN
floats, duplicate boundary values, and predicates that prune everything
or nothing. One shared table amortizes the Spark round-trips; each
example re-uses it with a fresh predicate (the table is immutable)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_lake_spark import Engine

# Predicate grammar over (id bigint, v double, s string): every shape
# the parser claims to prune, plus unparseable shapes that must fall
# back, over a tiny value domain so boundary hits are common.
_ids = st.integers(min_value=-2, max_value=12)
_vs = st.sampled_from(["0.0", "1.5", "3.0", "100.0"])
_ss = st.sampled_from(["'a'", "'c'", "'zz'", "'b AND c'"])
pred_st = st.one_of(
    _ids.map(lambda k: f"id = {k}"),
    _ids.map(lambda k: f"id < {k}"),
    _ids.map(lambda k: f"id >= {k}"),
    _ids.map(lambda k: f"id != {k}"),
    st.tuples(_ids, _ids).map(lambda t: f"id BETWEEN {t[0]} AND {t[1]}"),
    st.lists(_ids, min_size=1, max_size=3).map(
        lambda ks: f"id IN ({', '.join(map(str, ks))})"
    ),
    _vs.map(lambda x: f"v > {x}"),
    _vs.map(lambda x: f"v <= {x}"),
    _vs.map(lambda x: f"v != {x}"),
    _ss.map(lambda x: f"s = {x}"),
    _ss.map(lambda x: f"s < {x}"),
    st.just("s IS NULL"),
    st.just("v IS NOT NULL"),
    st.tuples(_ids, _vs).map(lambda t: f"id >= {t[0]} AND v < {t[1]}"),
    st.tuples(_ids, _ids).map(lambda t: f"id = {t[0]} OR id = {t[1]}"),
    _ids.map(lambda k: f"id % 3 = {abs(k) % 3}"),  # unparseable → no prune
)


@pytest.fixture(scope="module")
def zeng(spark, tmp_path_factory):
    eng = Engine(spark, str(tmp_path_factory.mktemp("zmprop")))
    rows = [
        # (id, v, s) — NaN, NULLs, duplicated boundaries, a string that
        # contains AND
        (0, 0.0, "a"),
        (1, 1.5, None),
        (2, float("nan"), "b AND c"),
        (3, 3.0, "c"),
        (3, 3.0, "c"),
        (5, None, "d"),
        (7, 100.0, "zz"),
        (10, -1.0, "a"),
    ]
    df = spark.createDataFrame(rows, "id bigint, v double, s string")
    eng.create_table(
        "pz", df.repartitionByRange(3, "id"), keys=[], versioned=True
    )
    # second write dir so pruning crosses dirs too
    eng.insert(
        "pz",
        spark.createDataFrame(
            [(20, 20.0, "m"), (21, float("nan"), None), (22, 22.0, "n")],
            "id bigint, v double, s string",
        ).repartitionByRange(2, "id"),
    )
    return eng


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=pred_st)
def test_scan_where_equals_filter(zeng, pred):
    got = sorted(
        (r.id, str(r.v), r.s) for r in zeng.scan_where("pz", pred).collect()
    )
    want = sorted(
        (r.id, str(r.v), r.s)
        for r in zeng.table("pz").filter(pred).collect()
    )
    assert got == want, pred


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=pred_st)
def test_count_where_equals_filter_count(zeng, pred):
    """count_where must be EXACT for every generated predicate — full-
    match certificates (file_all_match) can only ever move rows from
    the boundary scan into the metadata tally, never change the
    answer. NaN/NULL/duplicate-boundary rows included."""
    assert (
        zeng.count_where("pz", pred)
        == zeng.table("pz").filter(pred).count()
    )


# Partition-predicate grammar over (p string nullable, q int): shapes
# the partition fast paths claim to answer, plus shapes that must fall
# back (data column v, nondeterminism, subquery-free only).
_ps = st.sampled_from(["'x'", "'has space'", "'quo''te'", "'absent'"])
_qs = st.integers(min_value=6, max_value=10)
part_pred_st = st.one_of(
    _ps.map(lambda x: f"p = {x}"),
    _ps.map(lambda x: f"p <> {x}"),
    st.lists(_ps, min_size=1, max_size=3).map(
        lambda xs: f"p IN ({', '.join(xs)})"
    ),
    st.just("p IS NULL"),
    st.just("p IS NOT NULL"),
    _qs.map(lambda k: f"q = {k}"),
    _qs.map(lambda k: f"q >= {k}"),
    st.tuples(_ps, _qs).map(lambda t: f"p = {t[0]} AND q < {t[1]}"),
    st.tuples(_ps, _qs).map(lambda t: f"p = {t[0]} OR q = {t[1]}"),
    _ps.map(lambda x: f"upper(p) = upper({x})"),
    st.just("p LIKE 'has%'"),
    _qs.map(lambda k: f"v > {k}"),  # data column → must fall back
    st.just("length(p) > 4"),
)


@pytest.fixture(scope="module")
def peng(spark, tmp_path_factory):
    eng = Engine(spark, str(tmp_path_factory.mktemp("pprop")))
    rows = [
        (1, "x", 7, 1.0),
        (2, "x", 8, 2.0),
        (3, "has space", 7, 3.0),
        (4, "has space", 9, 4.0),
        (5, None, 8, 5.0),
        (6, "quo'te", 10, 6.0),
        (7, "x", 7, 7.0),
        (8, None, 6, 8.0),
    ]
    df = spark.createDataFrame(rows, "k bigint, p string, q int, v double")
    eng.create_table(
        "pp", df, keys=["k"], partition_by=["p", "q"],
        versioned=True, deletion_vectors=True,
    )
    # live DVs so the rollup's per-partition subtraction is exercised
    # by every generated predicate
    eng.delete_where_dv("pp", "k IN (2, 4)")
    eng.table("pp").createOrReplaceTempView("pp_v")
    return eng


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=part_pred_st)
def test_partition_count_where_equals_filter(peng, pred):
    """The partition-predicate COUNT fast path must be EXACT for every
    generated predicate — whichever path answers (partition rollup,
    zone-map count, vanilla scan), the value equals filter().count();
    NULL partitions, escaped values, and DV-deleted rows included."""
    got = peng.sql(f"SELECT COUNT(*) AS n FROM pp WHERE {pred}").head().n
    want = peng.table("pp").filter(pred).count()
    assert got == want, pred


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=part_pred_st)
def test_partition_group_count_where_equals_vanilla(peng, pred):
    """Same exactness property for the grouped variant — and zero-count
    groups must never appear (GROUP BY emits no group for no rows)."""
    q = (
        f"SELECT p, q, COUNT(*) AS c FROM pp WHERE {pred} GROUP BY p, q"
    )
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    got = sorted(
        (tuple(r) for r in peng.sql(q).collect()), key=key
    )
    want = sorted(
        (
            tuple(r)
            for r in peng.spark.sql(
                q.replace("FROM pp", "FROM pp_v")
            ).collect()
        ),
        key=key,
    )
    assert got == want, pred
    assert all(r[-1] > 0 for r in got), pred
