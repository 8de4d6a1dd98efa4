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
