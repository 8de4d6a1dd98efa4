"""Property-based check of the upsert merge against a Python dict model.

The model implements the reference semantics directly
(/root/reference/src/dataset.rs:108-147): keyed merge, coalesce(new, old)
per column, incoming NULL never clobbers, old schema wins.
"""

import pyspark.sql.functions as F  # noqa: F401
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_lake_spark.operators import merge as M

# NULL keys drawn deliberately: the merge join is null-safe (NULL
# matches NULL — documented divergence from ANSI MERGE), and the dict
# model's None key captures exactly that (r13 presence-marker fix).
keys_st = st.one_of(st.none(), st.integers(min_value=0, max_value=15))
val_st = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
row_st = st.tuples(keys_st, val_st, val_st)


def model_upsert(old_rows, new_rows):
    state = {k: (v1, v2) for k, v1, v2 in old_rows}
    for k, v1, v2 in new_rows:
        if k in state:
            o1, o2 = state[k]
            state[k] = (v1 if v1 is not None else o1, v2 if v2 is not None else o2)
        else:
            state[k] = (v1, v2)
    return {(k, *vs) for k, vs in state.items()}


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(
    old=st.lists(row_st, max_size=12, unique_by=lambda r: r[0]),
    new=st.lists(row_st, max_size=12, unique_by=lambda r: r[0]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_upsert_matches_model(sess, old, new):
    schema = "k int, a int, b int"
    old_df = sess.createDataFrame(old, schema) if old else sess.createDataFrame([], schema)
    new_df = sess.createDataFrame(new, schema) if new else sess.createDataFrame([], schema)
    merged = M.upsert(old_df, new_df, ["k"])
    got = {(r.k, r.a, r.b) for r in merged.collect()}
    assert got == model_upsert(old, new)
