"""Product quantization: codebook determinism, map-side encode plan,
compression shape, and shortlist-rerank recall vs brute force.
"""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark.operators import similarity as S
from polars_lake_spark.operators.pq import (
    pq_encode,
    pq_search,
    pq_search_rerank,
    train_pq,
)
from polars_lake_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def cbs(emb):
    return train_pq(emb, m=8, ksub=16, iters=2)


def test_train_is_deterministic(emb, cbs):
    again = train_pq(emb, m=8, ksub=16, iters=2)
    assert again == cbs  # hash-seeded Lloyd, no RNG anywhere


def test_codes_shape_and_range(emb, cbs):
    codes = pq_encode(emb, cbs)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_encode_is_map_side(emb, cbs):
    from polars_lake_spark.plans import executed_plan

    plan = executed_plan(pq_encode(emb, cbs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_adc_orders_by_true_distance_on_centroids(emb, cbs):
    """A query that IS a corpus vector must rank its own near-identical
    code neighbors first: sanity that ADC distances are monotone with
    reconstruction distance (exact check is the recall test)."""
    codes = pq_encode(emb, cbs)
    queries = emb.filter(F.col("vec_id") < 3)
    out = pq_search(codes, cbs, queries, k=10).collect()
    assert len(out) == 30
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r.approx_dist)
    for dists in by_q.values():
        assert dists == sorted(dists)  # window ordered ascending


def test_shortlist_rerank_recall(emb, cbs):
    """Exact top-5 recall of the shortlist-100 reranked PQ search >= 0.4
    per query (measured 0.6-1.0 on the fixtures; threshold leaves margin
    in line with the similarity_pq_recall oracle invariant)."""
    codes = pq_encode(emb, cbs).cache()
    queries = emb.filter(F.col("vec_id") < 10)
    approx = {
        (r.qid, r.cid)
        for r in pq_search_rerank(
            codes, cbs, emb, queries, k=5, shortlist=100
        ).collect()
    }
    exact = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    per_q = {}
    for r in exact.collect():
        hit, tot = per_q.setdefault(r.qid, [0, 0])
        per_q[r.qid][1] = tot + 1
        if (r.qid, r.cid) in approx:
            per_q[r.qid][0] = hit + 1
    assert all(h / t >= 0.4 for h, t in per_q.values()), per_q


def test_train_rejects_bad_m(emb):
    with pytest.raises(ValueError):
        train_pq(emb, m=7, ksub=16, iters=1)  # 64 % 7 != 0


def test_ivfpq_pruned_probe_partition_filters(spark, emb, tmp_path):
    """Persisted IVF-PQ codes partition-prune at probe time (cell_id in
    PartitionFilters) and match the in-memory ADC search; a versioned
    index pins searches to a snapshot while a rebuild lands."""
    import pyspark.sql.functions as F

    from polars_lake_spark import Engine
    from polars_lake_spark.operators.pq import (
        ivfpq_search,
        ivfpq_search_pruned,
        ivfpq_write_index,
        train_ivfpq,
    )
    from polars_lake_spark.plans import executed_plan

    cents, cbs2, codes = train_ivfpq(emb, k_cells=8, m=8, ksub=16, iters=2)
    codes = codes.localCheckpoint(eager=True)
    engine = Engine(spark, str(tmp_path))
    ivfpq_write_index(engine, "pq_idx", codes, versioned=True)

    queries = emb.filter(F.col("vec_id") < 5)
    pruned = ivfpq_search_pruned(
        engine, "pq_idx", cents, cbs2, queries, k=5, nprobe=2, version=1
    )
    plan = executed_plan(pruned)
    segs = [s.split("]")[0] for s in plan.split("PartitionFilters")[1:]]
    assert any("cell_id" in s for s in segs), segs

    mem = ivfpq_search(cents, cbs2, codes, queries, k=5, nprobe=2)
    assert {(r.qid, r.cid, r.approx_dist) for r in pruned.collect()} == {
        (r.qid, r.cid, r.approx_dist) for r in mem.collect()
    }


def test_train_is_layout_independent(emb, cbs):
    """r4 VERDICT item 7: codebooks must not depend on the physical
    partitioning of the training input (distributed double-sum order).
    Fixed-tolerance rounding of the centroid means makes a repartition(7)
    — different partial-aggregation order — produce IDENTICAL codebooks,
    so the pq/ivfpq recall oracles cannot flap across cluster layouts."""
    again = train_pq(emb.repartition(7), m=8, ksub=16, iters=2)
    assert again == cbs


def test_ivfpq_add_batch_incremental(spark, sf_dir, tmp_path):
    """New vectors residual-encode against the existing codebooks and
    append into the cell-partitioned code table — searchable without
    retraining, byte-identical codes to a full re-encode."""
    import pyspark.sql.functions as F

    from polars_lake_spark import Engine
    from polars_lake_spark.operators.pq import (
        ivfpq_add_batch,
        ivfpq_search_pruned,
        ivfpq_write_index,
        train_ivfpq,
    )
    from polars_lake_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, codebooks, codes = train_ivfpq(emb, k_cells=4, m=8, ksub=8, iters=1)
    engine = Engine(spark, str(tmp_path))
    seed_codes = codes.join(
        emb.filter(F.col("vec_id") % 2 == 0).select(F.col("vec_id").alias("id")),
        "id",
    )
    ivfpq_write_index(engine, "pq_grow", seed_codes)

    newbies = emb.filter(F.col("vec_id") % 2 == 1)
    ivfpq_add_batch(engine, "pq_grow", centroids, codebooks, newbies)
    assert engine.table("pq_grow").count() == emb.count()

    # added codes match what full-corpus encoding produced for those ids
    full = {(r.id, tuple(r.codes)) for r in codes.collect()}
    grown = {(r.id, tuple(r.codes)) for r in engine.table("pq_grow").collect()}
    assert grown == full

    q = emb.filter(F.col("vec_id") == 1)
    res = ivfpq_search_pruned(engine, "pq_grow", centroids, codebooks, q, k=5, nprobe=2)
    assert res.count() == 5


def test_ivfpq_self_contained_index(spark, sf_dir, tmp_path):
    """An IVF-PQ index persisted with its quantizer state reopens in a
    fresh engine with bit-identical centroids/codebooks, and a pruned
    search against the reopened state matches the original."""
    import pyspark.sql.functions as F

    from polars_lake_spark import Engine
    from polars_lake_spark.operators.pq import (
        ivfpq_open,
        ivfpq_search_pruned,
        ivfpq_write_index,
        train_ivfpq,
    )
    from polars_lake_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, codebooks, codes = train_ivfpq(emb, k_cells=4, m=8, ksub=8, iters=1)
    engine = Engine(spark, str(tmp_path))
    ivfpq_write_index(
        engine, "pq_self", codes.localCheckpoint(eager=True),
        centroids=centroids, codebooks=codebooks,
    )

    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    c2, cb2 = ivfpq_open(e2, "pq_self")
    assert cb2 == codebooks
    assert {(r.cell_id, tuple(r.cv), r.cnrm) for r in c2.collect()} == {
        (r.cell_id, tuple(r.cv), r.cnrm) for r in centroids.collect()
    }
    q = emb.filter(F.col("vec_id") < 3)
    a = ivfpq_search_pruned(engine, "pq_self", centroids, codebooks, q, k=5, nprobe=2)
    b = ivfpq_search_pruned(e2, "pq_self", c2, cb2, q, k=5, nprobe=2)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_ivfpq_sync_cdc(spark, sf_dir, tmp_path):
    """CDC-driven code-table maintenance: upsert + delete on the
    versioned vector source rewrite only the touched cells, codes stay
    byte-identical to a full re-encode, and replay is idempotent."""
    import pyspark.sql.functions as F

    from polars_lake_spark import Engine
    from polars_lake_spark.operators.ivf import ivf_index
    from polars_lake_spark.operators.pq import (
        _residuals,
        ivfpq_sync_cdc,
        ivfpq_write_index,
        pq_encode,
        train_ivfpq,
    )
    from polars_lake_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, codebooks, _ = train_ivfpq(emb, k_cells=4, m=8, ksub=8, iters=1)
    engine = Engine(spark, str(tmp_path))
    src = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 80)
    engine.create_table("pqvecs", src, keys=["vec_id"], versioned=True)

    def encode(df):
        assigned = ivf_index(df, centroids)
        return pq_encode(
            _residuals(assigned, centroids), codebooks, id_col="id",
            vec_col="r", normalize=False, keep_cols=["cell_id"],
        )

    ivfpq_write_index(engine, "pq_cdc", encode(engine.table("pqvecs")))
    v0 = engine._snapstore("pqvecs").latest_version()

    batch = (
        emb.select("vec_id", "embedding")
        .filter((F.col("vec_id") < 10) | (F.col("vec_id").between(80, 89)))
        .select(
            "vec_id",
            F.when(
                F.col("vec_id") < 10,
                F.transform("embedding", lambda x: -x),
            )
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    )
    engine.upsert("pqvecs", batch)
    engine.delete(
        "pqvecs", spark.range(20, 30).select(F.col("id").alias("vec_id"))
    )

    res = ivfpq_sync_cdc(
        engine, "pq_cdc", centroids, codebooks, "pqvecs", from_version=v0
    )
    assert res["added"] == 20 and res["dropped"] == 20

    def snap(df):
        return {(r.id, r.cell_id, tuple(r.codes)) for r in df.collect()}

    full = encode(engine.table("pqvecs"))
    assert snap(engine.table("pq_cdc")) == snap(full)

    ivfpq_sync_cdc(
        engine, "pq_cdc", centroids, codebooks, "pqvecs", from_version=v0
    )
    assert snap(engine.table("pq_cdc")) == snap(full)
