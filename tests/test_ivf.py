"""IVF ANN: deterministic training, full coverage index, and recall vs
brute force."""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark.operators import similarity as S
from polars_lake_spark.operators.ivf import ivf_index, ivf_search, train_ivf
from polars_lake_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def trained(spark, emb):
    centroids = train_ivf(emb, k=8, iters=2).cache()
    index = ivf_index(emb, centroids).cache()
    return centroids, index


def test_index_covers_corpus(emb, trained):
    centroids, index = trained
    assert centroids.count() == 8
    assert index.count() == emb.count()
    assert index.select("id").distinct().count() == emb.count()


def test_training_is_deterministic(emb, trained):
    centroids, _ = trained
    again = train_ivf(emb, k=8, iters=2)
    a = {r.cell_id: [round(x, 8) for x in r.cv] for r in centroids.collect()}
    b = {r.cell_id: [round(x, 8) for x in r.cv] for r in again.collect()}
    assert a == b


def test_ivf_recall_vs_brute_force(emb, trained):
    centroids, index = trained
    queries = emb.filter(F.col("vec_id") < 20)
    approx = ivf_search(index, centroids, queries, k=5, nprobe=4)
    exact = S.brute_force_topk(emb, queries, k=5)
    a = {(r.qid, r.cid) for r in approx.collect()}
    e = {(r.qid, r.cid) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # random 64-dim embeddings are a worst case for IVF; with nprobe=half
    # the cells we still expect strong recall
    assert recall >= 0.5, f"recall {recall}"
    # scores carried by ANN hits are the exact cosine values
    exact_scores = {(r.qid, r.cid): r.cos_sim for r in exact.collect()}
    for r in approx.collect():
        if (r.qid, r.cid) in exact_scores:
            assert abs(exact_scores[(r.qid, r.cid)] - r.cos_sim) < 1e-6


def test_ivf_pruned_probe_partition_filters(spark, emb, trained, tmp_path):
    """The persisted-index probe must partition-prune: PartitionFilters on
    cell_id at the scan, matching results vs the in-memory search."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.ivf import ivf_search_pruned, ivf_write_index
    from polars_lake_spark.plans import executed_plan

    centroids, index = trained
    engine = Engine(spark, str(tmp_path))
    ivf_write_index(engine, "ivf_idx", emb, centroids)

    queries = emb.filter(F.col("vec_id") < 10)
    pruned = ivf_search_pruned(engine, "ivf_idx", centroids, queries, k=5, nprobe=2)
    plan = executed_plan(pruned)
    # several scans appear (query side is unpartitioned); the INDEX scan
    # must carry a cell_id partition filter
    segs = [s.split("]")[0] for s in plan.split("PartitionFilters")[1:]]
    assert any("cell_id" in s for s in segs), segs

    # same results as probing the in-memory index with the same nprobe
    mem = ivf_search(index, centroids, queries, k=5, nprobe=2)
    assert {(r.qid, r.cid, r.cos_sim) for r in pruned.collect()} == {
        (r.qid, r.cid, r.cos_sim) for r in mem.collect()
    }


def test_train_ivf_layout_independent(spark, sf_dir):
    """Same layout-independence contract as train_pq: centroids from a
    repartition(7)ed corpus are identical (fixed-tolerance rounding)."""
    from polars_lake_spark.operators.ivf import train_ivf
    from polars_lake_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = {r.cell_id: (r.cv, r.cnrm) for r in train_ivf(emb, k=8, iters=2).collect()}
    b = {
        r.cell_id: (r.cv, r.cnrm)
        for r in train_ivf(emb.repartition(7), k=8, iters=2).collect()
    }
    assert set(a) == set(b)
    for c in a:
        assert a[c][0] == b[c][0], c


def test_ivf_add_batch_incremental(spark, emb, trained, tmp_path):
    """Continuous ingest: new vectors map-side-assign against the
    persisted centroids and become searchable without retraining; the
    probe stays partition-pruned."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.ivf import (
        ivf_add_batch,
        ivf_open_centroids,
        ivf_search_pruned,
        ivf_write_index,
    )
    from polars_lake_spark.plans import executed_plan

    centroids, _ = trained
    engine = Engine(spark, str(tmp_path))
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    ivf_write_index(engine, "grow_idx", seed, centroids)

    # reopened centroids match the training output
    reopened = ivf_open_centroids(engine, "grow_idx")
    assert {(r.cell_id, tuple(r.cv), r.cnrm) for r in reopened.collect()} == {
        (r.cell_id, tuple(r.cv), r.cnrm) for r in centroids.collect()
    }

    newbies = emb.filter(F.col("vec_id") % 2 == 1)
    ivf_add_batch(engine, "grow_idx", newbies)
    assert engine.table("grow_idx").count() == emb.count()

    # an added vector is now findable: probe with an added vector itself;
    # its own cell must contain it, so its nearest neighbors include a
    # same-cell odd vector (sanity: search returns k rows per query)
    q = emb.filter(F.col("vec_id") == 1)
    res = ivf_search_pruned(engine, "grow_idx", reopened, q, k=5, nprobe=2)
    rows = res.collect()
    assert len(rows) == 5
    plan = executed_plan(res)
    segs = [s.split("]")[0] for s in plan.split("PartitionFilters")[1:]]
    assert any("cell_id" in s for s in segs), segs


def test_ivf_sync_cdc(spark, emb, trained, tmp_path):
    """CDC-driven index maintenance: an upsert (updates + inserts) and a
    delete on the versioned source flow through engine.changes into the
    persisted index — byte-identical to a full re-index, no retraining,
    and replaying the same window is idempotent."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.ivf import (
        ivf_sync_cdc,
        ivf_write_index,
    )

    centroids, _ = trained
    engine = Engine(spark, str(tmp_path))
    src = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 80)
    engine.create_table("vecs", src, keys=["vec_id"], versioned=True)
    ivf_write_index(engine, "cdc_idx", engine.table("vecs"), centroids)
    v0 = engine._snapstore("vecs").latest_version()

    # updates (flip sign → vectors migrate cells) + inserts (new ids)
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
    engine.upsert("vecs", batch)
    engine.delete(
        "vecs", spark.range(20, 30).select(F.col("id").alias("vec_id"))
    )

    res = ivf_sync_cdc(engine, "cdc_idx", "vecs", from_version=v0)
    assert res["added"] == 20 and res["dropped"] == 20
    assert res["touched_cells"]

    def snap(df):
        return {
            (r.id, tuple(round(x, 9) for x in r.v), round(r.nrm, 9), r.cell_id)
            for r in df.collect()
        }

    full = ivf_index(engine.table("vecs"), centroids)
    assert snap(engine.table("cdc_idx")) == snap(full)

    # replaying the same change window is a no-op on the index contents
    ivf_sync_cdc(engine, "cdc_idx", "vecs", from_version=v0)
    assert snap(engine.table("cdc_idx")) == snap(full)


def test_stream_ann_ingest(spark, emb, trained, tmp_path):
    """Streaming composition: a vector stream upserts into the versioned
    source and the persisted index syncs per micro-batch — the final
    index equals a from-scratch re-encode of the final source state."""
    from polars_lake_spark import Engine
    from polars_lake_spark.operators.ivf import ivf_write_index
    from polars_lake_spark.streaming.ingest import stream_ann_ingest

    centroids, _ = trained
    engine = Engine(spark, str(tmp_path))
    seed = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 50)
    engine.create_table("svecs", seed, keys=["vec_id"], versioned=True)
    ivf_write_index(engine, "sidx", engine.table("svecs"), centroids)

    # stream = 10 updates (negated) + 10 inserts
    batch = (
        emb.select("vec_id", "embedding")
        .filter((F.col("vec_id") < 10) | (F.col("vec_id").between(50, 59)))
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
    staging = str(tmp_path / "vec_stream")
    batch.repartition(2).write.parquet(staging)
    stream = spark.readStream.schema(batch.schema).parquet(staging)
    q = stream_ann_ingest(
        engine, "sidx", stream, "svecs",
        checkpoint_dir=str(tmp_path / "ckpt_ann"),
    )
    q.awaitTermination(180)

    def snap(df):
        return {
            (r.id, tuple(round(x, 9) for x in r.v), r.cell_id)
            for r in df.select("id", "v", "cell_id").collect()
        }

    full = ivf_index(engine.table("svecs"), centroids)
    assert engine.table("svecs").count() == 60
    assert snap(engine.table("sidx")) == snap(full)


def test_ivf_sync_cdc_drained_cell_is_tombstoned(spark, emb, trained, tmp_path):
    """A delete batch that EMPTIES a cell must not fall back to a
    full-index rewrite (r6 verdict item 2): the emptied cell's partition
    is dropped via a tombstone, untouched cells' files are byte-for-byte
    untouched on disk, the synced index equals a full re-index, and
    replaying the window stays idempotent."""
    import os

    from polars_lake_spark import Engine
    from polars_lake_spark.operators.ivf import ivf_sync_cdc, ivf_write_index

    centroids, _ = trained
    engine = Engine(spark, str(tmp_path))
    src = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 80)
    engine.create_table("dvecs", src, keys=["vec_id"], versioned=True)
    ivf_write_index(engine, "didx", engine.table("dvecs"), centroids)
    v0 = engine._snapstore("dvecs").latest_version()

    # pick a populated cell and delete EVERY source row assigned to it
    cells = {
        r.cell_id: r.n
        for r in engine.table("didx").groupBy("cell_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    victim = min(cells, key=cells.get)
    doomed = engine.table("didx").filter(
        F.col("cell_id") == victim
    ).select(F.col("id").alias("vec_id"))
    n_doomed = doomed.count()
    assert n_doomed > 0
    untouched = sorted(set(cells) - {victim})[0]

    root = engine._path("didx")
    before = sorted(
        (f, os.stat(os.path.join(root, f"cell_id={untouched}", f)).st_mtime_ns)
        for f in os.listdir(os.path.join(root, f"cell_id={untouched}"))
        if f.endswith(".parquet")
    )

    engine.delete("dvecs", doomed)
    res = ivf_sync_cdc(engine, "didx", "dvecs", from_version=v0)
    assert res["dropped"] == n_doomed and res["added"] == 0
    assert res["touched_cells"] == [victim]

    # the emptied cell's partition directory is GONE, not rewritten empty
    assert not os.path.exists(os.path.join(root, f"cell_id={victim}"))
    # untouched cells were never rewritten (same files, same mtimes)
    after = sorted(
        (f, os.stat(os.path.join(root, f"cell_id={untouched}", f)).st_mtime_ns)
        for f in os.listdir(os.path.join(root, f"cell_id={untouched}"))
        if f.endswith(".parquet")
    )
    assert after == before

    def snap(df):
        return {
            (r.id, tuple(round(x, 9) for x in r.v), r.cell_id)
            for r in df.select("id", "v", "cell_id").collect()
        }

    full = ivf_index(engine.table("dvecs"), centroids)
    assert snap(engine.table("didx")) == snap(full)
    # replay: the same window applies cleanly to the already-synced index
    ivf_sync_cdc(engine, "didx", "dvecs", from_version=v0)
    assert snap(engine.table("didx")) == snap(full)
