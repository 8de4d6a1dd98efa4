"""Connected components over near-duplicate pair edges — the step that
turns pairwise dedup output into dedup GROUPS (pick one survivor per
cluster of transitively-linked near-dups).

Algorithm: iterative min-label propagation (each vertex repeatedly adopts
the smallest label among itself and its neighbors) until fixpoint. This is
the shuffle-conscious distributed formulation: every iteration is one
equi-join + one groupBy keyed on vertex id, converging in O(component
diameter) rounds (near-dup clusters are shallow — dup chains, not long
paths). For adversarial long-chain graphs the large-star/small-star
variant halves rounds; not needed for dedup workloads.

Driver involvement per round is a single converged-check count — no
collect of vertex data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def connected_components(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 20,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``pairs``; component
    is the minimum vertex id reachable from it.

    Adaptive execution: the edge count is measured once (it already was,
    for iteration-width sizing); at or below ``local_threshold`` edges the
    closure runs as a driver-side union-find on the collected edge list —
    the same result, without N rounds of join+groupBy job overhead (the
    rounds dominate cold-JVM cost: measured ~10 s for a 512-edge graph).
    This is the AQE move — swap the physical strategy when the measured
    input is small — with the memory bound explicit: 1M edges ≈ tens of
    MB on the driver. Above the threshold, distributed min-label
    propagation runs as before; near-dup graphs from 100 TB corpora take
    that path.

    Storage hygiene: each iteration persists its labels and unpersists the
    previous iteration's — a long-lived session doesn't accumulate blocks
    (iterative jobs that leak persisted state are a classic cluster-memory
    killer). The returned frame is localCheckpointed so downstream plans
    don't re-analyze the whole iteration chain."""
    from pyspark.storagelevel import StorageLevel

    # Symmetrize map-side (explode of the two orientations), NOT via
    # pairs.union(pairs-swapped): a union's branches each re-execute the
    # whole upstream pair-generation pipeline (minhash, verify joins...)
    # when `pairs` isn't cached — one explode runs it once.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)  # reused every iteration
    )
    # Right-size the iteration parallelism to the EDGE count, not the
    # upstream pair-pipeline's partitioning: near-dup edge sets are tiny
    # relative to the corpus (512 edges from 25k docs at sf0.1), and each
    # propagation round otherwise pays full-width task-scheduling
    # overhead (measured 1.5 s/round at 32 tasks for those 512 edges).
    # ~1M edges per partition keeps rounds wide on genuinely big graphs.
    n_edges = edges.count()  # also materializes the persist before looping
    if n_edges <= local_threshold:
        spark = pairs.sparkSession
        id_type = edges.schema["a"].dataType
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for row in edges.toLocalIterator():
            ra, rb = find(row[0]), find(row[1])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = [(x, find(x)) for x in parent]
        edges.unpersist()
        schema = StructType(
            [StructField("id", id_type), StructField("component", id_type)]
        )
        return spark.createDataFrame(rows, schema)
    width = max(1, min(edges.rdd.getNumPartitions(), n_edges // 1_000_000 + 1))
    if width < edges.rdd.getNumPartitions():
        narrow = edges.repartition(width, "b").persist(StorageLevel.MEMORY_AND_DISK)
        narrow.count()
        edges.unpersist()
        edges = narrow
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    prev = None
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
                (F.coalesce("nmin", F.col("component")) < F.col("component")).alias(
                    "__chg"
                ),
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
        changed = updated.filter(F.col("__chg")).limit(1).count()  # materialize
        if prev is not None:
            prev.unpersist()
        prev = updated
        labels = updated.drop("__chg")
        if changed == 0:
            break
    result = labels.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    edges.unpersist()
    return result
