"""Product quantization (PQ) for embedding columns — the compression tier
of the ANN stack (similarity.py: hyperplane LSH; ivf.py: coarse cells).

A dim-D vector is split into ``m`` subvectors of D/m dims; each subspace
gets its own tiny k-means codebook (``ksub`` centroids, deterministic
Lloyd — same discipline as ivf.train_ivf: hash-seeded, no RNG). A vector
is stored as ``m`` small integer codes (m bytes with ksub<=256) — 32x
smaller than float32 at D=64/m=8 — and search uses asymmetric distance
(ADC): the query stays exact, candidate distance is the sum of
query-to-centroid sub-distances looked up by code.

Scale shape mirrors ivf._assign's literal-codebook trick: codebooks are
k*m*(D/m) = k*D doubles — always tiny — so encoding is a pure MAP-SIDE
projection (no join, no shuffle), and the only shuffle in training is the
per-(subspace, code) mean update (m*ksub result rows). ADC search scans
the code table once with the codebooks inlined as literals and takes a
per-query top-k window — the same plan family as brute_force_topk but
over m element_at lookups per candidate instead of D multiplies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polars_lake_spark.operators.similarity import as_double, norm


def _unit(vec):
    """L2-normalize so ADC's L2 ranking equals the cosine ranking the rest
    of the similarity stack uses (l2sq(u1, u2) = 2 - 2*cos): unit vectors
    make PQ's metric consistent with brute_force_topk/ivf_search. Zero
    vectors map to zero (guarded denominator).

    The norm is let-bound: subexpression elimination does not reach
    inside HOF lambdas, so a plain reference would re-run the norm fold
    per element — O(d²) per vector."""
    from polars_lake_spark.operators.dedup import let_bound

    return let_bound(
        F.greatest(norm(vec), F.lit(1e-300)),
        lambda n: F.transform(vec, lambda x: x / n),
    )


def _sub_l2sq(a, b):
    """Squared L2 between two (short) array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _codebook_literal(codebooks: list[list[list[float]]]):
    """Literal array<array<array<double>>>: CB[sub][code] = centroid."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for cv in sub])
            for sub in codebooks
        ]
    )


def _adc_dist(qvec, codes_col, codebooks: list[list[list[float]]]):
    """ADC distance expression: sum over subspaces of l2sq between the
    query's subvector and the codebook centroid selected by the stored
    code — one literal nested-array lookup per subspace."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    cb = _codebook_literal(codebooks)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + _sub_l2sq(
            F.slice(qvec, j * F.lit(d_sub) + 1, d_sub),
            F.element_at(
                F.element_at(cb, (j + 1).cast("int")),
                (F.element_at(codes_col, (j + 1).cast("int")) + 1).cast("int"),
            ),
        ),
    )


def _topk_by_dist(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.asc("approx_dist"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", F.round("approx_dist", 6).alias("approx_dist"))
    )


def _exact_rerank(
    short: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact cosine re-rank of an (qid, cid) shortlist — touches only
    |Q| x shortlist full vectors regardless of corpus size."""
    from polars_lake_spark.operators.similarity import cosine

    full = corpus.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("cv")
    )
    qv = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        short.join(full, "cid")
        .join(F.broadcast(qv), "qid")
        .select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", F.round("cos_sim", 4).alias("cos_sim"))
    )


def _encode_expr(vec, codebooks: list[list[list[float]]], d_sub: int):
    """codes[j] = argmin_c l2sq(subvector_j, CB[j][c]) as a map-side
    expression — lexicographic array_min over (dist, code) structs, ties
    to the smallest code, exactly ivf._assign's literal pattern."""
    codes = []
    for j, sub in enumerate(codebooks):
        sv = F.slice(vec, j * d_sub + 1, d_sub)
        entries = [
            F.struct(
                _sub_l2sq(sv, F.array(*[F.lit(float(x)) for x in cv])).alias("d"),
                F.lit(c).cast("int").alias("c"),
            )
            for c, cv in enumerate(sub)
        ]
        codes.append(F.array_min(F.array(*entries))["c"])
    return F.array(*codes)


def train_pq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Per-subspace codebooks via deterministic Lloyd.

    Seeds: the ksub corpus vectors with the smallest xxhash64(id) (one
    distributed TakeOrdered, shared across all m subspaces). Each
    iteration is one map-side encode + one explode + one groupBy on
    (subspace, code) — the shuffle carries N*m short rows and returns
    m*ksub means. Returns plain Python lists (the codebook IS driver-side
    metadata, k*D doubles)."""
    vraw = as_double(F.col(vec_col))
    vecs = corpus.select(
        F.col(id_col).alias("id"), (_unit(vraw) if normalize else vraw).alias("v")
    )
    first = vecs.select(F.size("v").alias("d")).first()
    dim = first.d
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m

    seed_rows = (
        vecs.withColumn("h", F.xxhash64(F.col("id"))).orderBy("h", "id")
        .limit(ksub)
        .select("v")
        .collect()
    )
    if len(seed_rows) < ksub:
        raise ValueError(f"corpus smaller than ksub={ksub}")
    codebooks = [
        [list(r.v[j * d_sub : (j + 1) * d_sub]) for r in seed_rows]
        for j in range(m)
    ]

    for _ in range(iters):
        coded = vecs.withColumn("codes", _encode_expr(F.col("v"), codebooks, d_sub))
        sub = coded.select(
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            F.element_at("codes", j + 1).alias("code"),
                            F.slice("v", j * d_sub + 1, d_sub).alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("sub_id", "e")
        ).select("sub_id", F.col("e.code").alias("code"), F.col("e.sv").alias("sv"))
        means = sub.groupBy("sub_id", "code").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.element_at("sv", i + 1)).alias(f"s{i}")
                for i in range(d_sub)
            ],
        )
        # Round means to a fixed tolerance: distributed double sums are
        # order-dependent in the last ulps, so without this the codebooks
        # (and every downstream code assignment) could drift across
        # cluster layouts / partition counts.  1e-9 is far below any
        # meaningful signal on unit vectors and far above double-sum
        # nondeterminism — codebooks become layout-independent.
        new = {
            (r.sub_id, r.code): [
                round(getattr(r, f"s{i}") / r.cnt, 9) for i in range(d_sub)
            ]
            for r in means.collect()
        }
        # empty cells keep their previous centroid (standard Lloyd fix)
        codebooks = [
            [new.get((j, c), codebooks[j][c]) for c in range(ksub)]
            for j in range(m)
        ]
    return codebooks


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(id, codes array<int>) — pure map-side projection; at 100 TB this
    is the table you persist (m small ints per vector)."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    vraw = as_double(F.col(vec_col))
    extra = list(keep_cols or [])
    vecs = corpus.select(
        F.col(id_col).alias("id"),
        (_unit(vraw) if normalize else vraw).alias("v"),
        *extra,
    )
    return vecs.select(
        "id", _encode_expr(F.col("v"), codebooks, d_sub).alias("codes"), *extra
    )


def pq_search(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC top-k: approx dist²(q, cand) = Σ_j l2sq(q_sub_j, CB[j][codes_j]).

    One scan of the code table crossJoined with the broadcast query set
    (|Q| small — the brute_force_topk regime at 1/32 the bytes), codebook
    lookups via element_at on a literal nested array, then a per-query
    top-k window. Returns (qid, cid, approx_dist)."""
    q = queries.select(
        F.col(id_col).alias("qid"), _unit(as_double(F.col(vec_col))).alias("qv")
    )
    cand = codes.crossJoin(F.broadcast(q)).filter(F.col("id") != F.col("qid"))
    scored = cand.select(
        "qid",
        F.col("id").alias("cid"),
        _adc_dist(F.col("qv"), F.col("codes"), codebooks).alias("approx_dist"),
    )
    return _topk_by_dist(scored, k)


def pq_search_rerank(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 100,
) -> DataFrame:
    """The production PQ pattern: ADC over the compressed code table
    produces a ``shortlist`` of candidates per query (scanning m-byte
    codes, 32x less IO than floats), then ONLY those candidates' full
    vectors are fetched and re-ranked by exact cosine. At 100 TB the
    exact re-rank touches |Q| x shortlist vectors — independent of corpus
    size. Returns (qid, cid, cos_sim) exact-scored top-k."""
    short = pq_search(
        codes, codebooks, queries, id_col=id_col, vec_col=vec_col, k=shortlist
    ).select("qid", "cid")
    return _exact_rerank(short, corpus, queries, id_col, vec_col, k)


def _residuals(assigned: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, cell_id, r) residuals v_unit - c_unit for assigned vectors —
    the single definition both training and incremental ingest encode
    against (a drift between them would silently corrupt codes)."""
    cu = centroids.select("cell_id", _unit(F.col("cv")).alias("cu"))
    return assigned.join(F.broadcast(cu), "cell_id").select(
        "id",
        "cell_id",
        F.zip_with(_unit(F.col("v")), F.col("cu"), lambda x, y: x - y).alias("r"),
    )


def train_ivfpq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
):
    """IVF-PQ with residual encoding (the FAISS IVFPQ design): a coarse
    quantizer (ivf.train_ivf) splits the corpus into cells; PQ codebooks
    are trained on the RESIDUALS v_unit - c_unit, which are far more
    concentrated than raw vectors, so the same ksub buys less distortion.
    Residuals are NOT re-normalized (their magnitude is the signal).

    Returns (centroids_df, codebooks, codes_df) where codes_df is
    (id, cell_id, codes) — at 100 TB you persist codes_df partitioned by
    cell_id (ivf.ivf_write_index layout) at m bytes/vector."""
    from polars_lake_spark.operators.ivf import ivf_index, train_ivf

    centroids = train_ivf(corpus, id_col, vec_col, k=k_cells, iters=iters)
    assigned = ivf_index(corpus, centroids, id_col, vec_col)
    residuals = _residuals(assigned, centroids)
    codebooks = train_pq(
        residuals, id_col="id", vec_col="r", m=m, ksub=ksub, iters=iters,
        normalize=False,
    )
    codes = pq_encode(
        residuals, codebooks, id_col="id", vec_col="r", normalize=False,
        keep_cols=["cell_id"],
    )
    return centroids, codebooks, codes


def _residual_adc_scored(
    probes: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    codes: DataFrame,
) -> DataFrame:
    """(qid, cid, approx_dist) for probe pairs: query residual qr =
    q_unit - c_unit per probed cell, ADC against that cell's codes."""
    cu = centroids.select("cell_id", _unit(F.col("cv")).alias("cu"))
    pq_probe = probes.join(F.broadcast(cu), "cell_id").select(
        "qid",
        "cell_id",
        F.zip_with(_unit(F.col("qv")), F.col("cu"), lambda x, y: x - y).alias("qr"),
    )
    cand = pq_probe.join(codes, "cell_id").filter(F.col("qid") != F.col("id"))
    return cand.select(
        "qid",
        F.col("id").alias("cid"),
        _adc_dist(F.col("qr"), F.col("codes"), codebooks).alias("approx_dist"),
    )


def ivfpq_search(
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    codes: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Probe nprobe cells (ivf.probe_cells), then ADC against the residual
    codes of ONLY those cells: per probe pair the query residual is
    q_unit - c_unit and the distance is the usual codebook lookup sum.
    The cell join is an equi-join on cell_id (partition-prunable when
    codes are persisted by cell), never a corpus scan: candidate count is
    sum of probed cell sizes ~ nprobe/K of the corpus."""
    from polars_lake_spark.operators.ivf import probe_cells

    probes = probe_cells(centroids, queries, id_col, vec_col, nprobe)
    scored = _residual_adc_scored(probes, centroids, codebooks, codes)
    return _topk_by_dist(scored, k)


def ivfpq_search_rerank(
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    shortlist: int = 100,
) -> DataFrame:
    """IVF-PQ shortlist + exact cosine re-rank (same production pattern as
    pq_search_rerank): candidate IO is bounded by the probed cells' code
    rows; the exact pass touches |Q| x shortlist full vectors."""
    short = ivfpq_search(
        centroids, codebooks, codes, queries,
        id_col=id_col, vec_col=vec_col, k=shortlist, nprobe=nprobe,
    ).select("qid", "cid")
    return _exact_rerank(short, corpus, queries, id_col, vec_col, k)


def ivfpq_write_index(
    engine,
    name: str,
    codes: DataFrame,
    versioned: bool = False,
    centroids: DataFrame | None = None,
    codebooks: list | None = None,
):
    """Persist IVF-PQ codes through the Engine layout, hive-partitioned by
    cell_id — the m-bytes-per-vector table a 100 TB deployment actually
    stores. With versioned=True each index rebuild commits a snapshot, so
    searches can pin (time-travel to) an index version while a rebuild
    lands.

    Passing ``centroids``/``codebooks`` persists them alongside as
    ``{name}_centroids`` / ``{name}_codebooks`` so the index artifact is
    SELF-CONTAINED (the ivf_write_index pattern): any later process
    reopens the full quantizer state with ``ivfpq_open`` and can search,
    grow (ivfpq_add_batch), or CDC-sync (ivfpq_sync_cdc) with no
    retraining and no out-of-band state."""
    spec = engine.create_table(
        name, codes, partition_by=["cell_id"], versioned=versioned
    )
    if centroids is not None:
        engine.create_table(f"{name}_centroids", centroids)
    if codebooks is not None:
        rows = [
            (mi, ki, [float(x) for x in vec])
            for mi, cb in enumerate(codebooks)
            for ki, vec in enumerate(cb)
        ]
        engine.create_table(
            f"{name}_codebooks",
            engine.spark.createDataFrame(
                rows, "m int, k int, vals array<double>"
            ),
        )
    return spec


def ivfpq_open(engine, name: str):
    """Reopen a self-contained persisted IVF-PQ index →
    ``(centroids_df, codebooks)``. Both are quantizer-sized (k_cells ×
    dim centroids, m × ksub × d_sub codebook floats) — bounded driver
    metadata, rebuilt as literals exactly like ivf_open_centroids so
    downstream plans embed them instead of nesting a table scan."""
    from polars_lake_spark.operators.ivf import ivf_open_centroids

    centroids = ivf_open_centroids(engine, name)
    rows = engine.table(f"{name}_codebooks").collect()
    by_m: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_m.setdefault(r.m, {})[r.k] = list(r.vals)
    codebooks = [
        [by_m[mi][ki] for ki in sorted(by_m[mi])] for mi in sorted(by_m)
    ]
    return centroids, codebooks


def ivfpq_search_pruned(
    engine,
    name: str,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    version: int | None = None,
) -> DataFrame:
    """ADC search against a PERSISTED code table with literal cell
    predicates, so the scan partition-prunes to the probed cells (same
    bounded-literal pattern as ivf_search_pruned — the probed-cell set is
    <= K). ``version`` pins a snapshot of a versioned index."""
    from polars_lake_spark.operators.ivf import probe_cells

    probes = probe_cells(centroids, queries, id_col, vec_col, nprobe).cache()
    cells = sorted(r.cell_id for r in probes.select("cell_id").distinct().collect())
    codes = (
        engine.table(name, version=version) if version is not None
        else engine.table(name)
    ).filter(F.col("cell_id").isin(cells))
    scored = _residual_adc_scored(probes, centroids, codebooks, codes)
    return _topk_by_dist(scored, k)


def ivfpq_add_batch(
    engine,
    name: str,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    new_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Continuous ingest for the IVF-PQ index (the compressed analog of
    ivf.ivf_add_batch): new vectors assign to their coarse cell
    (broadcast argmax), residual-encode against the EXISTING codebooks
    (map-side literal lookups — no retraining), and append into the
    cell-partitioned code table.  Codebook fit degrades only as far as
    the data distribution drifts; retrain + rebuild (versioned=True on
    ivfpq_write_index snapshots the cutover) when recall decays."""
    from polars_lake_spark.operators.ivf import ivf_index

    assigned = ivf_index(new_vecs, centroids, id_col, vec_col)
    residuals = _residuals(assigned, centroids)
    codes = pq_encode(
        residuals, codebooks, id_col="id", vec_col="r", normalize=False,
        keep_cols=["cell_id"],
    )
    engine.insert(name, codes)
    return codes


def ivfpq_sync_cdc(
    engine,
    name: str,
    centroids: DataFrame,
    codebooks: list,
    source: str,
    from_version: int,
    to_version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Maintain a persisted IVF-PQ code table from a versioned source's
    change feed — the compressed analog of ivf.ivf_sync_cdc: preimages
    locate the old copies' cells (broadcast argmax, no index scan),
    postimages/inserts residual-encode against the EXISTING codebooks
    exactly like ivfpq_add_batch (byte-identical codes, no retraining),
    and only the touched cells are rewritten.  Deletes/updates no longer
    force a rebuild; a replayed batch is idempotent."""
    from polars_lake_spark.operators.ivf import _sync_cell_partitioned, ivf_index

    ch = engine.changes(source, from_version, to_version, preimages=True)
    ch = ch.localCheckpoint(eager=True)
    old_side = ch.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    )
    new_side = ch.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    )
    dead = ivf_index(old_side, centroids, id_col, vec_col).select(
        "id", "cell_id"
    )
    assigned = ivf_index(new_side, centroids, id_col, vec_col)
    residuals = _residuals(assigned, centroids)
    fresh = pq_encode(
        residuals, codebooks, id_col="id", vec_col="r", normalize=False,
        keep_cols=["cell_id"],
    )
    return _sync_cell_partitioned(engine, name, dead, fresh)
