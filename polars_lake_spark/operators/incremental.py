"""Incremental near-dup detection: a persisted MinHash-LSH index that new
document batches join against, so the corpus is never re-shingled.

The reference's dedup story stops at planned ``drop_duplicates``
(``/root/reference/src/main.rs:32``); at 100 TB the dominant curation cost
is re-running whole-corpus dedup every time a crawl lands.  This module
makes dedup INCREMENTAL:

* the index is two tables — ``(id, band, bh)`` bucket entries partitioned
  by ``band`` and ``(id, shingles)`` for exact verification;
* a new batch computes signatures map-side for ITS rows only, joins the
  bucket table on ``(band, bh)`` (partition-pruned to the bands, shuffle
  bounded by batch size), and exact-verifies the candidates;
* novel survivors append their entries/shingles; duplicates never enter.

Cost per batch is O(batch × perms) map-side + a join whose probe side is
the batch, independent of corpus size — the property that makes 100 TB
continuous ingest feasible.  All column expressions (whole-stage codegen);
no Python UDFs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_lake_spark.operators.dedup import (
    prepare_docs,
    verified_jaccard_pairs,
)
from polars_lake_spark.operators.graph import connected_components

if TYPE_CHECKING:  # pragma: no cover
    from polars_lake_spark.engine import Engine

__all__ = [
    "prepare_docs",  # re-exported from dedup (single definition)
    "incremental_minhash_pairs",
    "incremental_winnow_pairs",
    "winnow_entries",
    "batch_survivors",
    "MinHashIndex",
    "WinnowIndex",
]


def incremental_minhash_pairs(
    batch_shingled: DataFrame,
    batch_entries: DataFrame,
    index_entries: DataFrame,
    index_shingles: DataFrame,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """(d1, d2, jaccard) near-dup pairs where d2 is ALWAYS a batch doc and
    d1 is an indexed doc or a smaller-keyed batch doc.  Corpus-internal
    pairs are never recomputed — that is the point.

    Plan shape: batch entries ⋈ index entries on (band, bh) — the probe
    side is the batch, so the shuffle is O(batch); batch-internal
    candidates come from a groupBy over batch entries alone.  Exact
    verification broadcasts the candidate pairs against the shingle
    arrays (index side read only for candidate d1 rows).

    ``max_bucket`` (None = exact) guards hot index buckets: a boilerplate
    flood of B indexed docs sharing a (band, bh) multiplies EVERY probe
    touching it by B.  The bucket-size aggregate is restricted to the
    buckets the BATCH touches (broadcast semi-join) before it shuffles,
    so the guard's cost follows the batch, not the corpus; the over-cap
    set broadcasts back as an anti-join (see minhash_lsh_pairs for the
    recall argument)."""
    if max_bucket is not None:
        touched = batch_entries.select("band", "bh").distinct()
        heavy = (
            index_entries.join(F.broadcast(touched), ["band", "bh"], "leftsemi")
            .groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band", "bh")
        )
        index_entries = index_entries.join(
            F.broadcast(heavy), ["band", "bh"], "left_anti"
        )
    # The batch side is the small side BY DESIGN (a crawl increment vs the
    # corpus) — broadcast it so the index entries table is probed map-side
    # and never shuffles, whatever the stats estimator thinks.
    cross = (
        F.broadcast(batch_entries.alias("n"))
        .join(index_entries.alias("o"), ["band", "bh"])
        .filter(F.col("o.id") != F.col("n.id"))
        .select(F.col("o.id").alias("d1"), F.col("n.id").alias("d2"))
        .distinct()
    )
    internal = (
        batch_entries.groupBy("band", "bh")
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("d1"), F.col("ids"))
        .select("d1", F.explode("ids").alias("d2"))
        .filter(F.col("d1") < F.col("d2"))
        .distinct()
    )
    cands = cross.unionByName(internal).distinct()
    all_sh = index_shingles.unionByName(batch_shingled)
    s1 = all_sh.select(F.col("id").alias("d1"), F.col("shingles").alias("sh1"))
    # s2 is the batch's shingles — small by the same design argument, so
    # the verification join is broadcast too (in the full-corpus LSH path
    # s2 is the whole corpus and must NOT be hinted; hence here, not in
    # verified_jaccard_pairs).
    s2 = F.broadcast(
        batch_shingled.select(
            F.col("id").alias("d2"), F.col("shingles").alias("sh2")
        )
    )
    return verified_jaccard_pairs(cands, s1, s2, threshold)


def batch_survivors(pairs: DataFrame, batch_ids: DataFrame) -> DataFrame:
    """(id) batch docs that should ENTER the index: not near-dup of any
    indexed doc, and the canonical (min-id) representative of any
    batch-internal near-dup cluster.

    Transitivity matches ``dedup_survivors``: components are built over
    ALL pairs; a component containing any indexed doc is contaminated
    (every batch member drops), otherwise the min-id batch member keeps.
    ``batch_ids`` carries a single ``id`` column."""
    comps = connected_components(pairs, "d1", "d2")
    tagged = comps.join(batch_ids.withColumn("is_batch", F.lit(True)), "id", "left")
    comp_state = tagged.groupBy("component").agg(
        F.max(F.when(F.col("is_batch").isNull(), 1).otherwise(0)).alias(
            "contaminated"
        ),
        F.min(F.when(F.col("is_batch").isNotNull(), F.col("id"))).alias("keeper"),
    )
    dropped = (
        tagged.join(comp_state, "component")
        .filter(
            F.col("is_batch").isNotNull()
            & ((F.col("contaminated") == 1) | (F.col("id") != F.col("keeper")))
        )
        .select("id")
    )
    return batch_ids.join(dropped, "id", "left_anti")


class MinHashIndex:
    """Engine-persisted incremental MinHash-LSH dedup index.

    Two engine tables back it: ``{name}_mh_entries`` — (id, band, bh)
    partitioned by band so a probe's (band, bh) join prunes to band dirs —
    and ``{name}_mh_shingles`` — (id, shingles) for exact verification.
    Parameters ride in ``{name}_mh_meta`` so a reopened index is
    self-describing (signatures are only comparable under identical
    n/num_perm/bands).
    """

    def __init__(
        self,
        engine: "Engine",
        name: str,
        *,
        n: int = 3,
        num_perm: int = 128,
        bands: int = 32,
        threshold: float = 0.8,
        max_bucket: int | None = None,
    ):
        self.engine = engine
        self.name = name
        self.n, self.num_perm, self.bands = n, num_perm, bands
        self.threshold = threshold
        self.max_bucket = max_bucket

    @property
    def _t_entries(self) -> str:
        return f"{self.name}_mh_entries"

    @property
    def _t_shingles(self) -> str:
        return f"{self.name}_mh_shingles"

    @property
    def _t_meta(self) -> str:
        return f"{self.name}_mh_meta"

    def create(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Seed the index from an initial (already-deduplicated) corpus."""
        shingled, entries = prepare_docs(
            docs, id_col, text_col, self.n, self.num_perm, self.bands
        )
        eng = self.engine
        # REBALANCE on the partition column before the partitioned write
        # (guide §6): without it every write task emits a file into every
        # band dir — bands × tasks small files (1024 at 32 cores) whose
        # open/commit/footer overhead dominates the build.  AQE rebalance
        # is the scale-adaptive form: it coalesces to one file per band
        # here and SPLITS oversized band partitions by the advisory size
        # on a real corpus (a plain repartition(band) would bottleneck a
        # 100 TB band on one reducer).
        eng.create_table(
            self._t_entries,
            entries.hint("rebalance", "band"),
            partition_by=["band"],
        )
        eng.create_table(self._t_shingles, shingled)
        meta = eng.spark.createDataFrame(
            [(self.n, self.num_perm, self.bands, float(self.threshold),
              self.max_bucket)],
            "n int, num_perm int, bands int, threshold double, max_bucket int",
        )
        eng.create_table(self._t_meta, meta)
        shingled.unpersist()

    @classmethod
    def open(cls, engine: "Engine", name: str) -> "MinHashIndex":
        row = engine.table(f"{name}_mh_meta").head()
        return cls(
            engine,
            name,
            n=row["n"],
            num_perm=row["num_perm"],
            bands=row["bands"],
            threshold=row["threshold"],
            max_bucket=row.asDict().get("max_bucket"),
        )

    def add_batch(
        self, batch: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        """Dedup a new batch against the index + itself, append the novel
        survivors, and return ``{"pairs": DataFrame, "novel": DataFrame}``.

        ``pairs`` is materialized before the index mutates (the plan reads
        the pre-append index tables lazily otherwise).

        Idempotent under CLEAN batch replay: ids already present in the
        index are never novel (checked against the shingle table, which is
        written FIRST), so a micro-batch re-delivered after a successful
        commit (foreachBatch at-least-once window) re-inserts nothing and
        re-emits no self-pairs.  A crash BETWEEN the two table inserts can
        leave a doc with shingles but no entries — run ``repair()`` to
        reconcile (the replay itself stays safe either way: shingles-first
        ordering means the membership check can only over-report, never
        re-insert).

        Per-batch cost: every corpus-side relation is reduced to the
        batch's footprint BEFORE any shuffle — membership and replay
        filters broadcast the batch ids; the probe broadcasts the batch
        entries (incremental_minhash_pairs).  The corpus tables are
        scanned (column-pruned, map-side) but never shuffled."""
        batch = batch.dropDuplicates([id_col])  # at-least-once sources
        shingled, entries = prepare_docs(
            batch, id_col, text_col, self.n, self.num_perm, self.bands
        )
        eng = self.engine
        all_ids = batch.select(F.col(id_col).alias("id"))
        # A replayed (already-indexed) id must not match its own index
        # rows — drop those rows from the probe's view of the index.
        idx_entries = eng.table(self._t_entries).join(
            F.broadcast(all_ids), "id", "left_anti"
        )
        idx_shingles = eng.table(self._t_shingles).join(
            F.broadcast(all_ids), "id", "left_anti"
        )
        pairs = incremental_minhash_pairs(
            shingled,
            entries,
            idx_entries,
            idx_shingles,
            self.threshold,
            max_bucket=self.max_bucket,
        ).localCheckpoint()
        batch_ids = shingled.select("id")
        # Docs too short to shingle (< n words) have no near-dup notion
        # here — they count as novel but contribute no index rows (the
        # entries/shingles inserts inner-join them away).
        short = all_ids.join(batch_ids, "id", "left_anti")
        # Replay guard, bounded by the batch: semi-join the corpus ids
        # down to the batch's ids (broadcast, map-side) and anti-join that
        # small result — never a corpus-wide shuffle.
        already = eng.table(self._t_shingles).select("id").join(
            F.broadcast(all_ids), "id", "leftsemi"
        )
        novel = (
            batch_survivors(pairs, batch_ids)
            .unionByName(short)
            .join(F.broadcast(already), "id", "left_anti")
            .localCheckpoint()
        )
        # Shingles land BEFORE entries: the membership check reads
        # shingles, so a crash between the writes makes the replay skip
        # (conservative) rather than double-insert entries.
        eng.insert(self._t_shingles, shingled.join(novel, "id"))
        eng.insert(self._t_entries, entries.join(novel, "id"))
        shingled.unpersist()
        return {"pairs": pairs, "novel": novel}

    def repair(self) -> int:
        """Reconcile a crash between add_batch's two inserts: any doc with
        shingles but no entries gets its entries re-derived from the
        stored shingles.  Corpus-size work — run on demand (a probe that
        misses a doc you know is indexed is the symptom), not per batch.
        Returns the number of repaired docs."""
        from polars_lake_spark.operators.dedup import (
            minhash_band_entries,
            minhash_signatures,
        )

        eng = self.engine
        have_entries = eng.table(self._t_entries).select("id").distinct()
        orphans = eng.table(self._t_shingles).join(
            have_entries, "id", "left_anti"
        )
        n = orphans.count()
        if n:
            entries = minhash_band_entries(
                minhash_signatures(orphans, self.num_perm),
                self.num_perm,
                self.bands,
            )
            eng.insert(self._t_entries, entries)
        return n

    def compact(self) -> None:
        """Rewrite each index table to one file per partition dir — every
        add_batch appends small files, and probe cost is file-count-bound
        long before it is byte-bound.  Run on the same cadence as any
        other hot table (engine.compact is the general mechanism)."""
        self.engine.compact(self._t_entries)
        self.engine.compact(self._t_shingles)

    def stats(self) -> dict:
        """{'docs': indexed doc count, 'entries': band-bucket rows,
        'max_bucket': largest (band, bh) bucket} — the skew signal: a
        huge bucket means boilerplate-identical content got past exact
        dedup and every probe pays for it."""
        e = self.engine.table(self._t_entries)
        top = (
            e.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .head()
        )
        return {
            "docs": self.engine.table(self._t_shingles).count(),
            "entries": e.count(),
            "max_bucket": top["mx"] if top and top["mx"] is not None else 0,
        }


def winnow_entries(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    w: int,
    gram_hash: str = "xxhash64",
    n_fpb: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(persisted_fps, exploded (id, fp[, fpb]) entries) — the ONE home
    of the persist-before-explode workaround: Catalyst collapses a
    single-reference projection into Generate's input, re-evaluating the
    HOF-heavy fingerprint expression per emitted element (measured 25x
    in winnow_match_pairs; a 22 s bench entry before the persist).
    Callers that materialize the entries should unpersist fps; lazy
    registry-query callers accept the session-lifetime cache (the
    prepare_docs contract)."""
    from pyspark.storagelevel import StorageLevel

    from polars_lake_spark.operators.winnow import winnow_fingerprints

    fps = winnow_fingerprints(docs, id_col, text_col, k, w, gram_hash).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    entries = fps.select("id", F.explode("fps").alias("fp"))
    if n_fpb is not None:
        entries = entries.withColumn(
            "fpb", F.pmod(F.col("fp"), F.lit(n_fpb))
        )
    return fps, entries


def incremental_winnow_pairs(
    batch_entries: DataFrame,
    index_entries: DataFrame,
    min_shared: int = 2,
    max_bucket: int = 100,
) -> DataFrame:
    """(d1, d2, n_shared) exact-substring near-dup pairs where d2 is
    ALWAYS a batch doc (d1 indexed, or a smaller-keyed batch doc) —
    the winnowing analog of ``incremental_minhash_pairs``: the corpus's
    fingerprints are never recomputed, the probe joins on fp with the
    batch side broadcast, and the boilerplate ``max_bucket`` guard uses
    the TRUE (index + batch) bucket size restricted to the buckets the
    batch touches, so its cost follows the batch too. n_shared equals
    what a full-corpus ``winnow_match_pairs`` would report for the same
    pair, because bucket totals and the cut are identical.

    ``batch_entries`` / ``index_entries`` carry (id, fp) rows."""
    touched = batch_entries.select("fp").distinct()
    idx_touched = index_entries.join(F.broadcast(touched), "fp", "leftsemi")
    if max_bucket is not None:
        sizes = (
            idx_touched.groupBy("fp").agg(F.count(F.lit(1)).alias("ni"))
            .join(
                batch_entries.groupBy("fp").agg(
                    F.count(F.lit(1)).alias("nb")
                ),
                "fp",
                "full_outer",
            )
            .filter(
                F.coalesce("ni", F.lit(0)) + F.coalesce("nb", F.lit(0))
                > max_bucket
            )
            .select("fp")
        )
        idx_touched = idx_touched.join(F.broadcast(sizes), "fp", "left_anti")
        batch_entries = batch_entries.join(
            F.broadcast(sizes), "fp", "left_anti"
        )
    cross = (
        F.broadcast(batch_entries.alias("n"))
        .join(idx_touched.alias("o"), "fp")
        .select(F.col("o.id").alias("d1"), F.col("n.id").alias("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    internal = (
        batch_entries.groupBy("fp")
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("d1"), F.col("ids"))
        .select("d1", F.explode("ids").alias("d2"))
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return cross.unionByName(internal).filter(
        F.col("n_shared") >= min_shared
    )


class WinnowIndex:
    """Engine-persisted incremental EXACT-SUBSTRING dedup index — the
    winnowing complement to ``MinHashIndex`` (bag-of-ngram Jaccard misses
    a long verbatim quote inside otherwise-different documents; this
    catches any shared normalized run of >= k+w-1 chars).

    One entries table ``{name}_wn_fps`` — (id, fp), hash-partitioned into
    ``fpb`` dirs for file organization — plus ``{name}_wn_meta`` carrying
    (k, w, min_shared, max_bucket, gram_hash) so a reopened index is
    self-describing (fingerprints only compare under identical
    parameters).

    add_batch mirrors MinHashIndex: probe is O(batch) (batch fingerprints
    broadcast), novel survivors append, replayed ids are inert. Docs
    shorter than k normalized chars have no fingerprints: they count as
    novel, contribute no entries, and are re-flagged novel under replay —
    harmless for keyed-upsert consumers (same contract as MinHashIndex's
    short-doc rule)."""

    N_FPB = 32

    def __init__(
        self,
        engine: "Engine",
        name: str,
        *,
        k: int = 8,
        w: int = 6,
        min_shared: int = 2,
        max_bucket: int = 100,
        gram_hash: str = "xxhash64",
    ):
        self.engine = engine
        self.name = name
        self.k, self.w = k, w
        self.min_shared, self.max_bucket = min_shared, max_bucket
        self.gram_hash = gram_hash

    @property
    def _t_fps(self) -> str:
        return f"{self.name}_wn_fps"

    @property
    def _t_meta(self) -> str:
        return f"{self.name}_wn_meta"

    def _entries(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> tuple[DataFrame, DataFrame]:
        """Delegates to the shared ``winnow_entries`` (single home of the
        persist-before-explode workaround); callers unpersist fps once
        the entries are materialized."""
        return winnow_entries(
            docs, id_col, text_col, self.k, self.w, self.gram_hash,
            n_fpb=self.N_FPB,
        )

    def create(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        eng = self.engine
        fps, entries = self._entries(docs, id_col, text_col)
        # Same REBALANCE-before-partitioned-write as MinHashIndex.create:
        # one file per fpb dir instead of dirs × tasks small files, with
        # AQE splitting oversized fpb partitions at real corpus sizes.
        eng.create_table(
            self._t_fps,
            entries.hint("rebalance", "fpb"),
            partition_by=["fpb"],
        )
        fps.unpersist()
        meta = eng.spark.createDataFrame(
            [(self.k, self.w, self.min_shared, self.max_bucket, self.gram_hash)],
            "k int, w int, min_shared int, max_bucket int, gram_hash string",
        )
        eng.create_table(self._t_meta, meta)

    @classmethod
    def open(cls, engine: "Engine", name: str) -> "WinnowIndex":
        row = engine.table(f"{name}_wn_meta").head()
        return cls(
            engine, name, k=row["k"], w=row["w"],
            min_shared=row["min_shared"], max_bucket=row["max_bucket"],
            gram_hash=row["gram_hash"],
        )

    def add_batch(
        self, batch: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        """Probe the batch against the index + itself, append novel
        survivors' fingerprints; returns {"pairs", "novel"}. Pairs are
        materialized before the index mutates."""
        batch = batch.dropDuplicates([id_col])
        eng = self.engine
        all_ids = batch.select(F.col(id_col).alias("id"))
        idx = eng.table(self._t_fps).join(
            F.broadcast(all_ids), "id", "left_anti"
        )
        bfps, bent_raw = self._entries(batch, id_col, text_col)
        bent = bent_raw.localCheckpoint(eager=True)
        bfps.unpersist()
        pairs = incremental_winnow_pairs(
            bent, idx, self.min_shared, self.max_bucket
        ).localCheckpoint()
        batch_ids = bent.select("id").distinct()
        short = all_ids.join(batch_ids, "id", "left_anti")
        already = eng.table(self._t_fps).select("id").distinct().join(
            F.broadcast(all_ids), "id", "leftsemi"
        )
        novel = (
            batch_survivors(pairs, batch_ids)
            .unionByName(short)
            .join(F.broadcast(already), "id", "left_anti")
            .localCheckpoint()
        )
        eng.insert(self._t_fps, bent.join(novel, "id"))
        return {"pairs": pairs, "novel": novel}

    def compact(self) -> None:
        """One file per fpb dir — every add_batch appends small files and
        probe cost is file-count-bound long before it is byte-bound (same
        cadence as MinHashIndex.compact)."""
        self.engine.compact(self._t_fps)

    def stats(self) -> dict:
        """{'docs', 'entries', 'max_bucket'} — max_bucket is the
        boilerplate signal: a fingerprint shared by many docs multiplies
        every probe that touches it."""
        e = self.engine.table(self._t_fps)
        top = (
            e.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .head()
        )
        return {
            "docs": e.select("id").distinct().count(),
            "entries": e.count(),
            "max_bucket": top["mx"] if top and top["mx"] is not None else 0,
        }
