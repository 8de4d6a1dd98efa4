"""Engine-persisted BM25 search index: corpus-scan retrieval becomes a
postings PROBE.

``bm25_topk`` (retrieval.py) re-tokenizes the corpus per call — right
for ad-hoc mining, wrong for a serving index.  ``BM25Index`` persists
the postings ONCE as an engine table CLUSTERED BY term, so a query
reads only the files that can contain its terms (the zone-map sidecars
prune the rest driver-side, scan_where): probe cost is O(postings of
the query terms), never O(corpus).

Tables (versioned engine tables — snapshot isolation, time travel and
exactly-once txn watermarks for free):

* ``{name}_bm25_postings`` — (w, doc_id, tf, dl), ``cluster_by=["w"]``:
  every write range-partitions + sorts on the term, so each landed file
  carries a narrow term range and a probe's ``w IN (...)`` keeps ~one
  file per term per write.  ``dl`` rides denormalized so scoring needs
  no join.
* ``{name}_bm25_doclens`` — (doc_id, dl): the corpus stats source
  (N, avgdl must cover ALL docs, including those without query terms).

``add_batch`` appends new documents' postings map-side (one grouped
count over the batch only) — the corpus is never re-tokenized; batch
ids already in the index are dropped (broadcast anti-join, O(batch)),
so a replayed batch re-inserts nothing even without a txn; pass
``txn=(app, version)`` for crash-exact replay protection via the
snapshot watermarks.  Write order is doclens-first: a crash between the
two inserts leaves stats counting a doc whose postings are missing
(scores slightly conservative) rather than postings that corrupt
``n_docs`` — and the next ``add_batch`` of the same ids repairs nothing
because the anti-join sees doclens.

The reference has no text index of any kind; beyond-reference surface
for the LLM-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_lake_spark.functions import text as TX
from polars_lake_spark.operators.retrieval import _ranked_topk


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        TX.words(F.col(text_col)).alias("__ws"),
    ).withColumn("dl", F.size("__ws"))
    return (
        base.select("doc_id", "dl", F.explode("__ws").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("w", "doc_id", "tf", "dl")
    )


class BM25Index:
    def __init__(self, engine, name: str):
        self.engine = engine
        self.name = name

    @property
    def _t_postings(self) -> str:
        return f"{self.name}_bm25_postings"

    @property
    def _t_doclens(self) -> str:
        return f"{self.name}_bm25_doclens"

    def create(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Seed the index from the initial corpus (ids must be unique)."""
        eng = self.engine
        eng.create_table(
            self._t_doclens,
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.size(TX.words(F.col(text_col))).alias("dl"),
            ),
            keys=["doc_id"],
            versioned=True,
        )
        eng.create_table(
            self._t_postings,
            _postings(docs, id_col, text_col),
            versioned=True,
            cluster_by=["w"],
        )

    @classmethod
    def open(cls, engine, name: str) -> "BM25Index":
        engine.table(f"{name}_bm25_postings")  # raises if absent
        return cls(engine, name)

    def add_batch(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Index new documents — O(batch) work: ids already indexed drop
        via a broadcast anti-join (clean replays re-insert nothing), the
        rest tokenize/group map-side and append.  Returns docs added."""
        eng = self.engine
        batch = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).dropDuplicates(["doc_id"])
        known = eng.table(self._t_doclens).select("doc_id")
        fresh = batch.join(
            known, "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        n = fresh.count()
        if n == 0:
            return 0
        # doclens FIRST (see module docstring for the crash-order
        # argument); same txn guards both tables' watermarks
        eng.insert(
            self._t_doclens,
            fresh.select(
                "doc_id", F.size(TX.words(F.col("text"))).alias("dl")
            ),
            txn=txn,
        )
        eng.insert(self._t_postings, _postings(fresh, "doc_id", "text"), txn=txn)
        return n

    def topk(
        self,
        terms: list[str],
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        round_dp: int = 4,
    ) -> DataFrame:
        """Top-``k`` docs for a bag-of-words query — a postings PROBE:
        ``scan_where`` keeps only the files whose term zone-map range
        covers a query term (``engine.last_scan_report`` shows the
        skip), document frequencies come from the probed postings, and
        the corpus stats are one aggregate over the doclens table.
        Same scoring as retrieval.bm25_topk (rounded, doc_id ties)."""
        if not terms:
            raise ValueError("BM25Index.topk: empty query")
        eng = self.engine
        quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
        probe = eng.scan_where(self._t_postings, f"w IN ({quoted})")
        stats = eng.table(self._t_doclens).agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        dfreq = probe.groupBy("w").agg(F.count(F.lit(1)).alias("dfreq"))
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("dfreq") + 0.5)
            / (F.col("dfreq") + 0.5)
        )
        norm = F.col("tf") * (k1 + 1) / (
            F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        scored = (
            probe.join(F.broadcast(dfreq), "w")
            .join(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.round(F.sum(idf * norm), round_dp).alias("bm25"))
        )
        return _ranked_topk(scored, "bm25", k)
