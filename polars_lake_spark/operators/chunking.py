"""Document chunking: split long documents into overlapping word-window
chunks — the step between raw text and embedding / context-window
packing in a RAG or training-data pipeline (every retrieval corpus and
most pretraining pipelines chunk before anything else touches the
text).

100 TB shape: ENTIRELY map-side — chunk starts come from a per-row
``sequence``, each start slices the (let-bound) words array inside one
``transform``, and ``posexplode`` fans the chunks out as rows.  No
shuffle, no UDF; output is ~tokens/stride rows per document.  Chunk
ids, boundaries, and text are deterministic pure functions of the
input, so chunks are stable across layouts/engines (DuckDB replays
them exactly — the oracled gate).

The reference has no text operators at all; beyond-reference surface
for the LLM-data-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_lake_spark.functions import text as TX


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """(doc_id, chunk_id, start_word, n_words, chunk) — ``chunk_size``-
    word windows at stride ``chunk_size − overlap``.

    Start generation stops once a chunk has reached the document's end:
    a start ``s`` is emitted iff ``s == 0`` or the PREVIOUS chunk ended
    before the last word (``s < dl − overlap``) — so no chunk is ever
    fully contained in its predecessor (a naive ``sequence(0, dl−1)``
    emits a redundant tail chunk whenever ``dl mod stride ≤ overlap``).
    The final chunk may be shorter than ``chunk_size``; empty documents
    produce no chunks."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < chunk_size, got "
            f"overlap={overlap}, chunk_size={chunk_size}"
        )
    stride = chunk_size - overlap
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            # drop empty tokens: splitting all-whitespace text yields ['']
            F.filter(
                TX.words(F.col(text_col)), lambda w: w != ""
            ).alias("__ws"),
        )
        .withColumn("__dl", F.size("__ws"))
        .filter(F.col("__dl") > 0)
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("__dl") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.slice(F.col("__ws"), s + 1, chunk_size).alias("ws"),
        ),
    )
    out = base.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "c")
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("c.start").cast("bigint").alias("start_word"),
        F.size("c.ws").cast("bigint").alias("n_words"),
        F.array_join("c.ws", " ").alias("chunk"),
    )
