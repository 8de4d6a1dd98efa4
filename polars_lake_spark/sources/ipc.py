"""Arrow IPC wire format: the reference's ingest unit and result encoding.

The reference ingests streams of Arrow IPC chunks
(``/root/reference/src/server.rs:36-46``, ``proto/db.proto:57-64``) and
returns query results as ZSTD-compressed Arrow IPC
(``/root/reference/src/server.rs:294-297``).  Spark Connect speaks exactly
this format natively; for the embedded engine these helpers convert at the
driver boundary — the same process boundary the reference's gRPC server
occupies.  (Bulk data movement should go through the lake, not this path.)
"""

from __future__ import annotations

import io

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def dataframe_from_ipc(spark: SparkSession, data: bytes) -> DataFrame:
    """Decode one Arrow IPC stream chunk into a DataFrame
    (``read_source`` analog, /root/reference/src/server.rs:36-46)."""
    with pa.ipc.open_stream(pa.BufferReader(data)) as reader:
        table = reader.read_all()
    return spark.createDataFrame(table.to_pandas())


def arrow_table_to_ipc(table: pa.Table, compression: str | None = "zstd") -> bytes:
    """Encode an in-memory Arrow table as an IPC stream (ZSTD like the
    reference, /root/reference/src/server.rs:294-297)."""
    sink = io.BytesIO()
    options = pa.ipc.IpcWriteOptions(
        compression=pa.Codec(compression) if compression else None
    )
    with pa.ipc.new_stream(sink, table.schema, options=options) as writer:
        writer.write_table(table)
    return sink.getvalue()


def dataframe_to_ipc(df: DataFrame, compression: str | None = "zstd") -> bytes:
    """Encode a result DataFrame as an Arrow IPC stream (single execution:
    one ``toArrow`` action)."""
    return arrow_table_to_ipc(df.toArrow(), compression)


def ipc_chunks(df: DataFrame, rows_per_chunk: int = 80_000):
    """Slice a DataFrame into IPC chunks — the client-side chunking of
    ``/root/reference/call.py:20-24`` (25–80k-row chunks)."""
    table = df.toArrow()
    for batch in table.to_batches(max_chunksize=rows_per_chunk):
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, batch.schema) as writer:
            writer.write_batch(batch)
        yield sink.getvalue()
