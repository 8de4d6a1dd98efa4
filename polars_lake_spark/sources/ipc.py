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


# --------------------------------------------------------------------------
# Arrow IPC *file format* as a distributed table format (the reference
# declares Ipc storage, /root/reference/src/storage.rs:6-10, but never
# implemented writing it, src/dataset.rs:177 — this completes the TODO).
# Each Spark task writes/reads one .arrow (Feather V2) file; Python stays
# at the Arrow batch boundary (mapInArrow), no per-row work.


def write_ipc_dir(df: DataFrame, path: str, compression: str | None = "zstd") -> int:
    """Distributed IPC sink: every partition streams its record batches to
    its own ``part-*.arrow`` file. Returns total rows written.

    The path must be task-visible (local dir in local mode; a shared
    filesystem on a cluster). Empty partitions write no file."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    prefix = uuid.uuid4().hex[:8]  # append-safe unique file names

    def task(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"part-{prefix}-{pid:05d}.arrow")
        writer = None
        sink = None
        n = 0
        for batch in batches:
            if writer is None:
                sink = pa.OSFile(out, "wb")
                options = pa.ipc.IpcWriteOptions(
                    compression=pa.Codec(compression) if compression else None
                )
                writer = pa.ipc.new_file(sink, batch.schema, options=options)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is not None:
            writer.close()
            sink.close()
        yield pa.RecordBatch.from_pydict({"rows": [n]})

    summary = df.mapInArrow(task, schema="rows long")
    return sum(r.rows for r in summary.collect())


def read_ipc_dir(spark: SparkSession, path: str) -> DataFrame:
    """Distributed IPC source: schema from one file's footer (driver-side
    metadata peek), then ``binaryFile`` scan + mapInArrow decode — one
    task per file, batches streamed, never a whole-partition materialize."""
    import glob as _glob

    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(_glob.glob(f"{path}/*.arrow"))
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")
    # prefer_timestamp_ntz: tz-less Arrow timestamps faithfully map back to
    # TIMESTAMP_NTZ (LTZ columns carry an explicit tz in the footer).
    with pa.ipc.open_file(files[0]) as r:
        spark_schema = from_arrow_schema(r.schema, prefer_timestamp_ntz=True)

    bin_df = spark.read.format("binaryFile").load(f"{path}/*.arrow").select("content")

    def decode(batches):
        for batch in batches:
            for buf in batch.column(0).to_pylist():
                with pa.ipc.open_file(pa.BufferReader(buf)) as r:
                    for i in range(r.num_record_batches):
                        yield r.get_batch(i)

    return bin_df.mapInArrow(decode, schema=spark_schema)


def ipc_chunks(df: DataFrame, rows_per_chunk: int = 80_000):
    """Slice a DataFrame into IPC chunks — the client-side chunking of
    ``/root/reference/call.py:20-24`` (25–80k-row chunks)."""
    table = df.toArrow()
    for batch in table.to_batches(max_chunksize=rows_per_chunk):
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, batch.schema) as writer:
            writer.write_batch(batch)
        yield sink.getvalue()


def ingest_ipc_routed(engine, data: bytes) -> dict:
    """Metadata-routed IPC ingest: the producer embeds the TARGET in the
    Arrow schema metadata (``{"table": ..., "keys": "k1,k2"}``) and the
    engine routes the batch itself — the workflow the reference's
    producer.py clearly intends (it stamps ``schema.with_metadata({
    "table": ...})``, /root/reference/producer.py:17-19) but its server
    ignores (the raw-TCP path upserts a HARDCODED dataset,
    /root/reference/src/main.rs:76-84).

    Routing: metadata ``table`` (required) picks the engine table;
    ``keys`` (optional, comma-separated) override the spec's merge keys;
    a missing table is created keyed by the metadata keys.  Returns
    ``{"table": name, "rows": n, "op": created|upserted}``.
    """
    with pa.ipc.open_stream(pa.BufferReader(data)) as reader:
        table = reader.read_all()
    meta = {
        k.decode() if isinstance(k, bytes) else k:
        v.decode() if isinstance(v, bytes) else v
        for k, v in (table.schema.metadata or {}).items()
    }
    name = meta.get("table")
    if not name:
        raise ValueError(
            "ingest_ipc_routed: the IPC schema metadata carries no "
            "'table' key — cannot route the batch"
        )
    keys = [k for k in meta.get("keys", "").split(",") if k]
    df = engine.spark.createDataFrame(table.to_pandas())
    # Resolve view-key spellings (schema__table) to the spec name BEFORE
    # mutating: engine.upsert/_guard_mutable index engine.specs directly,
    # so passing the unresolved view key would always KeyError.
    resolved = name if name in engine.specs else name.replace("__", ".")
    if resolved in engine.specs:
        engine.upsert(resolved, df, keys or None)
        return {"table": resolved, "rows": table.num_rows, "op": "upserted"}
    engine.create_table(name, df, keys=keys, save=engine.root is not None)
    return {"table": name, "rows": table.num_rows, "op": "created"}
