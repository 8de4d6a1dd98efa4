"""Serving façade: a thin TCP endpoint over one Engine/SparkSession.

The reference serves SQL over a bidirectional gRPC stream returning
ZSTD-Arrow-IPC frames (``/root/reference/src/server.rs:276-304``,
``proto/db.proto:34,66-77``).  The production-grade Spark analog is Spark
Connect — the same gRPC+Arrow design, built in.  This façade exists to
demonstrate the serving semantics standalone with zero extra
dependencies: newline-delimited JSON requests ``{"sql": ..., "qid": ...}``
in, length-prefixed responses out, each response a JSON header
``{"qid", "rows", "columns", "dtypes", "nbytes"}`` followed by ``nbytes``
of ZSTD-compressed Arrow IPC — the exact fields of the reference's
``SqlResults`` (``proto/db.proto:71-77``).

Unlike the reference, a failed query returns an error response instead of
being silently skipped (``/root/reference/src/server.rs:299``).
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading

from polars_lake_spark.sources.ipc import arrow_table_to_ipc


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        engine = self.server.engine  # type: ignore[attr-defined]
        for raw in self.rfile:
            line = raw.strip()
            if not line:
                continue
            req = None
            try:
                req = json.loads(line)
                df = engine.sql(req["sql"])
                # Execute ONCE: toArrow is the only action; rows come from
                # the materialized table, not a second df.count() job.
                table = df.toArrow()
                payload = arrow_table_to_ipc(table, compression="zstd")
                header = {
                    "qid": req.get("qid"),
                    "rows": table.num_rows,
                    "columns": df.columns,
                    "dtypes": [t for _, t in df.dtypes],
                    "nbytes": len(payload),
                }
            except Exception as e:  # surface, don't swallow
                payload = b""
                header = {
                    "qid": (req.get("qid") if isinstance(req, dict) else None),
                    "error": f"{type(e).__name__}: {e}"[:500],
                    "nbytes": 0,
                }
            blob = json.dumps(header).encode()
            self.wfile.write(struct.pack(">I", len(blob)) + blob + payload)
            self.wfile.flush()


class SqlServer:
    """One engine, many concurrent client connections (thread per
    connection — the serving tier is driver-side; heavy lifting stays in
    Spark executors)."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self._srv = socketserver.ThreadingTCPServer(
            (host, port), _Handler, bind_and_activate=True
        )
        self._srv.daemon_threads = True
        self._srv.engine = engine  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._srv.server_address  # type: ignore[return-value]

    def start(self) -> "SqlServer":
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


def query(host: str, port: int, sql: str, qid: int = 0, timeout: float = 60.0):
    """Minimal client: send one SQL, return (header, arrow_table|None)."""
    import pyarrow as pa

    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall((json.dumps({"sql": sql, "qid": qid}) + "\n").encode())
        f = s.makefile("rb")
        (hlen,) = struct.unpack(">I", f.read(4))
        header = json.loads(f.read(hlen))
        table = None
        if header.get("nbytes"):
            data = f.read(header["nbytes"])
            with pa.ipc.open_stream(pa.BufferReader(data)) as r:
                table = r.read_all()
        return header, table
