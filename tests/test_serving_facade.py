"""SQL-over-TCP serving façade: SqlResults-style responses (qid echo, row
count, schema strings, ZSTD Arrow IPC payload), concurrent clients, and
errors surfaced rather than swallowed."""

from concurrent.futures import ThreadPoolExecutor

from polars_lake_spark import Engine
from polars_lake_spark.serving import SqlServer, query
from polars_lake_spark.sources import load_table


def test_sql_server_roundtrip(spark, sf_dir):
    engine = Engine(spark, None)
    engine.create_table(
        "li", load_table(spark, sf_dir, "lineitem"), keys=["l_orderkey"], save=False
    )
    server = SqlServer(engine).start()
    host, port = server.address
    try:
        header, table = query(
            host, port, "SELECT l_returnflag, COUNT(*) AS n FROM li GROUP BY 1", qid=7
        )
        assert header["qid"] == 7
        assert header["rows"] == 3 and table.num_rows == 3
        assert sorted(header["columns"]) == ["l_returnflag", "n"]

        # concurrent clients (reference's 20-thread pool, call.py:73-79)
        def point(k):
            h, t = query(
                host, port, f"SELECT COUNT(*) AS n FROM li WHERE l_suppkey = {k}", qid=k
            )
            assert h["qid"] == k
            return t.column("n")[0].as_py()

        with ThreadPoolExecutor(max_workers=8) as pool:
            counts = list(pool.map(point, range(1, 9)))
        assert sum(counts) > 0

        # errors surfaced, not swallowed (unlike server.rs:299)
        header, table = query(host, port, "SELECT broken FROM nowhere", qid=99)
        assert "error" in header and header["qid"] == 99 and table is None

        # invalid JSON must return an error response, not kill the connection
        import json as _json
        import socket as _socket
        import struct as _struct

        with _socket.create_connection((host, port), timeout=30) as s:
            s.sendall(b"this is not json\n")
            f = s.makefile("rb")
            (hlen,) = _struct.unpack(">I", f.read(4))
            h = _json.loads(f.read(hlen))
            assert "error" in h and h["qid"] is None
    finally:
        server.stop()


def test_sql_server_single_execution(spark, sf_dir):
    """The facade must run each query exactly once: rows come from the
    materialized Arrow table, never a second df.count() job."""
    engine = Engine(spark, None)
    engine.create_table(
        "li1", load_table(spark, sf_dir, "lineitem"), keys=["l_orderkey"], save=False
    )

    class NoCountEngine:
        def __init__(self, e):
            self._e = e

        def sql(self, q):
            df = self._e.sql(q)

            def _boom(*a, **k):
                raise AssertionError("serving re-executed the query via count()")

            df.count = _boom  # instance attr shadows the method
            return df

    server = SqlServer(NoCountEngine(engine)).start()
    host, port = server.address
    try:
        header, table = query(
            host, port, "SELECT l_returnflag, COUNT(*) AS n FROM li1 GROUP BY 1", qid=1
        )
        assert "error" not in header
        assert header["rows"] == table.num_rows == 3
    finally:
        server.stop()


def test_rpc_ingest_lifecycle(spark, sf_dir):
    """The reference's six RPCs (proto/db.proto:20-35) as one lifecycle:
    chunk-streamed create/insert/upsert, materialize, table_info, select."""
    import pyspark.sql.functions as F

    from polars_lake_spark.serving import rpc
    from polars_lake_spark.sources.ipc import ipc_chunks

    engine = Engine(spark, None)
    server = SqlServer(engine).start()
    host, port = server.address
    try:
        orders = load_table(spark, sf_dir, "orders").limit(100)
        chunks = list(ipc_chunks(orders, rows_per_chunk=30))
        assert len(chunks) >= 3  # genuinely streamed in several chunks

        h, _ = rpc(host, port, {"op": "create_table", "table": "o_rpc",
                                "keys": ["o_orderkey"], "qid": 1}, chunks)
        assert h.get("ok") and h["qid"] == 1

        h, _ = rpc(host, port, {"op": "table_info", "table": "o_rpc", "qid": 2})
        assert h["info"]["rows"] == 100

        batch = orders.limit(5).withColumn("o_totalprice", F.lit(1.0))
        h, _ = rpc(host, port, {"op": "upsert", "table": "o_rpc", "qid": 3},
                   list(ipc_chunks(batch)))
        assert h.get("ok")
        _, t = query(host, port,
                     "SELECT COUNT(*) AS n FROM o_rpc WHERE o_totalprice = 1.0", qid=4)
        assert t.column("n")[0].as_py() == 5

        h, _ = rpc(host, port, {"op": "materialize", "table": "o_rpc", "qid": 5})
        assert h.get("ok")

        h, _ = rpc(host, port, {"op": "insert", "table": "o_rpc", "qid": 6},
                   list(ipc_chunks(orders.limit(3))))
        assert h.get("ok")
        h, _ = rpc(host, port, {"op": "table_info", "table": "o_rpc", "qid": 7})
        assert h["info"]["rows"] == 103

        # unknown op and chunkless ingest surface errors
        h, _ = rpc(host, port, {"op": "nope", "qid": 8})
        assert "error" in h and h["qid"] == 8
        h, _ = rpc(host, port, {"op": "insert", "table": "o_rpc", "qid": 9}, [])
        assert "error" in h
    finally:
        server.stop()


def test_sql_server_dml_over_the_wire(spark, sf_dir):
    """DELETE arrives as a SQL statement over the socket, routes through
    the engine's row-exact mutation path, and answers with the status
    frame; the follow-up SELECT sees the mutation."""
    engine = Engine(spark, None)
    engine.create_table(
        "li2", load_table(spark, sf_dir, "lineitem"), keys=["l_orderkey"], save=False
    )
    before = engine.table("li2").count()
    doomed = engine.table("li2").filter("l_suppkey = 5").count()
    server = SqlServer(engine).start()
    host, port = server.address
    try:
        h, t = query(host, port, "DELETE FROM li2 WHERE l_suppkey = 5", qid=41)
        assert h["qid"] == 41 and h.get("error") is None
        assert t.to_pydict()["n_affected"] == [doomed]
        h2, t2 = query(host, port, "SELECT count(*) AS n FROM li2", qid=42)
        assert t2.to_pydict()["n"] == [before - doomed]
    finally:
        server.stop()
