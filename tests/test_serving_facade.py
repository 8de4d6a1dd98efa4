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
    finally:
        server.stop()
