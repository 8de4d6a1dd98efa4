"""Concurrent writers serialize per table (the reference used a per-part
Mutex, /root/reference/src/dataset.rs:84-86; we lock per table)."""

from concurrent.futures import ThreadPoolExecutor

from polars_lake_spark import Engine


def test_concurrent_upserts_serialize(spark, tmp_path):
    base = spark.createDataFrame([(i, 0) for i in range(50)], "k int, v int")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("t", base, keys=["k"])

    def upsert_one(i: int):
        batch = spark.createDataFrame([(i, i * 10)], "k int, v int")
        engine.upsert("t", batch)
        return i

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(upsert_one, range(8)))

    got = {r.k: r.v for r in engine.table("t").collect()}
    assert len(got) == 50
    for i in range(8):
        assert got[i] == i * 10  # no lost update
    assert all(got[i] == 0 for i in range(8, 50))
