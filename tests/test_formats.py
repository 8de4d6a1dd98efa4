"""Storage formats (parquet/csv/json — SURVEY §2.a 'declared, never
implemented' row done for real) + Arrow IPC wire helpers + partition
hygiene on delete."""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark import Engine
from polars_lake_spark.sources import load_table
from polars_lake_spark.sources.ipc import (
    dataframe_from_ipc,
    dataframe_to_ipc,
    ipc_chunks,
)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    nation = load_table(spark, sf_dir, "nation")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("nation", nation, partition_by=["n_regionkey"], format=fmt)
    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    got = e2.table("nation")
    assert got.count() == nation.count()
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    have = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in got.collect()}
    assert want == have
    assert dict(got.dtypes)["n_nationkey"] == "int"  # schema pinned, not inferred


@pytest.mark.parametrize("codec", ["snappy", "lz4_raw", "zstd"])
def test_compression_codec_roundtrip(spark, sf_dir, tmp_path, codec):
    """create_table(compression=...) picks the parquet codec per table —
    parity with the reference's Snappy|Lz4Raw choice
    (``/root/reference/src/storage.rs:12-21``) plus zstd.  'lz4_raw' is
    the standard interoperable LZ4 (what the reference's Lz4Raw writes);
    Spark's bare 'lz4' is the legacy Hadoop framing."""
    import glob
    import os

    import pyarrow.parquet as pq

    nation = load_table(spark, sf_dir, "nation")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("nation", nation, compression=codec)
    # data roundtrips
    got = engine.table("nation")
    assert got.count() == nation.count()
    # manifest persists the codec
    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    assert e2.specs["nation"].compression == codec
    # the files really use the codec (read one footer)
    f = glob.glob(os.path.join(str(tmp_path), "nation", "*.parquet"))[0]
    meta = pq.ParquetFile(f).metadata
    codecs = {
        meta.row_group(rg).column(c).compression.lower()
        for rg in range(meta.num_row_groups)
        for c in range(meta.num_columns)
    }
    expected = {"snappy": {"snappy"}, "lz4_raw": {"lz4", "lz4_raw"}, "zstd": {"zstd"}}
    assert codecs <= expected[codec], codecs


def test_ipc_roundtrip(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    data = dataframe_to_ipc(sup)  # zstd-compressed, like the reference
    back = dataframe_from_ipc(spark, data)
    assert back.count() == sup.count()
    assert {r.s_suppkey for r in back.collect()} == {
        r.s_suppkey for r in sup.collect()
    }


def test_ipc_chunking(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    chunks = list(ipc_chunks(li, rows_per_chunk=1000))
    assert len(chunks) >= 2
    total = sum(dataframe_from_ipc(spark, c).count() for c in chunks)
    assert total == li.count()


def test_delete_removes_emptied_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k int, p string, v int"
    )
    engine = Engine(spark, str(tmp_path))
    engine.create_table("t", df, partition_by=["p"], keys=["k"])
    # delete every row of partition p=b
    engine.delete("t", spark.createDataFrame([(3,)], "k int"))
    got = engine.table("t")
    assert got.count() == 2
    assert got.filter(F.col("p") == "b").count() == 0


def test_ipc_table_format_roundtrip(spark, sf_dir, tmp_path):
    """format='ipc': distributed mapInArrow sink/source (one .arrow file
    per task), engine roundtrip incl. append + reload-from-manifest."""
    orders = load_table(spark, sf_dir, "orders")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("o_ipc", orders, format="ipc")
    got = engine.table("o_ipc")
    assert got.count() == orders.count()
    assert dict(got.dtypes) == dict(orders.dtypes)  # schema from footer
    total = F.round(F.sum("o_totalprice"), 2)
    assert (
        got.agg(total).collect()[0][0] == orders.agg(total).collect()[0][0]
    )

    # append via insert writes more .arrow files, no clobber
    engine.insert("o_ipc", orders.limit(7))
    assert engine.table("o_ipc").count() == orders.count() + 7

    # reload from manifest in a fresh engine
    e2 = Engine(spark, str(tmp_path))
    e2.load_all()
    assert e2.table("o_ipc").count() == orders.count() + 7

    # partitioned ipc is refused (parquet is the layout tier)
    with pytest.raises(ValueError, match="ipc"):
        engine.create_table("bad", orders, partition_by=["o_orderpriority"], format="ipc")


def test_bloom_filter_cols_roundtrip(spark, sf_dir, tmp_path):
    """create_table(bloom_filter_cols=...): parquet bloom filters land in
    the files (verified by byte growth on identical data), persist in the
    manifest, and apply to subsequent writes; reads are unchanged."""
    import glob
    import os

    orders = load_table(spark, sf_dir, "orders").coalesce(1)

    e1 = Engine(spark, str(tmp_path / "plain"))
    e1.create_table("o", orders, keys=["o_orderkey"])
    e2 = Engine(spark, str(tmp_path / "bloomed"))
    e2.create_table(
        "o", orders, keys=["o_orderkey"], bloom_filter_cols=["o_custkey"]
    )

    def total_bytes(root):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(root, "o", "**", "*.parquet"), recursive=True)
        )

    plain, bloomed = total_bytes(str(tmp_path / "plain")), total_bytes(
        str(tmp_path / "bloomed")
    )
    assert bloomed > plain, (plain, bloomed)  # the filter bytes are real

    # identical data either way
    assert e2.table("o").count() == orders.count()
    got = e2.sql("SELECT COUNT(*) c FROM o WHERE o_custkey = 371").first().c
    want = orders.filter(F.col("o_custkey") == 371).count()
    assert got == want

    # manifest roundtrip: a fresh engine keeps writing bloom filters,
    # with the create-time MEASURED ndv sizing preserved
    e3 = Engine(spark, str(tmp_path / "bloomed"))
    e3.load_all()
    assert list(e3.specs["o"].bloom_filter_cols) == ["o_custkey"]
    assert e3.specs["o"].bloom_filter_cols["o_custkey"] >= 100_000

    # validation: unknown columns and non-parquet formats are rejected
    with pytest.raises(ValueError, match="not in schema"):
        e3.create_table("bad_b1", orders, bloom_filter_cols=["o_custkye"])
    with pytest.raises(ValueError, match="parquet"):
        e3.create_table(
            "bad_b2", orders, format="csv", bloom_filter_cols=["o_custkey"]
        )

    # explicit {col: ndv} sizing is taken verbatim
    e3.create_table(
        "o_sized", orders, bloom_filter_cols={"o_custkey": 5_000_000}
    )
    assert e3.specs["o_sized"].bloom_filter_cols == {"o_custkey": 5_000_000}

    # deep clones carry the setting (same contract as constraints)
    e4 = Engine(spark, str(tmp_path / "cl"))
    e4.create_table(
        "vb", orders, keys=["o_orderkey"], versioned=True,
        bloom_filter_cols=["o_custkey"],
    )
    e4.clone("vb", "vb_deep", shallow=False)
    assert e4.specs["vb_deep"].bloom_filter_cols == e4.specs["vb"].bloom_filter_cols
    e4.clone("vb", "vb_shallow")
    assert e4.specs["vb_shallow"].bloom_filter_cols == e4.specs["vb"].bloom_filter_cols
    # and the containers are independent (spec-isolation invariant)
    assert (
        e4.specs["vb_shallow"].bloom_filter_cols
        is not e4.specs["vb"].bloom_filter_cols
    )


def test_ingest_ipc_routed_by_schema_metadata(spark, tmp_path):
    """The producer stamps the target table into the Arrow schema
    metadata; the engine routes the batch (create, then keyed upsert) —
    the reference's producer.py workflow, which its server ignored."""
    import pyarrow as pa

    from polars_lake_spark import Engine
    from polars_lake_spark.sources.ipc import arrow_table_to_ipc, ingest_ipc_routed

    eng = Engine(spark, str(tmp_path))
    t1 = pa.table({"k": [1, 2], "v": [10.0, 20.0]})
    t1 = t1.replace_schema_metadata({"table": "routed", "keys": "k"})
    r1 = ingest_ipc_routed(eng, arrow_table_to_ipc(t1))
    assert r1 == {"table": "routed", "rows": 2, "op": "created"}

    t2 = pa.table({"k": [2, 3], "v": [99.0, 30.0]})
    t2 = t2.replace_schema_metadata({"table": "routed", "keys": "k"})
    r2 = ingest_ipc_routed(eng, arrow_table_to_ipc(t2))
    assert r2["op"] == "upserted"
    rows = {r.k: r.v for r in eng.table("routed").collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0}

    import pytest

    bad = pa.table({"x": [1]})
    with pytest.raises(ValueError, match="no 'table' key"):
        ingest_ipc_routed(eng, arrow_table_to_ipc(bad))

    # A producer may address a namespaced table by its VIEW-KEY spelling
    # (schema__table); routing must resolve it to the spec name before
    # upserting (the unresolved key used to KeyError in _guard_mutable).
    eng.create_table(
        "sales.routed2",
        spark.createDataFrame([(1, 1.0)], "k int, v double"),
        keys=["k"],
    )
    t3 = pa.table({"k": [1, 2], "v": [5.0, 6.0]})
    t3 = t3.replace_schema_metadata({"table": "sales__routed2", "keys": "k"})
    r3 = ingest_ipc_routed(eng, arrow_table_to_ipc(t3))
    assert r3 == {"table": "sales.routed2", "rows": 2, "op": "upserted"}
    rows3 = {r.k: r.v for r in eng.table("sales.routed2").collect()}
    assert rows3 == {1: 5.0, 2: 6.0}
