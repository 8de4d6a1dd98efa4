"""Property-based checks of split_assign / shard_assign against direct
Python md5 models (the determinism contract is exactly 'any engine that
can md5 gets the same assignment'), plus a streaming-compose test:
the split + quality-weighted sampling stages run under readStream /
foreachBatch and must land the same rows the batch plan selects."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_lake_spark.operators import splits as SP
from polars_lake_spark.operators.sampling import weighted_hash_sample

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts_st = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20
    ),
    min_size=1,
    max_size=30,
    unique=True,
)


def _bucket(content: str, modulus: int) -> int:
    return int(hashlib.md5(content.encode()).hexdigest()[:8], 16) % modulus


@pytest.mark.usefixtures("spark")
@given(texts=texts_st)
@settings(**_SETTINGS)
def test_split_assign_matches_md5_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["id", "t"])
    got = {r["id"]: r["split"]
           for r in SP.split_assign(df, "t").select("id", "split").collect()}
    for i, t in enumerate(texts):
        b = _bucket(t, 100)
        want = "train" if b < 96 else ("val" if b < 98 else "test")
        assert got[i] == want, (t, b)


@pytest.mark.usefixtures("spark")
@given(ids=st.lists(st.integers(min_value=0, max_value=10**6),
                    min_size=1, max_size=40, unique=True),
       shards=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_shard_assign_matches_md5_model(spark, ids, shards):
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {r["id"]: (r["shard_id"], r["pos"])
           for r in SP.shard_assign(df, "id", shards, seed="pz").collect()}
    # model: shard by md5 bucket; pos by (md5 hex, id) sort within shard
    model = {}
    for i in ids:
        h = hashlib.md5(f"pz{i}".encode()).hexdigest()
        model[i] = (_bucket(f"pz{i}", shards) % shards, h)
    by_shard = {}
    for i, (s, h) in model.items():
        by_shard.setdefault(s, []).append((h, i))
    want = {}
    for s, members in by_shard.items():
        for pos, (_, i) in enumerate(sorted(members)):
            want[i] = (s, pos)
    assert got == want


def test_streaming_split_and_sample_match_batch(spark, sf_dir, tmp_path):
    from polars_lake_spark import Engine
    from polars_lake_spark.functions import text as TX
    from polars_lake_spark.sources import load_table
    from polars_lake_spark.streaming import stream_upsert

    engine = Engine(spark, str(tmp_path))
    docs = load_table(spark, sf_dir, "documents").limit(200)

    def curate(df):
        q = TX.quality_score(F.col("text"))
        kept = weighted_hash_sample(df, "text", q)
        return SP.split_assign(kept, "text").select(
            "doc_id", "lang", "split", F.round(q, 4).alias("quality")
        )

    expect = sorted(map(tuple, curate(docs).collect()))

    staging = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(docs.schema).parquet(staging)
    engine.create_table(
        "curated_split", curate(docs).limit(0), keys=["doc_id"], versioned=True
    )
    q = stream_upsert(
        engine, "curated_split", curate(stream), keys=["doc_id"],
        checkpoint_dir=str(tmp_path / "ckpt_split"),
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, engine.table("curated_split")
                 .select("doc_id", "lang", "split", "quality").collect()))
    assert got == expect
