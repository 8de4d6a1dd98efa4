"""End-to-end streaming corpus curation: a document stream is
deduplicated (streaming dropDuplicates on the content fingerprint),
quality-filtered, token-accounted, and merged into a VERSIONED table —
the streaming counterpart of the batch corpus_pipeline query, proving the
curation operators compose under the micro-batch execution model.
"""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark import Engine
from polars_lake_spark.functions import text as TX
from polars_lake_spark.sources import load_table
from polars_lake_spark.streaming import stream_upsert


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def _curate(df):
    """The shared curation transform — identical expressions run in the
    batch oracle and under readStream (the point of the test)."""
    out = df.select(
        "doc_id",
        "lang",
        TX.fingerprint_md5(F.col("text")).alias("fingerprint"),
        TX.word_count(F.col("text")).alias("n_words"),
        TX.ws_token_count(F.col("text")).alias("n_tokens"),
    )
    return out.filter(F.col("n_words") >= 5)


def test_streaming_curation_pipeline(engine, spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")

    # seed the versioned target with an empty slice so the stream merges
    # into a snapshot table from batch one
    curated = _curate(docs)
    engine.create_table(
        "corpus",
        curated.limit(0),
        keys=["doc_id"],
        versioned=True,
    )

    staging = str(tmp_path / "doc_stream")
    docs.repartition(4).write.parquet(staging)
    stream = spark.readStream.schema(docs.schema).parquet(staging)

    piped = _curate(stream).dropDuplicates(["fingerprint"])
    q = stream_upsert(
        engine,
        "corpus",
        piped,
        keys=["doc_id"],
        checkpoint_dir=str(tmp_path / "ckpt_curate"),
    )
    q.awaitTermination(180)

    got = engine.table("corpus")
    # batch expectation: same filter, duplicates collapse to one survivor
    # (streaming picks an arbitrary one, so compare fingerprint sets)
    expect = _curate(docs)
    exp_fps = {r.fingerprint for r in expect.select("fingerprint").distinct().collect()}
    got_rows = got.collect()
    assert {r.fingerprint for r in got_rows} == exp_fps
    assert len(got_rows) == len(exp_fps)  # exactly one row per fingerprint
    # quality gate held everywhere
    assert all(r.n_words >= 5 for r in got_rows)
    # every micro-batch committed one time-travelable snapshot
    hist = engine.history("corpus")
    assert hist[0]["op"] == "create"
    assert len(hist) >= 2
    assert engine.table("corpus", version=1).count() == 0
