"""End-to-end streaming MEDIA curation: a stream of binary media blobs
(complete PNGs and WAVs) is feature-extracted with the real codecs under
the micro-batch execution model and merged into a VERSIONED table — the
multimodal counterpart of test_streaming_curation, proving the codec
mapInPandas stages compose with readStream/foreachBatch.
"""

import pyspark.sql.functions as F
import pytest

from polars_lake_spark import Engine
from polars_lake_spark.operators.multimodal import (
    decode_images_real,
    synthesize_pixel_pngs,
)
from polars_lake_spark.sources import load_table
from polars_lake_spark.streaming import stream_upsert


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path))


def test_streaming_media_feature_extraction(engine, spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    pngs = synthesize_pixel_pngs(docs)

    # batch expectation: decode features for every blob
    expect = {
        r.doc_id: (r.width, r.height, r.channels, r.mean_intensity)
        for r in decode_images_real(pngs).collect()
    }

    # media lands as parquet (binary column) and is consumed as a stream
    staging = str(tmp_path / "media_stream")
    pngs.repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(pngs.schema).parquet(staging)

    # seed the versioned target with an empty BATCH slice (streaming
    # frames can't batch-write), then merge the stream into it
    engine.create_table(
        "media_features",
        decode_images_real(pngs).limit(0),
        keys=["doc_id"],
        versioned=True,
    )
    feats = decode_images_real(stream)  # the REAL codec under readStream
    q = stream_upsert(
        engine,
        "media_features",
        feats,
        keys=["doc_id"],
        checkpoint_dir=str(tmp_path / "ckpt_media"),
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.width, r.height, r.channels, r.mean_intensity)
        for r in engine.table("media_features").collect()
    }
    assert got == expect  # pixel-exact features through the stream path
    # snapshot-per-micro-batch held
    hist = engine.history("media_features")
    assert hist[0]["op"] == "create" and len(hist) >= 2
