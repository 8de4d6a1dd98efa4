"""Streaming ingest: micro-batch buffer semantics + Structured Streaming
foreachBatch → upsert on the events fixture (SURVEY.md §2.e / M5)."""

import pyspark.sql.functions as F

from polars_lake_spark import Engine
from polars_lake_spark.sources import load_table
from polars_lake_spark.streaming import MicroBatchIngestor, stream_upsert


def test_micro_batch_ingestor_threshold(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    engine = Engine(spark, str(tmp_path / "store"))
    engine.create_table("ev", events.filter(F.col("event_id") < 100), keys=["event_id"])

    ing = MicroBatchIngestor(engine, "ev", flush_rows=150, mode="upsert")
    ing.add(events.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200)))
    # 100 rows buffered < 150: not flushed yet
    assert engine.table("ev").count() == 100
    ing.add(events.filter((F.col("event_id") >= 200) & (F.col("event_id") < 300)))
    # 200 rows ≥ 150: auto-flush happened
    assert engine.table("ev").count() == 300
    ing.flush()  # idempotent on empty buffer
    assert engine.table("ev").count() == 300


def test_stream_upsert_foreach_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    total = events.count()
    engine = Engine(spark, str(tmp_path / "store"))
    # seed with first 100 events, values nulled — stream must fill them in
    seed = events.filter(F.col("event_id") < 100).withColumn(
        "value", F.lit(None).cast("double")
    )
    engine.create_table("ev", seed, keys=["event_id"])

    staging = str(tmp_path / "staging")
    events.repartition(3).write.parquet(staging)

    stream = spark.readStream.schema(events.schema).parquet(staging)
    q = stream_upsert(
        engine, "ev", stream, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    got = engine.table("ev")
    assert got.count() == total  # every event upserted exactly once
    # seeded NULL values were filled by the stream (coalesce(new, old))
    assert got.filter(F.col("value").isNull()).count() == 0
