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


def test_stream_apply_changes(spark, tmp_path):
    """APPLY CHANGES INTO analog: a CDC stream with op + sequence
    columns applies per batch — latest-per-key wins (a delete followed
    by a reinsert in the same batch lands as the reinsert), upserts
    merge on keys, deletes remove every matching row (DV sidecar on DV
    tables)."""
    from polars_lake_spark import Engine
    from polars_lake_spark.streaming.ingest import stream_apply_changes

    eng = Engine(spark, str(tmp_path / "a"))
    seed = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id bigint, s string"
    )
    eng.create_table(
        "tgt", seed, keys=["id"], versioned=True, deletion_vectors=True
    )
    changes = spark.createDataFrame(
        [
            (1, None, "delete", 100),        # plain delete
            (2, "v2-new", "update", 101),    # update
            (20, "v20", "insert", 102),      # insert
            (3, None, "delete", 103),        # delete...
            (3, "v3-back", "upsert", 104),   # ...then reinsert (later seq)
            (4, "v4-stale", "update", 105),  # stale update...
            (4, None, "delete", 106),        # ...then delete (later seq)
        ],
        "id bigint, s string, _op string, seq bigint",
    )
    staging = str(tmp_path / "cdc_stream")
    changes.repartition(2).write.parquet(staging)
    stream = spark.readStream.schema(changes.schema).parquet(staging)
    q = stream_apply_changes(
        eng, "tgt", stream, sequence_by="seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {r.id: r.s for r in eng.table("tgt").collect()}
    assert 1 not in got and 4 not in got          # deleted
    assert got[2] == "v2-new"                     # updated
    assert got[20] == "v20"                       # inserted
    assert got[3] == "v3-back"                    # delete then reinsert
    assert len(got) == 9  # 10 - 2 deleted + 1 inserted
    # ambiguous same-key delete+upsert without sequence_by raises
    amb = spark.createDataFrame(
        [(5, None, "delete"), (5, "x", "upsert")],
        "id bigint, s string, _op string",
    )
    st2 = str(tmp_path / "amb")
    amb.write.parquet(st2)
    stream2 = spark.readStream.schema(amb.schema).parquet(st2)
    import pytest as _pt

    q2 = stream_apply_changes(
        eng, "tgt", stream2, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    with _pt.raises(Exception, match="sequence_by"):
        q2.awaitTermination(120)
    # the failed batch applied nothing: key 5 keeps its seed value
    assert eng.table("tgt").filter("id = 5").head().s == "v5"
