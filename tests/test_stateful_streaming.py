"""Custom stateful operator (applyInPandasWithState) + streaming dedup
within watermark — state persists across micro-batches."""

import pyspark.sql.functions as F

from polars_lake_spark.sources import load_table
from polars_lake_spark.streaming.stateful import running_user_stats


def test_running_user_stats_across_micro_batches(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staging = str(tmp_path / "staging")
    events.repartition(4).write.parquet(staging)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .parquet(staging)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # last update per user == full-batch aggregate (state accumulated
    # correctly across micro-batches)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM user_stats) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n, r.total)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert got == want


def test_drop_duplicates_within_watermark_stream(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    total = events.count()
    # duplicate every event, stage both copies
    doubled = events.unionByName(events)
    staging = str(tmp_path / "staging")
    doubled.repartition(4).write.parquet(staging)

    stream = (
        spark.readStream.schema(doubled.schema)
        .parquet(staging)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert spark.sql("SELECT COUNT(*) AS n FROM deduped").collect()[0].n == total
