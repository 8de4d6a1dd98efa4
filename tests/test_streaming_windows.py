"""Watermarked event-time windows under Structured Streaming: the same
window expressions as the batch queries (queries/windows_ext.py), run via
readStream with a watermark — the late-data machinery the reference lacks
entirely (SURVEY §2.e)."""

import pyspark.sql.functions as F

from polars_lake_spark.sources import load_table


def test_watermarked_tumbling_window_stream(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staging = str(tmp_path / "staging")
    events.repartition(4).write.parquet(staging)

    stream = (
        spark.readStream.schema(events.schema)
        .parquet(staging)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # watermark needs LTZ
    )
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM win_agg")
    want = (
        events.withColumn("ts", F.col("ts").cast("timestamp")).groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(got) == canon(want)


def test_session_window_stream(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staging = str(tmp_path / "staging")
    events.repartition(2).write.parquet(staging)

    stream = (
        spark.readStream.schema(events.schema)
        .parquet(staging)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sessions = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_total = spark.sql("SELECT SUM(n_events) AS n FROM sess_agg").collect()[0].n
    assert got_total == events.count()  # every event in exactly one session
