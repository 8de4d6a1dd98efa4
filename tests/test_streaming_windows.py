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


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Watermarked stream-stream inner join: purchases attributed to the
    click by the same user within the preceding 10 minutes — both sides
    are unbounded streams, so Spark buffers state bounded by the
    watermark + interval condition (the §2.e capability class above
    foreachBatch merges)."""
    events = load_table(spark, sf_dir, "events")
    clicks_dir, buys_dir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks_b = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").cast("timestamp").alias("click_ts")
    )
    buys_b = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("timestamp").alias("buy_ts"), "value"
    )
    clicks_b.repartition(2).write.parquet(clicks_dir)
    buys_b.repartition(2).write.parquet(buys_dir)

    clicks = (
        spark.readStream.schema(spark.read.parquet(clicks_dir).schema)
        .parquet(clicks_dir)
        .withWatermark("click_ts", "1 hour")
    )
    buys = (
        spark.readStream.schema(spark.read.parquet(buys_dir).schema)
        .parquet(buys_dir)
        .withWatermark("buy_ts", "1 hour")
    )
    cond = (
        (clicks.user_id == buys.user_id)
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    joined = clicks.join(buys, cond).select(
        clicks.user_id, "click_ts", "buy_ts", "value"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT user_id, count(*) AS n, round(sum(value), 2) AS total "
        "FROM attributed GROUP BY user_id"
    )
    want = (
        clicks_b.join(
            buys_b.withColumnRenamed("user_id", "b_user"),
            (F.col("user_id") == F.col("b_user"))
            & (F.col("buy_ts") >= F.col("click_ts"))
            & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(got) == canon(want)
    assert got.count() > 0
