"""Event-time window queries over the events fixture — the batch shapes of
the Structured Streaming extensions SURVEY §2.e anticipates (tumbling,
sliding, session windows).  The same expressions run under readStream with
a watermark (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_lake_spark.queries import register
from polars_lake_spark.sources import load_table


@register(
    "events_tumbling_window",
    oracle="""
    SELECT to_timestamp(floor(epoch(ts) / 900) * 900)::TIMESTAMP AS win_start,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def events_tumbling_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "15 minutes")
    return e.groupBy(w.alias("w")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    ).select(
        F.col("w.start").cast("timestamp_ntz").alias("win_start"), "n", "total"
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT unnest([
                   to_timestamp(floor(epoch(ts) / 1800) * 1800),
                   to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)
               ])::TIMESTAMP AS win_start,
               value
        FROM events
    )
    SELECT win_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM slid GROUP BY win_start
    """,
)
def events_sliding_window(spark, sf_dir):
    """1-hour windows sliding every 30 minutes — each event lands in two
    windows; the oracle materializes the two aligned starts explicitly."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"), "n", "total")
    )


@register(
    "events_session_window",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM seq
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, new_session DESC
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_session_window(spark, sf_dir):
    """F.session_window (30-minute gap): a new session starts when the gap
    reaches the timeout — i.e. an event at exactly last+gap falls outside
    [start, last+gap). The oracle replays that rule with lag/cumsum."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(to_timestamp(floor(epoch(ts) / 604800) * 604800) AS DATE)
                   AS week
        FROM events
    ),
    firsts AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, week FROM e)
    SELECT cohort_week,
           CAST(DATEDIFF('day', cohort_week, week) / 7 AS INT) AS week_offset,
           COUNT(*) AS active_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-seen epoch-aligned week ×
    weeks-since-cohort activity counts — the standard product-analytics
    triangle.  Two grouped aggregates sharing the user_id shuffle key;
    week bucketing is pure epoch arithmetic so both engines align
    identically (no calendar-week locale divergence)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(
            F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 604800) * 604800)
        ).alias("week"),
    )
    firsts = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = e.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH e AS (SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS h, value
               FROM events WHERE user_id < 20),
    hourly AS (SELECT user_id, h, COUNT(*) AS n_events,
                      ROUND(SUM(value), 2) AS v
               FROM e GROUP BY 1, 2),
    spans AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
             FROM spans)
    SELECT user_id, h AS hour,
           COALESCE(n_events, 0) AS n_events,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM grid LEFT JOIN hourly USING (user_id, h)
    """,
)
def events_gap_fill(spark, sf_dir):
    """Time-series resample + gap fill: a dense hourly grid per user
    (sequence over each user's observed span) left-joined to observed
    hours, missing hours forward-filled with the last hourly total.
    The grid explode is map-side off a tiny per-user span table; the
    fill is one window over the user shuffle key — the standard
    upsample-then-LOCF plan. Output is bounded by users x span-hours,
    independent of event count."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("v"),
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
        .select(
            "user_id",
            F.col("h").alias("hour"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "v_filled",
        )
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts > t1
            AND ts <= t1 + INTERVAL 12 HOUR GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts > t2
            AND ts <= t2 + INTERVAL 12 HOUR GROUP BY e.user_id)
    SELECT 'step1_view' AS step, COUNT(*) AS users FROM v
    UNION ALL SELECT 'step2_click', COUNT(*) FROM c
    UNION ALL SELECT 'step3_purchase', COUNT(*) FROM p
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered funnel conversion (product analytics): users reaching
    view -> click -> purchase where each step strictly follows the
    previous step's timestamp within a 12-hour conversion window. Three scans each pruned to one event
    type at the source (PushedFilters), all joins and aggregates share
    the user_id shuffle key — the chain adds steps, not shuffle width."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 12 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 12 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def _count(df, label):
        return df.agg(
            F.lit(label).alias("step"), F.count(F.lit(1)).alias("users")
        )
    return (
        _count(v, "step1_view")
        .union(_count(c, "step2_click"))
        .union(_count(p, "step3_purchase"))
    )


@register(
    "events_ewma",
    oracle="""
    WITH t AS (SELECT user_id, event_id, value,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events WHERE user_id < 200),
    w AS (SELECT user_id, event_id, rn,
                 list(value) OVER (PARTITION BY user_id ORDER BY rn
                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
          FROM t)
    SELECT user_id, event_id,
           ROUND(list_reduce(vals, (acc, v) -> acc * 0.8 + 0.2 * v), 6)
               AS ewma
    FROM w
    """,
)
def events_ewma(spark, sf_dir):
    """Per-user exponentially weighted moving average (alpha=0.2) over a
    truncated 20-event lookback — the recursive definition computed as a
    LEFT FOLD over the frame's values, so the float operation ORDER is
    pinned and DuckDB's list_reduce replays it bit-for-bit.

    Scale shape: one shuffle on user_id; the frame array is bounded (20
    doubles), so memory per row is constant — unlike carrying unbounded
    history, and unlike the pow((1-a), -rn) rebasing trick, which
    overflows on long sequences. The array is built with sort_array over
    (rn, value) structs rather than trusting collect_list's frame order."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    rn_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id", "event_id", F.col("value").cast("double").alias("value"),
        F.row_number().over(rn_w).alias("rn"),
    )
    frame = (
        Window.partitionBy("user_id").orderBy("rn").rowsBetween(-19, 0)
    )
    vals = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("rn"), F.col("value"))).over(frame)
        ),
        lambda s: s["value"],
    )
    t = t.withColumn("vals", vals)
    ewma = F.aggregate(
        F.slice(F.col("vals"), F.lit(2), F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, v: acc * F.lit(0.8) + F.lit(0.2) * v,
    )
    return t.select("user_id", "event_id", F.round(ewma, 6).alias("ewma"))


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH t AS (SELECT user_id, event_id, value,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events WHERE user_id < 200),
    w AS (SELECT user_id, event_id, value,
                 AVG(value) OVER fr AS mu,
                 STDDEV_SAMP(value) OVER fr AS sigma,
                 COUNT(*) OVER fr AS n
          FROM t
          WINDOW fr AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           CASE WHEN n >= 5 AND sigma > 0.001
                THEN ROUND((value - mu) / sigma, 4) END AS z
    FROM w
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Trailing z-score anomaly signal: each event scored against its
    user's own last-20-events distribution (NULL until 5 observations or
    when the window is flat — the classic cold-start/zero-variance
    guards). Shares the single user_id shuffle with every other per-user
    window; constant memory per row."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    rn_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id", "event_id", F.col("value").cast("double").alias("value"),
        F.row_number().over(rn_w).alias("rn"),
    )
    fr = Window.partitionBy("user_id").orderBy("rn").rowsBetween(-19, 0)
    t = t.select(
        "user_id", "event_id", "value",
        F.avg("value").over(fr).alias("mu"),
        F.stddev_samp("value").over(fr).alias("sigma"),
        F.count(F.lit(1)).over(fr).alias("n"),
    )
    z = F.when(
        (F.col("n") >= 5) & (F.col("sigma") > 0.001),
        F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4),
    )
    return t.select("user_id", "event_id", z.alias("z"))
