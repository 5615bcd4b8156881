"""Batch-mode equivalents of the streaming jobs (oracle-checkable).

The reference's only streaming-like construct is the epoch micro-batch
loop with retry (``src/database/ycsb/db.h:104-109``,
``TransctionManager.cuh:165-185``). Our engine's streaming surface
(tumbling/sliding/session windows, stateful dedup) is declared here in
batch mode over the static ``events`` table — same transformations the
Structured Streaming jobs in ``streaming.jobs`` apply incrementally —
so the DuckDB oracle can gate the semantics. tests/test_streaming.py
then proves streaming-mode == batch-mode on the same input.

Timestamps are emitted as epoch seconds/microseconds BIGINT: events
carry nanosecond precision that Spark truncates to microseconds
(sources/catalog.py), and integer epochs dodge every tz/precision
representation hazard between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum, dsum_sql
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1h window per event_type (shared by batch + streaming)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp").cast("long").alias("win_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_tumbling_hourly",
    oracle=f"""
    SELECT epoch_ns(ts) // 3600000000000 * 3600 AS win_start_s,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start_s, event_type
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window aggregation (streaming: incremental state per
    window, closed by the watermark; batch: a plain groupBy — identical
    results by construction)."""
    e = load_table(spark, sf_dir, "events")
    return tumbling_hourly(e).orderBy("win_start_s", "event_type")


@register(
    "stream_sliding_2h",
    oracle="""
    SELECT (epoch_ns(ts) // 3600000000000 - i) * 3600 AS win_start_s,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events, range(0, 2) r(i)
    GROUP BY 1
    ORDER BY win_start_s
    """,
)
def stream_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide): every event lands in two
    overlapping windows — Spark's window() expands them natively, the
    oracle via an explicit unnest."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("win.start").cast("timestamp").cast("long").alias("win_start_s"),
            "n_events",
            "n_users",
        )
        .orderBy("win_start_s")
    )


@register(
    "stream_session_windows",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
    marks AS (
        SELECT user_id, t, value,
               CASE WHEN LAG(t) OVER w IS NULL
                         OR t - LAG(t) OVER w >= {GAP_US} THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    sess AS (
        SELECT user_id, t, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks
    )
    SELECT user_id, MIN(t) AS sess_start_us, COUNT(*) AS n_events,
           {dsum_sql('value')} AS sess_value
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, sess_start_us
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via Spark's
    native session_window; the oracle sessionizes classically with
    lag + cumulative sum. A new session starts when the gap is >= 30min
    (Spark's session end = last event + gap, half-open)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sess_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias("sess_start_us"),
            "n_events",
            "sess_value",
        )
        .orderBy("user_id", "sess_start_us")
    )


@register(
    "stream_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id
    FROM (
        SELECT user_id, event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_ns(ts), event_id) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup semantics (keep the first event per key) — the
    deterministic batch statement of streaming dropDuplicates; the
    streaming job keeps per-key state expired by the watermark."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_ns", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
        .orderBy("user_id", "event_type")
    )


@register(
    "stream_hypertable_rollup",
    oracle=f"""
    SELECT epoch_ns(ts) // 86400000000000 * 86400 AS day_s,
           CASE WHEN GROUPING(hour_s) = 0 THEN hour_s END AS hour_s,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value,
           CAST(GROUPING(hour_s) AS BIGINT) AS is_day_total
    FROM (SELECT ts, event_type, value,
                 epoch_ns(ts) // 3600000000000 * 3600 AS hour_s
          FROM events)
    GROUP BY GROUPING SETS (
        (epoch_ns(ts) // 86400000000000 * 86400, hour_s, event_type),
        (epoch_ns(ts) // 86400000000000 * 86400, event_type)
    )
    ORDER BY day_s, is_day_total, hour_s, event_type
    """,
)
def stream_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the same event stream
    rolled up at two time granularities (hour + day) in one pass via
    grouping sets — the materialized-rollup shape a time-series store
    keeps per chunk. In streaming deployment each granularity is a
    watermarked windowed aggregate; batch-mode states both levels
    at once for the oracle."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        F.expr("ts_ns div 86400000000000 * 86400").alias("day_s"),
        F.expr("ts_ns div 3600000000000 * 3600").alias("hour_s"),
        "event_type",
        "value",
    )
    base.createOrReplaceTempView("ht_events")
    return spark.sql(
        """
        SELECT day_s,
               CASE WHEN GROUPING(hour_s) = 0 THEN hour_s END AS hour_s,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value,
               CAST(GROUPING(hour_s) AS BIGINT) AS is_day_total
        FROM ht_events
        GROUP BY GROUPING SETS ((day_s, hour_s, event_type), (day_s, event_type))
        ORDER BY day_s, is_day_total, hour_s, event_type
        """
    )


@register(
    "stream_rate_per_minute",
    oracle=f"""
    SELECT event_type,
           epoch_ns(ts) // 60000000000 * 60 AS minute_s,
           COUNT(*) AS n,
           {dsum_sql('value')} AS v
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    GROUP BY 1, 2
    ORDER BY event_type, minute_s
    """,
)
def stream_rate_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-grained (per-minute) keyed rollup — the shape of a streaming
    metrics pipeline; at scale the groupBy key (type, minute) keeps
    state bounded and AQE coalesces the tiny partitions."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    return (
        e.groupBy(
            "event_type",
            F.expr("ts_ns div 60000000000").alias("_m"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("v"))
        .select(
            "event_type",
            (F.col("_m") * 60).alias("minute_s"),
            "n",
            "v",
        )
        .orderBy("event_type", "minute_s")
    )


@register(
    "stream_join_view_click",
    oracle="""
    WITH pairs AS (
        SELECT v.user_id,
               (epoch_ns(c.ts) - epoch_ns(v.ts)) // 1000 AS gap_us
        FROM events v JOIN events c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND epoch_ns(c.ts) >= epoch_ns(v.ts)
         AND epoch_ns(c.ts) <= epoch_ns(v.ts) + 3600000000000
    )
    SELECT user_id, COUNT(*) AS n_pairs,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
    FROM pairs GROUP BY user_id ORDER BY user_id
    """,
)
def stream_join_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of the stream-stream interval join
    (streaming.jobs.view_click_join_stream): (view, click) pairs by the
    same user with the click within 1h after the view, rolled up per
    user. In streaming the same view_click_pairs plan runs with
    watermarks bounding the join state; tests/test_streaming.py proves
    the pair sets identical."""
    from gpu_database_spark.streaming.jobs import split_view_click, view_click_pairs

    e = load_table(spark, sf_dir, "events")
    views, clicks = split_view_click(e)
    return (
        view_click_pairs(views, clicks)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_lateness_histogram",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               epoch_ns(ts) // 1000000000 AS s
        FROM events
    ),
    l AS (
        SELECT event_type,
               GREATEST(COALESCE(
                   MAX(s) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) - s,
                   0), 0) AS late_s
        FROM e
    )
    SELECT event_type,
           CASE WHEN late_s = 0 THEN '0_on_time'
                WHEN late_s <= 60 THEN '1_under_1m'
                WHEN late_s <= 600 THEN '2_under_10m'
                WHEN late_s <= 3600 THEN '3_under_1h'
                ELSE '4_over_1h' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM l GROUP BY event_type, bucket ORDER BY event_type, bucket
    """,
)
def stream_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness census — the watermark-tuning input: for
    each event, lateness = how far its event time sits BEHIND the
    furthest event time already seen in its arrival stream (arrival
    order = event_id, the fixture's generation order; per-user streams
    so the running frontier is the per-key watermark head a stateful
    operator would track). Bucketed into the delay bands an operator
    chooses `withWatermark` horizons from: the histogram answers "what
    fraction of events would a 10-minute watermark drop?" BEFORE
    deploying the streaming job.

    Scale shape: ONE window over (user_id, event_id) — partitioned by
    the high-cardinality user key, never a global ordering — then a
    tiny (type, bucket) rollup; a single shuffle at any SF."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.expr("ts_ns div 1000000000").alias("s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.greatest(
        F.coalesce(F.max("s").over(w) - F.col("s"), F.lit(0)), F.lit(0)
    )
    bucket = (
        F.when(F.col("late_s") == 0, "0_on_time")
        .when(F.col("late_s") <= 60, "1_under_1m")
        .when(F.col("late_s") <= 600, "2_under_10m")
        .when(F.col("late_s") <= 3600, "3_under_1h")
        .otherwise("4_over_1h")
    )
    return (
        e.withColumn("late_s", late)
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "bucket")
    )


@register("stream_soak_census")  # rows-only: true-streaming micro-batch semantics
def stream_soak_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming drop census (VERDICT r7 ask #6): the
    1M-event soak's watermark-drop check, declared as a query so the
    driver exercises the real streaming path (readStream -> watermark
    -> tumbling window -> append-mode parquet sink), not just the batch
    equivalents above.

    Arrival simulation (harness-side by necessity; the computation is
    all distributed): the events fixture is split into 3 chronological
    thirds, arriving one file per availableNow run against a shared
    checkpoint — micro-batch boundaries, and therefore watermark
    advancement, are exactly reproducible. Files 1 and 2 also REPLAY
    the 200 oldest events shifted 10 days earlier: by then the
    watermark (file-0 max - 30 min) is far past them, so Structured
    Streaming must drop all 400. File 2 carries one far-future sentinel
    and a 4th flush file forces the post-sentinel emission batch, so
    every on-time window is closed and appended.

    Returns per-window (ws_s, n_streamed, n_on_time, delta): delta = 0
    everywhere proves BOTH that every on-time row survived and that
    every late replay was dropped. tests/test_streaming.py asserts it.
    """
    import glob as _glob
    import os
    import shutil
    import tempfile

    from gpu_database_spark.functions.materialize import materialize

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    # events.ts is TIMESTAMP_NTZ; the repo idiom for epoch seconds is the
    # ntz -> timestamp -> long cast chain (same conversion everywhere in
    # this query, so the session tz cancels out)
    ts_long = F.col("ts").cast("timestamp").cast("long")
    lo, hi = ev.agg(F.min(ts_long), F.max(ts_long)).first()
    third = (hi - lo + 1) / 3.0

    workdir = tempfile.mkdtemp(prefix="soak_census_")
    src = os.path.join(workdir, "src")
    sink = os.path.join(workdir, "sink")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(src)
    try:
        late = (
            ev.orderBy("ts", "event_id")
            .limit(200)
            .select(
                "event_id",
                (F.col("ts") - F.expr("INTERVAL 240 HOURS")).alias("ts"),
            )
        )
        sentinel = spark.createDataFrame([(int(-1),)], "event_id long").select(
            "event_id",
            F.timestamp_seconds(F.lit(hi + 30 * 86_400))
            .cast("timestamp_ntz")
            .alias("ts"),  # ntz here, ltz at the stage_file boundary
        )
        flush = spark.createDataFrame([(int(-2),)], "event_id long").select(
            "event_id",
            F.timestamp_seconds(F.lit(hi + 60 * 86_400))
            .cast("timestamp_ntz")
            .alias("ts"),
        )

        def stage_file(k: int, df) -> None:
            stage = os.path.join(workdir, f"stage{k}")
            # watermarks require TIMESTAMP (ltz): convert at the source
            # boundary, one place, same session for every conversion
            df = df.select("event_id", F.col("ts").cast("timestamp").alias("ts"))
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(src, f"arrival-{k}.parquet"))

        def run_once() -> None:
            stream = (
                spark.readStream.schema("event_id LONG, ts TIMESTAMP")
                .parquet(src)
            )
            q = (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "1 hour").alias("win"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("win.start").cast("long").alias("ws_s"), "n")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        bucket = F.least(F.lit(2), F.floor((ts_long - F.lit(lo)) / F.lit(third)))
        for k in range(3):
            part = ev.filter(bucket == k)
            if k > 0:
                part = part.unionByName(late)
            if k == 2:
                part = part.unionByName(sentinel)
            stage_file(k, part)
            run_once()
        stage_file(3, flush)
        run_once()

        streamed = spark.read.parquet(sink)
        expected = (
            ev.groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n_on_time"))
            .select(
                F.col("win.start").cast("timestamp").cast("long").alias("ws_s"),
                "n_on_time",
            )
        )
        census = (
            expected.join(streamed, "ws_s", "left")
            .select(
                "ws_s",
                F.coalesce(F.col("n"), F.lit(0)).alias("n_streamed"),
                "n_on_time",
                (F.col("n_on_time") - F.coalesce(F.col("n"), F.lit(0))).alias(
                    "delta"
                ),
            )
            .orderBy("ws_s")
        )
        # the result must survive the temp-dir cleanup below — cut the
        # lineage to the sink files before deleting them
        return materialize(census, force_checkpoint=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
