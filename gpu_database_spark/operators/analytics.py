"""Product-analytics query shapes over the event stream + TF-IDF.

Funnels, cohort retention, and rolling distinct counts are the
workhorse event-analytics patterns (the reference's epoch/event model
is the natural input); TF-IDF is the classic corpus-statistics
operator every text pipeline needs. All oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS step_view,
           COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 END) AS step_click,
           COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                       AND t_purchase > t_click THEN 1 END) AS step_purchase
    FROM firsts
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users progressing view -> click -> purchase in
    event-time order (first occurrence of each step must be strictly
    later than the previous step's). One groupBy on user, conditional
    mins, then global counts — no self-joins, no per-user explosion."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts_ns")))

    firsts = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(viewed, 1)).alias("step_view"),
        F.count(F.when(clicked, 1)).alias("step_click"),
        F.count(F.when(purchased, 1)).alias("step_purchase"),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH days AS (
        SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        FROM events
    ),
    cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
    SELECT c.cohort_day,
           d.day - c.cohort_day AS day_offset,
           COUNT(DISTINCT d.user_id) AS active_users
    FROM days d JOIN cohorts c ON d.user_id = c.user_id
    WHERE d.day - c.cohort_day <= 7
    GROUP BY c.cohort_day, d.day - c.cohort_day
    ORDER BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, distinct
    actives per day-offset for the first week. The cohort table is
    user-sized (small) -> broadcast back onto the activity stream."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("day")
    )
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(F.broadcast(cohorts), "user_id")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "window_rolling_distinct",
    oracle="""
    SELECT user_id, event_id,
           CAST(len(list_distinct(array_agg(event_type)
                OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS BIGINT)
               AS distinct_types_10
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, event_id
    """,
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct count (DISTINCT is illegal inside window
    aggregates in both engines — the portable idiom is
    set-collect-then-size over the frame)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias(
            "distinct_types_10"
        ),
    ).orderBy("user_id", "event_id")


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH campaigns AS (
        SELECT i AS campaign_id,
               1704067200 + i * 432000 AS start_s,
               1704067200 + i * 432000 + 259200 AS end_s
        FROM range(0, 6) t(i)
    )
    SELECT campaign_id, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events JOIN campaigns
      ON epoch_ns(ts) // 1000000000 >= start_s
     AND epoch_ns(ts) // 1000000000 < end_s
    GROUP BY campaign_id
    ORDER BY campaign_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events falling inside (possibly overlapping)
    campaign windows — 3-day campaigns every 5 days. The small interval
    table broadcasts (nested-loop with a range predicate); at scale
    with BOTH sides large, bucket intervals by coarse time bin first
    and equi-join the bin (the standard interval-binning rewrite)."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr("ts_ns div 1000000000").alias("t_s"), "user_id"
    )
    campaigns = spark.range(0, 6).select(
        F.col("id").alias("campaign_id"),
        (F.lit(1704067200) + F.col("id") * 432000).alias("start_s"),
        (F.lit(1704067200) + F.col("id") * 432000 + 259200).alias("end_s"),
    )
    return (
        e.join(
            F.broadcast(campaigns),
            (F.col("t_s") >= F.col("start_s")) & (F.col("t_s") < F.col("end_s")),
        )
        .groupBy("campaign_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("campaign_id")
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a pre-existing aggregate over the
    'old' partition merges with the delta partition's aggregate —
    partial states (count, decimal sum) are mergeable, so the combined
    result EQUALS the full recompute (the oracle) without rescanning
    old data. This mergeability is why the engine's aggregates scale to
    continuously-arriving 100 TB tables."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("_sum"),
        )

    merged = (
        partial(old)
        .unionByName(partial(delta))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("_sum").cast("double").alias("total_value"),
        )
    )
    return merged.orderBy("o_orderpriority")


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 8)
                   AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    WHERE rn = 1 AND doc_id < 100
    ORDER BY doc_id
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency x inverse document frequency, top term
    per document. Three aggregations (tf, df, N) joined back — df is
    vocabulary-sized and broadcasts; the idf factor rounds at 8dp (one
    ln + one multiply per term, deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df").cast("double")), 8
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("doc_id") < 100))
        .select("doc_id", "term", "tfidf")
        .orderBy("doc_id")
    )


@register(
    "sessionize_lag_cumsum",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000 OR
                         LAG(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
        SELECT user_id, event_id, ts_us,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           CAST(MIN(ts_us) AS BIGINT) AS start_us,
           CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
    FROM sess
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
)
def sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the lag + cumulative-sum idiom (30-minute
    inactivity gap): mark session starts with LAG, number sessions with
    a running SUM of start flags, then aggregate per session. The batch
    twin of stream_session_windows' session_window, expressed in pure
    window algebra — one shuffle on user_id, every window shares the
    same partitioning (no extra exchanges)."""
    # microsecond precision on both engines: DuckDB TIMESTAMP is us,
    # the parquet fixture is ns -> truncate ns div 1000 (epoch-int rule)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 1_800_000_000  # 30 min
    is_start = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1
    ).when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0)
    sess = ev.select(
        "user_id", "event_id", "ts_us", is_start.alias("is_start")
    ).withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", F.col("session_no").cast("long").alias("session_no"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").cast("long").alias("start_us"),
            (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "skew_key_census",
    oracle="""
    WITH cnt AS (
        SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_rows_per_key,
           CAST(SUM(CASE WHEN c >= 30 THEN c ELSE 0 END) AS BIGINT) AS heavy_rows,
           COUNT(CASE WHEN c >= 30 THEN 1 END) AS n_heavy_keys,
           round(SUM(CASE WHEN c >= 30 THEN c ELSE 0 END)
                 / CAST(SUM(c) AS DOUBLE), 6) AS heavy_share
    FROM cnt
    """,
)
def skew_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnosis in one pass: per-key row counts,
    then the census that decides the strategy — max rows per key and
    the share of data under heavy keys (>= 30 rows). This is the probe
    you run BEFORE choosing salting / replicated-skew-join / AQE skew
    split for a 100 TB join; threshold-based (no global rank sort)."""
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("c"))
    heavy = F.when(F.col("c") >= 30, F.col("c")).otherwise(0)
    return cnt.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").cast("long").alias("max_rows_per_key"),
        F.sum(heavy).cast("long").alias("heavy_rows"),
        F.count(F.when(F.col("c") >= 30, 1)).alias("n_heavy_keys"),
        F.round(
            F.sum(heavy) / F.sum("c").cast("double"), 6
        ).alias("heavy_share"),
    )


def _median_by_key(df: DataFrame, key: str, val: str, out: str,
                   bucket_width: float = 1.0) -> DataFrame:
    """Per-key exact median — the value at rank ceil(n/2) — via the
    histogram-bucket rank-location plan (the per-group form of
    stat_exact_quantiles_distributed, operators/maintenance.py):

    1. bucket the value (floor(v/width): domain-bounded, so the
       histogram is tiny no matter the row count);
    2. per-key cumulative bucket counts over the histogram table
       (key-cardinality × bucket-domain rows — windows here are free);
    3. the target rank k = ceil(n/2) lands in exactly one bucket per
       key; re-scan ONLY those buckets, row_number within
       (key, bucket) — each such partition holds ~1/width-domain of a
       key's rows, so a hot key never concentrates a full sort on one
       task (the 100×-skew fix for low-cardinality keys).

    Returns (key, out, n). The selected VALUE at rank k is
    deterministic under ties (tied rows share a value, hence a
    bucket), so results hash-match a naive per-key sort oracle."""
    b = df.select(key, F.col(val).alias("_v")).withColumn(
        "_bkt", F.floor(F.col("_v") / bucket_width).cast("long")
    )
    hist = b.groupBy(key, "_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    wcum = (
        Window.partitionBy(key).orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(key)
    k = F.ceil(F.sum("_cnt").over(wall) * 0.5).cast("long")
    located = (
        hist.select(
            key, "_bkt", "_cnt",
            F.coalesce(F.sum("_cnt").over(wcum), F.lit(0)).alias("_base"),
            F.sum("_cnt").over(wall).alias("n"),
            k.alias("_k"),
        )
        .filter(
            (F.col("_base") < F.col("_k"))
            & (F.col("_k") <= F.col("_base") + F.col("_cnt"))
        )
        .select(key, "_bkt", "_base", "_k", "n")
    )
    wb = Window.partitionBy(key, "_bkt").orderBy("_v")
    return (
        b.join(F.broadcast(located), [key, "_bkt"])
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_base") + F.col("_rn") == F.col("_k"))
        .select(key, F.col("_v").alias(out), "n")
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type, value AS median, n
        FROM ranked WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
    ),
    dev AS (
        SELECT e.event_type, e.value, m.median, m.n,
               abs(e.value - m.median) AS d
        FROM events e JOIN med m USING (event_type)
    ),
    dranked AS (
        SELECT event_type, median, n, d,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM dev
    ),
    mad AS (
        SELECT event_type, d AS mad
        FROM dranked WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
    )
    SELECT v.event_type,
           CAST(v.n AS BIGINT) AS n_events,
           v.median, a.mad,
           CAST(SUM(CASE WHEN v.d > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalies
    FROM dev v JOIN mad a USING (event_type)
    GROUP BY v.event_type, v.n, v.median, a.mad
    ORDER BY v.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly census per event type: median + MAD (median
    absolute deviation), flagging values beyond 3 MADs — the standard
    outlier gate that, unlike mean/stddev, is not dragged by the very
    outliers it hunts. Exact rank-based order statistics (value at
    rank ceil(n/2)), not interpolated percentiles: the k-th order
    statistic VALUE is deterministic under ties on both engines, so
    the oracle hash-gates median, MAD and the anomaly counts.

    Scale shape: two rank-selection passes (value, then |value-med|),
    each via _median_by_key's histogram-bucket rank-location plan —
    event_type has ~5 values, so a partitionBy(event_type) sort would
    concentrate the whole stream on a handful of tasks at 100×; the
    bucketed plan sorts only within (type, value-bucket) slices. The
    per-type medians broadcast (group count = type cardinality)."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = _median_by_key(e, "event_type", "value", "median")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "median",
        "n",
        F.abs(F.col("value") - F.col("median")).alias("d"),
    )
    mad = _median_by_key(dev, "event_type", "d", "mad").select(
        "event_type", "mad"
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "median", "mad")
        .agg(
            F.sum(F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_anomalies")
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            "median",
            "mad",
            "n_anomalies",
        )
        .orderBy("event_type")
    )


WATERMARK_NS = 2 * 3600 * 1_000_000_000  # 2h, matches streaming/jobs.py


@register(
    "stream_watermark_audit",
    oracle=f"""
    WITH arr AS (
        SELECT event_type, epoch_ns(ts) AS ts_ns,
               MAX(epoch_ns(ts)) OVER (PARTITION BY event_type
                                       ORDER BY event_id
                                       ROWS UNBOUNDED PRECEDING) AS high_water
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN high_water - ts_ns > {WATERMARK_NS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(MAX(high_water - ts_ns) // 1000000000 AS BIGINT)
               AS max_lateness_s
    FROM arr GROUP BY event_type ORDER BY event_type
    """,
)
def stream_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data census: replay events in arrival order (event_id) and
    count, per type, the events that a 2-hour watermark would DROP —
    event time more than 2h behind the high-water mark at their
    arrival. This is the audit you run before picking a watermark for
    the streaming jobs (streaming/jobs.py uses the same 2h): n_late is
    exactly the rows tumbling_counts_stream finalizes away.

    Scale shape: the high-water mark is a per-key running max, but
    event_type has ~5 values — partitioning the window by type alone
    would sort the whole stream on a handful of tasks at 100×. The
    running max decomposes two-level instead (the prefix-SUM pattern
    of pack_sequences_chunked, applied to MAX): (1) running max within
    (type, event_id-range bucket) — thousands of independent
    partitions, the Kafka-partition analogue; (2) a per-type prefix
    max over the bucket-maxima table (65536× smaller; the same
    decomposition applies recursively if even that explodes);
    high_water = greatest(local, prior-buckets). Identical result —
    buckets split event_id ranges in order."""
    e = load_table(spark, sf_dir, "events")
    return watermark_audit_frame(e.select("event_type", "ts_ns", "event_id"))


def watermark_audit_frame(e: DataFrame) -> DataFrame:
    """Late-data census core over (event_type, ts_ns, event_id) — see
    stream_watermark_audit. Split out so scale smokes can feed a
    synthetic hot-typed stream."""
    b = e.withColumn("_bkt", F.expr("event_id div 65536"))
    wl = (
        Window.partitionBy("event_type", "_bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_local_hw", F.max("ts_ns").over(wl))
    bucket_max = b.groupBy("event_type", "_bkt").agg(
        F.max("ts_ns").alias("_bmax")
    )
    wo = (
        Window.partitionBy("event_type").orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = bucket_max.select(
        "event_type", "_bkt", F.max("_bmax").over(wo).alias("_prior")
    )
    # greatest() skips nulls: first bucket per type has no prior max
    arr = local.join(F.broadcast(prior), ["event_type", "_bkt"]).withColumn(
        "high_water", F.greatest(F.col("_local_hw"), F.col("_prior"))
    )
    late = F.col("high_water") - F.col("ts_ns")
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(late > WATERMARK_NS, 1).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.expr("MAX(high_water - ts_ns) div 1000000000")
            .cast("long")
            .alias("max_lateness_s"),
        )
        .orderBy("event_type")
    )


@register(
    "events_pattern_vshape",
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               LAG(value, 2) OVER w AS v2,
               LAG(value, 1) OVER w AS v1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN v2 > v1 AND value > v1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_vshapes
    FROM seq
    GROUP BY user_id
    HAVING SUM(CASE WHEN v2 > v1 AND value > v1 THEN 1 ELSE 0 END) >= 3
    ORDER BY user_id
    """,
)
def events_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-pattern (CEP) detection, MATCH_RECOGNIZE-style: count
    strict V-shapes — value drops then recovers (v[t-2] > v[t-1] <
    v[t]) — per user over the event-time-ordered stream, keeping users
    with >= 3 occurrences. Lag-chains are how Flink-CEP-class fixed-
    length patterns compile onto a relational engine: one window
    shuffle on the partition key, then pure row-local predicates — no
    NFA state machine needed until patterns get variable-length.

    Scale shape: single per-user window (the same shuffle any
    sessionization pays), constant memory per row; 100 TB cost is one
    exchange on user_id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = e.select("user_id", "value", "ts_ns", "event_id").withColumn(
        "v2", F.lag("value", 2).over(w)
    ).withColumn("v1", F.lag("value", 1).over(w))
    hit = F.when((F.col("v2") > F.col("v1")) & (F.col("value") > F.col("v1")), 1).otherwise(0)
    return (
        seq.groupBy("user_id")
        .agg(F.sum(hit).cast("long").alias("n_vshapes"))
        .filter(F.col("n_vshapes") >= 3)
        .orderBy("user_id")
    )


@register(
    "events_new_vs_returning",
    oracle="""
    WITH days AS (
        SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        FROM events
    ),
    firsts AS (SELECT user_id, MIN(day) AS first_day FROM days GROUP BY user_id),
    daily AS (
        SELECT d.day,
               COUNT(DISTINCT d.user_id) AS active_users,
               COUNT(DISTINCT CASE WHEN d.day = f.first_day
                                   THEN d.user_id END) AS new_users
        FROM days d JOIN firsts f ON d.user_id = f.user_id
        GROUP BY d.day
    )
    SELECT day, active_users, new_users,
           active_users - new_users AS returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
               AS cumulative_users,
           round(CAST(active_users - new_users AS DOUBLE)
                 / CAST(active_users AS DOUBLE), 6) AS returning_share
    FROM daily ORDER BY day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: per day, active users split into NEW
    (first-ever activity that day) vs RETURNING, plus the cumulative
    user count — the DAU/new/returning curve every product and every
    crawl-ingest dashboard opens with (for a corpus: new vs re-crawled
    domains per day).

    Scale shape: first-seen day is one groupBy(user) (map-side
    combinable); the daily split joins the user-sized first-day table
    back on user_id (broadcast at dimension scale, shuffle join
    beyond) and counts distinct per day; the cumulative window runs
    over the tiny per-day table only. The cumulative count needs no
    second distinct pass — summing new_users is exact because each
    user is new exactly once."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("day")
    )
    firsts = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        days.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.countDistinct(
                F.when(F.col("day") == F.col("first_day"), F.col("user_id"))
            ).alias("new_users"),
        )
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(w_cum).cast("long").alias("cumulative_users"),
        F.round(
            (F.col("active_users") - F.col("new_users")).cast("double")
            / F.col("active_users").cast("double"),
            6,
        ).alias("returning_share"),
    ).orderBy("day")


@register(
    "sessionize_native_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         >= 1800000000 OR
                         LAG(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
        SELECT user_id, ts_us,
               SUM(is_start) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id,
           CAST(MIN(ts_us) AS BIGINT) AS start_us,
           CAST(MAX(ts_us) + 1800000000 AS BIGINT) AS end_us,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_no
    ORDER BY user_id, start_us
    """,
)
def sessionize_native_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's NATIVE ``session_window``
    operator in batch mode (the API stream_session_windows uses on
    the stream) — one groupBy(user, session_window(ts, gap)), the
    engine merges overlapping per-event windows itself. Kept next to
    sessionize_lag_cumsum deliberately: native semantics SPLIT at
    diff >= gap (an event exactly `gap` later starts a new session,
    since [t, t+gap) windows only merge on strict overlap) while the
    lag-cumsum idiom as written splits at diff > gap — the oracle
    states the native (>=) rule, and the one-microsecond disagreement
    class between the two queries is the point of shipping both.

    Scale shape: one shuffle on user_id; the window merge is an
    in-partition sort — the same cost envelope as the manual idiom,
    with the session-gap logic inside the engine."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            # sw.* are TIMESTAMP_NTZ; the session TZ is pinned UTC, so
            # the cast to TIMESTAMP is the identity instant
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias(
                "start_us"
            ),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias("end_us"),
            "n_events",
        )
        .orderBy("user_id", "start_us")
    )


# Conversion windows for the time-constrained funnel (shared literals).
_FUNNEL_W1_NS = 3_600_000_000_000       # view -> click within 1 hour
_FUNNEL_W2_NS = 86_400_000_000_000      # click -> purchase within 24 hours


@register(
    "events_funnel_time_constrained",
    oracle=f"""
    WITH v AS (
        SELECT user_id, MIN(epoch_ns(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_ns(e.ts) > v.t_view
          AND epoch_ns(e.ts) <= v.t_view + {_FUNNEL_W1_NS}
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_ns(e.ts) > c.t_click
          AND epoch_ns(e.ts) <= c.t_click + {_FUNNEL_W2_NS}
        GROUP BY e.user_id
    ),
    j AS (
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON c.user_id = p.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS step_view,
           CAST(COUNT(t_click) AS BIGINT) AS step_click_1h,
           CAST(COUNT(t_purchase) AS BIGINT) AS step_purchase_24h,
           round(CAST(COUNT(t_click) AS DOUBLE) / COUNT(*), 6)
               AS view_to_click_rate,
           round(CAST(COUNT(t_purchase) AS DOUBLE)
                 / NULLIF(COUNT(t_click), 0), 6) AS click_to_purchase_rate,
           round(CAST(SUM(t_click - t_view) AS DOUBLE)
                 / NULLIF(COUNT(t_click), 0) / 1e9, 6)
               AS mean_view_to_click_sec
    FROM j
    """,
)
def events_funnel_time_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained conversion funnel: first view, first click
    STRICTLY AFTER the view and within ONE HOUR of it, first purchase
    strictly after that click and within 24 HOURS — the attribution-
    window semantics real conversion funnels use, vs
    funnel_view_click_purchase's unconstrained ordering (where a
    click three weeks after the view still counts). Also reports the
    mean view-to-click delay of converters (exact integer nanosecond
    sums, one final division).

    Scale shape: three passes, each a type-filtered scan (predicate
    reaches parquet) collapsing per user — first-view groupBy, then
    window-filtered first-click via an equi-join on the
    HIGH-CARDINALITY user_id, then the same for purchase; the final
    fold is one row. No per-user event explosion, no self-join of
    the full stream, no windows."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts_ns") > F.col("t_view"))
            & (F.col("ts_ns") <= F.col("t_view") + F.lit(_FUNNEL_W1_NS))
        )
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts_ns") > F.col("t_click"))
            & (F.col("ts_ns") <= F.col("t_click") + F.lit(_FUNNEL_W2_NS))
        )
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_purchase"))
    )
    j = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("step_view"),
        F.count("t_click").cast("long").alias("step_click_1h"),
        F.count("t_purchase").cast("long").alias("step_purchase_24h"),
        F.round(
            F.count("t_click").cast("double") / F.count(F.lit(1)), 6
        ).alias("view_to_click_rate"),
        F.round(
            F.count("t_purchase").cast("double")
            / F.nullif(F.count("t_click"), F.lit(0)),
            6,
        ).alias("click_to_purchase_rate"),
        F.round(
            F.expr(
                "CAST(SUM(t_click - t_view) AS DOUBLE)"
                " / NULLIF(COUNT(t_click), 0) / 1e9"
            ),
            6,
        ).alias("mean_view_to_click_sec"),
    )
