"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Semantics: for each left row with timestamp t, attach the single right
row with the greatest timestamp <= t (per key). The canonical
time-series/ML-feature operation (prevailing price, latest feature
snapshot, slowly-changing dimension lookup).

Implementation is a composition of existing DataFrame ops (no UDF):
union the two sides tagged by origin, sort within key by (ts, origin),
and carry the right side's values forward with last(ignorenulls) over
an unbounded-preceding window — one shuffle on the key, linear in
rows, no range cross-join blowup.

Scale notes: cost = one shuffle + one in-partition sort of
|left|+|right| rows per key — the same as a sort-merge join; safe at
100 TB wherever a join on the key is safe. (Contrast the naive
theta-join `l.ts >= r.ts` + max(), which is quadratic per key.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts within the same `on` key. Left columns are
    preserved; `value_cols` arrive from the right side (null when no
    right row precedes the left row).

    When several right rows share one (key, timestamp), the winner is
    the greatest ``tiebreak_cols`` tuple (default: ``value_cols``
    themselves) — a total order, so the result never depends on
    partition/arrival order. Pass a unique right-side column for a
    caller-defined resolution.
    """
    tb = tiebreak_cols if tiebreak_cols is not None else list(value_cols)
    carry_cols = value_cols + [c for c in tb if c not in value_cols]
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_src", F.lit(1))
    rt = (
        right.select(
            on, F.col(right_ts).alias("_t"), *[F.col(c) for c in carry_cols]
        )
        .withColumn("_src", F.lit(0))
    )
    l_aug = lt.select(
        *left.columns, "_t", "_src", *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in carry_cols]
    )
    r_aug = rt.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        F.col(on),
        "_t",
        "_src",
        *carry_cols,
    ).select(*l_aug.columns)
    unioned = l_aug.unionByName(r_aug)
    # right rows (_src=0) sort before left rows at equal timestamps, so
    # a right row AT t is visible to a left row AT t (<= semantics);
    # tied right rows order by the tiebreak tuple (left rows hold null
    # there, which never affects their own carried value).
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("_t").asc(),
            F.col("_src").asc(),
            *[F.col(c).asc_nulls_first() for c in tb],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in value_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return carried.filter(F.col("_src") == 1).drop(
        "_t", "_src", *[c for c in carry_cols if c not in value_cols]
    )


@register(
    "join_asof_prevailing",
    oracle="""
    WITH rates AS (
        SELECT i AS rate_id,
               TIMESTAMP '1995-01-01 00:00:00' + to_days(CAST(i * 90 AS INTEGER)) AS valid_from,
               round(1.0 + 0.01 * (i % 7), 2) AS fx_rate
        FROM range(0, 30) t(i)
    )
    SELECT o_orderkey, o_totalprice, fx_rate,
           round(o_totalprice * fx_rate, 4) AS converted
    FROM (
        SELECT o_orderkey, o_totalprice,
               (SELECT max_by(fx_rate, valid_from)
                FROM rates WHERE valid_from <= o_orderdate) AS fx_rate
        FROM orders WHERE o_orderkey <= 500
    )
    ORDER BY o_orderkey
    """,
)
def join_asof_prevailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join demo: each order picks the prevailing FX rate (the
    latest rate whose validity starts on/before the order date). The
    oracle states the same semantics with a correlated max_by subquery;
    the engine uses the linear union+carry-forward plan.

    The rate table here is keyless (one global series), so the window
    key is a constant — with a real key (currency, instrument) the same
    code shards per key.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .withColumn("_k", F.lit(1))
    )
    rates = spark.range(0, 30).select(
        F.lit(1).alias("_k"),
        (
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_dt_interval(days=F.col("id").cast("int") * 90)
        ).alias("valid_from"),
        F.round(1.0 + 0.01 * (F.col("id") % 7), 2).alias("fx_rate"),
    )
    joined = asof_join(
        o, rates, on="_k", left_ts="o_orderdate", right_ts="valid_from",
        value_cols=["fx_rate"],
    )
    return joined.select(
        "o_orderkey",
        "o_totalprice",
        "fx_rate",
        F.round(F.col("o_totalprice") * F.col("fx_rate"), 4).alias("converted"),
    ).orderBy("o_orderkey")


TOLERANCE_DAYS = 60  # max staleness of a matched rate (rates come every 90d, so ~1/3 of days go stale)


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH rates AS (
        SELECT i AS rate_id,
               TIMESTAMP '1995-01-01 00:00:00' + to_days(CAST(i * 90 AS INTEGER)) AS valid_from,
               round(1.0 + 0.01 * (i % 7), 2) AS fx_rate
        FROM range(0, 30) t(i)
    )
    SELECT o_orderkey, o_totalprice, fx_rate,
           (fx_rate IS NULL) AS is_stale
    FROM (
        SELECT o_orderkey, o_totalprice,
               (SELECT max_by(fx_rate, valid_from) FROM rates
                WHERE valid_from <= o_orderdate
                  AND valid_from >= o_orderdate - INTERVAL {TOLERANCE_DAYS} DAY
               ) AS fx_rate
        FROM orders WHERE o_orderkey <= 500
    )
    ORDER BY o_orderkey
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas merge_asof's
    ``tolerance=``): the prevailing rate only matches if it is no older
    than {TOLERANCE_DAYS} days at the order date — beyond that the row
    surfaces as stale (NULL rate) instead of silently carrying an
    ancient value, the correctness guard every market-data pipeline
    wants. Same union+carry-forward plan as join_asof_prevailing with
    the matched timestamp carried alongside the value, then one
    row-local staleness predicate — tolerance costs nothing extra at
    any scale."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .withColumn("_k", F.lit(1))
    )
    rates = spark.range(0, 30).select(
        F.lit(1).alias("_k"),
        (
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_dt_interval(F.col("id").cast("int") * 90)
        ).alias("valid_from"),
        F.round(1.0 + 0.01 * (F.col("id") % 7), 2).alias("fx_rate"),
    )
    joined = asof_join(
        o.withColumn("_ts", F.col("o_orderdate").cast("timestamp_ntz")),
        rates,
        on="_k",
        left_ts="_ts",
        right_ts="valid_from",
        value_cols=["fx_rate", "valid_from"],
        tiebreak_cols=["valid_from"],
    )
    fresh = F.col("valid_from") >= F.col("_ts") - F.expr(
        f"INTERVAL {TOLERANCE_DAYS} DAY"
    )
    rate = F.when(fresh, F.col("fx_rate"))
    return joined.select(
        "o_orderkey",
        "o_totalprice",
        rate.alias("fx_rate"),
        rate.isNull().alias("is_stale"),
    ).orderBy("o_orderkey")


@register(
    "join_asof_forward",
    oracle="""
    WITH rates AS (
        SELECT i AS rate_id,
               TIMESTAMP '1995-01-01 00:00:00' + to_days(CAST(i * 90 AS INTEGER)) AS valid_from,
               round(1.0 + 0.01 * (i % 7), 2) AS fx_rate
        FROM range(0, 30) t(i)
    )
    SELECT o_orderkey, o_totalprice, next_rate,
           CASE WHEN next_rate IS NOT NULL
                THEN round(o_totalprice * next_rate, 4) END AS converted_next
    FROM (
        SELECT o_orderkey, o_totalprice,
               (SELECT min_by(fx_rate, valid_from)
                FROM rates WHERE valid_from > o_orderdate) AS next_rate
        FROM orders WHERE o_orderkey <= 500
    )
    ORDER BY o_orderkey
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (pandas merge_asof direction='forward'):
    each order picks the NEXT rate strictly after its date — the
    "what will this reprice to" lookup, the mirror of
    join_asof_prevailing's carry-forward.

    Same linear union plan, reflected: right rows sort BEFORE left
    rows at equal timestamps, so an equal-time rate falls outside the
    order's following frame (strict >), and first(ignorenulls) over
    a currentRow..unboundedFollowing frame carries the next value
    backward. One shuffle on the series key, no range join, no
    per-row subquery."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .withColumn("_k", F.lit(1))
    )
    rates = spark.range(0, 30).select(
        F.lit(1).alias("_k"),
        (
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_dt_interval(days=F.col("id").cast("int") * 90)
        ).alias("valid_from"),
        F.round(1.0 + 0.01 * (F.col("id") % 7), 2).alias("fx_rate"),
    )
    l_aug = o.select(
        "_k",
        F.col("o_orderdate").cast("timestamp_ntz").alias("_t"),
        F.lit(1).alias("_src"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("double").alias("fx_rate"),
    )
    r_aug = rates.select(
        "_k",
        F.col("valid_from").alias("_t"),
        F.lit(0).alias("_src"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "fx_rate",
    )
    # right rows (_src=0) sort BEFORE left rows at equal _t, so a rate
    # AT t falls outside an order-at-t's following frame (strict >).
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_src").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = l_aug.unionByName(r_aug).select(
        "_src",
        "o_orderkey",
        "o_totalprice",
        F.first("fx_rate", ignorenulls=True).over(w).alias("next_rate"),
    )
    return (
        carried.filter(F.col("_src") == 1)
        .select(
            "o_orderkey",
            "o_totalprice",
            "next_rate",
            F.when(
                F.col("next_rate").isNotNull(),
                F.round(F.col("o_totalprice") * F.col("next_rate"), 4),
            ).alias("converted_next"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH rates AS (
        SELECT i AS rate_id,
               TIMESTAMP '1995-01-01 00:00:00' + to_days(CAST(i * 90 AS INTEGER)) AS valid_from,
               round(1.0 + 0.01 * (i % 7), 2) AS fx_rate
        FROM range(0, 30) t(i)
    ),
    picked AS (
        SELECT o_orderkey, o_totalprice,
               (SELECT max_by(fx_rate, valid_from)
                FROM rates WHERE valid_from <= o_orderdate) AS prev_rate,
               (SELECT date_diff('day', MAX(valid_from), CAST(o_orderdate AS DATE))
                FROM rates WHERE valid_from <= o_orderdate) AS d_prev,
               (SELECT min_by(fx_rate, valid_from)
                FROM rates WHERE valid_from > o_orderdate) AS next_rate,
               (SELECT date_diff('day', CAST(o_orderdate AS DATE), MIN(valid_from))
                FROM rates WHERE valid_from > o_orderdate) AS d_next
        FROM orders WHERE o_orderkey <= 500
    )
    SELECT o_orderkey, o_totalprice,
           CAST(d_prev AS BIGINT) AS d_prev, CAST(d_next AS BIGINT) AS d_next,
           CASE WHEN next_rate IS NULL THEN 'backward'
                WHEN prev_rate IS NULL THEN 'forward'
                WHEN d_prev <= d_next THEN 'backward'
                ELSE 'forward' END AS direction,
           CASE WHEN next_rate IS NULL THEN prev_rate
                WHEN prev_rate IS NULL THEN next_rate
                WHEN d_prev <= d_next THEN prev_rate
                ELSE next_rate END AS fx_rate
    FROM picked ORDER BY o_orderkey
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'):
    each order takes whichever rate is closer in time — the prevailing
    one (valid_from <= t) or the next one (valid_from > t) — with the
    BACKWARD match winning exact distance ties (the deterministic
    policy merge_asof uses). Completes the as-of family:
    prevailing (backward) / forward / tolerance / nearest.

    ONE union + ONE shuffle computes both candidates: rates sort
    before orders at equal timestamps, a last(ignorenulls) over the
    preceding frame carries the prevailing rate+date forward and a
    first(ignorenulls) over the following frame carries the next
    rate+date backward; the nearest pick is then row-local CASE
    arithmetic on whole-day deltas. No range join, no per-row
    subquery — the oracle states the semantics with correlated
    max_by/min_by instead."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )
    rates = spark.range(0, 30).select(
        (
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_dt_interval(days=F.col("id").cast("int") * 90)
        ).alias("valid_from"),
        F.round(1.0 + 0.01 * (F.col("id") % 7), 2).alias("fx_rate"),
    )
    l_aug = o.select(
        F.lit(1).alias("_k"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("_t"),
        F.lit(1).alias("_src"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("double").alias("fx_rate"),
        F.lit(None).cast("timestamp_ntz").alias("rate_ts"),
    )
    r_aug = rates.select(
        F.lit(1).alias("_k"),
        F.col("valid_from").alias("_t"),
        F.lit(0).alias("_src"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "fx_rate",
        F.col("valid_from").alias("rate_ts"),
    )
    # Rates (_src=0) sort before orders at equal _t: a rate AT t is
    # eligible backward (<=) and excluded forward (strict >) — the
    # same equal-time policy the prevailing/forward queries state.
    order = [F.col("_t").asc(), F.col("_src").asc()]
    w_prev = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = l_aug.unionByName(r_aug).select(
        "_src",
        "o_orderkey",
        "o_totalprice",
        F.col("_t"),
        F.last("fx_rate", ignorenulls=True).over(w_prev).alias("prev_rate"),
        F.last("rate_ts", ignorenulls=True).over(w_prev).alias("prev_ts"),
        F.first("fx_rate", ignorenulls=True).over(w_next).alias("next_rate"),
        F.first("rate_ts", ignorenulls=True).over(w_next).alias("next_ts"),
    )
    d_prev = F.datediff(F.col("_t").cast("date"), F.col("prev_ts").cast("date"))
    d_next = F.datediff(F.col("next_ts").cast("date"), F.col("_t").cast("date"))
    backward = F.col("next_rate").isNull() | (
        F.col("prev_rate").isNotNull() & (d_prev <= d_next)
    )
    return (
        carried.filter(F.col("_src") == 1)
        .select(
            "o_orderkey",
            "o_totalprice",
            d_prev.cast("long").alias("d_prev"),
            d_next.cast("long").alias("d_next"),
            F.when(backward, "backward").otherwise("forward").alias("direction"),
            F.when(backward, F.col("prev_rate"))
            .otherwise(F.col("next_rate"))
            .alias("fx_rate"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_asof_keyed",
    oracle="""
    WITH marks AS (
        SELECT event_type,
               epoch_ns(ts) // 3600000000000 AS hr,
               min_by(value, lpad(CAST(epoch_ns(ts) AS VARCHAR), 20, '0')
                             || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                   AS mark_value
        FROM events
        GROUP BY 1, 2
    ),
    purchases AS (
        SELECT event_id, event_type, epoch_ns(ts) // 3600000000000 AS hr,
               value
        FROM events WHERE event_type IN ('purchase', 'click')
          AND event_id % 50 = 0
    )
    SELECT p.event_id, p.event_type,
           CAST(p.hr AS BIGINT) AS hr, p.value,
           (SELECT max_by(m.mark_value, m.hr) FROM marks m
            WHERE m.event_type = p.event_type AND m.hr <= p.hr - 1)
               AS prev_hour_mark
    FROM purchases p ORDER BY p.event_id
    """,
)
def join_asof_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED as-of join — the per-key sharding the constant-key demos
    (prevailing/forward/tolerance/nearest) only claim: each sampled
    purchase/click attaches the latest hourly opening mark OF ITS OWN
    event type from any hour strictly before its own. The union
    stream partitions by (event_type): Spark shards the carry-forward
    window per key, so parallelism scales with keys and no key ever
    sees another key's marks.

    Scale shape: the mark table is one groupBy (type, hour) with a
    deterministic min_by opener (zero-padded (epoch_ns, event_id)
    string key — lexicographic == numeric, the timeseries_ohlc
    convention); the as-of itself is ONE shuffle on
    event_type + a linear in-partition carry — identical cost to a
    sort-merge join on the key. The strictly-before semantics come
    from joining marks at hr and reading them from hr+1 onward
    (mark rows sort at their own hour; lookups subtract one hour),
    stated in the oracle as hr <= p.hr - 1."""
    e = load_table(spark, sf_dir, "events")
    ordkey = F.expr(
        "lpad(CAST(ts_ns AS STRING), 20, '0')"
        " || lpad(CAST(event_id AS STRING), 12, '0')"
    )
    marks = (
        e.groupBy(
            "event_type", F.expr("ts_ns div 3600000000000").alias("hr")
        )
        .agg(F.min_by("value", ordkey).alias("mark_value"))
    )
    purchases = (
        e.filter(
            F.col("event_type").isin("purchase", "click")
            & (F.col("event_id") % 50 == 0)
        )
        .select(
            "event_id",
            "event_type",
            F.expr("ts_ns div 3600000000000").alias("hr"),
            "value",
        )
    )
    l_aug = purchases.select(
        "event_type",
        # lookups read strictly-before marks: shift left rows to hr-1,
        # where the preceding frame ends at that hour's mark
        (F.col("hr") - 1).alias("_t"),
        F.lit(1).alias("_src"),
        "event_id",
        F.col("hr").alias("ev_hr"),
        "value",
        F.lit(None).cast("double").alias("mark_value"),
    )
    r_aug = marks.select(
        "event_type",
        F.col("hr").alias("_t"),
        F.lit(0).alias("_src"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("ev_hr"),
        F.lit(None).cast("double").alias("value"),
        "mark_value",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("_t").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_aug.unionByName(r_aug).select(
        "_src",
        "event_id",
        "event_type",
        "ev_hr",
        "value",
        F.last("mark_value", ignorenulls=True).over(w).alias("prev_hour_mark"),
    )
    return (
        carried.filter(F.col("_src") == 1)
        .select(
            "event_id",
            "event_type",
            F.col("ev_hr").cast("long").alias("hr"),
            "value",
            "prev_hour_mark",
        )
        .orderBy("event_id")
    )
