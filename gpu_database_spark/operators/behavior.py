"""Behavioral / sequence analytics over the event stream and baskets.

The query family every product-analytics warehouse runs on top of an
engine like this: market-basket association rules (support /
confidence / lift), first-order Markov transition matrices over
per-user event sequences, last-touch attribution of conversions,
volume-weighted average price, and autocorrelation of an aggregated
time series. All are expressed as declarative DataFrame plans —
bounded self-joins on the basket key, lag/last windows partitioned by
the naturally high-cardinality ``user_id``, and closed-form Pearson
moments over exact DECIMAL sums — so Catalyst keeps every step
JVM-side and each shape survives a 100x scale-up.

Reference tie-in: the reference engine (CUDA KV store,
src/cuda/hashTable.cuh) exposes none of this; these extend the
analytics surface SURVEY.md §2B declares around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum, dsum_sql
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "market_basket_lift",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM items),
    sing AS (SELECT brand, COUNT(*) AS c FROM items GROUP BY brand),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS c_ab
        FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, c_ab,
           round(CAST(c_ab AS DOUBLE) / n_baskets, 6) AS support,
           round(CAST(c_ab AS DOUBLE) / sa.c, 6) AS confidence,
           round(CAST(c_ab AS DOUBLE) * n_baskets / sa.c / sb.c, 6) AS lift
    FROM pairs
    JOIN sing sa ON sa.brand = brand_a
    JOIN sing sb ON sb.brand = brand_b
    CROSS JOIN n
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: for brand pairs that
    co-occur in an order, support = P(a,b), confidence = P(b|a), lift
    = P(a,b)/(P(a)P(b)); top-20 by lift.

    Scale shape: baskets are the DISTINCT (orderkey, brand) table —
    one shuffle on orderkey. The pair generator self-joins on the
    basket key, so fan-out is bounded by basket size squared (~7
    items/order in TPC-H), never |items|^2; pair and singleton counts
    are ordinary partial-aggregating groupBys, and the three
    probability joins run against the 25-brand singleton table
    (broadcast). The scalar basket count is a broadcast cross join,
    not a driver collect. All ratios are single IEEE divisions of
    integer counts — bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    items = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = items.agg(F.countDistinct("ok").alias("n_baskets"))
    sing = items.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    sa = sing.select(F.col("brand").alias("brand_a"), F.col("c").alias("ca"))
    sb = sing.select(F.col("brand").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.round(F.col("c_ab").cast("double") / F.col("n_baskets"), 6).alias(
                "support"
            ),
            F.round(F.col("c_ab").cast("double") / F.col("ca"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("c_ab").cast("double") * F.col("n_baskets") / F.col("ca") / F.col("cb"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_ns(ts), event_id) AS nxt
        FROM events
    ),
    t AS (
        SELECT cur, nxt, COUNT(*) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY cur), 6) AS p
    FROM t
    ORDER BY cur, nxt
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count (current -> next) event-type transitions within
    each user's timeline and normalize rows to probabilities.

    Scale shape: the only per-row window is LEAD partitioned by
    ``user_id`` — the naturally high-cardinality key of an event
    stream (millions of users at 100 TB), so tasks stay balanced; the
    transition table after the groupBy is at most |types|^2 = 25 rows,
    where the row-normalizing window is trivially safe. The p column
    is one integer division, cross-engine exact."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    t = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("cur")
    return t.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wrow), 6).alias("p"),
    ).orderBy("cur", "nxt")


@register(
    "attribution_last_touch",
    oracle=f"""
    WITH tagged AS (
        SELECT event_type, value,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch
        FROM events
    )
    SELECT COALESCE(touch, '(none)') AS touch,
           COUNT(*) AS n_purchases,
           round({dsum_sql('value')}, 2) AS attributed_value
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent non-purchase event type in the same user's timeline; the
    result is the per-touch-channel purchase count and attributed
    revenue.

    Scale shape: ONE window pass — last(ignorenulls) partitioned by
    high-cardinality ``user_id`` ordered by (ts, event_id) with an
    UNBOUNDED PRECEDING..1 PRECEDING frame (Spark evaluates this as a
    running last, no per-row rescan) — then a 6-row census groupBy.
    Revenue uses the exact DECIMAL(27,6) sum discipline."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = e.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("touch"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("(none)")).alias("touch"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(dsum(F.col("value")), 2).alias("attributed_value"),
        )
        .orderBy("touch")
    )


@register(
    "timeseries_vwap",
    oracle=f"""
    SELECT p.p_brand AS brand,
           CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
           CAST(SUM(l.l_quantity) AS BIGINT) AS volume,
           round({dsum_sql('l.l_extendedprice')}
                 / SUM(l.l_quantity), 6) AS vwap
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def timeseries_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per brand per ship month:
    sum(extendedprice) / sum(quantity), the canonical VWAP rollup.

    Scale shape: brand filter reaches the part scan, the part side
    broadcasts, and the rollup is one partial-aggregating groupBy on
    (brand, month) — the numerator via the exact DECIMAL(27,6) sum,
    the final division a single IEEE op. No windows, no second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        )
        .agg(
            F.sum("l_quantity").cast("long").alias("volume"),
            F.round(
                dsum(F.col("l_extendedprice")) / F.sum("l_quantity"), 6
            ).alias("vwap"),
        )
        .orderBy("brand", "month")
    )


def _acf_m_sql(k: int) -> str:
    return f"""
    m{k} AS (
        SELECT event_type, CAST({k} AS BIGINT) AS lag, COUNT(*) AS n,
               CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(v{k} AS DECIMAL(27,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(v * v{k} AS DECIMAL(27,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(v * v AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(v{k} * v{k} AS DECIMAL(27,6))) AS DOUBLE) AS syy
        FROM lagged WHERE v{k} IS NOT NULL GROUP BY 1
    )"""


_ACF_SQL = (
    """
    WITH hourly AS (
        SELECT event_type,
               epoch_ns(ts) // 3600000000000 AS hour,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(*) AS v
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, v,
               LAG(v, 1) OVER w AS v1,
               LAG(v, 2) OVER w AS v2,
               LAG(v, 3) OVER w AS v3
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour)
    ),"""
    + ",".join(_acf_m_sql(k) for k in (1, 2, 3))
    + """,
    m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2
          UNION ALL SELECT * FROM m3)
    SELECT event_type, lag, n,
           round((n * sxy - sx * sy)
                 / sqrt(n * sxx - sx * sx)
                 / sqrt(n * syy - sy * sy), 6) AS acf
    FROM m
    ORDER BY event_type, lag
"""
)


@register("timeseries_acf", oracle=_ACF_SQL)
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly mean event value at lags 1-3 per
    event type: Pearson correlation of the series against its own
    lag, computed from one-pass moment sums.

    Scale shape: the raw stream collapses FIRST via a (type, hour)
    groupBy — 100 TB of events becomes |types| x |hours| rows (a few
    thousand per year) — and only that tiny series sees the LAG
    windows and moment folds, so the low-cardinality partition key is
    safe by construction. Moments use the DECIMAL(27,6) exact-sum
    discipline; the acf is closed-form arithmetic over them, mirrored
    operation-for-operation in the oracle."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.expr("ts_ns div 3600000000000").alias("hour")
    ).agg(
        (F.sum(F.col("value").cast("decimal(27,6)")).cast("double") / F.count(F.lit(1))).alias("v")
    )
    outs = []
    for k in (1, 2, 3):
        w = Window.partitionBy("event_type").orderBy("hour")
        lagged = hourly.select(
            "event_type", "v", F.lag("v", k).over(w).alias("vl")
        ).filter(F.col("vl").isNotNull())
        m = lagged.groupBy("event_type").agg(
            F.lit(k).cast("long").alias("lag"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("v")).alias("sx"),
            dsum(F.col("vl")).alias("sy"),
            dsum(F.col("v") * F.col("vl")).alias("sxy"),
            dsum(F.col("v") * F.col("v")).alias("sxx"),
            dsum(F.col("vl") * F.col("vl")).alias("syy"),
        )
        outs.append(
            m.select(
                "event_type",
                "lag",
                "n",
                F.round(
                    (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    / F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                    6,
                ).alias("acf"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("event_type", "lag")
