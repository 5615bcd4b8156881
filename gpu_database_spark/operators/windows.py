"""Window-function operators (SURVEY.md §2B "Window functions").

Reference parity: the Key_Op_Chain structure orders same-key ops while
different keys run in parallel (``src/database/ycsb/key_op_chain.cuh:72-134``)
— exactly a ``Window.partitionBy(key).orderBy(op_idx)``; Tid priority
(min-Tid wins, ``metadatahelper.cuh:51-55``) is a rank.

Scale notes: a window shuffles once on its partition key and sorts
within partitions; an ORDER BY with no PARTITION BY is a single-reducer
trap and never appears here. Every orderBy carries a unique tiebreak so
rank/lag output is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.ranks import bucketed_row_number
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY rn <= 5
    ORDER BY c_nationkey, rn
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio per partition + top-5 filter (top-k per group).

    Ref analogue: min-Tid priority ordering (metadatahelper.cuh:51-55).
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("c_nationkey", "rn")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           CAST(LAG(o_totalprice) OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price,
           COALESCE(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate), -1) AS days_since_prev
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, od, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD across a customer's order history + inter-order gap."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("od"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.coalesce(
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lag("o_orderdate").over(w).cast("date"),
                ),
                F.lit(-1),
            ).cast("long").alias("days_since_prev"),
        )
        .orderBy("o_custkey", "od", "o_orderkey")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS order_seq
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_custkey, order_seq
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT): running
    customer spend. Decimal accumulation keeps the prefix sums exact."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .alias("running_spend"),
            F.row_number().over(w).cast("long").alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(COUNT(*)
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS qty_ma5
    FROM lineitem
    WHERE l_suppkey <= 10
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame (ROWS 4 PRECEDING): 5-row moving average of
    shipped quantity per supplier, expressed as exact-sum / count."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-4, Window.currentRow)
    )
    return (
        l.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            (
                F.sum(F.col("l_quantity").cast("decimal(27,6)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w).cast("double")
            ).alias("qty_ma5"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                          RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS peers_within_500,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6)))
                OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                      RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS DOUBLE)
               AS peer_bal_sum
    FROM customer
    WHERE c_custkey <= 300
    ORDER BY c_nationkey, c_acctbal, c_custkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the ROWS frames elsewhere): peers
    within +-500 of each customer's balance inside their nation — the
    frame is defined by the ORDER BY value, so ties share identical
    frames (which ROWS frames would split arbitrarily)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(-500, 500)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.count(F.lit(1)).over(w).alias("peers_within_500"),
        F.sum(F.col("c_acctbal").cast("decimal(27,6)")).over(w).cast("double").alias(
            "peer_bal_sum"
        ),
    ).orderBy("c_nationkey", "c_acctbal", "c_custkey")


@register(
    "window_percentiles",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           round(percent_rank() OVER w, 8) AS pct_rank,
           round(cume_dist() OVER w, 8) AS cume,
           CAST(ntile(3) OVER w AS BIGINT) AS tercile
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_acctbal, s_suppkey
    """,
)
def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over supplier — distribution-
    position analytics, WITHOUT the global single-partition window
    sort (VERDICT r9 #2: supplier grows with SF — 1M rows at sf100).

    Plan: the two-level bucketed rank (``functions/ranks.py``) assigns
    each row its global 1-based position ``i`` under the total order
    (s_acctbal, s_suppkey); because the tiebreak is a unique key there
    are no peers, so the window functions reduce to integer-exact
    arithmetic on (i, n): percent_rank = (i-1)/(n-1), cume_dist = i/n,
    and ntile(3) from the standard first-(n mod k)-tiles-get-one-extra
    rule. n arrives as a broadcast scalar. The only remaining windows
    partition by value-bucket (parallel) and run over the tiny
    bucket-totals table."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    ranked = bucketed_row_number(
        s,
        "s_acctbal",
        ["s_suppkey"],
        F.floor(F.col("s_acctbal") / F.lit(100)),
        rank_col="i",
    )
    n = s.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "s_suppkey",
            "s_acctbal",
            F.round(
                (F.col("i") - 1).cast("double") / (F.col("_n") - 1), 8
            ).alias("pct_rank"),
            F.round(F.col("i").cast("double") / F.col("_n"), 8).alias("cume"),
            F.expr(
                """CAST(CASE
                     WHEN i <= (_n % 3) * (_n DIV 3 + 1)
                     THEN (i - 1) DIV (_n DIV 3 + 1) + 1
                     ELSE (_n % 3)
                          + (i - (_n % 3) * (_n DIV 3 + 1) - 1) DIV (_n DIV 3)
                          + 1
                   END AS BIGINT)"""
            ).alias("tercile"),
        )
        .orderBy("s_acctbal", "s_suppkey")
    )


@register(
    "window_share_of_total",
    oracle="""
    SELECT n_name,
           CAST(nation_value AS DOUBLE) AS nation_value,
           CAST(nation_value / CAST(SUM(CAST(nation_value AS DECIMAL(27,6))) OVER ()
                                    AS DOUBLE) AS DOUBLE) AS share
    FROM (
        SELECT n_name, CAST(SUM(CAST(s_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS nation_value
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    )
    ORDER BY n_name
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpartitioned window over a pre-aggregated (small) input:
    percent-of-total. The global window runs on ~25 rows, not on the
    fact table — the scale-safe way to use an empty OVER ()."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("s_acctbal").cast("decimal(27,6)")).cast("double").alias("nation_value"))
    )
    w = Window.partitionBy()
    total = F.sum(F.col("nation_value").cast("decimal(27,6)")).over(w).cast("double")
    return per_nation.select(
        "n_name",
        "nation_value",
        (F.col("nation_value") / total).alias("share"),
    ).orderBy("n_name")


@register(
    "window_gap_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               epoch_ns(ts) // 86400000000000 AS day
        FROM events
    ),
    tagged AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS island_key
        FROM days
    )
    SELECT user_id,
           MIN(day) AS start_day,
           MAX(day) AS end_day,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM tagged
    GROUP BY user_id, island_key
    HAVING COUNT(*) >= 2
    ORDER BY user_id, start_day
    """,
)
def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user (streak detection), via the day-minus-row_number constant-key
    trick. The window partitions by user_id — per-user state only, no
    global sort — then one groupBy on (user, island): two keyed
    shuffles on the same key, which Catalyst plans as a single
    exchange reused by both operators. Day arithmetic is integer
    (epoch-ns div), identical on both engines."""
    from gpu_database_spark.sources.catalog import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    tagged = days.withColumn("island_key", F.col("day") - F.row_number().over(w))
    return (
        tagged.groupBy("user_id", "island_key")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        .filter(F.col("n_days") >= 2)
        .select("user_id", "start_day", "end_day", "n_days")
        .orderBy("user_id", "start_day")
    )
