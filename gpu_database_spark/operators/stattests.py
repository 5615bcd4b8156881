"""Exact classical hypothesis tests as single-pass aggregations.

A training-data pipeline gates corpus refreshes on distribution
checks: chi-squared independence between categorical facets (did the
status x priority mix shift?) and Welch's unequal-variance t-test
between metric samples (did purchase values drift vs views?). Both
are closed forms over one-pass sufficient statistics — counts, exact
sums, exact sums of squares — so they run as ONE groupBy over the
fact table with no per-row state, merge associatively across 100 TB
partitions, and hash-match a DuckDB oracle via the repo's
DECIMAL(27,6) exact-sum discipline (functions/compat.py).

Complements stat_ks_test (exact ECDF drift gate) and
stat_exact_quantiles_distributed in operators/maintenance.py.

Reference tie-in: the reference engine (a CUDA KV store,
src/cuda/hashTable.cuh) has no statistics surface at all; these
supply the drift-gate layer BASELINE.json's standard-OLAP north star
expects around an analytics engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "stat_chi2_independence",
    oracle="""
    WITH obs AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS o
        FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT s, SUM(o) AS r_tot FROM obs GROUP BY s),
    ct AS (SELECT p, SUM(o) AS c_tot FROM obs GROUP BY p),
    n AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
        SELECT obs.o,
               CAST(rt.r_tot AS DOUBLE) * ct.c_tot / (SELECT n FROM n) AS e
        FROM obs JOIN rt USING (s) JOIN ct USING (p)
    )
    SELECT round(CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(27,6)))
                      AS DOUBLE), 6) AS chi2,
           CAST((SELECT COUNT(*) - 1 FROM rt)
                * (SELECT COUNT(*) - 1 FROM ct) AS BIGINT) AS dof,
           CAST((SELECT n FROM n) AS BIGINT) AS n
    FROM cells
    """,
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence between order status
    and order priority: chi2 = sum over cells of (observed -
    expected)^2 / expected, with expected = row_total * col_total / n.

    Scale shape: ONE groupBy over the fact table collapses 100 TB to
    an r x c contingency table (15 cells here); margins and the chi2
    fold are arithmetic over that tiny table (broadcast joins, no
    second fact-table pass). Observed counts are integers; each cell's
    term is one double division, summed exactly via the DECIMAL(27,6)
    discipline so both engines hash-match."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("s").agg(F.sum("o").alias("r_tot"))
    ct = obs.groupBy("p").agg(F.sum("o").alias("c_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "s")
        .join(F.broadcast(ct), "p")
        .crossJoin(F.broadcast(n))
        .select(
            "o",
            (F.col("r_tot").cast("double") * F.col("c_tot") / F.col("n")).alias("e"),
        )
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    dof = (
        rt.agg(F.count(F.lit(1)).alias("r")).crossJoin(
            ct.agg(F.count(F.lit(1)).alias("c"))
        )
    ).select(((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"))
    return (
        cells.agg(F.round(dsum(term), 6).alias("chi2"))
        .crossJoin(F.broadcast(dof))
        .crossJoin(F.broadcast(n.select(F.col("n").cast("long").alias("n"))))
    )


@register(
    "stat_welch_ttest",
    oracle="""
    WITH s AS (
        SELECT CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value * value
                             ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS q1,
               CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value * value
                             ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS q2
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    v AS (
        SELECT n1, n2,
               s1 / n1 AS m1, s2 / n2 AS m2,
               (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
               (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
        FROM s
    )
    SELECT n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 3) AS welch_df,
           abs((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) > 1.96 AS significant_05
    FROM v
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between the 'view'
    and 'purchase' value distributions: t = (m1-m2)/sqrt(v1/n1+v2/n2)
    with the Welch-Satterthwaite degrees of freedom, flagged against
    the two-sided z ~ 1.96 at alpha=0.05 (df is huge here).

    Scale shape: ONE conditional aggregation pass over the filtered
    event stream produces all six sufficient statistics (n, sum,
    sum-of-squares per sample) map-side-combined — no second pass, no
    per-group row buffering. Sums go through DECIMAL(27,6) so they are
    order-independent and engine-exact; the final t/df arithmetic is a
    fixed sequence of double ops on those exact sums, identical in
    both engines before round()."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    is1 = F.col("event_type") == "view"
    v = F.col("value")
    s = e.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("long").alias("n2"),
        dsum(F.when(is1, v).otherwise(0)).alias("s1"),
        dsum(F.when(~is1, v).otherwise(0)).alias("s2"),
        dsum(F.when(is1, v * v).otherwise(0)).alias("q1"),
        dsum(F.when(~is1, v * v).otherwise(0)).alias("q2"),
    )
    m1, m2 = F.col("s1") / F.col("n1"), F.col("s2") / F.col("n2")
    v1 = (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1)
    v2 = (F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (F.col("n2") - 1)
    vv = s.select("n1", "n2", m1.alias("m1"), m2.alias("m2"), v1.alias("v1"), v2.alias("v2"))
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t = (F.col("m1") - F.col("m2")) / F.sqrt(se2)
    df = (se2 * se2) / (
        (F.col("v1") / F.col("n1")) * (F.col("v1") / F.col("n1")) / (F.col("n1") - 1)
        + (F.col("v2") / F.col("n2")) * (F.col("v2") / F.col("n2")) / (F.col("n2") - 1)
    )
    return vv.select(
        "n1",
        "n2",
        F.round("m1", 6).alias("mean1"),
        F.round("m2", 6).alias("mean2"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 3).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant_05"),
    )
