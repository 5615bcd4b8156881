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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum
from gpu_database_spark.functions.materialize import materialize
from gpu_database_spark.llm.features import _LABEL_SQL, _label_col
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
    # Materialized: the r x c table (15 rows) feeds FOUR consumers
    # (row margins, column margins, n, cells) — without the barrier
    # each branch re-executes the fact-table groupBy, turning the
    # "one pass over 100 TB" claim into four scans.
    obs = o.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("o")).transform(materialize)
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


@register(
    "stat_mannwhitney_u",
    oracle="""
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS in1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS in2
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    by_v AS (
        SELECT value, SUM(in1) AS c1, SUM(in2) AS c2
        FROM s GROUP BY value
    ),
    cum AS (
        SELECT c1, c2, c1 + c2 AS t,
               COALESCE(SUM(c2) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS less2
        FROM by_v
    ),
    agg AS (
        SELECT SUM(c1) AS n1, SUM(c2) AS n2,
               SUM(c1 * (2 * less2 + c2)) AS t2,
               SUM(t * t * t - t) AS ties
        FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CAST(t2 AS DOUBLE) / 2, 6) AS u1,
           round(n1 * n2 - CAST(t2 AS DOUBLE) / 2, 6) AS u2,
           round((CAST(t2 AS DOUBLE) / 2 - CAST(n1 * n2 AS DOUBLE) / 2)
                 / sqrt(CAST(n1 * n2 AS DOUBLE) / 12
                        * ((n1 + n2 + 1)
                           - CAST(ties AS DOUBLE)
                             / ((n1 + n2) * (n1 + n2 - 1)))), 6) AS z,
           abs((CAST(t2 AS DOUBLE) / 2 - CAST(n1 * n2 AS DOUBLE) / 2)
               / sqrt(CAST(n1 * n2 AS DOUBLE) / 12
                      * ((n1 + n2 + 1)
                         - CAST(ties AS DOUBLE)
                           / ((n1 + n2) * (n1 + n2 - 1))))) > 1.96
             AS significant_05
    FROM agg
    """,
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U rank-sum test between the 'view' and
    'purchase' value samples, with the normal approximation z-score
    including the tie correction — the nonparametric sibling of
    stat_welch_ttest for drift gates that must not assume normality.

    U1 = sum over distinct values v of c1(v) * (#sample-2 < v +
    c2(v)/2), kept as the integer 2*U1 until the final division so
    every intermediate is exact. The cumulative "sample-2 below v"
    count is the SAME two-level decomposition as stat_ks_test
    (maintenance.py): exclusive running sums within each
    floor(value) bucket (thousands of independent partitions) plus an
    exclusive prefix over the tiny bucket-totals table — never a
    global single-partition window over the distinct-value stream.
    The oracle states the plain global-window form; both select
    identical integers, so the closed-form z hash-matches."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    from pyspark.sql import Window

    s = e.select(
        "value",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("in1"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("in2"),
    )
    by_v = s.groupBy("value").agg(
        F.sum("in1").alias("c1"), F.sum("in2").alias("c2")
    )
    b = by_v.withColumn("_bkt", F.floor("value").cast("long"))
    wl = Window.partitionBy("_bkt").orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = b.select(
        "_bkt", "c1", "c2",
        (F.col("c1") + F.col("c2")).alias("t"),
        F.coalesce(F.sum("c2").over(wl), F.lit(0)).alias("_l2"),
    )
    bt = b.groupBy("_bkt").agg(F.sum("c2").alias("_b2"))
    wo = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bt.select(
        "_bkt", F.coalesce(F.sum("_b2").over(wo), F.lit(0)).alias("_o2")
    )
    cum = local.join(F.broadcast(off), "_bkt").select(
        "c1", "c2", "t", (F.col("_o2") + F.col("_l2")).alias("less2")
    )
    agg = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("less2") + F.col("c2"))).alias("t2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = F.col("t2").cast("double") / 2
    mu = (n1 * n2).cast("double") / 2
    sigma = F.sqrt(
        (n1 * n2).cast("double") / 12
        * (
            (n1 + n2 + 1)
            - F.col("ties").cast("double") / ((n1 + n2) * (n1 + n2 - 1))
        )
    )
    z = (u1 - mu) / sigma
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u1, 6).alias("u1"),
        F.round(n1 * n2 - u1, 6).alias("u2"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).alias("significant_05"),
    )


@register(
    "stat_entropy_mi",
    oracle="""
    WITH joint AS (
        SELECT event_type AS x, CAST(floor(value / 20) AS BIGINT) AS y,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    n AS (SELECT SUM(c) AS n FROM joint),
    hx AS (
        SELECT CAST(SUM(CAST(-(CAST(cx AS DOUBLE) / n)
                             * log2(CAST(cx AS DOUBLE) / n)
                             AS DECIMAL(27,6))) AS DOUBLE) AS h
        FROM (SELECT x, SUM(c) AS cx FROM joint GROUP BY x), n
    ),
    hy AS (
        SELECT CAST(SUM(CAST(-(CAST(cy AS DOUBLE) / n)
                             * log2(CAST(cy AS DOUBLE) / n)
                             AS DECIMAL(27,6))) AS DOUBLE) AS h
        FROM (SELECT y, SUM(c) AS cy FROM joint GROUP BY y), n
    ),
    hxy AS (
        SELECT CAST(SUM(CAST(-(CAST(c AS DOUBLE) / n)
                             * log2(CAST(c AS DOUBLE) / n)
                             AS DECIMAL(27,6))) AS DOUBLE) AS h
        FROM joint, n
    )
    SELECT round(hx.h, 6) AS h_x, round(hy.h, 6) AS h_y,
           round(hxy.h, 6) AS h_xy,
           round(hx.h + hy.h - hxy.h, 6) AS mutual_info,
           CAST((SELECT n FROM n) AS BIGINT) AS n
    FROM hx, hy, hxy
    """,
)
def stat_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of event_type (X), of the value-ventile bucket
    (Y), of their joint, and the mutual information I(X;Y) =
    H(X)+H(Y)-H(XY) — the dependence screen a feature-selection or
    mix-balancing pass runs over a corpus.

    Scale shape: ONE groupBy collapses the stream to the joint
    contingency table (|types| x |buckets| ~ 100 rows); marginals and
    all three entropies are arithmetic over that tiny table with
    broadcast scalar joins. Each -p*log2(p) term is truncated to
    DECIMAL(27,6) before summing (the repo's exact-sum discipline) so
    the sums are order-independent and hash-match DuckDB."""
    e = load_table(spark, sf_dir, "events")
    # The joint table feeds four consumers (both marginals, the joint
    # entropy, the total); materialize the ~100-row result once so the
    # 100 TB stream is scanned exactly once, not four times.
    joint = (
        e.groupBy(
            F.col("event_type").alias("x"),
            F.floor(F.col("value") / 20).cast("long").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(materialize)
    )
    n = joint.agg(F.sum("c").alias("n"))

    def _h(df: DataFrame, cnt: str) -> DataFrame:
        p = F.col(cnt).cast("double") / F.col("n")
        term = (-p * F.log2(p)).cast("decimal(27,6)")
        return df.crossJoin(F.broadcast(n)).agg(
            F.sum(term).cast("double").alias("h")
        )

    hx = _h(joint.groupBy("x").agg(F.sum("c").alias("cx")), "cx")
    hy = _h(joint.groupBy("y").agg(F.sum("c").alias("cy")), "cy")
    hxy = _h(joint, "c")
    return (
        hx.select(F.col("h").alias("_hx"))
        .crossJoin(hy.select(F.col("h").alias("_hy")))
        .crossJoin(hxy.select(F.col("h").alias("_hxy")))
        .crossJoin(F.broadcast(n))
        .select(
            F.round("_hx", 6).alias("h_x"),
            F.round("_hy", 6).alias("h_y"),
            F.round("_hxy", 6).alias("h_xy"),
            F.round(F.col("_hx") + F.col("_hy") - F.col("_hxy"), 6).alias(
                "mutual_info"
            ),
            F.col("n").cast("long").alias("n"),
        )
    )


@register(
    "stat_gini_concentration",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS ck,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS r
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r, ck) AS i FROM rev
    ),
    agg AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(r AS DECIMAL(27,6))) AS DOUBLE) AS tot,
               CAST(SUM(CAST(r / 1000 AS DECIMAL(27,6))) AS DOUBLE) AS tot_k,
               CAST(SUM(CAST(i * (r / 1000) AS DECIMAL(27,6))) AS DOUBLE) AS s
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(tot, 2) AS total_revenue,
           round(2 * s / (n * tot_k) - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM agg
    """,
)
def stat_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers:
    G = 2*sum(i * x_i)/(n * sum(x)) - (n+1)/n over revenues sorted
    ascending with rank i — the inequality gate a marketplace-health
    or data-mix audit runs.

    Scale shape: ranks are assigned WITHOUT a global sort via the
    histogram-bucket rank plan of stat_exact_quantiles_distributed:
    row_number only within each floor(rev/1000) bucket (independent
    tasks), offset by the exclusive prefix of the tiny bucket-counts
    table — so the 100 TB fact stream is first collapsed to one row
    per customer, then ranked with no single-partition window. The
    oracle states the plain ROW_NUMBER form; both assign identical
    ranks because the (rev, custkey) order is total. The i*x moment
    uses revenue IN THOUSANDS (Gini is scale-invariant, so the value
    is unchanged): rank x revenue products otherwise pass ~1e11,
    where Spark's shortest-string double->decimal cast can disagree
    with DuckDB's exact-binary conversion in the 6th decimal (see
    functions/compat.py's magnitude bound)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        dsum(F.col("o_totalprice")).alias("r")
    )
    b = rev.withColumn("_bkt", F.floor(F.col("r") / 1000).cast("long"))
    wl = Window.partitionBy("_bkt").orderBy("r", "ck")
    local = b.select("_bkt", "r", F.row_number().over(wl).alias("_rn"))
    bt = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    wo = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bt.select(
        "_bkt", F.coalesce(F.sum("_c").over(wo), F.lit(0)).alias("_base")
    )
    ranked = local.join(F.broadcast(off), "_bkt").select(
        "r", (F.col("_base") + F.col("_rn")).alias("i")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("r")).alias("tot"),
        dsum(F.col("r") / 1000).alias("tot_k"),
        dsum(F.col("i") * (F.col("r") / 1000)).alias("s"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round("tot", 2).alias("total_revenue"),
        F.round(
            2 * F.col("s") / (F.col("n") * F.col("tot_k"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "stat_benford_digits",
    oracle="""
    WITH d AS (
        SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                           AS VARCHAR), 1, 1) AS digit,
               COUNT(*) AS n_obs
        FROM lineitem WHERE l_extendedprice >= 1
        GROUP BY 1
    ),
    n AS (SELECT SUM(n_obs) AS n FROM d)
    SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
           round(CAST(n_obs AS DOUBLE) / n, 6) AS obs_share,
           round(log10(1 + CAST(1 AS DOUBLE)
                           / CAST(digit AS BIGINT)), 6) AS benford_share,
           round(abs(CAST(n_obs AS DOUBLE) / n
                     - log10(1 + CAST(1 AS DOUBLE)
                                 / CAST(digit AS BIGINT))), 6) AS gap
    FROM d, n ORDER BY digit
    """,
)
def stat_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of lineitem extended prices:
    observed leading-digit shares vs the Benford expectation
    log10(1 + 1/d) — the classic synthetic-data / fraud smell test a
    data-quality gate runs over monetary columns.

    Scale shape: the leading digit is string arithmetic on the
    integer part (no log-of-value bucketing, so no libm on the data
    path), one 9-row groupBy with map-side combine, and a broadcast
    scalar total. The expectation is closed-form per digit; shares
    are single integer divisions — engine-exact before round()."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") >= 1
    )
    d = li.groupBy(
        F.substring(
            F.floor("l_extendedprice").cast("long").cast("string"), 1, 1
        ).alias("digit")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    n = d.agg(F.sum("n_obs").alias("n"))
    obs = F.col("n_obs").cast("double") / F.col("n")
    ben = F.log10(1 + F.lit(1).cast("double") / F.col("digit").cast("long"))
    return (
        d.crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            F.round(obs, 6).alias("obs_share"),
            F.round(ben, 6).alias("benford_share"),
            F.round(F.abs(obs - ben), 6).alias("gap"),
        )
        .orderBy("digit")
    )


_CORR_COLS = ("l_quantity", "l_price_k", "l_discount", "l_tax")


def _corr_pair_sql(a: str, b: str) -> str:
    return f"""
    SELECT '{a}' AS x, '{b}' AS y, n,
           round((s_{a}_{b} - s_{a} * s_{b} / n) / (n - 1), 6) AS cov,
           round((n * s_{a}_{b} - s_{a} * s_{b})
                 / sqrt(n * s_{a}_{a} - s_{a} * s_{a})
                 / sqrt(n * s_{b}_{b} - s_{b} * s_{b}), 6) AS corr
    FROM m"""


def _corr_oracle() -> str:
    sums = ["COUNT(*) AS n"]
    for i, a in enumerate(_CORR_COLS):
        sums.append(
            f"CAST(SUM(CAST({a} AS DECIMAL(27,6))) AS DOUBLE) AS s_{a}"
        )
        for b in _CORR_COLS[i:]:
            sums.append(
                f"CAST(SUM(CAST({a} * {b} AS DECIMAL(27,6))) AS DOUBLE)"
                f" AS s_{a}_{b}"
            )
    pairs = [
        _corr_pair_sql(a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    return (
        "WITH meas AS (SELECT l_quantity, l_extendedprice / 1000 AS l_price_k,"
        " l_discount, l_tax FROM lineitem),\n"
        "    m AS (SELECT " + ", ".join(sums) + " FROM meas)"
        + "\n    UNION ALL".join(pairs)
        + "\n    ORDER BY x, y"
    )


@register("stat_cov_corr_matrix", oracle=_corr_oracle())
def stat_cov_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise sample covariance and Pearson correlation of the four
    lineitem measures — the feature-screening matrix, computed the
    one-pass way: a SINGLE aggregation produces all 15 sufficient
    statistics (count, 4 sums, 10 cross-moments) with map-side
    combine, and every (cov, corr) cell is closed-form arithmetic
    over them. Never calls F.corr/covar_samp (their internal double
    accumulation is partition-order-dependent); the DECIMAL(27,6)
    moment sums make both engines hash-match. The 15 wide-decimal
    accumulators cost ~3x a double-sum pass (Int128 arithmetic per
    row); a production run at 100 TB would flip the same plan to
    double moments and accept last-ulp drift — the oracle-exact form
    is the verification contract, not a semantic requirement.
    Price enters IN THOUSANDS (corr is scale-invariant; cov cells
    involving price are in k-units): raw squared prices sit at ~1e10,
    the edge of the shortest-string double->decimal hazard documented
    in functions/compat.py."""
    # spread=True: single-row-group fixture scans run the whole
    # 15-decimal-moment aggregation on ONE core without it (A/B: 8.8s
    # -> 3.3s, oracle hash unchanged; gate is a no-op at scale).
    # columns=: project BEFORE the spread exchange so it hashes and
    # carries the 4 measures, not all 16 lineitem columns (r14; guide
    # §2.3, VERDICT r13 #2).
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        spread=True,
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ).select(
        "l_quantity",
        (F.col("l_extendedprice") / 1000).alias("l_price_k"),
        "l_discount",
        "l_tax",
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(_CORR_COLS):
        aggs.append(dsum(F.col(a)).alias(f"s_{a}"))
        for b in _CORR_COLS[i:]:
            aggs.append(dsum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}"))
    m = li.agg(*aggs)
    # ONE projection emits all six cells from the single moment row
    # (a per-pair union would re-run the full aggregation per branch —
    # six stream scans; plan-audited)
    cells = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            n = F.col("n")
            sa, sb = F.col(f"s_{a}"), F.col(f"s_{b}")
            sab = F.col(f"s_{a}_{b}")
            saa, sbb = F.col(f"s_{a}_{a}"), F.col(f"s_{b}_{b}")
            cells.append(
                F.struct(
                    F.lit(a).alias("x"),
                    F.lit(b).alias("y"),
                    F.col("n").alias("n"),
                    F.round((sab - sa * sb / n) / (n - 1), 6).alias("cov"),
                    F.round(
                        (n * sab - sa * sb)
                        / F.sqrt(n * saa - sa * sa)
                        / F.sqrt(n * sbb - sb * sb),
                        6,
                    ).alias("corr"),
                )
            )
    return (
        m.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.x", "c.y", "c.n", "c.cov", "c.corr")
        .orderBy("x", "y")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap (round 7)

_B = 32  # bootstrap replicates
# Poisson(1) inverse-CDF thresholds: P(X <= k) for k = 0..6; u above the
# last threshold -> 7. Written as shared literals so Spark and DuckDB
# evaluate the identical CASE chain.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.9999167588507119",
)


def _boot_u_sql(b: int, dialect: str) -> str:
    """Uniform u(row, replicate) in [0, 1): six EXACT 20-bit windows per
    md5 digest (5 hex chars / 1048576.0 — no modulo bias), so 32
    replicates cost 6 hashes per row, not 32. Same math, two spellings
    (Spark has conv(); DuckDB casts a 0x literal)."""
    h, off = b // 6, 1 + 5 * (b % 6)
    if dialect == "spark":
        return (
            f"conv(substr(md5(concat(cast(o_orderkey AS string), ':{h}')),"
            f" {off}, 5), 16, 10) / 1048576.0"
        )
    return (
        f"(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':{h}'),"
        f" {off}, 5) AS BIGINT)) / 1048576.0"
    )


def _boot_w_sql(b: int, dialect: str) -> str:
    u = _boot_u_sql(b, dialect)
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE {arms} ELSE 7 END"


def _bootstrap_oracle() -> str:
    means = " UNION ALL ".join(
        f"SELECT {b} AS b, CAST(SUM(CAST(w{b} AS DECIMAL(2,0)) * x) AS DOUBLE)"
        f" / SUM(w{b}) AS mean FROM w"
        for b in range(_B)
    )
    ws = ", ".join(f"{_boot_w_sql(b, 'duck')} AS w{b}" for b in range(_B))
    return f"""
    WITH w AS (
        SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x, {ws} FROM orders
    ),
    means AS ({means}),
    m6 AS (SELECT CAST(mean AS DECIMAL(18,3)) AS md FROM means),
    summary AS (
        SELECT round(quantile_cont(CAST(md AS DOUBLE), 0.025), 6) AS ci_lo,
               round(quantile_cont(CAST(md AS DOUBLE), 0.5), 6) AS ci_med,
               round(quantile_cont(CAST(md AS DOUBLE), 0.975), 6) AS ci_hi,
               round(sqrt((CAST(SUM(md * md) AS DOUBLE)
                           - CAST(SUM(md) AS DOUBLE)
                             * CAST(SUM(md) AS DOUBLE) / {_B}.0)
                          / {float(_B - 1)}), 6) AS se_boot
        FROM m6
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
           (SELECT round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE) / COUNT(*), 6) FROM orders)
             AS mean_full,
           ci_lo, ci_med, ci_hi, se_boot
    FROM summary
    """


_WIDE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _bootstrap_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed portion of the bootstrap: ONE row of 66 exact
    sums from one scan (plan-shape-asserted in tests/test_plans.py).
    Weight expressions are parsed from SQL text in one py4j call each —
    composing the 7-arm CASEs via the Column API cost ~2.3s of driver
    time per build (measured). The analyzed DataFrame is cached per
    (session, sf_dir) — the prepared-statement pattern: whole-stage
    codegen of the 33-column weight projection costs ~4.5s of Janino
    compile on every FRESH plan (the codegen cache misses across
    rebuilds), while re-executing the cached plan costs ~0.07s."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _WIDE_CACHE.get(key)
    if cached is not None:
        return cached
    o = load_table(spark, sf_dir, "orders")
    proj = o.select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        *[F.expr(_boot_w_sql(b, "spark")).alias(f"w{b}") for b in range(_B)],
    )
    aggs = []
    for b in range(_B):
        aggs.append(F.sum(F.col(f"w{b}") * F.col("x")).alias(f"sx{b}"))
        aggs.append(F.sum(f"w{b}").alias(f"sw{b}"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    aggs.append(F.sum("x").alias("sx_full"))
    _WIDE_CACHE[key] = proj.agg(*aggs)
    return _WIDE_CACHE[key]


def _bootstrap_summary_df(spark: SparkSession, row) -> DataFrame:
    """Driver-side bootstrap summary over the one wide-sum row,
    replicating the oracle SQL's double arithmetic operation by
    operation (decimal->double casts are correctly-rounded in both
    Python and the JVM; round() is HALF_UP like Spark's/DuckDB's)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r6(v: float) -> float:
        return float(
            Decimal(v).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    mds = []
    for b in range(_B):
        mean = float(row[f"sx{b}"]) / row[f"sw{b}"]
        mds.append(
            Decimal(mean).quantize(Decimal("0.001"), rounding=ROUND_HALF_UP)
        )
    vals = sorted(float(m) for m in mds)

    def qcont(p: float) -> float:
        # identical op order to Spark percentile / DuckDB quantile_cont
        h = (_B - 1) * p
        lo, hi = math.floor(h), math.ceil(h)
        if lo == hi:
            return vals[lo]
        return (hi - h) * vals[lo] + (h - lo) * vals[hi]

    s_md = sum(mds)  # exact decimal sums, order-independent
    s_md2 = sum(m * m for m in mds)
    var = (float(s_md2) - float(s_md) * float(s_md) / float(_B)) / float(_B - 1)
    n = row["n_rows"]
    out = (
        int(n),
        r6(float(row["sx_full"]) / n),
        r6(qcont(0.025)),
        r6(qcont(0.5)),
        r6(qcont(0.975)),
        r6(math.sqrt(var)),
    )
    return spark.createDataFrame(
        [out],
        "n_rows long, mean_full double, ci_lo double, ci_med double, "
        "ci_hi double, se_boot double",
    )


@register("stat_bootstrap_ci", oracle=_bootstrap_oracle())
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean(o_totalprice) —
    THE distributed bootstrap: classical resampling needs the whole
    sample on one machine per replicate, but drawing each row's
    replicate multiplicity from Poisson(1) (the n->inf limit of
    Binomial(n, 1/n)) makes all B=32 replicates ONE aggregation pass
    with O(2B) numbers of state per task, map-side combined — no
    resample materialization, no shuffle of rows. Weights come from
    md5-derived exact 20-bit uniforms (six draws per digest) pushed
    through the shared inverse-CDF literals, so both engines draw the
    identical pseudo-sample. Replicate means truncate to
    DECIMAL(18,3); the CI percentiles and SE are closed forms over
    those 32 exact values — bit-reproducible end to end.

    Scale shape: one wide aggregate over the fact table (64 exact
    sums, map-side combined) is the ONLY data-sized work; the
    32-number summary is driver arithmetic on the single collected row
    (bounded O(B), same justification as the CMS sketch-bytes collect
    in aggregates.py — a Spark explode+aggregate stage over that row
    costs multi-second plan processing per build for zero scalability
    benefit, measured)."""
    row = _bootstrap_wide(spark, sf_dir).collect()[0]
    return _bootstrap_summary_df(spark, row)


# ---------------------------------------------------------------------------
# Multivariate OLS via normal equations (round 7)


@register(
    "stat_ols_multivariate",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s11,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s12,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s22,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1y,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2y,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    ),
    c AS (
        SELECT l_returnflag, n, s1, s2, sy,
               s11 - s1 * s1 / n AS c11,
               s12 - s1 * s2 / n AS c12,
               s22 - s2 * s2 / n AS c22,
               s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y,
               syy - sy * sy / n AS cyy
        FROM s
    ),
    b AS (
        SELECT l_returnflag, n, s1, s2, sy, c1y, c2y, cyy,
               (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
               (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
        FROM c
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round(b1, 6) AS beta_qty,
           round(b2, 6) AS beta_discount,
           round((sy - b1 * s1 - b2 * s2) / n, 6) AS intercept,
           round((b1 * c1y + b2 * c2y) / cyy, 6) AS r2
    FROM b ORDER BY l_returnflag
    """,
)
def stat_ols_multivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS (price ~ quantity + discount per return flag)
    fit in ONE aggregation pass: the 3x3 normal equations need only
    ten sufficient statistics (counts + exact cross-product sums), all
    map-side combinable with O(1) state — the distributed closed-form
    fit, vs. the naive gradient/two-pass approaches that rescan.
    The 2-feature system is solved in closed form (centered Cramer's
    rule), every product written in the SAME operation order as the
    oracle SQL over the SAME exact-decimal sums, so the double
    arithmetic is bit-identical and round(6) is cosmetic.
    Generalizes to d features as a d^2-entry Gram vector (see
    embed_pca_power for the d x d variant)."""
    # spread=True: the ten decimal cross-moment sums otherwise fold
    # single-threaded into the one-row-group scan (A/B: -0.46s).
    # columns=: the exchange carries the 4 read columns, not 16 (r14).
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        spread=True,
        columns=["l_returnflag", "l_quantity", "l_discount", "l_extendedprice"],
    )
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    x1, x2, y = d("l_quantity"), d("l_discount"), d("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * x1).cast("double").alias("s11"),
        F.sum(x1 * x2).cast("double").alias("s12"),
        F.sum(x2 * x2).cast("double").alias("s22"),
        F.sum(x1 * y).cast("double").alias("s1y"),
        F.sum(x2 * y).cast("double").alias("s2y"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    c = s.select(
        "l_returnflag",
        "n",
        "s1",
        "s2",
        "sy",
        (F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("c11"),
        (F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("c12"),
        (F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("c22"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b = c.select(
        "l_returnflag",
        "n",
        "s1",
        "s2",
        "sy",
        "c1y",
        "c2y",
        "cyy",
        ((F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det).alias("b1"),
        ((F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det).alias("b2"),
    )
    return b.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round("b1", 6).alias("beta_qty"),
        F.round("b2", 6).alias("beta_discount"),
        F.round(
            (F.col("sy") - F.col("b1") * F.col("s1") - F.col("b2") * F.col("s2"))
            / F.col("n"),
            6,
        ).alias("intercept"),
        F.round(
            (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y")) / F.col("cyy"),
            6,
        ).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "stat_proportions_ab",
    oracle="""
    WITH u AS (
        SELECT user_id % 2 = 0 AS treated,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) >= 3
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT treated,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS k
        FROM u GROUP BY treated
    ),
    w AS (
        SELECT MAX(CASE WHEN treated THEN n END) AS n1,
               MAX(CASE WHEN treated THEN k END) AS k1,
               MAX(CASE WHEN NOT treated THEN n END) AS n2,
               MAX(CASE WHEN NOT treated THEN k END) AS k2
        FROM g
    )
    SELECT n1, k1, n2, k2,
           round(CAST(k1 AS DOUBLE) / n1, 6) AS p1,
           round(CAST(k2 AS DOUBLE) / n2, 6) AS p2,
           round((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)
                 / NULLIF(sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                               * (1.0 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                               * (1.0 / n1 + 1.0 / n2)), 0.0), 6) AS z
    FROM w
    """,
)
def stat_proportions_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on user conversion (>= 3 purchases;
    did the treated half convert at a different rate?) — the A/B readout that pairs with
    stat_welch_ttest (means) and events_did_lift (quasi-experimental):
    per-user conversion flags collapse the stream (one shuffle on
    user_id), group sizes and successes are one conditional aggregate
    over that table, and z = (p1-p2)/sqrt(p(1-p)(1/n1+1/n2)) with the
    pooled p is pure integer-ratio arithmetic — deterministic to the
    bit, stated in the identical op order in both engines."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 3
        )
        .cast("int")
        .alias("converted"),
    ).select(
        (F.col("user_id") % 2 == 0).alias("treated"), "converted"
    )
    g = u.groupBy("treated").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("k")
    )

    def pick(flag: bool, col: str):
        return F.max(F.when(F.col("treated") == flag, F.col(col)))

    w = g.agg(
        pick(True, "n").alias("n1"),
        pick(True, "k").alias("k1"),
        pick(False, "n").alias("n2"),
        pick(False, "k").alias("k2"),
    )
    p1 = F.col("k1").cast("double") / F.col("n1")
    p2 = F.col("k2").cast("double") / F.col("n2")
    pp = (F.col("k1") + F.col("k2")).cast("double") / (F.col("n1") + F.col("n2"))
    return w.select(
        "n1",
        "k1",
        "n2",
        "k2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        # NULL z when the pooled proportion is degenerate (all or no
        # users converted) — both engines state the same NULLIF guard.
        F.round(
            F.try_divide(
                p1 - p2,
                F.nullif(
                    F.sqrt(
                        pp
                        * (1.0 - pp)
                        * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
                    ),
                    F.lit(0.0),
                ),
            ),
            6,
        ).alias("z"),
    )


@register(
    "stat_spearman_rho",
    oracle="""
    WITH r AS (
        SELECT l_returnflag AS flag,
               l_extendedprice AS x, l_quantity AS y,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice,
                                           l_orderkey, l_linenumber) AS rx,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity,
                                           l_orderkey, l_linenumber) AS ry
        FROM lineitem
    ),
    ax AS (SELECT flag, x, (2 * SUM(rx)) // COUNT(*) AS ar2x
           FROM r GROUP BY flag, x),
    ay AS (SELECT flag, y, (2 * SUM(ry)) // COUNT(*) AS ar2y
           FROM r GROUP BY flag, y),
    j AS (
        SELECT r.flag, ax.ar2x, ay.ar2y
        FROM r JOIN ax ON ax.flag = r.flag AND ax.x = r.x
               JOIN ay ON ay.flag = r.flag AND ay.y = r.y
    ),
    m AS (
        SELECT flag, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(ar2x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ar2y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(ar2x AS DECIMAL(18,0))
                        * CAST(ar2x AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(ar2y AS DECIMAL(18,0))
                        * CAST(ar2y AS DECIMAL(18,0))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(ar2x AS DECIMAL(18,0))
                        * CAST(ar2y AS DECIMAL(18,0))) AS DOUBLE) AS sxy
        FROM j GROUP BY flag
    )
    SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS rho_spearman
    FROM m ORDER BY l_returnflag
    """,
)
def stat_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of price vs quantity per return flag
    — the robust (monotone-invariant) complement of the Pearson
    queries: Pearson over tie-averaged ranks. Ranks stay INTEGER-exact
    end to end: row_numbers come from the grouped histogram-bucket
    plan (functions/ranks.py — never a whole-group sort on a 3-value
    key), tie-averaged ranks are doubled so they stay integral
    ((2*sum(rn)) div count — k consecutive row_numbers always sum to
    k*(min+max)/2), and the final rho is one closed form over exact
    decimal moment sums, identical op order in both engines (the
    oracle's flat per-flag windows state the same math at fixture
    scale).

    Scale shape: two grouped bucketed rank passes, then tie averages
    as windows over the (flag, value) tie slices on the SAME pipeline
    — no groupBy + join-back, which would consume (and re-execute)
    the rank chain three times. No window ever holds more than one
    (flag, metric, bucket) or (flag, value) slice."""
    from gpu_database_spark.functions.ranks import grouped_bucketed_row_number

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    # Both rank passes chain over ONE frame (the helper carries all
    # columns through) — joining two separately-ranked copies back on
    # (l_orderkey, l_linenumber) would be wrong: the fixture key is
    # NOT unique, and row_number is only value-deterministic, so the
    # tie-averaged group sums are the invariant, not the row pairing.
    r = grouped_bucketed_row_number(
        grouped_bucketed_row_number(
            li, ["flag"], "x", ["l_orderkey", "l_linenumber"],
            F.floor(F.col("x") / 2000.0), rank_col="rx",
        ),
        ["flag"], "y", ["l_orderkey", "l_linenumber"],
        F.floor(F.col("y")), rank_col="ry",
    )
    # Tie-averaging as WINDOWS over the tie groups, not groupBy +
    # join-back: the two joins consumed `r` three times, re-executing
    # the whole two-rank chain per consumer (measured 51.6s at the
    # 60M-row sf10 fixture vs 26s this way). Same integral math:
    # (2*SUM(rn)) div COUNT(*) over each (flag, value) tie slice.
    # Tie-slice rank sums accumulate in DECIMAL(38,0) (ml_eval_auc's
    # discipline): with heavy ties SUM(rn) approaches n^2/2 per
    # (flag, value) slice — past BIGINT at corpus scale; the `div`
    # result is an in-range BIGINT-magnitude value again.
    d38 = "decimal(38,0)"
    wx = Window.partitionBy("flag", "x")
    wy = Window.partitionBy("flag", "y")
    j = (
        r.withColumn("_sx2", F.lit(2) * F.sum(F.col("rx").cast(d38)).over(wx))
        .withColumn("_cx", F.count(F.lit(1)).over(wx))
        .withColumn("_sy2", F.lit(2) * F.sum(F.col("ry").cast(d38)).over(wy))
        .withColumn("_cy", F.count(F.lit(1)).over(wy))
        .withColumn("ar2x", F.expr("_sx2 div _cx"))
        .withColumn("ar2y", F.expr("_sy2 div _cy"))
    )
    dx = F.col("ar2x").cast("decimal(18,0)")
    dy = F.col("ar2y").cast("decimal(18,0)")
    m = j.groupBy("flag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return m.select(
        F.col("flag").alias("l_returnflag"),
        n.cast("long").alias("n"),
        F.round(
            (n * F.col("sxy") - sx * sy)
            / F.sqrt(
                (n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)
            ),
            6,
        ).alias("rho_spearman"),
    ).orderBy("l_returnflag")


@register(
    "stat_cohens_kappa",
    oracle=f"""
    WITH r AS (
        SELECT {_LABEL_SQL} AS a,
               CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS b
        FROM orders
    ),
    c AS (SELECT COUNT(*) AS n,
                 CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n11,
                 CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n10,
                 CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n01,
                 CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n00
          FROM r)
    SELECT n, n11, n10, n01, n00,
           round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_obs,
           round(CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                      + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
                 / CAST(n AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_exp,
           round((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                         + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
                    / CAST(n AS DOUBLE) / CAST(n AS DOUBLE))
                 / (1.0 - CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                               + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
                          / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS kappa
    FROM c
    """,
)
def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two binary
    raters: kappa = (p_obs - p_exp) / (1 - p_exp) from the 2x2
    confusion counts. The inter-annotator-agreement grade every
    labeling/RLHF pipeline computes before trusting its labels; the
    two deterministic raters here (priority-derived vs price-derived
    flags) stand in for two annotation sources over a corpus.

    Scale shape: the entire statistic reduces to FOUR conditional
    counts in ONE map-side-combinable aggregation pass — O(1) state
    per task, no shuffle beyond the single-row combine. Marginals
    multiply as BIGINTs (exact), and the division order matches the
    oracle so kappa hash-matches bit for bit."""
    r = load_table(spark, sf_dir, "orders").select(
        _label_col().alias("a"),
        F.when(F.col("o_totalprice") >= 150000, 1).otherwise(0).alias("b"),
    )
    c = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 1)).cast("int"))
        .cast("long")
        .alias("n11"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("int"))
        .cast("long")
        .alias("n10"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 1)).cast("int"))
        .cast("long")
        .alias("n01"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 0)).cast("int"))
        .cast("long")
        .alias("n00"),
    )
    nd = F.col("n").cast("double")
    p_obs = (F.col("n11") + F.col("n00")).cast("double") / nd
    # Marginal products approach n^2 — DECIMAL(38,0) keeps them exact
    # past BIGINT range (the oracle uses HUGEINT), ONE cast to double
    # at the end on both sides.
    d38 = "decimal(38,0)"
    exp_num = (
        (F.col("n11") + F.col("n10")).cast(d38)
        * (F.col("n11") + F.col("n01")).cast(d38)
        + (F.col("n01") + F.col("n00")).cast(d38)
        * (F.col("n10") + F.col("n00")).cast(d38)
    ).cast("double")
    p_exp = exp_num / nd / nd
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(p_obs, 6).alias("p_obs"),
        F.round(p_exp, 6).alias("p_exp"),
        F.round((p_obs - p_exp) / (F.lit(1.0) - p_exp), 6).alias("kappa"),
    )


@register(
    "stat_brown_forsythe",
    oracle="""
    WITH x AS (
        SELECT l_returnflag AS grp, l_extendedprice AS v,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice,
                                           l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n_j
        FROM lineitem
    ),
    med AS (
        -- exact decimal median: average of the two middle order
        -- statistics (prices are 2dp, so med has <= 3dp and z below
        -- is EXACT in DECIMAL — no double rounding anywhere)
        SELECT grp,
               CAST(SUM(CASE WHEN rn IN ((n_j + 1) // 2, n_j // 2 + 1)
                             THEN CAST(v AS DECIMAL(27,6)) END)
                    / COUNT(CASE WHEN rn IN ((n_j + 1) // 2, n_j // 2 + 1)
                                 THEN 1 END) AS DECIMAL(27,6)) AS med
        FROM x GROUP BY grp
    ),
    z AS (
        SELECT x.grp,
               abs(CAST(x.v AS DECIMAL(27,6)) - med.med) AS z
        FROM x JOIN med ON x.grp = med.grp
    ),
    g AS (
        SELECT grp, COUNT(*) AS n_j,
               CAST(SUM(z) AS DOUBLE) AS s1,
               CAST(SUM(CAST(z AS DECIMAL(19,6))
                        * CAST(z AS DECIMAL(19,6))) AS DOUBLE) AS s2
        FROM z GROUP BY grp
    ),
    t AS (
        -- per-flag pivot: the ssb/ssw folds below run in FIXED
        -- textual order (A, N, R), so the double sums are
        -- bit-identical across engines (a commutative SUM over
        -- groups drifts by one ulp at 1e12 magnitude)
        SELECT CAST(SUM(n_j) AS BIGINT) AS n, COUNT(*) AS k,
               CAST(SUM(CAST(s1 AS DECIMAL(27,6))) AS DOUBLE) AS s1_all,
               MAX(CASE WHEN grp = 'A' THEN s1 END) AS s1a,
               MAX(CASE WHEN grp = 'N' THEN s1 END) AS s1n,
               MAX(CASE WHEN grp = 'R' THEN s1 END) AS s1r,
               MAX(CASE WHEN grp = 'A' THEN s2 END) AS s2a,
               MAX(CASE WHEN grp = 'N' THEN s2 END) AS s2n,
               MAX(CASE WHEN grp = 'R' THEN s2 END) AS s2r,
               MAX(CASE WHEN grp = 'A' THEN CAST(n_j AS DOUBLE) END) AS na,
               MAX(CASE WHEN grp = 'N' THEN CAST(n_j AS DOUBLE) END) AS nn,
               MAX(CASE WHEN grp = 'R' THEN CAST(n_j AS DOUBLE) END) AS nr
        FROM g
    )
    SELECT n, k,
           round(s1a / na, 6) AS mad_a,
           round(s1n / nn, 6) AS mad_n,
           round(s1r / nr, 6) AS mad_r,
           round((((s1a * s1a / na + s1n * s1n / nn + s1r * s1r / nr)
                   - s1_all * s1_all / CAST(n AS DOUBLE))
                  / CAST(k - 1 AS DOUBLE))
                 / (((s2a - s1a * s1a / na) + (s2n - s1n * s1n / nn)
                     + (s2r - s1r * s1r / nr))
                    / CAST(n - k AS DOUBLE)), 6) AS f_stat
    FROM t
    """,
)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene's test with MEDIAN centers) for
    homogeneity of variances across groups: z_ij = |x_ij - median_j|,
    then the one-way-ANOVA F statistic over the z's — the robust
    pre-check before pooling variances (Welch's t sidesteps it for 2
    groups; this grades k groups at once, median-centered so heavy
    tails don't inflate the test).

    Scale shape: group medians come from the grouped histogram-bucket
    rank plan (even-n median = the average of the two middle order
    statistics, DuckDB's interpolation rule) and broadcast back; both
    ANOVA sums accumulate in exact DECIMAL(27,6); between/within sums
    of squares use the computational identity (ss = s2 - s1^2/n), so
    the whole test costs two aggregation passes and zero sorts."""
    from gpu_database_spark.functions.ranks import (
        grouped_bucketed_row_number,
    )

    x = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    r = grouped_bucketed_row_number(
        x, ["grp"], "v", ["l_orderkey", "l_linenumber"],
        F.floor(F.col("v") / 2000.0), rank_col="rn",
    )
    # counts come from the raw frame: deriving them from `r` would
    # execute the whole rank plan once more just to count rows
    cnt = x.groupBy("grp").agg(F.count(F.lit(1)).alias("n_j"))
    mid = cnt.select(
        "grp",
        F.expr("(n_j + 1) div 2").alias("lo"),
        F.expr("(n_j div 2) + 1").alias("hi"),
    )
    d27 = "decimal(27,6)"
    # exact decimal median (2dp prices -> <=3dp median -> z exact)
    med = (
        r.join(F.broadcast(mid), "grp")
        .filter((F.col("rn") == F.col("lo")) | (F.col("rn") == F.col("hi")))
        .groupBy("grp")
        .agg(
            (F.sum(F.col("v").cast(d27)) / F.count(F.lit(1)))
            .cast(d27)
            .alias("med")
        )
    )
    z = x.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("v").cast(d27) - F.col("med")).alias("z")
    )
    d19 = "decimal(19,6)"
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("z").cast("double").alias("s1"),
        F.sum(F.col("z").cast(d19) * F.col("z").cast(d19))
        .cast("double")
        .alias("s2"),
    )
    njd = F.col("n_j").cast("double")

    def pick(col: str, flag: str) -> F.Column:
        return F.max(F.when(F.col("grp") == flag, F.col(col)))

    # per-flag pivot so the ssb/ssw folds run in FIXED (A, N, R)
    # order — a commutative SUM over groups drifts by one ulp at
    # 1e12 magnitude and breaks the 6dp hash gate
    t = g.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("s1").cast(d27)).cast("double").alias("s1_all"),
        pick("s1", "A").alias("s1a"),
        pick("s1", "N").alias("s1n"),
        pick("s1", "R").alias("s1r"),
        pick("s2", "A").alias("s2a"),
        pick("s2", "N").alias("s2n"),
        pick("s2", "R").alias("s2r"),
        F.max(F.when(F.col("grp") == "A", njd)).alias("na"),
        F.max(F.when(F.col("grp") == "N", njd)).alias("nn"),
        F.max(F.when(F.col("grp") == "R", njd)).alias("nr"),
    )
    nd = F.col("n").cast("double")
    ssb_part = (
        F.col("s1a") * F.col("s1a") / F.col("na")
        + F.col("s1n") * F.col("s1n") / F.col("nn")
        + F.col("s1r") * F.col("s1r") / F.col("nr")
    )
    ssb = ssb_part - F.col("s1_all") * F.col("s1_all") / nd
    ssw = (
        (F.col("s2a") - F.col("s1a") * F.col("s1a") / F.col("na"))
        + (F.col("s2n") - F.col("s1n") * F.col("s1n") / F.col("nn"))
        + (F.col("s2r") - F.col("s1r") * F.col("s1r") / F.col("nr"))
    )
    # Output contract: only O(1)-to-O(1e4) magnitude doubles survive
    # to the result — the raw sums of squares live at ~1e13, where
    # even CAST(exact-decimal AS DOUBLE) differs by an ulp across
    # engines (measured: identical DECIMAL s2, last-bit double drift)
    return t.select(
        "n",
        "k",
        F.round(F.col("s1a") / F.col("na"), 6).alias("mad_a"),
        F.round(F.col("s1n") / F.col("nn"), 6).alias("mad_n"),
        F.round(F.col("s1r") / F.col("nr"), 6).alias("mad_r"),
        F.round(
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("n") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
    )


@register(
    "stat_anova_oneway",
    oracle="""
    WITH g AS (
        SELECT l_returnflag AS grp, COUNT(*) AS n_j,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
        FROM lineitem GROUP BY l_returnflag
    ),
    t AS (
        SELECT CAST(SUM(n_j) AS BIGINT) AS n, COUNT(*) AS k,
               CAST(SUM(s1) AS DOUBLE) AS s1_all,
               MAX(CASE WHEN grp = 'A' THEN CAST(s1 AS DOUBLE) END) AS s1a,
               MAX(CASE WHEN grp = 'N' THEN CAST(s1 AS DOUBLE) END) AS s1n,
               MAX(CASE WHEN grp = 'R' THEN CAST(s1 AS DOUBLE) END) AS s1r,
               MAX(CASE WHEN grp = 'A' THEN CAST(s2 AS DOUBLE) END) AS s2a,
               MAX(CASE WHEN grp = 'N' THEN CAST(s2 AS DOUBLE) END) AS s2n,
               MAX(CASE WHEN grp = 'R' THEN CAST(s2 AS DOUBLE) END) AS s2r,
               MAX(CASE WHEN grp = 'A' THEN CAST(n_j AS DOUBLE) END) AS na,
               MAX(CASE WHEN grp = 'N' THEN CAST(n_j AS DOUBLE) END) AS nn,
               MAX(CASE WHEN grp = 'R' THEN CAST(n_j AS DOUBLE) END) AS nr
        FROM g
    ),
    f AS (
        SELECT n, k, s1a, s1n, s1r, na, nn, nr,
               (s1a * s1a / na + s1n * s1n / nn + s1r * s1r / nr)
                   - s1_all * s1_all / CAST(n AS DOUBLE) AS ssb,
               ((s2a - s1a * s1a / na) + (s2n - s1n * s1n / nn)
                + (s2r - s1r * s1r / nr)) AS ssw
        FROM t
    )
    SELECT n, k,
           round(s1a / na, 6) AS mean_a,
           round(s1n / nn, 6) AS mean_n,
           round(s1r / nr, 6) AS mean_r,
           round((ssb / CAST(k - 1 AS DOUBLE))
                 / (ssw / CAST(n - k AS DOUBLE)), 6) AS f_stat,
           round(ssb / (ssb + ssw), 6) AS eta_sq
    FROM f
    """,
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order quantity across return-flag groups:
    F = (SSB/(k-1)) / (SSW/(n-k)) from the computational identities
    SSW = sum_g (s2_g - s1_g^2/n_g), SSB = sum_g s1_g^2/n_g - S^2/n,
    plus eta-squared (SSB / SST), the effect-size companion.

    Scale shape: ONE map-side-combinable groupBy collapses the fact
    table to k=3 sufficient-statistic rows; everything after is
    arithmetic on a pivoted single row. l_quantity is integer-valued,
    so s1/s2 are EXACT BIGINTs (s2 <= 2500*n stays in BIGINT to
    n ~ 3.7e15 rows — past 100 TB); the pivot fixes the textual fold
    order (A, N, R) so the double arithmetic is bit-identical across
    engines, and only O(1)-magnitude ratios (means, F, eta^2) survive
    to the output — raw 1e13+ sums never do (they round unstably;
    see stat_brown_forsythe's measured ulp note).

    Reference tie-in: no statistics surface in the reference CUDA KV
    store (src/cuda/hashTable.cuh); part of the drift-gate layer the
    build brief adds."""
    g = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("grp"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_j"),
            F.sum("q").alias("s1"),
            F.sum(F.col("q") * F.col("q")).alias("s2"),
        )
    )

    def pick(col: str, grp: str) -> F.Column:
        return F.max(
            F.when(F.col("grp") == grp, F.col(col).cast("double"))
        ).alias(f"{col}{grp.lower()}")

    t = g.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s1").cast("double").alias("s1_all"),
        pick("s1", "A"), pick("s1", "N"), pick("s1", "R"),
        pick("s2", "A"), pick("s2", "N"), pick("s2", "R"),
        pick("n_j", "A"), pick("n_j", "N"), pick("n_j", "R"),
    )
    nd = F.col("n").cast("double")
    ssb = (
        F.col("s1a") * F.col("s1a") / F.col("n_ja")
        + F.col("s1n") * F.col("s1n") / F.col("n_jn")
        + F.col("s1r") * F.col("s1r") / F.col("n_jr")
    ) - F.col("s1_all") * F.col("s1_all") / nd
    ssw = (
        (F.col("s2a") - F.col("s1a") * F.col("s1a") / F.col("n_ja"))
        + (F.col("s2n") - F.col("s1n") * F.col("s1n") / F.col("n_jn"))
        + (F.col("s2r") - F.col("s1r") * F.col("s1r") / F.col("n_jr"))
    )
    f = t.select(
        "n", "k", "s1a", "s1n", "s1r", "n_ja", "n_jn", "n_jr",
        ssb.alias("ssb"), ssw.alias("ssw"),
    )
    return f.select(
        "n",
        "k",
        F.round(F.col("s1a") / F.col("n_ja"), 6).alias("mean_a"),
        F.round(F.col("s1n") / F.col("n_jn"), 6).alias("mean_n"),
        F.round(F.col("s1r") / F.col("n_jr"), 6).alias("mean_r"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1).cast("double"))
            / (F.col("ssw") / (F.col("n") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )


@register(
    "stat_kruskal_wallis",
    oracle="""
    WITH hist AS (
        SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS n_v,
               COUNT(*) FILTER (WHERE l_returnflag = 'A') AS ca,
               COUNT(*) FILTER (WHERE l_returnflag = 'N') AS cn,
               COUNT(*) FILTER (WHERE l_returnflag = 'R') AS cr
        FROM lineitem GROUP BY 1
    ),
    r AS (
        SELECT v, n_v, ca, cn, cr,
               2 * COALESCE(SUM(n_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + n_v + 1 AS ar2,
               n_v * n_v * n_v - n_v AS tie3
        FROM hist
    ),
    s AS (
        SELECT CAST(SUM(n_v) AS BIGINT) AS n,
               CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(cn) AS BIGINT) AS n_n,
               CAST(SUM(cr) AS BIGINT) AS n_r,
               CAST(SUM(ca * ar2) AS BIGINT) AS r2a,
               CAST(SUM(cn * ar2) AS BIGINT) AS r2n,
               CAST(SUM(cr * ar2) AS BIGINT) AS r2r,
               CAST(SUM(CAST(tie3 AS DECIMAL(38,0))) AS DOUBLE) AS ties
        FROM r
    )
    SELECT n, n_a, n_n, n_r,
           round(CAST(r2a AS DOUBLE) / (2 * CAST(n_a AS DOUBLE)), 6)
               AS mean_rank_a,
           round(CAST(r2n AS DOUBLE) / (2 * CAST(n_n AS DOUBLE)), 6)
               AS mean_rank_n,
           round(CAST(r2r AS DOUBLE) / (2 * CAST(n_r AS DOUBLE)), 6)
               AS mean_rank_r,
           round((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                  * (CAST(r2a AS DOUBLE) * CAST(r2a AS DOUBLE)
                         / (4.0 * CAST(n_a AS DOUBLE))
                     + CAST(r2n AS DOUBLE) * CAST(r2n AS DOUBLE)
                         / (4.0 * CAST(n_n AS DOUBLE))
                     + CAST(r2r AS DOUBLE) * CAST(r2r AS DOUBLE)
                         / (4.0 * CAST(n_r AS DOUBLE)))
                  - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                 / (1.0 - ties / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                  * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))),
                 6) AS h_stat
    FROM s
    """,
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test (the k-group Mann-Whitney): H =
    12/(n(n+1)) * sum_g R_g^2/n_g - 3(n+1), tie-corrected by
    C = 1 - sum(t^3 - t)/(n^3 - n), over quantity ranks across the
    three return-flag groups — the nonparametric ANOVA a drift gate
    uses when the metric is ordinal or heavy-tailed.

    Scale shape: NO ranking pass over the fact table at all — the
    value domain is small (<= 50 distinct quantities), so tie-averaged
    ranks come in closed form from the value HISTOGRAM: doubled
    tie-averaged rank ar2(v) = 2*cum_before(v) + n_v + 1 (exact
    integer). The fact table collapses in one map-side-combinable
    groupBy to a 50-row (value x group-count) table; the rank window
    runs over those 50 rows only. Doubled rank sums are
    BIGINT-exact to n ~ 2e9 (sum ~ n^2); the tie cube sum accumulates
    in DECIMAL(38,0) (t^3 passes BIGINT at t ~ 2e6). Only
    O(1)..O(n)-magnitude ratios survive to the output.

    Reference tie-in: none in the reference CUDA KV store — LLM-era
    drift-gate surface per the build brief."""
    from pyspark.sql import Window

    hist = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("v"),
            F.col("l_returnflag").alias("grp"),
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("n_v"),
            F.count(F.when(F.col("grp") == "A", 1)).alias("ca"),
            F.count(F.when(F.col("grp") == "N", 1)).alias("cn"),
            F.count(F.when(F.col("grp") == "R", 1)).alias("cr"),
        )
    )
    # Window over the <=50-row value histogram — bounded by the value
    # domain, not the data; a single task is correct here.
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = hist.select(
        "v", "n_v", "ca", "cn", "cr",
        (2 * F.coalesce(F.sum("n_v").over(w), F.lit(0)) + F.col("n_v") + 1)
            .alias("ar2"),
        (F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v"))
            .alias("tie3"),
    )
    s = r.agg(
        F.sum("n_v").cast("long").alias("n"),
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cn").cast("long").alias("n_n"),
        F.sum("cr").cast("long").alias("n_r"),
        F.sum(F.col("ca") * F.col("ar2")).cast("long").alias("r2a"),
        F.sum(F.col("cn") * F.col("ar2")).cast("long").alias("r2n"),
        F.sum(F.col("cr") * F.col("ar2")).cast("long").alias("r2r"),
        F.sum(F.col("tie3").cast("decimal(38,0)")).cast("double").alias("ties"),
    )
    nd = F.col("n").cast("double")
    def rg(r2: str, ng: str) -> F.Column:
        return (
            F.col(r2).cast("double") * F.col(r2).cast("double")
            / (4.0 * F.col(ng).cast("double"))
        )
    h_raw = (
        12.0 / (nd * (nd + 1.0))
        * (rg("r2a", "n_a") + rg("r2n", "n_n") + rg("r2r", "n_r"))
        - 3.0 * (nd + 1.0)
    )
    c = 1.0 - F.col("ties") / (nd * nd * nd - nd)
    return s.select(
        "n", "n_a", "n_n", "n_r",
        F.round(
            F.col("r2a").cast("double") / (2 * F.col("n_a").cast("double")), 6
        ).alias("mean_rank_a"),
        F.round(
            F.col("r2n").cast("double") / (2 * F.col("n_n").cast("double")), 6
        ).alias("mean_rank_n"),
        F.round(
            F.col("r2r").cast("double") / (2 * F.col("n_r").cast("double")), 6
        ).alias("mean_rank_r"),
        F.round(h_raw / c, 6).alias("h_stat"),
    )


# ---------------------------------------------------------------------------
# Monte-Carlo permutation test (round 8) — completes the resampling
# family begun by stat_bootstrap_ci: same md5-window uniforms, same
# one-pass wide-aggregation shape.

_PERM_B = 32  # random reassignments


def _perm_flag_sql(b: int, dialect: str) -> str:
    """Replicate-b group reassignment: row joins the 'positive' arm
    iff u(row, b) < p1 (the observed positive share, broadcast from
    the scalar pre-pass) — proportion-preserving in expectation."""
    return f"CASE WHEN {_boot_u_sql(b, dialect)} < p1 THEN 1 ELSE 0 END"


def _perm_oracle() -> str:
    flags = ", ".join(f"{_perm_flag_sql(b, 'duck')} AS g{b}" for b in range(_PERM_B))
    diffs = " UNION ALL ".join(
        f"SELECT {b} AS b,"
        f" CAST(SUM(CASE WHEN g{b} = 1 THEN x END) AS DOUBLE)"
        f"   / COUNT(CASE WHEN g{b} = 1 THEN 1 END)"
        f" - CAST(SUM(CASE WHEN g{b} = 0 THEN x END) AS DOUBLE)"
        f"   / COUNT(CASE WHEN g{b} = 0 THEN 1 END) AS diff FROM w"
        for b in range(_PERM_B)
    )
    return f"""
    WITH base AS (
        SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS x,
               {_LABEL_SQL} AS y
        FROM orders
    ),
    p AS (
        SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p1,
               COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS npos
        FROM base
    ),
    w AS (SELECT base.*, p.p1, {flags} FROM base CROSS JOIN p),
    obs AS (
        SELECT CAST(SUM(CASE WHEN y = 1 THEN x END) AS DOUBLE)
                   / COUNT(CASE WHEN y = 1 THEN 1 END)
               - CAST(SUM(CASE WHEN y = 0 THEN x END) AS DOUBLE)
                   / COUNT(CASE WHEN y = 0 THEN 1 END) AS diff_obs
        FROM base
    ),
    diffs AS ({diffs}),
    tail AS (
        SELECT CAST(SUM(CASE WHEN abs(diffs.diff) >= abs(obs.diff_obs)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        FROM diffs CROSS JOIN obs
    )
    SELECT p.n, p.npos,
           round(obs.diff_obs, 6) AS diff_obs,
           tail.n_extreme,
           round(CAST(1 + tail.n_extreme AS DOUBLE) / {_PERM_B + 1}.0, 6)
               AS p_value
    FROM p CROSS JOIN obs CROSS JOIN tail
    """


@register("stat_permutation_test", oracle=_perm_oracle())
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo permutation test for the mean difference between
    labeled groups (urgent/high-priority orders vs the rest, metric =
    order value): 32 deterministic md5-derived random reassignments
    preserve the positive share in expectation; the two-sided p-value
    is (1 + #extreme) / (B + 1) — the distribution-free alternative to
    Welch's t when normality is off the table.

    Scale shape: one O(1) scalar pre-pass (n, npos -> the reassignment
    threshold, broadcast), then ONE wide aggregation computes all 32
    replicate mean-differences AND the observed difference in a single
    scan (the stat_bootstrap_ci shape: 6 md5 hashes per row yield 32
    exact 20-bit uniforms — no modulo bias, no per-replicate pass).
    Group sums are exact DECIMAL; each difference is two divisions in
    fixed textual order, so the |diff| >= |diff_obs| comparisons are
    bit-identical across engines.

    Reference tie-in: the md5-derived uniform mirrors the reference's
    deterministic device RNG role (src/cuda/cudarand.cuh); no
    statistics surface exists there."""
    key = (spark.sparkContext.applicationId, f"perm:{sf_dir}")
    cached = _WIDE_CACHE.get(key)
    if cached is not None:
        return cached
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        _label_col(),
    )
    p = base.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("p1"),
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("npos"),
    )
    w = base.crossJoin(F.broadcast(p))
    aggs = []
    for b in range(_PERM_B):
        g = F.expr(_perm_flag_sql(b, "spark"))
        aggs.append(F.sum(F.when(g == 1, F.col("x"))).alias(f"s{b}"))
        aggs.append(F.count(F.when(g == 1, 1)).alias(f"c{b}"))
    aggs.append(F.sum(F.when(F.col("y") == 1, F.col("x"))).alias("s_pos"))
    aggs.append(F.count(F.when(F.col("y") == 1, 1)).alias("c_pos"))
    aggs.append(F.sum(F.col("x")).alias("s_all"))
    aggs.append(F.count(F.lit(1)).alias("c_all"))
    wide = w.agg(*aggs)

    def mean_diff(s: F.Column, c: F.Column) -> F.Column:
        # positive-arm mean minus complement mean, fixed op order
        return (
            s.cast("double") / c
            - (F.col("s_all") - s).cast("double") / (F.col("c_all") - c)
        )

    # The oracle states each replicate independently; here the same 32
    # differences come off the one wide row (sum/count identities:
    # complement sums = totals minus the positive arm).
    diff_obs = mean_diff(F.col("s_pos"), F.col("c_pos"))
    extreme = sum(
        F.when(
            F.abs(mean_diff(F.col(f"s{b}"), F.col(f"c{b}")))
            >= F.abs(diff_obs),
            1,
        ).otherwise(0)
        for b in range(_PERM_B)
    )
    out = (
        wide.crossJoin(F.broadcast(p.select("n", "npos")))
        .select(
            "n",
            "npos",
            F.round(diff_obs, 6).alias("diff_obs"),
            extreme.cast("long").alias("n_extreme"),
            F.round(
                (1 + extreme).cast("double") / float(_PERM_B + 1), 6
            ).alias("p_value"),
        )
    )
    # Prepared-statement cache (same rationale as _bootstrap_wide):
    # Janino-compiling the 32-flag wide aggregation costs ~4s per
    # FRESH plan; re-executing the cached analyzed plan costs ~0.4s.
    _WIDE_CACHE[key] = out
    return out


@register(
    "stat_jarque_bera",
    oracle="""
    WITH c AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(CAST(SUM(CAST(c AS HUGEINT)) AS VARCHAR)
                    AS DOUBLE) AS s1,
               CAST(CAST(SUM(CAST(c AS HUGEINT) * c) AS VARCHAR)
                    AS DOUBLE) AS s2,
               CAST(CAST(SUM(CAST(c AS HUGEINT) * c * c) AS VARCHAR)
                    AS DOUBLE) AS s3,
               CAST(CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS VARCHAR)
                    AS DOUBLE) AS s4
        FROM c
    ),
    m AS (
        SELECT n, s1 / n AS m1, s2 / n - (s1 / n) * (s1 / n) AS v,
               s3 / n - 3 * (s1 / n) * (s2 / n)
                      + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4 * (s1 / n) * (s3 / n)
                      + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(m1 / 100, 6) AS mean,
           round(sqrt(v) / 100, 6) AS stddev_pop,
           round(m3 / (v * sqrt(v)), 6) AS skewness,
           round(m4 / (v * v), 6) AS kurtosis,
           round(CAST(n AS DOUBLE) / 6
                 * ((m3 / (v * sqrt(v))) * (m3 / (v * sqrt(v)))
                 + (m4 / (v * v) - 3) * (m4 / (v * v) - 3) / 4), 6)
               AS jb_stat
    FROM m
    """,
)
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on the event value distribution:
    sample skewness and kurtosis from the first four moments, and
    JB = n/6 * (skew^2 + (kurt-3)^2 / 4) — the one-pass normality
    gate a drift monitor runs before trusting z-score thresholds
    (complements stat_ks_test's distribution-vs-distribution check
    with a distribution-vs-Gaussian check).

    Scale shape: ONE map-side-combinable aggregation collapses 100 TB
    to five scalars (n, S1..S4); the closed-form moment combination is
    driver-free arithmetic on that single row. Cross-engine exactness:
    values are cent-integers (2dp fixture), so S1..S4 accumulate
    EXACTLY in DECIMAL(38,0)/HUGEINT (per-term c^4 <= 5.8e18 at the
    fixture's 490.02 max; at 100 TB row counts the exact-integer sums
    approach 1e38 — production swaps to double moments, this query
    buys bit-equality for the gate); each exact sum converts once via
    the correctly-rounded VARCHAR hop (compat.py), and the final
    formulas are identical IEEE op trees in both engines (sqrt, not
    pow — sqrt is correctly rounded, libm pow is not)."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
    s = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(CAST(SUM(CAST(c AS DECIMAL(38,0))) AS STRING) AS DOUBLE)"
        ).alias("s1"),
        F.expr(
            "CAST(CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS STRING)"
            " AS DOUBLE)"
        ).alias("s2"),
        F.expr(
            "CAST(CAST(SUM(CAST(c AS DECIMAL(38,0)) * c * c) AS STRING)"
            " AS DOUBLE)"
        ).alias("s3"),
        F.expr(
            "CAST(CAST(SUM(CAST(c AS DECIMAL(38,0)) * c * c * c) AS STRING)"
            " AS DOUBLE)"
        ).alias("s4"),
    )
    m = s.select(
        "n",
        F.expr("s1 / n").alias("m1"),
        F.expr("s2 / n - (s1 / n) * (s1 / n)").alias("v"),
        F.expr(
            "s3 / n - 3 * (s1 / n) * (s2 / n)"
            " + 2 * (s1 / n) * (s1 / n) * (s1 / n)"
        ).alias("m3"),
        F.expr(
            "s4 / n - 4 * (s1 / n) * (s3 / n)"
            " + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
            " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)"
        ).alias("m4"),
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.expr("m1 / 100"), 6).alias("mean"),
        F.round(F.expr("sqrt(v) / 100"), 6).alias("stddev_pop"),
        F.round(F.expr("m3 / (v * sqrt(v))"), 6).alias("skewness"),
        F.round(F.expr("m4 / (v * v)"), 6).alias("kurtosis"),
        F.round(
            # CAST(n AS DOUBLE) / 6, NOT n / 6.0: Spark parses the
            # 6.0 literal as DECIMAL(2,1), making n/6.0 a DECIMAL
            # division ROUNDED at 6 digits (166.666667) where DuckDB's
            # 6.0 is a double — a 2e-9 relative divergence that breaks
            # the hash match.
            F.expr(
                "CAST(n AS DOUBLE) / 6"
                " * ((m3 / (v * sqrt(v))) * (m3 / (v * sqrt(v)))"
                " + (m4 / (v * v) - 3) * (m4 / (v * v) - 3) / 4)"
            ),
            6,
        ).alias("jb_stat"),
    )


# Two-sided alpha=0.05 and power=0.80 normal quantiles, stated as
# literals so both engines use the identical constants (no inverse-CDF
# in either engine's SQL surface).
_Z_ALPHA = "1.959963985"
_Z_BETA = "0.841621234"
_MDE_LIFTS = (0.01, 0.02, 0.05, 0.10)  # relative lifts to size


@register(
    "stat_power_sample_size",
    oracle=f"""
    WITH conv AS (
        SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT COUNT(*) AS n_units,
               CAST(SUM(c) AS DOUBLE) / COUNT(*) AS p
        FROM conv
    ),
    lifts AS (SELECT unnest([{", ".join(str(x) for x in _MDE_LIFTS)}])
                  AS lift)
    SELECT lift,
           CAST(n_units AS BIGINT) AS n_units,
           round(p, 6) AS baseline_rate,
           round(p * (1 + lift), 6) AS target_rate,
           CAST(ceil(
               ({_Z_ALPHA} * sqrt(2 * p * (1 - p))
                + {_Z_BETA} * sqrt(p * (1 - p)
                                   + (p * (1 + lift))
                                     * (1 - p * (1 + lift))))
               * ({_Z_ALPHA} * sqrt(2 * p * (1 - p))
                  + {_Z_BETA} * sqrt(p * (1 - p)
                                     + (p * (1 + lift))
                                       * (1 - p * (1 + lift))))
               / ((p * lift) * (p * lift))) AS BIGINT)
               AS n_per_arm
    FROM base CROSS JOIN lifts ORDER BY lift
    """,
)
def stat_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment sizing from the observed baseline: per-USER-DAY
    conversion rate p (a rate comfortably inside (0,1) at every
    fixture scale — per-user conversion saturates at 1.0 here), then
    for each candidate relative lift the required per-arm sample size
    at alpha=0.05 (two-sided) and 80% power via the standard
    two-proportion formula — the pre-experiment calculator every
    product team runs against the metric stat_proportions_ab later
    tests.

    Scale shape: one (user, day) collapse (map-side-combinable max) +
    one scalar aggregate; the 4-row lift grid is a broadcast cross
    join. The z quantiles are shared LITERAL constants (neither
    engine exposes an inverse normal CDF); sqrt/ceil are correctly
    rounded, and the squared factor is written as an explicit product
    (never pow) so both engines run the identical IEEE op tree."""
    e = load_table(spark, sf_dir, "events")
    conv = e.groupBy(
        "user_id", F.expr("ts_ns div 86400000000000").alias("day")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("c")
    )
    base = conv.agg(
        F.count(F.lit(1)).alias("n_units"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("p"),
    )
    lifts = spark.createDataFrame(
        [(x,) for x in _MDE_LIFTS], "lift double"
    )
    factor = (
        f"({_Z_ALPHA} * sqrt(2 * p * (1 - p))"
        f" + {_Z_BETA} * sqrt(p * (1 - p)"
        f" + (p * (1 + lift)) * (1 - p * (1 + lift))))"
    )
    return (
        base.crossJoin(F.broadcast(lifts))
        .select(
            "lift",
            F.col("n_units").cast("long").alias("n_units"),
            F.round("p", 6).alias("baseline_rate"),
            F.round(F.expr("p * (1 + lift)"), 6).alias("target_rate"),
            F.expr(
                f"CAST(ceil({factor} * {factor}"
                f" / ((p * lift) * (p * lift))) AS BIGINT)"
            ).alias("n_per_arm"),
        )
        .orderBy("lift")
    )


@register(
    "stat_friedman_test",
    oracle="""
    WITH cell AS (
        SELECT user_id, event_type,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(*) AS v
        FROM events GROUP BY 1, 2
    ),
    full_blocks AS (
        SELECT user_id FROM cell GROUP BY user_id
        HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM cell)
    ),
    ranked AS (
        SELECT c.user_id, c.event_type,
               2 * RANK() OVER (PARTITION BY c.user_id ORDER BY c.v)
                 + COUNT(*) OVER (PARTITION BY c.user_id, c.v) - 1
                   AS dr
        FROM cell c JOIN full_blocks USING (user_id)
    ),
    sums AS (
        SELECT event_type, SUM(dr) AS drsum FROM ranked GROUP BY 1
    ),
    dims AS (
        SELECT (SELECT COUNT(*) FROM full_blocks) AS n,
               (SELECT COUNT(*) FROM sums) AS k
    )
    SELECT CAST(d.n AS BIGINT) AS n_blocks,
           CAST(d.k AS BIGINT) AS k_treatments,
           round(CAST(12 AS DOUBLE) / (d.n * d.k * (d.k + 1))
                 * SUM((CAST(s.drsum AS DOUBLE) / 2)
                       * (CAST(s.drsum AS DOUBLE) / 2))
                 - CAST(3 AS DOUBLE) * d.n * (d.k + 1), 6) AS friedman_chi2,
           CAST(d.k - 1 AS BIGINT) AS dof
    FROM sums s CROSS JOIN dims d
    GROUP BY d.n, d.k
    """,
)
def stat_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test for repeated measures: does any event type
    systematically run higher values than the others, judged WITHIN
    each user (blocks = users with all treatments, treatments = event
    types, observation = the user's mean value per type)? The
    non-parametric two-way companion to stat_kruskal_wallis: each
    block is ranked internally, so per-user level differences cancel.

    Scale shape: the stream collapses FIRST to |users| x |types|
    cells (one map-side-combinable groupBy); ranking then partitions
    by the HIGH-CARDINALITY user_id over k rows per partition — never
    a global or low-cardinality sort; the treatment fold is k rows.
    Tie-averaged ranks stay integral via doubling (2*rank + ties - 1
    = twice the average rank — the repo's doubled-rank discipline);
    the chi-squared fold divides back by 2 inside an identical IEEE
    op tree in both engines."""
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy("user_id", "event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    ).transform(materialize)  # (user x type)-sized; three consumers
    # (type count, full-block filter, rank pass) — one events scan
    n_types = cell.select("event_type").distinct().count()
    full_blocks = (
        cell.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("kk"))
        .filter(F.col("kk") == n_types)
        .select("user_id")
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("user_id").orderBy("v")
    wt = W.partitionBy("user_id", "v")
    ranked = (
        cell.join(full_blocks, "user_id")
        .select(
            "user_id",
            "event_type",
            (
                2 * F.rank().over(wr)
                + F.count(F.lit(1)).over(wt)
                - 1
            ).alias("dr"),
        )
    )
    sums = ranked.groupBy("event_type").agg(F.sum("dr").alias("drsum"))
    n_blocks = full_blocks.count()
    if n_blocks == 0:
        # No user holds every treatment: the oracle's GROUP BY over an
        # empty sums CTE yields zero rows, while a Spark global agg
        # would yield one (0, 0, null, -1) row AND divide by zero —
        # short-circuit to the same empty relation.
        return spark.createDataFrame(
            [],
            "n_blocks long, k_treatments long,"
            " friedman_chi2 double, dof long",
        )
    return (
        sums.agg(
            F.lit(n_blocks).cast("long").alias("n_blocks"),
            F.count(F.lit(1)).cast("long").alias("k_treatments"),
            F.round(
                F.expr(
                    # CAST(12 AS DOUBLE): a bare 12.0 literal parses as
                    # DECIMAL(3,1) in both engines but with divergent
                    # quotient scales (the stat_jarque_bera note) —
                    # force the identical IEEE double op tree instead.
                    f"CAST(12 AS DOUBLE) / ({n_blocks} * COUNT(*) * (COUNT(*) + 1))"
                    " * SUM((CAST(drsum AS DOUBLE) / 2)"
                    " * (CAST(drsum AS DOUBLE) / 2))"
                    f" - CAST(3 AS DOUBLE) * {n_blocks} * (COUNT(*) + 1)"
                ),
                6,
            ).alias("friedman_chi2"),
            (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        )
    )


# TOST equivalence margin (absolute, same units as event value) and
# the large-sample one-sided 5% normal critical value, shared literals.
_TOST_DELTA = "2.0"
_TOST_Z = "1.644854"


@register(
    "stat_tost_equivalence",
    oracle=f"""
    WITH s AS (
        SELECT CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS s1,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                             THEN value ELSE 0 END AS DECIMAL(27,6)))
                         AS VARCHAR) AS DOUBLE) AS s2,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'view'
                             THEN value * value ELSE 0 END
                             AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS q1,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                             THEN value * value ELSE 0 END
                             AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS q2
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    v AS (
        SELECT n1, n2, s1 / n1 - s2 / n2 AS diff,
               sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                    + (q2 - s2 * s2 / n2) / (n2 - 1) / n2) AS se
        FROM s
    )
    SELECT n1, n2,
           round(diff, 6) AS mean_diff,
           round(se, 6) AS std_err,
           round((diff + {_TOST_DELTA}) / se, 6) AS t_lower,
           round(({_TOST_DELTA} - diff) / se, 6) AS t_upper,
           ((diff + {_TOST_DELTA}) / se > {_TOST_Z}
            AND ({_TOST_DELTA} - diff) / se > {_TOST_Z}) AS equivalent
    FROM v
    """,
)
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two one-sided tests (TOST) for EQUIVALENCE of view vs purchase
    mean values within an absolute margin of +-2.0: the inverse
    question of stat_welch_ttest — "can we claim the means are
    practically the SAME?", which a non-significant difference test
    can never answer. Equivalent iff both one-sided statistics clear
    the one-sided 5% normal critical value (shared literal; neither
    engine has an inverse t CDF, and the fixture n makes z ~= t).

    Scale shape: the same ONE-pass conditional sufficient statistics
    as stat_welch_ttest (map-side-combinable, six scalars); the TOST
    fold is arithmetic on one row with identical IEEE op trees."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )

    def csum(cond: str, term: str, out: str) -> F.Column:
        return F.expr(
            f"CAST(CAST(SUM(CAST(CASE WHEN event_type = '{cond}'"
            f" THEN {term} ELSE 0 END AS DECIMAL(27,6))) AS STRING)"
            f" AS DOUBLE)"
        ).alias(out)

    s = e.agg(
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n1"),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n2"),
        csum("view", "value", "s1"),
        csum("purchase", "value", "s2"),
        csum("view", "value * value", "q1"),
        csum("purchase", "value * value", "q2"),
    )
    v = s.select(
        "n1",
        "n2",
        F.expr("s1 / n1 - s2 / n2").alias("diff"),
        F.expr(
            "sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1"
            " + (q2 - s2 * s2 / n2) / (n2 - 1) / n2)"
        ).alias("se"),
    )
    return v.select(
        "n1",
        "n2",
        F.round("diff", 6).alias("mean_diff"),
        F.round("se", 6).alias("std_err"),
        F.round(F.expr(f"(diff + {_TOST_DELTA}) / se"), 6).alias("t_lower"),
        F.round(F.expr(f"({_TOST_DELTA} - diff) / se"), 6).alias("t_upper"),
        F.expr(
            f"(diff + {_TOST_DELTA}) / se > {_TOST_Z}"
            f" AND ({_TOST_DELTA} - diff) / se > {_TOST_Z}"
        ).alias("equivalent"),
    )


@register(
    "stat_wilcoxon_signed_rank",
    oracle="""
    WITH cell AS (
        SELECT user_id,
               CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS sv,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nv,
               CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS sp,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id
    ),
    d AS (
        SELECT sv / nv - sp / np AS d
        FROM cell WHERE nv > 0 AND np > 0
    ),
    nz AS (SELECT d, abs(d) AS ad FROM d WHERE d <> 0),
    by_v AS (
        SELECT ad,
               SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cpos,
               COUNT(*) AS t
        FROM nz GROUP BY ad
    ),
    cum AS (
        SELECT cpos, t,
               COALESCE(SUM(t) OVER (ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS below
        FROM by_v
    ),
    agg AS (
        SELECT SUM(t) AS n,
               SUM(cpos * (2 * below + t + 1)) AS w2,
               SUM(t * t * t - t) AS ties
        FROM cum
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(CAST(w2 AS DOUBLE) / 2, 6) AS w_plus,
           round((CAST(w2 AS DOUBLE) / 2 - CAST(n * (n + 1) AS DOUBLE) / 4)
                 / sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24
                        - CAST(ties AS DOUBLE) / 48), 6) AS z,
           abs((CAST(w2 AS DOUBLE) / 2 - CAST(n * (n + 1) AS DOUBLE) / 4)
               / sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24
                      - CAST(ties AS DOUBLE) / 48)) > 1.96 AS significant_05
    FROM agg
    """,
)
def stat_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED per-user means: does a
    user's mean 'view' value systematically differ from their own
    mean 'purchase' value? The paired nonparametric sibling of
    stat_mannwhitney_u (which treats the samples as independent) —
    within-user pairing cancels user-level baselines the same way
    stat_friedman_test's blocks do, for the two-treatment case.

    Zero differences drop (the classic convention); |d| ranks are
    tie-averaged via the doubled-rank identity (2*below + t + 1 =
    twice the average rank of a tied group), so 2*W+ stays an exact
    integer until the final closed-form z with the Sigma(t^3 - t)/48
    tie correction.

    Scale shape: the stream collapses FIRST to one row per user (a
    map-side-combinable conditional groupBy); the |d| ranking then
    uses the SAME two-level bucketed prefix as stat_mannwhitney_u —
    running sums within floor(8|d|) buckets plus an exclusive prefix
    over the tiny bucket-totals table — never a global window over
    the user-count-sized difference stream. The oracle states the
    plain global-window form; both select identical integers."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    from pyspark.sql import Window

    dec = "decimal(27,6)"
    cell = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "view", F.col("value"))
            .otherwise(0)
            .cast(dec)
        )
        .cast("double")
        .alias("sv"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0)
            .cast(dec)
        )
        .cast("double")
        .alias("sp"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "np"
        ),
    )
    d = (
        cell.filter((F.col("nv") > 0) & (F.col("np") > 0))
        .select(F.expr("sv / nv - sp / np").alias("d"))
        .filter(F.col("d") != 0)
        .select("d", F.abs("d").alias("ad"))
    )
    by_v = d.groupBy("ad").agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("cpos"),
        F.count(F.lit(1)).alias("t"),
    )
    b = by_v.withColumn("_bkt", F.floor(F.col("ad") * 8).cast("long"))
    wl = Window.partitionBy("_bkt").orderBy("ad").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = b.select(
        "_bkt", "cpos", "t",
        F.coalesce(F.sum("t").over(wl), F.lit(0)).alias("_below_local"),
    )
    bt = b.groupBy("_bkt").agg(F.sum("t").alias("_bt"))
    wo = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bt.select(
        "_bkt", F.coalesce(F.sum("_bt").over(wo), F.lit(0)).alias("_base")
    )
    cum = local.join(F.broadcast(off), "_bkt").select(
        "cpos", "t", (F.col("_below_local") + F.col("_base")).alias("below")
    )
    agg = cum.agg(
        F.sum("t").alias("n"),
        F.sum(F.expr("cpos * (2 * below + t + 1)")).alias("w2"),
        F.sum(F.expr("t * t * t - t")).alias("ties"),
    )
    z = (
        "(CAST(w2 AS DOUBLE) / 2 - CAST(n * (n + 1) AS DOUBLE) / 4)"
        " / sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24"
        " - CAST(ties AS DOUBLE) / 48)"
    )
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(F.expr("CAST(w2 AS DOUBLE) / 2"), 6).alias("w_plus"),
        F.round(F.expr(z), 6).alias("z"),
        F.expr(f"abs({z}) > 1.96").alias("significant_05"),
    )


@register(
    "stat_cramers_v",
    oracle="""
    WITH c AS (
        SELECT l_returnflag AS r, l_linestatus AS s, COUNT(*) AS o
        FROM lineitem GROUP BY 1, 2
    ),
    m AS (
        SELECT r, s, o,
               SUM(o) OVER (PARTITION BY r) AS rt,
               SUM(o) OVER (PARTITION BY s) AS ct,
               SUM(o) OVER () AS n
        FROM c
    ),
    chi AS (
        SELECT MAX(n) AS n,
               COUNT(DISTINCT r) AS nr,
               COUNT(DISTINCT s) AS nc,
               CAST(CAST(SUM(CAST(
                   (o - CAST(rt * ct AS DOUBLE) / n)
                   * (o - CAST(rt * ct AS DOUBLE) / n)
                   / (CAST(rt * ct AS DOUBLE) / n)
                   AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS chi2
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(nr AS BIGINT) AS n_rows,
           CAST(nc AS BIGINT) AS n_cols,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (n * (LEAST(nr, nc) - 1))), 6) AS cramers_v,
           round(sqrt(
               GREATEST(chi2 / n
                        - CAST((nr - 1) * (nc - 1) AS DOUBLE) / (n - 1),
                        CAST(0 AS DOUBLE))
               / (LEAST(nr - CAST((nr - 1) * (nr - 1) AS DOUBLE) / (n - 1),
                        nc - CAST((nc - 1) * (nc - 1) AS DOUBLE) / (n - 1))
                  - 1)), 6) AS cramers_v_corrected
    FROM chi
    """,
)
def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V effect size for the l_returnflag x l_linestatus
    association, plus the Bergsma-Wicher bias-corrected variant — the
    magnitude companion to stat_chi2_independence's significance
    verdict (at 100 TB row counts EVERYTHING is significant; only the
    effect size says whether the association matters).

    Scale shape: the stream collapses FIRST to the <= |r| x |s|
    contingency table (one map-side-combinable groupBy); margins and
    expected counts come from windows over that bounded table (the
    window_share_of_total precedent), and the chi-squared fold sums
    per-cell terms through the exact-decimal string-hop so the
    cross-engine sum is order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    c = li.groupBy(
        F.col("l_returnflag").alias("r"), F.col("l_linestatus").alias("s")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = c.select(
        "r", "s", "o",
        F.sum("o").over(Window.partitionBy("r")).alias("rt"),
        F.sum("o").over(Window.partitionBy("s")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    term = (
        "(o - CAST(rt * ct AS DOUBLE) / n)"
        " * (o - CAST(rt * ct AS DOUBLE) / n)"
        " / (CAST(rt * ct AS DOUBLE) / n)"
    )
    chi = m.agg(
        F.max("n").alias("n"),
        F.countDistinct("r").alias("nr"),
        F.countDistinct("s").alias("nc"),
        F.expr(
            f"CAST(CAST(SUM(CAST({term} AS DECIMAL(27,6)))"
            " AS STRING) AS DOUBLE)"
        ).alias("chi2"),
    )
    corr = (
        "sqrt(GREATEST(chi2 / n"
        " - CAST((nr - 1) * (nc - 1) AS DOUBLE) / (n - 1),"
        " CAST(0 AS DOUBLE))"
        " / (LEAST(nr - CAST((nr - 1) * (nr - 1) AS DOUBLE) / (n - 1),"
        " nc - CAST((nc - 1) * (nc - 1) AS DOUBLE) / (n - 1)) - 1))"
    )
    return chi.select(
        F.col("n").cast("long").alias("n"),
        F.col("nr").cast("long").alias("n_rows"),
        F.col("nc").cast("long").alias("n_cols"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.expr("sqrt(chi2 / (n * (LEAST(nr, nc) - 1)))"), 6
        ).alias("cramers_v"),
        F.round(F.expr(corr), 6).alias("cramers_v_corrected"),
    )


@register(
    "stat_cohens_d",
    oracle="""
    WITH s AS (
        SELECT CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS s1,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                             THEN value ELSE 0 END AS DECIMAL(27,6)))
                         AS VARCHAR) AS DOUBLE) AS s2,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'view'
                             THEN value * value ELSE 0 END
                             AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS q1,
               CAST(CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                             THEN value * value ELSE 0 END
                             AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS q2
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    v AS (
        SELECT n1, n2, s1 / n1 - s2 / n2 AS diff,
               sqrt(((q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2))
                    / (n1 + n2 - 2)) AS sp
        FROM s
    )
    SELECT n1, n2,
           round(diff, 6) AS mean_diff,
           round(sp, 6) AS pooled_sd,
           round(diff / sp, 6) AS cohens_d,
           round(diff / sp
                 * (1 - CAST(3 AS DOUBLE) / (4 * (n1 + n2) - 9)), 6)
               AS hedges_g
    FROM v
    """,
)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g standardized effect sizes for the view
    vs purchase mean-value difference — the magnitude companion to
    stat_welch_ttest (pooled-SD standardization; Hedges' small-sample
    bias factor 1 - 3/(4N - 9)). Note the pooled sum of squares
    (q - s^2/n per arm, summed, over n1+n2-2) — not Welch's separate
    variances.

    Scale shape: ONE pass of six conditional sufficient statistics
    (map-side-combinable, exact decimal accumulation with the
    string-hop output conversion); the effect-size fold is arithmetic
    on one row with oracle-identical IEEE op trees."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )

    def csum(cond: str, term: str, out: str) -> F.Column:
        return F.expr(
            f"CAST(CAST(SUM(CAST(CASE WHEN event_type = '{cond}'"
            f" THEN {term} ELSE 0 END AS DECIMAL(27,6)))"
            " AS STRING) AS DOUBLE)"
        ).alias(out)

    s = e.agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        csum("view", "value", "s1"),
        csum("purchase", "value", "s2"),
        csum("view", "value * value", "q1"),
        csum("purchase", "value * value", "q2"),
    )
    v = s.select(
        "n1", "n2",
        F.expr("s1 / n1 - s2 / n2").alias("diff"),
        F.expr(
            "sqrt(((q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2))"
            " / (n1 + n2 - 2))"
        ).alias("sp"),
    )
    return v.select(
        "n1", "n2",
        F.round("diff", 6).alias("mean_diff"),
        F.round("sp", 6).alias("pooled_sd"),
        F.round(F.expr("diff / sp"), 6).alias("cohens_d"),
        F.round(
            F.expr(
                "diff / sp * (1 - CAST(3 AS DOUBLE) / (4 * (n1 + n2) - 9))"
            ),
            6,
        ).alias("hedges_g"),
    )


@register(
    "stat_mcnemar_test",
    oracle="""
    WITH bounds AS (
        SELECT (MIN(epoch_ns(ts)) + MAX(epoch_ns(ts))) // 2 AS mid
        FROM events
    ),
    u AS (
        SELECT user_id,
               MAX(CASE WHEN epoch_ns(ts) < mid THEN 1 ELSE 0 END) AS a,
               MAX(CASE WHEN epoch_ns(ts) >= mid THEN 1 ELSE 0 END) AS b
        FROM events CROSS JOIN bounds GROUP BY user_id
    ),
    ct AS (
        SELECT CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n11,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01
        FROM u
    )
    SELECT n11, n10, n01,
           round(CASE WHEN n10 + n01 = 0 THEN NULL
                 ELSE CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                      / (n10 + n01) END, 6) AS chi2,
           round(CASE WHEN n10 + n01 = 0 THEN NULL
                 ELSE CAST(GREATEST(abs(n10 - n01) - 1, 0)
                           * GREATEST(abs(n10 - n01) - 1, 0) AS DOUBLE)
                      / (n10 + n01) END, 6) AS chi2_cc,
           CASE WHEN n10 + n01 = 0 THEN FALSE
                ELSE CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                     / (n10 + n01) > 3.841459 END AS significant_05
    FROM ct
    """,
)
def stat_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes: is a user's
    presence in the second half of the observation window dependent
    on their presence in the first half? Only the discordant cells
    (active-then-gone n10 vs new-arrival n01) carry information —
    the churn-vs-acquisition asymmetry a retention dashboard's
    before/after comparison actually tests. Reported with and
    without the Edwards continuity correction; 3.841459 is the
    chi-squared(1) 95% critical value (shared literal).

    Scale shape: one O(1) scalar pre-pass (min/max timestamp -> the
    broadcast midpoint), one map-side-combinable per-user groupBy of
    two MAX flags, one 3-cell fold. Degenerate all-concordant input
    short-circuits to NULL statistics in both engines via the same
    CASE guard."""
    e = load_table(spark, sf_dir, "events")
    # integer DIV, not /2: epoch-nanos sums exceed 2^53, so a double
    # division here would round the midpoint by up to ~512ns and any
    # event inside that window would split differently than the
    # oracle's exact integer // 2
    bounds = e.agg(F.expr("(MIN(ts_ns) + MAX(ts_ns)) DIV 2").alias("mid"))
    u = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("ts_ns") < F.col("mid"), 1).otherwise(0)).alias("a"),
            F.max(F.when(F.col("ts_ns") >= F.col("mid"), 1).otherwise(0)).alias("b"),
        )
    )
    ct = u.agg(
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
    )
    chi2 = (
        "CASE WHEN n10 + n01 = 0 THEN NULL"
        " ELSE CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01) END"
    )
    chi2_cc = (
        "CASE WHEN n10 + n01 = 0 THEN NULL"
        " ELSE CAST(GREATEST(abs(n10 - n01) - 1, 0)"
        " * GREATEST(abs(n10 - n01) - 1, 0) AS DOUBLE) / (n10 + n01) END"
    )
    sig = (
        "CASE WHEN n10 + n01 = 0 THEN FALSE"
        " ELSE CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)"
        " > 3.841459 END"
    )
    return ct.select(
        "n11", "n10", "n01",
        F.round(F.expr(chi2), 6).alias("chi2"),
        F.round(F.expr(chi2_cc), 6).alias("chi2_cc"),
        F.expr(sig).alias("significant_05"),
    )


@register(
    "stat_runs_test",
    oracle="""
    WITH daily AS (
        SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(*) AS v
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(CAST(SUM(CAST(v AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) / COUNT(*) AS mu
        FROM daily GROUP BY 1
    ),
    s AS (
        SELECT d.event_type, d.day,
               CASE WHEN d.v > m.mu THEN 1 ELSE 0 END AS sgn
        FROM daily d JOIN m USING (event_type)
        WHERE d.v <> m.mu
    ),
    r AS (
        SELECT event_type, sgn,
               CASE WHEN LAG(sgn) OVER (PARTITION BY event_type
                                        ORDER BY day)
                         IS DISTINCT FROM sgn
                    THEN 1 ELSE 0 END AS st
        FROM s
    ),
    agg AS (
        SELECT event_type,
               CAST(SUM(st) AS BIGINT) AS runs,
               CAST(SUM(sgn) AS BIGINT) AS n1,
               CAST(SUM(1 - sgn) AS BIGINT) AS n2
        FROM r GROUP BY 1
        HAVING SUM(sgn) > 0 AND SUM(1 - sgn) > 0
    )
    SELECT event_type, n1 AS n_above, n2 AS n_below, runs AS n_runs,
           round(1 + CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2), 6)
               AS expected_runs,
           round((runs - (1 + CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2)))
                 / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                        * (2 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2))
                        / (n1 + n2 - 1)), 6) AS z
    FROM agg
    ORDER BY event_type
    """,
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of each event type's
    daily mean-value series around its own mean: too FEW runs of
    above/below-mean days means trending/sticky behavior, too MANY
    means oscillation — the distribution-free "is this series just
    noise?" gate that complements timeseries_acf's parametric view.
    (Mean cut, values equal to the mean dropped — the standard
    above/below variant.)

    Scale shape: the 100 TB stream collapses FIRST to |types| x
    |days| rows via one map-side-combinable groupBy; the LAG window
    and the run/count folds run over that calendar-bounded series
    (the timeseries_acf precedent), so the low-cardinality partition
    key is safe by construction. Run starts count via LAG IS
    DISTINCT FROM (first row starts run 1); E[R] and Var[R] are the
    closed forms over the integer (n1, n2, R)."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    daily = e.groupBy(
        "event_type", F.expr("ts_ns div 86400000000000").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    ).transform(materialize)  # calendar-sized; feeds the mean fold AND
    # the sign pass — one events scan, not two
    m = daily.groupBy("event_type").agg(
        F.expr(
            "CAST(CAST(SUM(CAST(v AS DECIMAL(27,6))) AS STRING) AS DOUBLE)"
            " / COUNT(*)"
        ).alias("mu")
    )
    s = (
        daily.join(m, "event_type")
        .filter(F.col("v") != F.col("mu"))
        .select(
            "event_type", "day",
            F.when(F.col("v") > F.col("mu"), 1).otherwise(0).alias("sgn"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = s.select(
        "event_type", "sgn",
        F.when(
            ~F.lag("sgn").over(w).eqNullSafe(F.col("sgn")), 1
        ).otherwise(0).alias("st"),
    )
    agg = (
        r.groupBy("event_type")
        .agg(
            F.sum("st").cast("long").alias("runs"),
            F.sum("sgn").cast("long").alias("n1"),
            F.sum(1 - F.col("sgn")).cast("long").alias("n2"),
        )
        # one-sided series (every day above or every day below its
        # mean) have Var[R] = 0: the z division degenerates — the
        # test is undefined, drop the type in both engines
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
    )
    exp_r = "1 + CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2)"
    z = (
        f"(runs - ({exp_r}))"
        " / sqrt(CAST(2 * n1 * n2 AS DOUBLE)"
        " * (2 * n1 * n2 - n1 - n2)"
        " / ((n1 + n2) * (n1 + n2))"
        " / (n1 + n2 - 1))"
    )
    return agg.select(
        "event_type",
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("runs").alias("n_runs"),
        F.round(F.expr(exp_r), 6).alias("expected_runs"),
        F.round(F.expr(z), 6).alias("z"),
    ).orderBy("event_type")


@register(
    "stat_cochran_q",
    oracle="""
    WITH last_day AS (
        SELECT MAX(epoch_ns(ts) // 86400000000000) AS d FROM events
    ),
    k AS (SELECT COUNT(DISTINCT event_type) AS k FROM events),
    x AS (
        SELECT DISTINCT user_id, event_type
        FROM events CROSS JOIN last_day
        WHERE epoch_ns(ts) // 86400000000000 = d
    ),
    r AS (
        SELECT user_id, COUNT(*) AS ru FROM x GROUP BY user_id
        HAVING COUNT(*) > 0 AND COUNT(*) < (SELECT k FROM k)
    ),
    xi AS (SELECT x.* FROM x JOIN r USING (user_id)),
    c AS (SELECT event_type, COUNT(*) AS cj FROM xi GROUP BY event_type),
    agg AS (
        SELECT (SELECT k FROM k) AS k,
               (SELECT COUNT(*) FROM r) AS n_blocks,
               (SELECT SUM(ru) FROM r) AS n,
               (SELECT SUM(ru * ru) FROM r) AS r2,
               (SELECT SUM(cj * cj) FROM c) AS c2
    )
    SELECT CAST(k AS BIGINT) AS k_treatments,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           round(CAST((k - 1) * (k * c2 - n * n) AS DOUBLE)
                 / (k * n - r2), 6) AS cochran_q,
           CAST(k - 1 AS BIGINT) AS dof,
           CAST((k - 1) * (k * c2 - n * n) AS DOUBLE)
               / (k * n - r2) > 9.487729 AS significant_05
    FROM agg WHERE n_blocks > 0
    """,
)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: on the FINAL day of the observation window,
    do the event types differ in the share of users who perform
    them, judged WITHIN each user? The k-treatment generalization of
    stat_mcnemar_test and the binary-outcome sibling of
    stat_friedman_test: blocks are users, the outcome is the 0/1
    "active in type j on the last day" matrix. (Lifetime "ever did
    type j" is fully degenerate on engaged populations — every block
    complete, k*N = Sigma Ru^2, Q = 0/0 — so the standard
    informative-block restriction applies: blocks with all-zero or
    all-one rows drop, and column totals recount over the retained
    blocks. An empty informative set short-circuits to zero rows in
    both engines.) Q = (k-1)[k*Sigma Cj^2 - N^2] / [k*N - Sigma
    Ru^2] — EVERY term is an exact integer, so the only float op is
    the final division. 9.487729 is the chi-squared(4) 95% critical
    value for the fixture's k=5 (shared literal).

    Scale shape: one O(1) scalar pre-pass (max day, broadcast); the
    stream collapses to the distinct last-day (user, type) incidence
    matrix (map-side-combinable distinct); row/column totals are two
    bounded groupBys; the Q fold is arithmetic on four scalars."""
    e = load_table(spark, sf_dir, "events")
    last_day = e.agg(
        F.max(F.expr("ts_ns div 86400000000000")).alias("d")
    )
    k = e.select(F.countDistinct("event_type").alias("k"))
    x = (
        e.crossJoin(F.broadcast(last_day))
        .filter(F.expr("ts_ns div 86400000000000") == F.col("d"))
        .select("user_id", "event_type")
        .distinct()
        .transform(materialize)
    )
    r = (
        x.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("ru"))
        .crossJoin(F.broadcast(k))
        .filter((F.col("ru") > 0) & (F.col("ru") < F.col("k")))
        .select("user_id", "ru")
        .transform(materialize)
    )
    xi = x.join(r.select("user_id"), "user_id")
    c = xi.groupBy("event_type").agg(F.count(F.lit(1)).alias("cj"))
    r_tot = r.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("ru").alias("n"),
        F.sum(F.col("ru") * F.col("ru")).alias("r2"),
    )
    c_tot = c.agg(F.sum(F.col("cj") * F.col("cj")).alias("c2"))
    agg = (
        k.crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(c_tot))
        .filter(F.col("n_blocks") > 0)
    )
    q = "CAST((k - 1) * (k * c2 - n * n) AS DOUBLE) / (k * n - r2)"
    return agg.select(
        F.col("k").cast("long").alias("k_treatments"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.round(F.expr(q), 6).alias("cochran_q"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.expr(f"{q} > 9.487729").alias("significant_05"),
    )


@register(
    "stat_bartlett_test",
    oracle="""
    WITH g AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS s,
               CAST(CAST(SUM(CAST(value * value AS DECIMAL(27,6)))
                         AS VARCHAR) AS DOUBLE) AS q
        FROM events GROUP BY event_type
        HAVING COUNT(*) > 1
    ),
    v AS (
        SELECT event_type, n, (q - s * s / n) / (n - 1) AS s2,
               q - s * s / n AS ssq
        FROM g
    ),
    agg AS (
        SELECT COUNT(*) AS k,
               SUM(n) AS nn,
               CAST(CAST(SUM(CAST((n - 1) * ln(s2) AS DECIMAL(27,6)))
                         AS VARCHAR) AS DOUBLE) AS sum_ln,
               CAST(CAST(SUM(CAST(ssq AS DECIMAL(27,6)))
                         AS VARCHAR) AS DOUBLE) AS ssq_within,
               CAST(CAST(SUM(CAST(CAST(1 AS DOUBLE) / (n - 1)
                                  AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS sum_inv
        FROM v
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(nn AS BIGINT) AS n,
           round(((nn - k) * ln(ssq_within / (nn - k)) - sum_ln)
                 / (1 + (sum_inv - CAST(1 AS DOUBLE) / (nn - k))
                        / (3 * (k - 1))), 6) AS bartlett_stat,
           CAST(k - 1 AS BIGINT) AS dof,
           ((nn - k) * ln(ssq_within / (nn - k)) - sum_ln)
           / (1 + (sum_inv - CAST(1 AS DOUBLE) / (nn - k))
                  / (3 * (k - 1))) > 9.487729 AS significant_05
    FROM agg
    """,
)
def stat_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for variance homogeneity across event types —
    the parametric (normality-assuming) sibling of
    stat_brown_forsythe, and the sphericity-style precondition check
    before pooled-variance tests like stat_cohens_d trust their
    pooled SD. Statistic: [(N-k) ln(Sp^2) - Sigma (n_i-1) ln(S_i^2)]
    / C with the standard correction C; 9.487729 is the
    chi-squared(4) 95% critical value for the fixture's k=5 groups.

    Scale shape: ONE pass of per-group exact sufficient statistics
    (count, string-hop decimal sum, sum of squares) collapses the
    stream to k rows; per-group variances are identical doubles in
    both engines (exact moments, same op tree), and the k-term
    ln/1/(n-1) folds accumulate through 6dp decimal casts so the
    tiny cross-row float sums are order-independent. The within-group
    sum of squares re-sums the EXACT (q - s^2/n) terms rather than
    trusting a global moment difference — magnitudes stay inside the
    per-term double->DECIMAL bound."""
    e = load_table(spark, sf_dir, "events")
    g = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(CAST(SUM(CAST(value AS DECIMAL(27,6)))"
                " AS STRING) AS DOUBLE)"
            ).alias("s"),
            F.expr(
                "CAST(CAST(SUM(CAST(value * value AS DECIMAL(27,6)))"
                " AS STRING) AS DOUBLE)"
            ).alias("q"),
        )
        # singleton groups have no variance: s2's (n-1) divisor is 0
        # (Spark ANSI would throw; the oracle HAVING drops them too)
        .filter(F.col("n") > 1)
    )
    v = g.select(
        "event_type", "n",
        F.expr("(q - s * s / n) / (n - 1)").alias("s2"),
        F.expr("q - s * s / n").alias("ssq"),
    )
    agg = v.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.expr(
            "CAST(CAST(SUM(CAST((n - 1) * ln(s2) AS DECIMAL(27,6)))"
            " AS STRING) AS DOUBLE)"
        ).alias("sum_ln"),
        F.expr(
            "CAST(CAST(SUM(CAST(ssq AS DECIMAL(27,6)))"
            " AS STRING) AS DOUBLE)"
        ).alias("ssq_within"),
        F.expr(
            "CAST(CAST(SUM(CAST(CAST(1 AS DOUBLE) / (n - 1)"
            " AS DECIMAL(27,6))) AS STRING) AS DOUBLE)"
        ).alias("sum_inv"),
    )
    b = (
        "((nn - k) * ln(ssq_within / (nn - k)) - sum_ln)"
        " / (1 + (sum_inv - CAST(1 AS DOUBLE) / (nn - k))"
        " / (3 * (k - 1)))"
    )
    return agg.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n"),
        F.round(F.expr(b), 6).alias("bartlett_stat"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.expr(f"{b} > 9.487729").alias("significant_05"),
    )
