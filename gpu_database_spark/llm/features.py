"""Feature engineering + model-evaluation operators for training data.

A 100 TB training pipeline doesn't stop at dedup/filtering — the
label-joined feature tables it emits need leakage-safe categorical
encodings (target encoding), supervised binning diagnostics (weight
of evidence / information value), and ranking-quality evaluation of
the scores that drive curation (AUC, decile lift): "did the quality
score actually order the corpus by usefulness?" is an AUC question.

Every query here is one or two map-side-combinable groupBys plus a
broadcast join back — no per-row Python, no global sort:

* global/grouped rank statistics (AUC's rank sum, decile assignment)
  go through the histogram-bucket rank plan
  (functions/ranks.py:bucketed_row_number), never a single-partition
  ``Window.orderBy``;
* rank sums use DECIMAL(38,0) accumulators — a BIGINT rank sum
  overflows around n ~ 6e9 rows (sum ~ n^2/2), a real 100 TB hazard
  the fixture would never show;
* ratios stay integer/decimal-exact until ONE final double division
  (same operation order as the oracle SQL), so every value
  hash-matches DuckDB bit for bit.

Label/score used throughout: an order is "positive" when its
priority is urgent/high (``substr(o_orderpriority,1,1) IN
('1','2')``), scored by ``o_totalprice`` — a deterministic,
engine-agnostic stand-in for (label = human quality rating, score =
model quality head) over a corpus.

Reference tie-in: the reference engine (lvhaodong0114/gpu-database,
src/cuda/hashTable.cuh) is a KV store with no feature/eval surface;
this family is part of the LLM-pipeline layer the build brief adds
on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum
from gpu_database_spark.functions.ranks import (
    bucketed_row_number,
    grouped_bucketed_row_number,
)
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

# Target-encoding smoothing pseudo-count: the encoded value shrinks
# toward the global prior until a category has ~M observations.
TE_SMOOTHING = 20

# WOE binning: fixed-width price bins (width, clamp), additive 0.5
# smoothing so empty cells never hit log(0).
WOE_BIN_WIDTH = 25000.0
WOE_MAX_BIN = 19

_LABEL_SQL = "CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2') THEN 1 ELSE 0 END"


def _label_col() -> F.Column:
    """Binary label: urgent/high priority order (deterministic)."""
    return (
        F.when(F.substring("o_orderpriority", 1, 1).isin("1", "2"), 1)
        .otherwise(0)
        .alias("y")
    )


@register(
    "feat_target_encoding",
    oracle=f"""
    WITH lab AS (
        SELECT o_orderkey, c_mktsegment AS segment,
               {_LABEL_SQL} AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    seg AS (SELECT segment, CAST(SUM(y) AS BIGINT) AS seg_sum,
                   COUNT(*) AS seg_cnt
            FROM lab GROUP BY segment),
    g AS (SELECT CAST(SUM(y) AS BIGINT) AS g_sum, COUNT(*) AS g_cnt FROM lab)
    SELECT l.o_orderkey, l.segment, l.y,
           round((CAST(seg_sum - l.y AS DOUBLE)
                  + {TE_SMOOTHING}.0 * (CAST(g_sum AS DOUBLE)
                                        / CAST(g_cnt AS DOUBLE)))
                 / CAST(seg_cnt - 1 + {TE_SMOOTHING} AS DOUBLE), 6) AS te
    FROM lab l JOIN seg USING (segment) CROSS JOIN g
    WHERE l.o_orderkey < 2000
    ORDER BY l.o_orderkey
    """,
)
def feat_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe smoothed target encoding of a categorical feature:
    each row's own label is EXCLUDED from its category mean
    (leave-one-out), and sparse categories shrink toward the global
    prior with pseudo-count M — te_i = (seg_sum - y_i + M * prior)
    / (seg_cnt - 1 + M). The standard high-cardinality categorical
    encoder for tabular training data, computed without a per-row
    re-aggregation: one groupBy(category) pass over the full table,
    broadcast back, and the LOO correction is pure row-local
    arithmetic.

    Scale shape: the encode statistics always cover the FULL table
    (the o_orderkey < 2000 filter bounds only the emitted sample);
    category stats are a map-side-combinable groupBy, the join back
    is broadcast (|categories| rows). Integer sums stay integral and
    the single double division happens in the same order as the
    oracle, so values hash-match exactly."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    lab = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", F.col("c_mktsegment").alias("segment"), _label_col()
    )
    seg = lab.groupBy("segment").agg(
        F.sum("y").cast("long").alias("seg_sum"),
        F.count(F.lit(1)).alias("seg_cnt"),
    )
    g = lab.agg(
        F.sum("y").cast("long").alias("g_sum"), F.count(F.lit(1)).alias("g_cnt")
    )
    prior = F.col("g_sum").cast("double") / F.col("g_cnt").cast("double")
    return (
        lab.filter(F.col("o_orderkey") < 2000)
        .join(F.broadcast(seg), "segment")
        .crossJoin(F.broadcast(g))
        .select(
            "o_orderkey",
            "segment",
            "y",
            F.round(
                (
                    (F.col("seg_sum") - F.col("y")).cast("double")
                    + F.lit(float(TE_SMOOTHING)) * prior
                )
                / (F.col("seg_cnt") - 1 + TE_SMOOTHING).cast("double"),
                6,
            ).alias("te"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "feat_woe_iv_binning",
    oracle=f"""
    WITH lab AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / {WOE_BIN_WIDTH}) AS BIGINT),
                     {WOE_MAX_BIN}) AS bin,
               {_LABEL_SQL} AS y
        FROM orders
    ),
    b AS (SELECT bin, COUNT(*) AS n_bin,
                 CAST(SUM(y) AS BIGINT) AS n_pos,
                 COUNT(*) - CAST(SUM(y) AS BIGINT) AS n_neg
          FROM lab GROUP BY bin),
    t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS pos_tot,
                 CAST(SUM(n_neg) AS BIGINT) AS neg_tot FROM b)
    SELECT bin, n_bin, n_pos, n_neg,
           round(ln(((CAST(n_pos AS DOUBLE) + 0.5)
                     / (CAST(pos_tot AS DOUBLE) + 1.0))
                    / ((CAST(n_neg AS DOUBLE) + 0.5)
                       / (CAST(neg_tot AS DOUBLE) + 1.0))), 6) AS woe,
           round(((CAST(n_pos AS DOUBLE) + 0.5)
                  / (CAST(pos_tot AS DOUBLE) + 1.0)
                  - (CAST(n_neg AS DOUBLE) + 0.5)
                    / (CAST(neg_tot AS DOUBLE) + 1.0))
                 * ln(((CAST(n_pos AS DOUBLE) + 0.5)
                       / (CAST(pos_tot AS DOUBLE) + 1.0))
                      / ((CAST(n_neg AS DOUBLE) + 0.5)
                         / (CAST(neg_tot AS DOUBLE) + 1.0))), 6) AS iv_term
    FROM b CROSS JOIN t ORDER BY bin
    """,
)
def feat_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning diagnostic:
    fixed-width bins of the score feature, per-bin WOE = ln(P(bin |
    pos) / P(bin | neg)) with +0.5 additive smoothing, and the IV
    contribution (dp - dn) * WOE whose sum grades the feature's
    predictive power — the standard supervised-binning report for a
    feature store.

    Scale shape: ONE map-side-combinable groupBy on the bin id (the
    bin is a row-local expression — no quantile pass, no sort), a
    2-value total broadcast, then row-local closed forms. The only
    transcendental (ln) is applied to identical doubles in both
    engines and rounded to 6dp."""
    lab = load_table(spark, sf_dir, "orders").select(
        F.least(
            F.floor(F.col("o_totalprice") / WOE_BIN_WIDTH).cast("long"),
            F.lit(WOE_MAX_BIN).cast("long"),
        ).alias("bin"),
        _label_col(),
    )
    b = lab.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y").cast("long")).alias("n_neg"),
    )
    t = b.agg(
        F.sum("n_pos").cast("long").alias("pos_tot"),
        F.sum("n_neg").cast("long").alias("neg_tot"),
    )
    dp = (F.col("n_pos").cast("double") + 0.5) / (
        F.col("pos_tot").cast("double") + 1.0
    )
    dn = (F.col("n_neg").cast("double") + 0.5) / (
        F.col("neg_tot").cast("double") + 1.0
    )
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "bin",
            "n_bin",
            "n_pos",
            "n_neg",
            F.round(F.log(dp / dn), 6).alias("woe"),
            F.round((dp - dn) * F.log(dp / dn), 6).alias("iv_term"),
        )
        .orderBy("bin")
    )


@register(
    "ml_eval_auc",
    oracle=f"""
    WITH lab AS (
        SELECT o_orderkey, o_totalprice AS score,
               {_LABEL_SQL} AS y
        FROM orders
    ),
    r AS (
        SELECT score, y,
               ROW_NUMBER() OVER (ORDER BY score, o_orderkey) AS rn
        FROM lab
    ),
    ar AS (SELECT score, (2 * SUM(rn)) // COUNT(*) AS ar2
           FROM r GROUP BY score),
    s AS (
        SELECT SUM(CASE WHEN r.y = 1 THEN ar.ar2 ELSE 0 END) AS s2,
               CAST(SUM(r.y) AS BIGINT) AS npos,
               COUNT(*) - CAST(SUM(r.y) AS BIGINT) AS nneg,
               COUNT(*) AS n
        FROM r JOIN ar ON r.score = ar.score
    )
    SELECT n, npos, nneg,
           round(CAST(s2 - npos * (npos + 1) AS DOUBLE)
                 / CAST(2 * npos * nneg AS DOUBLE), 6) AS auc,
           round(CAST(s2 - npos * (npos + 1) - npos * nneg AS DOUBLE)
                 / CAST(npos * nneg AS DOUBLE), 6) AS gini
    FROM s
    """,
)
def ml_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of a score against a binary label via the
    Mann-Whitney rank statistic with tie-averaged ranks: AUC =
    (sum of positive ranks - npos*(npos+1)/2) / (npos*nneg), plus the
    Gini coefficient 2*AUC - 1 — the ranking-quality grade for any
    corpus quality score ("do positives outrank negatives?").

    Scale shape: ranks come from the histogram-bucket rank plan
    (functions/ranks.py — never one global sort task); tie-averaged
    ranks are doubled to stay integral (k consecutive row numbers sum
    to k*(lo+hi)/2); the rank sum accumulates in DECIMAL(38,0)
    because sum(ranks) ~ n^2/2 overflows BIGINT near n ~ 6e9 — at
    fixture scale invisible, at 100 TB fatal (the oracle's HUGEINT
    arithmetic is exact at any n). Everything stays integer-exact
    until the single final division; AUC and Gini are derived from
    the same integers, not from each other's rounded output."""
    lab = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("score"), _label_col()
    )
    r = bucketed_row_number(
        lab, "score", ["o_orderkey"], F.floor(F.col("score") / 2000.0),
        rank_col="rn",
    )
    d38 = "decimal(38,0)"
    # Tie-averaged doubled rank as a WINDOW over the tie slice, not a
    # groupBy + join-back (which consumes — and re-executes — the rank
    # plan twice). The tie-group rank sum accumulates in DECIMAL(38,0):
    # with heavy ties SUM(rn) approaches n^2/2, far past BIGINT at
    # corpus scale (DuckDB's HUGEINT needs no cast); the `div` result
    # is an in-range BIGINT again.
    w_tie = Window.partitionBy("score")
    j = (
        r.withColumn(
            "_s2", F.lit(2) * F.sum(F.col("rn").cast(d38)).over(w_tie)
        )
        .withColumn("_c", F.count(F.lit(1)).over(w_tie))
        .withColumn("ar2", F.expr("_s2 div _c"))
    )
    s = j.agg(
        F.sum(
            F.when(F.col("y") == 1, F.col("ar2")).otherwise(0).cast(d38)
        ).alias("s2"),
        F.sum("y").cast("long").alias("npos"),
        (F.count(F.lit(1)) - F.sum("y").cast("long")).alias("nneg"),
        F.count(F.lit(1)).alias("n"),
    )
    npos38 = F.col("npos").cast(d38)
    nneg38 = F.col("nneg").cast(d38)
    return s.select(
        "n",
        "npos",
        "nneg",
        F.round(
            (F.col("s2") - npos38 * (npos38 + 1)).cast("double")
            / (F.lit(2).cast(d38) * npos38 * nneg38).cast("double"),
            6,
        ).alias("auc"),
        F.round(
            (F.col("s2") - npos38 * (npos38 + 1) - npos38 * nneg38).cast(
                "double"
            )
            / (npos38 * nneg38).cast("double"),
            6,
        ).alias("gini"),
    )


@register(
    "ml_lift_deciles",
    oracle=f"""
    WITH lab AS (
        SELECT o_orderkey, o_totalprice AS score,
               {_LABEL_SQL} AS y
        FROM orders
    ),
    n AS (SELECT COUNT(*) AS n FROM lab),
    r AS (
        SELECT y,
               ROW_NUMBER() OVER (ORDER BY score DESC, o_orderkey DESC) AS rn
        FROM lab
    ),
    d AS (SELECT ((rn - 1) * 10) // (SELECT n FROM n) AS decile, y FROM r),
    agg AS (SELECT decile, COUNT(*) AS n_d, CAST(SUM(y) AS BIGINT) AS pos_d
            FROM d GROUP BY decile)
    SELECT decile, n_d, pos_d,
           round(CAST(pos_d AS DOUBLE) / CAST(n_d AS DOUBLE), 6) AS pos_rate,
           round(CAST(SUM(pos_d) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(SUM(pos_d) OVER () AS DOUBLE), 6) AS cum_capture,
           round((CAST(pos_d AS DOUBLE) / CAST(n_d AS DOUBLE))
                 / (CAST(SUM(pos_d) OVER () AS DOUBLE)
                    / CAST((SELECT n FROM n) AS DOUBLE)), 6) AS lift
    FROM agg ORDER BY decile
    """,
)
def ml_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table: rows ranked by score descending, cut
    into 10 equal-count deciles by exact row number (deterministic
    tiebreak, so both engines cut identically), then per-decile
    positive rate, cumulative capture of all positives, and lift vs
    the base rate — the standard "how deep into the ranked corpus do
    the good documents live" report that validates a curation score
    before committing a 100 TB filter pass.

    Scale shape: the descending global row number uses the bucketed
    rank plan (no single-task sort); the decile roll-up is a 10-row
    groupBy; the cumulative/total windows run over that 10-row table
    only. Ratios are integer-exact until one double division per
    column, in oracle-identical order."""
    lab = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("score"), _label_col()
    )
    n = lab.agg(F.count(F.lit(1)).alias("n"))
    r = bucketed_row_number(
        lab, "score", ["o_orderkey"], F.floor(F.col("score") / 2000.0),
        rank_col="rn", ascending=False,
    )
    d = r.crossJoin(F.broadcast(n)).select(
        F.expr("((rn - 1) * 10) div n").alias("decile"), "y", "n"
    )
    agg = d.groupBy("decile", "n").agg(
        F.count(F.lit(1)).alias("n_d"), F.sum("y").cast("long").alias("pos_d")
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rate = F.col("pos_d").cast("double") / F.col("n_d").cast("double")
    base = F.sum("pos_d").over(w_all).cast("double") / F.col("n").cast(
        "double"
    )
    return (
        agg.select(
            "decile",
            "n_d",
            "pos_d",
            F.round(rate, 6).alias("pos_rate"),
            F.round(
                F.sum("pos_d").over(w_cum).cast("double")
                / F.sum("pos_d").over(w_all).cast("double"),
                6,
            ).alias("cum_capture"),
            F.round(rate / base, 6).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "stat_robust_means",
    oracle="""
    WITH r AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice,
                                           l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    kk AS (SELECT *, n // 10 AS k FROM r),
    b AS (SELECT flag,
                 MAX(CASE WHEN rn = k + 1 THEN v END) AS lo_v,
                 MAX(CASE WHEN rn = n - k THEN v END) AS hi_v
          FROM kk GROUP BY flag),
    m AS (SELECT flag, MAX(n) AS n, MAX(k) AS k,
                 CAST(SUM(CAST(CASE WHEN rn > k AND rn <= n - k
                                    THEN v ELSE 0 END
                               AS DECIMAL(27,6))) AS DOUBLE) AS mid_sum,
                 CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS all_sum
          FROM kk GROUP BY flag)
    SELECT m.flag AS l_returnflag,
           CAST(m.n AS BIGINT) AS n, CAST(m.k AS BIGINT) AS k,
           round(all_sum / CAST(m.n AS DOUBLE), 6) AS mean_all,
           round(mid_sum / CAST(m.n - 2 * m.k AS DOUBLE), 6) AS mean_trimmed,
           round((mid_sum + CAST(m.k AS DOUBLE) * lo_v
                  + CAST(m.k AS DOUBLE) * hi_v)
                 / CAST(m.n AS DOUBLE), 6) AS mean_winsor
    FROM m JOIN b ON m.flag = b.flag ORDER BY l_returnflag
    """,
)
def stat_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust location estimates per group: the 10% trimmed
    mean (drop the k = n div 10 smallest and largest values) and the
    10% winsorized mean (clamp them to the (k+1)-th / (n-k)-th order
    statistics) next to the plain mean — the heavy-tail-safe
    aggregates a metrics pipeline swaps in when a mean is driven by
    outliers.

    Scale shape: order statistics come from the grouped histogram-
    bucket rank plan (functions/ranks.py — parallelism = groups x
    value-buckets, never a whole-group sort on the 3-value flag key);
    the clamp values fold into the same single groupBy as the trimmed
    and winsorized sums (conditional MAX on the rank), so the ranked
    frame is consumed exactly once; group counts come from the raw
    frame, not the rank plan. Sums use the DECIMAL(27,6) exact
    discipline so the single final double division hash-matches the
    oracle (which states the same math with flat windows and a
    separate clamp join at fixture scale)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    r = grouped_bucketed_row_number(
        li, ["flag"], "v", ["l_orderkey", "l_linenumber"],
        F.floor(F.col("v") / 2000.0), rank_col="rn",
    )
    # counts come from the raw frame (deriving them from `r` would
    # re-execute the whole rank plan just to count rows), and the
    # clamp values fold into the SAME groupBy as the sums — one pass
    # over the ranked frame instead of two plus a join
    cnt = li.groupBy("flag").agg(F.count(F.lit(1)).alias("n")).select(
        "flag", "n", F.expr("n div 10").alias("k")
    )
    kk = r.join(F.broadcast(cnt), "flag")
    mid = F.when(
        (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k")),
        F.col("v"),
    ).otherwise(F.lit(0.0))
    m = kk.groupBy("flag").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        dsum(mid).alias("mid_sum"),
        dsum(F.col("v")).alias("all_sum"),
        F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("v"))).alias("lo_v"),
        F.max(
            F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("v"))
        ).alias("hi_v"),
    )
    kd = F.col("k").cast("double")
    return (
        m.select(
            F.col("flag").alias("l_returnflag"),
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.round(F.col("all_sum") / F.col("n").cast("double"), 6).alias(
                "mean_all"
            ),
            F.round(
                F.col("mid_sum")
                / (F.col("n") - 2 * F.col("k")).cast("double"),
                6,
            ).alias("mean_trimmed"),
            F.round(
                (F.col("mid_sum") + kd * F.col("lo_v") + kd * F.col("hi_v"))
                / F.col("n").cast("double"),
                6,
            ).alias("mean_winsor"),
        )
        .orderBy("l_returnflag")
    )


# Calibration: equal-width score bins over the observed price range
# (row-local bin id — no quantile pass), clamped to CAL_MAX_BIN.
CAL_BIN_WIDTH = 50000.0
CAL_MAX_BIN = 9

# Threshold sweep: precision/recall at every CAL-bin lower edge —
# the K-point PR curve a score gate is tuned from.


@register(
    "ml_calibration_bins",
    oracle=f"""
    WITH lab AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / {CAL_BIN_WIDTH}) AS BIGINT),
                     {CAL_MAX_BIN}) AS bin,
               LEAST(o_totalprice / {CAL_BIN_WIDTH * (CAL_MAX_BIN + 1)},
                     1.0) AS p,
               {_LABEL_SQL} AS y
        FROM orders
    ),
    b AS (SELECT bin, COUNT(*) AS n_bin,
                 CAST(SUM(y) AS BIGINT) AS n_pos,
                 CAST(SUM(CAST(p AS DECIMAL(27,6))) AS DOUBLE) AS p_sum,
                 CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(27,6)))
                      AS DOUBLE) AS brier_sum
          FROM lab GROUP BY bin)
    SELECT bin, n_bin, n_pos,
           round(p_sum / CAST(n_bin AS DOUBLE), 6) AS mean_pred,
           round(CAST(n_pos AS DOUBLE) / CAST(n_bin AS DOUBLE), 6)
               AS frac_pos,
           round(brier_sum / CAST(n_bin AS DOUBLE), 6) AS brier
    FROM b ORDER BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + per-bin Brier score for a probabilistic
    score: equal-width bins of the scaled score (clamped to [0, 1] —
    the tail above the top bin edge saturates at p = 1), and per
    bin the mean predicted probability vs the observed positive rate
    — calibrated scores put the two on the diagonal. The per-bin
    Brier term mean((p - y)^2) localizes WHERE the score is
    miscalibrated, which is what a curation team reweights.

    Scale shape: the bin id is a row-local expression, so the whole
    report is ONE map-side-combinable groupBy producing <= 10 rows —
    no quantile pass, no sort, no second scan. Sums accumulate in
    DECIMAL(27,6) (exact at any row count) and the two final double
    divisions happen in oracle-identical order."""
    scale = CAL_BIN_WIDTH * (CAL_MAX_BIN + 1)
    lab = load_table(spark, sf_dir, "orders").select(
        F.least(
            F.floor(F.col("o_totalprice") / CAL_BIN_WIDTH).cast("long"),
            F.lit(CAL_MAX_BIN).cast("long"),
        ).alias("bin"),
        F.least(F.col("o_totalprice") / scale, F.lit(1.0)).alias("p"),
        _label_col(),
    )
    d27 = "decimal(27,6)"
    b = lab.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.col("p").cast(d27)).cast("double").alias("p_sum"),
        F.sum(
            ((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).cast(d27)
        )
        .cast("double")
        .alias("brier_sum"),
    )
    nb = F.col("n_bin").cast("double")
    return b.select(
        "bin",
        "n_bin",
        "n_pos",
        F.round(F.col("p_sum") / nb, 6).alias("mean_pred"),
        F.round(F.col("n_pos").cast("double") / nb, 6).alias("frac_pos"),
        F.round(F.col("brier_sum") / nb, 6).alias("brier"),
    ).orderBy("bin")


@register(
    "ml_threshold_sweep",
    oracle=f"""
    WITH lab AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / {CAL_BIN_WIDTH}) AS BIGINT),
                     {CAL_MAX_BIN}) AS bin,
               {_LABEL_SQL} AS y
        FROM orders
    ),
    b AS (SELECT bin, COUNT(*) AS n_bin, CAST(SUM(y) AS BIGINT) AS pos_bin
          FROM lab GROUP BY bin),
    c AS (
        SELECT bin,
               CAST(SUM(n_bin) OVER (ORDER BY bin DESC) AS BIGINT) AS n_ge,
               CAST(SUM(pos_bin) OVER (ORDER BY bin DESC) AS BIGINT)
                   AS pos_ge,
               CAST(SUM(pos_bin) OVER () AS BIGINT) AS pos_all
        FROM b
    )
    SELECT bin AS threshold_bin,
           round(bin * {CAL_BIN_WIDTH}, 1) AS threshold_score,
           n_ge AS n_flagged, pos_ge AS tp,
           round(CAST(pos_ge AS DOUBLE) / CAST(n_ge AS DOUBLE), 6)
               AS precision,
           round(CAST(pos_ge AS DOUBLE) / CAST(pos_all AS DOUBLE), 6)
               AS recall,
           round(CAST(2 * pos_ge AS DOUBLE)
                 / CAST(n_ge + pos_all AS DOUBLE), 6) AS f1
    FROM c ORDER BY threshold_bin
    """,
)
def ml_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 at every candidate score threshold
    (the lower edge of each score bin): flag rows with score >=
    threshold, report how pure and how complete the flagged set is —
    the sweep that picks the operating point of a quality-score gate
    before a 100 TB filter pass commits to one.

    Scale shape: ONE groupBy on the row-local bin id collapses the
    corpus to <= 10 rows; the >=-threshold counts are then suffix
    sums (descending cumulative window) over that tiny table, so the
    window is trivially cheap and the full sweep costs exactly one
    scan. F1 is computed from the same integers as precision/recall
    (2*tp / (flagged + positives)), keeping every value
    integer-exact until one division."""
    lab = load_table(spark, sf_dir, "orders").select(
        F.least(
            F.floor(F.col("o_totalprice") / CAL_BIN_WIDTH).cast("long"),
            F.lit(CAL_MAX_BIN).cast("long"),
        ).alias("bin"),
        _label_col(),
    )
    b = lab.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("y").cast("long").alias("pos_bin"),
    )
    w_ge = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = b.select(
        "bin",
        F.sum("n_bin").over(w_ge).cast("long").alias("n_ge"),
        F.sum("pos_bin").over(w_ge).cast("long").alias("pos_ge"),
        F.sum("pos_bin").over(w_all).cast("long").alias("pos_all"),
    )
    return c.select(
        F.col("bin").alias("threshold_bin"),
        F.round(F.col("bin") * CAL_BIN_WIDTH, 1).alias("threshold_score"),
        F.col("n_ge").alias("n_flagged"),
        F.col("pos_ge").alias("tp"),
        F.round(
            F.col("pos_ge").cast("double") / F.col("n_ge").cast("double"), 6
        ).alias("precision"),
        F.round(
            F.col("pos_ge").cast("double") / F.col("pos_all").cast("double"),
            6,
        ).alias("recall"),
        F.round(
            (2 * F.col("pos_ge")).cast("double")
            / (F.col("n_ge") + F.col("pos_all")).cast("double"),
            6,
        ).alias("f1"),
    ).orderBy("threshold_bin")


@register(
    "ml_eval_auc_grouped",
    oracle=f"""
    WITH lab AS (
        SELECT o_orderkey, c_mktsegment AS segment,
               o_totalprice AS score, {_LABEL_SQL} AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    r AS (
        SELECT segment, score, y,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY score, o_orderkey) AS rn
        FROM lab
    ),
    ar AS (SELECT segment, score, (2 * SUM(rn)) // COUNT(*) AS ar2
           FROM r GROUP BY segment, score),
    s AS (
        SELECT r.segment,
               SUM(CASE WHEN r.y = 1 THEN ar.ar2 ELSE 0 END) AS s2,
               CAST(SUM(r.y) AS BIGINT) AS npos,
               COUNT(*) - CAST(SUM(r.y) AS BIGINT) AS nneg,
               COUNT(*) AS n
        FROM r JOIN ar ON r.segment = ar.segment AND r.score = ar.score
        GROUP BY r.segment
    )
    SELECT segment, n, npos, nneg,
           round(CAST(s2 - npos * (npos + 1) AS DOUBLE)
                 / CAST(2 * npos * nneg AS DOUBLE), 6) AS auc
    FROM s ORDER BY segment
    """,
)
def ml_eval_auc_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment ROC AUC — does the score rank positives above
    negatives WITHIN each customer segment? The fairness/consistency
    slice of ml_eval_auc: a score can look fine globally while being
    anti-predictive inside one cohort (Simpson's reversal), so a
    curation gate is audited group by group before it is applied
    corpus-wide.

    Scale shape: per-group ranks come from the grouped histogram-
    bucket plan (parallelism = segments x score-buckets — the 5-value
    segment key alone never becomes 5 sort tasks); tie-averaged
    doubled ranks and the per-segment rank sums accumulate in
    DECIMAL(38,0); one closed-form division per segment at the end."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    lab = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("score"),
        _label_col(),
    )
    r = grouped_bucketed_row_number(
        lab, ["segment"], "score", ["o_orderkey"],
        F.floor(F.col("score") / 2000.0), rank_col="rn",
    )
    d38 = "decimal(38,0)"
    # window tie-average over the (segment, score) tie slice — same
    # single-pipeline form as ml_eval_auc (no join-back double-run)
    w_tie = Window.partitionBy("segment", "score")
    s = (
        r.withColumn(
            "_s2", F.lit(2) * F.sum(F.col("rn").cast(d38)).over(w_tie)
        )
        .withColumn("_c", F.count(F.lit(1)).over(w_tie))
        .withColumn("ar2", F.expr("_s2 div _c"))
        .groupBy("segment")
        .agg(
            F.sum(
                F.when(F.col("y") == 1, F.col("ar2")).otherwise(0).cast(d38)
            ).alias("s2"),
            F.sum("y").cast("long").alias("npos"),
            (F.count(F.lit(1)) - F.sum("y").cast("long")).alias("nneg"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    npos38 = F.col("npos").cast(d38)
    nneg38 = F.col("nneg").cast(d38)
    return s.select(
        "segment",
        "n",
        "npos",
        "nneg",
        F.round(
            (F.col("s2") - npos38 * (npos38 + 1)).cast("double")
            / (F.lit(2).cast(d38) * npos38 * nneg38).cast("double"),
            6,
        ).alias("auc"),
    ).orderBy("segment")


AP_RANK_BUCKET = 4096  # ranks per prefix-sum bucket


@register(
    "ml_eval_average_precision",
    oracle=f"""
    WITH lab AS (
        SELECT o_orderkey, o_totalprice AS score, {_LABEL_SQL} AS y
        FROM orders
    ),
    r AS (
        SELECT y,
               ROW_NUMBER() OVER (ORDER BY score DESC, o_orderkey DESC)
                   AS rn
        FROM lab
    ),
    c AS (
        SELECT rn, y,
               SUM(y) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)
                   AS pos_cum
        FROM r
    ),
    terms AS (
        SELECT round(CAST(pos_cum AS DOUBLE) / CAST(rn AS DOUBLE), 12)
                   AS term
        FROM c WHERE y = 1
    ),
    s AS (
        SELECT CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE)
                   AS term_sum,
               COUNT(*) AS npos
        FROM terms
    )
    SELECT npos, round(term_sum / CAST(npos AS DOUBLE), 6) AS avg_precision
    FROM s
    """,
)
def ml_eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Average Precision (area under the precision-recall curve
    by the step-wise definition): AP = mean over positives of
    precision@rank(positive) — the eval metric that, unlike ROC AUC,
    collapses when positives are rare and the ranker front-loads
    negatives, which is why retrieval and filtering gates report it.

    Scale shape: the descending global rank comes from the bucketed
    histogram plan; the running positive count is a TWO-LEVEL prefix
    sum over fixed-width rank buckets (per-bucket window + broadcast
    bucket offsets — the pack_sequences decomposition, never one
    global window task). Per-positive terms are rounded to 12dp (both
    engines round half away from zero) and summed in DECIMAL(38,12),
    so the one double division at the end hash-matches."""
    lab = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("score"), _label_col()
    )
    r = bucketed_row_number(
        lab, "score", ["o_orderkey"], F.floor(F.col("score") / 2000.0),
        rank_col="rn", ascending=False,
    ).select("rn", "y")
    b = r.withColumn("bkt", F.expr(f"rn div {AP_RANK_BUCKET}"))
    wb = Window.partitionBy("bkt").orderBy("rn")
    local = b.withColumn("local_cum", F.sum("y").over(wb))
    totals = b.groupBy("bkt").agg(F.sum("y").alias("bkt_pos"))
    wo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bkt",
        F.coalesce(F.sum("bkt_pos").over(wo), F.lit(0)).alias("bkt_off"),
    )
    c = local.join(F.broadcast(offsets), "bkt").select(
        "rn", "y", (F.col("bkt_off") + F.col("local_cum")).alias("pos_cum")
    )
    terms = c.filter(F.col("y") == 1).select(
        F.round(
            F.col("pos_cum").cast("double") / F.col("rn").cast("double"), 12
        ).alias("term")
    )
    s = terms.agg(
        F.sum(F.col("term").cast("decimal(38,12)"))
        .cast("double")
        .alias("term_sum"),
        F.count(F.lit(1)).alias("npos"),
    )
    return s.select(
        "npos",
        F.round(
            F.col("term_sum") / F.col("npos").cast("double"), 6
        ).alias("avg_precision"),
    )


# Fixed probability link for log-loss/Brier: p = clamp(round(score /
# 60000, 4), 1e-4, 1 - 1e-4). Rounding p to 4dp FIRST bounds the
# distinct inputs ln() ever sees to <= 10^4 values, so a last-ulp
# libm-vs-java.Math difference cannot straddle an 8dp rounding
# boundary anywhere in the corpus (the per-row terms are then summed
# exactly via DECIMAL).
_P_SQL = (
    "least(greatest(round(o_totalprice / 60000.0, 4), 0.0001), 0.9999)"
)


@register(
    "ml_eval_logloss_brier",
    oracle=f"""
    WITH scored AS (
        SELECT {_LABEL_SQL} AS y, {_P_SQL} AS p
        FROM orders
    ),
    terms AS (
        SELECT y,
               round(-(y * ln(p) + (1 - y) * ln(1 - p)), 8) AS ll_term,
               round((p - y) * (p - y), 8) AS brier_term
        FROM scored
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(y) AS BIGINT) AS npos,
           round(CAST(SUM(CAST(ll_term AS DECIMAL(38,10))) AS DOUBLE)
                 / COUNT(*), 6) AS logloss,
           round(CAST(SUM(CAST(brier_term AS DECIMAL(38,10))) AS DOUBLE)
                 / COUNT(*), 6) AS brier
    FROM terms
    """,
)
def ml_eval_logloss_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log loss (cross-entropy) and Brier score of a probability
    forecast against the binary label — the calibration-sensitive
    companions to AUC (which only sees ranking): logloss =
    -mean(y ln p + (1-y) ln(1-p)), brier = mean((p - y)^2).

    Scale shape: pure map-side per-row terms + ONE exact-decimal
    aggregation — no shuffle beyond the final single-row combine.
    Cross-engine exactness: p is rounded to 4dp BEFORE the
    transcendental (bounding ln's input domain to 10^4 distinct
    doubles), each term is rounded at 8dp, and the mean is an exact
    DECIMAL(38,10) sum with one final double division."""
    scored = load_table(spark, sf_dir, "orders").select(
        _label_col(),
        F.least(
            F.greatest(F.round(F.col("o_totalprice") / 60000.0, 4),
                       F.lit(0.0001)),
            F.lit(0.9999),
        ).alias("p"),
    )
    yd = F.col("y").cast("double")
    terms = scored.select(
        "y",
        F.round(
            -(yd * F.log(F.col("p")) + (1 - yd) * F.log(1 - F.col("p"))), 8
        ).alias("ll_term"),
        F.round((F.col("p") - yd) * (F.col("p") - yd), 8).alias("brier_term"),
    )
    d38 = "decimal(38,10)"
    return terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("npos"),
        F.round(
            F.sum(F.col("ll_term").cast(d38)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("logloss"),
        F.round(
            F.sum(F.col("brier_term").cast(d38)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("brier"),
    )


@register(
    "ml_eval_confusion_f1",
    oracle=f"""
    WITH scored AS (
        SELECT {_LABEL_SQL} AS y,
               CASE WHEN o_totalprice >= 30000 THEN 1 ELSE 0 END AS yhat
        FROM orders
    ),
    c AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(y * yhat) AS BIGINT) AS tp,
               CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
               CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
               CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn
        FROM scored
    )
    SELECT n, tp, fp, fn, tn,
           round(CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS accuracy,
           round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
               AS precision_,
           round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6)
               AS recall_,
           round(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE),
                 6) AS f1,
           round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                  - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                 / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)),
                 6) AS mcc
    FROM c
    """,
)
def ml_eval_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix at a fixed decision threshold (score >= 30000)
    plus the derived accuracy / precision / recall / F1 / Matthews
    correlation — the deployment-gate metrics once a corpus-quality
    classifier's threshold is frozen.

    Scale shape: ONE single-row aggregation of four exact integer
    counts; every metric is a single division (F1 from the integer
    identity 2tp/(2tp+fp+fn), never from rounded precision/recall).
    MCC's four marginal factors are cast to DOUBLE before
    multiplying — their BIGINT product overflows past n ~ 5e4^4 — in
    the same textual order as the oracle, so it is bit-identical."""
    scored = load_table(spark, sf_dir, "orders").select(
        _label_col(),
        F.when(F.col("o_totalprice") >= 30000, 1).otherwise(0).alias("yhat"),
    )
    c = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y") * F.col("yhat")).cast("long").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("long").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("long").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat"))).cast("long").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c_).cast("double") for c_ in ("tp", "fp", "fn", "tn"))
    return c.select(
        "n", "tp", "fp", "fn", "tn",
        F.round((F.col("tp") + F.col("tn")).cast("double")
                / F.col("n").cast("double"), 6).alias("accuracy"),
        F.round(tp / (F.col("tp") + F.col("fp")).cast("double"), 6)
            .alias("precision_"),
        F.round(tp / (F.col("tp") + F.col("fn")).cast("double"), 6)
            .alias("recall_"),
        F.round((2 * F.col("tp")).cast("double")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
                6).alias("f1"),
        F.round(
            (tp * tn - fp * fn)
            / F.sqrt(
                (F.col("tp") + F.col("fp")).cast("double")
                * (F.col("tp") + F.col("fn")).cast("double")
                * (F.col("tn") + F.col("fp")).cast("double")
                * (F.col("tn") + F.col("fn")).cast("double")
            ),
            6,
        ).alias("mcc"),
    )


# NDCG cutoff: deep enough to cross several relevance grades on the
# fixture, tiny vs the corpus — the top-k sets are driver-safe.
NDCG_K = 100


@register(
    "ml_eval_ndcg",
    oracle=f"""
    WITH lab AS (
        SELECT o_orderkey, o_totalprice AS score,
               5 - CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS rel
        FROM orders
    ),
    by_score AS (
        SELECT rel, ROW_NUMBER() OVER (ORDER BY score DESC, o_orderkey DESC)
                        AS rn
        FROM lab
    ),
    by_rel AS (
        SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, o_orderkey DESC)
                        AS rn
        FROM lab
    ),
    dcg AS (
        SELECT CAST(SUM(CAST(round((pow(2, rel) - 1) / log2(rn + 1), 8)
                             AS DECIMAL(38,10))) AS DOUBLE) AS dcg
        FROM by_score WHERE rn <= {NDCG_K}
    ),
    idcg AS (
        SELECT CAST(SUM(CAST(round((pow(2, rel) - 1) / log2(rn + 1), 8)
                             AS DECIMAL(38,10))) AS DOUBLE) AS idcg
        FROM by_rel WHERE rn <= {NDCG_K}
    )
    SELECT {NDCG_K} AS k,
           round(dcg.dcg, 6) AS dcg,
           round(idcg.idcg, 6) AS idcg,
           round(dcg.dcg / idcg.idcg, 6) AS ndcg
    FROM dcg CROSS JOIN idcg
    """,
)
def ml_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@100 of the price score against graded priority relevance
    (urgent=4 .. low=0): DCG = sum over the top-k by score of
    (2^rel - 1)/log2(rank+1), normalized by the ideal ordering's DCG —
    THE ranking metric when relevance is graded, not binary.

    Scale shape: both rankings (by score, by relevance) go through
    the histogram-bucket rank plan (functions/ranks.py) — never a
    global sort; only rank <= k rows (a constant) survive to the gain
    fold. Gain terms are rounded at 8dp (inputs to log2 are the <= k+1
    integers, so cross-engine libm drift cannot straddle a boundary)
    and summed exactly in DECIMAL(38,10)."""
    lab = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("score"),
        (5 - F.substring("o_orderpriority", 1, 1).cast("int")).alias("rel"),
    )
    by_score = bucketed_row_number(
        lab, "score", ["o_orderkey"], F.floor(F.col("score") / 2000.0),
        rank_col="rn", ascending=False,
    )
    by_rel = bucketed_row_number(
        lab, "rel", ["o_orderkey"], F.col("rel"),
        rank_col="rn", ascending=False,
    )

    def fold(ranked: DataFrame, out: str) -> DataFrame:
        term = F.round(
            (F.pow(F.lit(2), F.col("rel")) - 1) / F.log2(F.col("rn") + 1), 8
        )
        return (
            ranked.filter(F.col("rn") <= NDCG_K)
            .agg(
                F.sum(term.cast("decimal(38,10)")).cast("double").alias(out)
            )
        )

    dcg = fold(by_score, "dcg")
    idcg = fold(by_rel, "idcg")
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .select(
            F.lit(NDCG_K).alias("k"),
            F.round(F.col("dcg"), 6).alias("dcg"),
            F.round(F.col("idcg"), 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


@register(
    "feat_scale_robust",
    oracle="""
    WITH j AS (
        SELECT c.c_mktsegment AS seg, o.o_totalprice AS v, o.o_orderkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    r AS (
        SELECT seg, v,
               ROW_NUMBER() OVER (PARTITION BY seg
                                  ORDER BY v, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY seg) AS n_g
        FROM j
    ),
    q AS (
        SELECT seg, n_g,
               MAX(CASE WHEN rn = CAST(ceil(0.25 * n_g) AS BIGINT)
                        THEN v END) AS q1,
               MAX(CASE WHEN rn = CAST(ceil(0.50 * n_g) AS BIGINT)
                        THEN v END) AS med,
               MAX(CASE WHEN rn = CAST(ceil(0.75 * n_g) AS BIGINT)
                        THEN v END) AS q3
        FROM r GROUP BY seg, n_g
    )
    SELECT seg, CAST(n_g AS BIGINT) AS n, q1, med, q3,
           round(q3 - q1, 6) AS iqr,
           round((100000.0 - med) / (q3 - q1), 6) AS scaled_100k
    FROM q ORDER BY seg
    """,
)
def feat_scale_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-scaler fit per segment: exact type-1 (lower order
    statistic) Q1/median/Q3 of order value within each market segment,
    the IQR, and the scaler applied to a fixed probe value
    ((100000 - median) / IQR) — the outlier-insensitive alternative to
    z-scoring for feature normalization.

    Scale shape: ranks come from the GROUPED histogram-bucket rank
    plan (functions/ranks.py:grouped_bucketed_row_number) — the heavy
    window partitions by (segment, price-bucket), never sorting a
    whole segment on one task; the quantile picks are exact order
    statistics at ranks ceil(q*n) (0.25/0.5/0.75 are exact binary, so
    ceil agrees across engines), selected by ONE aggregation. Values
    pass through untouched (2dp doubles) — no arithmetic before the
    final two rounded outputs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("v"),
        "o_orderkey",
    )
    r = grouped_bucketed_row_number(
        j, ["seg"], "v", ["o_orderkey"], F.floor(F.col("v") / 2000.0),
        rank_col="rn",
    )
    ng = j.groupBy("seg").agg(F.count(F.lit(1)).alias("n_g"))
    r = r.join(F.broadcast(ng), "seg")

    def at(q: float, out: str) -> F.Column:
        return F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(q) * F.col("n_g")).cast("long"),
                F.col("v"),
            )
        ).alias(out)

    qs = r.groupBy("seg", "n_g").agg(
        at(0.25, "q1"), at(0.50, "med"), at(0.75, "q3")
    )
    return qs.select(
        "seg",
        F.col("n_g").cast("long").alias("n"),
        "q1",
        "med",
        "q3",
        F.round(F.col("q3") - F.col("q1"), 6).alias("iqr"),
        F.round(
            (F.lit(100000.0) - F.col("med")) / (F.col("q3") - F.col("q1")), 6
        ).alias("scaled_100k"),
    ).orderBy("seg")


# Feature hashing: 2^10 buckets via the md5 window trick (same
# deterministic-hash discipline as llm/sampling.py — reproducible on
# any cluster, reproducible in the oracle).
FH_BUCKETS = 1024


@register(
    "ml_feature_hashing",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, w,
               CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)
                   % {FH_BUCKETS} AS slot
        FROM tok
    ),
    vocab AS (SELECT DISTINCT w, slot FROM hashed),
    coll AS (
        SELECT slot, COUNT(*) AS n_terms FROM vocab GROUP BY slot
    ),
    doc AS (
        SELECT doc_id, COUNT(DISTINCT slot) AS nnz, COUNT(*) AS n_tok
        FROM hashed GROUP BY doc_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM vocab) AS vocab_size,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM coll) AS slots_used,
           (SELECT CAST(MAX(n_terms) AS BIGINT) FROM coll)
               AS worst_collisions,
           (SELECT CAST(SUM(CASE WHEN n_terms > 1 THEN n_terms ELSE 0 END)
                        AS BIGINT) FROM coll) AS terms_colliding,
           (SELECT round(CAST(SUM(CAST(nnz AS DECIMAL(27,6))) AS DOUBLE)
                         / COUNT(*), 6) FROM doc) AS avg_doc_nnz
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature audit: tokens hash into 1024 feature
    slots (md5-derived — deterministic on any cluster AND in the
    oracle, unlike murmur-based hashingTF); reports vocabulary size,
    slots used, the worst slot's term count, how many distinct terms
    collide, and mean per-doc sparsity — the pre-flight a pipeline
    runs before freezing a hashed feature space.

    Scale shape: explode once; collision stats come from the DISTINCT
    (term, slot) projection (vocab-bounded — Zipf-small after the
    distinct) and per-doc sparsity from one (doc, slot) distinct
    aggregate; no join touches the token stream twice. The slot hash
    is the same exact 60-bit md5-window arithmetic both engines
    evaluate bit-identically.

    Reference tie-in: the md5 slot hash mirrors the reference's hash
    bucket mapping (src/cuda/hashTable.cuh:94-110) repurposed for
    feature spaces."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    slot = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
        % FH_BUCKETS
    )
    hashed = tok.select("doc_id", "w", slot.alias("slot"))
    vocab = hashed.select("w", "slot").distinct()
    coll = vocab.groupBy("slot").agg(F.count(F.lit(1)).alias("n_terms"))
    doc = hashed.groupBy("doc_id").agg(
        F.count_distinct("slot").alias("nnz")
    )
    vs = vocab.agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    cs = coll.agg(
        F.count(F.lit(1)).cast("long").alias("slots_used"),
        F.max("n_terms").cast("long").alias("worst_collisions"),
        F.sum(F.when(F.col("n_terms") > 1, F.col("n_terms")).otherwise(0))
            .cast("long").alias("terms_colliding"),
    )
    ds = doc.agg(
        F.round(
            F.sum(F.col("nnz").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_doc_nnz")
    )
    return vs.crossJoin(F.broadcast(cs)).crossJoin(F.broadcast(ds))


# MRR/recall@k evaluation: rank customers per nation by account
# balance (descending, custkey-desc tiebreak matching the bucketed
# rank's total order); "relevant" = balance above this threshold.
MRR_K = 10
MRR_REL_BAL = 5000.0


@register(
    "ml_eval_mrr",
    oracle=f"""
    WITH ranked AS (
        SELECT c_nationkey AS grp,
               CASE WHEN c_acctbal > {MRR_REL_BAL} THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC,
                                           c_custkey DESC) AS rn
        FROM customer
    ),
    per_grp AS (
        SELECT grp,
               SUM(rel) AS n_rel,
               SUM(CASE WHEN rn <= {MRR_K} THEN rel ELSE 0 END) AS hits,
               MIN(CASE WHEN rel = 1 THEN rn END) AS first_rel
        FROM ranked GROUP BY grp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST((2 * CAST(SUM(CAST(round(1.0 / first_rel, 8)
                                   AS DECIMAL(27,8))) * 100000000
                          AS HUGEINT) + COUNT(*)) // (2 * COUNT(*))
                AS DOUBLE) / 100000000.0 AS mrr,
           CAST((2 * CAST(SUM(CAST(round(CAST(hits AS DOUBLE) / n_rel, 8)
                                   AS DECIMAL(27,8))) * 100000000
                          AS HUGEINT) + COUNT(*)) // (2 * COUNT(*))
                AS DOUBLE) / 100000000.0 AS recall_at_k,
           CAST((2 * CAST(SUM(CAST(round(CAST(hits AS DOUBLE) / {MRR_K},
                                         8) AS DECIMAL(27,8))) * 100000000
                          AS HUGEINT) + COUNT(*)) // (2 * COUNT(*))
                AS DOUBLE) / 100000000.0 AS precision_at_k
    FROM per_grp WHERE n_rel > 0
    """,
)
def ml_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped retrieval metrics at k=MRR_K: mean reciprocal rank of
    the first relevant item, macro recall@k and precision@k — the
    standard evaluation triple for the candidate-ranking stage of a
    retrieval pipeline (one "query" per nation, candidates ranked by
    account balance, relevance = balance above threshold).

    Scale shape: ranks come from the per-group histogram-bucket rank
    plan (functions/ranks.py) — the heavy window partitions by
    (group, bucket), so even a handful of groups spreads across the
    cluster; the metric fold is two tiny groupBys (groups, then one
    global row). Per-group reciprocal ranks and ratios are rounded at
    8dp, and the three means are half-up micro-unit quotients via the
    (2u+c) div (2c) identity (u >= 0 here) — both engines hash-match
    bit for bit."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("grp"),
        F.col("c_acctbal").alias("bal"),
        "c_custkey",
        F.when(F.col("c_acctbal") > MRR_REL_BAL, 1).otherwise(0).alias("rel"),
    )
    ranked = grouped_bucketed_row_number(
        cust,
        ["grp"],
        "bal",
        ["c_custkey"],
        F.floor(F.col("bal") / 500.0),
        rank_col="rn",
        ascending=False,
    )
    per_grp = ranked.groupBy("grp").agg(
        F.sum("rel").alias("n_rel"),
        F.sum(F.when(F.col("rn") <= MRR_K, F.col("rel")).otherwise(0)).alias(
            "hits"
        ),
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_rel"),
    )

    def mean8(term: str, out: str) -> F.Column:
        # half-up mean of 8dp-rounded terms via (2u+c) div (2c); all
        # terms here are ratios in [0, 1] so u >= 0 holds
        return (
            F.expr(
                f"(2 * CAST(SUM(CAST({term} AS DECIMAL(27,8)))"
                f" * 100000000 AS DECIMAL(38,0)) + COUNT(*))"
                f" div (2 * COUNT(*))"
            ).cast("double")
            / 100000000.0
        ).alias(out)

    return per_grp.filter(F.col("n_rel") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        mean8("round(1.0 / first_rel, 8)", "mrr"),
        mean8("round(CAST(hits AS DOUBLE) / n_rel, 8)", "recall_at_k"),
        mean8(f"round(CAST(hits AS DOUBLE) / {MRR_K}, 8)", "precision_at_k"),
    )


@register(
    "ml_eval_regression",
    oracle="""
    WITH p AS (
        SELECT l_extendedprice * (1 - l_discount) * (1 + l_tax) AS y,
               l_extendedprice AS yhat
        FROM lineitem
    ),
    t AS (
        SELECT y, yhat, y - yhat AS res, y / 1000 AS yk FROM p
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(CAST(SUM(CAST(res * res AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS sr2,
               CAST(CAST(SUM(CAST(abs(res) AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS sa,
               CAST(CAST(SUM(CAST(abs(res) / y AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS sape,
               CAST(CAST(SUM(CAST(yk AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS syk,
               CAST(CAST(SUM(CAST(yk * yk AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS syk2
        FROM t
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(sqrt(sr2 / n), 6) AS rmse,
           round(sa / n, 6) AS mae,
           round(100 * sape / n, 6) AS mape_pct,
           round(1 - (sr2 / 1000000) / (syk2 - syk * syk / n), 8) AS r2
    FROM s
    """,
)
def ml_eval_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-model evaluation in ONE pass: RMSE, MAE, MAPE and
    R^2 of the pre-discount price as a predictor of the final charged
    amount — the metric quartet every regression scorecard reports
    (complements the classification metrics ml_eval_auc /
    ml_eval_confusion_f1 and the ranking metrics ml_eval_ndcg /
    ml_eval_mrr).

    Scale shape: one map-side-combinable aggregation collapses 100 TB
    to six scalars; the metric formulas are arithmetic on that single
    row. Cross-engine exactness: residual terms (|res| <= ~1e4, res^2
    <= ~1e8) and APE ratios are within the DECIMAL(27,6) per-term
    exactness bound, and the R^2 variance pass works in KILOdollars
    (yk = y/1000, yk^2 <= ~1e4) because a raw y^2 term (~1e10) would
    straddle the double->DECIMAL shortest-representation bound
    (compat.py); R^2 is scale-invariant so sr2 rescales by 1e6 in the
    final formula. Exact sums convert once via the correctly-rounded
    VARCHAR hop; final formulas are identical IEEE op trees."""
    # spread=True: the residual/APE decimal terms fold into the scan;
    # single row group = single core without it (A/B: 2.5s -> 1.1s,
    # oracle hash unchanged).
    # columns=: the exchange carries the 3 read columns, not 16 (r14).
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        spread=True,
        columns=["l_extendedprice", "l_discount", "l_tax"],
    )
    t = li.select(
        F.expr(
            "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
        ).alias("y"),
        F.col("l_extendedprice").alias("yhat"),
    ).select(
        "y",
        (F.col("y") - F.col("yhat")).alias("res"),
        F.expr("y / 1000").alias("yk"),
    )

    def vsum(term: str, out: str) -> F.Column:
        return F.expr(
            f"CAST(CAST(SUM(CAST({term} AS DECIMAL(27,6))) AS STRING)"
            f" AS DOUBLE)"
        ).alias(out)

    s = t.agg(
        F.count(F.lit(1)).alias("n"),
        vsum("res * res", "sr2"),
        vsum("abs(res)", "sa"),
        vsum("abs(res) / y", "sape"),
        vsum("yk", "syk"),
        vsum("yk * yk", "syk2"),
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.expr("sqrt(sr2 / n)"), 6).alias("rmse"),
        F.round(F.expr("sa / n"), 6).alias("mae"),
        F.round(F.expr("100 * sape / n"), 6).alias("mape_pct"),
        F.round(
            F.expr("1 - (sr2 / 1000000) / (syk2 - syk * syk / n)"), 8
        ).alias("r2"),
    )


# Fairness audit: frozen decision threshold on the price score (the
# ~q75 of the fixture distribution — a constant, so every engine and
# every scale applies the identical decision rule).
FAIR_THRESHOLD = 375000.0


@register(
    "ml_eval_fairness",
    oracle=f"""
    WITH scored AS (
        SELECT c.c_mktsegment AS grp,
               {_LABEL_SQL} AS y,
               CASE WHEN o.o_totalprice > {FAIR_THRESHOLD}
                    THEN 1 ELSE 0 END AS yhat
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
        SELECT grp,
               COUNT(*) AS n,
               SUM(y) AS pos,
               SUM(yhat) AS ppos,
               SUM(y * yhat) AS tp,
               SUM((1 - y) * yhat) AS fp
        FROM scored GROUP BY grp
    )
    SELECT grp,
           CAST(n AS BIGINT) AS n,
           CAST((2 * CAST(pos AS HUGEINT) * 1000000 + n) // (2 * n)
                AS DOUBLE) / 1000000.0 AS base_rate,
           CAST((2 * CAST(ppos AS HUGEINT) * 1000000 + n) // (2 * n)
                AS DOUBLE) / 1000000.0 AS pred_pos_rate,
           CAST((2 * CAST(tp AS HUGEINT) * 1000000 + pos) // (2 * pos)
                AS DOUBLE) / 1000000.0 AS tpr,
           CAST((2 * CAST(fp AS HUGEINT) * 1000000 + (n - pos))
                // (2 * (n - pos)) AS DOUBLE) / 1000000.0 AS fpr
    FROM g ORDER BY grp
    """,
)
def ml_eval_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a thresholded score across customer
    segments: per group, the predicted-positive rate (demographic
    parity), true-positive rate and false-positive rate (equalized
    odds) and the base rate — the report a model-governance review
    reads before shipping a curation/decision threshold (complements
    ml_eval_auc_grouped's ranking view with the DECISION view; gaps
    between rows ARE the fairness metrics).

    Scale shape: one fact join (customer side broadcastable), ONE
    map-side-combinable groupBy to |segments| rows of five integer
    counts, arithmetic on that tiny table. Every rate is an exact
    half-up micro-unit quotient via the (2u+c) div (2c) identity
    (u >= 0 counts), so both engines hash-match bit for bit."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    scored = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("grp"),
        _label_col().alias("y"),
        F.when(F.col("o_totalprice") > FAIR_THRESHOLD, 1)
        .otherwise(0)
        .alias("yhat"),
    )
    g = scored.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
        F.sum("yhat").alias("ppos"),
        F.sum(F.col("y") * F.col("yhat")).alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).alias("fp"),
    )

    def rate(num: str, den: str, out: str) -> F.Column:
        return (
            F.expr(
                f"(2 * CAST({num} AS DECIMAL(38,0)) * 1000000 + {den})"
                f" div (2 * {den})"
            ).cast("double")
            / 1000000.0
        ).alias(out)

    return g.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        rate("pos", "n", "base_rate"),
        rate("ppos", "n", "pred_pos_rate"),
        rate("tp", "pos", "tpr"),
        rate("fp", "(n - pos)", "fpr"),
    ).orderBy("grp")


@register(
    "ml_eval_ece",
    oracle=f"""
    WITH lab AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / {CAL_BIN_WIDTH}) AS BIGINT),
                     {CAL_MAX_BIN}) AS bin,
               LEAST(o_totalprice / {CAL_BIN_WIDTH * (CAL_MAX_BIN + 1)},
                     1.0) AS p,
               {_LABEL_SQL} AS y
        FROM orders
    ),
    b AS (SELECT bin, COUNT(*) AS n_bin,
                 CAST(SUM(y) AS BIGINT) AS n_pos,
                 CAST(SUM(CAST(p AS DECIMAL(27,6))) AS DOUBLE) AS p_sum
          FROM lab GROUP BY bin),
    g AS (
        SELECT bin, n_bin,
               abs(CAST(n_pos AS DOUBLE) / n_bin - p_sum / n_bin) AS gap,
               SUM(n_bin) OVER () AS n
        FROM b
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           round(CAST(CAST(SUM(CAST(CAST(n_bin AS DOUBLE) / n * gap
                                    AS DECIMAL(27,6))) AS VARCHAR)
                      AS DOUBLE), 6) AS ece,
           round(MAX(gap), 6) AS mce
    FROM g
    """,
)
def ml_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error over the same equal-width
    score bins as ml_calibration_bins: ECE = Sigma (n_bin/N) *
    |observed positive rate - mean predicted p|, MCE = the worst
    bin's gap — the two scalars a model-score quality gate alerts
    on, distilled from the reliability diagram that query renders.

    Scale shape: ONE map-side-combinable groupBy to <= 10 bins (the
    row-local bin id — no quantile pass), windows only over that
    bounded bin table, and the weighted-gap sum accumulates through
    the exact-decimal string hop so the <=10-term float fold is
    order-independent cross-engine."""
    scale = CAL_BIN_WIDTH * (CAL_MAX_BIN + 1)
    lab = load_table(spark, sf_dir, "orders").select(
        F.least(
            F.floor(F.col("o_totalprice") / CAL_BIN_WIDTH).cast("long"),
            F.lit(CAL_MAX_BIN).cast("long"),
        ).alias("bin"),
        F.least(F.col("o_totalprice") / scale, F.lit(1.0)).alias("p"),
        _label_col(),
    )
    b = lab.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.col("p").cast("decimal(27,6)")).cast("double").alias("p_sum"),
    )
    from pyspark.sql import Window

    g = b.select(
        "bin", "n_bin",
        F.expr("abs(CAST(n_pos AS DOUBLE) / n_bin - p_sum / n_bin)").alias(
            "gap"
        ),
        F.sum("n_bin").over(Window.partitionBy()).alias("n"),
    )
    return g.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(
            F.expr(
                "CAST(CAST(SUM(CAST(CAST(n_bin AS DOUBLE) / n * gap"
                " AS DECIMAL(27,6))) AS STRING) AS DOUBLE)"
            ),
            6,
        ).alias("ece"),
        F.round(F.max("gap"), 6).alias("mce"),
    )
