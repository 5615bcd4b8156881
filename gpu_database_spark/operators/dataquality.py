"""Data-quality audits: per-column profiling and referential checks.

The pre-flight gates every warehouse load and every training-data
refresh runs before downstream jobs trust a table: a one-pass column
profile (null counts, exact distinct cardinalities) and foreign-key
orphan audits across the star schema. Both are declarative
aggregation plans — the profile is a single multi-distinct groupBy
(Catalyst's expand operator gives partial aggregation per distinct
column), the FK audits are shuffle anti-joins on each key — shapes
that scale linearly with the fact tables.

Reference tie-in: the reference engine (CUDA KV store,
src/cuda/hashTable.cuh) has no integrity surface; these supply the
audit layer SURVEY.md §2B's sources/maintenance categories assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.materialize import materialize
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_sql() -> str:
    parts = [
        f"""
    SELECT '{c}' AS col,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           COUNT(*) AS n_rows
    FROM orders"""
        for c in _PROFILE_COLS
    ]
    return "\n    UNION ALL\n".join(parts) + "\n    ORDER BY col"


@register("dq_profile_table", oracle=_profile_sql())
def dq_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table: per column, the null count
    and EXACT distinct cardinality, plus the row count — the schema
    fingerprint a loader compares across refreshes to catch silent
    upstream changes.

    Scale shape: ONE aggregation statement; Spark plans the six exact
    count-distincts via the expand operator (one pass over the scan,
    partial aggregation per (column, value) before the final merge).
    Exact distincts are required here because the oracle hash-compares
    them; a 100 TB profile would swap in approx_count_distinct per
    column — same single-pass plan, no expand — which this module
    deliberately does not register as an oracle query. Outputs are
    all BIGINT, so there is no float or string-format drift."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return (
        one.select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col, n_nulls, n_distinct)"
            ),
            "n_rows",
        )
        .orderBy("col")
    )


_FK_CHECKS = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
)


def _orphans_sql() -> str:
    parts = [
        f"""
    SELECT '{label}' AS fk,
           (SELECT COUNT(*) FROM {child} c
            WHERE c.{ck} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent} p
                              WHERE p.{pk} = c.{ck})) AS n_orphans,
           (SELECT COUNT(*) FROM {child}) AS n_checked"""
        for label, child, ck, parent, pk in _FK_CHECKS
    ]
    return "\n    UNION ALL\n".join(parts) + "\n    ORDER BY fk"


@register("dq_referential_orphans", oracle=_orphans_sql())
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    declared foreign key, the count of child rows whose (non-null) key
    has no parent, plus the number of rows checked. All four counts
    being zero is the green light a loader requires before exposing a
    snapshot.

    Scale shape: each check is a LEFT ANTI join — Spark shuffles both
    sides on the key (or broadcasts the dimension when it fits, as for
    part/supplier/customer here) and never materializes matches; the
    result of each is a single partial-aggregated count. Four
    independent one-row plans unioned — no driver-side loops over
    data, only over the fixed constraint list."""
    out: DataFrame | None = None
    for label, child, ck, parent, pk in _FK_CHECKS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        orphans = (
            c.filter(F.col(ck).isNotNull())
            .join(p, F.col(ck) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        checked = c.agg(F.count(F.lit(1)).alias("n_checked"))
        row = (
            orphans.crossJoin(F.broadcast(checked))
            .select(F.lit(label).alias("fk"), "n_orphans", "n_checked")
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fk")


@register(
    "dq_join_fanout_histogram",
    oracle="""
    WITH fan AS (
        SELECT o.o_orderkey,
               (SELECT COUNT(*) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_matches
        FROM orders o
    )
    SELECT n_matches, COUNT(*) AS n_orders
    FROM fan GROUP BY 1 ORDER BY 1
    """,
)
def dq_join_fanout_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality audit: for each orders row, how many lineitem
    rows it would fan out to, as a histogram — the pre-flight a data
    engineer runs BEFORE an expensive join to catch unexpected
    explosion (a hot key here is a hot task there). Zero-match keys
    are included (the silent row-loss case of an inner join).

    Scale shape: one groupBy on the child's join key gives match
    counts; a LEFT join from the parent (broadcast of the collapsed
    count table when it fits, shuffle otherwise) attaches them with
    COALESCE 0; the histogram is a second tiny groupBy. The oracle
    states the correlated-subquery form."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    fan = o.join(counts, "o_orderkey", "left").select(
        F.coalesce(F.col("_c"), F.lit(0)).alias("n_matches")
    )
    return (
        fan.groupBy("n_matches")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("n_matches")
    )


@register(
    "dq_distribution_drift_psi",
    oracle="""
    WITH binned AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / 60000) AS BIGINT), 9) AS bin,
               CAST(o_orderdate AS DATE) >= DATE '1996-01-01' AS cur
        FROM orders
    ),
    cells AS (
        SELECT bin,
               CAST(SUM(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
               CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM cells),
    terms AS (
        SELECT bin, n_ref, n_cur,
               (n_ref + 0.5) / (t_ref + 5.0) AS p_ref,
               (n_cur + 0.5) / (t_cur + 5.0) AS p_cur
        FROM cells CROSS JOIN tot
    )
    SELECT bin, n_ref, n_cur,
           round(p_ref, 6) AS p_ref,
           round(p_cur, 6) AS p_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term,
           round(CAST(SUM(CAST((p_cur - p_ref) * ln(p_cur / p_ref)
                               AS DECIMAL(27,6))) OVER ()
                      AS DOUBLE), 6) AS psi_total
    FROM terms ORDER BY bin
    """,
)
def dq_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two order cohorts (pre/post
    1996): the standard drift gate a pipeline runs before trusting a
    refreshed table — PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25
    re-examine. o_totalprice is binned into 10 fixed-width buckets
    (data-independent edges, so the report is comparable across
    snapshots), proportions are Laplace-smoothed (+0.5 per bin) so an
    empty bin cannot produce an infinite term, and the total rides
    along via a DECIMAL-summed window over the 10-row term table.

    Scale shape: ONE conditional aggregation over the fact table
    (map-side combined; both cohorts counted in the same pass — no
    self-join, no second scan), then arithmetic on a 10-row table.
    Column-level drift for d columns is d independent copies of this
    plan over one shared scan."""
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        # F.floor, not cast('long'): cast truncates toward zero, which
        # only matches the oracle's FLOOR because o_totalprice > 0 —
        # floor keeps the expression reusable over signed metrics
        F.least(
            F.floor(F.col("o_totalprice") / 60000).cast("long"), F.lit(9)
        ).alias("bin"),
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date")).alias(
            "cur"
        ),
    )
    # Materialized: cells feeds both the totals aggregate and the term
    # join; without one execution point the fact-table scan runs twice.
    # The table is 10 rows by construction.
    cells = materialize(
        binned.groupBy("bin").agg(
            F.count_if(~F.col("cur")).alias("n_ref"),
            F.count_if(F.col("cur")).alias("n_cur"),
        )
    )
    tot = cells.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + 0.5) / (F.col("t_ref") + 5.0)).alias("p_ref"),
        ((F.col("n_cur") + 0.5) / (F.col("t_cur") + 5.0)).alias("p_cur"),
    )
    term = (F.col("p_cur") - F.col("p_ref")) * F.log(
        F.col("p_cur") / F.col("p_ref")
    )
    w = Window.partitionBy()
    return terms.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(term, 6).alias("psi_term"),
        F.round(
            F.sum(term.cast("decimal(27,6)")).over(w).cast("double"), 6
        ).alias("psi_total"),
    ).orderBy("bin")


# k-anonymity audit threshold: equivalence classes smaller than K are
# re-identification risks.
K_ANON = 5


@register(
    "dq_k_anonymity",
    oracle=f"""
    WITH q AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
               c_custkey
        FROM customer
    ),
    eq AS (SELECT c_nationkey, c_mktsegment, bal_band,
                  COUNT(*) AS class_size
           FROM q GROUP BY ALL),
    h AS (SELECT LEAST(class_size, {K_ANON}) AS size_bucket,
                 COUNT(*) AS n_classes,
                 CAST(SUM(class_size) AS BIGINT) AS n_rows
          FROM eq GROUP BY 1)
    SELECT size_bucket, n_classes, n_rows,
           (size_bucket < {K_ANON}) AS at_risk,
           round(CAST(n_rows AS DOUBLE)
                 / CAST(SUM(n_rows) OVER () AS DOUBLE), 6) AS row_share
    FROM h ORDER BY size_bucket
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (nation,
    market segment, account-balance band): rows whose equivalence
    class has fewer than K members are re-identifiable, so a
    training-data release gate needs the class-size census BEFORE
    export — how many classes (and what fraction of rows) sit below
    K, bucketed by exact class size with a >=K catch-all.

    Scale shape: one groupBy on the quasi-identifier tuple (map-side
    combinable, high cardinality — shuffles well), then a second
    groupBy on the clamped class size collapses to <= K rows; the
    row-share window runs over that tiny table only. Generalization
    (the balance band) is a row-local expression, so widening bands
    to push classes over K re-runs the same two-shuffle plan."""
    q = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
    )
    eq = q.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    h = eq.groupBy(
        F.least(F.col("class_size"), F.lit(K_ANON)).alias("size_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return h.select(
        "size_bucket",
        "n_classes",
        "n_rows",
        (F.col("size_bucket") < K_ANON).alias("at_risk"),
        F.round(
            F.col("n_rows").cast("double")
            / F.sum("n_rows").over(w_all).cast("double"),
            6,
        ).alias("row_share"),
    ).orderBy("size_bucket")


# Expectation-suite thresholds: zero failures = PASS; a nonzero
# failure rate up to DQ_WARN_RATE = WARN; anything above = FAIL.
DQ_WARN_RATE = 0.001


@register(
    "dq_expectations_audit",
    oracle=f"""
    WITH o AS (
        SELECT *,
               (o_totalprice > 0) AS r_price_pos,
               (o_orderstatus IN ('O', 'F', 'P')) AS r_status_domain,
               (o_orderdate >= TIMESTAMP '1990-01-01'
                AND o_orderdate < TIMESTAMP '2030-01-01') AS r_date_range,
               (o_custkey IS NOT NULL) AS r_custkey_nn,
               (o_orderpriority SIMILAR TO '[1-5]-[A-Z ]+') AS r_priority_fmt
        FROM orders
    ),
    rules AS (
        SELECT 'price_positive' AS rule, COUNT(*) AS n_checked,
               CAST(SUM(CASE WHEN NOT r_price_pos THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_failed FROM o
        UNION ALL
        SELECT 'status_in_domain', COUNT(*),
               CAST(SUM(CASE WHEN NOT r_status_domain THEN 1 ELSE 0 END)
                    AS BIGINT) FROM o
        UNION ALL
        SELECT 'date_in_range', COUNT(*),
               CAST(SUM(CASE WHEN NOT r_date_range THEN 1 ELSE 0 END)
                    AS BIGINT) FROM o
        UNION ALL
        SELECT 'custkey_not_null', COUNT(*),
               CAST(SUM(CASE WHEN NOT r_custkey_nn THEN 1 ELSE 0 END)
                    AS BIGINT) FROM o
        UNION ALL
        SELECT 'priority_format', COUNT(*),
               CAST(SUM(CASE WHEN NOT r_priority_fmt THEN 1 ELSE 0 END)
                    AS BIGINT) FROM o
        UNION ALL
        SELECT 'custkey_fk_resolves', COUNT(*),
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    )
    SELECT rule, n_checked, n_failed,
           round(CAST(n_failed AS DOUBLE) / CAST(n_checked AS DOUBLE), 6)
               AS fail_rate,
           CASE WHEN n_failed = 0 THEN 'PASS'
                WHEN CAST(n_failed AS DOUBLE) / CAST(n_checked AS DOUBLE)
                     <= {DQ_WARN_RATE} THEN 'WARN'
                ELSE 'FAIL' END AS status
    FROM rules ORDER BY rule
    """,
)
def dq_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite audit (the Great-Expectations-style gate a
    warehouse load runs before publishing a table): each rule is a
    row-local predicate — positivity, domain membership, date sanity,
    non-null, format regex — plus one referential rule (every
    o_custkey resolves), reported as (rule, checked, failed,
    fail_rate, PASS/WARN/FAIL).

    Scale shape: all five row-local rules evaluate in ONE scan and
    ONE conditional aggregation (map-side combinable, O(rules) state
    per task); the FK rule is a broadcast-dim left join counted in
    the same pass shape as dq_referential_orphans. Adding a rule
    adds a column, never a scan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    checks = {
        "price_positive": F.col("o_totalprice") > 0,
        "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        "date_in_range": (
            (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2030-01-01").cast("timestamp"))
        ),
        "custkey_not_null": F.col("o_custkey").isNotNull(),
        "priority_format": F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"),
    }
    # ALL row-local rules in ONE aggregation pass over one scan …
    wide = o.agg(
        F.count(F.lit(1)).alias("n_checked"),
        *[
            F.sum((~pred).cast("int")).cast("long").alias(f"f_{rule}")
            for rule, pred in checks.items()
        ],
    )
    rules = wide.selectExpr(
        "stack({n}, {args}) AS (rule, n_failed)".format(
            n=len(checks),
            args=", ".join(f"'{r}', f_{r}" for r in checks),
        ),
        "n_checked",
    ).select("rule", "n_checked", "n_failed")
    # … plus the one rule that genuinely needs a second input: the FK
    # resolution join (broadcast dim, same shape as dq_referential_orphans).
    fk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .agg(
            F.lit("custkey_fk_resolves").alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.col("c_custkey").isNull().cast("int"))
            .cast("long")
            .alias("n_failed"),
        )
    )
    rules = rules.unionByName(fk)
    rate = F.col("n_failed").cast("double") / F.col("n_checked").cast("double")
    return rules.select(
        "rule",
        "n_checked",
        "n_failed",
        F.round(rate, 6).alias("fail_rate"),
        F.when(F.col("n_failed") == 0, "PASS")
        .when(rate <= DQ_WARN_RATE, "WARN")
        .otherwise("FAIL")
        .alias("status"),
    ).orderBy("rule")


# Freshness SLA in days, evaluated against the corpus max day (a
# deterministic stand-in for "now" so both engines agree).
FRESH_SLA_DAYS = 3


@register(
    "dq_freshness_audit",
    oracle=f"""
    WITH days AS (
        SELECT props, user_id,
               epoch_ns(ts) // 86400000000000 AS day,
               CASE WHEN user_id % 4 = 0 THEN 'feed_a'
                    WHEN user_id % 4 = 1 THEN 'feed_b'
                    WHEN user_id % 4 = 2 THEN 'feed_c'
                    ELSE 'feed_d' END AS feed
        FROM events
    ),
    ref AS (SELECT MAX(day) AS now_day FROM days),
    per AS (
        SELECT feed, COUNT(*) AS n_events,
               CAST(MAX(day) AS BIGINT) AS last_day,
               CAST(MIN(day) AS BIGINT) AS first_day
        FROM days GROUP BY feed
    )
    SELECT feed, n_events, first_day, last_day,
           CAST(now_day - last_day AS BIGINT) AS staleness_days,
           (now_day - last_day <= {FRESH_SLA_DAYS}) AS within_sla
    FROM per CROSS JOIN ref ORDER BY feed
    """,
)
def dq_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-freshness audit: per feed (a deterministic partition of
    the event stream standing in for upstream sources), the last-seen
    day, staleness vs the corpus watermark, and an SLA verdict — the
    data-ops gate that catches a silently stalled upstream BEFORE a
    refresh publishes a partially-stale table.

    Scale shape: one groupBy(feed) with min/max/count (map-side
    combinable, O(1) state), one 1-row watermark broadcast. The
    reference instant is the corpus max day, not wall-clock, so the
    report is reproducible and cross-engine exact."""
    e = load_table(spark, sf_dir, "events")
    feed = (
        F.when(F.col("user_id") % 4 == 0, "feed_a")
        .when(F.col("user_id") % 4 == 1, "feed_b")
        .when(F.col("user_id") % 4 == 2, "feed_c")
        .otherwise("feed_d")
    )
    days = e.select(
        feed.alias("feed"), F.expr("ts_ns div 86400000000000").alias("day")
    )
    ref = days.agg(F.max("day").alias("now_day"))
    per = days.groupBy("feed").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("day").cast("long").alias("last_day"),
        F.min("day").cast("long").alias("first_day"),
    )
    return (
        per.crossJoin(F.broadcast(ref))
        .select(
            "feed",
            "n_events",
            "first_day",
            "last_day",
            (F.col("now_day") - F.col("last_day"))
            .cast("long")
            .alias("staleness_days"),
            (
                F.col("now_day") - F.col("last_day") <= FRESH_SLA_DAYS
            ).alias("within_sla"),
        )
        .orderBy("feed")
    )


@register(
    "dq_outlier_fences",
    oracle="""
    WITH r AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_g
        FROM events
    ),
    q AS (
        SELECT event_type, n_g,
               MAX(CASE WHEN rn = CAST(ceil(0.25 * n_g) AS BIGINT)
                        THEN value END) AS q1,
               MAX(CASE WHEN rn = CAST(ceil(0.75 * n_g) AS BIGINT)
                        THEN value END) AS q3
        FROM r GROUP BY event_type, n_g
    ),
    fenced AS (
        SELECT e.event_type, e.value, q.n_g, q.q1, q.q3,
               q.q1 - 1.5 * (q.q3 - q.q1) AS lo,
               q.q3 + 1.5 * (q.q3 - q.q1) AS hi
        FROM events e JOIN q ON e.event_type = q.event_type
    )
    SELECT event_type,
           CAST(MAX(n_g) AS BIGINT) AS n,
           MAX(q1) AS q1, MAX(q3) AS q3,
           round(MAX(hi), 6) AS hi_fence,
           CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           MAX(CASE WHEN value > hi THEN value END) AS max_outlier
    FROM fenced GROUP BY event_type ORDER BY event_type
    """,
)
def dq_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per event type: exact type-1 Q1/Q3,
    fences at 1.5*IQR, and the count + extreme of the values outside —
    the standard pre-aggregation data-quality gate for heavy-tailed
    metrics (flags the rows a mean-based rollup would silently absorb).

    Scale shape: quartiles come from the GROUPED histogram-bucket
    rank plan (never a whole-group sort on the ~5-value type key);
    the fence test is a broadcast join back (7-row quartile table) +
    one conditional aggregation. Fence arithmetic is a single fixed
    expression over untouched input doubles — bit-identical across
    engines.

    Reference tie-in: none in the reference CUDA KV store — the
    data-quality layer per the build brief."""
    from gpu_database_spark.functions.ranks import grouped_bucketed_row_number

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )
    r = grouped_bucketed_row_number(
        e, ["event_type"], "value", ["event_id"], F.floor(F.col("value")),
        rank_col="rn",
    )
    ng = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_g"))
    r = r.join(F.broadcast(ng), "event_type")

    def at(q: float, out: str) -> F.Column:
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n_g")).cast("long"),
                F.col("value"),
            )
        ).alias(out)

    qs = r.groupBy("event_type", "n_g").agg(at(0.25, "q1"), at(0.75, "q3"))
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    fenced = e.join(F.broadcast(qs), "event_type").select(
        "event_type", "value", "n_g", "q1", "q3",
        lo.alias("lo"), hi.alias("hi"),
    )
    return (
        fenced.groupBy("event_type")
        .agg(
            F.max("n_g").cast("long").alias("n"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.round(F.max("hi"), 6).alias("hi_fence"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.max(F.when(F.col("value") > F.col("hi"), F.col("value")))
                .alias("max_outlier"),
        )
        .orderBy("event_type")
    )


# Candidate functional dependencies audited by dq_functional_deps:
# (determinant, dependent) column pairs on the orders fact table.
FD_CANDIDATES = [
    ("o_orderkey", "o_custkey"),        # key -> attribute: must HOLD
    ("o_orderkey", "o_orderdate"),      # key -> attribute: must HOLD
    ("o_custkey", "o_orderstatus"),     # non-key: expected to fail
    ("o_orderdate", "o_orderpriority"), # non-key: expected to fail
    ("o_orderstatus", "o_orderpriority"),
]


@register(
    "dq_functional_deps",
    oracle="""
    WITH pairs AS (
        SELECT 'o_orderkey->o_custkey' AS fd,
               CAST(o_orderkey AS VARCHAR) AS x,
               CAST(o_custkey AS VARCHAR) AS y FROM orders
        UNION ALL
        SELECT 'o_orderkey->o_orderdate',
               CAST(o_orderkey AS VARCHAR),
               CAST(o_orderdate AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_custkey->o_orderstatus',
               CAST(o_custkey AS VARCHAR),
               CAST(o_orderstatus AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderdate->o_orderpriority',
               CAST(o_orderdate AS VARCHAR),
               CAST(o_orderpriority AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderstatus->o_orderpriority',
               CAST(o_orderstatus AS VARCHAR),
               CAST(o_orderpriority AS VARCHAR) FROM orders
    ),
    grp AS (
        SELECT fd, x, COUNT(DISTINCT y) AS ny, COUNT(*) AS nrows
        FROM pairs GROUP BY 1, 2
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_determinant_values,
           CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_values,
           CAST(SUM(CASE WHEN ny > 1 THEN nrows ELSE 0 END) AS BIGINT)
               AS n_violating_rows,
           COUNT(*) = SUM(CASE WHEN ny = 1 THEN 1 ELSE 0 END) AS holds
    FROM grp GROUP BY fd ORDER BY fd
    """,
)
def dq_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate X -> Y pair,
    does every determinant value map to exactly one dependent value?
    Reports violating determinant values and rows — the schema-rule
    profiler a warehouse runs before trusting a column as a join key
    or declaring a dimension hierarchy (complements
    dq_referential_orphans' cross-table checks with intra-table
    rules).

    Scale shape: the five candidate pairs stack into ONE long table
    (one scan per candidate of two projected columns — column-pruned
    at the parquet reader), then one (fd, x) groupBy with a
    COUNT(DISTINCT y) that Spark executes as the standard two-level
    expand/partial-agg plan, and a 5-row rollup. Everything is
    integer counts — bit-exact by construction. At 100 TB the
    determinant-value census (one row per distinct X) is the only
    large intermediate; it partitions by (fd, x) with no skew beyond
    the data's own key skew."""
    # spread=True: the stack() fan-out (5x rows) + distinct-count
    # expand all fuse into the scan stage; one row group means one
    # core does all of it (A/B: -0.43s, oracle hash unchanged).
    # columns=: the exchange carries the 5 FD columns, not all 6 (r14).
    _fd_cols = sorted({c for xy in FD_CANDIDATES for c in xy})
    o = load_table(spark, sf_dir, "orders", spread=True, columns=_fd_cols)
    # ONE scan, not five unioned scans: stack() fans each row out to
    # its five (fd, x, y) pairs after a single pruned projection —
    # at 100 TB this reads each needed column chunk once.
    stack_args = ", ".join(
        f"'{x}->{y}', CAST({x} AS STRING), CAST({y} AS STRING)"
        for x, y in FD_CANDIDATES
    )
    pairs = o.select(
        F.expr(
            f"stack({len(FD_CANDIDATES)}, {stack_args}) AS (fd, x, y)"
        )
    )
    grp = pairs.groupBy("fd", "x").agg(
        F.countDistinct("y").alias("ny"), F.count(F.lit(1)).alias("nrows")
    )
    return (
        grp.groupBy("fd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_determinant_values"),
            F.sum(F.when(F.col("ny") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_values"),
            F.sum(F.when(F.col("ny") > 1, F.col("nrows")).otherwise(0))
            .cast("long")
            .alias("n_violating_rows"),
            (
                F.count(F.lit(1))
                == F.sum(F.when(F.col("ny") == 1, 1).otherwise(0))
            ).alias("holds"),
        )
        .orderBy("fd")
    )


@register(
    "dq_profile_drift",
    oracle="""
    WITH bounds AS (
        SELECT (MIN(epoch_ns(ts)) + MAX(epoch_ns(ts))) // 2 AS mid
        FROM events
    ),
    prof AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN epoch_ns(ts) < mid THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN epoch_ns(ts) >= mid THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
               CAST(CAST(SUM(CAST(CASE WHEN epoch_ns(ts) < mid THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS s_a,
               CAST(CAST(SUM(CAST(CASE WHEN epoch_ns(ts) >= mid THEN value
                             ELSE 0 END AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS s_b,
               CAST(COUNT(DISTINCT CASE WHEN epoch_ns(ts) < mid
                                   THEN user_id END) AS BIGINT) AS users_a,
               CAST(COUNT(DISTINCT CASE WHEN epoch_ns(ts) >= mid
                                   THEN user_id END) AS BIGINT) AS users_b
        FROM events CROSS JOIN bounds
        GROUP BY event_type
    )
    SELECT event_type, n_a, n_b, users_a, users_b,
           round(s_a / NULLIF(n_a, 0), 6) AS mean_a,
           round(s_b / NULLIF(n_b, 0), 6) AS mean_b,
           round(CAST(n_b AS DOUBLE) / NULLIF(n_a, 0), 6) AS volume_ratio,
           round((s_b / NULLIF(n_b, 0) - s_a / NULLIF(n_a, 0))
                 / NULLIF(s_a / NULLIF(n_a, 0), 0), 6) AS mean_drift,
           COALESCE(abs((s_b / NULLIF(n_b, 0) - s_a / NULLIF(n_a, 0))
                        / NULLIF(s_a / NULLIF(n_a, 0), 0)) > 0.05
                    OR CAST(n_b AS DOUBLE) / NULLIF(n_a, 0) < 0.8
                    OR CAST(n_b AS DOUBLE) / NULLIF(n_a, 0) > 1.25,
                    TRUE) AS drifted
    FROM prof
    ORDER BY event_type
    """,
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between the first and second half of the
    observation window, per event type: volume ratio, audience size,
    mean-value shift, and a drift verdict (>5% relative mean shift
    or volume outside [0.8, 1.25]) — the cheap schema-stable drift
    tripwire that runs BEFORE the heavier distribution tests
    (dq_distribution_drift_psi, stat_ks_test) are worth their scan.

    Scale shape: one O(1) scalar pre-pass (broadcast midpoint), then
    ONE pass over the stream computing every profile column as a
    conditional aggregate — counts and exact string-hop decimal sums
    combine map-side; the two conditional COUNT(DISTINCT user_id)
    are the only expand-shuffle term, the standard cost of an exact
    audience count (swap in HLL sketches when approximate is
    acceptable, as audience_overlap_hll demonstrates)."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(F.expr("(MIN(ts_ns) + MAX(ts_ns)) DIV 2").alias("mid"))
    first = F.col("ts_ns") < F.col("mid")

    def csum(cond, out: str):
        return (
            F.sum(
                F.when(cond, F.col("value")).otherwise(0).cast("decimal(27,6)")
            )
            .cast("string")
            .cast("double")
            .alias(out)
        )

    prof = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(first, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(~first, 1).otherwise(0)).cast("long").alias("n_b"),
            csum(first, "s_a"),
            csum(~first, "s_b"),
            F.countDistinct(
                F.when(first, F.col("user_id"))
            ).cast("long").alias("users_a"),
            F.countDistinct(
                F.when(~first, F.col("user_id"))
            ).cast("long").alias("users_b"),
        )
    )
    # NULLIF guards: a type present in only ONE half must yield NULL
    # stats and a TRUE drift verdict in BOTH engines — Spark runs
    # ANSI, so an unguarded /0 would throw where DuckDB yields NULL
    drift = (
        "(s_b / NULLIF(n_b, 0) - s_a / NULLIF(n_a, 0))"
        " / NULLIF(s_a / NULLIF(n_a, 0), 0)"
    )
    ratio = "CAST(n_b AS DOUBLE) / NULLIF(n_a, 0)"
    return prof.select(
        "event_type", "n_a", "n_b", "users_a", "users_b",
        F.round(F.expr("s_a / NULLIF(n_a, 0)"), 6).alias("mean_a"),
        F.round(F.expr("s_b / NULLIF(n_b, 0)"), 6).alias("mean_b"),
        F.round(F.expr(ratio), 6).alias("volume_ratio"),
        F.round(F.expr(drift), 6).alias("mean_drift"),
        F.expr(
            f"COALESCE(abs({drift}) > 0.05 OR {ratio} < 0.8"
            f" OR {ratio} > 1.25, TRUE)"
        ).alias("drifted"),
    ).orderBy("event_type")


L_DIV = 3  # distinct-l-diversity requirement for the release gate


@register(
    "dq_l_diversity",
    oracle=f"""
    WITH q AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(FLOOR(o.o_totalprice / 100000.0) AS BIGINT)
                   AS price_band,
               o.o_orderpriority AS sensitive
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    eq AS (
        SELECT c_nationkey, c_mktsegment, price_band,
               COUNT(*) AS class_size,
               COUNT(DISTINCT sensitive) AS n_sensitive
        FROM q GROUP BY ALL
    ),
    h AS (
        SELECT LEAST(n_sensitive, {L_DIV}) AS diversity_bucket,
               COUNT(*) AS n_classes,
               CAST(SUM(class_size) AS BIGINT) AS n_rows
        FROM eq GROUP BY 1
    )
    SELECT diversity_bucket, n_classes, n_rows,
           (diversity_bucket < {L_DIV}) AS at_risk,
           round(CAST(n_rows AS DOUBLE)
                 / CAST(SUM(n_rows) OVER () AS DOUBLE), 6) AS row_share
    FROM h ORDER BY diversity_bucket
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity audit, the attribute-disclosure companion
    to dq_k_anonymity: a quasi-identifier class can be large enough
    for k-anonymity yet still leak — if every record in the class
    shares ONE sensitive value, re-identification isn't needed to
    learn it. Released record = an order row; QI = (customer nation,
    market segment, order-value band); sensitive = order priority.
    Census: classes (and row share) bucketed by their distinct
    sensitive-value count, clamped at L with a >=L catch-all and an
    at-risk verdict below L.

    Scale shape: dims broadcast into the fact join, then ONE groupBy
    on the QI tuple carrying count + COUNT(DISTINCT sensitive) (the
    Catalyst expand — the exact-audit cost, same note as
    dq_profile_table); the diversity histogram collapses to <= L
    rows and only that tiny table sees the row-share window.
    Generalizing the value band to push classes over L re-runs the
    identical two-shuffle plan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    q = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("o_totalprice") / 100000.0).cast("long").alias(
            "price_band"
        ),
        F.col("o_orderpriority").alias("sensitive"),
    )
    eq = q.groupBy("c_nationkey", "c_mktsegment", "price_band").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("sensitive").alias("n_sensitive"),
    )
    h = eq.groupBy(
        F.least(F.col("n_sensitive"), F.lit(L_DIV)).alias("diversity_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return h.select(
        "diversity_bucket",
        "n_classes",
        "n_rows",
        (F.col("diversity_bucket") < L_DIV).alias("at_risk"),
        F.round(
            F.col("n_rows").cast("double")
            / F.sum("n_rows").over(w_all).cast("double"),
            6,
        ).alias("row_share"),
    ).orderBy("diversity_bucket")
