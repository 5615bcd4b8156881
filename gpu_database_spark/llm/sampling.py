"""Deterministic sampling & splitting for training-data pipelines.

Random sampling (``df.sample``/``sampleBy``) is Bernoulli over
partition iteration order: the kept set changes with partitioning,
file layout, and cluster size — unacceptable for a reproducible
training corpus. These operators sample on a CONTENT-DERIVED hash
(md5 of the key), so the kept set is a pure function of the data:
re-running on any cluster, any partitioning, any engine keeps exactly
the same rows (the DuckDB oracle reproduces every stage).

The hash-to-unit-interval trick: the first 15 hex chars of md5 as a
long, modulo a large prime bucket space — uniform enough for rate
control, deterministic everywhere (same discipline as the minhash /
LSH stack, llm/dedup.py).

Scale notes: all narrow maps over the scan except the per-source
rollups (one shuffle on the group key); no driver participation, no
RNG state to coordinate across executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.functions.materialize import materialize
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

BUCKETS = 1_000_000  # hash buckets per unit interval (ppm rate resolution)


def hash_bucket(key: Column) -> Column:
    """Deterministic uniform bucket in [0, BUCKETS) from md5(key)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    ) % BUCKETS


def _hash_bucket_sql(expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT) "
        f"% {BUCKETS}"
    )


@register(
    "sample_stratified_hash",
    oracle=f"""
    WITH rates(source, rate_ppm) AS (
        VALUES ('src0', 250000), ('src1', 500000), ('src2', 750000),
               ('src3', 1000000), ('src4', 100000)
    ),
    kept AS (
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE {_hash_bucket_sql('d.doc_id')} < r.rate_ppm
    )
    SELECT source, COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM kept GROUP BY source ORDER BY source
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling at fixed rates, hash-determined:
    keep a doc iff md5-bucket(doc_id) < rate. Identical kept set on any
    cluster/partitioning — the reproducibility property `sampleBy`
    cannot give. Rates are parts-per-million per source."""
    rates = [
        ("src0", 250_000),
        ("src1", 500_000),
        ("src2", 750_000),
        ("src3", 1_000_000),
        ("src4", 100_000),
    ]
    d = load_table(spark, sf_dir, "documents")
    r = spark.createDataFrame(rates, "source string, rate_ppm long")
    kept = d.join(F.broadcast(r), "source").filter(
        hash_bucket(F.col("doc_id")) < F.col("rate_ppm")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("source")
    )


@register(
    "sample_temperature_realized",
    oracle="""
    WITH s AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    t AS (
        SELECT SUM(n_docs) AS n,
               SUM(CAST(floor(sqrt(n_docs) * 1000000.0) AS BIGINT)) AS sq
        FROM s
    ),
    r AS (
        SELECT source, n_docs,
               CAST(CAST(wm AS HUGEINT) * n
                    // (CAST(sq AS HUGEINT) * n_docs) AS BIGINT) AS base_copies,
               CAST((CAST(wm AS HUGEINT) * n % (CAST(sq AS HUGEINT) * n_docs))
                    * 4294967296
                    // (CAST(sq AS HUGEINT) * n_docs) AS BIGINT) AS t32,
               CAST(CAST(wm AS HUGEINT) * n * 1000000
                    // (CAST(sq AS HUGEINT) * n_docs) AS BIGINT) AS target_ppm
        FROM (SELECT source, n_docs,
                     CAST(floor(sqrt(n_docs) * 1000000.0) AS BIGINT) AS wm,
                     n, sq
              FROM s, t)
    ),
    d AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   AS u32
        FROM documents
    )
    SELECT r.source,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           r.base_copies,
           r.target_ppm,
           CAST(SUM(r.base_copies + CASE WHEN d.u32 < r.t32 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_emitted,
           CAST(SUM(r.base_copies + CASE WHEN d.u32 < r.t32 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS realized_ppm
    FROM d JOIN r USING (source)
    GROUP BY r.source, r.n_docs, r.base_copies, r.target_ppm
    ORDER BY r.source
    """,
)
def sample_temperature_realized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REALIZATION of the temperature-mixing plan
    (data_mixing_temperature computes the target rates; this query
    materializes them): each document is emitted
    floor(upsample) copies plus one more iff its md5-uniform falls
    under the fractional remainder — the repeat-and-Bernoulli
    upsampling a data loader actually executes, made reproducible on
    any cluster/partitioning by hashing the DOC ID instead of drawing
    RNG state. Reports per source: exact integral copies, the
    32-bit fractional threshold's target rate, and the realized rate.

    Every rate is EXACT integer arithmetic end to end — the upsample
    ratio (sqrt(n_s)/Σsqrt)·(N/n_s) is carried as micro-unit integers
    through DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) div and mod, so
    no double summation order can flip a doc across the threshold at
    ANY corpus size (a float threshold would drift ~1 ulp × 2^32 ≈
    hundreds of candidate ids at 10^11 docs). Scale shape: a tiny
    source census broadcast back onto one corpus pass."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    s = s.withColumn(
        "wm", F.floor(F.sqrt(F.col("n_docs")) * 1000000.0).cast("long")
    )
    t = s.agg(F.sum("n_docs").alias("n"), F.sum("wm").alias("sq"))
    w = s.crossJoin(F.broadcast(t))
    num = "CAST(wm AS DECIMAL(38,0)) * n"
    den = "CAST(sq AS DECIMAL(38,0)) * n_docs"
    r = w.select(
        "source",
        "n_docs",
        F.expr(f"CAST(({num}) div ({den}) AS BIGINT)").alias("base_copies"),
        F.expr(
            f"CAST((({num}) % ({den})) * 4294967296 div ({den}) AS BIGINT)"
        ).alias("t32"),
        F.expr(f"CAST(({num}) * 1000000 div ({den}) AS BIGINT)").alias(
            "target_ppm"
        ),
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    dd = d.select("source", u32.alias("u32"))
    emit = F.col("base_copies") + F.when(F.col("u32") < F.col("t32"), 1).otherwise(0)
    return (
        dd.join(F.broadcast(r), "source")
        .groupBy("source", "n_docs", "base_copies", "target_ppm")
        .agg(F.sum(emit).alias("_e"), F.count(F.lit(1)).alias("_c"))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "base_copies",
            "target_ppm",
            F.col("_e").cast("long").alias("n_emitted"),
            F.expr("CAST((_e * 1000000) div _c AS BIGINT)").alias("realized_ppm"),
        )
        .orderBy("source")
    )


@register(
    "split_train_val_test",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id, source,
               CASE WHEN {_hash_bucket_sql('doc_id')} < 900000 THEN 'train'
                    WHEN {_hash_bucket_sql('doc_id')} < 950000 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, source, COUNT(*) AS n_docs
    FROM tagged GROUP BY split, source ORDER BY split, source
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split on the content hash:
    a document's split never changes as the corpus grows or moves
    clusters — the property that prevents silent train/test leakage
    across pipeline re-runs. Returns the (split, source) census."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 900_000, "train").when(b < 950_000, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "source", split.alias("split"))
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "source")
    )


@register(
    "doc_length_histogram",
    oracle="""
    SELECT (length(text) // 200) * 200 AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(length(text)) AS BIGINT) AS min_len,
           CAST(MAX(length(text)) AS BIGINT) AS max_len
    FROM documents
    GROUP BY (length(text) // 200) * 200
    ORDER BY len_bucket
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document length histogram (200-char buckets) — the first plot of
    every corpus audit; one narrow map + one shuffle on the bucket."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.length("text") / 200) * 200).cast("long")
    return (
        d.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.length("text")).cast("long").alias("min_len"),
            F.max(F.length("text")).cast("long").alias("max_len"),
        )
        .orderBy("len_bucket")
    )


@register(
    "sample_weighted_priority",
    oracle=f"""
    WITH pri AS (
        SELECT doc_id, source, n_chars,
               CAST(n_chars AS DOUBLE)
                 / (({_hash_bucket_sql('doc_id')} + 0.5) / 1000000)
                 AS priority
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           round(priority, 6) AS priority
    FROM pri
    ORDER BY priority DESC, doc_id
    LIMIT 25
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample of 25 documents by priority
    sampling (Duffield/Lund/Thorup): each doc gets priority
    q = weight / u with u ~ Uniform(0,1] derived from md5(doc_id),
    and the k largest priorities are the sample — inclusion
    probability proportional to weight (here n_chars), reproducible
    on any cluster because u is a pure hash.

    Cross-engine exactness: u = (bucket + 0.5)/1e6 and q = w/u are
    single IEEE divisions (correctly rounded in both engines — no
    libm), so priorities are bit-identical and the top-25 with the
    doc_id tiebreak selects the same set. Scale shape: a narrow map
    plus TakeOrdered (per-partition top-k, then a k-row merge) — no
    global sort."""
    d = load_table(spark, sf_dir, "documents")
    u = (hash_bucket(F.col("doc_id")) + 0.5) / 1_000_000
    pri = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.col("n_chars").cast("double") / u).alias("priority"),
    )
    return (
        pri.select(
            "doc_id", "source", "n_chars", F.round("priority", 6).alias("priority")
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(25)
    )


@register(
    "sample_class_balanced",
    oracle=f"""
    WITH sizes AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before FROM documents
        GROUP BY lang
    ),
    m AS (SELECT MIN(n_before) AS m FROM sizes),
    kept AS (
        SELECT d.lang
        FROM documents d JOIN sizes s USING (lang) CROSS JOIN m
        WHERE ({_hash_bucket_sql('d.doc_id')}) * s.n_before < m.m * {BUCKETS}
    )
    SELECT s.lang, s.n_before,
           CAST(COALESCE(k.n_after, 0) AS BIGINT) AS n_after
    FROM sizes s
    LEFT JOIN (SELECT lang, COUNT(*) AS n_after FROM kept GROUP BY lang) k
      USING (lang)
    ORDER BY s.lang
    """,
)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — the standard rebalancing step
    before training on skewed label distributions: every class is
    rate-matched down to (approximately) the SMALLEST class's size by
    the deterministic keep rule ``hash_bucket(doc_id) * n_class <
    min_class * BUCKETS`` — pure integer arithmetic, so both engines
    keep the identical documents and the decision is reproducible
    under any partitioning (unlike df.sampleBy). Reports the
    per-class before/after census.

    Scale shape: one class-size aggregation (broadcast back — class
    cardinality is tiny by definition), then a narrow filter over the
    stream; no shuffle of kept rows, no per-class sort or rank (an
    exact-count variant would need per-class global ranks; the rate
    rule trades ±O(sqrt(n)) count jitter for rankless scalability)."""
    d = load_table(spark, sf_dir, "documents")
    sizes = materialize(
        d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    )
    m = sizes.agg(F.min("n_before").alias("m"))
    kept = (
        d.join(F.broadcast(sizes), "lang")
        .crossJoin(F.broadcast(m))
        .filter(
            hash_bucket(F.col("doc_id")) * F.col("n_before")
            < F.col("m") * BUCKETS
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        sizes.join(kept, "lang", "left")
        .select(
            "lang",
            "n_before",
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
        )
        .orderBy("lang")
    )


K_FOLDS = 5  # group-aware cross-validation folds


@register(
    "split_group_kfold",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               ({{hb}}) % {K_FOLDS} AS fold
        FROM events
    )
    SELECT fold,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           round(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                          END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS purchase_rate
    FROM e GROUP BY fold ORDER BY fold
    """.format(hb=_hash_bucket_sql("user_id")),
)
def split_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment: EVERY event of a user lands in
    the same fold (fold = hash_bucket(md5(user)) % K — the identical
    bucketing every sampler here uses), so cross-validation never
    leaks one user's behavior across train and eval — the grouped
    split any per-user model demands, with the per-fold balance
    census (users, events, label rate) that validates the folds are
    exchangeable.

    Scale shape: the fold id is a row-local hash — no shuffle to
    assign; the census is one groupBy(fold) with a distinct-user
    count (Spark expands to a two-level aggregate). Reproducible
    under any partitioning or corpus growth, unlike randomized
    splits."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        (hash_bucket(F.col("user_id")) % K_FOLDS).alias("fold"),
    )
    return (
        e.groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("n_purchases"),
        )
        .select(
            "fold",
            "n_users",
            "n_events",
            "n_purchases",
            F.round(
                F.col("n_purchases").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ).alias("purchase_rate"),
        )
        .orderBy("fold")
    )


@register(
    "feat_quantile_normalize",
    oracle="""
    WITH s AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn_s,
               COUNT(*) OVER (PARTITION BY source) AS n_s
        FROM documents
    ),
    g AS (
        SELECT n_chars AS v,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rn_g,
               COUNT(*) OVER () AS n
        FROM documents
    ),
    t AS (
        SELECT doc_id, source, n_chars,
               LEAST(GREATEST(CAST((CAST(rn_s AS HUGEINT)
                                    * ((SELECT MAX(n) FROM g) + 1))
                                   // (n_s + 1) AS BIGINT), 1),
                     (SELECT MAX(n) FROM g)) AS target_rank
        FROM s
    )
    SELECT t.doc_id, t.source,
           CAST(t.n_chars AS BIGINT) AS n_chars,
           CAST(g.v AS BIGINT) AS v_normalized
    FROM t JOIN g ON t.target_rank = g.rn_g
    WHERE t.doc_id < 300
    ORDER BY t.doc_id
    """,
)
def feat_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization: a document's feature value
    is replaced by the GLOBAL value at its within-source quantile, so
    heterogeneous sources (whose quality scores live on different
    scales) become comparable before a single threshold is applied —
    the standard fix when one crawl source scores systematically high.
    The quantile mapping is integer-exact: within-source rank r of
    n_s maps to global rank r*(N+1) div (n_s+1), clamped to [1, N] —
    no floating-point quantile in either engine.

    Scale shape: BOTH rank passes route through the histogram-bucket
    plan (per-source grouped ranks; one global rank) — never a
    single-task sort; the mapping join is an equi-join on the target
    rank (shuffle on an integer key, uniform by construction). The
    doc_id < 300 filter bounds only the emitted sample — the
    normalization map covers the full corpus."""
    from gpu_database_spark.functions.ranks import (
        bucketed_row_number,
        grouped_bucketed_row_number,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    s = grouped_bucketed_row_number(
        d, ["source"], "n_chars", ["doc_id"],
        F.floor(F.col("n_chars") / 200), rank_col="rn_s",
    )
    n_s = s.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    g = bucketed_row_number(
        d.select(F.col("n_chars").alias("v"), "doc_id"), "v", ["doc_id"],
        F.floor(F.col("v") / 200), rank_col="rn_g",
    ).select("v", "rn_g")
    n_tot = d.agg(F.count(F.lit(1)).alias("n"))
    t = (
        s.join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "doc_id",
            "source",
            "n_chars",
            # DECIMAL(38,0) product: rn_s * (n+1) overflows BIGINT once
            # the corpus passes ~3e9 rows — the 100 TB regime this
            # operator claims. The quotient is cast back to long.
            F.least(
                F.greatest(
                    F.expr(
                        "CAST((CAST(rn_s AS DECIMAL(38,0)) * (n + 1))"
                        " div (n_s + 1) AS BIGINT)"
                    ),
                    F.lit(1),
                ),
                F.col("n"),
            ).alias("target_rank"),
        )
    )
    return (
        t.join(g, t.target_rank == g.rn_g)
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("v").cast("long").alias("v_normalized"),
        )
        .orderBy("doc_id")
    )


NEYMAN_TARGET = 10_000  # total sample budget to allocate across strata


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
        SELECT source,
               COUNT(*) AS nh,
               CAST(CAST(SUM(CAST(n_chars AS HUGEINT)) AS VARCHAR)
                    AS DOUBLE) AS s1,
               CAST(CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars)
                         AS VARCHAR) AS DOUBLE) AS s2
        FROM documents GROUP BY source
    ),
    sig AS (
        SELECT source, nh,
               sqrt(s2 / nh - (s1 / nh) * (s1 / nh)) AS sigma
        FROM s
    ),
    tot AS (
        SELECT CAST(CAST(SUM(CAST(round(nh * sigma, 6)
                     AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS w
        FROM sig
    )
    SELECT source,
           CAST(nh AS BIGINT) AS n_docs,
           round(sigma, 6) AS sigma_chars,
           CAST(round({NEYMAN_TARGET} * round(nh * sigma, 6)
                      / (SELECT w FROM tot)) AS BIGINT) AS alloc_n,
           round(round(nh * sigma, 6) / (SELECT w FROM tot), 6)
               AS alloc_frac
    FROM sig ORDER BY source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: split a fixed
    sample budget across document sources proportionally to
    N_h * sigma_h (stratum size x within-stratum std of document
    length) — the design that minimizes the variance of the estimated
    corpus mean at a fixed budget; high-variance sources earn more
    than proportional share. The pre-step a curation pipeline runs
    before sample_stratified_hash draws the actual sample.

    Scale shape: ONE map-side-combinable groupBy collapses 100 TB to
    |sources| rows of exact integer moments (n_chars is an integer, so
    S1/S2 accumulate exactly in DECIMAL(38,0)/HUGEINT and convert via
    the correctly-rounded VARCHAR hop); sigma and the allocation are
    arithmetic over that tiny table, with the N_h*sigma_h weights
    quantized at 6dp before the exact total so both engines divide the
    identical numerator and denominator."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("nh"),
        F.expr(
            "CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS STRING)"
            " AS DOUBLE)"
        ).alias("s1"),
        F.expr(
            "CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars)"
            " AS STRING) AS DOUBLE)"
        ).alias("s2"),
    )
    sig = s.select(
        "source",
        "nh",
        F.expr("sqrt(s2 / nh - (s1 / nh) * (s1 / nh))").alias("sigma"),
    )
    tot = sig.agg(
        F.expr(
            "CAST(CAST(SUM(CAST(round(nh * sigma, 6) AS DECIMAL(27,6)))"
            " AS STRING) AS DOUBLE)"
        ).alias("w")
    )
    return (
        sig.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("nh").cast("long").alias("n_docs"),
            F.round("sigma", 6).alias("sigma_chars"),
            F.expr(
                f"CAST(round({NEYMAN_TARGET} * round(nh * sigma, 6) / w)"
                " AS BIGINT)"
            ).alias("alloc_n"),
            F.round(
                F.expr("round(nh * sigma, 6) / w"), 6
            ).alias("alloc_frac"),
        )
        .orderBy("source")
    )
