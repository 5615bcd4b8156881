"""End-to-end corpus curation + sequence packing for LLM training.

``corpus_curation_pipeline`` chains the individual stages this package
ships (language gate -> quality gate -> exact dedup -> deterministic
hash sampling) into ONE declarative plan — the shape of a production
pretraining-data job. Because every stage is a DataFrame transform,
Catalyst fuses the gates into the scan (one pass over text) and the
only shuffles are the dedup groupBy and the final census.

``pack_sequences_chunked`` is concat-and-chunk sequence packing: lay
every document's tokens end-to-end in doc_id order, cut the tape into
fixed-length training sequences, report per-sequence composition. The
global prefix-sum over token counts is computed WITHOUT a
single-partition window: fixed-width doc_id buckets get per-bucket
running sums (window partitioned by bucket), bucket totals form a tiny
cumulative-offset table (a few thousand rows at 100 TB) that joins
back by bucket — the classic two-level scan/prefix-sum decomposition,
so the operator scales linearly while staying bit-deterministic (no
sampled range boundaries, no spark_partition_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.llm.sampling import BUCKETS, hash_bucket
from gpu_database_spark.llm.textstats import token_count
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

SEQ_LEN = 512          # tokens per packed training sequence
DOC_BUCKET = 4096      # docs per prefix-sum bucket (fixed width, deterministic)
SAMPLE_PPM = 800_000   # curation keep-rate after the gates


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source, text,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               md5(text) AS content_hash
        FROM documents
    ),
    gated AS (
        SELECT * FROM scored
        WHERE lang IN ('en', 'de', 'fr') AND n_tokens >= 10
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash
                                         ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    sampled AS (
        SELECT * FROM deduped
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
              % {BUCKETS} < {SAMPLE_PPM}
    )
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars
    FROM sampled GROUP BY lang, source ORDER BY lang, source
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-stage curation chain in one plan: language gate ->
    min-length quality gate -> exact dedup (keep lowest doc_id per
    content hash) -> deterministic hash sample at {SAMPLE_PPM} ppm ->
    per-(lang, source) token census. The gates are scan-fused narrow
    filters; dedup is one shuffle on the 128-bit content hash; the
    sample is a narrow filter again — at 100 TB this whole pipeline is
    two shuffles total (dedup + census)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", "source", "text",
        token_count(F.col("text")).alias("n_tokens"),
        F.md5("text").alias("content_hash"),
    )
    gated = scored.filter(
        F.col("lang").isin("en", "de", "fr") & (F.col("n_tokens") >= 10)
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    sampled = deduped.filter(hash_bucket(F.col("doc_id")) < SAMPLE_PPM)
    return (
        sampled.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "pack_sequences_chunked",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
        FROM documents
    ),
    pos AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS start_tok
        FROM toks
    ),
    spans AS (
        SELECT doc_id, n_tok, start_tok,
               start_tok // {SEQ_LEN} AS seq_first,
               (start_tok + n_tok - 1) // {SEQ_LEN} AS seq_last
        FROM pos WHERE n_tok > 0
    )
    SELECT CAST(seq_first AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs_starting,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_started,
           COUNT(CASE WHEN seq_last > seq_first THEN 1 END) AS n_spanning
    FROM spans GROUP BY seq_first ORDER BY seq_id
    """,
)
def pack_sequences_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing census: each document's tokens start at
    its exclusive prefix-sum offset; sequence k owns token range
    [k*{SEQ_LEN}, (k+1)*{SEQ_LEN}). Reports, per sequence, how many
    documents start in it, their total tokens, and how many straddle
    the boundary (the loss-masking cases).

    The prefix sum is two-level: per-bucket running sums (window keyed
    by doc_id div {DOC_BUCKET} — thousands of independent partitions),
    plus a cumulative bucket-offset table small enough to broadcast.
    The oracle states the same math with one flat window, which DuckDB
    can afford at fixture scale — the RESULTS are identical, only the
    physical decomposition differs."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tok")
    )
    return pack_census(toks)


def doc_start_offsets(toks: DataFrame) -> DataFrame:
    """(doc_id, n_tok) -> (doc_id, n_tok, start_tok): the exclusive
    prefix sum of token counts in doc_id order, via the two-level
    bucket decomposition (see module docstring)."""
    b = toks.withColumn("bkt", F.expr(f"doc_id div {DOC_BUCKET}"))
    # level 1: running sum within each fixed-width bucket
    wb = Window.partitionBy("bkt").orderBy("doc_id")
    local = b.withColumn("local_end", F.sum("n_tok").over(wb))
    # level 2: cumulative offsets across buckets (tiny: one row per bucket)
    bucket_totals = b.groupBy("bkt").agg(F.sum("n_tok").alias("bkt_tok"))
    wo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.select(
        "bkt", F.coalesce(F.sum("bkt_tok").over(wo), F.lit(0)).alias("bkt_off")
    )
    return local.join(F.broadcast(offsets), "bkt").select(
        "doc_id",
        "n_tok",
        (F.col("bkt_off") + F.col("local_end") - F.col("n_tok")).alias("start_tok"),
    )


def pack_census(toks: DataFrame) -> DataFrame:
    """Per-sequence packing census from a (doc_id, n_tok) frame."""
    spans = doc_start_offsets(toks).filter(F.col("n_tok") > 0).select(
        "doc_id",
        "n_tok",
        F.expr(f"start_tok div {SEQ_LEN}").alias("seq_first"),
        F.expr(f"(start_tok + n_tok - 1) div {SEQ_LEN}").alias("seq_last"),
    )
    return (
        spans.groupBy(F.col("seq_first").alias("seq_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs_starting"),
            F.sum("n_tok").cast("long").alias("tokens_started"),
            F.count(F.when(F.col("seq_last") > F.col("seq_first"), 1)).alias(
                "n_spanning"
            ),
        )
        .orderBy("seq_id")
    )


VOCAB_MILESTONES = (1, 10, 100, 1000, 5000)


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT lower(unnest(string_split_regex(trim(text), '\\s+'))) AS w
        FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk FROM freq
    ),
    cum AS (
        SELECT rk, SUM(c) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cumc
        FROM ranked
    )
    SELECT CAST(m AS BIGINT) AS vocab_size,
           round(cum.cumc / (SELECT SUM(c) FROM freq), 6) AS coverage
    FROM (SELECT unnest([{", ".join(str(m) for m in VOCAB_MILESTONES)}]) AS m)
    JOIN cum ON cum.rk = m
    ORDER BY vocab_size
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of all token OCCURRENCES
    the top-K word types cover, at K = {VOCAB_MILESTONES} — the curve
    that sizes a tokenizer vocab (where it flattens, subwords take
    over). No global window over the full vocabulary: total count is
    one scalar agg, and only the top max(K) types (a LIMIT — Spark's
    distributed take-ordered) are ranked, on a frame small enough that
    its window is free. Milestones beyond the vocab size are omitted
    on both engines."""
    top_k = max(VOCAB_MILESTONES)
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = freq.agg(F.sum("c").alias("total"))
    top = freq.orderBy(F.col("c").desc(), "w").limit(top_k)
    wk = Window.orderBy(F.col("c").desc(), "w")  # <= top_k rows: tiny
    cum = top.select(
        F.row_number().over(wk).alias("rk"),
        F.sum("c").over(wk.rowsBetween(Window.unboundedPreceding, 0)).alias("cumc"),
    )
    miles = spark.createDataFrame(
        [(m,) for m in VOCAB_MILESTONES], "vocab_size long"
    )
    return (
        cum.join(F.broadcast(miles), cum.rk == miles.vocab_size)
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size", F.round(F.col("cumc") / F.col("total"), 6).alias("coverage")
        )
        .orderBy("vocab_size")
    )


@register(
    "quality_tier_census",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    q AS (SELECT quantile_cont(n_tokens, [0.25, 0.5, 0.75]) AS qs FROM t)
    SELECT CAST((CASE WHEN n_tokens > qs[3] THEN 3
                      WHEN n_tokens > qs[2] THEN 2
                      WHEN n_tokens > qs[1] THEN 1
                      ELSE 0 END) AS BIGINT) AS tier,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM t, q
    GROUP BY 1 ORDER BY tier
    """,
)
def quality_tier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum tiers by VALUE thresholds, not by rank: exact length
    quartiles (one percentile agg), then tier = how many thresholds a
    doc exceeds. Rank-based NTILE would need a global sort of the
    corpus; value thresholds need one aggregate + a narrow map — the
    scale-correct way to stratify quality for curriculum schedules.
    Both engines use linear-interpolated exact percentiles (verified
    identical on integer inputs)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens")
    )
    qs = t.agg(
        F.expr("percentile(n_tokens, array(0.25, 0.5, 0.75))").alias("qs")
    )
    tier = (
        F.when(F.col("n_tokens") > F.col("qs")[2], 3)
        .when(F.col("n_tokens") > F.col("qs")[1], 2)
        .when(F.col("n_tokens") > F.col("qs")[0], 1)
        .otherwise(0)
    ).cast("long")
    return (
        t.crossJoin(F.broadcast(qs))
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("tier")
    )


@register(
    "corpus_funnel_yield",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               lang IN ('en', 'de', 'fr') AS lang_ok,
               len(string_split_regex(trim(text), '\\s+')) >= 10 AS len_ok,
               md5(text) AS content_hash,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % {BUCKETS} < {SAMPLE_PPM} AS keep_sample
        FROM documents
    ),
    flagged AS (
        SELECT *,
               lang_ok AND len_ok AND doc_id = MIN(CASE WHEN lang_ok AND len_ok
                                                        THEN doc_id END)
                 OVER (PARTITION BY content_hash) AS canonical
        FROM scored
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS s0,
               CAST(SUM(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN lang_ok AND len_ok THEN 1 ELSE 0 END)
                    AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN canonical THEN 1 ELSE 0 END) AS BIGINT) AS s3,
               CAST(SUM(CASE WHEN canonical AND keep_sample THEN 1 ELSE 0 END)
                    AS BIGINT) AS s4
        FROM flagged
    )
    SELECT stage, n_docs, round(CAST(n_docs AS DOUBLE) / prev, 6) AS yield
    FROM (
        SELECT * FROM (VALUES (0, 'ingest'), (1, 'lang_gate'),
                              (2, 'quality_gate'), (3, 'exact_dedup'),
                              (4, 'hash_sample')) v(ord, stage)
    ) names
    JOIN (
        SELECT 0 AS ord, s0 AS n_docs, s0 AS prev FROM agg UNION ALL
        SELECT 1, s1, s0 FROM agg UNION ALL
        SELECT 2, s2, s1 FROM agg UNION ALL
        SELECT 3, s3, s2 FROM agg UNION ALL
        SELECT 4, s4, s3 FROM agg
    ) cnts USING (ord)
    ORDER BY ord
    """,
)
def corpus_funnel_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss accounting for the curation funnel: document counts after
    each stage (ingest -> language gate -> min-length gate -> exact
    dedup -> hash sample) with the per-stage yield fraction — the
    report a data team reads BEFORE corpus_curation_pipeline's final
    census, because it says where documents die.

    Scale shape: all four gate flags are computed in ONE narrow
    projection; the dedup-canonical flag is a min-over-content-hash
    window (high-cardinality key); the five stage counts come from a
    single conditional aggregation, and the 5-row report is built by
    an explode over that one row — the stream is scanned once and
    shuffles once (the hash window). Yields are single integer
    divisions."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("lang").isin("en", "de", "fr").alias("lang_ok"),
        (token_count(F.col("text")) >= 10).alias("len_ok"),
        F.md5("text").alias("content_hash"),
        (hash_bucket(F.col("doc_id")) < SAMPLE_PPM).alias("keep_sample"),
    )
    wh = Window.partitionBy("content_hash")
    flagged = scored.withColumn(
        "canonical",
        F.col("lang_ok")
        & F.col("len_ok")
        & (
            F.col("doc_id")
            == F.min(
                F.when(
                    F.col("lang_ok") & F.col("len_ok"), F.col("doc_id")
                )
            ).over(wh)
        ),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("lang_ok") & F.col("len_ok"), 1).otherwise(0)).alias(
            "s2"
        ),
        F.sum(F.when(F.col("canonical"), 1).otherwise(0)).alias("s3"),
        F.sum(
            F.when(F.col("canonical") & F.col("keep_sample"), 1).otherwise(0)
        ).alias("s4"),
    )
    stages = [
        ("ingest", "s0", "s0"),
        ("lang_gate", "s1", "s0"),
        ("quality_gate", "s2", "s1"),
        ("exact_dedup", "s3", "s2"),
        ("hash_sample", "s4", "s3"),
    ]
    cells = [
        F.struct(
            F.lit(name).alias("stage"),
            F.col(cur).alias("n_docs"),
            F.round(F.col(cur).cast("double") / F.col(prev), 6).alias("yield"),
            F.lit(i).alias("ord"),
        )
        for i, (name, cur, prev) in enumerate(stages)
    ]
    return (
        agg.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.stage", "c.n_docs", "c.yield", "c.ord")
        .orderBy("ord")
        .drop("ord")
    )


@register(
    "dedup_url_canonicalize",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://WWW.' || source || '.COM/item/'
               || CAST(doc_id % 400 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                       THEN '?utm_source=feed&utm_campaign=x&id='
                            || CAST(doc_id % 400 AS VARCHAR)
                       WHEN doc_id % 3 = 1
                       THEN '?id=' || CAST(doc_id % 400 AS VARCHAR)
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END
               AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, url,
               regexp_replace(lower(regexp_extract(url, 'https?://([^/]+)', 1)),
                              '^www\\.', '')
               || regexp_replace(
                      regexp_replace(
                          regexp_replace(
                              regexp_replace(url, '#.*$', ''),
                              '^https?://[^/]+', ''),
                          'utm_[a-z]+=[^&#]*&?', '', 'g'),
                      '/(\\?|$)', '\\1')
               AS canon_url
        FROM urls
    )
    SELECT canon_url,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT url) AS n_variants,
           MIN(doc_id) AS canonical_doc
    FROM canon
    GROUP BY canon_url
    HAVING COUNT(DISTINCT url) > 1
    ORDER BY n_docs DESC, canon_url
    LIMIT 20
    """,
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-side twin of content
    dedup: the same page arrives under casing, tracking-parameter,
    trailing-slash and fragment variants, and a training pipeline must
    collapse them BEFORE fetch/decode spend. Fixture URLs are
    synthesized deterministically from (source, doc_id) with all four
    variant classes; canonicalization lowercases + strips 'www.' from
    the host, drops the fragment, removes utm_* params and the
    trailing slash — each one regexp over the stream, identical
    patterns in both engines — then exact-groups by canonical form and
    elects min(doc_id) as the family representative.

    Scale shape: pure narrow projections + ONE groupBy on the
    canonical string (high-cardinality key) + top-20; at 100 TB this
    is a single shuffle, and the canonical key doubles as the
    partition key for any downstream per-site work."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".COM/item/"),
        (F.col("doc_id") % 400).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, "/").otherwise(""),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&utm_campaign=x&id="),
                (F.col("doc_id") % 400).cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("?id="), (F.col("doc_id") % 400).cast("string")),
        )
        .otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, "#section-2").otherwise(""),
    )
    u = d.select("doc_id", url.alias("url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"https?://([^/]+)", 1)),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("url", r"#.*$", ""),
                r"^https?://[^/]+",
                "",
            ),
            r"utm_[a-z]+=[^&#]*&?",
            "",
        ),
        r"/(\?|$)",
        r"$1",
    )
    canon = u.select("doc_id", "url", F.concat(host, path).alias("canon_url"))
    return (
        canon.groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url").alias("n_variants"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_variants") > 1)
        .orderBy(F.desc("n_docs"), "canon_url")
        .limit(20)
    )


N_STAGES = 4  # curriculum stages, easiest -> hardest


@register(
    "curriculum_pacing",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM documents
    ),
    st AS (SELECT ((rn - 1) * {N_STAGES}) // n AS stage, n_chars, n_tokens
           FROM r),
    agg AS (SELECT stage, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars
            FROM st GROUP BY stage)
    SELECT stage, n_docs, n_tokens, min_chars, max_chars,
           round(CAST(SUM(n_tokens) OVER (ORDER BY stage) AS DOUBLE)
                 / CAST(SUM(n_tokens) OVER () AS DOUBLE), 6)
               AS cum_token_share
    FROM agg ORDER BY stage
    """,
)
def curriculum_pacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum pacing schedule: the corpus cut into equal-count
    difficulty stages (difficulty proxy: document length — swap in
    any score column), with per-stage document/token budgets and the
    cumulative token share a trainer's dataloader walks through —
    the plan that turns 'train easy-to-hard' into concrete stage
    boundaries over 100 TB.

    Scale shape: the global difficulty rank routes through the
    histogram-bucket plan (never one sort task); the stage id is
    integer arithmetic on the rank ((rn-1)*S div n — both engines
    identical); the census is one groupBy to S rows and the
    cumulative windows run over that S-row table only."""
    from gpu_database_spark.functions.ranks import bucketed_row_number

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", token_count(F.col("text")).alias("n_tokens")
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    r = bucketed_row_number(
        d, "n_chars", ["doc_id"], F.floor(F.col("n_chars") / 200),
        rank_col="rn",
    )
    st = r.crossJoin(F.broadcast(n)).select(
        F.expr(f"((rn - 1) * {N_STAGES}) div n").alias("stage"),
        "n_chars",
        "n_tokens",
    )
    agg = st.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )
    w_cum = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return agg.select(
        "stage",
        "n_docs",
        "n_tokens",
        "min_chars",
        "max_chars",
        F.round(
            F.sum("n_tokens").over(w_cum).cast("double")
            / F.sum("n_tokens").over(w_all).cast("double"),
            6,
        ).alias("cum_token_share"),
    ).orderBy("stage")


N_EPOCHS = 3  # epochs whose shuffle orders the plan reports


@register(
    "pack_epoch_shuffle_plan",
    oracle=f"""
    WITH perm AS (
        SELECT e.epoch, d.doc_id,
               row_number() OVER (
                   PARTITION BY e.epoch
                   ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
                               || CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS pos
        FROM documents d
        CROSS JOIN (SELECT unnest(range(0, {N_EPOCHS})) AS epoch) e
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN pos <= 10 THEN doc_id ELSE 0 END) AS BIGINT)
               AS head10_docid_sum,
           CAST(SUM(pos * doc_id) AS BIGINT) AS pos_docid_dot
    FROM perm GROUP BY epoch ORDER BY epoch
    """,
)
def pack_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffle: epoch e's data order
    is the rank of md5(e || doc_id) — a seeded permutation that is (a)
    reproducible on any cluster and any partitioning (unlike
    orderBy(rand())), (b) different every epoch, and (c) resumable
    mid-epoch because any doc's position is recomputable from its id.
    The census fingerprints each epoch's order (head sample +
    position·id dot product) so two runs of the dataloader can assert
    they fed batches identically.

    Scale shape: the permutation rank routes through the grouped
    histogram-bucket plan partitioned by epoch — the md5 hex prefix
    gives a uniform bucket key, so parallelism = epochs × buckets and
    no epoch ever sorts on one task. The dot product accumulates in
    DECIMAL(38,0)-safe range here (pos·id ≤ n² = 1e12 at fixture
    scale; the oracle's HUGEINT and a decimal swap cover 100 TB)."""
    from gpu_database_spark.functions.ranks import grouped_bucketed_row_number

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(N_EPOCHS).select(F.col("id").alias("epoch"))
    tagged = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    # md5 hex is uniform: the first 2 hex chars give 256 buckets that
    # are a monotone prefix of the full string order.
    ranked = grouped_bucketed_row_number(
        tagged, ["epoch"], "h", ["doc_id"],
        F.conv(F.substring("h", 1, 2), 16, 10).cast("long"), rank_col="pos",
    )
    return (
        ranked.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("pos") <= 10, F.col("doc_id")).otherwise(0)
            )
            .cast("long")
            .alias("head10_docid_sum"),
            F.sum(F.col("pos") * F.col("doc_id"))
            .cast("long")
            .alias("pos_docid_dot"),
        )
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            "n_docs",
            "head10_docid_sum",
            "pos_docid_dot",
        )
        .orderBy("epoch")
    )
