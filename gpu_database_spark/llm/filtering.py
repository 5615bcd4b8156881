"""Corpus quality filtering and retrieval scoring (round 3).

Four training-data-pipeline operators over ``documents``:

* ``text_repetition_filter`` — Gopher-style repetition gates
  (most-common-word fraction, duplicate-bigram fraction);
* ``text_dsir_weights`` — DSIR-style importance weights: per-token
  target/corpus unigram probability ratio, averaged per document;
* ``text_bm25_search`` — BM25 relevance of a fixed query term set
  (rational-idf variant: no transcendentals, so both engines produce
  bit-identical doubles);
* ``text_inverted_index`` — posting-list construction (term ->
  document frequency + first-k sorted postings).

Reference tie-in: the reference has no text stack at all (its value
payload is a random 10x10 char matrix, ``src/cuda/kv.cuh:72-78``);
these extend the BASELINE.json north star (LLM-pipeline ops) the same
way the round-1 textstats/dedup modules do.

Scale notes (100 TB): every operator is one scan + per-row
higher-order array functions (JVM codegen, no Python) followed by at
most one keyed shuffle. The repetition filter is shuffle-free (all
signals are per-row array algebra). DSIR and BM25 aggregate a bounded
vocabulary / 3-row term-stat table and broadcast it back — the big
side is never shuffled twice. The inverted index shuffles once on
term (the unavoidable posting-list grouping) with map-side partial
aggregation; posting arrays are truncated to k entries so reducer
state stays bounded even for stopword-grade terms.

Oracle-parity discipline: only integer arithmetic, single IEEE
divisions of integer-derived doubles, and round(x, 8) normalization —
identical expression trees on both engines, so value hashes match
bit-for-bit (see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

TOKENS = r"\s+"

# BM25 parameters (classic Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("data", "join", "stream")


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), TOKENS)


@register(
    "text_repetition_filter",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE doc_id < 300
    ),
    sig AS (
        SELECT doc_id, lang,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(list_max(list_transform(list_distinct(t),
                    w -> len(list_filter(t, x -> x = w)))) AS BIGINT) AS top_word_n,
               CAST(len(t) - 1 AS BIGINT) AS n_bigrams,
               CAST(len(list_distinct(list_transform(range(2, len(t) + 1),
                    i -> t[i - 1] || ' ' || t[i]))) AS BIGINT) AS n_distinct_bigrams
        FROM tok
    )
    SELECT doc_id, lang, n_tokens,
           round(CAST(top_word_n AS DOUBLE) / CAST(n_tokens AS DOUBLE), 8)
               AS top_word_frac,
           round(CAST(n_bigrams - n_distinct_bigrams AS DOUBLE)
                 / CAST(n_bigrams AS DOUBLE), 8) AS dup_bigram_frac,
           (CAST(top_word_n AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.2
            AND CAST(n_bigrams - n_distinct_bigrams AS DOUBLE)
                / CAST(n_bigrams AS DOUBLE) <= 0.5) AS keep
    FROM sig ORDER BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: drop documents dominated by one
    word or by repeated bigrams. Both signals are per-row array
    algebra (no explode, no shuffle) — at 100 TB this runs at parquet
    scan speed inside one WholeStageCodegen span."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = tokens_col(F.col("text"))
    d = d.select(
        "doc_id",
        "lang",
        F.size(t).cast("long").alias("n_tokens"),
        F.expr(
            "CAST(array_max(transform(array_distinct(split(trim(text), '\\\\s+')), "
            "w -> size(filter(split(trim(text), '\\\\s+'), x -> x = w)))) AS BIGINT)"
        ).alias("top_word_n"),
        (F.size(t) - 1).cast("long").alias("n_bigrams"),
        F.expr(
            "CAST(size(array_distinct(transform("
            "sequence(1, size(split(trim(text), '\\\\s+')) - 1), "
            "i -> concat(split(trim(text), '\\\\s+')[i - 1], ' ', "
            "split(trim(text), '\\\\s+')[i])))) AS BIGINT)"
        ).alias("n_distinct_bigrams"),
    )
    top_frac = F.col("top_word_n").cast("double") / F.col("n_tokens").cast("double")
    dup_frac = (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double") / F.col(
        "n_bigrams"
    ).cast("double")
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(top_frac, 8).alias("top_word_frac"),
        F.round(dup_frac, 8).alias("dup_bigram_frac"),
        ((top_frac <= 0.2) & (dup_frac <= 0.5)).alias("keep"),
    ).orderBy("doc_id")


@register(
    "text_dsir_weights",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    vocab AS (
        SELECT w,
               COUNT(*) AS c_all,
               COUNT(*) FILTER (WHERE lang = 'en') AS c_t
        FROM tok GROUP BY w
    ),
    totals AS (
        SELECT SUM(c_all) AS t_all, SUM(c_t) AS t_t FROM vocab
    ),
    scored AS (
        SELECT tok.doc_id,
               round(CAST(vocab.c_t * totals.t_all AS DOUBLE)
                     / CAST(vocab.c_all * totals.t_t AS DOUBLE), 8) AS ratio
        FROM tok JOIN vocab USING (w) CROSS JOIN totals
    )
    SELECT d.doc_id, d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(s.ratio AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
               AS dsir_score
    FROM scored s JOIN documents d USING (doc_id)
    WHERE d.doc_id < 200
    GROUP BY d.doc_id, d.lang
    ORDER BY d.doc_id
    """,
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: how en-like is each document?

    Per token: ratio = p_target(w) / p_corpus(w) where target = the
    ``lang='en'`` slice; per doc: mean ratio. High-ratio docs are the
    ones importance resampling would keep when targeting English.

    Plan shape: explode -> vocab aggregate (bounded cardinality) ->
    broadcast-sized join back -> per-doc aggregate. The full token
    stream shuffles once (on word, with map-side combine); the join
    back is vocab-sized. Ratios are integer-product / integer-product
    single divisions (bit-identical cross-engine), decimal-summed."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens_col(F.col("text"))).alias("w"))
    vocab = tok.groupBy("w").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("c_t"),
    )
    totals = vocab.agg(
        F.sum("c_all").alias("t_all"), F.sum("c_t").alias("t_t")
    )
    scored = (
        tok.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "lang",
            F.round(
                (F.col("c_t") * F.col("t_all")).cast("double")
                / (F.col("c_all") * F.col("t_t")).cast("double"),
                8,
            ).alias("ratio"),
        )
    )
    return (
        scored.filter(F.col("doc_id") < 200)
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (dsum(F.col("ratio")) / F.count(F.lit(1))).alias("dsir_score"),
        )
        .orderBy("doc_id")
    )


def _bm25_oracle() -> str:
    per_term = []
    for i, term in enumerate(BM25_TERMS):
        per_term.append(
            f"round((CAST(n_docs - df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5)"
            f" * (CAST(tf{i} AS DOUBLE) * {BM25_K1 + 1})"
            f" / (CAST(tf{i} AS DOUBLE) + {BM25_K1} * (1 - {BM25_B} + {BM25_B} *"
            f" (CAST(dl AS DOUBLE) / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 8)"
        )
    tf_defs = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{term}')) AS BIGINT) AS tf{i}"
        for i, term in enumerate(BM25_TERMS)
    )
    df_defs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(
        f"CAST({expr} AS DECIMAL(27,6))" for expr in per_term
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    tf AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, {tf_defs} FROM tok
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl, {df_defs} FROM tf
    )
    SELECT doc_id, dl, CAST({score} AS DOUBLE) AS bm25
    FROM tf CROSS JOIN stats
    WHERE tf0 + tf1 + tf2 > 0
    ORDER BY bm25 DESC, doc_id LIMIT 30
    """


@register("text_bm25_search", oracle=_bm25_oracle())
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-30 for the query {data, join, stream}.

    Rational-idf BM25: idf(t) = (N - df + 0.5) / (df + 0.5) (the
    odds inside Robertson's log). Keeping the formula log-free means
    every intermediate is an IEEE division of integer-derived doubles
    — bit-identical across Spark and DuckDB, so the oracle hash-gates
    real relevance math rather than a looser approximation.

    Plan shape: one scan computing per-doc term frequencies as array
    filters (no explode), a 1-row global stats aggregate broadcast
    back, then the score projection + top-k. The corpus is scanned
    twice but shuffled never (stats are a scalar aggregate)."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_col(F.col("text"))
    tf_cols = [
        F.expr(
            f"CAST(size(filter(split(trim(text), '\\\\s+'), x -> x = '{term}')) AS BIGINT)"
        ).alias(f"tf{i}")
        for i, term in enumerate(BM25_TERMS)
    ]
    tf = d.select("doc_id", F.size(t).cast("long").alias("dl"), *tf_cols)
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(BM25_TERMS)):
        idf = ((F.col("n_docs") - F.col(f"df{i}")).cast("double") + F.lit(0.5)) / (
            F.col(f"df{i}").cast("double") + F.lit(0.5)
        )
        tf_part = (F.col(f"tf{i}").cast("double") * F.lit(BM25_K1 + 1)) / (
            F.col(f"tf{i}").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1 - BM25_B)
                + F.lit(BM25_B)
                * (
                    F.col("dl").cast("double")
                    / (F.col("total_dl").cast("double") / F.col("n_docs").cast("double"))
                )
            )
        )
        term_score = F.round(idf * tf_part, 8).cast("decimal(27,6)")
        score = term_score if score is None else score + term_score
    return (
        scored.filter((F.col("tf0") + F.col("tf1") + F.col("tf2")) > 0)
        .select("doc_id", "dl", score.cast("double").alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(30)
    )


@register(
    "text_inverted_index",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_slice(list_sort(list(doc_id)), 1, 15), ',')
               AS postings_head
    FROM tok GROUP BY term
    HAVING COUNT(*) >= 25
    ORDER BY df DESC, term LIMIT 40
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction: term -> document frequency + the
    first 15 sorted doc ids (as a comma string so both engines
    stringify identically). One shuffle on term with map-side distinct;
    posting arrays are head-truncated so no reducer holds an unbounded
    stopword posting list — the full-list variant at 100 TB would
    write postings sharded by (term, doc_id range) instead."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("term")
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 15), ","
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= 25)
        .orderBy(F.col("df").desc(), "term")
        .limit(40)
    )


# Compression-ratio quality gate: documents whose deflate ratio is
# below this are dominated by repeated structure (boilerplate, spam,
# generator loops) — the Gopher-family "too compressible" signal.
COMPRESS_FLAG_RATIO = 0.30


@register("text_compression_ratio")  # rows-only: zlib is engine-local
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality gate (deflate bytes / raw bytes per
    document, zlib level 6): highly compressible text is repetitive
    boilerplate; the per-source census reports the mean ratio and the
    share below the flag threshold (0.30) — the corpus-filtering
    signal CCNet/Gopher-style pipelines compute alongside stopword
    and repetition gates (cf. text_repetition_filter's n-gram form).

    Scale shape: ONE Arrow-vectorized pandas UDF computes the two
    lengths per row (zlib has no JVM builtin — the legitimate
    Pandas-UDF case); everything else is a map-side-combinable
    groupBy. Per-doc ratios are rounded at 8dp and summed in exact
    DECIMAL so the census is partitioning-independent; the UDF is
    engine-local (no SQL oracle), gated by a serial zlib replica in
    tests/test_round8_ops.py.

    Reference tie-in: none in the reference CUDA KV store — the
    corpus-filtering layer per the build brief."""
    import pandas  # noqa: F401 — resolves the UDF's postponed hints
    from pyspark.sql.functions import pandas_udf

    def _deflate_ratio(texts: "pandas.Series") -> "pandas.Series":
        import zlib

        def ratio(t: str) -> float:
            raw = (t or "").encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(ratio)

    _deflate_ratio.__annotations__ = {
        "texts": pandas.Series, "return": pandas.Series
    }
    deflate_ratio = pandas_udf(_deflate_ratio, "double")

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        F.round(deflate_ratio(F.col("text")), 8).alias("ratio"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(27,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_ratio"),
            F.sum(
                F.when(F.col("ratio") < COMPRESS_FLAG_RATIO, 1).otherwise(0)
            ).cast("long").alias("n_flagged"),
        )
        .orderBy("source")
    )
