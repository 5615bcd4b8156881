"""Text analysis for training-data pipelines (BASELINE.json north star).

Language ID (stopword-hit heuristic), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex),
document fingerprinting — all as built-in column expressions (JVM
codegen, no Python in the hot path), each oracle-checked.

Scale notes: every query is a single scan + narrow projections +
one aggregation; nothing shuffles more than the group keys. At 100 TB
these run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import davg_sql, dsum
from gpu_database_spark.functions.materialize import materialize
from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

# Tiny per-language stopword markers for the n-gram/stopword language
# heuristic. The fixture languages are synthetic; the *mechanism* is the
# deliverable: score = stopword hits per language, argmax wins.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "es": ["el", "la", "y"],
    "zh": ["的", "是", "了"],
}


def token_count(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation marks the
    way a byte-pair tokenizer would split them (regex families)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("long")


def word_hits(text: Column, word: str) -> Column:
    """Occurrences of a word (split-based: engine-portable)."""
    return (F.size(F.split(F.concat(F.lit(" "), text, F.lit(" ")), f" {word} ")) - 1).cast(
        "long"
    )


@register(
    "text_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT)
               AS total_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {davg_sql('n_chars')} AS avg_chars
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) rolled up by language."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text"))).alias("total_tokens"),
            F.sum(bpe_ish_token_count(F.col("text"))).alias("total_bpe_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum(F.col("n_chars").cast("decimal(27,6)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
        )
        .orderBy("lang")
    )


@register(
    "text_tokenizer_fertility",
    oracle="""
    WITH w AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM((length(word) + 3) // 4) AS BIGINT) AS n_subwords,
           round(SUM((length(word) + 3) // 4) * 1.0 / COUNT(*), 6) AS fertility,
           round(SUM(length(word)) * 1.0
                 / GREATEST(SUM((length(word) + 3) // 4), 1), 6)
               AS chars_per_subword
    FROM w GROUP BY lang ORDER BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword tokens emitted per
    whitespace word — the efficiency metric multilingual pretraining
    teams track per corpus slice (high fertility = a language paying
    a byte-fallback tax under the shared vocab). The subword count is
    a FIXED 4-char-chunk proxy, ceil(len(word)/4) — deterministic and
    bit-identical in both engines (a trained vocab lives in
    text_bpe_train_merges; swapping it in changes the count column,
    not the plan). chars_per_subword is the inverse compression view.

    Scale shape: explode is a narrow map, the rollup is one tiny
    groupBy on lang — a single corpus pass at any SF."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    )
    sub = F.expr("(length(word) + 3) div 4")
    return (
        w.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(sub).cast("long").alias("n_subwords"),
            F.round(F.sum(sub) * 1.0 / F.count(F.lit(1)), 6).alias("fertility"),
            F.round(
                F.sum(F.length("word")) * 1.0
                / F.greatest(F.sum(sub), F.lit(1)),
                6,
            ).alias("chars_per_subword"),
        )
        .orderBy("lang")
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id, n_tokens, punct_ratio, stop_ratio, mean_word_len,
           (n_tokens >= 20 AND punct_ratio < 0.1 AND stop_ratio > 0.05) AS keep
    FROM (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                     / CAST(n_chars AS DOUBLE), 8) AS punct_ratio,
               round(CAST(len(string_split(' ' || text || ' ', ' the ')) - 1
                     + len(string_split(' ' || text || ' ', ' a ')) - 1
                     + len(string_split(' ' || text || ' ', ' and ')) - 1 AS DOUBLE)
                     / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 8)
                   AS stop_ratio,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 8)
                   AS mean_word_len
        FROM documents
    )
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, punctuation ratio, stopword ratio,
    mean word length -> a keep/drop gate (the C4/Gopher-style filter
    shape). Ratios rounded to 8dp (single double division per row —
    deterministic; rounding only normalizes repr)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    n_tokens = token_count(F.col("text"))
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    stops = word_hits(F.col("text"), "the") + word_hits(F.col("text"), "a") + word_hits(
        F.col("text"), "and"
    )
    word_chars = F.length(F.regexp_replace(F.col("text"), " ", ""))
    out = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct.cast("double") / F.col("n_chars").cast("double"), 8).alias("punct_ratio"),
        F.round(stops.cast("double") / n_tokens.cast("double"), 8).alias("stop_ratio"),
        F.round(word_chars.cast("double") / n_tokens.cast("double"), 8).alias("mean_word_len"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_tokens") >= 20) & (F.col("punct_ratio") < 0.1) & (F.col("stop_ratio") > 0.05),
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(string_split(' ' || text || ' ', ' the ')) - 1
                 + len(string_split(' ' || text || ' ', ' a ')) - 1
                 + len(string_split(' ' || text || ' ', ' and ')) - 1 AS s_en,
               len(string_split(' ' || text || ' ', ' der ')) - 1
                 + len(string_split(' ' || text || ' ', ' und ')) - 1
                 + len(string_split(' ' || text || ' ', ' die ')) - 1 AS s_de,
               len(string_split(' ' || text || ' ', ' le ')) - 1
                 + len(string_split(' ' || text || ' ', ' la ')) - 1
                 + len(string_split(' ' || text || ' ', ' et ')) - 1 AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS predicted,
           CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
           CAST(s_fr AS BIGINT) AS s_fr
    FROM scored
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword-hit scores, argmax
    with a deterministic tie order (en > de > fr)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)

    def score(words: list[str]) -> Column:
        s = word_hits(F.col("text"), words[0])
        for w in words[1:]:
            s = s + word_hits(F.col("text"), w)
        return s

    scored = d.select(
        "doc_id",
        "lang",
        score(LANG_MARKERS["en"]).alias("s_en"),
        score(LANG_MARKERS["de"]).alias("s_de"),
        score(LANG_MARKERS["fr"]).alias("s_fr"),
    )
    pred = (
        F.when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), "en")
        .when(F.col("s_de") >= F.col("s_fr"), "de")
        .otherwise("fr")
    )
    return scored.select(
        "doc_id", "lang", pred.alias("predicted"), "s_en", "s_de", "s_fr"
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT) AS fp60,
           substr(md5(lower(trim(text))), 1, 8) AS shard_hint
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonicalized content hash + a 60-bit
    integer fingerprint + shard hint (the rolling-hash role; md5-derived
    so both engines reproduce it bit-for-bit)."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.md5(F.lower(F.trim(F.col("text"))))
    return d.select(
        "doc_id",
        canon.alias("content_md5"),
        F.conv(F.substring(canon, 1, 15), 16, 10).cast("long").alias("fp60"),
        F.substring(canon, 1, 8).alias("shard_hint"),
    ).orderBy("doc_id")


@register(
    "text_chunking",
    oracle="""
    SELECT doc_id, chunk_idx,
           CAST(len(words[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS BIGINT)
               AS chunk_tokens,
           md5(array_to_string(words[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' '))
               AS chunk_md5
    FROM (
        SELECT doc_id, words,
               unnest(range(0, greatest(len(words) - 1, 0) // 48 + 1)) AS chunk_idx
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
              FROM documents)
    )
    ORDER BY doc_id, chunk_idx
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunking: split each document into 64-token windows
    with stride 48 (16-token overlap) — the pretokenization shape every
    LLM data pipeline needs. Emits per-chunk token counts + content
    hash (not the text, keeping results scan-sized). Pure array
    algebra: one explode, no UDF, no shuffle before the final sort."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.floor((F.greatest(F.size(w) - 1, F.lit(0))) / 48) + 1
    chunk = F.slice(F.col("words"), F.col("chunk_idx") * 48 + 1, 64)
    return (
        d.select(
            "doc_id",
            w.alias("words"),
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size(chunk).cast("long").alias("chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "text_scrub_pii",
    oracle="""
    WITH raw(doc_id, body) AS (VALUES
        (1, 'contact alice@example.com or visit https://a.example.org/x?q=1 now'),
        (2, 'call +1-555-123-4567 and mail bob.smith@corp.io today'),
        (3, 'clean document with no sensitive content at all'),
        (4, 'two mails: x@y.zz and x@y.zz plus http://plain.test')
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(body, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g'),
               'https?://[^ ]+', '<URL>', 'g'),
             '\\+?[0-9][0-9-]{7,}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(body,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(body, 'https?://[^ ]+')) AS BIGINT) AS n_urls
    FROM raw
    ORDER BY doc_id
    """,
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails/URLs/phone numbers and count
    occurrences — the compliance pass every training-data pipeline runs
    before anything ships. Self-contained fixture rows (the synthetic
    corpus has no PII) keep the regex behavior identical across
    engines; pure regexp_replace chains, JVM-side, scan-speed at
    100 TB."""
    rows = [
        (1, "contact alice@example.com or visit https://a.example.org/x?q=1 now"),
        (2, "call +1-555-123-4567 and mail bob.smith@corp.io today"),
        (3, "clean document with no sensitive content at all"),
        (4, "two mails: x@y.zz and x@y.zz plus http://plain.test"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, body string")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    url = r"https?://[^ ]+"
    phone = r"\+?[0-9][0-9-]{7,}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("body"), email, "<EMAIL>"), url, "<URL>"
        ),
        phone,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all("body", F.lit(email), F.lit(0))).cast("long").alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("body", F.lit(url), F.lit(0))).cast("long").alias(
            "n_urls"
        ),
    ).orderBy("doc_id")


@register(
    "text_winnowing",
    oracle="""
    WITH grams AS (
        SELECT doc_id, pos,
               substr(md5(array_to_string(words[pos:pos + 3], ' ')), 1, 8) AS gh
        FROM (
            SELECT doc_id, words,
                   unnest(range(1, greatest(len(words) - 3, 0) + 1)) AS pos
            FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
                  FROM documents)
        )
    ),
    winnowed AS (
        SELECT doc_id,
               MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM grams
    )
    SELECT doc_id, fp, COUNT(*) AS weight
    FROM winnowed
    WHERE doc_id < 100
    GROUP BY doc_id, fp
    ORDER BY doc_id, fp
    """,
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS rolling-hash scheme): hash every
    word 4-gram, slide a window of 4 consecutive gram-hashes, keep each
    window's minimum — guaranteeing any shared run of ~7 words between
    two documents shares a fingerprint, with ~1/4 the storage of all
    grams. The plagiarism/near-dup fingerprint family the plain content
    hash (text_fingerprint) can't provide."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = F.split(F.trim(F.col("text")), r"\s+")
    n_g = F.greatest(F.size(w) - 3, F.lit(0))
    grams = (
        d.select("doc_id", w.alias("words"), n_g.alias("n_g"))
        .filter(F.col("n_g") >= 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("n_g"))).alias("pos"),
            "words",
        )
        .select(
            "doc_id",
            "pos",
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(F.col("words"), F.col("pos"), 4))), 1, 8
            ).alias("gh"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    return (
        grams.select("doc_id", F.min("gh").over(win).alias("fp"))
        .filter(F.col("doc_id") < 100)
        .groupBy("doc_id", "fp")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy("doc_id", "fp")
    )


@register(
    "text_source_rollup",
    oracle=f"""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY ROLLUP (lang, source)
    ORDER BY lang NULLS FIRST, source NULLS FIRST
    """,
)
def text_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: lang x source rollup with subtotals."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy(F.col("lang").asc_nulls_first(), F.col("source").asc_nulls_first())
    )


@register(
    "text_bigram_counts",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    pairs AS (
        SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM words
    ),
    bigrams AS (
        SELECT lower(w[i]) || ' ' || lower(w[i + 1]) AS bigram FROM pairs
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 30
    """,
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequencies (top 30): adjacent-word pairs
    via zip_with over the word array against its own tail — a narrow
    per-doc map, then one count shuffle on the bigram. The n-gram LM /
    tokenizer-vocab precursor; at 100 TB the only wide stage is the
    final count, and a (bigram % k) pre-aggregation salts any hot
    head word."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", F.lower(a), F.lower(b)),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(30)
    )


@register(
    "text_unigram_surprisal",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    vocab AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM vocab),
    scored AS (
        SELECT tok.doc_id,
               -ln(CAST(vocab.c AS DOUBLE) / (SELECT t FROM tot)) AS nll
        FROM tok JOIN vocab USING (w)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST((2 * CAST(SUM(CAST(nll AS DECIMAL(27,6))) * 1000000
                          AS HUGEINT) + COUNT(*)) // (2 * COUNT(*))
                AS DOUBLE) / 1000000.0 AS mean_nll
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal (cross-entropy in nats
    against the corpus's own unigram LM): -mean(ln p(w)), p(w) =
    corpus_count(w) / total_tokens. The cheap perplexity proxy LLM
    pipelines use for quality/outlier scoring — boilerplate-heavy docs
    score low, lexically odd docs score high — and the standard
    prefilter before an expensive model-based perplexity pass.

    Scale shape: explode tokens once; ONE groupBy(word) builds the LM
    (vocab-bounded); a shuffle join keys tokens back to their corpus
    frequency (the vocab side is Zipf-small and AQE broadcasts it
    here); ONE groupBy(doc) folds per-token surprisals. Per-token
    -ln(c/t) is a fixed double op sequence on integer ratios —
    identical across engines; the per-doc sum goes through
    DECIMAL(27,6) (compat.py). The mean is rounded to 6dp by INTEGER
    arithmetic on the exact sum — (2u + n) div (2n) at micro scale —
    never by round() on a double: a 6dp-decimal sum divided by a
    small count lands EXACTLY on 6dp half-boundaries where Spark's
    shortest-repr HALF_UP and DuckDB's floating round() disagree
    (caught by the round-8 sf1.0 sweep)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("t"))
    nll = -F.log(F.col("c").cast("double") / F.col("t"))
    return (
        tok.join(vocab, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(nll.cast("decimal(27,6)")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.expr(
                    "(2 * CAST(_s * 1000000 AS DECIMAL(38,0)) + n_tokens)"
                    " div (2 * n_tokens)"
                ).cast("double")
                / 1000000.0
            ).alias("mean_nll"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_bpe_merge_step",
    oracle="""
    WITH words AS (
        SELECT w AS word, COUNT(*) AS freq FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        )
        WHERE length(w) BETWEEN 2 AND 20
        GROUP BY w
    ),
    pairs AS (
        SELECT substr(word, CAST(i AS INT), 2) AS pair,
               SUM(freq) AS cnt
        FROM words, UNNEST(range(1, length(word))) AS t(i)
        GROUP BY 1
    )
    SELECT pair, CAST(cnt AS BIGINT) AS cnt
    FROM pairs
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge iteration over the corpus at the character
    level: tokenize to lowercase words, count word frequencies, then
    count every ADJACENT symbol pair weighted by word frequency — the
    top pair is the merge a byte-pair-encoding tokenizer trainer
    would apply next. Reported: the top-20 merge candidates.

    Scale shape: the corpus collapses to the word-frequency table
    first (one shuffle on word — the standard wordcount), so pair
    explosion runs over DISTINCT words only (vocabulary-sized, not
    corpus-sized). Pair generation is a JVM-side higher-order
    transform over sequence(1, len-1) — no Python UDF — and the pair
    rollup is a second partial-aggregating groupBy. Counts are
    integers; the top-k is TakeOrdered with a total tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
        )
        .filter(F.length("word").between(2, 20))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    return pairs.orderBy(F.desc("cnt"), "pair").limit(20)


@register(
    "text_zipf_fit",
    oracle="""
    WITH tf AS (
        SELECT w AS token, COUNT(*) AS freq FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        )
        WHERE w <> '' GROUP BY w
    ),
    top AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS r
        FROM tf ORDER BY freq DESC, token LIMIT 500
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(ln(r) AS DECIMAL(27,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ln(freq) AS DECIMAL(27,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(ln(r) * ln(freq) AS DECIMAL(27,6))) AS DOUBLE)
                 AS sxy,
               CAST(SUM(CAST(ln(r) * ln(r) AS DECIMAL(27,6))) AS DOUBLE)
                 AS sxx
        FROM top
    )
    SELECT CAST(n AS BIGINT) AS n_tokens,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM m
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope of
    log(frequency) against log(rank) over the top-500 tokens — a
    healthy natural-language corpus sits near slope -1, and a big
    departure flags boilerplate or synthetic text in a corpus audit.

    Scale shape: wordcount shuffle collapses the corpus to the
    vocabulary, TakeOrdered selects the top-500 (per-partition top-k
    merge, no global sort), and ONLY that 500-row set sees the
    rank window (bounded single partition by construction) and the
    closed-form OLS fold over DECIMAL(27,6) exact sums."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = (
        tf.orderBy(F.desc("freq"), "token")
        .limit(500)
        .select(
            "freq",
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), "token"))
            .alias("r"),
        )
    )
    lx, ly = F.log(F.col("r").cast("double")), F.log(F.col("freq").cast("double"))
    m = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx.cast("decimal(27,6)")).cast("double").alias("sx"),
        F.sum(ly.cast("decimal(27,6)")).cast("double").alias("sy"),
        F.sum((lx * ly).cast("decimal(27,6)")).cast("double").alias("sxy"),
        F.sum((lx * lx).cast("decimal(27,6)")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "text_bigram_surprisal",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
        FROM documents
    ),
    occ AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM words, UNNEST(range(1, len(w))) AS t(i)
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM occ GROUP BY 1, 2),
    uni AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1),
    scored AS (
        SELECT o.doc_id,
               -log2(CAST(b.c12 AS DOUBLE) / u.c1) AS s
        FROM occ o
        JOIN big b ON o.w1 = b.w1 AND o.w2 = b.w2
        JOIN uni u ON o.w1 = u.w1
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST((2 * CAST(SUM(CAST(s AS DECIMAL(27,6))) * 1000000
                          AS HUGEINT) + COUNT(*)) // (2 * COUNT(*))
                AS DOUBLE) / 1000000.0 AS mean_surprisal
    FROM scored GROUP BY doc_id
    ORDER BY mean_surprisal DESC, doc_id
    LIMIT 10
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal under the corpus's own
    bigram language model: -log2 P(w2|w1) with P estimated from
    corpus bigram/left-context counts — the sequence-level
    perplexity-style quality filter one step up from
    text_unigram_surprisal (word-order-aware, so shuffled or
    templated text scores high). Reports the 10 most surprising docs.

    Scale shape: bigram occurrences explode once (narrow map); the
    model tables are two partial-aggregating groupBys over them; the
    scoring join shuffles occurrences by bigram key — the standard
    wordcount-join topology whose fan-in is the vocabulary, never a
    cross join. Per-occurrence surprisal terms truncate to
    DECIMAL(27,6) before the per-doc mean, so both engines hash-match
    (the count ratio inside log2 is a single IEEE division)."""
    d = load_table(spark, sf_dir, "documents")
    # words array is projected FIRST: referencing split() inside the
    # transform lambda would re-tokenize the document once per element
    # (quadratic in doc length — measured 4x the whole-query time).
    occ = (
        d.select(
            "doc_id", F.split(F.trim(F.lower("text")), " ").alias("ws")
        )
        # A <2-token doc has no bigrams: without this guard
        # sequence(1, size-1) = sequence(1, 0) = [1, 0] (DESCENDING in
        # Spark, not empty) and ws[i] faults under ANSI mode, where the
        # oracle's range(1, len) is simply empty — filter to match.
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    # Materialize the bigram model once: it feeds both the left-context
    # rollup and the scoring join, and without this the occurrence
    # explode would execute three times (model build here is the
    # "train" step a real pipeline persists anyway).
    big = (
        occ.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .transform(materialize)
    )
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scored = (
        occ.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .select(
            "doc_id",
            (-F.log2(F.col("c12").cast("double") / F.col("c1"))).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # integer (2u+c) div (2c) rounding — sum/count quotients
            # land exactly on 6dp half-boundaries where the engines'
            # round() semantics disagree (round-8 sweep class)
            (
                F.expr(
                    "(2 * CAST(SUM(CAST(s AS DECIMAL(27,6))) * 1000000"
                    " AS DECIMAL(38,0)) + COUNT(*)) div (2 * COUNT(*))"
                ).cast("double")
                / 1000000.0
            ).alias("mean_surprisal"),
        )
        .orderBy(F.desc("mean_surprisal"), "doc_id")
        .limit(10)
    )


KN_DISCOUNT = 0.75  # Kneser-Ney absolute discount


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
    WITH words AS (
        SELECT string_split(trim(text), ' ') AS w FROM documents
    ),
    pairs AS (SELECT w, unnest(range(1, len(w))) AS i FROM words),
    bg AS (
        SELECT lower(w[i]) AS w1, lower(w[i + 1]) AS w2, COUNT(*) AS n
        FROM pairs GROUP BY 1, 2
    ),
    h AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c1,
                 CAST(COUNT(*) AS BIGINT) AS n1f
          FROM bg GROUP BY w1),
    t AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p FROM bg GROUP BY w2),
    z AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM bg)
    SELECT bg.w1, bg.w2, CAST(bg.n AS BIGINT) AS n, c1, n1f, n1p,
           round(CAST(bg.n AS DOUBLE) / CAST(c1 AS DOUBLE), 6) AS p_mle,
           round(GREATEST(CAST(bg.n AS DOUBLE) - {KN_DISCOUNT}, 0.0)
                     / CAST(c1 AS DOUBLE)
                 + ({KN_DISCOUNT} / CAST(c1 AS DOUBLE))
                   * CAST(n1f AS DOUBLE)
                   * (CAST(n1p AS DOUBLE) / CAST(n_types AS DOUBLE)),
                 6) AS p_kn
    FROM bg JOIN h USING (w1) JOIN t USING (w2) CROSS JOIN z
    ORDER BY n DESC, w1, w2 LIMIT 30
    """,
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed bigram probabilities — the canonical n-gram
    LM smoothing: P_KN(w2|w1) = max(c(w1,w2) - D, 0)/c(w1·)
    + (D/c(w1·)) · N1+(w1·) · Pcont(w2), with the continuation
    probability Pcont(w2) = N1+(·w2)/N1+(··) ranking words by how many
    DISTINCT contexts they follow (the "San Francisco" fix: 'Francisco'
    is frequent but occurs after one context only). Shown next to the
    MLE for the top-30 bigrams — the quality signal a surprisal-based
    corpus filter upgrades to when add-k is too blunt.

    Scale shape: all four statistics are groupBys over the one
    exploded bigram stream (map-side combinable; the bigram explode is
    the same narrow map text_bigram_counts uses); the type total is a
    1-row broadcast; every count stays integral until the one
    closed-form double expression, written operation-for-operation
    like the oracle."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.struct(F.lower(a).alias("w1"), F.lower(b).alias("w2")),
    )
    bg = (
        d.select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h = bg.groupBy("w1").agg(
        F.sum("n").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    t = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p"))
    z = bg.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    D = KN_DISCOUNT
    nd = F.col("n").cast("double")
    c1d = F.col("c1").cast("double")
    return (
        bg.join(h, "w1")
        .join(t, "w2")
        .crossJoin(F.broadcast(z))
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            "c1",
            "n1f",
            "n1p",
            F.round(nd / c1d, 6).alias("p_mle"),
            F.round(
                F.greatest(nd - D, F.lit(0.0)) / c1d
                + (F.lit(D) / c1d)
                * F.col("n1f").cast("double")
                * (
                    F.col("n1p").cast("double")
                    / F.col("n_types").cast("double")
                ),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(30)
    )


@register(
    "text_readability_flesch",
    oracle="""
    WITH per_doc AS (
        SELECT source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS words,
               GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                             AS BIGINT), 1) AS sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS syllables
        FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS words,
           CAST(SUM(sentences) AS BIGINT) AS sentences,
           CAST(SUM(syllables) AS BIGINT) AS syllables,
           round(206.835
                 - 1.015 * (CAST(SUM(words) AS DOUBLE)
                            / CAST(SUM(sentences) AS DOUBLE))
                 - 84.6 * (CAST(SUM(syllables) AS DOUBLE)
                           / CAST(SUM(words) AS DOUBLE)), 6) AS flesch
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: 206.835 - 1.015·(words/sentence)
    - 84.6·(syllables/word), with syllables approximated by vowel-group
    count (the standard cheap proxy) and sentence count floored at 1 —
    the readability axis of corpus quality scoring, complementing
    text_quality_score's length/punct/stopword gates (a quality filter
    often buckets by readability before sampling).

    Scale shape: all three counts are row-local regexp counts fused
    into the scan; the per-source roll-up is one map-side-combinable
    groupBy; the formula is applied once per source on exact integer
    sums, in oracle-identical operation order."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        token_count(F.col("text")).alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)).cast(
                "long"
            ),
            F.lit(1).cast("long"),
        ).alias("sentences"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
        )
        .cast("long")
        .alias("syllables"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").cast("long").alias("words"),
        F.sum("sentences").cast("long").alias("sentences"),
        F.sum("syllables").cast("long").alias("syllables"),
    )
    wd = F.col("words").cast("double")
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.round(
            F.lit(206.835)
            - 1.015 * (wd / F.col("sentences").cast("double"))
            - 84.6 * (F.col("syllables").cast("double") / wd),
            6,
        ).alias("flesch"),
    ).orderBy("source")


# Heavy-hitter threshold: report every token with frequency > n/HH_PHI.
# The pass-1 Misra-Gries capacity must exceed HH_PHI for the
# superset guarantee (undercount <= n/HH_CAP < n/HH_PHI).
HH_PHI = 200
HH_CAP = 400


@register(
    "topk_heavy_hitters_2pass",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_tok FROM tok)
    SELECT w, COUNT(*) AS cnt
    FROM tok
    GROUP BY w
    HAVING COUNT(*) * {HH_PHI} > (SELECT n_tok FROM n)
    ORDER BY cnt DESC, w
    """,
)
def topk_heavy_hitters_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT frequent-token mining (all tokens with count > n/200)
    via the two-pass Misra-Gries plan — the streaming-sketch answer to
    'what are the corpus's dominant tokens?' WITHOUT ever shuffling
    the full token stream on token:

    * pass 1: each partition folds its tokens through a Misra-Gries
      summary of capacity 400 (a dict of at most 400 counters; on
      overflow all counters decrement — the classic space-saving
      step). The merged candidate set PROVABLY contains every token
      with global count > n/400: if a token's count were <= n_p/400
      in every partition, its total would be <= n/400 (pigeonhole),
      and MG's per-partition undercount is bounded by n_p/400.
    * pass 2: exact counts for the <= 400*P candidate tokens only, via
      a broadcast semi-join + one map-side-combinable groupBy, then
      the true threshold (count*200 > n) filters false positives.

    The result is therefore EXACTLY the naive GROUP-BY-ALL-TOKENS
    answer (the oracle), but the only per-token shuffle is over the
    candidate subset — at 100 TB the difference between shuffling
    ~10^11 token rows and ~10^5 candidate rows. Pass 1 is an Arrow
    mapInPandas fold (per-partition state, no builtin equivalent);
    everything else is JVM-side.

    Reference tie-in: generalizes the reference's count aggregate
    (hashTable.cuh:157-163) to frequency mining."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))

    def mg_partition(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["w"]:
                c = counts.get(w)
                if c is not None:
                    counts[w] = c + 1
                elif len(counts) < HH_CAP:
                    counts[w] = 1
                else:
                    dead = []
                    for k in counts:
                        if counts[k] == 1:
                            dead.append(k)
                        else:
                            counts[k] -= 1
                    for k in dead:
                        del counts[k]
        yield pd.DataFrame({"w": list(counts.keys())})

    candidates = tok.mapInPandas(mg_partition, "w string").distinct()
    n_tok = tok.agg(F.count(F.lit(1)).alias("n_tok"))
    exact = (
        tok.join(F.broadcast(candidates), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_tok))
        .filter(F.col("cnt") * HH_PHI > F.col("n_tok"))
    )
    return exact.select("w", "cnt").orderBy(F.col("cnt").desc(), "w")


# PMI collocations: minimum bigram count to score (rare pairs have
# unstable PMI), and the report size.
PMI_MIN_COUNT = 5
PMI_TOP = 50


@register(
    "text_collocations_pmi",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
        FROM documents
    ),
    occ AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM words, UNNEST(range(1, len(w))) AS t(i)
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM occ GROUP BY 1, 2),
    lm AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1),
    rm AS (SELECT w2, SUM(c12) AS c2 FROM big GROUP BY 1),
    tot AS (SELECT SUM(c12) AS b FROM big)
    SELECT big.w1, big.w2, CAST(big.c12 AS BIGINT) AS c12,
           round(log2(CAST(big.c12 AS DOUBLE) * (SELECT b FROM tot)
                      / (CAST(lm.c1 AS DOUBLE) * rm.c2)), 6) AS pmi
    FROM big JOIN lm USING (w1) JOIN rm USING (w2)
    WHERE big.c12 >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2 LIMIT {PMI_TOP}
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the top
    bigrams whose observed count most exceeds the independence
    expectation of their marginals — PMI = log2(c12 * B / (c1 * c2))
    with a minimum-count support filter. THE classic phrase detector a
    tokenizer-training pipeline runs to decide merge candidates
    (complements text_bigram_surprisal's per-document scoring with a
    corpus-level vocabulary view).

    Scale shape: bigram occurrences explode once (narrow map); counts,
    the two marginals, and the total are partial-aggregating groupBys
    over the BIGRAM TABLE (vocabulary-sized, not corpus-sized); the
    scoring join fans in by vocabulary key and the support filter cuts
    the long tail before the top-k. The PMI ratio is one IEEE op tree
    on exact integer counts — both engines hash-match."""
    d = load_table(spark, sf_dir, "documents")
    occ = (
        d.select(F.split(F.trim(F.lower("text")), " ").alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    big = (
        occ.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .transform(materialize)
    )
    lm = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    rm = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = big.agg(F.sum("c12").alias("b"))
    return (
        big.filter(F.col("c12") >= PMI_MIN_COUNT)
        .join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(
                F.log2(
                    F.col("c12").cast("double") * F.col("b")
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOP)
    )


@register(
    "text_js_divergence",
    oracle="""
    WITH tok AS (
        SELECT CAST(substr(source, 4) AS INTEGER) % 2 = 0 AS grp_a,
               unnest(string_split(trim(lower(text)), ' ')) AS w
        FROM documents
    ),
    counts AS (
        SELECT w,
               SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN grp_a THEN 0 ELSE 1 END) AS cb
        FROM tok GROUP BY w
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM counts),
    terms AS (
        SELECT CAST(ca AS DOUBLE) / (SELECT na FROM tot) AS p,
               CAST(cb AS DOUBLE) / (SELECT nb FROM tot) AS q
        FROM counts
    ),
    folded AS (
        SELECT COUNT(*) AS vocab_union,
               CAST(CAST(SUM(CAST(round(CASE WHEN p > 0 THEN
                              p * log2(p / ((p + q) / 2)) ELSE 0 END, 12)
                          AS DECIMAL(27,18))) AS VARCHAR) AS DOUBLE) AS sp,
               CAST(CAST(SUM(CAST(round(CASE WHEN q > 0 THEN
                              q * log2(q / ((p + q) / 2)) ELSE 0 END, 12)
                          AS DECIMAL(27,18))) AS VARCHAR) AS DOUBLE) AS sq
        FROM terms
    )
    SELECT CAST(vocab_union AS BIGINT) AS vocab_union,
           CAST((SELECT na FROM tot) AS BIGINT) AS n_tokens_a,
           CAST((SELECT nb FROM tot) AS BIGINT) AS n_tokens_b,
           round(0.5 * sp + 0.5 * sq, 6) AS js_divergence
    FROM folded
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    two source cohorts (even- vs odd-numbered sources) — the symmetric,
    bounded [0,1]-bit corpus-drift metric a data-mixing pipeline
    watches when a new crawl snapshot lands (complements
    dq_distribution_drift_psi's binned-numeric PSI with a
    full-vocabulary distributional distance).

    Scale shape: one token explode, ONE groupBy(word) carrying both
    cohort counts as conditional sums (no join between cohorts), and a
    scalar fold — wordcount topology end to end. Per-word JSD terms
    round at 12dp and accumulate exactly in DECIMAL(27,18) (terms are
    <= p <= 1, so 15 significant digits — inside the cross-engine
    double->DECIMAL exactness bound); the two exact sums convert once
    via the correctly-rounded VARCHAR hop. Zero-count words contribute
    exactly 0 to their cohort's sum by construction (0*log term
    guarded), matching the JSD convention."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        (F.substring("source", 4, 10).cast("int") % 2 == 0).alias("grp_a"),
        F.explode(F.split(F.trim(F.lower("text")), " ")).alias("w"),
    )
    counts = tok.groupBy("w").agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp_a"), 0).otherwise(1)).alias("cb"),
    )
    tot = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    terms = counts.crossJoin(F.broadcast(tot)).select(
        (F.col("ca").cast("double") / F.col("na")).alias("p"),
        (F.col("cb").cast("double") / F.col("nb")).alias("q"),
        "na",
        "nb",
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_union"),
        F.expr(
            "CAST(CAST(SUM(CAST(round(CASE WHEN p > 0 THEN"
            " p * log2(p / ((p + q) / 2)) ELSE 0 END, 12)"
            " AS DECIMAL(27,18))) AS STRING) AS DOUBLE)"
        ).alias("sp"),
        F.expr(
            "CAST(CAST(SUM(CAST(round(CASE WHEN q > 0 THEN"
            " q * log2(q / ((p + q) / 2)) ELSE 0 END, 12)"
            " AS DECIMAL(27,18))) AS STRING) AS DOUBLE)"
        ).alias("sq"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return folded.select(
        "vocab_union",
        F.col("na").cast("long").alias("n_tokens_a"),
        F.col("nb").cast("long").alias("n_tokens_b"),
        F.round(F.expr("0.5 * sp + 0.5 * sq"), 6).alias("js_divergence"),
    )


# Burstiness: minimum corpus frequency to score (rare words have
# degenerate variance-to-mean), and the report size.
BURST_MIN_TOTAL = 50
BURST_TOP = 30


@register(
    "text_burstiness",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS w
        FROM documents
    ),
    per_doc AS (
        SELECT w, doc_id, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    per_word AS (
        SELECT w, COUNT(*) AS df,
               SUM(c) AS tot,
               SUM(c * c) AS s2
        FROM per_doc GROUP BY w
    )
    SELECT w, CAST(df AS BIGINT) AS doc_freq,
           CAST(tot AS BIGINT) AS total_count,
           round(CAST(s2 AS DOUBLE) / tot
                 - CAST(tot AS DOUBLE) / (SELECT n_docs FROM nd), 6)
               AS burstiness
    FROM per_word WHERE tot >= {BURST_MIN_TOTAL}
    ORDER BY burstiness DESC, w LIMIT {BURST_TOP}
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness of corpus vocabulary: the
    variance-to-mean ratio of a word's per-document count (documents
    without the word counted as zeros, handled algebraically) —
    topical content words occur in BURSTS (VMR >> their frequency
    predicts) while function words spread evenly; the signal a
    keyword/stopword splitter and a dedup shingle-picker both want.
    VMR reduces to s2/tot - tot/N via the zero-inclusive population
    identity, so absent documents are never materialized.

    Scale shape: one token explode, one (word, doc) groupBy, one word
    groupBy — wordcount topology, all partial-aggregating; the
    support filter cuts the tail before the top-k. Counts are exact
    integers; the two final divisions are identical IEEE op trees."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), " ")).alias("w")
    )
    per_doc = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    per_word = per_doc.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("tot"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    return (
        per_word.filter(F.col("tot") >= BURST_MIN_TOTAL)
        .crossJoin(F.broadcast(nd))
        .select(
            "w",
            F.col("df").cast("long").alias("doc_freq"),
            F.col("tot").cast("long").alias("total_count"),
            F.round(
                F.col("s2").cast("double") / F.col("tot")
                - F.col("tot").cast("double") / F.col("n_docs"),
                6,
            ).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), "w")
        .limit(BURST_TOP)
    )


@register(
    "text_langid_confusion",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(string_split(' ' || text || ' ', ' the ')) - 1
                 + len(string_split(' ' || text || ' ', ' a ')) - 1
                 + len(string_split(' ' || text || ' ', ' and ')) - 1 AS s_en,
               len(string_split(' ' || text || ' ', ' der ')) - 1
                 + len(string_split(' ' || text || ' ', ' und ')) - 1
                 + len(string_split(' ' || text || ' ', ' die ')) - 1 AS s_de,
               len(string_split(' ' || text || ' ', ' le ')) - 1
                 + len(string_split(' ' || text || ' ', ' la ')) - 1
                 + len(string_split(' ' || text || ' ', ' et ')) - 1 AS s_fr
        FROM documents
    ),
    pred AS (
        SELECT lang AS actual,
               CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS predicted
        FROM scored
    ),
    cells AS (
        SELECT actual, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2
    )
    SELECT actual, predicted, CAST(n AS BIGINT) AS n,
           CAST((2 * CAST(n AS HUGEINT) * 1000000
                 + SUM(n) OVER (PARTITION BY actual))
                // (2 * SUM(n) OVER (PARTITION BY actual))
                AS DOUBLE) / 1000000.0 AS share_of_actual
    FROM cells ORDER BY actual, predicted
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix over the WHOLE corpus: the
    stopword-score classifier text_lang_id demonstrates per-document,
    evaluated against the ground-truth lang label — (actual,
    predicted, count, row-share). The accuracy census a pipeline
    checks before trusting the cheap classifier to route documents at
    100 TB (per-class recall sits on the diagonal).

    Scale shape: scan-fused per-document scoring (string arithmetic,
    no explode), ONE groupBy to <= |langs|^2 cells, and a
    row-normalizing window over that tiny table. Counts are exact
    integers; shares are exact half-up micro-unit quotients."""
    d = load_table(spark, sf_dir, "documents")

    def score(words: list[str]) -> Column:
        s = word_hits(F.col("text"), words[0])
        for w in words[1:]:
            s = s + word_hits(F.col("text"), w)
        return s

    scored = d.select(
        F.col("lang").alias("actual"),
        score(LANG_MARKERS["en"]).alias("s_en"),
        score(LANG_MARKERS["de"]).alias("s_de"),
        score(LANG_MARKERS["fr"]).alias("s_fr"),
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when(F.col("s_de") >= F.col("s_fr"), "de")
        .otherwise("fr")
    )
    cells = scored.select("actual", pred.alias("predicted")).groupBy(
        "actual", "predicted"
    ).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    wrow = W.partitionBy("actual")
    return cells.select(
        "actual",
        "predicted",
        F.col("n").cast("long").alias("n"),
        (
            F.expr(
                "(2 * CAST(n AS DECIMAL(38,0)) * 1000000"
                " + SUM(n) OVER (PARTITION BY actual))"
                " div (2 * SUM(n) OVER (PARTITION BY actual))"
            ).cast("double")
            / 1000000.0
        ).alias("share_of_actual"),
    ).orderBy("actual", "predicted")


@register(
    "text_heaps_law",
    oracle="""
    WITH t AS (
        SELECT doc_id, w FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        ) WHERE w <> ''
    ),
    per AS (
        SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT w) AS v
        FROM t GROUP BY doc_id
    ),
    m AS (
        SELECT COUNT(*) AS d,
               CAST(SUM(CAST(ln(n) AS DECIMAL(27,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ln(v) AS DECIMAL(27,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(ln(n) * ln(v) AS DECIMAL(27,6))) AS DOUBLE)
                   AS sxy,
               CAST(SUM(CAST(ln(n) * ln(n) AS DECIMAL(27,6))) AS DOUBLE)
                   AS sxx,
               CAST(SUM(CAST(ln(v) * ln(v) AS DECIMAL(27,6))) AS DOUBLE)
                   AS syy
        FROM per WHERE n > 0 AND v > 0
    )
    SELECT CAST(d AS BIGINT) AS n_docs,
           round((d * sxy - sx * sy) / (d * sxx - sx * sx), 6) AS heaps_beta,
           round(exp((sy - (d * sxy - sx * sy) / (d * sxx - sx * sx) * sx)
                     / d), 6) AS heaps_k,
           round((d * sxy - sx * sy) * (d * sxy - sx * sy)
                 / ((d * sxx - sx * sx) * (d * syy - sy * sy)), 6) AS r2
    FROM m
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: OLS of log(distinct
    types) against log(total tokens) across documents — V = K * n^B
    with B ~ 0.4-0.6 for natural language. A corpus whose beta drifts
    high is vocabulary-exploding (OCR noise, serial numbers); too low
    means template/boilerplate text — the vocabulary-side twin of
    text_zipf_fit's frequency-side audit.

    Scale shape: tokens collapse per document in ONE explode +
    two-level groupBy (count + distinct-count per doc — each doc's
    types live under its own key, never a global vocabulary
    shuffle); the log-log OLS fold then runs over |docs| rows of six
    DECIMAL(27,6)-exact moments, closed-form slope/intercept/r2 with
    oracle-identical op order."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "")
    per = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("w").alias("v"),
    ).filter((F.col("n") > 0) & (F.col("v") > 0))
    lx = F.log(F.col("n").cast("double"))
    ly = F.log(F.col("v").cast("double"))
    dec = "decimal(27,6)"
    m = per.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(lx.cast(dec)).cast("double").alias("sx"),
        F.sum(ly.cast(dec)).cast("double").alias("sy"),
        F.sum((lx * ly).cast(dec)).cast("double").alias("sxy"),
        F.sum((lx * lx).cast(dec)).cast("double").alias("sxx"),
        F.sum((ly * ly).cast(dec)).cast("double").alias("syy"),
    )
    slope = "(d * sxy - sx * sy) / (d * sxx - sx * sx)"
    return m.select(
        F.col("d").cast("long").alias("n_docs"),
        F.round(F.expr(slope), 6).alias("heaps_beta"),
        F.round(
            F.expr(f"exp((sy - {slope} * sx) / d)"), 6
        ).alias("heaps_k"),
        F.round(
            F.expr(
                "(d * sxy - sx * sy) * (d * sxy - sx * sy)"
                " / ((d * sxx - sx * sx) * (d * syy - sy * sy))"
            ),
            6,
        ).alias("r2"),
    )


@register(
    "text_perplexity_eval",
    oracle=f"""
    WITH words AS (
        SELECT lang, string_split(trim(text), ' ') AS w FROM documents
    ),
    pairs AS (
        SELECT lang, w, unnest(range(1, len(w))) AS i FROM words
    ),
    ev AS (
        SELECT lang, lower(w[i]) AS w1, lower(w[i + 1]) AS w2,
               COUNT(*) AS n
        FROM pairs GROUP BY 1, 2, 3
    ),
    bg AS (
        SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2
    ),
    h AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c1,
                 CAST(COUNT(*) AS BIGINT) AS n1f
          FROM bg GROUP BY w1),
    t AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p FROM bg GROUP BY w2),
    z AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM bg),
    model AS (
        SELECT bg.w1, bg.w2,
               GREATEST(CAST(bg.n AS DOUBLE) - {{D}}, 0.0)
                   / CAST(c1 AS DOUBLE)
               + ({{D}} / CAST(c1 AS DOUBLE))
                 * CAST(n1f AS DOUBLE)
                 * (CAST(n1p AS DOUBLE) / CAST(n_types AS DOUBLE)) AS p
        FROM bg JOIN h USING (w1) JOIN t USING (w2) CROSS JOIN z
    ),
    scored AS (
        SELECT ev.lang, ev.n, ln(model.p) AS lp
        FROM ev JOIN model ON ev.w1 = model.w1 AND ev.w2 = model.w2
    ),
    agg AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS n_bigrams,
               CAST(CAST(SUM(CAST(n * lp AS DECIMAL(27,6))) AS VARCHAR)
                    AS DOUBLE) AS s
        FROM scored GROUP BY lang
    )
    SELECT lang, n_bigrams,
           round(-s / n_bigrams, 6) AS avg_nll,
           round(exp(-s / n_bigrams), 6) AS perplexity
    FROM agg ORDER BY lang
    """.replace("{D}", str(KN_DISCOUNT)),
)
def text_perplexity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus self-perplexity per language under the global
    Kneser-Ney bigram model (the text_kneser_ney_bigram model,
    evaluated instead of inspected): PP = exp(-1/N * Sigma n *
    ln P_KN(w2|w1)) over each language's bigram tokens. The standard
    corpus-health number an LM-data pipeline tracks per slice — a
    language slice whose perplexity under the corpus-wide model is an
    outlier is under-represented or contaminated. Self-evaluation
    keeps the query closed (no held-out split) while exercising the
    full train+score join topology.

    Scale shape: ONE exploded bigram pass collapses the corpus to
    per-(lang, bigram) counts; the global model derives from the
    lang-marginalized bigram table (groupBy-shaped, vocabulary-
    bounded outputs); scoring is an equi-join on the bigram key; the
    fold keeps n * ln(p) terms in 6dp exact decimal (p is an
    identical double in both engines — pure integer-ratio op trees —
    so ln(p) matches bit-for-bit, the entropy precedent) and
    converts once through the string hop."""
    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        "lang", F.split(F.trim(F.col("text")), " ").alias("w")
    ).filter(
        # A <2-token doc has no bigrams: without this guard
        # sequence(1, size-1) = sequence(1, 0) = [1, 0] (DESCENDING in
        # Spark, not empty) and w[i] faults under ANSI mode, where the
        # oracle's range(1, len) is simply empty — filter to match
        # (same guard as text_bigram_surprisal / PMI).
        F.size("w") >= 2
    ).select(
        "lang",
        F.expr(
            "explode(transform(sequence(1, size(w) - 1),"
            " i -> struct(lower(w[i - 1]) AS w1, lower(w[i]) AS w2)))"
        ).alias("bg"),
    ).select("lang", "bg.w1", "bg.w2")
    ev = pairs.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    ev = materialize(ev)
    bg = ev.groupBy("w1", "w2").agg(F.sum("n").cast("long").alias("n"))
    bg = materialize(bg)
    h = bg.groupBy("w1").agg(
        F.sum("n").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    t = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p"))
    z = bg.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    model = (
        bg.join(h, "w1")
        .join(t, "w2")
        .crossJoin(F.broadcast(z))
        .select(
            "w1", "w2",
            F.expr(
                f"GREATEST(CAST(n AS DOUBLE) - {KN_DISCOUNT}, 0.0)"
                " / CAST(c1 AS DOUBLE)"
                f" + ({KN_DISCOUNT} / CAST(c1 AS DOUBLE))"
                " * CAST(n1f AS DOUBLE)"
                " * (CAST(n1p AS DOUBLE) / CAST(n_types AS DOUBLE))"
            ).alias("p"),
        )
    )
    scored = ev.join(model, ["w1", "w2"]).select(
        "lang", "n", F.log("p").alias("lp")
    )
    agg = scored.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.expr(
            "CAST(CAST(SUM(CAST(n * lp AS DECIMAL(27,6))) AS STRING)"
            " AS DOUBLE)"
        ).alias("s"),
    )
    return agg.select(
        "lang",
        "n_bigrams",
        F.round(F.expr("-s / n_bigrams"), 6).alias("avg_nll"),
        F.round(F.expr("exp(-s / n_bigrams)"), 6).alias("perplexity"),
    ).orderBy("lang")


BPE_ROUNDS = 8  # learned merge-table depth (fixed, deterministic)


@register("text_bpe_train_merges", oracle=None)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a byte-pair-encoding merge table: BPE_ROUNDS greedy
    merge rounds over the corpus vocabulary at the character level —
    the actual tokenizer-training loop, where text_bpe_merge_step
    shows only the first round's candidates. Each round counts
    adjacent symbol pairs weighted by word frequency, adopts the most
    frequent pair (ties to the lexicographically smallest — fully
    deterministic), and rewrites every word's symbol sequence with
    the standard greedy left-to-right non-overlapping application.
    Returns the learned table: (merge_rank, left, right, merged,
    pair_count).

    No SQL oracle BY NATURE (iterative argmax + rewrite);
    tests/test_round10_ops.py replays a pure-Python reference BPE
    trainer on the same word frequencies and asserts the merge table
    matches exactly — the rows-only family's serial-replica gate.

    Scale shape: the corpus collapses ONCE to the vocabulary-sized
    (word, freq) table; every round then explodes adjacent pairs of
    the CURRENT symbol arrays (vocabulary-sized, shrinking), one
    map-side-combinable groupBy finds the winner, a 1-row collect
    promotes it to the driver (a model parameter, not a data path),
    and the rewrite is a JVM-side aggregate() lambda — no Python in
    the loop. The per-round rewrite is checkpointed to truncate the
    K-deep lineage (the pagerank discipline). At web scale the only
    change is sampling the vocabulary tail, which real BPE trainers
    do too."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .filter(F.length("word").between(2, 20))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1))"
            ).alias("syms"),
            "freq",
        )
    )
    words = materialize(words)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, BPE_ROUNDS + 1):
        pairs = (
            # Words collapsed to a single symbol by an adopted merge
            # (e.g. merging ('h','e') turns the word 'he' into ['he'])
            # have no adjacent pairs; without this guard
            # sequence(1, 0) = [1, 0] (descending) and syms[i] faults
            # under ANSI. The rewrite stage below is index-free and
            # safe for 1-symbol words.
            words.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, int(top[0].cnt)
        merged = l + r
        merges.append((rank, l, r, merged, cnt))
        words = words.select(
            F.expr(
                "aggregate(syms, CAST(array() AS array<string>),"
                " (acc, s) -> CASE WHEN size(acc) > 0"
                f" AND element_at(acc, -1) = '{l}' AND s = '{r}'"
                " THEN concat(slice(acc, 1, size(acc) - 1),"
                f" array('{merged}'))"
                " ELSE concat(acc, array(s)) END)"
            ).alias("syms"),
            "freq",
        )
        words = materialize(words, force_checkpoint=True)
    return spark.createDataFrame(
        merges,
        "merge_rank long, left string, right string,"
        " merged string, pair_count long",
    ).orderBy("merge_rank")
