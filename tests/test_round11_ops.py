"""Round-11 regression tests: the r10 ADVICE edge cases.

1. text_perplexity_eval on a corpus containing a ONE-WORD document:
   sequence(1, size(w)-1) = sequence(1, 0) = [1, 0] (descending, not
   empty) so w[1] faulted with INVALID_ARRAY_INDEX under the ANSI
   default before the size(w) >= 2 guard. The oracle's range(1, len)
   is simply empty, so the guarded query must still hash-match.
2. text_bpe_train_merges where an adopted merge collapses an entire
   2-letter word to a single symbol: the next round's pair explode
   hit the same unguarded sequence(1, 0) fault. The guarded trainer
   must keep matching the pure-Python reference round for round.
"""

from __future__ import annotations

import os


def _write_docs(spark, tmp_path, texts, langs=None):
    """Write a minimal documents.parquet into a throwaway sf_dir."""
    sf_dir = str(tmp_path)
    langs = langs or ["en"] * len(texts)
    rows = [
        (i + 1, t, lg, "web", len(t))
        for i, (t, lg) in enumerate(zip(texts, langs))
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string,"
        " source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    return sf_dir


def test_perplexity_eval_one_word_doc_no_ansi_fault(spark, tmp_path):
    """A single-token document must contribute zero bigrams (not an
    INVALID_ARRAY_INDEX crash) and the result must still match the
    DuckDB oracle, whose range(1, len(w)) is empty for that doc."""
    import duckdb

    from gpu_database_spark import registry
    from gpu_database_spark.llm.textstats import text_perplexity_eval
    from tests.oracle_utils import assert_query_matches_oracle

    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            "the cat sat on the mat",
            "the dog sat on the rug",
            "solo",  # one token: previously crashed under ANSI
            "le chat dort",
            "chien",  # one token in the second language slice
        ],
        langs=["en", "en", "en", "fr", "fr"],
    )
    df = text_perplexity_eval(spark, sf_dir)
    got = df.collect()
    assert {r.lang for r in got} == {"en", "fr"}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'documents.parquet')}/*.parquet')"
    )
    sql = registry.oracle_sql()["text_perplexity_eval"]
    assert_query_matches_oracle(df, con, sql, name="perplexity_one_word")
    con.close()


def test_perplexity_eval_all_docs_single_word(spark, tmp_path):
    """Degenerate corpus: EVERY doc is one token -> zero bigrams
    anywhere -> both engines return zero rows, no crash."""
    from gpu_database_spark.llm.textstats import text_perplexity_eval

    sf_dir = _write_docs(spark, tmp_path, ["alpha", "beta", "gamma"])
    df = text_perplexity_eval(spark, sf_dir)
    assert df.count() == 0
    assert df.columns == ["lang", "n_bigrams", "avg_nll", "perplexity"]


def _python_bpe(word_freqs, rounds):
    """Pure-Python reference trainer (same as test_round10_ops)."""
    syms = {w: list(w) for w in word_freqs}
    expected = []
    for rank in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for w, s in syms.items():
            f = word_freqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, l, r, l + r, cnt))
        for w, s in syms.items():
            out = []
            for tok in s:
                if out and out[-1] == l and tok == r:
                    out[-1] = l + r
                else:
                    out.append(tok)
            syms[w] = out
    return expected


def test_bpe_train_survives_word_collapse(spark, tmp_path):
    """'he' dominates, so round 1 adopts ('h','e') and the word 'he'
    collapses to a single symbol ['he']. Round 2's pair explode must
    skip it (previously: INVALID_ARRAY_INDEX under ANSI) and the full
    merge table must still match the pure-Python trainer."""
    from gpu_database_spark.llm.textstats import (
        BPE_ROUNDS,
        text_bpe_train_merges,
    )

    # 'he' appears 50x -> ('h','e') wins round 1 and 'he' collapses;
    # 'hello'/'help' keep enough pair mass for later rounds.
    texts = [" ".join(["he"] * 50), "hello hello help", "shell shelter"]
    sf_dir = _write_docs(spark, tmp_path, texts)
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            if 2 <= len(w) <= 20:
                freqs[w] = freqs.get(w, 0) + 1
    expected = _python_bpe(freqs, BPE_ROUNDS)
    assert expected[0][1:4] == ("h", "e", "he")  # fixture is on-point
    got = [tuple(x) for x in text_bpe_train_merges(spark, sf_dir).collect()]
    assert got == expected, (got, expected)


def test_er_fuzzy_match_still_green(spark, sf_dir):
    """Smoke after the w_prefix rename in er_fuzzy_match (ADVICE low):
    the query still runs and keeps its ordering contract."""
    from gpu_database_spark.operators.maintenance import er_fuzzy_match

    rows = er_fuzzy_match(spark, sf_dir).collect()
    assert all(r.key_a < r.key_b for r in rows)
    assert rows == sorted(
        rows, key=lambda r: (r.block_key, r.key_a, r.key_b)
    )
