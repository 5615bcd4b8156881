"""tools/make_sf1.py --llm-distinct: the constant-density guarantees.

The llm scale fixtures exist to measure the near-dup family's VOLUME
scaling, which only works if the replication preserves each copy's
internal duplicate structure while making copies mutually dissimilar.
These tests pin both halves on tiny in-memory frames (DuckDB only —
no Spark, no fixture files), so a future edit to the projections
can't silently reintroduce the K^2 pair blowup the fixtures were
built to remove (the ' vK' suffix variant measured 673x pair
expansions for 10x rows because suffix-only tags leave most word
3-gram minhashes unchanged).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from make_sf1 import LLM_DISTINCT  # noqa: E402

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "an entirely different document about spark engines"),
    (4, "single"),  # degenerate: no space, tag cannot attach
]


def _copies(n_copies: int):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', 'en', 's', {len(t)})" for i, t in DOCS)
        + ") t(doc_id, text, lang, source, n_chars)"
    )
    proj = LLM_DISTINCT["documents"]
    return con, con.execute(
        f"SELECT {proj} FROM src, range({n_copies}) r(k) ORDER BY doc_id"
    ).fetchall()


def _shingles(text: str, width: int = 3) -> set[str]:
    w = text.split()
    if len(w) < width:
        return {text}
    return {" ".join(w[i : i + width]) for i in range(len(w) - width + 1)}


def test_documents_within_copy_structure_preserved():
    con, rows = _copies(3)
    by_copy: dict[int, dict[int, str]] = {}
    for doc_id, text, lang, source, n_chars in rows:
        k, base = divmod(doc_id, 10_000) if doc_id >= 10_000 else (0, doc_id)
        by_copy.setdefault(k, {})[base] = text
        assert n_chars == len(text), "n_chars invariant broken"
    for k, docs in by_copy.items():
        # exact dups stay exact dups within every copy
        assert docs[1] == docs[2], f"copy {k}: exact dup pair broken"
        # distinct docs stay shingle-disjoint within every copy
        assert not (_shingles(docs[1]) & _shingles(docs[3]))


def test_documents_cross_copy_shingles_disjoint():
    con, rows = _copies(3)
    texts: dict[tuple[int, int], str] = {}
    for doc_id, text, *_ in rows:
        k, base = divmod(doc_id, 10_000) if doc_id >= 10_000 else (0, doc_id)
        texts[(k, base)] = text
    for base in (1, 3):
        for ka in range(3):
            for kb in range(ka + 1, 3):
                shared = _shingles(texts[(ka, base)]) & _shingles(
                    texts[(kb, base)]
                )
                assert not shared, (
                    f"doc {base}: copies {ka}/{kb} share shingles {shared}"
                )
    # the documented degenerate case: a spaceless doc cannot take a
    # tag and stays an exact clone across copies (bounded: one bucket
    # of size n_copies, not a density change)
    assert texts[(0, 4)] == texts[(1, 4)] == "single"


def test_embeddings_signflip_is_orthogonal_and_dissimilar():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT "
        "CAST(v AS BIGINT) AS vec_id, "
        "list_transform(range(64), i -> CAST(sin(v * 17 + i) AS FLOAT)) "
        "  AS embedding, "
        "CAST(v % 3 AS INT) AS label "
        "FROM range(1, 5) t(v)"
    )
    proj = LLM_DISTINCT["embeddings"]
    con.execute(
        f"CREATE TABLE out AS SELECT {proj} FROM src, range(3) r(k)"
    )

    def cos(a: int, b: int) -> float:
        return con.execute(
            "SELECT list_cosine_similarity(x.embedding, y.embedding) "
            "FROM out x, out y WHERE x.vec_id = ? AND y.vec_id = ?",
            [a, b],
        ).fetchone()[0]

    base = cos(1, 2)
    # within-copy geometry exactly preserved (orthogonal transform)
    for k in (1, 2):
        assert cos(1 + 10_000 * k, 2 + 10_000 * k) == pytest.approx(
            base, abs=1e-6
        )
    # cross-copy: same vector's copies are NOT near-dups
    for k in (1, 2):
        assert abs(cos(1, 1 + 10_000 * k)) < 0.7
    # copy 0 is the identity
    r = con.execute(
        "SELECT x.embedding = y.embedding FROM out x, src y "
        "WHERE x.vec_id = 1 AND y.vec_id = 1"
    ).fetchone()[0]
    assert r is True
