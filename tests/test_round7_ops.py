"""Round-7 regression tests (ADVICE r6 + new surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_materialize_modes_and_release(spark, monkeypatch):
    """materialize() must single-execute in both modes, and
    release_all() must free the pinned blocks (checkpoint RDDs are
    invisible to catalog.clearCache — ADVICE r6 leak)."""
    from gpu_database_spark.functions.materialize import materialize, release_all

    release_all(spark)
    df = materialize(spark.range(100).selectExpr("id", "id * 2 AS v"))
    assert df.count() == 100
    assert spark.sparkContext._jsc.getPersistentRDDs().size() >= 1
    assert release_all(spark) >= 1
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    df2 = materialize(spark.range(50))
    assert df2.count() == 50
    assert df2.storageLevel.useMemory or df2.storageLevel.useDisk
    # persist mode keeps lineage: still recomputable after release
    assert release_all(spark) >= 1
    assert df2.count() == 50


def test_bigram_surprisal_survives_short_docs(spark, tmp_path):
    """ADVICE r6 (medium): a <2-token document used to make
    sequence(1, size-1) = [1, 0] (descending, NOT empty) and fault
    under ANSI mode with INVALID_ARRAY_INDEX — while the DuckDB
    oracle's range(1, len) is empty there, a semantic divergence.
    The guard filter must drop such docs before the explode."""
    from gpu_database_spark.llm.textstats import text_bigram_surprisal

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (0, "word", "en", "web", 4),
            (1, "", "en", "web", 0),
            (2, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
            (3, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = text_bigram_surprisal(spark, sf).collect()
    assert rows, "multi-token docs must still score"
    assert {r.doc_id for r in rows} <= {2, 3}, "short docs must be dropped"


def test_session_caches_survive_release_all(spark, sf_dir):
    """Queries with per-session caches (bootstrap wide plan, PQ
    codebook) must stay usable after materialize.release_all(), which
    bench/parity harnesses call between queries — a cached
    lineage-truncated checkpoint would strand
    (CHECKPOINT_BLOCK_NOT_FOUND, the bug this pins)."""
    from gpu_database_spark.functions.materialize import release_all
    from gpu_database_spark.llm.similarity import sim_ann_pq
    from gpu_database_spark.operators.stattests import stat_bootstrap_ci

    r1 = sim_ann_pq(spark, sf_dir).count()
    b1 = stat_bootstrap_ci(spark, sf_dir).collect()
    release_all(spark)
    assert sim_ann_pq(spark, sf_dir).count() == r1
    assert stat_bootstrap_ci(spark, sf_dir).collect() == b1
