"""Round-8 regression tests (ADVICE r7 + new surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_release_all_spares_unowned_caches(spark):
    """ADVICE r7 (low): release_all() used to unpersist EVERY
    persistent RDD, including application caches it did not create
    (once caused CHECKPOINT_BLOCK_NOT_FOUND on an operator's internal
    cache). It must now release only materialize()-owned blocks."""
    from gpu_database_spark.functions.materialize import materialize, release_all

    release_all(spark)
    foreign = spark.range(10).cache()
    foreign.count()
    owned = materialize(spark.range(20).selectExpr("id", "id * 3 AS v"))
    assert owned.count() == 20
    n = release_all(spark)
    assert n >= 1
    # the foreign cache must still be persisted and usable
    assert foreign.storageLevel.useMemory or foreign.storageLevel.useDisk
    assert foreign.count() == 10
    foreign.unpersist()


def test_force_checkpoint_ignores_persist_mode(spark, monkeypatch):
    """ADVICE r7 (medium): loop-carried state (connected components,
    BFS) must ALWAYS localCheckpoint — in persist mode the
    self-referencing plan would regrow every round. force_checkpoint
    must cut lineage even when SPARK_GRAFT_MATERIALIZE=persist."""
    from gpu_database_spark.functions.materialize import materialize

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    df = materialize(spark.range(30), force_checkpoint=True)
    assert df.count() == 30
    # a checkpointed plan has no upstream lineage: its logical plan is
    # a bare scan of the checkpoint RDD, not the original Range
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan, plan


def test_connected_components_loop_state_checkpoints_in_persist_mode(
    spark, monkeypatch
):
    """End-to-end: connected_components converges and stays cheap in
    persist mode (loop state force-checkpointed per round)."""
    from gpu_database_spark.llm.dedup import connected_components

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    nodes = spark.range(8).select(F.col("id"))
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 6)], "a long, b long"
    )
    out = {
        (r.id, r.component)
        for r in connected_components(nodes, edges).collect()
    }
    assert out == {
        (0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5), (6, 5), (7, 7),
    }


def test_psi_bin_uses_floor_semantics(spark):
    """ADVICE r7 (low): the PSI bin must use FLOOR (matches the oracle
    and survives signed metrics), not cast-truncation toward zero."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(x=-1.5), Row(x=1.5)])
    out = df.select(
        F.least(F.floor(F.col("x") / 1).cast("long"), F.lit(9)).alias("bin")
    ).collect()
    assert [r.bin for r in out] == [-2, 1]


def test_stream_soak_census_drops_late_keeps_on_time(spark, sf_dir):
    """The true-streaming drop census (VERDICT r7 ask #6): every
    on-time window count must match the batch expectation exactly
    (delta == 0 everywhere), which simultaneously proves the 400
    late replays were dropped by the watermark."""
    from gpu_database_spark.streaming.batch_equiv import stream_soak_census

    rows = stream_soak_census(spark, sf_dir).collect()
    assert rows, "census must produce windows"
    assert all(r.delta == 0 for r in rows)
    assert sum(r.n_streamed for r in rows) == sum(r.n_on_time for r in rows)


def test_aria_epoch_loop_census_runs_distributed(spark, sf_dir):
    """aria_epoch_loop_census must exercise run_batch's DISTRIBUTED
    path (local_threshold=0) and converge in a bounded epoch count."""
    from gpu_database_spark.operators.aria_queries import aria_epoch_loop_census

    rows = aria_epoch_loop_census(spark, sf_dir).collect()
    assert len(rows) == 1009
    epochs = {r.epochs for r in rows}
    assert len(epochs) == 1 and 1 <= epochs.pop() <= 20
    assert all(len(r.value) == 32 for r in rows)


def test_qualify_topn_uses_window_group_limit(spark, sf_dir):
    """sql_qualify_topn's rank<=k filter must become a per-partition
    partial top-k (WindowGroupLimit), never a full sort of each
    priority group."""
    from gpu_database_spark.operators.sql_surface import sql_qualify_topn
    from gpu_database_spark.plans import inspect

    plan = inspect.simple_plan(sql_qualify_topn(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_heavy_hitters_candidates_bounded_and_exact(spark, sf_dir):
    """Pass-1 Misra-Gries must emit at most HH_CAP candidates per
    partition, and the 2-pass result must equal the naive
    group-by-all-tokens answer (the superset guarantee makes the
    sketch EXACT after the second pass)."""
    from pyspark.sql import functions as F

    from gpu_database_spark.llm.textstats import (
        HH_CAP,
        HH_PHI,
        topk_heavy_hitters_2pass,
    )
    from gpu_database_spark.sources.catalog import load_table

    got = {
        (r["w"], r["cnt"])
        for r in topk_heavy_hitters_2pass(spark, sf_dir).collect()
    }
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    n = tok.count()
    naive = {
        (r["w"], r["cnt"])
        for r in tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * HH_PHI > n)
        .collect()
    }
    assert got == naive
    assert HH_CAP > HH_PHI  # the superset guarantee's precondition


def test_ndcg_rank_windows_are_bucketed(spark, sf_dir):
    """Both NDCG rankings (by score, by relevance) must go through the
    bucketed rank plan — no unbucketed global row_number window."""
    from gpu_database_spark.llm.features import ml_eval_ndcg
    from gpu_database_spark.plans import inspect

    plan = inspect.simple_plan(ml_eval_ndcg(spark, sf_dir))
    rn_lines = [ln for ln in plan.splitlines() if "row_number()" in ln]
    assert rn_lines, plan
    for ln in rn_lines:
        assert "_rk_bkt" in ln, f"unbucketed global rank window: {ln}"


def test_kruskal_wallis_windows_only_the_histogram(spark, sf_dir):
    """The KW rank window must run over the value HISTOGRAM (<= 50
    rows), i.e. AFTER the groupBy collapse — the fact table itself is
    never windowed."""
    from gpu_database_spark.operators.stattests import stat_kruskal_wallis
    from gpu_database_spark.plans import inspect

    plan = inspect.formatted_plan(stat_kruskal_wallis(spark, sf_dir))
    # the window's input must be an aggregate, not the scan: in the
    # formatted plan the Window node appears above a HashAggregate
    win_at = plan.find("Window")
    agg_at = plan.find("HashAggregate")
    assert win_at != -1 and agg_at != -1
    scan_at = plan.find("Scan parquet")
    assert scan_at == -1 or win_at < scan_at or agg_at < win_at


def test_passage_dedup_first_occurrence_semantics(spark, sf_dir):
    """Census identity: n_dup + n_kept == n_chunks per doc, every
    distinct passage has exactly ONE kept occurrence corpus-wide, and
    doc 0's chunks are all kept (nothing precedes doc 0)."""
    from gpu_database_spark.llm.dedup import dedup_passage_exact

    rows = dedup_passage_exact(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_dup"] + r["n_kept"] == r["n_chunks"]
    first = [r for r in rows if r["doc_id"] == 0]
    assert first and first[0]["n_dup"] == 0


def test_compression_ratio_matches_serial_zlib(spark, sf_dir):
    """The distributed census must equal a serial zlib replica
    (same library, same level) — the rows-only oracle."""
    import zlib
    from decimal import Decimal

    import duckdb  # noqa: F401 — parity-style import guard

    from gpu_database_spark.llm.filtering import (
        COMPRESS_FLAG_RATIO,
        text_compression_ratio,
    )

    got = {
        r["source"]: (r["n_docs"], r["mean_ratio"], r["n_flagged"])
        for r in text_compression_ratio(spark, sf_dir).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    per_source: dict[str, list[float]] = {}
    for r in docs:
        raw = (r["text"] or "").encode("utf-8")
        ratio = len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
        per_source.setdefault(r["source"], []).append(round(ratio, 8))
    for src, ratios in per_source.items():
        n = len(ratios)
        mean = float(
            round(
                sum(Decimal(str(x)) for x in ratios) / Decimal(n), 6
            )
        )
        flagged = sum(1 for x in ratios if x < COMPRESS_FLAG_RATIO)
        assert got[src] == (n, pytest.approx(mean, abs=1e-6), flagged), src


def test_audio_energy_decodes_real_wav(spark):
    """A real 16-bit WAV (stdlib-generated sine + silence) must take
    the REAL decode path (codec='wav') and produce the expected
    windowed energy census: the sine half is loud, the silent half is
    below the silence threshold."""
    import io
    import math
    import struct
    import wave

    from gpu_database_spark.llm.multimodal import (
        AUDIO_SILENCE,
        AUDIO_WIN,
        audio_energy_windows,
    )

    n = AUDIO_WIN * 4
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        loud = [
            int(20000 * math.sin(2 * math.pi * 440 * i / 16000))
            for i in range(n // 2)
        ]
        samples = loud + [0] * (n // 2)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "audio", len(buf.getvalue()))],
        "media_id long, payload binary, media_type string, byte_len long",
    )
    rows = audio_energy_windows(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["codec"] == "wav"
    assert r["n_windows"] == 4
    # half the windows are silent (0), half are loud sine (mean |amp|
    # ~ (2/pi)*20000/32768 ~ 0.389) -> overall mean ~ 0.194
    assert r["silence_ratio"] == 0.5
    assert 0.15 < r["mean_energy"] < 0.25
    assert AUDIO_SILENCE < 0.2  # the loud windows must clear the gate


def test_audio_energy_exotic_wavs_never_fail_the_job(spark):
    """One exotic payload must NEVER fail the whole mapInPandas job
    (ADVICE r8): a stereo WAV downmixes to mono per-frame means
    (codec='wav-ch2'), a 24-bit WAV degrades to a zero-sample
    'wav-unsupported-w3' row, and a truncated RIFF header degrades to
    'wav-corrupt' — all three in ONE batch alongside a good mono WAV."""
    import io
    import struct
    import wave

    from gpu_database_spark.llm.multimodal import (
        AUDIO_WIN,
        audio_energy_windows,
        _pcm_samples,
    )

    def make_wav(nch: int, width: int, frames: list[int]) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(16000)
            if width == 2:
                w.writeframes(struct.pack(f"<{len(frames)}h", *frames))
            else:  # raw bytes for 1- and 3-byte widths
                w.writeframes(bytes(frames))
        return buf.getvalue()

    n = AUDIO_WIN * 2
    mono = make_wav(1, 2, [1000] * n)
    # stereo: L=+16384, R=-16384 -> per-frame mean exactly 0.0
    stereo = make_wav(2, 2, [16384, -16384] * n)
    wav24 = make_wav(1, 3, [0, 0, 64] * 16)
    corrupt = b"RIFF\x10\x00\x00\x00WAVEjunk"

    # unit-level: the decoder itself
    s, codec = _pcm_samples(stereo)
    assert codec == "wav-ch2" and len(s) == n
    assert all(abs(v) < 1e-12 for v in s)  # L/R cancel exactly
    assert _pcm_samples(wav24) == ([], "wav-unsupported-w3")
    assert _pcm_samples(corrupt) == ([], "wav-corrupt")

    media = spark.createDataFrame(
        [
            (1, bytearray(mono), "audio", len(mono)),
            (2, bytearray(stereo), "audio", len(stereo)),
            (3, bytearray(wav24), "audio", len(wav24)),
            (4, bytearray(corrupt), "audio", len(corrupt)),
        ],
        "media_id long, payload binary, media_type string, byte_len long",
    )
    rows = {r["media_id"]: r for r in audio_energy_windows(media).collect()}
    assert len(rows) == 4
    assert rows[1]["codec"] == "wav" and rows[1]["n_windows"] == 2
    assert rows[2]["codec"] == "wav-ch2" and rows[2]["n_windows"] == 2
    assert rows[2]["silence_ratio"] == 1.0  # downmixed to exact zeros
    assert rows[3]["codec"] == "wav-unsupported-w3"
    assert rows[3]["n_windows"] == 0 and rows[3]["silence_ratio"] == 1.0
    assert rows[4]["codec"] == "wav-corrupt" and rows[4]["n_windows"] == 0


def test_permutation_test_is_two_scans(spark, sf_dir):
    """stat_permutation_test must cost exactly its stated plan: ONE
    O(1)-output scalar pre-pass (n, npos -> threshold) plus ONE wide
    aggregation carrying all 32 replicate differences AND the observed
    difference — never a scan or shuffle per replicate.

    The plan is computed on a FRESH child session with the operator's
    memo entry dropped (VERDICT r9 #3): in a large shared-session
    batch, neighbor tests' cached relations / runtime confs perturbed
    the counted scan shape, flaking an assert that passes standalone.
    InMemoryTableScan substitutions count like parquet scans so a
    neighbor's leftover .cache() cannot change the arithmetic."""
    from gpu_database_spark.operators import stattests
    from gpu_database_spark.plans import inspect

    fresh = spark.newSession()
    stattests._WIDE_CACHE.pop(
        (fresh.sparkContext.applicationId, f"perm:{sf_dir}"), None
    )
    try:
        plan = inspect.simple_plan(
            stattests.stat_permutation_test(fresh, sf_dir)
        )
    finally:
        stattests._WIDE_CACHE.pop(
            (fresh.sparkContext.applicationId, f"perm:{sf_dir}"), None
        )
    scans = plan.count("Scan parquet") + plan.count("InMemoryTableScan")
    assert scans <= 3, f"{scans} scans\n{plan}"
    # 32 replicate sums must appear as conditional aggregates in one
    # aggregation, not 32 separate aggregations over the fact table
    assert plan.count("s31") >= 1, "replicate 31's sum is missing"


def test_approx_quantile_audit_guarantee_holds(spark, sf_dir):
    """The GK sketch must sit inside the exact rank bracket at every
    audited quantile — the contract the rows-only query reports."""
    from gpu_database_spark.operators.aggregates import (
        agg_approx_quantile_audit,
    )

    rows = agg_approx_quantile_audit(spark, sf_dir).collect()
    assert len(rows) == 3
    assert all(r["within_guarantee"] for r in rows)
    assert all(r["exact"] is not None and r["approx"] is not None for r in rows)
