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
    # release_all() frees only materialize()-OWNED blocks (ADVICE r7
    # ownership fix), so earlier tests' foreign caches may legally
    # remain persisted — assert relative to that baseline, not zero.
    base = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = materialize(spark.range(100).selectExpr("id", "id * 2 AS v"))
    assert df.count() == 100
    assert spark.sparkContext._jsc.getPersistentRDDs().size() >= base + 1
    assert release_all(spark) >= 1
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == base

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


def test_auc_matches_serial_rank_computation(spark, sf_dir):
    """ml_eval_auc's distributed Mann-Whitney AUC must equal a serial
    tie-averaged-rank AUC computed driver-side at fixture scale."""
    from gpu_database_spark.registry import queries

    row = queries()["ml_eval_auc"](spark, sf_dir).collect()[0]

    from gpu_database_spark.sources.catalog import load_table

    pdf = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_totalprice AS score",
            "CASE WHEN substr(o_orderpriority,1,1) IN ('1','2') "
            "THEN 1 ELSE 0 END AS y",
        )
        .toPandas()
    )
    ranks = pdf["score"].rank(method="average")  # tie-averaged, 1-based
    npos = int(pdf["y"].sum())
    nneg = len(pdf) - npos
    auc = (ranks[pdf["y"] == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert row.npos == npos and row.nneg == nneg
    assert abs(row.auc - round(auc, 6)) <= 1e-6
    assert abs(row.gini - round(2 * auc - 1, 6)) <= 2e-6


def test_bfs_matches_serial_frontier(spark, sf_dir):
    """bfs_hops must equal a dict-based multi-source BFS on the same
    synthetic edge list."""
    from collections import deque

    from gpu_database_spark.llm.graphrank import (
        BFS_MAX_HOPS,
        BFS_N_SEEDS,
        bfs_hops,
        synth_edges,
    )
    from gpu_database_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    edges = synth_edges(d)
    seeds = d.filter(F.col("doc_id") < BFS_N_SEEDS).select(
        F.col("doc_id").alias("id")
    )
    got = {r.id: r.hops for r in bfs_hops(seeds, edges, BFS_MAX_HOPS).collect()}

    adj: dict[int, list[int]] = {}
    for r in edges.collect():
        adj.setdefault(r.src, []).append(r.dst)
    want = {i: 0 for i in range(BFS_N_SEEDS)}
    q = deque(want)
    while q:
        u = q.popleft()
        if want[u] >= BFS_MAX_HOPS:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


def test_feature_rank_plans_are_bucketed(spark, sf_dir):
    """AUC / decile / robust-mean global ranks must route through the
    histogram-bucket plan — no single-partition row_number window."""
    from gpu_database_spark.plans import inspect
    from gpu_database_spark.registry import queries

    for name in (
        "ml_eval_auc",
        "ml_lift_deciles",
        "stat_robust_means",
        "feat_quantile_normalize",
        "layout_zonemap_pruning",
        "curriculum_pacing",
    ):
        plan = inspect.simple_plan(queries()[name](spark, sf_dir))
        rn_lines = [
            ln for ln in plan.splitlines() if "row_number" in ln.lower()
        ]
        assert rn_lines, f"{name}: expected a rank window\n{plan}"
        for ln in rn_lines:
            assert "_bkt" in ln or "bucket" in ln, (
                f"{name}: unbucketed global rank window: {ln}"
            )


def test_target_encoding_is_leave_one_out(spark, sf_dir):
    """A row's own label must not leak into its encoding: for rows in
    the same segment, te differs between y=0 and y=1 rows by exactly
    1/(seg_cnt-1+M) — verify on one segment."""
    from gpu_database_spark.registry import queries

    rows = queries()["feat_target_encoding"](spark, sf_dir).collect()
    by_seg: dict[str, set[tuple[int, float]]] = {}
    for r in rows:
        by_seg.setdefault(r.segment, set()).add((r.y, r.te))
    # Within a segment every y=1 row shares one te, every y=0 row
    # another, and te(y=0) > te(y=1) (removing a positive lowers it).
    for seg, pairs in by_seg.items():
        tes = {y: te for y, te in pairs}
        if 0 in tes and 1 in tes:
            assert tes[0] > tes[1], (seg, pairs)
        assert len(pairs) <= 2, (seg, pairs)


def test_quantile_normalize_is_monotone_and_value_preserving(spark, sf_dir):
    """feat_quantile_normalize invariants: within a source the mapping
    is monotone in the original value, and every normalized value is
    an actual corpus value (the mapping lands ON the global
    distribution, it doesn't interpolate)."""
    from gpu_database_spark.registry import queries
    from gpu_database_spark.sources.catalog import load_table

    rows = queries()["feat_quantile_normalize"](spark, sf_dir).collect()
    corpus_values = {
        r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .select("n_chars")
        .collect()
    }
    by_source: dict[str, list] = {}
    for r in rows:
        assert r.v_normalized in corpus_values, r
        by_source.setdefault(r.source, []).append((r.n_chars, r.v_normalized))
    for source, pairs in by_source.items():
        pairs.sort()
        normed = [v for _, v in pairs]
        assert normed == sorted(normed), f"{source}: not monotone"


def test_asof_nearest_consistent_with_directional_joins(spark, sf_dir):
    """join_asof_nearest must agree with the directional as-of joins:
    its backward picks equal join_asof_prevailing's rate, its forward
    picks equal join_asof_forward's, and the direction choice is the
    smaller whole-day delta (backward on ties)."""
    from gpu_database_spark.registry import queries

    qs = queries()
    near = {r.o_orderkey: r for r in qs["join_asof_nearest"](spark, sf_dir).collect()}
    prev = {r.o_orderkey: r.fx_rate for r in qs["join_asof_prevailing"](spark, sf_dir).collect()}
    nxt = {r.o_orderkey: r.next_rate for r in qs["join_asof_forward"](spark, sf_dir).collect()}
    assert set(near) == set(prev) == set(nxt)
    n_forward = 0
    for k, r in near.items():
        if r.direction == "backward":
            assert r.fx_rate == prev[k], (k, r, prev[k])
            if r.d_next is not None:
                assert r.d_prev <= r.d_next, (k, r)
        else:
            n_forward += 1
            assert r.fx_rate == nxt[k], (k, r, nxt[k])
            assert r.d_prev is None or r.d_next < r.d_prev, (k, r)
    # the 90-day rate grid guarantees both directions occur
    assert 0 < n_forward < len(near)


def test_eval_family_invariants(spark, sf_dir):
    """Statistical invariants that don't depend on the fixture:
    threshold-sweep monotonicity, calibration/Brier bounds, kappa
    range, WOE/IV consistency, lift-decile conservation."""
    from gpu_database_spark.registry import queries

    qs = queries()

    sweep = qs["ml_threshold_sweep"](spark, sf_dir).collect()
    flagged = [r.n_flagged for r in sweep]
    recall = [r.recall for r in sweep]
    assert flagged == sorted(flagged, reverse=True)
    assert recall == sorted(recall, reverse=True)
    assert recall[0] == 1.0  # lowest threshold flags everything
    for r in sweep:
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.f1 <= 1.0

    cal = qs["ml_calibration_bins"](spark, sf_dir).collect()
    for r in cal:
        assert 0.0 <= r.mean_pred <= 1.0, r
        assert 0.0 <= r.frac_pos <= 1.0 and 0.0 <= r.brier <= 1.0, r

    kap = qs["stat_cohens_kappa"](spark, sf_dir).collect()[0]
    assert -1.0 <= kap.kappa <= 1.0
    assert kap.n == kap.n11 + kap.n10 + kap.n01 + kap.n00

    woe = qs["feat_woe_iv_binning"](spark, sf_dir).collect()
    for r in woe:
        assert r.n_bin == r.n_pos + r.n_neg
        # iv_term sign matches woe sign (iv = (dp-dn)*woe, same sign)
        if abs(r.woe) > 1e-9:
            assert r.iv_term >= -1e-9 or abs(r.iv_term) < 1e-6

    lift = qs["ml_lift_deciles"](spark, sf_dir).collect()
    assert len(lift) == 10
    assert abs(lift[-1].cum_capture - 1.0) < 1e-9
    total = sum(r.n_d for r in lift)
    from gpu_database_spark.sources.catalog import load_table

    assert total == load_table(spark, sf_dir, "orders").count()

    rob = qs["stat_robust_means"](spark, sf_dir).collect()
    for r in rob:
        # trimming/winsorizing pulls toward the median; all three are
        # within the data range and the winsorized mean sits between
        # the trimmed mean's direction and the raw mean
        assert r.k == r.n // 10
        assert min(r.mean_trimmed, r.mean_all) <= r.mean_winsor * 1.0001
