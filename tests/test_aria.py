"""Aria engine vs the serial-order oracle (SURVEY.md §5.2-3).

Aria's guarantee: the deterministic epoch protocol produces exactly
the state of replaying the committed transactions serially in commit
(Tid) order. The oracle here is a plain-Python replay implementing the
reference semantics (TrancM_func.cuh:125-250) over dicts; the engine
must match it bit-for-bit, across epochs, in both abort modes.
"""

from __future__ import annotations

import hashlib

import pytest

from gpu_database_spark import gen
from gpu_database_spark.operators import aria


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def serial_oracle(table, ops_rows, reorder, max_epochs=100):
    """Replay the epoch protocol over plain dicts.

    table: dict key->value; ops_rows: [(txn, op, key, upd)].
    Returns (table, epoch_committed_counts).
    """
    table = dict(table)
    live = list(ops_rows)
    epoch_commits = []
    for _ in range(max_epochs):
        if not live:
            break
        txns = sorted({t for t, _, _, _ in live})
        rts, wts = {}, {}
        for t, _, k, u in live:
            rts[k] = min(rts.get(k, t), t)
            if u:
                wts[k] = min(wts.get(k, t), t)
        flags = {t: [False, False, False] for t in txns}  # raw, war, waw
        for t, _, k, u in live:
            if k in wts and wts[k] < t:
                flags[t][0] = True
            if u and rts[k] < t:
                flags[t][1] = True
            if u and k in wts and wts[k] < t:
                flags[t][2] = True
        committed = []
        for t in txns:
            raw, war, waw = flags[t]
            abort = (waw or (raw and war)) if reorder else (waw or raw)
            if not abort:
                committed.append(t)
        cs = set(committed)
        # serial replay in commit (Tid) order; within txn, op order
        for t in committed:
            for tt, op, k, u in sorted(r for r in live if r[0] == t):
                if u:
                    table[k] = md5(f"{t}:{op}:{k}")
        epoch_commits.append(len(committed))
        aborted = [t for t in txns if t not in cs]
        renum = {t: i + 1 for i, t in enumerate(aborted)}
        live = [(renum[t], op, k, u) for t, op, k, u in live if t in renum]
    return table, epoch_commits


@pytest.fixture(scope="module")
def workload(spark):
    table_rows = {k: md5(f"init:{k}") for k in range(1, 101)}
    table = spark.createDataFrame(
        [(k, v) for k, v in table_rows.items()], "key long, value string"
    )
    ops_rows = gen.transactions_local(
        batch_size=40, max_ops=8, keys_max=60, write_rate=0.4, seed=11
    )
    ops = spark.createDataFrame(
        ops_rows, "txn_id long, op_idx int, key long, is_update boolean"
    )
    return table_rows, table, ops_rows, ops


@pytest.mark.parametrize("reorder", [False, True])
@pytest.mark.parametrize("local_threshold", [0, 100_000])
def test_final_state_matches_serial_oracle(spark, workload, reorder, local_threshold):
    """Both execution paths (0 -> fully distributed DataFrame algebra,
    100k -> driver-local fast path) must match the serial-order replay."""
    table_rows, table, ops_rows, ops = workload
    result = aria.run_batch(
        table,
        ops,
        reorder=reorder,
        local_threshold=local_threshold,
        collect_commit_order=True,
    )
    got = {r.key: r.value for r in result.table.collect()}
    want, epoch_commits = serial_oracle(table_rows, ops_rows, reorder)
    assert got == want
    assert result.epochs == len(epoch_commits)
    # every txn commits exactly once across epochs, reported under the
    # ORIGINAL id it was submitted with (not the retry renumbering)
    assert len(result.commit_order) == sum(epoch_commits)
    assert sorted(result.commit_order) == sorted({t for t, _, _, _ in ops_rows})


def test_overlay_equals_rmw_install_path(spark, workload):
    """The end-of-batch overlay install (non-rmw default) and the
    per-epoch install+checkpoint path (rmw=True) must produce the same
    final table for read-independent value generators."""
    _, table, _, ops = workload
    overlay = aria.run_batch(
        table, ops, reorder=False, local_threshold=0, collect_commit_order=True
    )
    rmw = aria.run_batch(table, ops, reorder=False, local_threshold=0, rmw=True)
    assert sorted(map(tuple, overlay.table.collect())) == sorted(
        map(tuple, rmw.table.collect())
    )
    assert overlay.commit_order == rmw.commit_order


def test_local_fast_path_equals_distributed(spark, workload):
    _, table, _, ops = workload
    local = aria.run_batch(table, ops, reorder=True)
    dist = aria.run_batch(
        table, ops, reorder=True, local_threshold=0, collect_commit_order=True
    )
    assert local.commit_order == dist.commit_order
    assert local.epochs == dist.epochs
    assert sorted(map(tuple, local.table.collect())) == sorted(
        map(tuple, dist.table.collect())
    )
    # default distributed path: list stays empty, lazy frame agrees
    lazy = aria.run_batch(table, ops, reorder=True, local_threshold=0)
    assert lazy.commit_order == []
    co = lazy.commit_order_df.orderBy("epoch", "txn_id").collect()
    assert [r.orig_tid for r in co] == dist.commit_order


def test_deterministic_across_runs(spark, workload):
    _, table, _, ops = workload
    r1 = aria.run_batch(table, ops, reorder=True)
    r2 = aria.run_batch(table, ops, reorder=True)
    assert sorted((r.key, r.value) for r in r1.table.collect()) == sorted(
        (r.key, r.value) for r in r2.table.collect()
    )
    assert r1.commit_order == r2.commit_order
    assert r1.epochs == r2.epochs


def test_reorder_commits_superset_of_plain(spark, workload):
    """On the same (first) epoch, reorder-mode commits ⊇ plain commits
    (abort condition waw|(raw&war) implies waw|raw)."""
    _, table, _, ops = workload
    plain = aria.run_epoch(table, ops, reorder=False)
    reorder = aria.run_epoch(table, ops, reorder=True)
    assert set(plain.committed) <= set(reorder.committed)


def test_min_tid_never_aborts(spark, workload):
    """The smallest Tid holds every reservation it requests
    (metadatahelper.cuh:51-55) — it can never conflict, guaranteeing
    termination of the retry loop."""
    _, table, ops_rows, ops = workload
    min_tid = min(t for t, _, _, _ in ops_rows)
    ep = aria.run_epoch(table, ops, reorder=False)
    assert min_tid in ep.committed


def test_unique_committed_writer_per_key(spark, workload):
    """WAW aborts guarantee at most one committed writer per key per
    epoch — the property that makes the parallel install race-free
    (and why the reference can let winners race, TrancM_func.cuh:188-197)."""
    _, table, _, ops = workload
    from pyspark.sql import functions as F

    ep = aria.run_epoch(table, ops, reorder=True)
    committed = spark.createDataFrame([(t,) for t in ep.committed], "txn_id long")
    writers = (
        ops.filter(F.col("is_update"))
        .join(committed, "txn_id", "left_semi")
        .select("key", "txn_id")
        .distinct()
        .groupBy("key")
        .count()
    )
    assert writers.filter(F.col("count") > 1).count() == 0


def test_epoch_loop_terminates_and_commits_all(spark, workload):
    _, table, ops_rows, ops = workload
    result = aria.run_batch(table, ops, reorder=False)
    n_txns_with_ops = len({t for t, _, _, _ in ops_rows})
    assert len(result.commit_order) == n_txns_with_ops
    assert result.epochs < 50


@pytest.mark.parametrize("reorder", [False, True])
def test_reference_config_matches_serial_oracle(spark, reorder):
    """Aria at the reference's ACTUAL workload configuration
    (``include/core/Transction.h:24-33`` / BASELINE.md: 199,999-row
    preload, 150 txns x U(0,30) ops, keys U(1,20000), write rate 0.4):
    final table must equal the serial-order replay and the epoch count
    must match the oracle's retry schedule — the full-scale version of
    the toy-size property tests above (VERDICT r6 #7)."""
    n_rows, seed = 199_999, 42
    table = gen.kv_table_distributed(spark, n_rows, seed=seed)
    ops_rows = gen.transactions_local(
        batch_size=150, max_ops=30, keys_max=20_000, write_rate=0.4, seed=7
    )
    ops = spark.createDataFrame(
        ops_rows, "txn_id long, op_idx int, key long, is_update boolean"
    )
    result = aria.run_batch(
        table, ops, reorder=reorder, collect_commit_order=True
    )
    got = {r.key: r.value for r in result.table.collect()}
    init = {k: md5(f"{seed}:{k}") for k in range(1, n_rows + 1)}
    want, epoch_commits = serial_oracle(init, ops_rows, reorder)
    assert len(got) == n_rows
    assert got == want
    assert result.epochs == len(epoch_commits)
    assert sorted(result.commit_order) == sorted({t for t, _, _, _ in ops_rows})


@pytest.mark.parametrize("local_threshold", [0, 100_000])
def test_snapshot_asof_is_prefix_of_full_run(spark, workload, local_threshold):
    """Bounded replay IS time travel (aria_snapshot_asof): a run capped
    at epoch E with strict=False returns the partial state, and its
    commit_order is literally the FIRST n entries of the full run's —
    determinism means the capped run retraces the full run's prefix
    exactly, on both the local fast path and the distributed path."""
    _, table, ops_rows, ops = workload
    full = aria.run_batch(
        table, ops, reorder=True, collect_commit_order=True,
        local_threshold=local_threshold,
    )
    assert full.epochs > 2  # the horizon below must be mid-flight
    horizon = 2
    capped = aria.run_batch(
        table, ops, reorder=True, max_epochs=horizon, strict=False,
        collect_commit_order=True, local_threshold=local_threshold,
    )
    assert capped.epochs == horizon
    n = len(capped.commit_order)
    assert 0 < n < len(full.commit_order)
    assert capped.commit_order == full.commit_order[:n]
    # the capped table differs from the full table only on keys whose
    # winning write landed after the horizon
    got_capped = {r.key: r.value for r in capped.table.collect()}
    got_full = {r.key: r.value for r in full.table.collect()}
    assert set(got_capped) == set(got_full)
    assert any(got_capped[k] != got_full[k] for k in got_capped)


def test_snapshot_asof_strict_default_still_raises(spark, workload):
    """strict=True (the default) must keep refusing to drop writes."""
    _, table, _, ops = workload
    with pytest.raises(RuntimeError, match="still live"):
        aria.run_batch(table, ops, reorder=True, max_epochs=1)
