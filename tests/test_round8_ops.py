"""Round-8 regression tests (ADVICE r7 + new surface)."""

from __future__ import annotations

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
