"""Materialization points: plan-reuse barriers with a lifetime story.

Many operators compute an intermediate once and feed it to several
downstream consumers (a bands table read by both sides of a self-join,
a bigram model read by two rollups). The repo's standard device is an
eager ``localCheckpoint``: it cuts lineage AND guarantees single
execution. Two documented trade-offs come with it:

* **fault-tolerance**: localCheckpoint blocks are non-replicated and
  non-recomputable — an executor loss kills the query. Fine on
  local[32]; at 100 TB prefer ``persist(MEMORY_AND_DISK)`` (keeps
  lineage, recomputes on loss). Set ``SPARK_GRAFT_MATERIALIZE=persist``
  to flip every non-loop materialization point in the repo at once.
  (Iterative operators — Aria's epoch loop, PageRank, k-core,
  connected components, BFS — always checkpoint regardless, via
  ``force_checkpoint=True``: truncating the growing loop-carried
  lineage is the point there, and persist would reintroduce the
  per-round plan regrowth the checkpoint exists to prevent.)
* **lifetime**: checkpoint blocks pin executor storage until the RDD
  is driver-GC'd, which py4j delays indefinitely in long sessions
  (ADVICE r6: bench best-of-3 over the full headline set accumulates them).
  Harnesses that run many queries in one session call
  :func:`release_all` between queries, after results are fully
  collected — NEVER while a dependent plan is still unexecuted,
  because a released checkpoint cannot be recomputed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# RDD ids created by materialize(persist) in this process. release_all
# unpersists only these, never caches it does not own (an application
# cache like bfs_hops's internal edge cache being swept mid-query once
# caused a CHECKPOINT_BLOCK_NOT_FOUND — ADVICE r7).
_OWNED_RDD_IDS: set[int] = set()


def materialize(
    df: DataFrame, *, force_checkpoint: bool = False, eager: bool = True
) -> DataFrame:
    """Materialize ``df`` once and return a reusable, lineage-bounded
    handle. Mode is process-wide via ``SPARK_GRAFT_MATERIALIZE``:
    ``checkpoint`` (default: eager localCheckpoint, single-execution
    guarantee, non-recoverable) or ``persist`` (MEMORY_AND_DISK,
    lineage kept, the fault-tolerant 100 TB setting).

    ``force_checkpoint=True`` is for LOOP-CARRIED state (connected
    components, BFS frontiers, Aria epochs): it always localCheckpoints
    regardless of the env switch, because persist keeps lineage and the
    self-referencing plan would regrow every round — the exact
    analysis-time/storage blow-up the checkpoint exists to prevent.

    ``eager=False`` (r14, guide §1.2 "remove unnecessary passes"):
    marks the checkpoint but lets the CALLER'S NEXT ACTION materialize
    it — the loop bodies that previously paid one blocking checkpoint
    job plus one probe job per round (connected components' convergence
    sum, k-core's survivor count) now fuse both into the probe's single
    job. The lineage cut and block persistence are identical once that
    action has run; callers must run an action on the returned frame
    before branching other consumers off it (all current eager=False
    call sites do so on the next line).
    """
    # The persisted block (checkpoint RDD / InMemoryRelation RDD) is
    # internal — its id isn't exposed by the DataFrame API (df.rdd is a
    # fresh conversion RDD with a different id) — so diff the
    # persistent-RDD set around the forcing call to record exactly what
    # we created. materialize() is only ever called from driver-serial
    # operator code, so the diff cannot pick up a concurrent stranger.
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "checkpoint")
    jsc = df.sparkSession.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    if mode == "persist" and not force_checkpoint:
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()  # force now so consumers share one execution
    else:
        out = df.localCheckpoint(eager=eager)
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    _OWNED_RDD_IDS.update(int(i) for i in after - before)
    return out


def release_all(spark: SparkSession) -> int:
    """Release materialization blocks created by this module.

    Only RDD ids recorded by :func:`materialize` (checkpoint blocks
    and persist handles alike) are unpersisted; application-level
    caches — e.g. an operator's internal ``.cache()`` or a live
    streaming query's state — are left alone, so this is safe to call
    between queries in a long harness session without sweeping blocks
    it does not own (ADVICE r7: a wholesale sweep once caused
    CHECKPOINT_BLOCK_NOT_FOUND on a concurrently-alive cache).

    Only safe once all dependent results are collected — a released
    checkpoint cannot be recomputed. Returns the number released.
    """
    if not _OWNED_RDD_IDS:
        return 0
    jsc = spark.sparkContext._jsc
    jmap = jsc.getPersistentRDDs()
    released = 0
    for rid in list(_OWNED_RDD_IDS):
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
            released += 1
        _OWNED_RDD_IDS.discard(rid)
    return released
