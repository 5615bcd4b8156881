"""Aria deterministic batch concurrency control as DataFrame algebra.

This is the reference's core capability (SURVEY.md §3): execute a
batch (epoch) of transactions speculatively, reserve each touched key
for the smallest transaction id (Tid), analyze RAW/WAR/WAW conflicts,
commit the conflict-free prefix deterministically, install its writes,
and retry the rest next epoch. ("Aria: A Fast and Practical
Deterministic OLTP Database", Lu et al., VLDB 2020.)

Reference mapping (file:line in /root/reference):
  - Execute/snapshot reads .. device_execute, src/database/ycsb/TrancM_func.cuh:21-63
  - Read/write reservation .. MetadataHelper CAS min-Tid loops,
                              src/cuda/metadatahelper.cuh:36-90
  - Dependency analysis ..... device_analyze_dependency, TrancM_func.cuh:125-164
  - Commit decision ......... without reorder: abort iff waw|raw,
                              TrancM_func.cuh:207-227; with reorder:
                              abort iff waw|(raw&war), TrancM_func.cuh:181-205
  - Install write-back ...... TrancM_func.cuh:188-197, :213-224
  - Collect/retry ........... TransctionManager.cuh:165-185

The CAS race's terminal state is exactly ``groupBy(key).min(txn_id)``
(a reservation fails iff an older Tid already holds it,
metadatahelper.cuh:51-55,79-83), so the whole protocol becomes five
deterministic, order-free DataFrame stages per epoch — no atomics, no
shared mutable state, and bit-reproducible across cluster sizes.

Data model:
  table: (key: long, value: string)            — the KV store
  ops:   (txn_id: long, op_idx: int, key: long, is_update: boolean)
         update ops also *read*-reserve their key (TrancM_func.cuh:42-52).
  Multi-table workloads (the reference's table_vec only ever uses
  [0][0], database.h:10-22) pack the table id into the key — the
  reservation algebra is table-agnostic.

Scale notes (100 TB): each epoch is 3 shuffles (reserve groupBy,
analyze join+groupBy, install join) all on `key` or `txn_id`; the
retry loop localCheckpoints the table each epoch to cut the growing
lineage (the one real perf trap of iterative DataFrame programs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gpu_database_spark.functions.materialize import materialize


def reserve(ops: DataFrame) -> DataFrame:
    """Per-key min-Tid reservations: (key, rts, wts).

    rts is the min Tid over ALL ops on the key (update ops read too,
    TrancM_func.cuh:42-52); wts over update ops only. Equivalent to the
    terminal state of the reference's CAS loops (metadatahelper.cuh:36-90).
    """
    return ops.groupBy("key").agg(
        F.min("txn_id").alias("rts"),
        F.min(F.when(F.col("is_update"), F.col("txn_id"))).alias("wts"),
    )


def analyze(ops: DataFrame, reservations: DataFrame) -> DataFrame:
    """Per-txn conflict flags (txn_id, raw, war, waw).

    raw: some key this txn READS is write-reserved by an older txn
    war: some key this txn WRITES is read-reserved by an older txn
    waw: some key this txn WRITES is write-reserved by an older txn
    (device_analyze_dependency, TrancM_func.cuh:125-164; every op reads,
    so the read set is the whole op set.)
    """
    j = ops.join(reservations, "key")
    older_w = F.col("wts").isNotNull() & (F.col("wts") < F.col("txn_id"))
    older_r = F.col("rts") < F.col("txn_id")
    return j.groupBy("txn_id").agg(
        F.max(older_w).alias("raw"),
        F.max(F.col("is_update") & older_r).alias("war"),
        F.max(F.col("is_update") & older_w).alias("waw"),
    )


def commit_decision(flags: DataFrame, reorder: bool) -> DataFrame:
    """Committed txn ids under the chosen abort rule.

    reorder=False: abort iff waw | raw   (TrancM_func.cuh:207-227)
    reorder=True : abort iff waw | (raw & war) — Aria's deterministic
                   reordering (TrancM_func.cuh:181-205; the ref tests
                   the equivalent `!raw || !war` at :187).
    """
    if reorder:
        keep = ~F.col("waw") & ~(F.col("raw") & F.col("war"))
    else:
        keep = ~F.col("waw") & ~F.col("raw")
    return flags.filter(keep).select("txn_id")


def winners(ops: DataFrame, committed: DataFrame, new_value: Column) -> DataFrame:
    """One winning (key, value) per key among committed update ops.

    Deterministic resolution: smallest committed Tid, then its last op
    in op order (row_number over (key) ordered by txn_id asc, op_idx
    desc — SURVEY.md §3.2 step 4). ``new_value`` is the speculative
    write expression (may reference txn_id/op_idx/key), the analogue of
    the reference's device value regeneration (src/cuda/kv.cuh:72-78).
    """
    w = Window.partitionBy("key").orderBy(F.col("txn_id").asc(), F.col("op_idx").desc())
    return (
        ops.filter(F.col("is_update"))
        .join(committed, "txn_id", "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("key", new_value.alias("value"))
    )


def install(table: DataFrame, winning: DataFrame) -> DataFrame:
    """MERGE the winners over the live table.

    Write-back of committed txns (TrancM_func.cuh:188-197). Upsert
    semantics: keys not present in the table are inserted (the
    op-parallel path's read-upsert, operation_parallel.cuh:72-83).

    Shape: broadcast anti-join (rows the winners don't touch) + union
    of the winners, NOT a full-outer coalesce — full-outer cannot use
    a broadcast build side, so it would sort-merge-shuffle the WHOLE
    table to merge an epoch's worth of writes; the anti+union keeps
    the table side shuffle-free at any scale. Equivalent because a
    winner's value is never NULL (it is a generated write) and keys
    are unique on both sides.
    """
    keep = table.select("key", "value").join(
        F.broadcast(winning.select("key")), "key", "left_anti"
    )
    return keep.unionByName(winning.select("key", "value"))


@dataclass
class EpochResult:
    committed: list[int]
    aborted: list[int]
    table: DataFrame


@dataclass
class BatchResult:
    """Result of :func:`run_batch`.

    ``commit_order`` lists ORIGINAL transaction ids in deterministic
    commit order (epoch by epoch, Tid-ascending within an epoch) —
    retried transactions are renumbered internally per the reference's
    Collect phase (TransctionManager.cuh:176-184) but reported under
    the id the caller submitted. On the fully distributed path it is
    only populated when ``collect_commit_order=True``; the lazy
    ``commit_order_df`` (epoch: int, txn_id: long, orig_tid: long) is
    always available there and never touches the driver.
    """

    table: DataFrame
    commit_order: list[int] = field(default_factory=list)
    epochs: int = 0
    commit_order_df: DataFrame | None = None


def default_new_value() -> Column:
    """Deterministic speculative write payload: a hash of the writing
    (txn, op, key) — the seeded-reproducibility analogue of the
    reference's cuRAND value generation (kv.cuh:72-78)."""
    return F.md5(
        F.concat_ws(":", F.col("txn_id"), F.col("op_idx"), F.col("key"))
    )


def run_epoch(
    table: DataFrame,
    ops: DataFrame,
    reorder: bool = False,
    new_value: Column | None = None,
) -> EpochResult:
    """One Execute→Reserve→Analyze→Install pass (test_one_epoch,
    src/database/ycsb/db.h:111-125). Returns committed/aborted Tids and
    the post-install table (lazy)."""
    if new_value is None:
        new_value = default_new_value()
    res = reserve(ops)
    flags = analyze(ops, res)
    # ONE driver round-trip per epoch: the flag rows are one per live
    # txn (a txn with ops always joins its own reservations), ~batch
    # size — the same small D2H copy the reference's Collect does
    # (TransctionManager.cuh:174). Commit decisions fall out locally.
    flag_rows = flags.collect()
    committed_ids, aborted = [], []
    for r in flag_rows:
        if reorder:
            abort = r.waw or (r.raw and r.war)
        else:
            abort = r.waw or r.raw
        (aborted if abort else committed_ids).append(r.txn_id)
    committed_ids.sort()
    aborted.sort()
    committed = ops.sparkSession.createDataFrame(
        [(t,) for t in committed_ids] or [(None,)], "txn_id long"
    ).filter(F.col("txn_id").isNotNull())
    win = winners(ops, F.broadcast(committed), new_value)
    new_table = install(table, win)
    return EpochResult(committed_ids, aborted, new_table)


def _protocol_local(
    rows: list, reorder: bool, max_epochs: int, strict: bool = True
) -> tuple[dict, list[int], int]:
    """The epoch protocol over plain tuples, for broadcast-sized batches.

    Exactly the algebra of reserve/analyze/commit_decision/winners —
    tests/test_aria.py proves local == distributed. Returns
    (key -> (txn_id, op_idx) winning write, commit_order, epochs);
    later epochs shadow earlier ones, like the overlay path.
    commit_order reports ORIGINAL ids (pre-renumbering); winning
    values still regenerate from the renumbered Tid, matching the
    reference's device value generation on retried epochs.
    """
    live = list(rows)
    winner: dict = {}
    commit_order: list[int] = []
    orig: dict | None = None  # current Tid -> originally submitted Tid
    epochs = 0
    while live and epochs < max_epochs:
        epochs += 1
        rts: dict = {}
        wts: dict = {}
        by_txn: dict = {}
        for row in live:
            t, _, k, u = row
            rts[k] = min(rts.get(k, t), t)
            if u:
                wts[k] = min(wts.get(k, t), t)
            by_txn.setdefault(t, []).append(row)
        if orig is None:
            orig = {t: t for t in by_txn}
        flags: dict = {}
        for t, _, k, u in live:
            f = flags.setdefault(t, [False, False, False])  # raw, war, waw
            if k in wts and wts[k] < t:
                f[0] = True
            if u and rts[k] < t:
                f[1] = True
            if u and k in wts and wts[k] < t:
                f[2] = True
        committed, aborted = [], []
        for t in sorted(flags):
            raw, war, waw = flags[t]
            abort = (waw or (raw and war)) if reorder else (waw or raw)
            (aborted if abort else committed).append(t)
        for t in committed:
            for _, op, k, u in sorted(by_txn[t], key=lambda r: r[1]):
                if u:
                    winner[k] = (t, op)
        commit_order.extend(orig[t] for t in committed)
        if not aborted:
            live = []
            break
        renum = {t: i + 1 for i, t in enumerate(aborted)}
        orig = {renum[t]: orig[t] for t in renum}
        live = [(renum[t], op, k, u) for t, op, k, u in live if t in renum]
    if live and strict:
        # exhausted the epoch budget with transactions still aborting —
        # never silently drop their writes
        raise RuntimeError(
            f"aria: {len({t for t, _, _, _ in live})} transactions still live "
            f"after max_epochs={max_epochs} — raise max_epochs"
        )
    return winner, commit_order, epochs


def global_renumber(df: DataFrame, col: str = "txn_id") -> DataFrame:
    """Order-preserving dense renumber 1..m of ``df[col]`` at scale.

    Replaces ``row_number() OVER (ORDER BY col)`` — whose unpartitioned
    window funnels every row through ONE task — with the two-level
    scheme: range-partition on ``col`` (partition i holds strictly
    smaller values than partition i+1), rank within each partition in
    parallel, then add broadcast cumulative partition-count offsets.
    The only single-task step is the running sum over one row per
    partition (bounded by cluster parallelism, not by data size).
    Output: input columns plus ``_new_tid`` (long, 1-based).
    """
    part = df.repartitionByRange(F.col(col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = part.groupBy("_pid").count()
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("count").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    ranked = part.withColumn(
        "_rank", F.row_number().over(Window.partitionBy("_pid").orderBy(col))
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn("_new_tid", (F.col("_offset") + F.col("_rank")).cast("long"))
        .drop("_pid", "_rank", "_offset")
    )


def run_batch(
    table: DataFrame,
    ops: DataFrame,
    reorder: bool = False,
    new_value: Column | None = None,
    max_epochs: int = 1000,
    rmw: bool = False,
    local_threshold: int = 100_000,
    collect_commit_order: bool | None = None,
    strict: bool = True,
) -> BatchResult:
    """Epoch loop until every txn commits (DB::test, db.h:104-109).

    ``strict``: by default, exhausting ``max_epochs`` with transactions
    still live raises (never silently drop writes). ``strict=False``
    turns the cap into a SNAPSHOT HORIZON: the partial result after
    exactly ``max_epochs`` epochs is returned — because the protocol is
    deterministic, that IS the table state as of that epoch, so bounded
    replay doubles as MVCC-style time travel (aria_snapshot_asof).

    Aborted txns are re-numbered 1..m preserving relative order
    (Collect, TransctionManager.cuh:176-184) and retried. Terminates:
    each epoch the smallest live Tid has no older conflictor, so it
    commits (metadatahelper.cuh:51-55 — min-Tid reservations never lose).

    ``rmw``: the reference workload never reads-modifies-writes —
    speculative values are regenerated, not derived from reads
    (kv.cuh:72-78) — so by default the evolving table is write-only
    during the batch and we install ONE merged overlay at the end
    (later epochs shadow earlier ones). That removes the per-epoch
    full-table materialization entirely: per-epoch cost is one small
    flags collect + a tiny ops checkpoint. Pass ``rmw=True`` if your
    ``new_value`` expression reads current table state; the loop then
    installs + localCheckpoints the table every epoch (the lineage
    trap fix, SURVEY.md §4.2).

    ``local_threshold``: batches of at most this many ops run the epoch
    protocol on the driver in one pass (one collect + one distributed
    install) — an OLTP epoch batch is broadcast-sized by definition
    (the reference caps it at 200 txns, TransctionManager.cuh:15), and
    per-epoch Spark job overhead would dominate it. The table itself
    stays distributed; only the op batch is local. Larger batches run
    fully distributed; equivalence of the paths is test-enforced
    (tests/test_aria.py::test_local_fast_path_equals_distributed).

    ``collect_commit_order``: whether to materialize the driver-side
    ``BatchResult.commit_order`` list. Default (``None``) resolves to
    True on the local fast path and the rmw path — where the per-txn
    rows are already on the driver, so the list is free — and False on
    the fully distributed path, where building it would collect O(batch)
    txn ids per epoch. The distributed path always exposes the lazy
    ``commit_order_df`` instead; pass ``True`` to force the list there
    (tests do, at test scale).
    """
    probe = None
    if not rmw and new_value is None:
        # ONE bounded job decides the path AND delivers the rows if local:
        # collecting limit(threshold+1) never exceeds the local budget.
        probe = ops.limit(local_threshold + 1).collect()
    if probe is not None and len(probe) <= local_threshold:
        import hashlib

        rows = [(r.txn_id, r.op_idx, r.key, r.is_update) for r in probe]
        result = BatchResult(table=table)
        if not rows:
            return result
        winner, commit_order, epochs = _protocol_local(
            rows, reorder, max_epochs, strict=strict
        )
        result.commit_order = commit_order
        result.epochs = epochs
        win_rows = [
            (k, hashlib.md5(f"{t}:{op}:{k}".encode()).hexdigest())
            for k, (t, op) in sorted(winner.items())
        ]
        if win_rows:
            win = ops.sparkSession.createDataFrame(win_rows, "key long, value string")
            result.table = install(table, F.broadcast(win))
        return result
    if new_value is None:
        new_value = default_new_value()
    result = BatchResult(table=table)
    live = ops
    if live.isEmpty():
        return result
    if not rmw:
        # Carry the originally submitted Tid through Collect-phase
        # renumbering so commit evidence reports caller ids.
        live = live.withColumn("orig_tid", F.col("txn_id"))
    orig_map: dict[int, int] | None = None  # rmw path: current -> original Tid
    overlays: list[DataFrame] = []
    co_frames: list[DataFrame] = []
    for epoch in range(max_epochs):
        if rmw:
            ep = run_epoch(table, live, reorder=reorder, new_value=new_value)
            table = materialize(ep.table, force_checkpoint=True)
            ep_committed, aborted = ep.committed, ep.aborted
            if orig_map is None:
                orig_map = {t: t for t in ep_committed + aborted}
            if collect_commit_order is not False:
                # free: run_epoch already collected the per-txn flag rows
                result.commit_order.extend(orig_map[t] for t in ep_committed)
            result.epochs += 1
            if not aborted:
                break
            orig_map = {i + 1: orig_map[t] for i, t in enumerate(aborted)}
            aborted_df = live.sparkSession.createDataFrame(
                [(t, i + 1) for i, t in enumerate(aborted)],
                "txn_id long, _new_tid long",
            )
            live = (
                live.join(F.broadcast(aborted_df), "txn_id")
                .select(
                    F.col("_new_tid").alias("txn_id"), "op_idx", "key", "is_update"
                )
                .transform(lambda d: materialize(d, force_checkpoint=True))
            )
            continue
        # Distributed path: commit decisions, winner overlay and the
        # Collect-phase renumbering all stay DataFrame-side. With the
        # default collect_commit_order=None the only driver traffic per
        # epoch is the bounded aborted-set probe below — a 100M-txn
        # batch never ships per-txn rows to the driver.
        # (analyze() inlined to carry orig_tid through the groupBy.)
        j = live.join(reserve(live), "key")
        older_w = F.col("wts").isNotNull() & (F.col("wts") < F.col("txn_id"))
        older_r = F.col("rts") < F.col("txn_id")
        flags = j.groupBy("txn_id").agg(
            F.max(older_w).alias("raw"),
            F.max(F.col("is_update") & older_r).alias("war"),
            F.max(F.col("is_update") & older_w).alias("waw"),
            F.min("orig_tid").alias("orig_tid"),
        )
        if reorder:
            abort_col = F.col("waw") | (F.col("raw") & F.col("war"))
        else:
            abort_col = F.col("waw") | F.col("raw")
        committed = flags.filter(~abort_col).select("txn_id", "orig_tid")
        aborted_df = flags.filter(abort_col).select("txn_id")
        overlays.append(
            winners(live, committed.select("txn_id"), new_value).withColumn(
                "_epoch", F.lit(epoch)
            )
        )
        co_frames.append(
            committed.select(
                F.lit(epoch).alias("epoch"), "txn_id", "orig_tid"
            )
        )
        if collect_commit_order:
            result.commit_order.extend(
                r.orig_tid for r in committed.orderBy("txn_id").collect()
            )
        result.epochs += 1
        n_aborted = aborted_df.limit(1).count()
        if n_aborted == 0:
            break
        # Collect phase: compact aborted txns to the queue front with
        # fresh sequential Tids 1..m, order-preserving
        # (TransctionManager.cuh:176-184) — two-level renumber, no
        # single-partition global window (see global_renumber).
        renum = global_renumber(aborted_df, "txn_id")
        live = (
            live.join(renum, "txn_id")
            .select(
                F.col("_new_tid").alias("txn_id"),
                "op_idx",
                "key",
                "is_update",
                "orig_tid",
            )
            .transform(lambda d: materialize(d, force_checkpoint=True))
        )
    else:
        # range exhausted without the aborted-set ever draining
        if strict:
            raise RuntimeError(
                f"aria: transactions still live after max_epochs={max_epochs} "
                "— raise max_epochs"
            )
    if co_frames:
        codf = co_frames[0]
        for c in co_frames[1:]:
            codf = codf.unionAll(c)
        result.commit_order_df = codf
    if not rmw and overlays:
        # Later epochs shadow earlier writes to the same key.
        allw = overlays[0]
        for o in overlays[1:]:
            allw = allw.unionAll(o)
        w = Window.partitionBy("key").orderBy(F.col("_epoch").desc())
        final_w = (
            allw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("key", "value")
        )
        table = install(table, final_w)
    result.table = table
    return result
