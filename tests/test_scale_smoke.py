"""Scale-headroom smoke: synthesize ~10x the bench fixture in-memory
and prove the flagship plans and the distributed Aria path hold up —
the local stand-in for 'would this survive a 100x scale-up'."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from gpu_database_spark.functions.compat import dsum
from gpu_database_spark.operators import aria


def synth_lineitem(spark, n_rows: int):
    """Deterministic lineitem-shaped table from spark.range (fully
    distributed generation — no driver materialization)."""
    return spark.range(n_rows).select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        F.pmod(F.col("id"), 200_000).alias("l_partkey"),
        F.pmod(F.col("id") * 7, 1_000).alias("l_suppkey"),
        F.pmod(F.col("id"), 4).cast("int").alias("l_linenumber"),
        (F.pmod(F.col("id") * 31, 50) + 1).cast("double").alias("l_quantity"),
        (F.pmod(F.col("id") * 131, 100_000) / 100 + 900).alias("l_extendedprice"),
        (F.pmod(F.col("id"), 11) / 100).alias("l_discount"),
        (F.pmod(F.col("id"), 9) / 100).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("l_returnflag"),
    )


def test_flagship_agg_at_6m_rows(spark):
    l = synth_lineitem(spark, 6_000_000)
    t0 = time.perf_counter()
    rows = (
        l.filter(F.col("l_quantity") < 45)
        .groupBy("l_returnflag")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    elapsed = time.perf_counter() - t0
    assert len(rows) == 3 and all(r.n > 1_000_000 for r in rows)
    assert elapsed < 60, f"6M-row agg took {elapsed:.1f}s"


def test_join_agg_at_6m_rows(spark):
    l = synth_lineitem(spark, 6_000_000)
    dim = spark.range(1_000).select(
        F.col("id").alias("l_suppkey"),
        F.concat(F.lit("S"), F.col("id")).alias("s_name"),
    )
    t0 = time.perf_counter()
    n = (
        l.join(F.broadcast(dim), "l_suppkey")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    elapsed = time.perf_counter() - t0
    assert n == 1_000
    assert elapsed < 60, f"6M-row broadcast join took {elapsed:.1f}s"


def test_aria_distributed_path_at_100k_ops(spark):
    """Force the fully distributed epoch loop on a batch 444x the
    reference's (100k ops vs 150 txns x ~15 ops) — driver never sees a
    per-op row (local_threshold=0)."""
    ops = spark.range(100_000).select(
        (F.col("id") / 20).cast("long").alias("txn_id"),
        F.pmod(F.col("id"), 20).cast("int").alias("op_idx"),
        F.pmod(F.col("id") * 13, 50_000).alias("key"),
        (F.pmod(F.col("id"), 5) < 2).alias("is_update"),
    )
    table = spark.range(50_000).select(
        F.col("id").alias("key"), F.md5(F.col("id").cast("string")).alias("value")
    )
    t0 = time.perf_counter()
    result = aria.run_batch(table, ops, reorder=True, local_threshold=0)
    n = result.table.count()
    elapsed = time.perf_counter() - t0
    assert n >= 50_000
    # default distributed path never collects per-txn rows; commit
    # evidence lives in the lazy frame
    assert result.commit_order == []
    assert result.epochs >= 1 and result.commit_order_df.count() == 5_000
    assert elapsed < 120, f"100k-op distributed batch took {elapsed:.1f}s"
