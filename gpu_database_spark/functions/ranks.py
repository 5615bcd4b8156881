"""Skew-safe global ranking: the histogram-bucket rank plan, factored.

A global ROW_NUMBER() OVER (ORDER BY v) is the canonical
single-partition scale-killer. The repo's standard replacement
(stat_exact_quantiles_distributed, stat_gini_concentration,
stat_ks_test, pack_sequences_chunked all use instances of it) is the
classic two-level decomposition:

1. bucket rows by a domain expression (floor(v / width)) — thousands
   of independent partitions;
2. row_number (or running sums) WITHIN each bucket ordered by the
   total tiebreak — bounded per-task work;
3. exclusive prefix over the tiny bucket-totals table (safe: its row
   count is the bucket-domain size), broadcast back as offsets.

Ranks are identical to the global sort's because buckets are ordered
by value and the within-bucket order is total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_row_number(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    bucket: Column,
    rank_col: str = "i",
    ascending: bool = True,
) -> DataFrame:
    """Append global 1-based rank ``rank_col`` of ``value_col`` (with
    ``tiebreak_cols`` completing a total order) WITHOUT a global sort.

    ``bucket`` must be a monotone function of the value (same
    direction as ``ascending``); rows tie-break inside their bucket.
    """
    return grouped_bucketed_row_number(
        df, [], value_col, tiebreak_cols, bucket, rank_col, ascending
    )


def grouped_bucketed_row_number(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    bucket: Column,
    rank_col: str = "i",
    ascending: bool = True,
) -> DataFrame:
    """Per-group variant: rank of ``value_col`` WITHIN each
    ``group_cols`` combination, still without ever sorting a whole
    group on one task. The heavy window partitions by
    (group, bucket) — parallelism = groups × buckets, so a
    low-cardinality group key (the classic percentile-per-flag trap)
    still spreads across the cluster. The offset window runs over the
    tiny (group, bucket) totals table only (rows = |groups| ×
    bucket-domain size), partitioned by group.
    """
    order = [F.col(value_col)] + [F.col(c) for c in tiebreak_cols]
    if not ascending:
        order = [c.desc() for c in order]
    # NOTE for callers: this plan consumes ``df`` TWICE (the per-bucket
    # window and the bucket-totals aggregate shuffle differently, so
    # Spark cannot reuse one exchange for the other). If the input is
    # expensive to recompute and small enough to store — an upstream
    # aggregate like RFM's per-user frame — materialize it FIRST;
    # chained rank calls otherwise re-execute the upstream lineage
    # 2^depth times. Conversely a plain column-pruned scan is usually
    # cheaper to re-run than to checkpoint (measured: storing a 60M-row
    # lineitem projection here GC-thrashed while the double scan cost
    # ~nothing), so materialization is the call site's decision, not
    # this helper's.
    b = df.withColumn("_rk_bkt", bucket.cast("long"))
    wl = Window.partitionBy(*group_cols, "_rk_bkt").orderBy(*order)
    local = b.withColumn("_rk_rn", F.row_number().over(wl))
    bt = b.groupBy(*group_cols, "_rk_bkt").agg(F.count(F.lit(1)).alias("_rk_c"))
    bkt_order = F.col("_rk_bkt").asc() if ascending else F.col("_rk_bkt").desc()
    wo = (
        Window.partitionBy(*group_cols)
        .orderBy(bkt_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = bt.select(
        *group_cols,
        "_rk_bkt",
        F.coalesce(F.sum("_rk_c").over(wo), F.lit(0)).alias("_rk_base"),
    )
    return (
        local.join(F.broadcast(off), [*group_cols, "_rk_bkt"])
        .withColumn(rank_col, F.col("_rk_base") + F.col("_rk_rn"))
        .drop("_rk_bkt", "_rk_rn", "_rk_base")
    )
