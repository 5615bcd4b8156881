"""Skyline (Pareto-dominance) query — a non-standard OLAP operator.

Motivated by the retrieved-corpus paper "Integration of Skyline
Queries into Spark SQL" (EDBT 2023): the skyline of a relation under
(minimize price, maximize size) is the set of rows not dominated by
any other row (dominator is <= / >= on every axis and strictly better
on at least one).

Spark-first two-phase plan (the standard distributed skyline):
  1. LOCAL skyline per partition via an Arrow-batched mapInPandas
     sort-scan (O(b log b) per batch) — a row dominated locally can
     never be in the global skyline, so this prunes the bulk of 100 TB
     in parallel with no shuffle;
  2. GLOBAL skyline over the (small) union of local skylines with the
     same scan on one partition.

The oracle states the semantics directly as a NOT EXISTS anti-join —
quadratic, fine at fixture scale, and exactly the definition.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


def _skyline_scan(pdf):
    """Pandas skyline under (min price, max size).

    Sort by (price asc, size desc); a row survives iff its size equals
    its price-group's max AND that max strictly exceeds the running max
    size over all strictly-cheaper rows (equal size at cheaper price
    dominates via the strict price axis; equal price with larger size
    dominates via the strict size axis; exact (price, size) duplicates
    never dominate each other and all survive together).
    """
    if len(pdf) == 0:
        return pdf
    pdf = pdf.sort_values(
        ["p_retailprice", "p_size"], ascending=[True, False]
    ).reset_index(drop=True)
    grp_max = pdf.groupby("p_retailprice")["p_size"].transform("max")
    heads = pdf["p_retailprice"].ne(pdf["p_retailprice"].shift())
    # per price group: the max size over all STRICTLY cheaper groups
    head_prices = pdf.loc[heads, "p_retailprice"]
    prev_for_head = grp_max[heads].cummax().shift()
    prev = pdf["p_retailprice"].map(dict(zip(head_prices, prev_for_head)))
    keep = (pdf["p_size"] == grp_max) & (prev.isna() | (pdf["p_size"] > prev))
    return pdf[keep.values]


@register(
    "skyline_price_size",
    oracle="""
    SELECT a.p_partkey, a.p_retailprice, CAST(a.p_size AS BIGINT) AS p_size
    FROM part a
    WHERE a.p_retailprice IS NOT NULL AND a.p_size IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    ORDER BY a.p_partkey
    """,
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: cheapest-for-their-size / largest-for-
    their-price. Local skylines prune per partition, the global pass
    finishes on the survivors."""
    p = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey", "p_retailprice", F.col("p_size").cast("long").alias("p_size")
        )
        # dominance is undefined under NULLs; scope both engines to
        # non-null axes (the oracle filters identically)
        .dropna(subset=["p_retailprice", "p_size"])
    )

    def local(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _skyline_scan(pdf)

    def global_scan(batches: Iterator) -> Iterator:
        # One frame for the WHOLE pass: mapInPandas yields ~10k-row Arrow
        # batches, and scanning them independently would let a row
        # dominated only by a row in another batch survive.
        import pandas as pd

        frames = list(batches)
        if frames:
            yield _skyline_scan(pd.concat(frames, ignore_index=True))

    schema = "p_partkey long, p_retailprice double, p_size long"
    local_sky = p.mapInPandas(local, schema=schema)
    global_sky = local_sky.coalesce(1).mapInPandas(global_scan, schema=schema)
    return global_sky.orderBy("p_partkey")
