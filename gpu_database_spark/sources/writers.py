"""Sinks: parquet (plain / partitioned / bucketed), CSV, JSONL.

Scale notes (100 TB):
* ``write_parquet_partitioned`` — partition by a low-cardinality column
  (date, lang, source); downstream filters on it become directory
  pruning (zero IO for skipped partitions).
* ``write_bucketed_table`` — pre-shuffle by join key into N buckets;
  a later join/aggregate on that key skips its shuffle entirely
  (the persistent analogue of the reference keeping its whole hash
  table key-organized, src/cuda/hashTable.cuh).
* Never coalesce(1): one output task is a single-writer bottleneck.
  Control file sizes with repartition(n, key) before the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins between two tables bucketed the same way on the same key are
    shuffle-free (SortMergeJoin with no Exchange) — verified in
    tests/test_sources.py.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def write_sorted_parquet(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int
) -> None:
    """Write parquet clustered on sort_cols (range-partition + in-file
    sort): row-group min/max stats become tight, so later filters on
    those columns skip whole row groups — the single cheapest IO
    optimization for append-only fact tables at 100 TB. n_files is
    required: the shuffle-partition default (200) would manufacture
    exactly the small-files problem compact_parquet exists to fix."""
    df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    ).write.mode("overwrite").parquet(path)


def compact_parquet(spark, path: str, target_files: int) -> None:
    """Compact a LOCAL-filesystem small-files directory to target_files
    (the streaming-sink hygiene job). Swap discipline: write compacted
    data to a temp dir, move the old dir aside, move the new one in,
    then delete the old. `path` is never PARTIAL, but the swap is two
    renames, not one atomic exchange — a concurrent reader can observe
    a brief window where `path` is absent and must tolerate a
    retryable miss; a crash leaves either the old data in place or
    (post-swap) only the *_old leftover to clean. A truly gapless swap
    needs RENAME_EXCHANGE or a catalog commit — for object stores use
    the catalog's atomic-commit (Iceberg/Delta rewriteDataFiles), not
    this."""
    import shutil
    import tempfile
    import os

    df = spark.read.parquet(path)
    parent = os.path.dirname(path) or "."
    tmp = tempfile.mkdtemp(prefix="compact_new_", dir=parent)
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = tempfile.mkdtemp(prefix="compact_old_", dir=parent)
    os.rmdir(old)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back: restore the original table
        raise
    shutil.rmtree(old)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
