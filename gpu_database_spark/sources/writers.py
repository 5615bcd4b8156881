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


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
