"""File-format readers (SURVEY.md §2B "Scans / sources / sinks").

The reference's only ingest is a host-loop bulk load
(``src/database/ycsb/db.h:42-53``). Here: parquet (primary), CSV and
JSON(L) with explicit schemas — schema inference is disabled on
production paths (FIXTURES.md: strict StructType per table; inference
costs an extra pass and drifts under dirty data).

Scale notes: all three formats split by file/block into ~maxPartitionBytes
tasks; parquet additionally prunes columns + row groups. CSV/JSON are
ingest formats — convert to parquet at the edge (see writers.py), never
re-scan raw text twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from gpu_database_spark.session import tune_session


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    tune_session(spark)
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with a required explicit schema (no inference pass)."""
    tune_session(spark)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSON-lines with a required explicit schema (no inference pass)."""
    tune_session(spark)
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """ORC scan — the other columnar interchange format (Hive/Trino
    estates). Same pushdown class as parquet: column pruning, predicate
    pushdown into stripes, split by stripe."""
    tune_session(spark)
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """binaryFile source: one row per file with (path, modificationTime,
    length, content BINARY) — the ingest edge for multimodal corpora
    (images/audio land as opaque bytes + metadata; llm.multimodal decodes
    downstream via mapInPandas). Splitting is per-file, so pair with a
    repartition when file sizes are skewed."""
    tune_session(spark)
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
