"""Fixture catalog: the ten driver tables as DataFrames.

Reference parity: the reference's "catalog" is a two-level vector of
hash tables (``src/database/common/database.h:10-22``) bulk-loaded by
``DB::init_table`` (``src/database/ycsb/db.h:42-53``). Here a table is
an immutable DataFrame backed by parquet; "bulk load" is a columnar
parquet scan with pushdown — the distributed analogue.

The ``events`` table needs special handling: the fixture parquet
stores ``ts`` as TIMESTAMP(NANOS) which Spark's vectorized reader
rejects. With ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
session.tune_session) it reads as epoch-nanoseconds LongType; we keep
that as ``ts_ns`` and derive a microsecond-precision TIMESTAMP_NTZ
``ts`` column (UTC, deterministic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes the events timestamp."""
    tune_session(spark)
    df = spark.read.parquet(_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos long -> microsecond TIMESTAMP_NTZ (session tz is UTC,
        # so the LTZ->NTZ cast is the identity on the underlying instant).
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn(
                "ts",
                F.expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP_NTZ)"),
            )
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each fixture table as a temp view for spark.sql use."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
