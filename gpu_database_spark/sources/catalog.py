"""Fixture catalog: the ten driver tables as DataFrames.

Reference parity: the reference's "catalog" is a two-level vector of
hash tables (``src/database/common/database.h:10-22``) bulk-loaded by
``DB::init_table`` (``src/database/ycsb/db.h:42-53``). Here a table is
an immutable DataFrame backed by parquet; "bulk load" is a columnar
parquet scan with pushdown — the distributed analogue.

The ``events`` table needs special handling: fixtures have shipped
``ts`` both as TIMESTAMP(NANOS) (unreadable by Spark's vectorized
reader; surfaces as epoch-nanos LongType under
``spark.sql.legacy.parquet.nanosAsLong=true``) and as plain
timestamp[us]. ``load_table`` normalizes either encoding to the
engine's two-column event-time contract: ``ts`` (TIMESTAMP_NTZ, UTC,
us precision) plus ``ts_ns`` (LongType epoch-nanos).
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
    """Load one fixture table; normalizes the events timestamp.

    The engine's event-time contract is two columns regardless of the
    fixture's physical encoding:

    * ``ts``    — TIMESTAMP_NTZ, microsecond precision, UTC instant.
    * ``ts_ns`` — LongType epoch-nanoseconds of the same instant.

    Fixtures have shipped ``ts`` two ways: TIMESTAMP(NANOS) (read as
    epoch-nanos LongType under ``nanosAsLong``) and TIMESTAMP(MICROS)
    (read as timestamp/timestamp_ntz). Both normalize here so every
    downstream consumer sees the same schema.
    """
    tune_session(spark)
    df = spark.read.parquet(_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # epoch-nanos long -> microsecond TIMESTAMP_NTZ (session tz is
            # UTC, so the LTZ->NTZ cast is the identity on the instant).
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts",
                F.expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP_NTZ)"),
            )
        elif ts_type in ("timestamp", "timestamp_ntz"):
            # timestamp[us] fixture: derive epoch-nanos; unix_micros needs
            # TIMESTAMP (LTZ) — the NTZ->LTZ cast is identity under UTC.
            df = df.withColumn(
                "ts_ns",
                F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000),
            ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        if "ts_ns" in df.columns:
            df = df.select(
                "event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props"
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each fixture table as a temp view for spark.sql use."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
