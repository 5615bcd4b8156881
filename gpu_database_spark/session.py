"""SparkSession bootstrap and runtime tuning.

Two entry points:

* :func:`get_spark` — build a session for tests/bench (local[N]).
* :func:`tune_session` — apply the runtime-settable confs this engine
  needs to an *existing* session (e.g. the verification driver's).
  Everything set here is a runtime SQL conf, so it is safe to call on
  a running session; it is idempotent.

Scale notes (100 TB): the defaults below are sized for local[32] test
runs; on a real cluster the same code runs unchanged — AQE coalesces
the 32→2000+ shuffle partitions per stage, and
``spark.sql.files.maxPartitionBytes`` keeps scan tasks ~128 MB so a
1000-executor cluster reading 100 TB gets ~800k well-sized tasks.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are runtime-settable and required for correctness on the
# fixture data (deterministic timezone handling, nanosecond parquet
# timestamps in events.parquet) or strongly wanted for performance.
_RUNTIME_CONFS: dict[str, str] = {
    # Determinism: every timestamp<->string/epoch conversion pinned to UTC
    # so results hash identically regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS) which Spark cannot read as a
    # timestamp; read it as raw epoch-nanos LongType and convert ourselves
    # (sources/catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Scan split sizing: with the default 4 MB openCostInBytes floor, a
    # 10 MB single-file table scans as 3 tasks on a 32-core box — the
    # floor, not maxPartitionBytes, binds on small inputs. At 256 KB the
    # totalBytes/defaultParallelism term governs instead, which
    # self-scales: small local fixtures split to core count (~30% faster
    # lineitem queries measured), while at 100 TB bytes/parallelism far
    # exceeds the 128 MB maxPartitionBytes cap, so splits are unchanged.
    "spark.sql.files.openCostInBytes": "262144",
    # Adaptive execution: runtime partition coalescing + skew-join
    # splitting — the scale path for 100 TB shuffles.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the few pandas-UDF paths (vectors, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Let custom Python DataSources (sources/pysource.py) receive
    # pushFilters — off by default in Spark 4.1.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment — keep going; individual
            # readers degrade gracefully.
            pass
    return spark


def get_spark(
    app_name: str = "gpu-database-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession configured for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        # Keep stage-progress bars out of the combined stdout/stderr stream
        # the bench driver tails (they can push the result line out of the
        # capture window).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # ~128 MB scan tasks — the right granularity from laptop to cluster.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune_session(spark)
