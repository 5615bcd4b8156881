"""Physical lifecycle parity: caching (the reference's host<->device
migration analogue, src/cuda/hashTable.cuh:165-200) and repartitioning
(the rehash analogue, src/cuda/hashTable.cuh:208-242)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_database_spark.sources.catalog import load_table


def test_cache_and_unpersist(spark, sf_dir):
    """df.cache() ~ move_to_device (keep the working set resident across
    the epoch loop); unpersist ~ move_to_host frees it."""
    l = load_table(spark, sf_dir, "lineitem").cache()
    try:
        n1 = l.count()  # materializes the cache
        assert l.storageLevel.useMemory
        n2 = l.count()
        assert n1 == n2 > 0
    finally:
        l.unpersist(blocking=True)
        assert not l.storageLevel.useMemory


def test_repartition_by_key(spark, sf_dir):
    """repartition(n, key) ~ reshape_on_host + kernel_Reinsert: every
    row lands in the partition owning its hash bucket; row multiset is
    unchanged."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    r = l.repartition(8, "l_orderkey")
    assert r.rdd.getNumPartitions() == 8
    assert r.count() == l.count()
    # co-partitioned: each orderkey's rows live in exactly one partition
    pid = r.withColumn("pid", F.spark_partition_id())
    spread = pid.groupBy("l_orderkey").agg(F.countDistinct("pid").alias("np"))
    assert spread.filter(F.col("np") > 1).count() == 0
