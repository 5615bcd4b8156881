"""Sort / limit / top-k operators (SURVEY.md §2B "Sorts / limits / top-k").

Reference parity: the ascending op-list insert
(``src/database/ycsb/key_op_chain.cuh:26-46``) and the Tid renumber on
retry (``TransctionManager.cuh:176-184``) are the reference's only
orderings.

Scale notes: global orderBy+limit compiles to TakeOrderedAndProject
(per-partition heap + driver merge of k rows — no global sort);
top-k per group is a window row_number, one shuffle on the group key.
A full global sort (sort_global_sample) uses range partitioning via
sampled bounds — the only scale-safe total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


@register(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a total-order tiebreak -> TakeOrderedAndProject."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    )
    WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest parts per brand: the row_number()<=k idiom —
    one shuffle, no per-group collect."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )


@register(
    "sort_multi_key",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_name, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort (range-partitioned exchange +
    per-partition sort under AQE)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_nationkey", "s_suppkey", "s_name", "s_acctbal").orderBy(
        F.col("s_nationkey").asc(), F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )


@register(
    "sort_nulls_ordering",
    oracle="""
    SELECT k, CAST(v AS DOUBLE) AS v
    FROM (VALUES (1, 10.0), (2, NULL), (3, 5.0), (4, NULL), (5, 7.5)) t(k, v)
    ORDER BY v ASC NULLS LAST, k
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering semantics (SQL three-valued model the
    reference's CmpBool enum intended, src/database/common/type.h:22-26)."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0), (4, None), (5, 7.5)], "k int, v double"
    )
    return df.orderBy(F.col("v").asc_nulls_last(), F.col("k")).select(
        F.col("k").cast("int").alias("k"), "v"
    )
