"""Set operators (SURVEY.md §2B "Set operations").

Reference parity: the retry compaction computes the complement of the
committed set (``src/database/ycsb/TransctionManager.cuh:177-183``) —
an EXCEPT/anti-join. Full surface: UNION [ALL], INTERSECT, EXCEPT,
DISTINCT.

Scale notes: UNION ALL is free (no shuffle); UNION/INTERSECT/EXCEPT
shuffle on the full row for dedup — at 100 TB prefer keyed anti/semi
joins over EXCEPT when a key exists (shown by kv_delete_anti).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    ) ORDER BY nationkey
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations appearing on either side."""
    return (
        _cust_nations(spark, sf_dir)
        .union(_supp_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


@register(
    "set_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates — verified via per-key counts."""
    return (
        _cust_nations(spark, sf_dir)
        .unionAll(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations with both customers and suppliers."""
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer nations with no supplier presence
    (ref analogue: abort-set complement, TransctionManager.cuh:177-183)."""
    return (
        _cust_nations(spark, sf_dir)
        .subtract(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "set_union_by_name",
    oracle="""
    SELECT k, metric, CAST(extra AS BIGINT) AS extra FROM (
        SELECT r_regionkey AS k, r_name AS metric, NULL AS extra FROM region
        UNION ALL BY NAME
        SELECT n_name AS metric, n_nationkey AS k, n_regionkey AS extra FROM nation
    )
    ORDER BY k, metric
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-flexible union: unionByName with allowMissingColumns
    aligns by column NAME (not position) and null-fills columns one
    side lacks — the schema-evolution union (oracle: UNION ALL BY
    NAME)."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.col("r_name").alias("metric")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("metric"),
        F.col("n_nationkey").alias("k"),
        F.col("n_regionkey").cast("long").alias("extra"),
    )
    return (
        r.unionByName(n, allowMissingColumns=True)
        .select("k", "metric", "extra")
        .orderBy("k", "metric")
    )


@register(
    "agg_arg_minmax",
    oracle="""
    SELECT c_nationkey,
           arg_max(c_name, c_custkey) AS newest_customer,
           arg_min(c_name, c_custkey) AS oldest_customer,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min (max_by/min_by): carry a companion column with
    the extremum in ONE aggregation — no join-back. Ordered on the
    unique custkey so tie behavior (engine-specific in both) never
    engages."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.max_by("c_name", "c_custkey").alias("newest_customer"),
            F.min_by("c_name", "c_custkey").alias("oldest_customer"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "set_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def set_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DISTINCT (hash aggregate on all columns)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "set_except_intersect_all",
    oracle="""
    WITH a AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty
               FROM lineitem WHERE l_orderkey < 400),
    b AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem WHERE l_orderkey >= 200 AND l_orderkey < 600),
    ex AS (SELECT flag, qty FROM a EXCEPT ALL SELECT flag, qty FROM b),
    ix AS (SELECT flag, qty FROM a INTERSECT ALL SELECT flag, qty FROM b)
    SELECT 'except_all' AS op, flag, qty, COUNT(*) AS n
    FROM ex GROUP BY flag, qty
    UNION ALL
    SELECT 'intersect_all', flag, qty, COUNT(*) FROM ix GROUP BY flag, qty
    ORDER BY op, flag, qty
    """,
)
def set_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations — EXCEPT ALL / INTERSECT ALL keep
    DUPLICATE multiplicities (except-all: max(count_a - count_b, 0)
    copies; intersect-all: min(count_a, count_b)), which the
    deduplicating EXCEPT/INTERSECT queries above cannot express. The
    changelog-diff primitive: 'which rows, WITH multiplicity, are in
    yesterday's extract but not today's'.

    Scale shape: Spark plans both as a single hash aggregation on the
    row value with two counters (no sort, no join) — the result is
    re-counted per distinct row so the driver-visible output is a
    bounded census, not the multiset itself."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") < 400).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    b = li.filter(
        (F.col("l_orderkey") >= 200) & (F.col("l_orderkey") < 600)
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    ex = (
        a.exceptAll(b)
        .groupBy("flag", "qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    ix = (
        a.intersectAll(b)
        .groupBy("flag", "qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    return ex.unionByName(ix).select("op", "flag", "qty", "n").orderBy(
        "op", "flag", "qty"
    )
